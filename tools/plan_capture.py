#!/usr/bin/env python3
"""Capture `.explain("formatted")` for named lanes into plans/<dir>/.

Run: python3 tools/plan_capture.py --out plans/r11 --suffix before [--sf DIR] lane [lane ...]

Unlike tools/plan_dump.py (PLANS.md, every headline lane), this writes
one file per lane — the judge-facing before/after evidence for the
optimization rounds (plans/r11/<lane>_<suffix>.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    out_dir = "plans/r11"
    suffix = "before"
    for flag, var in (("--sf", "sf_dir"), ("--out", "out_dir"), ("--suffix", "suffix")):
        if flag in args:
            i = args.index(flag)
            if var == "sf_dir":
                sf_dir = args[i + 1]
            elif var == "out_dir":
                out_dir = args[i + 1]
            else:
                suffix = args[i + 1]
            del args[i:i + 2]

    from uts_spark.registry import QUERIES
    from uts_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, out_dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as f:
            f.write(f"# {name} — explain(formatted) at {sf_dir} [{suffix}]\n\n")
            f.write(plan.strip() + "\n")
        print(f"wrote {p}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
