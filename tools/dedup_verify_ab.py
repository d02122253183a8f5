#!/usr/bin/env python3
"""Paired same-JVM A/B: restructured MinHash verify joins (signature +
shingle features pre-joined per SIDE on the doc-sized frames, so the
candidate-pair stream passes through 2 joins instead of 4, and for
minhash_lsh_pairs est+exact compute in one projection with no
(id_a,id_b)-keyed join) vs the shape at a given git ref.

The legacy functions are reconstructed from `git show <ref>` by AST —
executed inside a COPY of the live module globals, so they resolve the
same helpers — and swapped into every module that binds them. Both
sides alternate in one JVM (host-noise protocol, OPTIMIZATION_r11.md).

MEASURED VERDICT (r11 continuation, 6 paired passes at sf0.1):
- minhash_lsh_pairs: SHIPPED — jobs 16 -> 14, min 2.633 -> 2.504, med
  2.999 -> 2.723 (5 of 6 paired passes better); lazy kernel plan 36 ->
  28 Exchanges (plans/r11/dedup_minhash_lsh_kernel_{before,after}.txt).
- minhash_index_probe: REVERTED — the same feats pre-join costs +1 AQE
  stage and measures a wash-to-loss (min 3.599 -> 3.624, med 3.827 ->
  3.869; facade_tick med 4.62 -> 4.78): the probe's pair stream is
  small enough that four broadcast probes beat materializing a
  combined features frame. Run with --ref pointing at the pre-revert
  tree to reproduce.

Run: python3 tools/dedup_verify_ab.py [--sf DIR] [--passes N] [--ref R] [lane ...]
"""

from __future__ import annotations

import ast
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = [
    "dedup_minhash_lsh",
    "facade_tick_minhash_skew_replay",
]
FUNCS = ("minhash_lsh_pairs", "minhash_index_probe")


def legacy_funcs(ref: str) -> dict:
    src = subprocess.check_output(
        ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         "show", f"{ref}:uts_spark/functions/dedup.py"],
        text=True,
    )
    import uts_spark.functions.dedup as D

    ns = dict(D.__dict__)
    tree = ast.parse(src)
    out = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in FUNCS:
            mod = ast.Module(body=[node], type_ignores=[])
            exec(compile(mod, f"<legacy:{node.name}>", "exec"), ns)
            out[node.name] = ns[node.name]
    assert set(out) == set(FUNCS), f"missing {set(FUNCS) - set(out)} at {ref}"
    return out


def bind(funcs: dict) -> None:
    import uts_spark.functions.dedup as D
    import uts_spark.functions.vindex as VX
    import uts_spark.queries.llm_ops as L

    D.minhash_lsh_pairs = funcs["minhash_lsh_pairs"]
    D.minhash_index_probe = funcs["minhash_index_probe"]
    L.minhash_lsh_pairs = funcs["minhash_lsh_pairs"]
    VX.minhash_index_probe = funcs["minhash_index_probe"]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    passes = 4
    ref = "HEAD"
    for flag, cast in (("--sf", str), ("--passes", int), ("--ref", str)):
        if flag in args:
            i = args.index(flag)
            v = cast(args[i + 1])
            del args[i:i + 2]
            if flag == "--sf":
                sf_dir = v
            elif flag == "--passes":
                passes = v
            else:
                ref = v
    lanes = args or LANES

    import uts_spark.functions.dedup as D

    new = {f: getattr(D, f) for f in FUNCS}
    old = legacy_funcs(ref)

    from uts_spark.registry import QUERIES
    from uts_spark.session import get_spark

    spark = get_spark("dedup-verify-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in lanes:
        res = {"new": [], "old": [], "new_jobs": 0, "old_jobs": 0}
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for p in range(passes):
            order = ("old", "new") if p % 2 == 0 else ("new", "old")
            for side in order:
                bind(old if side == "old" else new)
                group = f"ab-{name}-{side}-{p}"
                sc.setJobGroup(group, name)
                t0 = time.time()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                res[side].append(round(time.time() - t0, 3))
                res[f"{side}_jobs"] = len(tracker.getJobIdsForGroup(group))
        bind(new)
        res["old_min"] = min(res["old"])
        res["new_min"] = min(res["new"])
        res["old_med"] = sorted(res["old"])[len(res["old"]) // 2]
        res["new_med"] = sorted(res["new"])[len(res["new"]) // 2]
        print(json.dumps({"lane": name, **res}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
