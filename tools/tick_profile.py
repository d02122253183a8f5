#!/usr/bin/env python3
"""Driver-serial-fraction profile for service/replay lanes (r12,
VERDICT r11 #3): run one lane, then read the Spark UI REST API's
per-job timeline and report wall, summed job time, the DEAD TIME
between consecutive jobs (driver-side planning, manifest I/O, stream
machinery — the §7.3 serial fraction no core count can help), and the
biggest gaps.

Run: python3 tools/tick_profile.py [--sf DIR] lane [lane ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]

    from uts_spark.registry import QUERIES
    from uts_spark.session import get_spark

    spark = get_spark(
        "tick-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def jobs_after(min_id: int) -> list[dict]:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"
        ) as r:
            js = json.loads(r.read())
        return sorted(
            (j for j in js if j["jobId"] >= min_id),
            key=lambda j: j["jobId"],
        )

    def ms(s: str) -> float:
        # "2026-08-18T12:00:00.123GMT"
        from datetime import datetime

        return datetime.strptime(
            s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
        ).timestamp()

    for name in args:
        # warm pass (cold JVM/codegen excluded from the profile)
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        start_id = max((j["jobId"] for j in jobs_after(0)), default=-1) + 1
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        js = jobs_after(start_id)
        spans = [
            (ms(j["submissionTime"]), ms(j["completionTime"])) for j in js
        ]
        job_sum = sum(b - a for a, b in spans)
        gaps = []
        for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
            gaps.append(round(max(a2 - b1, 0.0), 3))
        print(json.dumps({
            "lane": name,
            "wall": round(wall, 3),
            "n_jobs": len(js),
            "job_time_sum": round(job_sum, 3),
            "gap_sum": round(sum(gaps), 3),
            "head_gap": round(spans[0][0] - t0, 3) if spans else None,
            "top_gaps": sorted(gaps, reverse=True)[:8],
            "top_jobs": sorted(
                (round(b - a, 3) for a, b in spans), reverse=True
            )[:8],
        }), flush=True)


if __name__ == "__main__":
    main()
