#!/usr/bin/env python3
"""Per-lane profile: wall seconds AND Spark job count for HEADLINE (or
named) lanes. Service-cycle lanes chain many small actions — job count
times fixed scheduling cost is the first-order model of their wall, so
this is the instrument that says whether a lane is data-bound or
action-bound (guide §1: decide WHERE the time goes before touching it).

Run: python3 tools/lane_profile.py [--sf DIR] [--passes N] [lane ...]
Prints one JSON line per lane: {"lane", "wall": [..], "n_jobs": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    passes = 3
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i:i + 2]

    from uts_spark.registry import HEADLINE, QUERIES
    from uts_spark.session import get_spark

    lanes = args or list(HEADLINE)
    spark = get_spark("lane-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in lanes:
        walls = []
        n_jobs = 0
        for p in range(passes + 1):  # pass 0 = cold, discarded
            group = f"prof-{name}-{p}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            sc.setJobGroup(f"prof-idle", "idle")
            if p > 0:
                walls.append(round(dt, 3))
                n_jobs = len(tracker.getJobIdsForGroup(group))
        print(json.dumps({
            "lane": name,
            "wall": walls,
            "min": min(walls),
            "n_jobs": n_jobs,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
