#!/usr/bin/env python3
"""Paired same-JVM A/B: BATCHED group-id deletion-vector masking vs the
shipped per-scope-group shape, over the versioned HEADLINE lanes.

The batched hypothesis (OPTIMIZATION_r11.md round-12 candidate #1) was:
tag each scope group's scan with a literal group id, explode each
vector's keys to the group ids it scopes, and mask with ONE broadcast
anti-join per key column instead of one per (group x key column).

MEASURED VERDICT (r11 continuation, this tool, 4 paired passes/lane at
sf0.1): NOT SHIPPED. Spark job counts are IDENTICAL both sides (32/32,
17/17, 26/26, 6/6 — AQE folds the small per-group broadcast builds into
existing stages, so they were never costing jobs), and walls are a
wash-to-loss (versioned_dv_mor_erasure med 4.73 batched vs 4.43
grouped; others within noise). The per-group shape also probes fewer
rows per join (only the masked group's rows) and needs no composite
(key, gid) hash table. The experimental shape lives HERE so the
measurement stays reproducible; versioned.py keeps the grouped shape.

Run: python3 tools/dv_mask_ab.py [--sf DIR] [--passes N] [lane ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = [
    "versioned_dv_mor_erasure",
    "versioned_branch_staged_erasure",
    "versioned_incremental_agg_view",
    "versioned_wap_branch_publish",
]


def batched_read_dirs_masked(spark, m, dirs, with_pos=False):
    """The experimental batched shape (equivalence proven in the r11
    continuation session against 4 engineered tables incl. nested
    scopes, two key columns, and a dv+pdv mix — bit-identical rows)."""
    from pyspark.sql import functions as F

    from uts_spark.sources import versioned as V

    recs = m.get("dv", [])
    pdv = m.get("pdv", [])
    if not recs and not pdv:
        return V._scan_dirs(spark, m, dirs, with_pos=with_pos)
    use_pos = bool(pdv) or with_pos
    scopes = [set(r["scope"]) for r in recs]
    groups = {}
    for d in dirs:
        ks = tuple(i for i, s in enumerate(scopes) if d in s)
        groups.setdefault(ks, []).append(d)
    if sum(1 for ks in groups if ks) >= 2:
        gids = {ks: i for i, ks in enumerate(groups)}
        parts = [
            V._scan_dirs(spark, m, ds, with_pos=use_pos)
            .withColumn("__gid", F.lit(gids[ks]))
            for ks, ds in groups.items()
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        by_col = {}
        for i, r in enumerate(recs):
            gs = tuple(g for ks, g in gids.items() if i in ks)
            if gs:
                by_col.setdefault(r["key"], {}).setdefault(gs, []).append(r)
        for kcol, by_gs in by_col.items():
            kparts = [
                V._read_dv_keys(spark, grp, kcol).withColumn(
                    "__gid", F.explode(F.array(*[F.lit(g) for g in gs]))
                )
                for gs, grp in by_gs.items()
            ]
            keys = kparts[0]
            for p in kparts[1:]:
                keys = keys.unionByName(p)
            out = out.join(F.broadcast(keys), [kcol, "__gid"], "left_anti")
        out = out.drop("__gid")
    else:
        parts = []
        for ks, ds in groups.items():
            part = V._scan_dirs(spark, m, ds, with_pos=use_pos)
            if ks:
                part = V._apply_dv_masks(spark, [recs[i] for i in ks], part)
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    if pdv:
        pos = V._pdv_reader(spark).parquet(
            *[r["dir"] for r in pdv]
        ).select("__file", "__pos")
        out = out.join(F.broadcast(pos), ["__file", "__pos"], "left_anti")
    if use_pos and not with_pos:
        out = out.drop("__file", "__pos")
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    passes = 4
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i:i + 2]
    lanes = args or LANES

    from uts_spark.registry import QUERIES
    from uts_spark.session import get_spark
    from uts_spark.sources import versioned as V

    shipped = V._read_dirs_masked
    spark = get_spark("dv-mask-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in lanes:
        res = {"batched": [], "shipped": [], "batched_jobs": 0,
               "shipped_jobs": 0}
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for p in range(passes):
            order = (
                ("shipped", "batched") if p % 2 == 0
                else ("batched", "shipped")
            )
            for side in order:
                V._read_dirs_masked = (
                    batched_read_dirs_masked if side == "batched"
                    else shipped
                )
                group = f"ab-{name}-{side}-{p}"
                sc.setJobGroup(group, name)
                t0 = time.time()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                res[side].append(round(time.time() - t0, 3))
                res[f"{side}_jobs"] = len(tracker.getJobIdsForGroup(group))
        V._read_dirs_masked = shipped
        for s in ("batched", "shipped"):
            res[f"{s}_min"] = min(res[s])
            res[f"{s}_med"] = sorted(res[s])[len(res[s]) // 2]
        print(json.dumps({"lane": name, **res}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
