#!/usr/bin/env python3
"""Language-router throughput at synthetic scale: ulang_id (the
script-gated unicode cascade) over N docs with a deterministic
8-language mix — the map-only crawl-front lane, so the number that
matters is docs/sec through one full pass. Run:
python3 tools/router_smoke.py [n_docs]
Prints one JSON line (recorded in SCALE.md)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PREFIXES = [
    ("en", "the cat is in that house and it is for a while"),
    ("de", "der kleine Hund und die Katze ist ein schönes Tier mit von"),
    ("fr", "le café est dans la rue et les amis pour que une vie"),
    ("es", "el niño y la niña es un jardín en los árboles por una"),
    ("ru", "и это не дом в котором мы были с ними и у них"),
    ("el", "και αυτό είναι ένα σπίτι με τον στο για τα και δεν"),
    ("ja", "これは とても きれい です ね そして わたし の"),
    ("zh", "東京都是一個大城市和這裡的人們都很好"),
]


def main() -> None:
    from pyspark.sql import functions as F

    from uts_spark.functions.text import ulang_id
    from uts_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark("router-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    label = None
    text = None
    for i, (lab, pre) in enumerate(PREFIXES):
        cond = F.pmod(F.col("id"), F.lit(8)) == i
        w_lab = F.when(cond, F.lit(lab))
        w_txt = F.when(cond, F.lit(pre))
        label = w_lab if label is None else label.when(cond, F.lit(lab))
        text = w_txt if text is None else text.when(cond, F.lit(pre))
    filler = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(j)), F.lit(997)))
            for j in range(8)
        ],
    )
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        label.alias("label"),
        F.concat(text, F.lit(" "), filler).alias("utext"),
    ).cache()
    docs.count()

    t0 = time.time()
    conf = (
        docs.select("label", ulang_id(F.col("utext")).alias("pred"))
        .groupBy("label", "pred")
        .count()
    ).collect()
    wall = time.time() - t0
    correct = sum(r["count"] for r in conf if r["label"] == r["pred"])
    print(json.dumps({
        "docs": n,
        "wall_sec": round(wall, 2),
        "docs_per_sec": int(n / wall),
        "accuracy": round(correct / n, 4),
        "loadavg": os.getloadavg()[0],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
