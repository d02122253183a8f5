#!/usr/bin/env python3
"""Scale smoke beyond the driver testdata: generate N synthetic events
JVM-SIDE (spark.range + hash-derived columns — no Python in the data
path, no files) and time the core operator families on them. sf0.1
events is 600k rows; default here is 20M (~33×), demonstrating the
same plans at a scale where a driver-side or single-partition mistake
would be minutes, not noise.

Run: python3 tools/scale_smoke.py [rows]
Prints one JSON line {"rows": N, "timings": {op: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from uts_spark.session import get_spark

    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # registry must load BEFORE any direct queries-module import (the
    # circular-import trap: entering sketch_ops first leaves a partial
    # module in sys.modules and the registry floor fires)
    import uts_spark.registry  # noqa: F401

    t0 = 1_700_000_000_000
    ev = spark.range(rows).select(
        F.col("id").alias("ingest_id"),
        (F.lit(t0) + F.col("id") * 50
         + F.pmod(F.xxhash64("id"), 40_000)).alias("ts_ms"),
        F.pmod(F.xxhash64("id", F.lit(1)), 5_000).alias("user_id"),
        F.concat(F.lit("t"), F.pmod(F.xxhash64("id", F.lit(2)), 8)
                 .cast("string")).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 1_000_000) / 100.0
         ).alias("value"),
    )

    from uts_spark.operators.aggregates import Metric
    from uts_spark.operators.timeseries import ohlc
    from uts_spark.plans.groupers import interval
    from uts_spark.plans.tsdb import Series

    now = t0 + rows * 50 + 40_000
    HOUR = 3_600_000

    def uts_interval(df):
        s = Series(df, time_col="ts_ms", order_col="ingest_id")
        return s.query(
            {"mean_value": Metric("mean", "value", params={"stable": True}),
             "n": Metric("count")},
            group=interval(24 * HOUR, fill=True, now=now),
        )

    def _equidepth(df):
        from uts_spark.operators.distributed_rank import (
            ntile_from_rank,
            ranked_cumsum,
        )

        r = ranked_cumsum(
            df.select("value", "ingest_id"),
            F.col("value"),
            [F.asc("value"), F.asc("ingest_id")],
            n_buckets=128,
            sample_mod=512,
        )
        d = r.select(
            "value", ntile_from_rank(F.col("__rank"), F.col("__n"), 10).alias("decile")
        )
        return d.groupBy("decile").agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )

    def _funnel_step(df):
        from uts_spark.operators.joins import binned_range_join

        DAY = 86_400_000
        s = df.filter(F.col("event_type") == "t0").select(
            "user_id", F.col("ingest_id").alias("sid"),
            F.col("ts_ms").alias("t1"),
        )
        c = df.filter(F.col("event_type") == "t1").select(
            "user_id", F.col("ingest_id").alias("cid"),
            F.col("ts_ms").alias("tc"),
        )
        j = binned_range_join(
            s, c,
            left_lo=F.col("t1") + 1, left_hi=F.col("t1") + DAY,
            right_ts=F.col("tc"), bin_width=DAY, keys=["user_id"],
        )
        return j.groupBy("user_id", "sid").agg(
            F.min(F.struct("tc", "cid")).alias("__first")
        )

    def _funnel_step_arrays(df):
        from uts_spark.operators.joins import binned_first_after

        DAY = 86_400_000
        s = df.filter(F.col("event_type") == "t0").select(
            "user_id", F.col("ingest_id").alias("sid"),
            F.col("ts_ms").alias("t1"),
        )
        c = df.filter(F.col("event_type") == "t1").select(
            "user_id", F.col("ingest_id").alias("cid"),
            F.col("ts_ms").alias("tc"),
        )
        return binned_first_after(
            s, c, F.col("t1"), F.col("tc"), DAY, ["user_id"],
            right_payload=["cid"],
        )

    ops = {
        "uts_interval_mean_fill_24h": uts_interval,
        "ohlc_hourly": lambda df: ohlc(
            df, "event_type", "ts_ms", "value", HOUR, "ingest_id"
        ),
        "session_windows_30m": lambda df: (
            df.withColumn("ts", F.timestamp_millis("ts_ms"))
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
        ),
        "topk_global_100": lambda df: df.orderBy(
            F.desc("value"), F.asc("ingest_id")
        ).limit(100),
        "distinct_users": lambda df: df.agg(
            F.count_distinct("user_id").alias("u")
        ),
        # NOTE: unboundedPreceding, not a huge bounded lower bound — a
        # bounded frame (even one larger than any partition) drops Spark
        # to the sliding-frame path that re-aggregates per row: measured
        # 566 s vs 5 s on this exact query at 20M rows. Running totals
        # must say UNBOUNDED to get the O(1)-per-row accumulator.
        "window_running_sum_per_user": lambda df: df.select(
            "user_id", "ts_ms",
            F.sum(F.col("value").cast("decimal(38,6)")).over(
                Window.partitionBy("user_id")
                .orderBy("ts_ms", "ingest_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ).cast("double").alias("rs"),
        ),
        # r4: the distributed exact-rank operator at smoke scale — an
        # exact global decile assignment over every row with ZERO
        # single-partition windows (the plan a naive ntile would
        # serialize through one task at this size)
        "equidepth_deciles_distributed": _equidepth,
        # r4b: the binned-range-join machinery (window funnel step):
        # first t1-event → first t2-event within 24h, per user — each
        # left row explodes to ≤2 day-buckets, never a per-user cross
        # join; survivor count shrinks per step
        "window_funnel_step_24h": _funnel_step,
        # r4b A/B: the bounded variant (per-(user, bucket) sorted array,
        # join width ∝ instances x 2) — same first-match output
        "window_funnel_step_24h_arrays": _funnel_step_arrays,
    }

    # ---- r5 (VERDICT r4 #8): the eight newest operator families at
    # smoke scale. Each lane reproduces the registered query's plan
    # shape on synthetic JVM-side inputs sized from `rows`.
    from uts_spark.functions.hashing import hash64

    DAY = 86_400_000

    def _hll_daily(df):
        # own-HLL register fold: input-sized map, <=256-rows/day shuffle
        MASK = (1 << 52) - 1
        elem = F.concat(F.lit("h:"), F.col("user_id").cast("string"))
        rest = hash64(elem).bitwiseAND(F.lit(MASK))
        rh = df.select(
            F.floor(F.col("ts_ms") / F.lit(DAY)).cast("long").alias("day"),
            F.shiftright(hash64(elem), 52).alias("bucket"),
            F.when(rest == 0, F.lit(53))
            .otherwise(F.lit(53) - F.length(F.conv(rest, 10, 2)))
            .alias("rho"),
        )
        regs = rh.groupBy("day", "bucket").agg(F.max("rho").alias("reg"))
        term = F.expr("CAST(power(2.0, 53 - reg) AS BIGINT)")
        return regs.groupBy("day").agg(
            (F.sum(term) + (F.lit(256) - F.count("*")) * F.lit(1 << 53))
            .alias("reg_sum")
        )

    def _qdigest(df):
        # mergeable decimation digest: 32 shard sorts + decimated merge
        from uts_spark.operators.distributed_rank import ranked_cumsum

        sh = df.select(
            F.col("ingest_id").alias("uid"), F.col("value").alias("v")
        ).withColumn(
            "shard", F.pmod(hash64(F.col("uid").cast("string")), F.lit(32))
        )
        wsh = Window.partitionBy("shard").orderBy("v", "uid")
        rk = sh.select(
            "v", "uid",
            F.row_number().over(wsh).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("shard")).alias("ns"),
        )
        kept = rk.filter((F.col("rn") - 1) % 16 == 0).select(
            "v", "uid",
            F.least(F.lit(16), F.col("ns") - F.col("rn") + 1).alias("w"),
        )
        samp = ranked_cumsum(
            kept, F.col("v"), [F.col("v").asc(), F.col("uid").asc()],
            values={"w": F.col("w")},
        )
        qdf = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
        target = F.greatest(F.ceil(F.col("q") * F.col("tot_w")), F.lit(1))
        return (
            samp.crossJoin(F.broadcast(qdf))
            .filter(F.col("cum_w") >= target)
            .groupBy("q")
            .agg(F.min_by("v", "cum_w").alias("est"))
        )

    def _interval_overlap(df):
        # sessions x busy-hour incidents, canonical-cell grid join
        G = 6 * HOUR
        GAP = 30 * 60 * 1000
        hours = max(1, rows * 50 // HOUR)
        k_busy = max(1, rows // 8 // hours)
        wu = Window.partitionBy("user_id").orderBy("ts_ms")
        flg = df.select(
            "user_id", "ts_ms",
            F.when(
                F.lag("ts_ms").over(wu).isNull()
                | (F.col("ts_ms") - F.lag("ts_ms").over(wu) > GAP),
                1,
            ).otherwise(0).alias("f"),
        )
        sid = flg.withColumn(
            "sid",
            F.sum("f").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
        )
        sessions = sid.groupBy("user_id", "sid").agg(
            F.min("ts_ms").alias("s_start"), F.max("ts_ms").alias("s_end")
        )
        hourly = df.groupBy(
            "event_type",
            F.floor(F.col("ts_ms") / F.lit(HOUR)).cast("long").alias("hr"),
        ).count()
        busy = hourly.filter(F.col("count") >= k_busy)
        wt = Window.partitionBy("event_type").orderBy("hr")
        incidents = (
            busy.select(
                "event_type", "hr",
                (F.col("hr") - F.row_number().over(wt)).alias("island"),
            )
            .groupBy("event_type", "island")
            .agg(
                (F.min("hr") * HOUR).alias("i_start"),
                ((F.max("hr") + 1) * HOUR - 1).alias("i_end"),
            )
        )
        a = sessions.withColumn(
            "cell",
            F.explode(F.sequence(
                F.floor(F.col("s_start") / F.lit(G)).cast("long"),
                F.floor(F.col("s_end") / F.lit(G)).cast("long"),
            )),
        )
        b = incidents.withColumn(
            "cell",
            F.explode(F.sequence(
                F.floor(F.col("i_start") / F.lit(G)).cast("long"),
                F.floor(F.col("i_end") / F.lit(G)).cast("long"),
            )),
        )
        return (
            a.join(b, "cell")
            .filter(
                (F.col("s_start") <= F.col("i_end"))
                & (F.col("i_start") <= F.col("s_end"))
                & (
                    F.col("cell")
                    == F.floor(
                        F.greatest("s_start", "i_start") / F.lit(G)
                    ).cast("long")
                )
            )
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_overlaps"))
        )

    def _maxsim(_df):
        # ColBERT MaxSim: 4 chunks x 16 dims, 8 broadcast anchors
        n_vec = max(1000, rows // 400)
        vec = spark.range(n_vec).select(
            F.col("id").alias("vec_id"),
            F.array(*[
                (F.pmod(F.xxhash64("id", F.lit(d)), 2001) - 1000) / 1000.0
                for d in range(64)
            ]).alias("embedding"),
        )
        chunk_arr = F.array(*[
            F.slice(F.col("embedding"), i * 16 + 1, 16) for i in range(4)
        ])
        ch = vec.select(
            "vec_id", F.posexplode(chunk_arr).alias("ci", "chunk")
        )
        dot = F.aggregate(
            F.zip_with(F.col("chunk"), F.col("qchunk"), lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        q = ch.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("ci").alias("qi"),
            F.col("chunk").alias("qchunk"),
        )
        per_qi = (
            ch.crossJoin(F.broadcast(q))
            .filter(F.col("anchor_id") != F.col("vec_id"))
            .withColumn("cos", dot)
            .groupBy("anchor_id", "vec_id", "qi")
            .agg(F.max("cos").alias("best"))
        )
        scored = per_qi.groupBy("anchor_id", "vec_id").agg(
            F.sum("best").alias("maxsim")
        )
        wr = Window.partitionBy("anchor_id").orderBy(
            F.desc("maxsim"), F.asc("vec_id")
        )
        return scored.withColumn("rk", F.row_number().over(wr)).filter(
            F.col("rk") <= 3
        )

    def _lpa(_df):
        # 4 synchronous plurality rounds over a hash graph
        n_nodes = 50_000
        edges_half = spark.range(max(1000, rows // 20)).select(
            F.pmod(F.xxhash64("id", F.lit(51)), n_nodes).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(52)), n_nodes).alias("dst"),
        ).filter(F.col("src") != F.col("dst")).distinct()
        edges = edges_half.unionByName(
            edges_half.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        ).localCheckpoint(eager=True)
        labels = edges.select(F.col("src").alias("node")).distinct(
        ).withColumn("label", F.col("node"))
        for _ in range(4):
            votes = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy(F.col("src").alias("v"), "label")
                .count()
            )
            wv = Window.partitionBy("v").orderBy(
                F.col("count").desc(), F.col("label").asc()
            )
            labels = (
                votes.withColumn("rn", F.row_number().over(wv))
                .filter(F.col("rn") == 1)
                .select(F.col("v").alias("node"), "label")
                .localCheckpoint(eager=True)
            )
        return labels.groupBy("label").agg(F.count(F.lit(1)).alias("csize"))

    _VOCAB_WORDS = [
        "".join(chr(97 + (i * 7 + j * 13) % 26) for j in range(5))
        for i in range(2000)
    ]

    def _bpe_train(_df):
        # 3 merge rounds: corpus tokenize is the only input-sized pass
        from uts_spark.queries.sketch_ops import (
            _bpe_merge_round,
            _bpe_word_table,
        )

        vocab = F.array(*[F.lit(w) for w in _VOCAB_WORDS])
        docs = spark.range(max(1000, rows // 10)).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[
                F.element_at(
                    vocab,
                    (F.pmod(F.xxhash64("id", F.lit(j)), 2000) + 1).cast("int"),
                )
                for j in range(10)
            ]).alias("text"),
        )
        words = _bpe_word_table(docs)
        for _ in range(3):
            _top, words = _bpe_merge_round(words)
        return words.agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.size(F.split("seg", r"\|")) * F.col("freq")).alias(
                "corpus_symbols"
            ),
        )

    def _bpe_pretrained(_df):
        # 1024-merge pretrained apply: all string work on the DISTINCT
        # word table (2000 synthetic 5-char words), one corpus join.
        # tokens/sec = corpus_tokens / wall below (SCALE.md records it).
        from uts_spark.functions.bpe_pretrained import (
            pretrained_merges,
            pretrained_vocab_ids,
        )

        ranks = {p: r for r, p in enumerate(pretrained_merges())}
        ids = pretrained_vocab_ids()
        vocab = F.array(*[F.lit(w) for w in _VOCAB_WORDS])
        dw = spark.range(max(1000, rows // 10)).select(
            F.col("id").alias("doc_id"),
            F.posexplode(F.array(*[
                F.element_at(
                    vocab,
                    (F.pmod(F.xxhash64("id", F.lit(j)), 2000) + 1).cast("int"),
                )
                for j in range(10)
            ])).alias("p", "word"),
        ).select("doc_id", "word", (F.col("p") + 1).cast("long").alias("pos"))

        def apply_batches(batches):
            import pandas as pd

            from uts_spark.functions.bpe_pretrained import (
                bpe_apply_lowest_rank,
            )

            for pdf in batches:
                words = pdf["word"].tolist()
                n_tok, idsum = [], []
                for w in words:
                    toks = bpe_apply_lowest_rank(w, ranks)
                    n_tok.append(len(toks))
                    idsum.append(sum(ids[t] for t in toks))
                yield pd.DataFrame(
                    {"word": words, "n_tok": n_tok, "idsum": idsum}
                )

        wtok = dw.select("word").distinct().mapInPandas(
            apply_batches, "word string, n_tok long, idsum long"
        )
        return dw.join(wtok, "word").groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(F.col("pos") * F.col("idsum")).alias("tok_checksum"),
        )

    def _bpe_bytes(_df):
        # byte-level 512-merge pretrained apply over MIXED text (the
        # round-7 lane): same distinct-pretoken shape; the synthetic
        # docs get the query's own casing/punct/unicode derivation so
        # the pre-token vocabulary is realistic, not [a-z]+ words.
        from uts_spark.queries.sketch_ops import (
            _MIXED_SQL,
            _PRETOK_RE,
            _bpe_byte_pretoken_tokens,
        )

        vocab = F.array(*[F.lit(w) for w in _VOCAB_WORDS])
        docs = spark.range(max(1000, rows // 10)).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[
                F.element_at(
                    vocab,
                    (F.pmod(F.xxhash64("id", F.lit(j)), 2000) + 1).cast("int"),
                )
                for j in range(10)
            ]).alias("text"),
        )
        mixed = F.expr(_MIXED_SQL.format(styp="STRING"))
        dpts = docs.select(
            "doc_id",
            F.posexplode(
                F.regexp_extract_all(mixed, F.lit(_PRETOK_RE), 0)
            ).alias("p", "pt"),
        ).select(
            "doc_id", "pt", (F.col("p") + 1).cast("long").alias("pos")
        )
        ptok = _bpe_byte_pretoken_tokens(dpts.select("pt").distinct())
        return dpts.join(ptok, "pt").groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_pretokens"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(F.col("pos") * F.col("idsum")).alias("tok_checksum"),
        )

    def _checksum_recon(_df):
        # XOR bucket checksums + drilldown only into bad buckets
        o = spark.range(rows).select(
            F.col("id").alias("k"),
            (F.pmod(F.xxhash64("id", F.lit(9)), 1_000_000) / 100.0)
            .alias("price"),
        )
        drift = o.filter(F.col("k") % 997 != 7).withColumn(
            "price",
            F.col("price")
            + F.when(F.col("k") % 997 == 13, F.lit(1.0)).otherwise(F.lit(0.0)),
        )
        fp = hash64(F.concat_ws(
            "|", F.col("k").cast("string"),
            F.floor(F.col("price") * 100 + 0.5).cast("long").cast("string"),
        ))
        bucket = F.pmod(hash64(F.concat(F.lit("b:"), F.col("k").cast("string"))), F.lit(64))

        def side(df, n, x):
            return df.select(F.col("k"), bucket.alias("bucket"), fp.alias("fp")) \
                .groupBy("bucket").agg(
                    F.count(F.lit(1)).alias(n), F.bit_xor("fp").alias(x))

        v1 = o.select("k", bucket.alias("bucket"), fp.alias("fp"))
        v2 = drift.select("k", bucket.alias("bucket"), fp.alias("fp"))
        bad = (
            side(o, "n1", "x1").join(side(drift, "n2", "x2"), "bucket", "full")
            .filter(
                (F.coalesce("n1", F.lit(0)) != F.coalesce("n2", F.lit(0)))
                | ~F.col("x1").eqNullSafe(F.col("x2"))
            )
            .select("bucket")
        )
        d1 = v1.join(F.broadcast(bad), "bucket", "semi")
        d2 = v2.join(F.broadcast(bad), "bucket", "semi").select(
            F.col("k").alias("k2"), F.col("fp").alias("fp2")
        )
        return (
            d1.join(d2, d1["k"] == d2["k2"], "full")
            .filter(
                F.col("k").isNull() | F.col("k2").isNull()
                | (F.col("fp") != F.col("fp2"))
            )
            .groupBy(F.col("k").isNull().alias("extra"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def _stream_hll(df):
        # the watermarked streaming register fold through real
        # micro-batches (4 files + 2 sentinel feeds)
        from uts_spark.queries.streaming_replay import _replay

        MASK = (1 << 52) - 1
        elem = F.concat(F.lit("sh:"), F.col("user_id").cast("string"))
        rest = hash64(elem).bitwiseAND(F.lit(MASK))
        src = df.select(
            F.timestamp_millis(F.col("ts_ms")).alias("ts"),
            F.shiftright(hash64(elem), 52).alias("bucket"),
            F.when(rest == 0, F.lit(53))
            .otherwise(F.lit(53) - F.length(F.conv(rest, 10, 2)))
            .alias("rho"),
        )
        max_ms = t0 + rows * 50 + 40_000
        sentinels = [
            spark.createDataFrame([(ms,)], "ms long").select(
                F.timestamp_millis(F.col("ms")).alias("ts"),
                F.lit(0).cast("long").alias("bucket"),
                F.lit(1).alias("rho"),
            )
            for ms in (max_ms + 100 * DAY, max_ms + 101 * DAY)
        ]

        def build(stream):
            out = (
                stream.withWatermark("ts", "60 days")
                .groupBy(F.window("ts", "1 day"), "bucket")
                .agg(F.max("rho").alias("reg"))
            )
            return (
                out.select(
                    F.unix_millis(F.col("window.start")).alias("day"),
                    "bucket", "reg",
                ),
                "append",
            )

        return _replay(spark, src, build, extra_feeds=sentinels)

    ops.update({
        "hll_daily_registers": _hll_daily,
        "quantile_digest_32x16": _qdigest,
        "interval_overlap_grid": _interval_overlap,
        "maxsim_colbert_top3": _maxsim,
        "label_propagation_4r": _lpa,
        "bpe_train_3_rounds": _bpe_train,
        "bpe_pretrained_apply_1024": _bpe_pretrained,
        "bpe_bytes_apply_512": _bpe_bytes,
        "checksum_reconciliation": _checksum_recon,
        "streaming_hll_replay": _stream_hll,
    })

    only = set(sys.argv[2:])  # optional family-name filter
    if only:
        unknown = only - set(ops)
        if unknown:
            raise SystemExit(f"unknown families: {sorted(unknown)}")
        ops = {n: f for n, f in ops.items() if n in only}

    timings = {}
    for name, fn in ops.items():
        t = time.time()
        fn(ev).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t, 2)
    print(json.dumps(
        {"rows": rows, "loadavg": os.getloadavg()[0], "timings": timings}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
