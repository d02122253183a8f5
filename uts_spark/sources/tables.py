"""Parquet table loaders for the driver's TPC-H-ish testdata
(/root/repo/TESTDATA.md) and general parquet sources.

The reference has NO storage layer (purely in-memory arrays,
/root/reference/uts.ts:243); our sources are columnar parquet — the scan
is where 100 TB performance is won or lost, so loaders keep everything
declarative: filters and projections land in the scan (PushedFilters /
ReadSchema in ``.explain``), and partition-level pruning comes free when
tables are laid out by date/key.

Gotcha handled here: ``events.parquet`` has shipped with BOTH
TIMESTAMP(NANOS) (Spark rejects by default → ``nanosAsLong`` conf reads it
as LONG nanos) and TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ) across
driver testdata generations, so the loader branches on the actual read
dtype and normalizes either to an epoch-ms column (``ts_ms`` — the
reference's time unit) plus a proper session-TZ timestamp.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# schema per path tuple, inferred once per process and re-validated
# against the paths' (mtime_ns, size) stat signature — the CATALOG
# role: every bare ``spark.read.parquet`` call launches a plan-time
# footer-inference Spark job (measured 0.13-1.8 s per load_table call,
# optimization r11, guide §1.2), and at 100 TB a query never re-lists
# footers to learn a schema the catalog already knows. One entry per
# DISTINCT path tuple (a mutated path replaces its entry, it never
# accumulates one — append loops stay bounded); holds METADATA only
# (never rows), recomputed from the parquet inputs in every fresh
# process.
_SCHEMA_CACHE: dict[tuple, tuple] = {}


def parquet_cached_schema(spark: SparkSession, *paths: str) -> DataFrame:
    """``spark.read.parquet(*paths)`` with the inference job paid at
    most once per process per input signature (plain inference when a
    path cannot be stat'd)."""
    try:
        key = tuple(os.path.abspath(p) for p in paths)
        sig = tuple(
            (s.st_mtime_ns, s.st_size)
            for p in key
            for s in (os.stat(p),)
        )
    except OSError:
        return spark.read.parquet(*paths)
    hit = _SCHEMA_CACHE.get(key)
    if hit is not None and hit[0] == sig:
        return spark.read.schema(hit[1]).parquet(*paths)
    df = spark.read.parquet(*paths)
    _SCHEMA_CACHE[key] = (sig, df.schema)
    return df


TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` re-exposed as TIMESTAMP plus ``ts_ms`` (epoch ms)
    and ``ingest_id`` (= event_id: the generator's insertion order)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = parquet_cached_schema(spark, os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        # TIMESTAMP(NANOS) generation, read as LONG nanos.
        # integer `div`, NOT `/`: epoch-ns exceeds 2^53, double division
        # loses precision and lands a millisecond off the DuckDB oracle
        ts_col = F.timestamp_micros(F.expr("CAST(ts AS BIGINT) div 1000"))
        ms_col = F.expr("CAST(ts AS BIGINT) div 1000000")
    else:
        # TIMESTAMP(MICROS) generation (TIMESTAMP_NTZ); session TZ is UTC
        # so the cast is instant-preserving
        ts_col = F.col("ts").cast("timestamp")
        ms_col = F.unix_millis(F.col("ts").cast("timestamp"))
    return raw.select(
        "event_id",
        ts_col.alias("ts"),
        ms_col.alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
        "props",
        F.col("event_id").alias("ingest_id"),
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return parquet_cached_schema(
        spark, os.path.join(sf_dir, f"{name}.parquet")
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for spark.sql-style queries)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
