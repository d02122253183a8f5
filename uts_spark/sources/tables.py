"""Parquet table loaders for the driver's TPC-H-ish testdata
(/root/repo/TESTDATA.md) and general parquet sources.

The reference has NO storage layer (purely in-memory arrays,
/root/reference/uts.ts:243); our sources are columnar parquet — the scan
is where 100 TB performance is won or lost, so loaders keep everything
declarative: filters and projections land in the scan (PushedFilters /
ReadSchema in ``.explain``), and partition-level pruning comes free when
tables are laid out by date/key.

Gotcha handled here: ``events.parquet`` carries TIMESTAMP(NANOS) which
Spark rejects by default; ``spark.sql.legacy.parquet.nanosAsLong`` (a
runtime conf) reads it as LONG nanos, which we normalize to both an epoch-ms
column (``ts_ms`` — the reference's time unit) and a proper timestamp.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # integer `div`, NOT `/`: epoch-ns exceeds 2^53, double division loses
    # precision and lands a millisecond off the DuckDB oracle
    return raw.select(
        "event_id",
        F.timestamp_micros(F.expr("CAST(ts AS BIGINT) div 1000")).alias("ts"),
        F.expr("CAST(ts AS BIGINT) div 1000000").alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
        "props",
        F.col("event_id").alias("ingest_id"),
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for spark.sql-style queries)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
