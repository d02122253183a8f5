"""Footer-statistics commit path (optimization r11): the versioned
commit verbs record row counts and integer min/max from the parquet
FOOTERS of the just-written dir instead of a read-back Spark scan.
These tests pin the contract that makes that safe:

- footer counts are exact for any schema;
- footer min/max is trusted ONLY for integer/boolean physical types
  (strings can be truncated in footers, float/double footers exclude
  NaN while Spark's max() sorts NaN highest) — everything else must
  fall back to the scan and return bit-identical values.
"""

import os

from pyspark.sql import functions as F

from uts_spark.sources.versioned import (
    _dir_count,
    _dir_footer_meta,
    _dir_stats,
)


def _write(spark, tmp_path, df, name):
    d = os.path.join(str(tmp_path), name)
    df.write.parquet(d)
    return d


def test_footer_count_matches_scan(spark, tmp_path):
    df = spark.range(0, 1234, 1, 3).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    d = _write(spark, tmp_path, df, "ints")
    assert _dir_count(spark, d) == 1234
    meta = _dir_footer_meta(d)
    assert meta is not None and meta[0] == 1234


def test_footer_stats_int_exact(spark, tmp_path):
    df = spark.range(0, 500, 1, 4).select(
        (F.col("id") * 3 - 100).alias("k")
    )
    d = _write(spark, tmp_path, df, "intstats")
    meta = _dir_footer_meta(d, "k")
    assert meta is not None and meta[2], "int column must footer-resolve"
    n, rng = _dir_stats(spark, d, "k")
    assert n == 500
    assert rng == [-100, 499 * 3 - 100]


def test_footer_stats_string_falls_back_to_scan(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"s{i:04d}") for i in range(50)], "k long, s string"
    )
    d = _write(spark, tmp_path, df, "strstats")
    meta = _dir_footer_meta(d, "s")
    assert meta is not None and not meta[2], (
        "string min/max must NOT be trusted from footers"
    )
    # the public helper still answers — via the scan — bit-identically
    n, rng = _dir_stats(spark, d, "s")
    assert n == 50
    assert rng == ["s0000", "s0049"]


def test_footer_stats_double_falls_back(spark, tmp_path):
    # double stats are scan-resolved (NaN ordering differs between
    # footer statistics and Spark's max)
    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, -2.0)], "k long, v double"
    )
    d = _write(spark, tmp_path, df, "dblstats")
    meta = _dir_footer_meta(d, "v")
    assert meta is not None and not meta[2]
    n, rng = _dir_stats(spark, d, "v")
    assert n == 3
    # Spark sorts NaN greatest — the scan path must preserve that
    assert rng[0] == -2.0 and str(rng[1]) == "nan"


def test_footer_stats_empty_dir(spark, tmp_path):
    df = spark.range(0, 10).filter(F.col("id") < 0).select(
        F.col("id").alias("k")
    )
    d = _write(spark, tmp_path, df, "empty")
    assert _dir_count(spark, d) == 0
    n, rng = _dir_stats(spark, d, "k")
    assert n == 0 and rng is None


def test_footer_meta_missing_dir_returns_none(spark, tmp_path):
    assert _dir_footer_meta(os.path.join(str(tmp_path), "nope")) is None
