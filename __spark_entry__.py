"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (readme.md:31-39 shape: per-bin
mean over the events stream, zero-filled, newest-first) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator registry
(uts_spark/registry.py) — one entry per implemented operator from
SURVEY.md §2, each oracle encoding the reference's exact semantics.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from uts_spark.registry import QUERIES

    return QUERIES["uts_interval_mean_fill"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from uts_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from uts_spark.registry import ORACLES

    return dict(ORACLES)
