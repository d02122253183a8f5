"""uts_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mixer/uts (reference: /root/reference/uts.ts),
re-expressed Spark-first and extended with large-scale data-pipeline operators.

Design stance (SURVEY.md §7): this is NOT a port. ``TSDB``/``Series`` are a
thin facade whose ``query()`` *builds DataFrame plans*; Catalyst is the
parser/optimizer/executor. The reference's exact (and quirky) semantics live
in a small expression library (``uts_spark.operators.aggregates``), each
expressed as ordinary Column expressions so Catalyst can push down, prune,
and codegen them.
"""

from uts_spark.plans.tsdb import TSDB, Series
from uts_spark.session import get_spark

__all__ = ["TSDB", "Series", "get_spark"]
__version__ = "0.1.0"
