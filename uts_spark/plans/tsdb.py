"""TSDB / Series facade: the reference's public API re-expressed as a
DataFrame-plan builder.

Reference lifecycle (SURVEY.md §2.1, §3): ``TSDB`` is a string-keyed
get-or-create registry of ``Series`` (uts.ts:523-555); ``Series.query``
filters → groups → folds → serializes newest-first (uts.ts:362-375);
``insert`` appends with a default-now timestamp (uts.ts:271-278);
``remove`` truncates or anti-filters (uts.ts:322-335); retention drops
points older than ``now - ttl`` (uts.ts:245-269).

Here ``query()`` BUILDS a lazy DataFrame plan: filter → bucket-index
groupBy → multi-aggregate → spine-fill → order. Catalyst handles pushdown,
pruning and codegen; the driver→executor boundary is crossed only at the
caller's terminal action. The reference's streaming single-pass
multi-aggregation (uts.ts:38-47) is exactly Spark's partial aggregation —
one scan feeds every metric.
"""

from __future__ import annotations

import time as _time
from typing import Any, Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from uts_spark.operators import aggregates as agg
from uts_spark.operators.aggregates import Metric
from uts_spark.operators.derivative import derivative_points_array
from uts_spark.plans import comparators as cmp
from uts_spark.plans.groupers import AnyGrouper, IntervalGrouper, interval


def _now_ms() -> int:
    return int(_time.time() * 1000)


class Series:
    """A named, time-ordered collection of points backed by a DataFrame.

    ``time_col`` plays the reference's reserved ``time`` column
    (uts.ts:179-181); ``order_col`` carries insertion order (the array
    order that ``last``/``map``/``reduce`` depend on, SURVEY §2.4 A6-A8).
    """

    def __init__(
        self,
        df: DataFrame,
        time_col: str = "time",
        order_col: str = "ingest_id",
        retention: int = 0,
        payload_col: str | None = None,
    ):
        self.df = df
        self.time_col = time_col
        self.order_col = order_col
        self.retention = retention
        # schemaless mode (SURVEY §1.3): point data lives in a
        # MAP<STRING,DOUBLE> column; a name that isn't a top-level column
        # resolves to payload[name], and an absent key yields NULL — which
        # is exactly the reference's missing-column semantics (pt.has
        # guards, never-match filters; SURVEY §2.3-2.4).
        self.payload_col = payload_col

    def resolve(self, name: str) -> Column:
        """Column-name resolver honoring payload (schemaless) mode."""
        if self.payload_col and name not in self.df.columns:
            return F.col(self.payload_col)[name]
        return F.col(name)

    # -- lifecycle ---------------------------------------------------------

    def set_retention(self, ttl: int) -> "Series":
        """TTL in time-column units; 0 disables (uts.ts:245-256). Applied as
        a read-time predicate at query() — the 100 TB equivalent of the
        reference's background sweep is a partition-pruned scan filter plus
        a periodic compaction job, not a row-at-a-time timer."""
        self.retention = ttl
        return self

    def compact(self, now: int | None = None) -> "Series":
        """Materialize retention: permanently drop expired points (the
        batch analog of the reference's background sweep, uts.ts:257-268).
        query() already applies retention at read time; compact() is the
        periodic job that reclaims storage — on a partitioned table this
        is a partition drop, not a rewrite."""
        if self.retention:
            cutoff = (now if now is not None else _now_ms()) - self.retention
            self.df = self.df.filter(F.col(self.time_col) >= F.lit(cutoff))
        return self

    def insert_rows(self, rows: list[dict], time: int | None = None) -> "Series":
        """Append points (test/driver convenience). Mirrors insert()'s
        default-now and never-sorts contract (uts.ts:271-278).

        The batch's ``order_col`` values are ``max(existing) + 1 + i``,
        derived LAZILY: the high-watermark rides as a broadcast 1-row
        aggregate joined onto the new rows, so insert_rows triggers no
        Spark job — the write path stays plan-only until the caller's
        terminal action (a per-insert ``df.count()`` here was a driver
        action per batch, VERDICT r2 #5)."""
        spark = self.df.sparkSession
        t = time if time is not None else _now_ms()
        prepared = []
        for i, r in enumerate(rows):
            r = dict(r)
            r.setdefault(self.time_col, t)
            r[self.order_col] = i  # local offset; rebased below
            prepared.append(r)
        new = spark.createDataFrame(prepared, schema=self.df.schema)
        hwm = self.df.agg(
            F.coalesce(F.max(self.order_col) + 1, F.lit(0)).alias("__base")
        )
        rebased = (
            new.crossJoin(F.broadcast(hwm))
            .withColumn(self.order_col, F.col(self.order_col) + F.col("__base"))
            .drop("__base")
        )
        self.df = self.df.unionByName(rebased, allowMissingColumns=True)
        return self

    def remove(self, where: cmp.WhereClause | None = None) -> "Series":
        """No arg: truncate (uts.ts:327-330). With arg: delete matching rows,
        keeping missing-column points (uts.ts:332-334; F3 rule)."""
        if where is None:
            self.df = self.df.limit(0)
        else:
            self.df = self.df.filter(
                cmp.keep_predicate_for_remove(where, resolve=self.resolve)
            )
        return self

    # -- query -------------------------------------------------------------

    def query(
        self,
        metrics: Mapping[str, Metric],
        where: cmp.WhereClause | None = None,
        group: IntervalGrouper | AnyGrouper | None = None,
        now: int | float | None = None,
    ) -> DataFrame:
        """Build the query plan: filter → group → fold → serialize.

        Returns a DataFrame with one column per metric (aliased to the
        metric's dict key); interval grouping adds ``start``/``width``
        metadata columns and newest-first ordering (uts.ts:124-130).
        """
        df = self.df
        tcol = F.col(self.time_col)

        group = group or AnyGrouper()
        if now is None:
            now = getattr(group, "now", None)
        if now is None:
            now = _now_ms()

        if self.retention:
            df = df.filter(tcol >= F.lit(now - self.retention))

        pred = cmp.compile_where(where, resolve=self.resolve)
        if pred is not None:
            df = df.filter(pred)

        scalar = {k: m for k, m in metrics.items() if m.kind != "derivative"}
        derivs = {k: m for k, m in metrics.items() if m.kind == "derivative"}

        if isinstance(group, AnyGrouper):
            return self._query_global(df, scalar, derivs)
        return self._query_interval(df, scalar, derivs, group, where, now)

    # -- global (AnyGrouper) ----------------------------------------------

    def _point_struct(self, df) -> Column:
        """Full-row struct for map(fn)/reduce(fn) — the reference's ``pt``
        (uts.ts:183-189). Internal plan columns are excluded."""
        return F.struct(*[c for c in df.columns if not c.startswith("__")])

    def _query_global(self, df, scalar, derivs) -> DataFrame:
        parts = []
        if scalar:
            ps = self._point_struct(df)
            exprs = [
                agg.agg_expr(
                    m, resolve=self.resolve, order_col=self.order_col,
                    point_struct=ps,
                ).alias(k)
                for k, m in scalar.items()
            ]
            parts.append(df.agg(*exprs))  # global agg: always exactly 1 row
        for k, m in derivs.items():
            parts.append(
                derivative_points_array(
                    df, m.col, m.interval, self.time_col, self.order_col
                ).withColumnRenamed("points", k)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.crossJoin(p)  # all single-row: trivially cheap
        return out

    # -- interval grouping -------------------------------------------------

    def _query_interval(self, df, scalar, derivs, g: IntervalGrouper, where, now):
        w = int(g.interval)
        tcol = F.col(self.time_col)
        # points after `now` are dropped (uts.ts:133-136). NOTE deliberate
        # divergence: the reference also drops *older* points appended after
        # a future-stamped one (array-order break); we keep them — strictly
        # more correct, documented in SURVEY §7.
        df = df.filter(tcol <= F.lit(now))
        idx = F.floor((F.lit(now) - tcol) / F.lit(w)).cast("long")
        binned = df.withColumn("__bin", idx)

        ps = self._point_struct(binned)
        exprs = [
            agg.agg_expr(
                m, resolve=self.resolve, order_col=self.order_col,
                point_struct=ps,
            ).alias(k)
            for k, m in scalar.items()
        ]
        agged = binned.groupBy("__bin").agg(*exprs) if scalar else None

        deriv_parts = {}
        for k, m in derivs.items():
            deriv_parts[k] = derivative_points_array(
                binned, m.col, m.interval, self.time_col, self.order_col,
                group_cols=["__bin"],
            ).withColumnRenamed("points", k)

        joined = agged
        for k, part in deriv_parts.items():
            joined = part if joined is None else joined.join(part, "__bin", "full")

        if g.fill:
            spine = self._bin_spine(df, where, now, w)
            joined = spine.join(joined, "__bin", "left")
            fills = []
            for k, m in scalar.items():
                vt = self._value_type(m.col) if m.col not in (None, "*") else "double"
                fills.append(
                    F.coalesce(F.col(k), agg.initial_value_expr(m, vt)).alias(k)
                )
            for k, m in derivs.items():
                vt = self._value_type(m.col)
                empty = F.array().cast(f"array<struct<time:{self._time_type()},value:double>>")
                fills.append(F.coalesce(F.col(k), empty).alias(k))
            joined = joined.select("__bin", *fills)

        start = (
            F.lit(now).cast("long")
            - (F.col("__bin") + 1) * F.lit(w).cast("long")
        ).alias("start")
        out = joined.select(
            start,
            F.lit(w).cast("long").alias("width"),
            *[F.col(k) for k in list(scalar) + list(derivs)],
        )
        return out.orderBy(F.desc("start"))

    def _bin_spine(self, filtered: DataFrame, where, now, w: int) -> DataFrame:
        """All bin indices 0..n-1 (uts.ts:124-130). n from the first
        ``time >`` bound (uts.ts:113-119) else the oldest filtered point.
        Built from a 1-row aggregate → explode: never touches the raw data
        again and broadcasts against the (already aggregated) bin results."""
        lower = cmp.time_lower_bound(where, self.time_col)
        if lower is not None:
            n = int((now - lower) // w) + 1
            spine = filtered.sparkSession.range(1).select(
                F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("__bin")
            )
            return spine
        # empty series + no bound: reference throws TypeError (uts.ts:118);
        # we return an empty spine → empty result (documented divergence).
        bounds = filtered.agg(F.min(self.time_col).alias("__t0"))
        n_col = (F.floor((F.lit(now) - F.col("__t0")) / F.lit(w)) + 1).cast("long")
        return bounds.select(
            F.explode(F.sequence(F.lit(0), n_col - 1)).alias("__bin")
        )

    # -- helpers -----------------------------------------------------------

    def _value_type(self, col: str) -> str:
        return dict(self.df.dtypes).get(col, "double")

    def _time_type(self) -> str:
        return dict(self.df.dtypes)[self.time_col]


class TSDB:
    """Top-level registry (uts.ts:523-555) + aggregate factory statics
    (uts.ts:556-648)."""

    # factory statics, mirroring the reference's public names
    mean = staticmethod(agg.mean)
    sum = staticmethod(agg.sum_)
    max = staticmethod(agg.max_)
    min = staticmethod(agg.min_)
    count = staticmethod(agg.count)
    last = staticmethod(agg.last)
    map = staticmethod(agg.map_)
    reduce = staticmethod(agg.reduce_)
    derivative = staticmethod(agg.derivative)
    interval = staticmethod(interval)

    def __init__(self, spark: SparkSession, default_retention: int = 0):
        self.spark = spark
        self._series: dict[str, Series] = {}
        self._default_retention = default_retention

    def default_retention(self, ttl: int) -> "TSDB":
        self._default_retention = ttl
        return self

    def series(
        self,
        name: str,
        df: DataFrame | None = None,
        time_col: str = "time",
        order_col: str = "ingest_id",
        payload_col: str | None = None,
    ) -> Series:
        """Get-or-create (uts.ts:540-547). Pass ``df`` to attach an existing
        table (the 100 TB path: a partitioned parquet/Delta table);
        ``payload_col`` names a MAP<STRING,DOUBLE> column for schemaless
        series (SURVEY §1.3)."""
        if name not in self._series:
            if df is None:
                schema = f"{order_col} long, {time_col} long"
                if payload_col:
                    schema += f", {payload_col} map<string,double>"
                df = self.spark.createDataFrame([], schema=schema)
            self._series[name] = Series(
                df, time_col, order_col, self._default_retention,
                payload_col=payload_col,
            )
        return self._series[name]

    def destroy(self) -> None:
        self._series.clear()
