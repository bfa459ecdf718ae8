"""Fluent Table-API front-end — the reference's second query surface.

The reference builds its sliding job with Flink's fluent Table API and
string expression DSL (flink/sliding_window.py:154-183):

    input_table.window(
        Slide.over('8.hours').every('1.minutes').on('utc').alias(w))
    .group_by('ticker, {0}'.format(w))
    .select('ticker, price.min as p, {0}.end as t'.format(w))

This module reproduces that API SHAPE over Catalyst: the chain builds
the same DataFrame plan the SQL front-end produces (SURVEY.md §3.3 —
"only the front-end differs; IR identical downstream"). Durations
accept all three syntaxes via config.canonical_duration (Spark
"2 minutes", Flink Table "2.minutes", Flink SQL "'2' MINUTES").

Supported string-DSL forms (the subset the reference exercises, plus
the obvious aggregates):

- plain column:        "ticker"
- aggregate:           "price.min as p"   (min/max/sum/avg/count/
                                           first/last — first/last are
                                           event-time min_by/max_by)
- window accessor:     "w.start as s", "w.end as t"
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.config import canonical_duration


class _WindowSpec:
    def __init__(self, over: str, every: str | None = None):
        self._over = canonical_duration(over)
        self._every = canonical_duration(every) if every else None
        self._on: str | None = None
        self._alias: str = "w"

    def every(self, every: str) -> "_WindowSpec":
        self._every = canonical_duration(every)
        return self

    def on(self, ts_col: str) -> "_WindowSpec":
        self._on = ts_col
        return self

    def alias(self, name: str) -> "_WindowSpec":
        self._alias = name
        return self

    def to_column(self) -> Column:
        if self._on is None:
            raise ValueError("window spec needs .on(<event-time column>)")
        if self._every:
            return F.window(F.col(self._on), self._over, self._every)
        return F.window(F.col(self._on), self._over)


class Slide:
    """Sliding (hopping) window factory: Slide.over('8 hours')
    .every('1 minute').on('utc').alias('w') — reference
    flink/sliding_window.py:168-174."""

    @staticmethod
    def over(over: str) -> _WindowSpec:
        return _WindowSpec(over)


class Tumble:
    """Tumbling window factory: Tumble.over('1 minute').on('utc')
    .alias('w') — the Table-API twin of the reference's SQL
    TUMBLE(utc, INTERVAL '1' MINUTE) (flink/tumbling_window.py:190)."""

    @staticmethod
    def over(over: str) -> _WindowSpec:
        return _WindowSpec(over)


class _CumulateSpec(_WindowSpec):
    """CUMULATE window spec (Flink windowing-TVF family): expanding
    prefix windows over a base grid. The fluent chain assembles the
    plan by exploding each row into its <= max_size/step prefix
    windows before the grouped aggregate — the fully-general form
    (arbitrary DSL aggregates); the registry's
    ``cumulate_window_revenue`` uses the two-level decomposition in
    ``streaming/windows.py`` when the aggregate is decomposable."""

    def step(self, step: str) -> "_CumulateSpec":
        self._every = canonical_duration(step)
        return self

    def expand(self, df: DataFrame) -> DataFrame:
        """Return ``df`` with an exploded ``__w`` struct(start, end)
        column — one row per prefix window containing the event."""
        from kinesis_analytics_demo_spark.config import duration_millis

        if self._on is None:
            raise ValueError("window spec needs .on(<event-time column>)")
        if self._every is None:
            raise ValueError("Cumulate needs .step(<duration>)")
        size_ms = duration_millis(self._over)
        step_ms = duration_millis(self._every)
        if size_ms % step_ms or size_ms % 1000 or step_ms % 1000:
            raise ValueError(
                "Cumulate max_size must be a whole-second multiple of step"
            )
        size_s, step_s = size_ms // 1000, step_ms // 1000
        n = size_ms // step_ms
        sec = F.col(self._on).cast("timestamp").cast("long")
        base = F.floor(sec / size_s) * size_s
        idx = F.floor((sec - base) / step_s).cast("long")
        ends = F.transform(
            F.sequence(idx + 1, F.lit(n).cast("long")),
            lambda k: F.timestamp_seconds(base + k * step_s),
        )
        return df.withColumn(
            "__we", F.explode(ends)
        ).withColumn(
            "__w",
            F.struct(
                F.timestamp_seconds(base).alias("start"),
                F.col("__we").alias("end"),
            ),
        )


class Cumulate:
    """Cumulate window factory: Cumulate.over('1 day')
    .step('6 hours').on('ts').alias('w') — the Table-API analog of
    Flink SQL's CUMULATE(TABLE t, DESCRIPTOR(ts), INTERVAL '6' HOURS,
    INTERVAL '1' DAY)."""

    @staticmethod
    def over(max_size: str) -> _CumulateSpec:
        return _CumulateSpec(max_size)


_AGGS = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "count": F.count,
}

_EXPR_RE = re.compile(
    r"^\s*(?P<base>\w+)(?:\.(?P<method>\w+))?\s*(?:[Aa][Ss]\s+(?P<alias>\w+))?\s*$"
)


class FluentTable:
    """A windowed/grouped table mid-chain."""

    def __init__(self, df: DataFrame, window: _WindowSpec | None = None):
        self._df = df
        self._window = window
        self._group_cols: list[str] | None = None

    # -- chain steps ---------------------------------------------------
    def window(self, spec: _WindowSpec) -> "FluentTable":
        return FluentTable(self._df, spec)

    def group_by(self, *cols: str) -> "FluentTable":
        # accept both group_by('ticker', 'w') and group_by('ticker, w')
        names: list[str] = []
        for c in cols:
            names.extend(p.strip() for p in c.split(",") if p.strip())
        out = FluentTable(self._df, self._window)
        out._group_cols = names
        return out

    def select(self, *exprs: str) -> DataFrame:
        parts: list[str] = []
        for e in exprs:
            parts.extend(p.strip() for p in e.split(",") if p.strip())
        if self._group_cols is None:
            return self._df.select(*[self._parse_plain(p) for p in parts])
        return self._grouped_select(parts)

    def to_df(self) -> DataFrame:
        return self._df

    # -- parsing -------------------------------------------------------
    def _parse_plain(self, expr: str) -> Column:
        m = _EXPR_RE.match(expr)
        if not m or m.group("method"):
            raise ValueError(f"unsupported projection expression: {expr!r}")
        col = F.col(m.group("base"))
        return col.alias(m.group("alias")) if m.group("alias") else col

    def _grouped_select(self, parts: list[str]) -> DataFrame:
        win = self._window
        walias = win._alias if win else None
        df = self._df
        group_cols: list[Column] = []
        for g in self._group_cols:
            if walias and g == walias:
                if isinstance(win, _CumulateSpec):
                    df = win.expand(df)
                    group_cols.append(F.col("__w"))
                else:
                    group_cols.append(win.to_column().alias("__w"))
            else:
                group_cols.append(F.col(g))

        parsed = []
        aggs: list[Column] = []
        for p in parts:
            m = _EXPR_RE.match(p)
            if not m:
                raise ValueError(f"unsupported select expression: {p!r}")
            base, method, alias = m.group("base"), m.group("method"), m.group("alias")
            if method is None:
                if base not in self._group_cols:
                    raise ValueError(f"{base!r} is not a grouping column")
            elif walias and base == walias:
                if method not in ("start", "end"):
                    raise ValueError(f"unknown window accessor: {p!r}")
            elif method in ("first", "last"):
                # event-time first/last: min_by/max_by over the
                # window's .on() column — deterministic when (key, ts)
                # is unique (streaming/windows.py's fast path; its
                # struct-tiebreak variant covers duplicate-ts data)
                if win is None or win._on is None:
                    raise ValueError(
                        f"{method!r} needs a window with .on(<event-time "
                        f"column>) to order by"
                    )
                fn = F.min_by if method == "first" else F.max_by
                aggs.append(fn(base, win._on).alias(alias or f"{method}_{base}"))
            elif method not in _AGGS:
                raise ValueError(f"unknown aggregate: {p!r}")
            else:
                aggs.append(_AGGS[method](base).alias(alias or f"{method}_{base}"))
            parsed.append((base, method, alias))

        if not aggs:
            raise ValueError("grouped select needs at least one aggregate")
        grouped = df.groupBy(*group_cols).agg(*aggs)
        out_cols: list[Column] = []
        for base, method, alias in parsed:
            if method is None:
                out_cols.append(F.col(base))
            elif walias and base == walias:
                out_cols.append(
                    F.col(f"__w.{method}").alias(alias or f"{walias}_{method}")
                )
            else:
                out_cols.append(F.col(alias or f"{method}_{base}"))
        return grouped.select(*out_cols)


class TableEnv:
    """Minimal table-environment wrapper mirroring the reference's
    entry points: create_temporary_view / from_path / execute_sql /
    sql_query (flink/tumbling_window.py:228-291)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def create_temporary_view(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    def from_path(self, name: str) -> FluentTable:
        return FluentTable(self.spark.table(name))

    def from_df(self, df: DataFrame) -> FluentTable:
        return FluentTable(df)

    def sql_query(self, sql: str) -> DataFrame:
        return self.spark.sql(sql)

    def execute_sql(self, sql: str) -> DataFrame:
        return self.spark.sql(sql)
