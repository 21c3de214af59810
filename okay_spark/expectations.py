"""Declarative data-quality expectation suites (Deequ-style) over the
engine's check layer.

``Expectations(...)`` collects constraints fluently; ``run(df)`` evaluates
them and returns ONE report DataFrame ``(check, column, observed, threshold,
passed)``. Scale design: every row-local constraint (null fraction, range,
set membership, regex, row count) lowers to a conditional aggregate in a
SINGLE ``agg()`` pass — one scan, one partial+final aggregation, no matter
how many constraints — while the two inherently keyed constraints
(uniqueness, referential) each add their one designed shuffle
(hash-aggregate / broadcast-anti-join) as separate small frames unioned into
the report.

No counterpart in the reference (okay validates one dict at a time); this is
the table-level quality-gate surface a 10^12-row pipeline runs before
publishing a snapshot.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from .rules import anchored_java_pattern


@dataclass
class _RowLocal:
    name: str
    column: str
    # aggregate producing the observed value (double)
    observed: Column
    threshold: float
    # True when observed must be <= threshold, False for >=
    upper_bound: bool


@dataclass
class Expectations:
    """Fluent builder; every ``expect_*`` returns self."""

    _row_local: list[_RowLocal] = field(default_factory=list)
    _keyed: list[tuple[str, Any]] = field(default_factory=list)

    # -- row-local constraints: all evaluated in one aggregate pass --------

    def expect_row_count_between(self, lo: int, hi: int | None = None) -> "Expectations":
        self._row_local.append(
            _RowLocal("row_count_min", "*", F.count(F.lit(1)).cast("double"), float(lo), False)
        )
        if hi is not None:
            self._row_local.append(
                _RowLocal("row_count_max", "*", F.count(F.lit(1)).cast("double"), float(hi), True)
            )
        return self

    def expect_non_null(self, col: str, *, max_null_frac: float = 0.0) -> "Expectations":
        frac = F.avg(F.col(col).isNull().cast("double"))
        self._row_local.append(_RowLocal("null_frac", col, frac, max_null_frac, True))
        return self

    def expect_values_in(
        self, col: str, options: list, *, max_viol_frac: float = 0.0
    ) -> "Expectations":
        bad = F.avg(
            (F.col(col).isNotNull() & ~F.col(col).isin(options)).cast("double")
        )
        self._row_local.append(_RowLocal("invalid_option_frac", col, bad, max_viol_frac, True))
        return self

    def expect_min(self, col: str, lo: float) -> "Expectations":
        self._row_local.append(
            _RowLocal("min", col, F.min(F.col(col).cast("double")), float(lo), False)
        )
        return self

    def expect_max(self, col: str, hi: float) -> "Expectations":
        self._row_local.append(
            _RowLocal("max", col, F.max(F.col(col).cast("double")), float(hi), True)
        )
        return self

    def expect_regex(
        self, col: str, pattern: str, *, max_viol_frac: float = 0.0
    ) -> "Expectations":
        ok = F.col(col).rlike(anchored_java_pattern(pattern))
        bad = F.avg((F.col(col).isNotNull() & ~ok).cast("double"))
        self._row_local.append(_RowLocal("regex_viol_frac", col, bad, max_viol_frac, True))
        return self

    # -- keyed constraints: one designed shuffle each ----------------------

    def expect_unique(self, col: str, *, max_dup_keys: int = 0) -> "Expectations":
        self._keyed.append(("unique", (col, max_dup_keys)))
        return self

    def expect_reference(
        self, col: str, dim: DataFrame, dim_col: str, *, max_orphans: int = 0
    ) -> "Expectations":
        self._keyed.append(("reference", (col, dim, dim_col, max_orphans)))
        return self

    # -- evaluation --------------------------------------------------------

    def run(self, df: DataFrame) -> DataFrame:
        """One report row per constraint. Row-local constraints share a
        single aggregate job; `observed` is rounded to 9 decimals so the
        report hashes stably across partition orders (fractions are exact
        multiples of 1/n for every realistic n)."""
        spark = df.sparkSession
        frames: list[DataFrame] = []
        if self._row_local:
            aggs = [
                F.round(c.observed, 9).alias(f"_o{i}")
                for i, c in enumerate(self._row_local)
            ]
            one = df.agg(*aggs)
            parts = []
            for i, c in enumerate(self._row_local):
                o = F.col(f"_o{i}")
                passed = (o <= F.lit(c.threshold)) if c.upper_bound else (o >= F.lit(c.threshold))
                parts.append(
                    F.struct(
                        F.lit(c.name).alias("check"),
                        F.lit(c.column).alias("column"),
                        o.cast("double").alias("observed"),
                        F.lit(float(c.threshold)).alias("threshold"),
                        F.coalesce(passed, F.lit(False)).alias("passed"),
                    )
                )
            frames.append(
                one.select(F.explode(F.array(*parts)).alias("_r")).select("_r.*")
            )
        for kind, spec in self._keyed:
            if kind == "unique":
                col, max_dup = spec
                dups = (
                    df.groupBy(col)
                    .agg(F.count(F.lit(1)).alias("_c"))
                    .filter(F.col("_c") > 1)
                    .agg(F.count(F.lit(1)).cast("double").alias("_o"))
                )
                frames.append(
                    dups.select(
                        F.lit("duplicate_keys").alias("check"),
                        F.lit(col).alias("column"),
                        F.col("_o").alias("observed"),
                        F.lit(float(max_dup)).alias("threshold"),
                        (F.col("_o") <= max_dup).alias("passed"),
                    )
                )
            else:
                col, dim, dim_col, max_orphans = spec
                orphans = (
                    df.filter(F.col(col).isNotNull())
                    .join(
                        F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
                        on=col,
                        how="left_anti",
                    )
                    .agg(F.count(F.lit(1)).cast("double").alias("_o"))
                )
                frames.append(
                    orphans.select(
                        F.lit("unknown_reference").alias("check"),
                        F.lit(col).alias("column"),
                        F.col("_o").alias("observed"),
                        F.lit(float(max_orphans)).alias("threshold"),
                        (F.col("_o") <= max_orphans).alias("passed"),
                    )
                )
        if not frames:
            return spark.createDataFrame(
                [], "check string, column string, observed double, threshold double, passed boolean"
            )
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        return out
