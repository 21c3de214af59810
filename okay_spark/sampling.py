"""Deterministic sampling and dataset splits for training-data pipelines.

``df.sample()`` is seed-dependent on partitioning and not reproducible
across engines or re-partitions. These helpers derive the decision from a
cryptographic hash of a stable key instead: the same row lands in the same
sample/split on ANY cluster size, any partitioning, any engine that can
compute md5 — which is what makes train/test membership auditable at
10^12-document scale (and lets the DuckDB oracle check it exactly).

All expressions are native Columns (md5 + conv are JVM intrinsics) — no
shuffle, no Python; the filter pushes into the scan pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# md5 prefix of 8 hex chars -> uniform 32-bit integer
_SPACE = float(1 << 32)


def hash_fraction(key: Column | str, *, salt: str = "") -> Column:
    """Uniform [0,1) double derived from md5(key || salt) — stable across
    engines, partitionings, and runs."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8), 16, 10)
    return h.cast("double") / F.lit(_SPACE)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, *, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash_fraction(key) < fraction. Changing ``salt`` draws
    an independent sample; the same (key, salt) always gives the same
    decision."""
    return df.filter(hash_fraction(key_col, salt=salt) < F.lit(fraction))


def split_column(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    *,
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Assign each row a named split (e.g. train/val/test) by cumulative
    weight over the hash fraction. Weights must sum to ~1; assignment is
    per-key deterministic, so a document can never leak between train and
    test across runs or re-shards."""
    total = sum(weights.values())
    frac = hash_fraction(key_col, salt=salt)
    expr = None
    acc = 0.0
    names = list(weights.items())
    for name, w in names[:-1]:
        # round the cumulative bound so 0.8 + 0.1 is exactly 0.9, not
        # 0.9000000000000001 — keeps split boundaries identical to what a
        # human (or the SQL oracle) writes down
        acc = round(acc + w / total, 12)
        cond = frac < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = names[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out, expr)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    fractions: dict | float,
    *,
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-group deterministic sampling: each group keeps its own fraction
    of rows (language rebalancing, source capping). ``fractions`` maps group
    value -> fraction; groups not listed keep ``default_fraction`` (a bare
    float applies one fraction to every group).

    Same md5-keyed decision as :func:`deterministic_sample` — membership is
    stable across partitionings, cluster sizes, and engines, so a
    down-sampled corpus is auditable and exactly reproducible by the SQL
    oracle. Pure Column expressions: the filter pushes into the scan, no
    shuffle, no Python."""
    if isinstance(fractions, dict):
        frac_col = None
        for value, frac in fractions.items():
            cond = F.col(group_col) == F.lit(value)
            frac_col = (
                F.when(cond, F.lit(float(frac)))
                if frac_col is None
                else frac_col.when(cond, F.lit(float(frac)))
            )
        frac_col = (
            F.lit(float(default_fraction))
            if frac_col is None
            else frac_col.otherwise(F.lit(float(default_fraction)))
        )
    else:
        frac_col = F.lit(float(fractions))
    return df.filter(hash_fraction(key_col, salt=salt) < frac_col)
