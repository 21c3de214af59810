"""Deterministic salting helpers for skewed shuffle stages.

The north rule requires skewed partitions to be salted before shuffle-heavy
uniqueness/referential stages. Salts here are deterministic (hash-derived or
physical-partition-derived — never ``rand()``), so runs are reproducible and
resumable. AQE's skew-join splitting remains enabled as a second line of
defense; explicit salting protects the cases AQE cannot see (single hot key
inside one task, pre-AQE shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_salt(*cols: Column | str, buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from the given columns."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(F.xxhash64(*cs, F.lit("salt")), F.lit(buckets)).cast("int")


def partition_salt(buckets: int) -> Column:
    """Salt from the physical partition id — spreads a hot key's rows across
    ``buckets`` reducers without touching data values."""
    return F.pmod(F.spark_partition_id(), F.lit(buckets)).cast("int")


def replicate_with_salts(dim: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate the (small-ish) side of a salted join once per salt value."""
    return dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>"))
    )


def key_skew_stats(
    df: DataFrame,
    key_cols: list[str] | str,
    *,
    target_rows_per_task: int = 1_000_000,
    top_n: int = 20,
) -> DataFrame:
    """Profile shuffle-key skew BEFORE paying for the shuffle it would
    distort: the top-N heaviest keys with their row counts, share of the
    table, and the salt factor that would spread each one back to
    ``target_rows_per_task`` rows per reducer task.

    Output (one row per heavy key, heaviest first):
    ``(key..., cnt, share, suggested_salt)`` where ``suggested_salt =
    ceil(cnt / target_rows_per_task)`` (1 = no salting needed). Feed the
    max into :func:`hash_salt` / :func:`partition_salt` buckets, or treat
    ``suggested_salt > 1`` as the trigger for the salted referential /
    uniqueness strategies.

    Why an operator and not a guess: AQE's skew split only engages at
    runtime inside sort-merge stages it can see; a single hot key inside a
    hash aggregate or a pre-AQE exchange silently serializes. This is the
    measurement that decides — the engine's own salted paths
    (referential_violations ``salt_buckets``, duplicate_keys salting) are
    opt-in precisely so the decision can be data-driven and recorded.

    Scale shape: one count aggregate with map-side partial combine (a hot
    key collapses to one row per map task BEFORE the exchange — profiling
    skew never suffers it), then a top-N over the key-count frame. The
    share denominator is ``sum(cnt)`` over that SAME aggregated frame
    (broadcast back as a 1-row cross join), not a separate ``df.count()``
    — one scan feeds both numerator and denominator, so the input is read
    once (the aggregate exchange is reused across the diamond) and a
    nondeterministic upstream frame cannot make the shares disagree with
    the counts they describe. Null keys count too: an all-null FK column
    is the most common hot key in the wild.

    Exactness: counts are exact integers; ``share`` is a single int/int
    IEEE division (the rare_token_stats rule), so the frame is
    bit-identical on any engine and partitioning.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    # sum(cnt) == df.count() exactly (the groupBy covers every row, null
    # keys included) — derived from the aggregated frame so both sides of
    # the diamond reuse one exchange instead of scanning the input twice
    total = counts.agg(F.sum("cnt").alias("_total"))
    # ceil(cnt / target) via integer `div` — a double ceil could cross an
    # integer boundary at 10^17-row counts; share stays ONE int/int IEEE
    # division (the rare_token_stats rule)
    t = int(target_rows_per_task)
    salt = F.expr(f"CAST((cnt + {t - 1}) div {t} AS INT)")
    return (
        counts.orderBy(F.desc("cnt"), *[F.asc_nulls_first(k) for k in keys])
        .limit(top_n)
        .crossJoin(F.broadcast(total))
        .select(
            *keys,
            "cnt",
            (F.col("cnt") / F.col("_total")).alias("share"),
            salt.alias("suggested_salt"),
        )
    )
