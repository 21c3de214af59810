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
