"""Deterministic sampling/splits: stability across repartitioning, split
disjointness and coverage, fraction accuracy, salt independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from okay_spark.sampling import deterministic_sample, hash_fraction, split_column


def test_sample_stable_across_partitioning(spark):
    df = spark.range(0, 20_000).select(F.col("id").cast("string").alias("k"))
    a = {r["k"] for r in deterministic_sample(df, "k", 0.2).collect()}
    b = {r["k"] for r in deterministic_sample(df.repartition(17), "k", 0.2).collect()}
    assert a == b
    # fraction within 2% absolute at n=20k
    assert abs(len(a) / 20_000 - 0.2) < 0.02


def test_salt_draws_independent_samples(spark):
    df = spark.range(0, 10_000).select(F.col("id").cast("string").alias("k"))
    a = {r["k"] for r in deterministic_sample(df, "k", 0.5, salt="a").collect()}
    b = {r["k"] for r in deterministic_sample(df, "k", 0.5, salt="b").collect()}
    overlap = len(a & b) / 10_000
    assert 0.2 < overlap < 0.3  # ~0.25 expected for independent halves


def test_split_partitions_every_row_once(spark):
    df = spark.range(0, 30_000).select(F.col("id").cast("string").alias("k"))
    out = split_column(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 30_000
    assert abs(counts["train"] / 30_000 - 0.8) < 0.02
    # re-running yields the identical assignment (no leakage between splits)
    again = split_column(df.repartition(11), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    joined = out.alias("a").join(again.alias("b"), "k")
    assert joined.filter(F.col("a.split") != F.col("b.split")).count() == 0


def test_hash_fraction_range_and_pushdown(spark):
    df = spark.range(0, 1_000).select(F.col("id").cast("string").alias("k"))
    mm = df.select(
        F.min(hash_fraction("k")).alias("lo"), F.max(hash_fraction("k")).alias("hi")
    ).first()
    assert 0.0 <= mm["lo"] and mm["hi"] < 1.0
    plan = deterministic_sample(df, "k", 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
