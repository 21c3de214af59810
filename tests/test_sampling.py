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


def test_stratified_sample_per_group_fractions(spark):
    from pyspark.sql import Row

    from okay_spark.sampling import stratified_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 == 0 else "fr") for i in range(2000)]
    )
    out = stratified_sample(df, "lang", {"en": 0.1, "fr": 0.9}, key_col="doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 50 <= counts["en"] <= 150      # ~10% of 1000
    assert 850 <= counts["fr"] <= 950     # ~90% of 1000
    # unlisted groups use default_fraction (0.0): nothing else survives
    df2 = df.withColumn("lang", F.lit("de"))
    assert stratified_sample(df2, "lang", {"en": 0.5}).count() == 0
    # deterministic: same rows both times
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "lang", {"en": 0.1, "fr": 0.9}, key_col="doc_id").collect()
    )
    assert a == b


def test_stratified_sample_scalar_fraction_matches_plain(spark):
    from pyspark.sql import Row

    from okay_spark.sampling import deterministic_sample, stratified_sample

    df = spark.createDataFrame([Row(doc_id=i, g="x") for i in range(500)])
    plain = sorted(r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3).collect())
    strat = sorted(r["doc_id"] for r in stratified_sample(df, "g", 0.3).collect())
    assert plain == strat


# --- corpus balancing -------------------------------------------------------------


def test_cap_per_group_keeps_global_minima(spark):
    from okay_spark.balance import cap_per_group

    rows = [(i, "hot" if i % 10 != 9 else "cold") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, source string").repartition(8)
    out = cap_per_group(df, "source", max_rows=5, order_col="doc_id").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r["doc_id"])
    # exactly the 5 smallest ids of each group survive the two-phase prune
    hot_ids = sorted(i for i, s in rows if s == "hot")[:5]
    cold_ids = sorted(i for i, s in rows if s == "cold")[:5]
    assert sorted(by_group["hot"]) == hot_ids
    assert sorted(by_group["cold"]) == cold_ids


def test_resample_to_target_proportions_and_determinism(spark):
    from okay_spark.balance import resample_to_target

    # 'b' is the binding (most underrepresented) group: 100 rows, target 0.5
    rows = [(i, "a") for i in range(900)] + [(900 + i, "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    out = resample_to_target(df, "lang", {"a": 0.5, "b": 0.5}, key_col="doc_id")
    got = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    # binding group keeps everything; the other lands near its proportional cap
    assert counts["b"] == 100
    assert 60 <= counts["a"] <= 140  # expected 100, md5-uniform (fixed draw: 124)

    # membership is partitioning-independent
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in resample_to_target(
            df.repartition(13), "lang", {"a": 0.5, "b": 0.5}, key_col="doc_id"
        ).collect()
    )
    assert ids1 == ids2


def test_resample_to_target_drops_unlisted_groups(spark):
    from okay_spark.balance import resample_to_target

    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "xx")], "doc_id int, lang string"
    )
    out = resample_to_target(df, "lang", {"en": 1.0}, key_col="doc_id").collect()
    assert {r["lang"] for r in out} == {"en"}
