"""Round-5 regression gates: the two-phase posting-list cap in the
inverted-index pair generators (ngram Jaccard / winnowing) — bounded
reducer state under a boilerplate-shingle flood, value-equivalence to the
uncapped path on clean corpora, and the executed-plan shape (anti-join
BEFORE the collect_list aggregate), mirroring round 3's LSH bucket-cap
pins."""

from __future__ import annotations

import re

import pytest


def _flood_docs(spark):
    """300 docs sharing one boilerplate sentence (every shingle of which has
    df=300), plus a genuine overlapping pair (1000, 1001) whose shared run
    is unique to them, plus distinct filler."""
    boiler = "all rights reserved by the original author of this work"
    rows = [(i, f"{boiler} item {i}") for i in range(300)]
    shared = "the quick brown fox jumps over the lazy sleeping dog tonight"
    rows.append((1000, shared + " alpha beta gamma"))
    rows.append((1001, shared + " delta epsilon zeta"))
    rows += [(2000 + i, f"unique filler sentence number {i} with token {i * 7}") for i in range(20)]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


# ---------------------------------------------------------------------------
# ngram_jaccard_pairs: two-phase max_doc_freq cap
# ---------------------------------------------------------------------------


def test_ngram_cap_drops_boilerplate_keeps_real_pairs(spark):
    from okay_spark.dedup import ngram_jaccard_pairs

    docs = _flood_docs(spark)
    pairs = ngram_jaccard_pairs(docs, max_doc_freq=50, threshold=0.2).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    # the boilerplate-only pairs are supported solely by df=300 shingles ->
    # dropped whole (they score 0 once those shingles are capped out)
    assert not any(a < 300 and b < 300 for a, b in got), "flooded posting leaked"
    assert (1000, 1001) in got, "genuine overlap pair must survive the cap"


def test_ngram_cap_is_two_phase_no_giant_collect(spark):
    """The cap must anti-join over-cap shingles out BEFORE the collect_list
    aggregate: plan carries a LeftAnti join and a count-only pre-pass, and
    the collect_list sits above the join."""
    from okay_spark.dedup import ngram_jaccard_pairs

    docs = _flood_docs(spark)
    plan = (
        ngram_jaccard_pairs(docs, max_doc_freq=50)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "collect_list" in plan
    assert re.search(r"Join LeftAnti", plan), "cap must anti-join over-cap shingles out"
    assert "count(1)" in plan
    # the anti-join must be BELOW the collect_list aggregate, not above it
    assert plan.index("collect_list") < plan.index("Join LeftAnti")


def test_ngram_capped_matches_uncapped_on_clean_corpus(spark):
    from okay_spark.dedup import ngram_jaccard_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight"),
        (4, "one two three four five nine ten eleven"),
        (5, "completely different content with no overlap here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    capped = set(map(tuple, ngram_jaccard_pairs(docs, max_doc_freq=100).collect()))
    uncapped = set(map(tuple, ngram_jaccard_pairs(docs, max_doc_freq=None).collect()))
    assert capped == uncapped
    assert capped  # non-vacuous: the overlapping pairs are present


# ---------------------------------------------------------------------------
# winnow_shared_pairs: two-phase max_doc_freq cap
# ---------------------------------------------------------------------------


def test_winnow_cap_drops_boilerplate_keeps_real_pairs(spark):
    from okay_spark.dedup import winnow_shared_pairs

    docs = _flood_docs(spark)
    pairs = winnow_shared_pairs(docs, max_doc_freq=50, min_shared=1).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert not any(a < 300 and b < 300 for a, b in got), "flooded posting leaked"
    assert (1000, 1001) in got, "genuine substring-overlap pair must survive"


def test_winnow_cap_is_two_phase_no_giant_collect(spark):
    from okay_spark.dedup import winnow_shared_pairs

    docs = _flood_docs(spark)
    plan = (
        winnow_shared_pairs(docs, max_doc_freq=50)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "collect_list" in plan
    assert re.search(r"Join LeftAnti", plan), "cap must anti-join over-cap fps out"
    assert "count(1)" in plan
    assert plan.index("collect_list") < plan.index("Join LeftAnti")


def test_winnow_capped_matches_uncapped_on_clean_corpus(spark):
    from okay_spark.dedup import winnow_shared_pairs

    shared = "the winnowing guarantee holds for shared runs of length k plus window"
    rows = [
        (1, shared + " first tail words here"),
        (2, shared + " second longer tail words there"),
        (3, "entirely unrelated text with nothing in common at all today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    capped = set(map(tuple, winnow_shared_pairs(docs, max_doc_freq=100, min_shared=1).collect()))
    uncapped = set(map(tuple, winnow_shared_pairs(docs, max_doc_freq=None, min_shared=1).collect()))
    assert capped == uncapped
    assert (1, 2) in {(a, b) for a, b, _ in capped}


# ---------------------------------------------------------------------------
# round-5 operators: snapshot diff, FD check, IQR outliers, grouped cume dist
# ---------------------------------------------------------------------------


def test_snapshot_diff_classifies_added_removed_changed(spark):
    from okay_spark.state import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k: long, s: string, v: long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", None), (5, "e", 50)],
        "k: long, s: string, v: long",
    )
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, "k").collect()}
    assert got == {2: "changed", 4: "removed", 5: "added"}  # 1 and 3 silent


def test_snapshot_diff_null_vs_empty_distinct(spark):
    from okay_spark.state import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k: long, s: string")
    new = spark.createDataFrame([(1, "")], "k: long, s: string")
    rows = snapshot_diff(old, new, "k").collect()
    assert [r["change"] for r in rows] == ["changed"], "NULL must differ from ''"


def test_fd_violations_counts_and_brackets(spark):
    from okay_spark.checks import functional_dependency_violations

    df = spark.createDataFrame(
        [("s1", "en"), ("s1", "en"), ("s1", "fr"), ("s2", "en"),
         ("s3", None), ("s3", "de")],
        "source: string, lang: string",
    )
    rows = {r["source"]: r for r in
            functional_dependency_violations(df, "source", "lang").collect()}
    assert set(rows) == {"s1", "s3"}  # s2 holds the dependency
    assert rows["s1"]["n_rows"] == 3 and rows["s1"]["n_values"] == 2
    assert rows["s1"]["min_value"] == "en" and rows["s1"]["max_value"] == "fr"
    # NULL dependent counts as a distinct combination, rendered as chr(0)
    assert rows["s3"]["n_values"] == 2 and rows["s3"]["min_value"] == "\x00"


def test_fd_violations_plan_has_no_collect_list(spark):
    from okay_spark.checks import functional_dependency_violations

    df = spark.createDataFrame([("a", "x")], "source: string, lang: string")
    plan = (
        functional_dependency_violations(df, "source", "lang")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "collect_list" not in plan and "collect_set" not in plan


def test_iqr_outliers_flags_tails_not_bulk(spark):
    from okay_spark.checks import iqr_outliers

    vals = [(i, float(v)) for i, v in enumerate([10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 1000, -1000])]
    df = spark.createDataFrame(vals, "event_id: long, value: double")
    rows = {r["event_id"]: r["rule"] for r in
            iqr_outliers(df, "value", id_cols=["event_id"]).collect()}
    assert rows == {10: "iqr_high", 11: "iqr_low"}


def test_iqr_outliers_all_null_column_flags_nothing(spark):
    from okay_spark.checks import iqr_outliers

    df = spark.createDataFrame([(1, None), (2, None)], "event_id: long, value: double")
    assert iqr_outliers(df, "value", id_cols=["event_id"]).count() == 0


def test_grouped_cume_dist_exact_and_bounded(spark):
    from okay_spark.relops import grouped_cume_dist

    df = spark.createDataFrame(
        [("en", 1), ("en", 1), ("en", 2), ("en", 4), ("fr", 7), ("fr", None)],
        "lang: string, n: long",
    )
    out = {(r["lang"], r["value"]): (r["cnt"], r["cume"]) for r in
           grouped_cume_dist(df, "n", "lang").collect()}
    assert out[("en", 1)] == (2, 0.5)
    assert out[("en", 2)] == (1, 0.75)
    assert out[("en", 4)] == (1, 1.0)
    assert out[("fr", 7)] == (1, 1.0)  # null value excluded
    # the window runs over the COUNTS aggregate, not raw rows: the plan's
    # Window sits above an Aggregate
    plan = grouped_cume_dist(df, "n", "lang")._jdf.queryExecution().optimizedPlan().toString()
    assert plan.index("Window") < plan.index("Aggregate")
