"""Late round-5 operators: MAD robust-z outliers, Jensen-Shannon categorical
divergence, URL-domain stats, and SemDeDup-style semantic dedup — value
checks plus the scale guards (degenerate MAD, epsilon-floored JS symmetry,
flooded-domain two-level aggregation, oversized-cluster cap observability).
"""

from __future__ import annotations

import math

import pytest


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_flags_and_robust_z(spark):
    from okay_spark.checks import mad_outliers

    # sorted [8,9,10,11,12,100]: interpolated median 10.5; deviations
    # sorted [0.5,0.5,1.5,1.5,2.5,89.5] -> MAD = 1.5
    rows = [(1, 10.0), (2, 11.0), (3, 9.0), (4, 12.0), (5, 8.0), (6, 100.0)]
    df = spark.createDataFrame(rows, "id: long, v: double")
    out = mad_outliers(df, "v", k=3.5, id_cols=["id"]).collect()
    got = {r["id"]: r for r in out}
    assert set(got) == {6}
    med, mad = 10.5, 1.5
    scale = 1.4826 * mad
    assert got[6]["rule"] == "mad_high"
    assert got[6]["robust_z"] == pytest.approx((100.0 - med) / scale)
    assert got[6]["value"] == 100.0


def test_mad_outliers_low_side_and_nulls(spark):
    from okay_spark.checks import mad_outliers

    rows = [(i, float(v)) for i, v in enumerate([50, 51, 49, 52, 48, -500])]
    df = spark.createDataFrame(rows + [(99, None)], "id: long, v: double")
    out = mad_outliers(df, "v", k=3.5, id_cols=["id"]).collect()
    assert {r["id"] for r in out} == {5}
    assert out[0]["rule"] == "mad_low"


def test_mad_outliers_degenerate_scale(spark):
    from okay_spark.checks import mad_outliers

    # >50% of rows share one value -> MAD == 0: every value != median flags,
    # robust_z is NULL (deviation real, scale unmeasurable)
    rows = [(i, 5.0) for i in range(6)] + [(10, 7.0), (11, 3.0)]
    df = spark.createDataFrame(rows, "id: long, v: double")
    out = {r["id"]: r for r in mad_outliers(df, "v", id_cols=["id"]).collect()}
    assert set(out) == {10, 11}
    assert out[10]["rule"] == "mad_high" and out[10]["robust_z"] is None
    assert out[11]["rule"] == "mad_low" and out[11]["robust_z"] is None


def test_mad_outliers_empty_column(spark):
    from okay_spark.checks import mad_outliers

    df = spark.createDataFrame([(1, None)], "id: long, v: double")
    assert mad_outliers(df, "v", id_cols=["id"]).count() == 0


# ---------------------------------------------------------------------------
# js_divergence_frame
# ---------------------------------------------------------------------------


def test_js_identical_distributions_is_zero(spark):
    from okay_spark.checks import js_divergence_frame

    df = spark.createDataFrame([(c,) for c in "aabbc"], "k: string")
    row = js_divergence_frame(df, df, "k").first()
    assert row["js"] == pytest.approx(0.0, abs=1e-12)
    assert row["n_current"] == 5 and row["n_reference"] == 5


def test_js_disjoint_is_near_ln2_and_symmetric(spark):
    from okay_spark.checks import js_divergence_frame

    cur = spark.createDataFrame([("a",)] * 4, "k: string")
    ref = spark.createDataFrame([("b",)] * 4, "k: string")
    fwd = js_divergence_frame(cur, ref, "k").first()["js"]
    bwd = js_divergence_frame(ref, cur, "k").first()["js"]
    # epsilon-floored, so slightly below ln 2 but well above any real drift
    assert 0.6 < fwd <= math.log(2.0) + 1e-9
    assert fwd == pytest.approx(bwd, abs=1e-15)


def test_js_bounded_below_psi_blowup(spark):
    """A vanished category sends PSI toward |ln eps| ~ 13.8; JS stays <= ln 2."""
    from okay_spark.checks import categorical_drift_frame, js_divergence_frame

    cur = spark.createDataFrame([("a",)] * 99 + [("b",)], "k: string")
    ref = spark.createDataFrame([("a",)] * 100, "k: string")
    psi = categorical_drift_frame(cur, ref, "k").first()["psi"]
    js = js_divergence_frame(cur, ref, "k").first()["js"]
    assert psi > js
    assert js <= math.log(2.0) + 1e-9


# ---------------------------------------------------------------------------
# url_domain_stats
# ---------------------------------------------------------------------------


def test_url_domain_stats_counts_and_lowercasing(spark):
    from okay_spark.textops import url_domain_stats

    rows = [
        (1, "see https://CDN.Example.org/a and https://cdn.example.org/b"),
        (2, "plain text, no links"),
        (3, "http://cdn.example.org/z plus http://other.test/"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["domain"]: r for r in url_domain_stats(df).collect()}
    assert set(got) == {"cdn.example.org", "other.test"}
    assert got["cdn.example.org"]["n_urls"] == 3
    assert got["cdn.example.org"]["n_docs"] == 2
    assert got["other.test"]["n_urls"] == 1 and got["other.test"]["n_docs"] == 1


def test_url_domain_stats_is_two_level_scalar_aggregation(spark):
    """The executed plan must pre-aggregate (domain, doc) pairs — two hash
    aggregates, never a collect_list/set (the rare_token_stats discipline)."""
    from okay_spark.textops import url_domain_stats

    df = spark.createDataFrame([(1, "https://a.b/x")], "doc_id: long, text: string")
    plan = url_domain_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan and "collect_set" not in plan


# ---------------------------------------------------------------------------
# semantic_duplicates
# ---------------------------------------------------------------------------


def _vec_rows():
    # two exact duplicate pairs in different directions, plus distinct fill
    base = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (11, [1.0, 0.0, 0.0, 0.0]),  # dup of 1
        (2, [0.0, 1.0, 1.0, 0.0]),
        (12, [0.0, 1.0, 1.0, 0.0]),  # dup of 2 (non-perfect-square norm)
        (3, [0.0, 0.0, 0.0, 1.0]),
        (4, [1.0, 1.0, 1.0, 1.0]),
        (5, [-1.0, 0.5, 0.0, 0.0]),
    ]
    return base


def test_semantic_duplicates_finds_planted_pairs(spark):
    from okay_spark.dedup import semantic_duplicates

    df = spark.createDataFrame(_vec_rows(), "vec_id: long, embedding: array<double>")
    out = {r["vec_id"]: r for r in semantic_duplicates(df, n_lists=2, threshold=0.999).collect()}
    assert set(out) == {11, 12}
    assert out[11]["kept_id"] == 1 and out[12]["kept_id"] == 2
    for r in out.values():
        assert r["score"] >= 0.999


def test_semantic_duplicates_threshold_excludes_dissimilar(spark):
    from okay_spark.dedup import semantic_duplicates

    df = spark.createDataFrame(_vec_rows(), "vec_id: long, embedding: array<double>")
    # at a loose threshold more pairs appear; the strict one keeps only dups
    loose = semantic_duplicates(df, n_lists=1, threshold=0.5).count()
    strict = semantic_duplicates(df, n_lists=1, threshold=0.999).count()
    assert strict == 2 and loose > strict


def test_semantic_duplicates_keeper_is_best_then_min_id(spark):
    from okay_spark.dedup import semantic_duplicates

    # three identical vectors: 7 and 8 both tie at cos~1 for 9 -> min id 7
    rows = [(7, [2.0, 1.0]), (8, [2.0, 1.0]), (9, [2.0, 1.0]), (1, [0.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    out = {r["vec_id"]: r["kept_id"] for r in semantic_duplicates(df, n_lists=1).collect()}
    assert out == {8: 7, 9: 7}


def test_semantic_cluster_cap_excludes_flood_and_is_observable(spark):
    from okay_spark.dedup import semantic_duplicates, semantic_oversized_clusters
    from okay_spark.similarity import ivf_assignments

    # 30 identical boilerplate vectors flood one cluster; a genuine dup pair
    # lives in a well-separated direction. Ids are chosen so the md5-seeded
    # init bucket matches the direction (computed offline: these flood ids
    # hash to bucket 0 of 2, the pair ids to bucket 1), making the k-means
    # separation deterministic rather than dependent on how the hash mixes.
    flood_ids = [0, 1, 2, 5, 6, 11, 13, 15, 17, 19, 20, 21, 22, 23, 26,
                 32, 34, 35, 36, 38, 40, 41, 42, 45, 46, 49, 50, 51, 52, 54]
    rows = [(i, [1.0, 0.0]) for i in flood_ids]
    rows += [(200, [0.0, 1.0]), (202, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    capped = semantic_duplicates(df, n_lists=2, max_cluster_size=10).collect()
    # the flooded cluster contributes nothing; the real pair survives
    assert {(r["vec_id"], r["kept_id"]) for r in capped} == {(202, 200)}
    assign, _ = ivf_assignments(df, n_lists=2, iters=1)
    over = semantic_oversized_clusters(assign, 10).collect()
    assert len(over) == 1 and over[0]["n_members"] == 30


def test_semantic_duplicates_uncapped_quadratic_on_flood(spark):
    """Without the cap the flooded cluster pairs all-vs-all (the documented
    trade: recall over bounded fan-out) — every flood member except the
    min id is flagged against keeper 0."""
    from okay_spark.dedup import semantic_duplicates

    rows = [(i, [1.0, 0.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    out = {r["vec_id"]: r["kept_id"] for r in semantic_duplicates(df, n_lists=1).collect()}
    assert set(out) == set(range(1, 30))
    assert set(out.values()) == {0}
