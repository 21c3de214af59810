"""Round-3 regression gates: LSH bucket cap (bounded reducer state under a
boilerplate flood), planted-duplicate non-vacuity for the approximate
dedup/ANN driver entries, and the Arrow-seam plan audit — the four declared
Python crossings must be the ONLY Python evaluation in their plans."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# ---------------------------------------------------------------------------
# LSH bucket cap
# ---------------------------------------------------------------------------


def _flood_corpus(spark):
    """300 byte-identical boilerplate docs (one LSH bucket per band) plus two
    genuine near-duplicates that must survive the cap."""
    boiler = [(i, "all rights reserved copyright notice terms of service apply") for i in range(300)]
    real = [
        (1000, "the quick brown fox jumps over the lazy dog tonight"),
        (1001, "the quick brown fox jumps over the lazy dog today"),
    ]
    return spark.createDataFrame(boiler + real, "doc_id long, text string")


def test_minhash_bucket_cap_drops_flooded_bucket_keeps_real_pairs(spark):
    from okay_spark.dedup import minhash_candidate_pairs

    corpus = _flood_corpus(spark)
    pairs = minhash_candidate_pairs(corpus, max_bucket_size=50).collect()
    ids = {r["a"] for r in pairs} | {r["b"] for r in pairs}
    # the flooded bucket (300 identical docs -> 44850 pairs) is dropped whole
    assert not any(i < 300 for i in ids), "boilerplate bucket leaked through the cap"
    # the genuine near-dup pair still bucket-collides and survives
    assert (1000, 1001) in {(r["a"], r["b"]) for r in pairs}


def test_minhash_bucket_cap_is_two_phase_no_giant_collect(spark):
    """The cap must remove oversized buckets BEFORE the collect_list
    aggregate (scalar count pre-pass + anti-join), so the reducer never
    materializes the flooded posting list. Plan shape: the collect_list
    aggregate sits above a join, and a count-only aggregate exists below."""
    from okay_spark.dedup import minhash_candidate_pairs

    corpus = _flood_corpus(spark)
    plan = minhash_candidate_pairs(corpus, max_bucket_size=50)._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" in plan
    assert re.search(r"Join LeftAnti", plan), "cap must anti-join oversized buckets out"
    # the count pre-pass is an aggregate that carries no posting list
    assert "count(1)" in plan


def test_minhash_oversized_buckets_reports_dropped(spark):
    from okay_spark.dedup import minhash_oversized_buckets

    corpus = _flood_corpus(spark)
    over = minhash_oversized_buckets(corpus, max_bucket_size=50).collect()
    # 300 identical docs share one bucket in each of the 4 default bands
    assert len(over) == 4
    assert all(r["size"] == 300 for r in over)


def test_minhash_uncapped_matches_capped_on_clean_corpus(docs):
    from okay_spark.dedup import minhash_candidate_pairs

    capped = set(map(tuple, minhash_candidate_pairs(docs, max_bucket_size=1_000).collect()))
    uncapped = set(map(tuple, minhash_candidate_pairs(docs, max_bucket_size=None).collect()))
    assert capped == uncapped


# ---------------------------------------------------------------------------
# Two-pass exact quantiles (the scale path for exact_quantiles)
# ---------------------------------------------------------------------------


def test_twopass_quantiles_equal_full_sort_exact(spark):
    from okay_spark.checks import exact_quantiles, exact_quantiles_twopass

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice"]
    probs = (0.25, 0.5, 0.9, 0.99)
    want = {
        (r["col_name"], r["p"]): r["q"] for r in exact_quantiles(li, cols, probs).collect()
    }
    got = {
        (r["col_name"], r["p"]): r["q"]
        for r in exact_quantiles_twopass(li, cols, probs, accuracy=1_000).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_twopass_quantiles_duplicates_nulls_and_edges(spark):
    from okay_spark.checks import exact_quantiles, exact_quantiles_twopass

    df = spark.createDataFrame(
        [(float(v),) for v in [5] * 100 + [1, 2, 3] + [9] * 7] + [(None,)] * 5,
        "x double",
    )
    probs = (0.0, 0.01, 0.5, 0.99, 1.0)
    want = {r["p"]: r["q"] for r in exact_quantiles(df, ["x"], probs).collect()}
    got = {
        r["p"]: r["q"]
        for r in exact_quantiles_twopass(df, ["x"], probs, accuracy=100).collect()
    }
    for p in probs:
        assert got[p] == pytest.approx(want[p], abs=1e-12), p


def test_twopass_quantiles_all_null_column(spark):
    from okay_spark.checks import exact_quantiles_twopass

    df = spark.createDataFrame([(None,), (None,)], "x double")
    rows = exact_quantiles_twopass(df, ["x"], (0.5,)).collect()
    assert len(rows) == 1 and rows[0]["q"] is None


# ---------------------------------------------------------------------------
# Planted non-vacuity for the approximate driver entries
# ---------------------------------------------------------------------------


def test_driver_minhash_near_duplicates_finds_planted_pair(spark):
    import __spark_entry__ as e

    rows = e.queries()["minhash_near_duplicates"](spark, SF_DIR).collect()
    # the planted verbatim copy of the smallest doc (id 0 at this sf) must be
    # paired with its source at Jaccard exactly 1.0; natural near-dups of the
    # same doc may also pair with it, which is correct behavior
    planted = [r for r in rows if r["a"] == -1 and r["jaccard"] == 1.0]
    assert len(planted) == 1, "planted verbatim duplicate must be detected"


def test_driver_ivf_topk_finds_planted_neighbor(spark):
    import __spark_entry__ as e

    rows = e.queries()["ivf_topk_embeddings"](spark, SF_DIR).collect()
    ids = [r["vec_id"] for r in rows]
    assert -1 in ids and 0 in ids, "query vector and its planted copy must both rank"
    by_id = {r["vec_id"]: r["score"] for r in rows}
    assert by_id[-1] == 1.0 and by_id[0] == 1.0


def test_driver_lsh_knn_planted_rank1_exact(spark):
    import __spark_entry__ as e

    rows = e.queries()["lsh_knn_planted_embeddings"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(r["query_id"] == -1 - r["neighbor_id"] for r in rows)
    assert all(r["score"] == 1.0 and r["rank"] == 1 for r in rows)


# ---------------------------------------------------------------------------
# Arrow-seam audit: the declared crossings are the ONLY Python in the plan
# ---------------------------------------------------------------------------

_PY_NODES = re.compile(
    r"\b(BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|"
    r"FlatMapGroupsInPandasWithState|MapInArrow)\b"
)


def _py_eval_nodes(df) -> list[str]:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    return sorted(_PY_NODES.findall(plan))


def test_custom_rule_plan_has_exactly_one_arrow_eval(spark, docs):
    from okay_spark.engine import validate_dataframe

    def _passes(field, value):
        return None

    def schema():
        from okay_spark import required

        required("text", type="custom", validator=_passes)

    out = validate_dataframe(docs, schema, id_cols=["doc_id"])
    assert _py_eval_nodes(out) == ["ArrowEvalPython"]


def test_multimodal_plan_has_exactly_one_map_in_pandas(spark):
    from okay_spark.fixtures import media_catalog
    from okay_spark.multimodal import attach_payload, extract_media_features

    out = extract_media_features(attach_payload(media_catalog(spark, 50)))
    assert _py_eval_nodes(out) == ["MapInPandas"]


def test_pack_chunks_plan_has_exactly_one_apply_in_pandas(spark, docs):
    from okay_spark.textops import chunk_documents, pack_chunks

    out = pack_chunks(chunk_documents(docs, chunk_tokens=48, overlap=8), budget_tokens=192, n_buckets=4)
    assert _py_eval_nodes(out) == ["FlatMapGroupsInPandas"]


def test_compression_ratio_plan_has_exactly_one_arrow_eval(spark, docs):
    from okay_spark.textops import compression_ratio

    out = compression_ratio(docs)
    assert _py_eval_nodes(out) == ["ArrowEvalPython"]
