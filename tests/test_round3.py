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
# Embedding LSH bucket anchors (quadratic-fan-out cap)
# ---------------------------------------------------------------------------


def _vector_flood(spark, n=400, dim=8):
    """n near-identical vectors (one LSH bucket) plus two distant ones."""
    rows = [(i, [1.0] * dim) for i in range(n)]
    rows += [(9000, [-1.0] * dim), (9001, [-1.0] * dim)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_neardup_anchor_cap_bounds_fanout_keeps_connectivity(spark):
    from okay_spark.dedup import connected_components, embedding_near_duplicates

    df = _vector_flood(spark)
    pairs = embedding_near_duplicates(df, dim=8, threshold=0.95, max_bucket_size=10)
    got = pairs.collect()
    # fan-out bounded: ~n x cap x probes, nowhere near the 400^2/2 exact set
    assert 0 < len(got) < 400 * 10 * 9
    # every flooded doc must still reach one connected component
    comp = connected_components(pairs.select("a", "b")).collect()
    labels = {r["node"]: r["component"] for r in comp}
    flood_labels = {labels[i] for i in range(400) if i in labels}
    assert len(flood_labels) == 1
    assert all(i in labels for i in range(400)), "cap must not orphan flooded docs"
    # the distant pair is its own component
    assert labels[9000] == labels[9001] != next(iter(flood_labels))


def test_embedding_neardup_uncapped_unchanged_by_refactor(spark, embeddings):
    """The least/greatest rewrite must not change the exact (uncapped)
    output on the certified fixture shape."""
    from okay_spark.dedup import embedding_near_duplicates

    emb = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    dim = len(emb.first()["embedding"])
    planted = emb.filter(F.col("vec_id") == 0).select(
        F.lit(-1).cast("long").alias("vec_id"), "embedding"
    )
    out = embedding_near_duplicates(emb.unionByName(planted), dim=dim, threshold=0.9)
    rows = out.collect()
    assert [(r["a"], r["b"]) for r in rows] == [(-1, 0)]
    assert all(r["a"] < r["b"] for r in rows)


def test_lsh_knn_join_bucket_cap_still_ranks(spark):
    from okay_spark.similarity import lsh_knn_join

    df = _vector_flood(spark, n=300)
    q = spark.createDataFrame([(7000, [1.0] * 8)], "vec_id long, embedding array<double>")
    out = lsh_knn_join(q, df, dim=8, k=5, planes=8, max_bucket_size=20).collect()
    assert len(out) == 5
    assert all(r["score"] > 0.99 for r in out)


# ---------------------------------------------------------------------------
# Cross-corpus near-dup
# ---------------------------------------------------------------------------


def test_cross_duplicates_agree_with_bruteforce(spark, docs):
    """The LSH-bucketed cross join at a mid threshold must find exactly the
    pairs the exhaustive corpus x reference Jaccard join finds whose shingle
    signatures collide in some band; at threshold 1.0 it must find ALL
    shingle-set-equal pairs (recall 1 by construction)."""
    from okay_spark.dedup import minhash_cross_duplicates
    from okay_spark.textops import word_shingles

    ref = docs.filter(F.col("doc_id") % 7 == 0)
    corp = docs.filter(F.col("doc_id") % 7 != 0)
    got = {
        (r["a"], r["b"]): round(r["jaccard"], 6)
        for r in minhash_cross_duplicates(corp, ref, threshold=0.5).collect()
    }
    # exhaustive oracle: every cross pair with jaccard >= 0.5
    sh = docs.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("s")
    ).filter(F.size("s") > 0)
    a = sh.filter(F.col("doc_id") % 7 != 0).select(
        F.col("doc_id").alias("a"), F.col("s").alias("sa")
    )
    b = sh.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("b"), F.col("s").alias("sb")
    )
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = (F.size("sa") + F.size("sb")).cast("double") - inter
    want = {
        (r["a"], r["b"]): round(r["j"], 6)
        for r in a.crossJoin(b)
        .select("a", "b", (inter / union).alias("j"))
        .filter(F.col("j") >= 0.5)
        .collect()
    }
    assert want, "fixture regression: no cross near-dups at 0.5"
    # LSH may miss sub-1.0 pairs (probabilistic recall) but every reported
    # pair must be a true one with the exact score
    assert set(got) <= set(want)
    for k in got:
        assert got[k] == want[k]
    # and the jaccard-1.0 subset must be found COMPLETELY
    exact_want = {k for k, v in want.items() if v == 1.0}
    exact_got = {k for k, v in got.items() if v == 1.0}
    assert exact_got == exact_want


def test_cross_duplicates_driver_entry_finds_planted(spark):
    import __spark_entry__ as e

    rows = e.queries()["cross_dedup_documents"](spark, SF_DIR).collect()
    assert any(r["a"] == -1 and r["jaccard"] == 1.0 for r in rows)


def test_cross_duplicates_caps_each_side(spark):
    from okay_spark.dedup import minhash_cross_duplicates

    flooded = _flood_corpus(spark)  # 300 identical docs + 2 near-dups
    ref = spark.createDataFrame(
        [(5000, "all rights reserved copyright notice terms of service apply"),
         (5001, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    pairs = minhash_cross_duplicates(flooded, ref, threshold=0.5, max_bucket_size=50).collect()
    ids = {r["a"] for r in pairs}
    # the flooded boilerplate bucket is dropped on the corpus side...
    assert not any(i < 300 for i in ids)
    # ...while the genuine pair still matches across corpora
    assert {(r["a"], r["b"]) for r in pairs} == {(1000, 5001), (1001, 5001)}


# ---------------------------------------------------------------------------
# Token-budget sampling
# ---------------------------------------------------------------------------


def test_token_budget_two_phase_is_partition_invariant(spark, docs):
    """The pre-prune must be exact: the kept set on 1 partition (where the
    shard pass is the global pass) and on 16 partitions must be identical."""
    from okay_spark.balance import sample_to_token_budget
    from okay_spark.textops import token_count

    base = token_count(docs.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull()))
    kept1 = {
        r["doc_id"]
        for r in sample_to_token_budget(
            base.repartition(1), "lang", budget_tokens=2_000, token_col="n_tokens"
        ).collect()
    }
    kept16 = {
        r["doc_id"]
        for r in sample_to_token_budget(
            base.repartition(16), "lang", budget_tokens=2_000, token_col="n_tokens"
        ).collect()
    }
    assert kept1 == kept16 and kept1


def test_token_budget_breaker_doc_must_survive_shard_pass(spark):
    """Round-3 review repro: md5 order 6 < 19 < 9, tokens 5,6,1, budget 10.
    True take-while keeps only doc 6 (5+6 > 10 stops at 19). If docs 6 and
    19 are co-partitioned and the shard pass drops the breaker (19), the
    global pass never sees its 6 tokens and falsely keeps doc 9. The fixed
    pre-prune keeps each shard's breaker, so every partitioning yields
    exactly {6}."""
    from okay_spark.balance import sample_to_token_budget
    from okay_spark.sampling import hash_fraction

    rows = [(6, "g", 5), (19, "g", 6), (9, "g", 1)]
    order = {
        r["doc_id"]: r["fr"]
        for r in spark.createDataFrame(rows, "doc_id long, g string, n long")
        .select("doc_id", hash_fraction("doc_id").alias("fr"))
        .collect()
    }
    assert order[6] < order[19] < order[9], "fixture md5 order changed"

    sc = spark.sparkContext
    rdd = sc.parallelize([(6, "g", 5), (19, "g", 6)], 1).union(
        sc.parallelize([(9, "g", 1)], 1)
    )
    adversarial = spark.createDataFrame(rdd, "doc_id long, g string, n long")
    assert adversarial.rdd.getNumPartitions() == 2
    for frame in (adversarial, adversarial.coalesce(1)):
        kept = {
            r["doc_id"]
            for r in sample_to_token_budget(
                frame, "g", budget_tokens=10, token_col="n"
            ).collect()
        }
        assert kept == {6}, kept


def test_token_budget_respects_budget_and_takewhile_order(spark, docs):
    from okay_spark.balance import sample_to_token_budget
    from okay_spark.sampling import hash_fraction
    from okay_spark.textops import token_count

    base = token_count(docs.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull()))
    budget = 2_000
    out = sample_to_token_budget(base, "lang", budget_tokens=budget, token_col="n_tokens")
    rows = out.select("doc_id", "lang", "n_tokens").collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    order = {
        r["doc_id"]: (r["fr"], r["doc_id"])
        for r in base.select("doc_id", hash_fraction("doc_id").alias("fr")).collect()
    }
    for lang, kept in by_lang.items():
        total = sum(r["n_tokens"] for r in kept)
        assert total <= budget, (lang, total)
        # take-while: the kept set is exactly the maximal md5-order prefix
        want = base.filter(F.col("lang").eqNullSafe(F.lit(lang))).select("doc_id", "n_tokens").collect()
        want_sorted = sorted(want, key=lambda r: order[r["doc_id"]])
        prefix, acc = set(), 0
        for r in want_sorted:
            if acc + r["n_tokens"] > budget:
                break
            acc += r["n_tokens"]
            prefix.add(r["doc_id"])
        assert {r["doc_id"] for r in kept} == prefix, lang


# ---------------------------------------------------------------------------
# Keeper-policy dedup
# ---------------------------------------------------------------------------


def test_dedup_keep_best_argmax_and_ties(spark):
    from okay_spark.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        # cluster {1,2,3}: 2 has the best score (min-id policy would keep 1);
        # cluster {10,11}: tied scores -> min id 10 wins; 20 is a singleton
        [(1, 5), (2, 9), (3, 7), (10, 4), (11, 4), (20, 1)],
        "doc_id long, quality long",
    )
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a long, b long")
    rows = {r["doc_id"]: r for r in dedup_keep_best(docs, edges, "quality").collect()}
    assert len(rows) == 6
    assert [rows[i]["is_canonical"] for i in (1, 2, 3)] == [False, True, False]
    assert rows[10]["is_canonical"] and not rows[11]["is_canonical"]
    assert rows[20]["is_canonical"]
    assert rows[1]["component"] == rows[2]["component"] == rows[3]["component"]
    # exactly one keeper per component
    comps = {}
    for r in rows.values():
        comps.setdefault(r["component"], 0)
        comps[r["component"]] += int(r["is_canonical"])
    assert all(v == 1 for v in comps.values())


def test_dedup_keep_best_driver_entry_differs_from_min_id(spark):
    """At sf0.001 the SimHash clusters must contain at least one cluster
    whose longest member is not the smallest id — otherwise the keeper
    policy would be indistinguishable from dedup_clusters and the driver
    row vacuous."""
    import __spark_entry__ as e

    rows = e.queries()["dedup_keep_best_documents"](spark, SF_DIR).collect()
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    multi = [v for v in by_comp.values() if len(v) > 1]
    assert multi, "no multi-member clusters at this sf — fixture regression"
    differs = [
        v
        for v in multi
        if next(r["doc_id"] for r in v if r["is_canonical"]) != min(r["doc_id"] for r in v)
    ]
    assert differs, "keeper never differs from min-id: policy untested"


# ---------------------------------------------------------------------------
# Streaming stateful aggregation == batch
# ---------------------------------------------------------------------------


def test_streaming_partition_summary_equals_batch(spark):
    import __spark_entry__ as e
    from okay_spark.checks import partition_summary
    from okay_spark.fixtures import document_schema, oracle_interleaved_documents

    docs = oracle_interleaved_documents(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )
    batch = {
        r["part"]: (r["n_docs"], r["n_violations"], r["n_failed_docs"], round(r["pass_rate"], 6))
        for r in partition_summary(docs, document_schema, "part").collect()
    }
    streamed = {
        r["part"]: (r["n_docs"], r["n_violations"], r["n_failed_docs"], r["pass_rate"])
        for r in e.queries()["streaming_summary_spans"](spark, SF_DIR).collect()
    }
    assert streamed == batch and len(batch) == 32


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
