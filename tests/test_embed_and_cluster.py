"""Unit tests for the round-2 pipeline operators: connected-component dedup
clustering, embedding analytics (centroids, int8 quantization, normalize),
in-document repetition stats, and n-gram decontamination.

All semantics are also oracle-checked against DuckDB SQL at sf0.01 via
scripts/check_oracle.py; these tests pin the behavior on tiny hand-built
frames where the expected answer is computable by eye.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F


# ---------------------------------------------------------------------------
# connected components / dedup clustering
# ---------------------------------------------------------------------------


def test_connected_components_merges_transitive_pairs(spark):
    from okay_spark.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (7, 3)], ["a", "b"]
    )
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_connected_components_chain_needs_multiple_rounds(spark):
    from okay_spark.dedup import connected_components

    # a path graph 0-1-2-...-9: min label must walk the full diameter
    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], ["a", "b"])
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {i: 0 for i in range(10)}


def test_dedup_clusters_keeps_singletons_and_marks_canonical(spark):
    from okay_spark.dedup import dedup_clusters

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(6)])
    edges = spark.createDataFrame([(0, 4), (4, 5)], ["a", "b"])
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, edges).collect()}
    assert len(rows) == 6
    assert rows[0]["component"] == 0 and rows[0]["is_canonical"]
    assert rows[4]["component"] == 0 and not rows[4]["is_canonical"]
    assert rows[5]["component"] == 0 and not rows[5]["is_canonical"]
    for singleton in (1, 2, 3):
        assert rows[singleton]["component"] == singleton
        assert rows[singleton]["is_canonical"]


# ---------------------------------------------------------------------------
# embedding analytics
# ---------------------------------------------------------------------------


def test_l2_normalize_unit_norm_and_zero_safe(spark):
    from okay_spark.embedops import l2_norm, l2_normalize

    df = spark.createDataFrame(
        [Row(v=[3.0, 4.0]), Row(v=[0.0, 0.0])]
    )
    out = df.select(
        l2_norm("v").alias("n"), l2_normalize("v").alias("u")
    ).collect()
    assert out[0]["n"] == pytest.approx(5.0)
    assert out[0]["u"] == pytest.approx([0.6, 0.8])
    assert out[1]["u"] == pytest.approx([0.0, 0.0])  # no NaN on zero vectors


def test_label_centroids_elementwise_mean(spark):
    from okay_spark.embedops import label_centroids

    df = spark.createDataFrame(
        [
            Row(label=0, embedding=[1.0, 2.0]),
            Row(label=0, embedding=[3.0, 6.0]),
            Row(label=1, embedding=[10.0, 0.0]),
        ]
    )
    out = {(r["label"], r["pos"]): (r["centroid"], r["n"]) for r in label_centroids(df).collect()}
    assert out == {
        (0, 0): (2.0, 2),
        (0, 1): (4.0, 2),
        (1, 0): (10.0, 1),
        (1, 1): (0.0, 1),
    }


def test_quantize_int8_roundtrip_error_bounded(spark):
    from okay_spark.embedops import quantization_error, quantize_int8

    df = spark.createDataFrame(
        [Row(label=0, embedding=[1.0, -0.5, 0.25]), Row(label=0, embedding=[0.1, 0.2, -0.3])]
    )
    scale, q = quantize_int8("embedding")
    row = df.select(scale.alias("s"), q.alias("q")).first()
    assert row["s"] == pytest.approx(127.0)
    assert row["q"] == [127, -63, 32]  # floor(x*127 + 0.5)
    err = quantization_error(df).collect()
    assert len(err) == 1
    # worst-case symmetric int8 error is half a quantization step (the
    # reported value is rounded to 8 decimals, hence the 5e-9 slack)
    assert err[0]["max_abs_err"] <= 0.5 / 127.0 + 5e-9
    assert err[0]["avg_mse"] >= 0.0
    assert err[0]["n"] == 2


def test_self_cosine_check_flags_zero_vectors(spark):
    from okay_spark.embedops import normalized_self_cosine_check

    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 1.0]), Row(vec_id=1, embedding=[0.0, 0.0])]
    )
    bad = normalized_self_cosine_check(df).collect()
    assert [r["vec_id"] for r in bad] == [1]


# ---------------------------------------------------------------------------
# repetition + contamination
# ---------------------------------------------------------------------------


def test_repetition_stats_detects_looped_text(spark):
    from okay_spark.textops import repetition_stats

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam spam"),
            Row(doc_id=2, text="all words here are unique"),
            Row(doc_id=3, text="one"),  # shorter than the gram width
        ]
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, k=2).collect()}
    assert out[1]["n_grams"] == 4 and out[1]["n_distinct_grams"] == 1
    assert out[1]["dup_gram_ratio"] == pytest.approx(0.75)
    assert out[2]["dup_gram_ratio"] == 0.0
    assert out[3]["n_grams"] == 0 and out[3]["dup_gram_ratio"] == 0.0


def test_ngram_contamination_counts_benchmark_overlap(spark):
    from okay_spark.textops import ngram_contamination

    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="completely disjoint words nothing shared here at all"),
        ]
    )
    benchmark = spark.createDataFrame(
        [Row(doc_id=100, text="quick brown fox leaps again")]
    )
    out = {r["doc_id"]: r for r in ngram_contamination(corpus, benchmark, k=3).collect()}
    # only "quick brown fox" is shared
    assert out[1]["n_overlap"] == 1
    assert out[1]["n_shingles"] == 7
    assert out[1]["contamination"] == pytest.approx(1 / 7, abs=1e-6)
    assert out[2]["n_overlap"] == 0 and out[2]["contamination"] == 0.0


def test_contamination_scales_benchmark_side_to_distinct_shingles(spark):
    from okay_spark.textops import ngram_contamination

    # duplicate benchmark docs must not double-count overlaps
    corpus = spark.createDataFrame([Row(doc_id=1, text="a b c d")])
    benchmark = spark.createDataFrame(
        [Row(doc_id=i, text="a b c x y z") for i in range(5)]
    )
    out = ngram_contamination(corpus, benchmark, k=3).collect()[0]
    assert out["n_overlap"] == 1


# ---------------------------------------------------------------------------
# exact two-sample KS
# ---------------------------------------------------------------------------


def test_ks_exact_identical_distributions_is_zero(spark):
    from okay_spark.checks import ks_exact
    from pyspark.sql import Row

    a = spark.createDataFrame([Row(v=float(i % 10)) for i in range(100)])
    out = ks_exact(a, a, "v").collect()[0]
    assert out["ks_stat"] == 0.0
    assert out["n_current"] == out["n_reference"] == 100


def test_ks_exact_disjoint_supports_is_one(spark):
    from okay_spark.checks import ks_exact
    from pyspark.sql import Row

    lo = spark.createDataFrame([Row(v=float(i)) for i in range(50)])
    hi = spark.createDataFrame([Row(v=float(i + 1000)) for i in range(70)])
    out = ks_exact(lo, hi, "v").collect()[0]
    assert out["ks_stat"] == 1.0


def test_ks_exact_matches_scipy_formula_small_case(spark):
    from okay_spark.checks import ks_exact
    from pyspark.sql import Row

    cur = [1.0, 2.0, 2.0, 3.0, 9.0]
    ref = [2.0, 4.0, 4.0, 5.0]
    out = ks_exact(
        spark.createDataFrame([Row(v=x) for x in cur]),
        spark.createDataFrame([Row(v=x) for x in ref]),
        "v",
        partitions=3,
    ).collect()[0]
    # hand-computed ECDF gap: after value 3 -> |4/5 - 1/4| = 0.55
    assert out["ks_stat"] == pytest.approx(0.55)


def test_ks_exact_invariant_to_partition_count(spark):
    from okay_spark.checks import ks_exact
    from pyspark.sql import Row

    import random

    rng = random.Random(7)
    a = spark.createDataFrame([Row(v=rng.gauss(0, 1)) for _ in range(400)])
    b = spark.createDataFrame([Row(v=rng.gauss(0.5, 1)) for _ in range(300)])
    r1 = ks_exact(a, b, "v", partitions=2).collect()[0]
    r2 = ks_exact(a, b, "v", partitions=16).collect()[0]
    assert r1["ks_stat"] == r2["ks_stat"] > 0.0


def test_ks_exact_rejects_empty_side(spark):
    from okay_spark.checks import ks_exact
    from pyspark.sql import Row

    a = spark.createDataFrame([Row(v=1.0)])
    empty = spark.createDataFrame([], "v double")
    with pytest.raises(ValueError, match="non-null value"):
        ks_exact(a, empty, "v").collect()


# ---------------------------------------------------------------------------
# custom-rule Arrow column pruning (arrow_fields)
# ---------------------------------------------------------------------------


def test_custom_rule_arrow_fields_prunes_but_matches_unpruned(spark):
    from okay_spark.engine import validate_dataframe

    df = spark.createDataFrame(
        [
            Row(doc_id="a", spans=[
                Row(kind="text", text="hello world", media_ref=None, offset=0),
                Row(kind="media", text=None, media_ref="m-1", offset=5),
            ]),
            Row(doc_id="b", spans=[
                Row(kind="text", text="later", media_ref=None, offset=9),
                Row(kind="text", text="earlier", media_ref=None, offset=3),
            ]),
        ]
    )

    def mk_schema(declare):
        def schema():
            from okay_spark import ignore_extra_fields, required
            from okay_spark.messages import Message

            def offsets_monotonic(field, value, **kw):
                offs = [s.get("offset") for s in (value or []) if s is not None]
                if any(b < a for a, b in zip(offs, offs[1:])):
                    return Message(type="out_of_order_spans", field=field)

            kwargs = {"arrow_fields": ["offset"]} if declare else {}
            required("doc_id", type="string")
            required("spans", type="custom", validator=offsets_monotonic, **kwargs)
            ignore_extra_fields()

        return schema

    full = validate_dataframe(df, mk_schema(False), id_cols=["doc_id"]).collect()
    pruned = validate_dataframe(df, mk_schema(True), id_cols=["doc_id"]).collect()
    key = lambda r: (r["doc_id"], r["path"], r["rule"])  # noqa: E731
    assert sorted(map(key, full)) == sorted(map(key, pruned))
    assert {r["doc_id"] for r in pruned if r["rule"] == "out_of_order_spans"} == {"b"}


def test_custom_rule_sees_only_declared_fields(spark):
    from okay_spark.engine import validate_dataframe
    from okay_spark import ignore_extra_fields, required

    seen = []

    def schema():
        def spy(field, value, **kw):
            seen.append(sorted(value[0].keys()) if value else None)
            assert "arrow_fields" not in kw  # engine param never forwarded

        required("spans", type="custom", validator=spy, arrow_fields=["kind"])
        ignore_extra_fields()

    df = spark.createDataFrame(
        [("a", [("text", "payload", None, 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    validate_dataframe(df, schema, id_cols=["doc_id"]).collect()
    # the spy runs on executors; re-run via the single-doc compat API instead
    from okay_spark import validate

    validate(schema, {"spans": [{"kind": "text", "text": "x", "media_ref": None, "offset": 0}]})
    assert seen  # compat path executed the callable in-process


def test_arrow_fields_must_be_string_list(spark):
    from okay_spark import required
    from okay_spark.errors import SchemaError
    from okay_spark.schema import compile_schema

    def bad():
        required("spans", type="custom", validator=lambda f, v, **k: None, arrow_fields="offset")

    with pytest.raises(SchemaError, match="arrow_fields"):
        compile_schema(bad)


def test_connected_components_long_chain_converges_in_log_rounds(spark):
    from okay_spark.dedup import connected_components

    # a 200-node path needs 199 plain-propagation rounds; pointer doubling
    # must finish it within the 10-round cap (2^10 >> 200)
    edges = spark.createDataFrame([(i, i + 1) for i in range(199)], ["a", "b"])
    out = connected_components(edges, max_iter=10).collect()
    assert len(out) == 200
    assert {r["component"] for r in out} == {0}


def test_connected_components_raises_when_unconverged(spark):
    """An exhausted max_iter with labels still moving must raise, not return
    a partially-merged labeling as if it were exact."""
    import pytest

    from okay_spark.dedup import connected_components

    # 64-node path: 1 doubling round cannot finish it (needs ~log2(64))
    edges = spark.createDataFrame([(i, i + 1) for i in range(63)], ["a", "b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


def test_arrow_fields_preserves_null_elements_and_null_column(spark):
    from okay_spark.engine import validate_dataframe
    from okay_spark import ignore_extra_fields, required
    from okay_spark.messages import Message

    df = spark.createDataFrame(
        [
            ("a", [("text", "x", None, 0), None, ("text", "y", None, 5)]),
            ("b", None),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )

    def mk(declare):
        def schema():
            def shape(field, value, **kw):
                desc = "|".join(
                    "None" if s is None else ",".join(sorted(s))
                    for s in (value or [])
                )
                return Message(type=f"shape_{desc or 'null'}", field=field)

            kw = {"arrow_fields": ["offset"]} if declare else {}
            required("spans", type="custom", validator=shape, **kw)
            ignore_extra_fields()

        return schema

    full = sorted(
        (r["doc_id"], r["rule"])
        for r in validate_dataframe(df, mk(False), id_cols=["doc_id"]).collect()
    )
    pruned_rows = validate_dataframe(df, mk(True), id_cols=["doc_id"]).collect()
    pruned = sorted((r["doc_id"], r["rule"]) for r in pruned_rows)
    # the null MIDDLE element must stay None under pruning (not become a
    # struct of nulls), and the null column must keep its null_value rule;
    # key shapes differ by design (pruned callables see declared keys only)
    assert [r for d, r in pruned if d == "a"] == ["shape_offset|None|offset"]
    assert ("b", "null_value") in pruned and ("b", "null_value") in full
