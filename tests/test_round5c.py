"""Final round-5 operators: Benford first-digit conformance, Zipf-law fit,
and the unigram-LM log-prob quality score — value checks (hand-computed
fixtures), degenerate-input behavior, and the plan pins (single designed
shuffle for Benford; the unigram (doc, token) frame localCheckpoint-pinned
to one corpus evaluation)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


# ---------------------------------------------------------------------------
# benford_first_digit
# ---------------------------------------------------------------------------


def test_benford_counts_and_chi2(spark):
    from okay_spark.checks import benford_first_digit

    # digits: 1 (x3: 1.0, 19.5, 0.001234 -> "1"), 2 (x1), 9 (x1); zero,
    # NULL, NaN and negative-with-digit-3 rows: -30 counts under digit 3
    rows = [(1.0,), (19.5,), (0.001234,), (2.5,), (9.0,), (0.0,), (None,), (float("nan"),), (-30.0,)]
    df = spark.createDataFrame(rows, "v: double")
    out = {r["digit"]: r for r in benford_first_digit(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    n_obs = {d: out[d]["n_observed"] for d in out}
    assert n_obs == {1: 3, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 1}
    n = 6
    chi = sum(
        (n_obs[d] - n * math.log10(1 + 1 / d)) ** 2 / (n * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )
    assert out[1]["chi2"] == pytest.approx(chi, abs=1e-4)
    assert out[4]["n_observed"] == 0  # zero-count digits keep their row
    assert out[1]["observed_share"] == 3 / 6
    assert out[1]["expected_share"] == pytest.approx(math.log10(2), abs=1e-6)


def test_benford_scientific_notation_digit(spark):
    from okay_spark.checks import benford_first_digit

    # values that stringify with an exponent: the leading nonzero digit of
    # the shortest repr is the first significant digit regardless of format
    rows = [(1.5e-7,), (7.2e12,), (3e-20,)]
    df = spark.createDataFrame(rows, "v: double")
    out = {r["digit"]: r["n_observed"] for r in benford_first_digit(df, "v").collect()}
    assert out[1] == 1 and out[7] == 1 and out[3] == 1


def test_benford_empty_input_reports_nulls(spark):
    from okay_spark.checks import benford_first_digit

    df = spark.createDataFrame([(0.0,), (None,)], "v: double")
    out = benford_first_digit(df, "v").collect()
    assert len(out) == 9
    assert all(r["n_observed"] == 0 for r in out)
    assert all(r["chi2"] is None for r in out)
    assert all(r["observed_share"] == 0.0 for r in out)


def test_benford_plan_one_designed_shuffle(spark):
    from okay_spark.checks import benford_first_digit

    df = spark.range(1, 1000).select((F.col("id") * 7 % 997).cast("double").alias("v"))
    plan = _final_plan(benford_first_digit(df, "v"))
    assert plan.count("Exchange hashpartitioning") <= 1
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan


# ---------------------------------------------------------------------------
# zipf_fit
# ---------------------------------------------------------------------------


def test_zipf_fit_exact_slope_on_constructed_corpus(spark):
    from okay_spark.textops import zipf_fit

    # one document whose token frequencies are exactly Zipfian with slope -1:
    # token t1 x 12, t2 x 6, t3 x 4, t4 x 3 (freq = 12 / rank)
    text = " ".join(["t1"] * 12 + ["t2"] * 6 + ["t3"] * 4 + ["t4"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    row = zipf_fit(df, top_n=10).collect()[0]
    assert row["n_terms"] == 4
    assert row["slope"] == pytest.approx(-1.0, abs=1e-6)
    assert row["intercept"] == pytest.approx(math.log(12.0), abs=1e-6)
    assert row["r2"] == pytest.approx(1.0, abs=1e-6)


def test_zipf_fit_top_n_cut_is_deterministic(spark):
    from okay_spark.textops import zipf_fit

    # six tokens tied at freq 2: the (tf desc, tok asc) order keeps a..d and
    # drops e/f at top_n=4 on every engine/partitioning
    text = " ".join(t for t in ["a", "b", "c", "d", "e", "f"] for _ in range(2))
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    row = zipf_fit(df, top_n=4).collect()[0]
    assert row["n_terms"] == 4
    # all frequencies equal -> ln(freq) constant -> slope exactly 0
    assert row["slope"] == pytest.approx(0.0, abs=1e-9)
    assert row["r2"] is None  # vy == 0: R^2 undefined, not NaN


def test_zipf_fit_degenerate_inputs(spark):
    from okay_spark.textops import zipf_fit

    one = spark.createDataFrame([(1, "only only only")], "doc_id: long, text: string")
    row = zipf_fit(one).collect()[0]
    assert row["n_terms"] == 1
    assert row["slope"] is None and row["intercept"] is None and row["r2"] is None

    empty = spark.createDataFrame([(1, ""), (2, None)], "doc_id: long, text: string")
    row = zipf_fit(empty).collect()[0]
    assert row["n_terms"] == 0 and row["slope"] is None


# ---------------------------------------------------------------------------
# unigram_logprob_score
# ---------------------------------------------------------------------------


def test_unigram_logprob_hand_computed(spark):
    from okay_spark.textops import unigram_logprob_score

    # corpus: doc1 = "a a b", doc2 = "a c"; totals a=3, b=1, c=1, total=5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id: long, text: string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob_score(df).collect()}
    lp = lambda tf: math.log(tf / 5.0)
    want1 = (2 * lp(3) + 1 * lp(1)) / 3
    want2 = (1 * lp(3) + 1 * lp(1)) / 2
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_logprob"] == pytest.approx(want1, abs=1e-6)
    assert out[2]["n_tokens"] == 2
    assert out[2]["avg_logprob"] == pytest.approx(want2, abs=1e-6)
    assert all(r["avg_logprob"] <= 0 for r in out.values())


def test_unigram_logprob_empty_doc_keeps_row(spark):
    from okay_spark.textops import unigram_logprob_score

    df = spark.createDataFrame(
        [(1, "x y"), (2, ""), (3, None)], "doc_id: long, text: string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob_score(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_tokens"] == 0 and out[2]["avg_logprob"] is None
    assert out[3]["n_tokens"] == 0 and out[3]["avg_logprob"] is None


def test_unigram_logprob_single_corpus_evaluation(spark, tmp_path):
    from okay_spark.textops import unigram_logprob_score

    # the (doc, token) frame is lazily localCheckpoint-ed: the executed plan
    # must not re-tokenize the corpus for the vocabulary side — no parquet
    # FileScan survives in the final plan (both consumers read the pinned
    # RDD as Scan ExistingRDD) and the designed shuffle budget holds
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common") for i in range(200)],
        "doc_id: long, text: string",
    ).write.parquet(path)
    out = unigram_logprob_score(spark.read.parquet(path))
    plan = _final_plan(out)
    assert "FileScan" not in plan
    assert plan.count("Scan ExistingRDD") >= 1
    assert plan.count("Exchange hashpartitioning") <= 4
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan
