"""Round-5 data-mixing / data-selection operators: alpha-temperature
mixture weights, DSIR importance log-ratios, CCNet head/middle/tail
quality buckets. Pins: the published math (weights sum to 1, alpha
flattens, target docs score higher), edge semantics (empty docs, tie
groups, Laplace smoothing finiteness), and the bit-exact discipline
(partition-invariant results)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _docs(spark):
    rows = []
    # hot source: 60 docs of common-vocab text
    for i in range(60):
        rows.append((i, "the cat sat on the mat near the door", "web", "en"))
    # small source: 10 docs, distinct vocabulary
    for i in range(100, 110):
        rows.append((i, "quantum flux harmonics resonate beyond measure", "books", "en"))
    # non-target language docs
    for i in range(200, 220):
        rows.append((i, "le chat dort sur le tapis pres de la porte", "web", "fr"))
    rows.append((999, "", "web", "en"))  # empty doc
    return spark.createDataFrame(rows, "doc_id: long, text: string, source: string, lang: string")


# ---------------------------------------------------------------------------
# mixture_weights
# ---------------------------------------------------------------------------


def test_mixture_weights_sum_to_one_and_alpha_flattens(spark):
    from okay_spark.balance import mixture_weights

    docs = _docs(spark)
    w_half = {r["source"]: r for r in mixture_weights(docs, "source", alpha=0.5).collect()}
    w_prop = {r["source"]: r for r in mixture_weights(docs, "source", alpha=1.0).collect()}
    assert abs(sum(r["weight"] for r in w_half.values()) - 1.0) < 1e-12
    # alpha=1 is proportional sampling: weight == share exactly
    for r in w_prop.values():
        assert r["weight"] == r["share"]
    # alpha=0.5 moves weight from the big source to the small one
    assert w_half["books"]["weight"] > w_prop["books"]["weight"]
    assert w_half["web"]["weight"] < w_prop["web"]["weight"]
    # sqrt routing matches the closed form to the decimal(38,12)-denominator
    # discipline (each sqrt term is rounded to 12dp before the sum, so the
    # last ulps differ from a pure-float denominator — that is the point:
    # the sum is aggregation-order-independent)
    expect = math.sqrt(w_prop["web"]["share"]) / (
        math.sqrt(w_prop["web"]["share"]) + math.sqrt(w_prop["books"]["share"])
    )
    assert abs(w_half["web"]["weight"] - expect) < 1e-11


def test_mixture_weights_epochs_flags_upsampled_source(spark):
    from okay_spark.balance import mixture_weights

    docs = _docs(spark)
    out = {r["source"]: r for r in
           mixture_weights(docs, "source", alpha=0.5, budget_tokens=10_000).collect()}
    for r in out.values():
        assert r["epochs"] == (r["weight"] * 10_000.0) / float(r["n_tokens"])
    # the small source repeats far more often than the hot one at a fixed mix
    assert out["books"]["epochs"] > out["web"]["epochs"]


def test_mixture_weights_partition_invariant_and_python_free(spark):
    from okay_spark.balance import mixture_weights

    docs = _docs(spark)
    a = sorted(map(tuple, mixture_weights(docs.repartition(1), "source").collect()))
    b = sorted(map(tuple, mixture_weights(docs.repartition(7), "source").collect()))
    assert a == b
    plan = mixture_weights(docs, "source")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# dsir_logratio
# ---------------------------------------------------------------------------


def test_dsir_target_docs_outscore_offtarget(spark):
    from okay_spark.textops import dsir_logratio

    docs = _docs(spark)
    out = {r["doc_id"]: r for r in dsir_logratio(docs, F.col("lang") == "en").collect()}
    en_scores = [out[i]["dsir_logratio"] for i in range(60)]
    fr_scores = [out[i]["dsir_logratio"] for i in range(200, 220)]
    # English docs look like the target LM; French docs are penalized
    assert min(en_scores) > max(fr_scores)
    # every score is finite: Laplace smoothing, never ln(0)
    for r in out.values():
        if r["dsir_logratio"] is not None:
            assert math.isfinite(r["dsir_logratio"])


def test_dsir_empty_doc_and_partition_invariance(spark):
    from okay_spark.textops import dsir_logratio

    docs = _docs(spark)
    out = {r["doc_id"]: r for r in dsir_logratio(docs, F.col("lang") == "en").collect()}
    assert out[999]["n_tokens"] == 0 and out[999]["dsir_logratio"] is None
    a = sorted(map(tuple, dsir_logratio(docs.repartition(1), F.col("lang") == "en").collect()))
    b = sorted(map(tuple, dsir_logratio(docs.repartition(5), F.col("lang") == "en").collect()))
    assert a == b


# ---------------------------------------------------------------------------
# quality_buckets
# ---------------------------------------------------------------------------


def test_quality_buckets_split_each_group_into_thirds(spark):
    from okay_spark.textops import quality_buckets

    # 9 docs per language with 9 distinct scores each (varying repetition of
    # a rare token changes the unigram score monotonically)
    rows = []
    for lang_i, lang in enumerate(["en", "fr"]):
        for j in range(9):
            text = " ".join(["common"] * 10 + [f"rare{lang}{j}"] * (j + 1))
            rows.append((lang_i * 100 + j, text, lang))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    out = quality_buckets(docs).collect()
    from collections import Counter

    per = Counter((r["lang"], r["bucket"]) for r in out)
    for lang in ["en", "fr"]:
        assert per[(lang, "head")] == 3
        assert per[(lang, "middle")] == 3
        assert per[(lang, "tail")] == 3


def test_quality_buckets_tie_group_falls_to_later_bucket(spark):
    from okay_spark.textops import quality_buckets

    # all docs in the language share one score -> one tie group spanning all
    # boundaries -> everything is 'tail' (3c <= 2n fails at c == n)
    rows = [(i, "same exact words here", "en") for i in range(6)]
    rows.append((99, "", "en"))  # empty doc -> NULL bucket
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    out = {r["doc_id"]: r["bucket"] for r in quality_buckets(docs).collect()}
    assert all(out[i] == "tail" for i in range(6))
    assert out[99] is None


def test_quality_buckets_null_group_is_its_own_cohort(spark):
    from okay_spark.textops import quality_buckets

    rows = []
    for j in range(6):
        text = " ".join(["common"] * 10 + [f"rare{j}"] * (j + 1))
        rows.append((j, text, None))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    out = [r for r in quality_buckets(docs).collect()]
    buckets = {r["bucket"] for r in out}
    assert buckets == {"head", "middle", "tail"}, "null lang must still bucket"
