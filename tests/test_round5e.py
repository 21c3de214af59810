"""Round-5 late additions: corpus-overlap matrix and friends."""

from __future__ import annotations

import pytest


class TestCorpusGroupJaccard:
    @pytest.fixture(scope="class")
    def out(self, spark):
        from okay_spark.dedup import corpus_group_jaccard

        df = spark.createDataFrame(
            [
                # group a: shingle set {x y z, y z w, p q r}
                ("a", "x y z w"),
                ("a", "p q r"),
                # duplicate shingle within the group counts once
                ("a", "x y z"),
                # group b: {x y z, y z q}
                ("b", "x y z q"),
                # group c: below shingle_k tokens -> contributes nothing
                ("c", "aa bb"),
            ],
            "lang string, text string",
        )
        rows = corpus_group_jaccard(df, "lang").collect()
        return {(r["ga"], r["gb"]): r for r in rows}

    def test_single_overlapping_pair(self, out):
        assert list(out) == [("a", "b")]

    def test_exact_counts_and_jaccard(self, out):
        r = out[("a", "b")]
        assert (r["n_inter"], r["n_a"], r["n_b"]) == (1, 3, 2)
        assert r["jaccard"] == pytest.approx(0.25)

    def test_disjoint_and_empty_groups_absent(self, out):
        # group c produced no shingles; no (a,c)/(b,c) rows, and no
        # zero-intersection rows anywhere.
        assert all("c" not in k for k in out)


def test_corpus_jaccard_is_symmetric_in_input_order(spark):
    """Partition/row order must not affect the matrix (distinct + exact
    integer counts)."""
    from okay_spark.dedup import corpus_group_jaccard

    rows = [
        ("en", "the cat sat on the mat"),
        ("en", "a cat sat on a hat"),
        ("fr", "the cat sat on something else entirely"),
        ("fr", "le chat est sur le tapis"),
    ]
    df1 = spark.createDataFrame(rows, "lang string, text string")
    df2 = spark.createDataFrame(rows[::-1], "lang string, text string").repartition(3)
    a = {tuple(r) for r in corpus_group_jaccard(df1, "lang").collect()}
    b = {tuple(r) for r in corpus_group_jaccard(df2, "lang").collect()}
    assert a == b and len(a) == 1


class TestLogOddsTokens:
    @pytest.fixture(scope="class")
    def rows(self, spark):
        from okay_spark.textops import log_odds_tokens

        df = spark.createDataFrame(
            [
                ("en", "aa aa aa bb bb cc"),
                ("en", "aa aa bb cc cc dd"),
                ("fr", "bb bb bb cc dd dd"),
                (None, "dd dd cc cc bb aa"),  # null group counts as rest
            ],
            "lang string, text string",
        )
        return log_odds_tokens(
            df, "lang", target="en", alpha0=10.0, min_count=2, top_n=10
        ).collect()

    def test_counts_exact(self, rows):
        by_tok = {r["tok"]: r for r in rows}
        assert (by_tok["aa"]["n_target"], by_tok["aa"]["n_rest"]) == (5, 1)
        assert (by_tok["dd"]["n_target"], by_tok["dd"]["n_rest"]) == (1, 4)

    def test_sign_direction(self, rows):
        by_tok = {r["tok"]: r for r in rows}
        assert by_tok["aa"]["z"] > 0  # target-associated
        assert by_tok["dd"]["z"] < 0  # rest-associated

    def test_matches_python_replay(self, rows):
        import math

        # replay the exact expression for 'aa': y1=5, y2=1, n1=12, n2=12
        a0, y1, y2, n1, n2 = 10.0, 5.0, 1.0, 12.0, 12.0
        ai = a0 * (5 + 1) / (12 + 12)
        delta = math.log((y1 + ai) / (n1 + a0 - y1 - ai)) - math.log(
            (y2 + ai) / (n2 + a0 - y2 - ai)
        )
        var = 1.0 / (y1 + ai) + 1.0 / (y2 + ai)
        z = delta / math.sqrt(var)
        by_tok = {r["tok"]: r for r in rows}
        assert by_tok["aa"]["delta"] == pytest.approx(round(delta, 6), abs=1e-9)
        assert by_tok["aa"]["z"] == pytest.approx(round(z, 6), abs=1e-9)

    def test_ordered_by_abs_z(self, rows):
        zs = [abs(r["z"]) for r in rows]
        assert zs == sorted(zs, reverse=True)


class TestEwmaAnomalies:
    @pytest.fixture(scope="class")
    def rows(self, spark):
        from datetime import datetime

        from okay_spark.checks import ewma_anomalies

        evs = []
        # group A: steady 4/day for 4 days, then a 20-count spike, then 1
        counts = {1: 4, 2: 4, 3: 4, 4: 4, 5: 20, 6: 1}
        for day, n in counts.items():
            for j in range(n):
                evs.append((datetime(2024, 1, day, 8, j), "A"))
        # group B: single day -> seeds only, never anomalous
        evs.append((datetime(2024, 1, 1, 9, 0), "B"))
        df = spark.createDataFrame(evs, "ts timestamp_ntz, event_type string")
        out = ewma_anomalies(df, "ts", "event_type", alpha=0.25, k=2.0)
        return {(r["grp"], r["day"].day): r for r in out.collect()}

    def test_first_day_seeds(self, rows):
        r = rows[("A", 1)]
        assert r["ewma_prev"] == 4.0 and r["ratio"] == 1.0
        assert not r["is_anomaly"]
        assert not rows[("B", 1)]["is_anomaly"]

    def test_steady_days_not_anomalous(self, rows):
        for d in (2, 3, 4):
            assert not rows[("A", d)]["is_anomaly"]
            assert rows[("A", d)]["ewma_prev"] == 4.0

    def test_spike_flagged_high(self, rows):
        r = rows[("A", 5)]
        assert r["ewma_prev"] == 4.0 and r["ratio"] == 5.0
        assert r["is_anomaly"]

    def test_drop_flagged_low_with_adapted_ewma(self, rows):
        # EWMA after day 5: 0.25*20 + 0.75*4 = 8.0; day 6 count 1 -> 0.125
        r = rows[("A", 6)]
        assert r["ewma_prev"] == 8.0
        assert r["ratio"] == pytest.approx(0.125)
        assert r["is_anomaly"]

    def test_python_fold_replay(self, rows):
        # replay the sequential fold for day 6: seed 4, fold [4,4,4,20]
        e = 4.0
        for x in [4.0, 4.0, 4.0, 20.0]:
            e = 0.25 * x + 0.75 * e
        assert rows[("A", 6)]["ewma_prev"] == pytest.approx(round(e, 6))


class TestHeapsFit:
    def _replay(self, docs, buckets):
        """Pure-Python replay of the checkpoint + regression algorithm."""
        import math

        ids = [i for i, _ in docs]
        mn, mx = min(ids), max(ids)
        span = mx - mn

        def bkt(i):
            if span == 0:
                return 1
            return max(((i - mn) * buckets + span - 1) // span, 1)

        toks_in = {}
        first = {}
        for i, text in docs:
            b = bkt(i)
            ts = [t for t in text.split(" ") if t]
            toks_in[b] = toks_in.get(b, 0) + len(ts)
            for t in ts:
                first[t] = min(first.get(t, b), b)
        new_in = {}
        for t, b in first.items():
            new_in[b] = new_in.get(b, 0) + 1
        pts, n, v = [], 0, 0
        for b in sorted(set(toks_in) | set(new_in)):
            n += toks_in.get(b, 0)
            v += new_in.get(b, 0)
            if n > 0 and v > 0:
                pts.append((math.log(n), math.log(v)))
        k = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        vx = k * sxx - sx * sx
        cov = k * sxy - sx * sy
        beta = cov / vx
        intercept = (sy - beta * sx) / k
        return k, beta, intercept

    def test_matches_python_replay(self, spark):
        from okay_spark.textops import heaps_fit

        docs = [
            (1, "a b c d"),
            (2, "a b e f g"),
            (3, "a h i"),
            (4, "b c j k l m"),
            (5, "a b c n"),
            (6, "o p"),
            (7, "a q r s"),
            (8, "b t"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        row = heaps_fit(df, buckets=4).first()
        k, beta, intercept = self._replay(docs, 4)
        assert row["n_points"] == k
        assert row["beta"] == pytest.approx(round(beta, 6), abs=1e-6)
        assert row["intercept"] == pytest.approx(round(intercept, 6), abs=1e-6)
        assert 0.0 < row["beta"] <= 1.0

    def test_saturating_corpus_flattens(self, spark):
        from okay_spark.textops import heaps_fit

        # same 3 tokens repeated: vocabulary saturates at the first bucket
        docs = [(i, "x y z") for i in range(1, 33)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        row = heaps_fit(df, buckets=8).first()
        assert row["beta"] == pytest.approx(0.0, abs=1e-9)

    def test_single_doc_degenerate(self, spark):
        from okay_spark.textops import heaps_fit

        df = spark.createDataFrame([(7, "a b c")], "doc_id long, text string")
        row = heaps_fit(df).first()
        assert row["n_points"] == 1
        assert row["beta"] is None and row["r2"] is None

    def test_empty_corpus(self, spark):
        from okay_spark.textops import heaps_fit

        df = spark.createDataFrame([], "doc_id long, text string")
        row = heaps_fit(df).first()
        assert row["n_points"] == 0 and row["beta"] is None


class TestDuplicatedNgramRatio:
    @pytest.fixture(scope="class")
    def out(self, spark):
        from okay_spark.dedup import duplicated_ngram_ratio

        df = spark.createDataFrame(
            [
                (1, "a b c d e"),      # grams: abc bcd cde
                (2, "a b c x y"),      # grams: abc bcx cxy -> shares abc
                (3, "p q r s"),        # grams: pqr qrs -> unique
                (4, "a b c d q"),      # abc bcd cdq -> shares abc, bcd
                (5, "hi"),             # < 3 tokens -> no grams
            ],
            "doc_id long, text string",
        )
        return {r["doc_id"]: r for r in duplicated_ngram_ratio(df).collect()}

    def test_all_docs_keep_rows(self, out):
        assert set(out) == {1, 2, 3, 4, 5}

    def test_ratios_exact(self, out):
        # doc1: abc(df3) bcd(df2) cde(df1) -> 2/3
        assert out[1]["n_grams"] == 3 and out[1]["n_dup"] == 2
        assert out[1]["dup_ratio"] == pytest.approx(round(2 / 3, 6))
        # doc2: abc shared only -> 1/3
        assert out[2]["n_dup"] == 1
        # doc3: nothing shared
        assert out[3]["n_dup"] == 0 and out[3]["dup_ratio"] == 0.0
        # doc4: abc, bcd shared -> 2/3
        assert out[4]["n_dup"] == 2

    def test_short_doc_null_ratio(self, out):
        r = out[5]
        assert r["n_grams"] == 0 and r["n_dup"] == 0 and r["dup_ratio"] is None

    def test_within_doc_repetition_not_counted(self, spark):
        from okay_spark.dedup import duplicated_ngram_ratio

        # the same gram repeated inside ONE doc is not "duplicated"
        df = spark.createDataFrame(
            [(1, "a b c a b c"), (2, "z z z z")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in duplicated_ngram_ratio(df).collect()}
        assert out[1]["n_dup"] == 0
        assert out[2]["n_dup"] == 0


class TestDedupCurve:
    def test_known_curve(self, spark):
        from okay_spark.dedup import dedup_curve

        # ids 1..8, buckets=4 -> two docs per bucket; texts engineered so
        # duplicates concentrate late
        docs = [
            (1, "u1"), (2, "u2"),     # bucket 1: 2 docs, 2 new
            (3, "u3"), (4, "u1"),     # bucket 2: 1 new (u1 dup)
            (5, "u2"), (6, "u2"),     # bucket 3: 0 new
            (7, "u4"), (8, "u1"),     # bucket 4: 1 new
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = {r["bucket"]: r for r in dedup_curve(df, buckets=4).collect()}
        assert (rows[1]["n_docs"], rows[1]["n_distinct"]) == (2, 2)
        assert rows[1]["dup_rate"] == 0.0
        assert (rows[2]["n_docs"], rows[2]["n_distinct"]) == (4, 3)
        assert rows[2]["dup_rate"] == 0.25
        assert (rows[3]["n_docs"], rows[3]["n_distinct"]) == (6, 3)
        assert rows[3]["dup_rate"] == 0.5
        assert (rows[4]["n_docs"], rows[4]["n_distinct"]) == (8, 4)
        assert rows[4]["dup_rate"] == 0.5

    def test_monotone_docs_and_rate_bounds(self, spark):
        from okay_spark.dedup import dedup_curve

        docs = [(i, f"t{i % 5}") for i in range(1, 41)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = dedup_curve(df, buckets=8).orderBy("bucket").collect()
        n = [r["n_docs"] for r in rows]
        assert n == sorted(n)
        assert all(0.0 <= r["dup_rate"] < 1.0 for r in rows)
        assert rows[-1]["n_distinct"] == 5 and rows[-1]["n_docs"] == 40

    def test_empty_input(self, spark):
        from okay_spark.dedup import dedup_curve

        df = spark.createDataFrame([], "doc_id long, text string")
        assert dedup_curve(df).count() == 0


class TestBinaryFilterEval:
    def test_known_confusion_matrix(self, spark):
        import math

        from pyspark.sql import functions as F

        from okay_spark.checks import binary_filter_eval

        # tp=3 fp=1 fn=2 tn=4
        rows = (
            [(True, True)] * 3
            + [(True, False)] * 1
            + [(False, True)] * 2
            + [(False, False)] * 4
        )
        df = spark.createDataFrame(rows, "p boolean, l boolean")
        r = binary_filter_eval(df, F.col("p"), F.col("l")).first()
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (3, 1, 2, 4)
        assert r["precision"] == pytest.approx(0.75)
        assert r["recall"] == pytest.approx(0.6)
        assert r["f1"] == pytest.approx(round(6 / 9, 6))
        mcc = (3 * 4 - 1 * 2) / math.sqrt(4 * 5 * 5 * 6)
        assert r["mcc"] == pytest.approx(round(mcc, 6))

    def test_nulls_count_as_false(self, spark):
        from pyspark.sql import functions as F

        from okay_spark.checks import binary_filter_eval

        df = spark.createDataFrame(
            [(None, True), (True, None), (None, None)], "p boolean, l boolean"
        )
        r = binary_filter_eval(df, F.col("p"), F.col("l")).first()
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 1, 1, 1)

    def test_degenerate_denominators_null(self, spark):
        from pyspark.sql import functions as F

        from okay_spark.checks import binary_filter_eval

        # predictor never fires: precision undefined, recall 0
        df = spark.createDataFrame([(False, True), (False, False)], "p boolean, l boolean")
        r = binary_filter_eval(df, F.col("p"), F.col("l")).first()
        assert r["precision"] is None and r["mcc"] is None
        assert r["recall"] == 0.0

    def test_empty_input(self, spark):
        from pyspark.sql import functions as F

        from okay_spark.checks import binary_filter_eval

        df = spark.createDataFrame([], "p boolean, l boolean")
        r = binary_filter_eval(df, F.col("p"), F.col("l")).first()
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 0, 0)
        assert r["f1"] is None


class TestCentroidSeparation:
    def test_separated_clusters(self, spark):
        from okay_spark.embedops import centroid_separation

        rows = [
            (1, "a", [1.0, 0.0, 0.1]),
            (2, "a", [0.9, 0.1, 0.0]),
            (3, "a", [1.0, 0.1, 0.1]),
            (4, "b", [0.0, 1.0, 0.1]),
            (5, "b", [0.1, 0.9, 0.0]),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, label string, embedding array<float>"
        )
        out = {r["label"]: r for r in centroid_separation(df).collect()}
        assert out["a"]["n"] == 3 and out["b"]["n"] == 2
        for lab in ("a", "b"):
            r = out[lab]
            assert r["mean_own"] > r["mean_other"]
            assert r["mean_margin"] > 0
            assert r["frac_separated"] == 1.0

    def test_entangled_labels_low_margin(self, spark):
        from okay_spark.embedops import centroid_separation

        # identical distributions -> centroids coincide, margins ~ 0
        rows = [
            (1, "a", [1.0, 1.0]),
            (2, "b", [1.0, 1.0]),
            (3, "a", [1.0, 1.0]),
            (4, "b", [1.0, 1.0]),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, label string, embedding array<float>"
        )
        out = centroid_separation(df).collect()
        for r in out:
            assert r["mean_margin"] == pytest.approx(0.0, abs=1e-9)
            assert r["frac_separated"] == 0.0

    def test_single_label_null_other(self, spark):
        from okay_spark.embedops import centroid_separation

        df = spark.createDataFrame(
            [(1, "a", [1.0, 2.0]), (2, "a", [2.0, 1.0])],
            "vec_id long, label string, embedding array<float>",
        )
        r = centroid_separation(df).first()
        assert r["mean_own"] is not None
        assert r["mean_other"] is None and r["mean_margin"] is None
        assert r["frac_separated"] == 0.0


class TestBigramLogprobScore:
    @pytest.fixture(scope="class")
    def rows(self, spark):
        from okay_spark.textops import bigram_logprob_score

        df = spark.createDataFrame(
            [
                (1, "a b a b a b"),   # fluent in this tiny corpus
                (2, "b a b a"),
                (3, "b b a a"),       # scrambled: rare transitions
                (4, "solo"),          # one token -> no bigrams
                (5, ""),              # empty
            ],
            "doc_id long, text string",
        )
        return {r["doc_id"]: r for r in bigram_logprob_score(df).collect()}

    def test_all_rows_kept(self, rows):
        assert set(rows) == {1, 2, 3, 4, 5}

    def test_short_docs_null(self, rows):
        for d in (4, 5):
            assert rows[d]["n_bigrams"] == 0 and rows[d]["avg_logprob"] is None

    def test_bigram_counts(self, rows):
        assert rows[1]["n_bigrams"] == 5
        assert rows[2]["n_bigrams"] == 3
        assert rows[3]["n_bigrams"] == 3

    def test_scrambled_scores_below_fluent(self, rows):
        assert rows[3]["avg_logprob"] < rows[1]["avg_logprob"]

    def test_python_replay(self, rows):
        import math
        from collections import Counter

        docs = {1: "a b a b a b", 2: "b a b a", 3: "b b a a"}
        bi = Counter()
        for text in docs.values():
            w = text.split()
            for i in range(len(w) - 1):
                bi[(w[i], w[i + 1])] += 1
        ctx = Counter()
        for (w1, _), c in bi.items():
            ctx[w1] += c
        v = len({w2 for _, w2 in bi})
        for d, text in docs.items():
            w = text.split()
            terms = [
                math.log((bi[(w[i], w[i + 1])] + 1) / (ctx[w[i]] + v))
                for i in range(len(w) - 1)
            ]
            expected = sum(terms) / len(terms)
            assert rows[d]["avg_logprob"] == pytest.approx(round(expected, 6), abs=1e-6)


class TestGopherQualityFlags:
    @pytest.fixture(scope="class")
    def rows(self, spark):
        from okay_spark.textops import gopher_quality_flags

        df = spark.createDataFrame(
            [
                # passes everything (5+ words, stopwords, alphabetic)
                (1, "the cat and the dog have fun with a ball"),
                # too few words
                (2, "the of"),
                # no stopword hits
                (3, "alpha beta gamma delta epsilon zeta"),
                # symbol-heavy
                (4, "the #tag #x #y and #z of #a #b #c #d"),
                # numeric words fail the alpha ratio
                (5, "the 1 2 3 4 5 6 7 8 of"),
                (6, ""),
                (7, None),
            ],
            "doc_id long, text string",
        )
        out = gopher_quality_flags(df, min_words=5, min_stop_hits=2)
        return {r["doc_id"]: r for r in out.collect()}

    def test_passing_doc(self, rows):
        r = rows[1]
        assert r["passes_gopher"]
        assert r["n_words"] == 10 and r["stop_hits"] == 5

    def test_word_count_gate(self, rows):
        assert not rows[2]["words_ok"] and not rows[2]["passes_gopher"]

    def test_stopword_gate(self, rows):
        assert rows[3]["stop_hits"] == 0 and not rows[3]["stopword_ok"]

    def test_symbol_gate(self, rows):
        r = rows[4]
        assert r["symbol_ratio"] == pytest.approx(round(8 / 11, 6))
        assert not r["symbol_ok"] and not r["passes_gopher"]

    def test_alpha_gate(self, rows):
        r = rows[5]
        assert r["alpha_ratio"] == pytest.approx(0.2)
        assert not r["alpha_ok"]

    def test_empty_and_null_fail_identically(self, rows):
        for d in (6, 7):
            r = rows[d]
            assert r["n_words"] == 0 and r["mean_word_len"] is None
            assert not r["passes_gopher"]


class TestMannKendallTrend:
    @pytest.fixture(scope="class")
    def rows(self, spark):
        from datetime import datetime

        from okay_spark.checks import mann_kendall_trend

        evs = []
        # "up": strictly increasing counts 1..8 -> S = 28, strong trend
        for day in range(1, 9):
            for j in range(day):
                evs.append((datetime(2024, 1, day, 6, j), "up"))
        # "down": strictly decreasing 8..1
        for day in range(1, 9):
            for j in range(9 - day):
                evs.append((datetime(2024, 1, day, 7, j), "down"))
        # "flat": all days identical -> all ties, var 0
        for day in range(1, 9):
            for j in range(3):
                evs.append((datetime(2024, 1, day, 8, j), "flat"))
        # "one": a single day
        evs.append((datetime(2024, 1, 1, 9, 0), "one"))
        df = spark.createDataFrame(evs, "ts timestamp_ntz, event_type string")
        return {r["grp"]: r for r in mann_kendall_trend(df).collect()}

    def test_increasing(self, rows):
        import math

        r = rows["up"]
        assert r["n_days"] == 8 and r["s_stat"] == 28
        assert r["tau"] == 1.0
        var = 8 * 7 * 21 / 18
        z = (28 - 1) / math.sqrt(var)
        assert r["var_s"] == pytest.approx(round(var, 6))
        assert r["z"] == pytest.approx(round(z, 6))
        assert r["trend"] == "increasing"

    def test_decreasing(self, rows):
        r = rows["down"]
        assert r["s_stat"] == -28 and r["tau"] == -1.0
        assert r["trend"] == "decreasing"

    def test_all_ties_zero_variance(self, rows):
        r = rows["flat"]
        assert r["s_stat"] == 0
        # tie term: one value with t=8 -> 8*7*21 == n-term -> var 0
        assert r["var_s"] == 0.0
        assert r["z"] is None and r["trend"] == "none"

    def test_single_day_group(self, rows):
        r = rows["one"]
        assert r["n_days"] == 1 and r["s_stat"] == 0
        assert r["var_s"] is None and r["tau"] is None and r["z"] is None
        assert r["trend"] == "none"


class TestGroupedExactQuantiles:
    def test_known_quantiles(self, spark):
        from okay_spark.checks import grouped_exact_quantiles

        # group A: values 1..10 once each; type-1 p50 = 5, p90 = 9, p99 = 10
        rows = [("A", float(v)) for v in range(1, 11)]
        # group B: heavy ties — 9x 1.0 and 1x 100.0: p50 = 1, p90 = 1, p99 = 100
        rows += [("B", 1.0)] * 9 + [("B", 100.0)]
        df = spark.createDataFrame(rows, "g string, value double")
        out = {
            (r["grp"], r["p_permille"]): r
            for r in grouped_exact_quantiles(df, "g", "value").collect()
        }
        assert out[("A", 500)]["value"] == 5.0
        assert out[("A", 900)]["value"] == 9.0
        assert out[("A", 990)]["value"] == 10.0
        assert out[("B", 500)]["value"] == 1.0
        assert out[("B", 900)]["value"] == 1.0
        assert out[("B", 990)]["value"] == 100.0
        assert out[("A", 500)]["n"] == 10 and out[("B", 990)]["n"] == 10

    def test_matches_numpy_nearest_rank(self, spark):
        import math

        from okay_spark.checks import grouped_exact_quantiles

        vals = [3.5, 1.25, 7.75, 2.0, 2.0, 9.5, 0.5, 4.0, 4.0, 4.0, 11.0]
        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, value double"
        )
        out = {
            r["p_permille"]: r["value"]
            for r in grouped_exact_quantiles(df, "g", "value").collect()
        }
        s = sorted(vals)
        for p in (500, 900, 990):
            rank = math.ceil(p / 1000 * len(s))  # type-1 nearest rank
            assert out[p] == s[rank - 1]

    def test_single_value_group(self, spark):
        from okay_spark.checks import grouped_exact_quantiles

        df = spark.createDataFrame([("g", 42.0)], "g string, value double")
        rows = grouped_exact_quantiles(df, "g", "value").collect()
        assert len(rows) == 3 and all(r["value"] == 42.0 for r in rows)


class TestClassificationEval:
    @pytest.fixture(scope="class")
    def rows(self, spark):
        from pyspark.sql import functions as F

        from okay_spark.checks import classification_eval

        pairs = (
            [("a", "a")] * 3      # a: 3 tp
            + [("a", "b")] * 2    # a predicted, b true
            + [("b", "b")] * 4    # b: 4 tp
            + [("c", "b")] * 1    # c predicted never true
            + [(None, "a")] * 1   # null prediction
        )
        df = spark.createDataFrame(pairs, "p string, l string")
        out = classification_eval(df, F.col("p"), F.col("l"))
        return {r["cls"]: r for r in out.collect()}

    def test_class_union_covers_all(self, rows):
        assert set(rows) == {"a", "b", "c", "(null)"}

    def test_counts(self, rows):
        a = rows["a"]
        assert (a["tp"], a["n_pred"], a["n_label"]) == (3, 5, 4)
        b = rows["b"]
        assert (b["tp"], b["n_pred"], b["n_label"]) == (4, 4, 7)

    def test_metrics(self, rows):
        a = rows["a"]
        assert a["precision"] == pytest.approx(0.6)
        assert a["recall"] == pytest.approx(0.75)
        assert a["f1"] == pytest.approx(round(6 / 9, 6))
        c = rows["c"]
        assert c["precision"] == 0.0 and c["recall"] is None

    def test_null_prediction_is_a_class(self, rows):
        n = rows["(null)"]
        assert n["n_pred"] == 1 and n["n_label"] == 0 and n["tp"] == 0
        assert n["recall"] is None and n["precision"] == 0.0


def test_stream_ewma_exact_batch_parity(spark):
    """The streaming daily-count state + EWMA finisher must equal the
    batch operator bit-for-bit (same rows, same doubles)."""
    from datetime import datetime

    from okay_spark.checks import ewma_anomalies
    from okay_spark.streaming import stream_ewma

    evs = []
    counts = {1: 4, 2: 7, 3: 2, 4: 9, 5: 20, 6: 1}
    for day, n in counts.items():
        for j in range(n):
            evs.append((datetime(2024, 1, day, 8, j), "A"))
            if day % 2:
                evs.append((datetime(2024, 1, day, 9, j), "B"))
    df = spark.createDataFrame(evs, "ts timestamp_ntz, event_type string")
    batch = {tuple(r) for r in ewma_anomalies(df).collect()}
    streamed = {tuple(r) for r in stream_ewma(spark, df).collect()}
    assert streamed == batch and len(batch) > 0


class TestCooccurrenceLift:
    @pytest.fixture(scope="class")
    def rows(self, spark):
        from okay_spark.relops import cooccurrence_lift

        baskets = {
            1: ["x", "y"],
            2: ["x", "y"],
            3: ["x", "z"],
            4: ["y"],
            5: ["w"],
        }
        data = [(u, it) for u, its in baskets.items() for it in its]
        # repeats must not matter (distinct baskets)
        data += [(1, "x"), (1, "y")]
        df = spark.createDataFrame(data, "user_id long, event_type string")
        out = cooccurrence_lift(df)
        return {(r["item_a"], r["item_b"]): r for r in out.collect()}

    def test_pairs_present(self, rows):
        assert set(rows) == {("x", "y"), ("x", "z")}

    def test_counts_and_metrics(self, rows):
        r = rows[("x", "y")]
        assert (r["n_both"], r["n_a"], r["n_b"], r["n_entities"]) == (2, 3, 3, 5)
        assert r["conf_a_to_b"] == pytest.approx(round(2 / 3, 6))
        assert r["conf_b_to_a"] == pytest.approx(round(2 / 3, 6))
        assert r["lift"] == pytest.approx(round(2 * 5 / (3 * 3), 6))

    def test_lift_exact_replay(self, spark):
        from okay_spark.relops import cooccurrence_lift

        # evens have 'a' (50), multiples of 5 have 'b' (20); the entity
        # universe is users with ANY item: 50 + 10 odd-multiples-of-5 = 60.
        # n_both = multiples of 10 = 10 -> lift = 10*60/(50*20) = 0.6
        data = []
        for u in range(100):
            if u % 2 == 0:
                data.append((u, "a"))
            if u % 5 == 0:
                data.append((u, "b"))
        df = spark.createDataFrame(data, "user_id long, event_type string")
        r = cooccurrence_lift(df).first()
        assert (r["n_both"], r["n_a"], r["n_b"], r["n_entities"]) == (10, 50, 20, 60)
        assert r["lift"] == pytest.approx(0.6)


class TestEmbeddingDimStats:
    def test_known_stats(self, spark):
        from okay_spark.embedops import embedding_dim_stats

        rows = [
            (1, [1.0, 0.0, 2.0]),
            (2, [3.0, 0.0, 2.0]),
            (3, [5.0, 4.0, 2.0]),
            (4, [7.0, 0.0, 2.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r["pos"]: r for r in embedding_dim_stats(df).collect()}
        # dim 0: mean 4, var E[x^2]-16 = (1+9+25+49)/4 - 16 = 5
        assert out[0]["mean"] == 4.0 and out[0]["var"] == 5.0
        assert (out[0]["vmin"], out[0]["vmax"]) == (1.0, 7.0)
        assert out[0]["frac_zero"] == 0.0
        # dim 1: sparse (3/4 zeros)
        assert out[1]["frac_zero"] == 0.75
        assert out[1]["mean"] == 1.0 and out[1]["var"] == 3.0
        # dim 2: dead dimension — constant
        assert out[2]["var"] == 0.0 and out[2]["vmin"] == out[2]["vmax"] == 2.0

    def test_partition_invariance(self, spark):
        from okay_spark.embedops import embedding_dim_stats

        rows = [(i, [float(i % 7) / 3.0, float(i % 3) - 1.5]) for i in range(200)]
        df1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        df2 = spark.createDataFrame(rows[::-1], "vec_id long, embedding array<float>").repartition(7)
        a = {tuple(r) for r in embedding_dim_stats(df1).collect()}
        b = {tuple(r) for r in embedding_dim_stats(df2).collect()}
        assert a == b


class TestBenchmarkCoverage:
    def test_known_coverage(self, spark):
        from okay_spark.textops import benchmark_coverage

        corpus = spark.createDataFrame(
            [(1, "a b c d"), (2, "x y z")],  # grams: {abc, bcd, xyz}
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            # bench grams: {abc, pqr, qrs} -> covered: abc only
            [(10, "a b c"), (11, "p q r s")],
            "doc_id long, text string",
        )
        r = benchmark_coverage(corpus, bench).first()
        assert (r["n_bench_grams"], r["n_covered"]) == (3, 1)
        assert r["coverage"] == pytest.approx(round(1 / 3, 6))

    def test_full_and_zero_coverage(self, spark):
        from okay_spark.textops import benchmark_coverage

        corpus = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        full = benchmark_coverage(corpus, corpus).first()
        assert full["coverage"] == 1.0
        disjoint = spark.createDataFrame([(2, "p q r")], "doc_id long, text string")
        z = benchmark_coverage(corpus, disjoint).first()
        assert z["n_covered"] == 0 and z["coverage"] == 0.0

    def test_empty_benchmark_null_coverage(self, spark):
        from okay_spark.textops import benchmark_coverage

        corpus = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        empty = spark.createDataFrame([], "doc_id long, text string")
        r = benchmark_coverage(corpus, empty).first()
        assert r["n_bench_grams"] == 0 and r["coverage"] is None
