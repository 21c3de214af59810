"""Round-5 continuation: ranking/agreement/inequality profile operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestRocAuc:
    def test_perfect_ranking(self, spark):
        from okay_spark.checks import roc_auc

        df = spark.createDataFrame(
            [(0.1, False), (0.2, False), (0.7, True), (0.9, True)],
            "s double, y boolean",
        )
        r = roc_auc(df, F.col("s"), F.col("y")).collect()[0]
        assert (r["n"], r["n_pos"], r["n_neg"]) == (4, 2, 2)
        assert r["auc"] == 1.0

    def test_one_inversion(self, spark):
        from okay_spark.checks import roc_auc

        # positives at ranks 2 and 4 of 4: AUC = (R - npos(npos+1)/2)/(np*nn)
        df = spark.createDataFrame(
            [(0.1, False), (0.35, True), (0.4, False), (0.8, True)],
            "s double, y boolean",
        )
        assert roc_auc(df, F.col("s"), F.col("y")).collect()[0]["auc"] == 0.75

    def test_tie_gets_half_credit(self, spark):
        from okay_spark.checks import roc_auc

        # pos at 1 ties neg at 1; pos at 2 beats it: (0.5 + 1)/2 = 0.75
        df = spark.createDataFrame(
            [(1.0, True), (1.0, False), (2.0, True)], "s double, y boolean"
        )
        assert roc_auc(df, F.col("s"), F.col("y")).collect()[0]["auc"] == 0.75

    def test_single_class_is_null(self, spark):
        from okay_spark.checks import roc_auc

        df = spark.createDataFrame([(1.0, True), (2.0, True)], "s double, y boolean")
        r = roc_auc(df, F.col("s"), F.col("y")).collect()[0]
        assert r["auc"] is None and r["n_neg"] == 0

    def test_null_score_excluded_null_label_false(self, spark):
        from okay_spark.checks import roc_auc

        df = spark.createDataFrame(
            [(None, True), (1.0, None), (2.0, True)], "s double, y boolean"
        )
        r = roc_auc(df, F.col("s"), F.col("y")).collect()[0]
        # null score dropped -> n=2; null label counts as negative
        assert (r["n"], r["n_pos"], r["n_neg"], r["auc"]) == (2, 1, 1, 1.0)

    def test_partition_invariance(self, spark):
        from okay_spark.checks import roc_auc

        rows = [(float(i % 7), i % 3 == 0) for i in range(200)]
        df1 = spark.createDataFrame(rows, "s double, y boolean")
        df2 = spark.createDataFrame(rows[::-1], "s double, y boolean").repartition(7)
        a = roc_auc(df1, F.col("s"), F.col("y")).collect()[0]
        b = roc_auc(df2, F.col("s"), F.col("y")).collect()[0]
        assert tuple(a) == tuple(b)


class TestCohensKappa:
    def test_textbook_2x2(self, spark):
        from okay_spark.checks import cohens_kappa

        rows = (
            [("x", "x")] * 20 + [("x", "y")] * 5 + [("y", "x")] * 10 + [("y", "y")] * 15
        )
        df = spark.createDataFrame(rows, "p string, l string")
        r = cohens_kappa(df, F.col("p"), F.col("l")).collect()[0]
        assert (r["n"], r["n_agree"]) == (50, 35)
        assert (r["po"], r["pe"], r["kappa"]) == (0.7, 0.5, 0.4)

    def test_degenerate_constant_is_null(self, spark):
        from okay_spark.checks import cohens_kappa

        df = spark.createDataFrame([("a", "a")] * 3, "p string, l string")
        assert cohens_kappa(df, F.col("p"), F.col("l")).collect()[0]["kappa"] is None

    def test_nulls_become_a_class(self, spark):
        from okay_spark.checks import cohens_kappa

        df = spark.createDataFrame(
            [("a", None), (None, None), ("a", "a")], "p string, l string"
        )
        r = cohens_kappa(df, F.col("p"), F.col("l")).collect()[0]
        # (null)==(null) agrees; a vs (null) does not
        assert (r["n"], r["n_agree"]) == (3, 2)

    def test_chance_only_agreement_is_zeroish(self, spark):
        from okay_spark.checks import cohens_kappa

        # independent marginals: kappa == 0 exactly when po == pe
        rows = [("x", "x")] * 9 + [("x", "y")] * 9 + [("y", "x")] * 9 + [("y", "y")] * 9
        df = spark.createDataFrame(rows, "p string, l string")
        assert cohens_kappa(df, F.col("p"), F.col("l")).collect()[0]["kappa"] == 0.0


class TestCalibrationBins:
    def test_bins_and_brier(self, spark):
        from okay_spark.checks import calibration_bins

        df = spark.createDataFrame(
            [(0.05, False), (0.15, True), (0.95, True), (1.0, True), (0.12, False), (None, True)],
            "p double, y boolean",
        )
        rows = {r["bin"]: r for r in calibration_bins(df, F.col("p"), F.col("y")).collect()}
        # p=1.0 clamps into bin 9; NULL p excluded
        assert set(rows) == {0, 1, 9}
        assert rows[9]["n"] == 2 and rows[9]["frac_pos"] == 1.0
        assert rows[0]["brier"] == pytest.approx(0.0025)
        b1 = rows[1]
        # bin 1: p in {0.15 (pos), 0.12 (neg)} -> mean_p .135, frac_pos .5
        assert (b1["n"], b1["mean_p"], b1["frac_pos"]) == (2, 0.135, 0.5)
        assert b1["brier"] == pytest.approx(((0.15 - 1) ** 2 + 0.12**2) / 2, abs=1e-5)

    def test_out_of_range_clamped(self, spark):
        from okay_spark.checks import calibration_bins

        df = spark.createDataFrame([(-0.2, False), (1.7, True)], "p double, y boolean")
        bins = sorted(r["bin"] for r in calibration_bins(df, F.col("p"), F.col("y")).collect())
        assert bins == [0, 9]

    def test_null_label_counts_false(self, spark):
        from okay_spark.checks import calibration_bins

        df = spark.createDataFrame([(0.55, None)], "p double, y boolean")
        r = calibration_bins(df, F.col("p"), F.col("y")).collect()[0]
        assert (r["bin"], r["frac_pos"]) == (5, 0.0)
        assert r["brier"] == pytest.approx(0.3025)


class TestSpearmanCorr:
    def test_monotonic_nonlinear_is_one(self, spark):
        from okay_spark.checks import spearman_corr

        df = spark.createDataFrame(
            [(float(i), float(i * i)) for i in range(1, 8)], "x double, y double"
        )
        assert spearman_corr(df, F.col("x"), F.col("y")).collect()[0]["rho"] == 1.0

    def test_anti_monotonic_is_minus_one(self, spark):
        from okay_spark.checks import spearman_corr

        df = spark.createDataFrame(
            [(float(i), float(-i)) for i in range(5)], "x double, y double"
        )
        assert spearman_corr(df, F.col("x"), F.col("y")).collect()[0]["rho"] == -1.0

    def test_ties_average_rank(self, spark):
        from okay_spark.checks import spearman_corr

        # scipy.stats.spearmanr([1,1,2],[1,2,3]) = 0.8660254
        df = spark.createDataFrame(
            [(1.0, 1.0), (1.0, 2.0), (2.0, 3.0)], "x double, y double"
        )
        assert spearman_corr(df, F.col("x"), F.col("y")).collect()[0]["rho"] == 0.866025

    def test_constant_side_is_null(self, spark):
        from okay_spark.checks import spearman_corr

        df = spark.createDataFrame([(1.0, 2.0), (1.0, 3.0)], "x double, y double")
        assert spearman_corr(df, F.col("x"), F.col("y")).collect()[0]["rho"] is None

    def test_partition_invariance(self, spark):
        from okay_spark.checks import spearman_corr

        rows = [(float(i % 13), float((i * 7) % 11)) for i in range(300)]
        df1 = spark.createDataFrame(rows, "x double, y double")
        df2 = spark.createDataFrame(rows[::-1], "x double, y double").repartition(5)
        a = spearman_corr(df1, F.col("x"), F.col("y")).collect()[0]
        b = spearman_corr(df2, F.col("x"), F.col("y")).collect()[0]
        assert tuple(a) == tuple(b)


class TestCoverageGaps:
    def test_gap_bounds_and_days(self, spark):
        import datetime as dt

        from okay_spark.relops import coverage_gaps

        rows = [
            (1, dt.datetime(2024, 1, 1)),
            (1, dt.datetime(2024, 1, 2)),
            (1, dt.datetime(2024, 1, 5)),
            # same day twice must not create a zero gap
            (1, dt.datetime(2024, 1, 5, 12)),
            (2, dt.datetime(2024, 1, 1)),
            (2, dt.datetime(2024, 1, 2)),
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        out = coverage_gaps(df, "ts", "user_id").collect()
        assert len(out) == 1
        r = out[0]
        assert (str(r["gap_start"]), str(r["gap_end"]), r["gap_days"]) == (
            "2024-01-03",
            "2024-01-04",
            2,
        )

    def test_min_gap_days_threshold(self, spark):
        import datetime as dt

        from okay_spark.relops import coverage_gaps

        rows = [(1, dt.datetime(2024, 1, 1)), (1, dt.datetime(2024, 1, 3))]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        assert coverage_gaps(df, "ts", "user_id", min_gap_days=3).count() == 0
        assert coverage_gaps(df, "ts", "user_id", min_gap_days=2).count() == 1


class TestNgramDiversity:
    def test_counts_and_ratios(self, spark):
        from okay_spark.textops import ngram_diversity

        docs = spark.createDataFrame(
            [("a", "x y x y"), ("a", "x y"), ("b", None), ("b", "q"), (None, "z z")],
            "source string, text string",
        )
        rows = {r["grp"]: r for r in ngram_diversity(docs).collect()}
        assert set(rows) == {"a", "b"}  # NULL group dropped
        a = rows["a"]
        # tokens: 4 + 2 = 6 total, {x, y} distinct; bigrams 3 + 1 = 4
        # total, {"x y", "y x"} distinct
        assert (a["total_1"], a["distinct_1"], a["dist_1"]) == (6, 2, 0.333333)
        assert (a["total_2"], a["distinct_2"], a["dist_2"]) == (4, 2, 0.5)
        b = rows["b"]
        # NULL text counts as an empty token list but the doc still counts
        assert (b["n_docs"], b["total_1"], b["distinct_1"]) == (2, 1, 1)
        assert b["total_2"] == 0 and b["dist_2"] is None

    def test_partition_invariance(self, spark):
        from okay_spark.textops import ngram_diversity

        rows = [("s%d" % (i % 3), "tok%d tok%d tok%d" % (i % 5, i % 7, i % 2)) for i in range(60)]
        df1 = spark.createDataFrame(rows, "source string, text string")
        df2 = spark.createDataFrame(rows[::-1], "source string, text string").repartition(7)
        a = {tuple(r) for r in ngram_diversity(df1).collect()}
        b = {tuple(r) for r in ngram_diversity(df2).collect()}
        assert a == b and len(a) == 3


class TestGiniInequality:
    def test_equal_distribution_is_zero(self, spark):
        from okay_spark.checks import gini_inequality

        df = spark.createDataFrame([("a", 5)] * 4, "g string, v bigint")
        assert gini_inequality(df, "g", "v").collect()[0]["gini"] == 0.0

    def test_single_holder(self, spark):
        from okay_spark.checks import gini_inequality

        # one holder of everything among n=4 -> G = (n-1)/n = 0.75
        df = spark.createDataFrame(
            [("b", 0), ("b", 0), ("b", 0), ("b", 12)], "g string, v bigint"
        )
        r = gini_inequality(df, "g", "v").collect()[0]
        assert (r["n"], r["total"], r["gini"]) == (4, 12, 0.75)

    def test_zero_total_is_null(self, spark):
        from okay_spark.checks import gini_inequality

        df = spark.createDataFrame([("c", 0)], "g string, v bigint")
        assert gini_inequality(df, "g", "v").collect()[0]["gini"] is None

    def test_known_value_and_partition_invariance(self, spark):
        from okay_spark.checks import gini_inequality

        # x = [1,2,3,4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40 = 0.25
        rows = [("g", i) for i in (1, 2, 3, 4)]
        df1 = spark.createDataFrame(rows, "g string, v bigint")
        df2 = spark.createDataFrame(rows[::-1], "g string, v bigint").repartition(3)
        a = gini_inequality(df1, "g", "v").collect()[0]
        b = gini_inequality(df2, "g", "v").collect()[0]
        assert a["gini"] == 0.25 and tuple(a) == tuple(b)


class TestReadabilityStats:
    def test_counts_and_formula(self, spark):
        from okay_spark.textops import readability_stats

        docs = spark.createDataFrame(
            [("s1", "The cat sat. It sat there!"), ("s1", "a b c")],
            "source string, text string",
        )
        r = readability_stats(docs).collect()[0]
        # doc1: w=6 s=2 syl=7; doc2: w=3 s=1 syl=1
        assert r["n_scored"] == 2
        assert r["mean_wps"] == 3.0
        assert r["mean_spw"] == pytest.approx((7 / 6 + 1 / 3) / 2, abs=1e-6)
        f1 = 206.835 - 1.015 * 3 - 84.6 * (7 / 6)
        f2 = 206.835 - 1.015 * 3 - 84.6 * (1 / 3)
        assert r["mean_flesch"] == pytest.approx((f1 + f2) / 2, abs=1e-5)
        assert r["frac_difficult"] == 0.0

    def test_empty_and_null_text_excluded(self, spark):
        from okay_spark.textops import readability_stats

        docs = spark.createDataFrame(
            [("s2", "   "), ("s2", None)], "source string, text string"
        )
        assert readability_stats(docs).count() == 0

    def test_dense_prose_flags_difficult(self, spark):
        from okay_spark.textops import readability_stats

        # one run-on 40-word sentence of polysyllabic tokens -> deeply
        # negative Flesch -> frac_difficult = 1
        text = " ".join(["incomprehensibility"] * 40)
        docs = spark.createDataFrame([("s3", text)], "source string, text string")
        r = readability_stats(docs).collect()[0]
        assert r["frac_difficult"] == 1.0 and r["mean_flesch"] < 30


class TestEmbeddingOutliers:
    @pytest.fixture(scope="class")
    def out(self, spark):
        from okay_spark.embedops import embedding_outliers

        rows = (
            [(i, [1.0, 0.0], 0) for i in range(10)]
            + [(10, [1.2, 0.1], 0), (11, [9.0, 9.0], 0)]
            + [(20, [0.0, 1.0], 1), (21, [0.0, 1.0], 1)]
        )
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
        return {r["vec_id"]: r for r in embedding_outliers(df, z_threshold=2.0).collect()}

    def test_planted_outlier_flagged(self, out):
        assert out[11]["outlier"] is True and out[11]["z"] > 3

    def test_inliers_not_flagged(self, out):
        assert all(not out[i]["outlier"] for i in range(11))

    def test_zero_variance_label_null_z_never_flags(self, out):
        assert out[20]["z"] is None and out[20]["outlier"] is False
        assert out[20]["dist"] == 0.0

    def test_every_vector_scored(self, out):
        assert len(out) == 14


class TestAutocorrelationDaily:
    def test_alternating_series(self, spark):
        import datetime as dt

        from okay_spark.checks import autocorrelation_daily

        rows = []
        for i in range(10):
            day = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
            rows += [("a", day)] * (1 if i % 2 == 0 else 3)
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        out = {r["lag"]: r for r in autocorrelation_daily(df, lags=(1, 2)).collect()}
        assert out[1]["acf"] == -1.0 and out[1]["n_pairs"] == 9
        assert out[2]["acf"] == 1.0 and out[2]["n_pairs"] == 8

    def test_constant_series_is_null(self, spark):
        import datetime as dt

        from okay_spark.checks import autocorrelation_daily

        rows = [("a", dt.datetime(2024, 1, 1) + dt.timedelta(days=i)) for i in range(5)]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        out = autocorrelation_daily(df, lags=(1,)).collect()
        assert out[0]["acf"] is None  # zero variance on both sides

    def test_missing_days_pair_with_nothing(self, spark):
        import datetime as dt

        from okay_spark.checks import autocorrelation_daily

        # days 1, 2, 5: only (1,2) is a lag-1 pair
        rows = [
            ("a", dt.datetime(2024, 1, 1)),
            ("a", dt.datetime(2024, 1, 2)),
            ("a", dt.datetime(2024, 1, 5)),
        ]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        out = autocorrelation_daily(df, lags=(1,)).collect()
        assert out[0]["n_pairs"] == 1 and out[0]["acf"] is None


class TestBurstiness:
    def test_metronome_is_minus_one(self, spark):
        import datetime as dt

        from okay_spark.relops import burstiness

        rows = [
            (1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=10 * i))
            for i in range(5)
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        r = burstiness(df).collect()[0]
        assert (r["n_gaps"], r["mean_gap_us"], r["burstiness"]) == (4, 1e7, -1.0)

    def test_bursty_positive(self, spark):
        import datetime as dt

        from okay_spark.relops import burstiness

        rows = [(2, dt.datetime(2024, 1, 1))] * 4 + [(2, dt.datetime(2024, 1, 1, 10))]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        r = burstiness(df).collect()[0]
        # gaps [0,0,0,3.6e10us]: mu=9e9 sigma=sqrt(2.43e20) -> B=0.267949
        assert r["burstiness"] == 0.267949

    def test_single_event_group_omitted_single_gap_null(self, spark):
        import datetime as dt

        from okay_spark.relops import burstiness

        rows = [
            (1, dt.datetime(2024, 1, 1)),
            (2, dt.datetime(2024, 1, 1)),
            (2, dt.datetime(2024, 1, 2)),
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        out = {r["grp"]: r for r in burstiness(df).collect()}
        assert set(out) == {2}  # user 1 has no gaps
        assert out[2]["n_gaps"] == 1 and out[2]["burstiness"] is None

    def test_tie_order_invariance(self, spark):
        import datetime as dt

        from okay_spark.relops import burstiness

        # duplicate timestamps: the gap multiset is order-invariant
        rows = [
            (1, dt.datetime(2024, 1, 1)),
            (1, dt.datetime(2024, 1, 1)),
            (1, dt.datetime(2024, 1, 1, 1)),
        ]
        df1 = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        df2 = spark.createDataFrame(rows[::-1], "user_id bigint, ts timestamp").repartition(3)
        a = burstiness(df1).collect()[0]
        b = burstiness(df2).collect()[0]
        assert tuple(a) == tuple(b)


class TestWassersteinExact:
    def test_unit_shift(self, spark):
        from okay_spark.checks import wasserstein_exact

        df = spark.createDataFrame(
            [("a", 0.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
        )
        r = wasserstein_exact(df, "v", "g", "a", "b").collect()[0]
        assert (r["n_a"], r["n_b"], r["w1"]) == (2, 2, 1.0)

    def test_identical_is_zero(self, spark):
        from okay_spark.checks import wasserstein_exact

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
        )
        assert wasserstein_exact(df, "v", "g", "a", "b").collect()[0]["w1"] == 0.0

    def test_scipy_value(self, spark):
        from okay_spark.checks import wasserstein_exact

        # scipy.stats.wasserstein_distance([0,0,3],[1,2,2]) = 4/3
        df = spark.createDataFrame(
            [("a", 0.0), ("a", 0.0), ("a", 3.0), ("b", 1.0), ("b", 2.0), ("b", 2.0)],
            "g string, v double",
        )
        assert wasserstein_exact(df, "v", "g", "a", "b").collect()[0]["w1"] == 1.333333

    def test_empty_side_is_null(self, spark):
        from okay_spark.checks import wasserstein_exact

        df = spark.createDataFrame([("a", 1.0)], "g string, v double")
        r = wasserstein_exact(df, "v", "g", "a", "b").collect()[0]
        assert r["w1"] is None and r["n_b"] == 0

    def test_partition_invariance(self, spark):
        from okay_spark.checks import wasserstein_exact

        rows = [("a" if i % 2 else "b", float(i % 9)) for i in range(200)]
        df1 = spark.createDataFrame(rows, "g string, v double")
        df2 = spark.createDataFrame(rows[::-1], "g string, v double").repartition(7)
        a = wasserstein_exact(df1, "v", "g", "a", "b").collect()[0]
        b = wasserstein_exact(df2, "v", "g", "a", "b").collect()[0]
        assert tuple(a) == tuple(b)


class TestProportionZtest:
    def test_statsmodels_value(self, spark):
        from okay_spark.checks import proportion_ztest

        rows = (
            [("a", True)] * 30 + [("a", False)] * 70
            + [("b", True)] * 20 + [("b", False)] * 80
        )
        df = spark.createDataFrame(rows, "g string, s boolean")
        r = proportion_ztest(df, "g", "a", "b", F.col("s")).collect()[0]
        assert (r["n_a"], r["n_b"], r["k_a"], r["k_b"]) == (100, 100, 30, 20)
        # statsmodels proportions_ztest([30, 20], [100, 100]) = 1.6330
        assert r["z"] == 1.632993

    def test_degenerate_pooled_rate_is_null(self, spark):
        from okay_spark.checks import proportion_ztest

        df = spark.createDataFrame(
            [("a", False), ("b", False)], "g string, s boolean"
        )
        assert proportion_ztest(df, "g", "a", "b", F.col("s")).collect()[0]["z"] is None

    def test_null_success_counts_false(self, spark):
        from okay_spark.checks import proportion_ztest

        df = spark.createDataFrame(
            [("a", True), ("a", None), ("b", True), ("b", True)], "g string, s boolean"
        )
        r = proportion_ztest(df, "g", "a", "b", F.col("s")).collect()[0]
        assert (r["k_a"], r["k_b"], r["p_a"], r["p_b"]) == (1, 2, 0.5, 1.0)


class TestKendallTauB:
    def test_perfect_and_anti(self, spark):
        from okay_spark.checks import kendall_tau_b

        d2 = spark.createDataFrame([(1, 1), (2, 2), (3, 3), (4, 4)], "x int, y int")
        assert kendall_tau_b(d2, F.col("x"), F.col("y")).collect()[0]["tau_b"] == 1.0
        d4 = spark.createDataFrame([(1, 4), (2, 3), (3, 2), (4, 1)], "x int, y int")
        r = kendall_tau_b(d4, F.col("x"), F.col("y")).collect()[0]
        assert (r["concordant"], r["discordant"], r["tau_b"]) == (0, 6, -1.0)

    def test_tie_correction(self, spark):
        from okay_spark.checks import kendall_tau_b

        # pairs: C=4, D=0, tx=1, ty=1, n0=6 -> tau_b = 4/sqrt(5*5) = 0.8
        d3 = spark.createDataFrame([(1, 1), (1, 2), (2, 2), (3, 3)], "x int, y int")
        r = kendall_tau_b(d3, F.col("x"), F.col("y")).collect()[0]
        assert (r["concordant"], r["discordant"], r["tau_b"]) == (4, 0, 0.8)

    def test_constant_axis_is_null(self, spark):
        from okay_spark.checks import kendall_tau_b

        d5 = spark.createDataFrame([(1, 1), (1, 2)], "x int, y int")
        assert kendall_tau_b(d5, F.col("x"), F.col("y")).collect()[0]["tau_b"] is None

    def test_partition_invariance(self, spark):
        from okay_spark.checks import kendall_tau_b

        rows = [((i * 3) % 7, (i * 5) % 9) for i in range(200)]
        df1 = spark.createDataFrame(rows, "x int, y int")
        df2 = spark.createDataFrame(rows[::-1], "x int, y int").repartition(5)
        a = kendall_tau_b(df1, F.col("x"), F.col("y")).collect()[0]
        b = kendall_tau_b(df2, F.col("x"), F.col("y")).collect()[0]
        assert tuple(a) == tuple(b)


class TestKmSurvival:
    @pytest.fixture(scope="class")
    def out(self, spark):
        import datetime as dt

        from okay_spark.relops import km_survival

        D = dt.datetime
        rows = [
            (1, "click", D(2024, 1, 1)), (1, "purchase", D(2024, 1, 2)),
            (2, "click", D(2024, 1, 1)), (2, "purchase", D(2024, 1, 4)),
            (3, "click", D(2024, 1, 1)),                       # censored
            (4, "click", D(2024, 1, 3)), (4, "purchase", D(2024, 1, 3)),  # equal ts
            (9, "view", D(2024, 1, 6)),                        # sets obs end
        ]
        df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
        return {r["t_days"]: r for r in km_survival(df).collect()}

    def test_km_products(self, out):
        # t=1: 4 at risk, 1 event -> S=0.75; t=3: 3 at risk, 1 event -> 0.5
        assert set(out) == {1, 3}
        assert (out[1]["n_risk"], out[1]["n_event"], out[1]["survival"]) == (4, 1, 0.75)
        assert (out[3]["n_risk"], out[3]["n_event"], out[3]["survival"]) == (3, 1, 0.5)

    def test_equal_timestamp_never_converts(self, out):
        # user 4's purchase at the same instant is censoring, not an event:
        # only two event rows exist
        assert sum(r["n_event"] for r in out.values()) == 2

    def test_partition_invariance(self, spark):
        import datetime as dt

        from okay_spark.relops import km_survival

        D = dt.datetime
        rows = [
            (u, t, D(2024, 1, 1 + (u * 3 + i) % 9))
            for u in range(12)
            for i, t in enumerate(["click", "view", "purchase"])
        ]
        df1 = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
        df2 = spark.createDataFrame(rows[::-1], "user_id bigint, event_type string, ts timestamp").repartition(5)
        a = {tuple(r) for r in km_survival(df1).collect()}
        b = {tuple(r) for r in km_survival(df2).collect()}
        assert a == b and len(a) > 0


class TestEffectiveSampleSize:
    def test_uniform_weights_ess_equals_n(self, spark):
        from okay_spark.balance import effective_sample_size

        df = spark.createDataFrame([("a", 2.0)] * 8, "g string, w double")
        r = effective_sample_size(df, "w", "g").collect()[0]
        assert (r["n"], r["ess"], r["ess_ratio"]) == (8, 8.0, 1.0)

    def test_concentrated_weights_collapse(self, spark):
        from okay_spark.balance import effective_sample_size

        # one heavy weight among zeros -> ESS = 1
        rows = [("a", 5.0)] + [("a", 0.0)] * 9
        df = spark.createDataFrame(rows, "g string, w double")
        r = effective_sample_size(df, "w", "g").collect()[0]
        assert (r["n"], r["ess"], r["ess_ratio"]) == (10, 1.0, 0.1)

    def test_all_zero_is_null_and_negative_excluded(self, spark):
        from okay_spark.balance import effective_sample_size

        df = spark.createDataFrame(
            [("a", 0.0), ("a", 0.0), ("a", -1.0), ("a", None)], "g string, w double"
        )
        r = effective_sample_size(df, "w", "g").collect()[0]
        assert r["n"] == 2 and r["ess"] is None

    def test_global_group(self, spark):
        from okay_spark.balance import effective_sample_size

        df = spark.createDataFrame([("x", 1.0), ("y", 3.0)], "g string, w double")
        r = effective_sample_size(df, "w").collect()[0]
        # ESS = (4)^2 / 10 = 1.6
        assert (r["grp"], r["ess"], r["ess_ratio"]) == ("(all)", 1.6, 0.8)


class TestWilsonInterval:
    def test_statsmodels_values(self, spark):
        from okay_spark.checks import wilson_interval

        rows = [("a", True)] * 30 + [("a", False)] * 70
        df = spark.createDataFrame(rows, "g string, s boolean")
        r = wilson_interval(df, "g", F.col("s")).collect()[0]
        # statsmodels proportion_confint(30, 100, method='wilson')
        assert (r["n"], r["k"], r["p"]) == (100, 30, 0.3)
        assert (r["lo"], r["hi"]) == (0.218949, 0.395849)

    def test_extreme_rate_not_degenerate(self, spark):
        from okay_spark.checks import wilson_interval

        # p = 1 with n = 5: Wald collapses to [1, 1]; Wilson does not
        df = spark.createDataFrame([("b", True)] * 5, "g string, s boolean")
        r = wilson_interval(df, "g", F.col("s")).collect()[0]
        assert r["p"] == 1.0 and 0.5 < r["lo"] < 1.0 and r["hi"] == 1.0

    def test_null_success_counts_false(self, spark):
        from okay_spark.checks import wilson_interval

        df = spark.createDataFrame([("a", True), ("a", None)], "g string, s boolean")
        r = wilson_interval(df, "g", F.col("s")).collect()[0]
        assert (r["n"], r["k"]) == (2, 1)


class TestAnnRecall:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        import math

        rows = []
        for i in range(60):
            ang = (i % 12) / 12.0 * 2 * math.pi
            rows.append((i, [math.cos(ang) + (i % 7) * 0.01, math.sin(ang), 0.1 * (i % 3)]))
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    def test_full_probe_is_exact(self, spark, emb):
        from okay_spark.similarity import ann_recall

        q = [1.0, 0.0, 0.0]
        r = ann_recall(emb, q, k=5, n_lists=4, n_probe=4, iters=1).collect()[0]
        assert (r["k"], r["n_hits"], r["recall"]) == (5, 5, 1.0)

    def test_recall_monotone_in_probes(self, spark, emb):
        from okay_spark.similarity import ann_recall

        q = [0.0, 1.0, 0.0]
        r1 = ann_recall(emb, q, k=5, n_lists=8, n_probe=1, iters=1).collect()[0]
        r4 = ann_recall(emb, q, k=5, n_lists=8, n_probe=4, iters=1).collect()[0]
        # an exact-top-k member in the candidate set always survives the
        # re-rank, so hits grow with nested probes
        assert 0 <= r1["n_hits"] <= r4["n_hits"] <= 5


class TestWelchTtest:
    def test_known_values(self, spark):
        from okay_spark.checks import welch_ttest

        rows = [("a", float(x)) for x in (1, 2, 3, 4, 5)] + [
            ("b", float(x)) for x in (2, 4, 6, 8, 10)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r = welch_ttest(df, "g", "a", "b", F.col("v")).collect()[0]
        # var_a=2.5 var_b=10: t = -3/sqrt(0.5+2) = -1.897367, WS df = 5.882353
        assert (r["n_a"], r["n_b"], r["mean_a"], r["mean_b"]) == (5, 5, 3.0, 6.0)
        assert (r["t"], r["df"]) == (-1.897367, 5.882353)

    def test_small_group_is_null(self, spark):
        from okay_spark.checks import welch_ttest

        df = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
        )
        r = welch_ttest(df, "g", "a", "b", F.col("v")).collect()[0]
        assert r["t"] is None and r["df"] is None and r["mean_a"] == 1.0

    def test_zero_variance_both_is_null(self, spark):
        from okay_spark.checks import welch_ttest

        df = spark.createDataFrame(
            [("a", 2.0)] * 3 + [("b", 5.0)] * 3, "g string, v double"
        )
        assert welch_ttest(df, "g", "a", "b", F.col("v")).collect()[0]["t"] is None


class TestJarqueBera:
    def test_hand_computed_moments(self, spark):
        from okay_spark.checks import jarque_bera

        xs = [1.0, 2.0, 3.0, 4.0, 100.0]
        df = spark.createDataFrame([("a", v) for v in xs], "g string, v double")
        r = jarque_bera(df, F.col("v"), "g").collect()[0]
        n = len(xs)
        m = sum(xs) / n
        m2 = sum((a - m) ** 2 for a in xs) / n
        m3 = sum((a - m) ** 3 for a in xs) / n
        m4 = sum((a - m) ** 4 for a in xs) / n
        S = m3 / m2**1.5
        K = m4 / m2**2 - 3
        assert r["skewness"] == pytest.approx(S, abs=1e-6)
        assert r["kurtosis_excess"] == pytest.approx(K, abs=1e-6)
        assert r["jb"] == pytest.approx(n / 6 * (S * S + K * K / 4), abs=1e-5)

    def test_constant_and_null_group(self, spark):
        from okay_spark.checks import jarque_bera

        df = spark.createDataFrame(
            [("b", 5.0)] * 4 + [(None, 1.0)], "g string, v double"
        )
        rows = jarque_bera(df, F.col("v"), "g").collect()
        assert len(rows) == 1  # NULL group dropped
        assert rows[0]["jb"] is None  # zero variance


class TestCusumAnomalies:
    def test_persistent_shift_flags(self, spark):
        import datetime as dt

        from okay_spark.checks import cusum_anomalies

        rows = []
        for i in range(18):
            day = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
            rows += [("a", day)] * (10 if i < 10 else 13)
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        out = sorted(cusum_anomalies(df).collect(), key=lambda r: str(r["day"]))
        # the +3 shift accumulates; the last days cross h*sigma
        assert out[-1]["flagged"] and out[-2]["flagged"]
        assert not any(r["flagged"] for r in out[:10])
        # recurrence is monotone after the shift under a constant excess
        assert out[-1]["cusum_pos"] > out[-2]["cusum_pos"] > 0

    def test_stable_series_never_flags(self, spark):
        import datetime as dt

        from okay_spark.checks import cusum_anomalies

        rows = []
        for i in range(12):
            rows += [("a", dt.datetime(2024, 1, 1) + dt.timedelta(days=i))] * 5
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        out = cusum_anomalies(df).collect()
        assert all(not r["flagged"] for r in out)
        assert all(r["cusum_pos"] == 0.0 and r["cusum_neg"] == 0.0 for r in out)

    def test_single_day_group_unflagged(self, spark):
        import datetime as dt

        from okay_spark.checks import cusum_anomalies

        df = spark.createDataFrame(
            [("a", dt.datetime(2024, 1, 1))] * 3, "event_type string, ts timestamp"
        )
        r = cusum_anomalies(df).collect()[0]
        assert not r["flagged"]


class TestTheilSenSlope:
    def test_outlier_immune_unit_slope(self, spark):
        import datetime as dt

        from okay_spark.checks import theil_sen_slope

        rows = []
        for i in range(8):
            day = dt.datetime(2024, 2, 1) + dt.timedelta(days=i)
            rows += [("b", day)] * ((i + 1) if i != 4 else 50)
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        r = theil_sen_slope(df).collect()[0]
        assert (r["n_days"], r["n_pairs"], r["slope"]) == (8, 28, 1.0)

    def test_single_day_is_null(self, spark):
        import datetime as dt

        from okay_spark.checks import theil_sen_slope

        df = spark.createDataFrame(
            [("c", dt.datetime(2024, 1, 1))] * 2, "event_type string, ts timestamp"
        )
        r = theil_sen_slope(df).collect()[0]
        assert r["n_days"] == 1 and r["n_pairs"] == 0 and r["slope"] is None

    def test_missing_days_use_true_gap(self, spark):
        import datetime as dt

        from okay_spark.checks import theil_sen_slope

        # counts 2 then 6, four days apart: slope = 1/day
        rows = [("d", dt.datetime(2024, 1, 1))] * 2 + [
            ("d", dt.datetime(2024, 1, 5))
        ] * 6
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        assert theil_sen_slope(df).collect()[0]["slope"] == 1.0


class TestOrcPathIO:
    def test_orc_roundtrip_and_pruned_scan(self, spark, tmp_path):
        from okay_spark.io import read_path, write_path

        src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = str(tmp_path / "docs_orc")
        write_path(src, p, format="orc", partition_by=["lang"])
        back = read_path(spark, p, format="orc")
        assert back.count() == src.count()
        assert set(back.columns) == set(src.columns)
        # column pruning reaches the ORC scan like the parquet path
        plan = back.select("doc_id").filter(back["doc_id"] > 10)._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema: struct<doc_id:bigint>" in plan

    def test_csv_json_roundtrip(self, spark, tmp_path):
        from okay_spark.io import read_path, write_path

        src = spark.createDataFrame(
            [(1, "aa"), (2, "bb")], "id bigint, s string"
        )
        for fmt in ("json", "csv"):
            p = str(tmp_path / f"d_{fmt}")
            write_path(src, p, format=fmt)
            back = read_path(spark, p, format=fmt)
            assert back.count() == 2 and set(back.columns) == {"id", "s"}

    def test_avro_gated_and_bad_format_rejected(self, spark, tmp_path):
        from okay_spark.io import read_path, write_path

        with pytest.raises(NotImplementedError, match="spark-avro"):
            read_path(spark, str(tmp_path), format="avro")
        src = spark.createDataFrame([(1,)], "id bigint")
        with pytest.raises(NotImplementedError, match="spark-avro"):
            write_path(src, str(tmp_path / "x"), format="avro")
        with pytest.raises(ValueError, match="unsupported format"):
            read_path(spark, str(tmp_path), format="xml")


class TestStreamingCusum:
    def test_streaming_equals_batch(self, spark):
        import datetime as dt

        from okay_spark.checks import cusum_anomalies
        from okay_spark.streaming import stream_cusum

        rows = []
        for i in range(14):
            day = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
            rows += [("a", day)] * (8 if i < 7 else 11)
            rows += [("b", day)] * 3
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        batch = {(r["grp"], str(r["day"])): tuple(r) for r in cusum_anomalies(df).collect()}
        stream = {(r["grp"], str(r["day"])): tuple(r) for r in stream_cusum(spark, df).collect()}
        assert batch == stream and len(batch) == 28
