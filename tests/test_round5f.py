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
