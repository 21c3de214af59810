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
