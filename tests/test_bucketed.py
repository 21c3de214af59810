"""Bucketed tables: the write-once pre-shuffle that makes keyed checks
exchange-free on re-runs. Asserts on the FINAL adaptive plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from okay_spark.io import write_bucketed


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]


@pytest.fixture(scope="module")
def bucketed_docs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    write_bucketed(
        docs, "docs_b", bucket_cols="doc_id", num_buckets=4, sort_cols="doc_id",
        path=str(base / "docs_b"),
    )
    refs = docs.select(F.col("doc_id"), F.col("source"))
    write_bucketed(
        refs, "refs_b", bucket_cols="doc_id", num_buckets=4, sort_cols="doc_id",
        path=str(base / "refs_b"),
    )
    yield spark.table("docs_b"), spark.table("refs_b")
    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS refs_b")


def test_uniqueness_on_bucketed_table_is_shuffle_free(bucketed_docs):
    from okay_spark.checks import duplicate_keys

    docs_b, _ = bucketed_docs
    plan = _final_plan(duplicate_keys(docs_b, "doc_id"))
    assert "Exchange" not in plan


def test_cobucketed_join_is_shuffle_free(bucketed_docs):
    docs_b, refs_b = bucketed_docs
    joined = docs_b.join(refs_b.hint("merge"), "doc_id", "inner").select(
        docs_b["doc_id"], refs_b["source"]
    )
    plan = _final_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert joined.count() == docs_b.count()


def test_bucketed_results_match_unbucketed(spark, bucketed_docs):
    from okay_spark.checks import duplicate_keys

    docs_b, _ = bucketed_docs
    plain = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(tuple(r) for r in duplicate_keys(docs_b, "doc_id").collect())
    want = sorted(tuple(r) for r in duplicate_keys(plain, "doc_id").collect())
    assert got == want
