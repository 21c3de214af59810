"""TF-IDF top-terms and cross-batch streaming dedup."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import Row, functions as F


def test_tfidf_ranks_rare_terms_above_common(spark):
    from okay_spark.textops import tfidf_top_terms

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="common rare"),
            Row(doc_id=2, text="common boring"),
            Row(doc_id=3, text="common boring filler"),
        ]
    )
    out = tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # equal tf=1 in doc 1: "rare" (df=1) outranks "common" (df=3) on idf
    assert top[1] == "rare"
    assert all(r["rk"] == 1 for r in out)


def test_tfidf_term_tiebreak_is_deterministic(spark):
    from okay_spark.textops import tfidf_top_terms

    # two terms with identical tf and df: alphabetical order must win
    df = spark.createDataFrame([Row(doc_id=1, text="zeta alpha")])
    out = tfidf_top_terms(df, k=2).collect()
    assert [r["term"] for r in sorted(out, key=lambda r: r["rk"])] == ["alpha", "zeta"]


def test_tfidf_repeated_term_gets_higher_tf(spark):
    from okay_spark.textops import tfidf_top_terms

    df = spark.createDataFrame(
        [Row(doc_id=1, text="a a a b"), Row(doc_id=2, text="a b b c")]
    )
    out = {(r["doc_id"], r["rk"]): r["term"] for r in tfidf_top_terms(df, k=1).collect()}
    assert out[(1, 1)] == "a"
    assert out[(2, 1)] == "b"


def test_stream_dedup_drops_cross_batch_duplicates(spark):
    from okay_spark.streaming import stream_dedup

    src = tempfile.mkdtemp(prefix="okay_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="okay_stream_ckpt_")
    sink = tempfile.mkdtemp(prefix="okay_stream_sink_")
    try:
        # two files = two micro-batch candidates; doc 2 appears in both
        spark.createDataFrame(
            [Row(doc_id=1, text="one"), Row(doc_id=2, text="two")]
        ).write.parquet(f"{src}/a")
        spark.createDataFrame(
            [Row(doc_id=2, text="two"), Row(doc_id=3, text="three")]
        ).write.parquet(f"{src}/b")
        stream = spark.readStream.schema("doc_id bigint, text string").option(
            "recursiveFileLookup", "true"
        ).parquet(src)
        deduped = stream_dedup(stream, "doc_id")
        (
            deduped.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        out = spark.read.parquet(sink)
        assert out.count() == 3
        assert {r["doc_id"] for r in out.select("doc_id").collect()} == {1, 2, 3}
    finally:
        for d in (src, ckpt, sink):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_watermark_variant_builds(spark):
    from okay_spark.streaming import stream_dedup

    # plan-construction check: the bounded-state variant must wire the
    # watermark + dropDuplicatesWithinWatermark without analysis errors
    stream = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    out = stream_dedup(stream, "value", watermark_col="timestamp", delay="5 seconds")
    assert out.isStreaming


def test_chunk_documents_windows_and_overlap(spark):
    from okay_spark.textops import chunk_documents
    from pyspark.sql import Row

    # 10 tokens, window 6, overlap 2 -> starts 0, 4; start 8 is dropped
    # (fully contained in the window at 4)
    df = spark.createDataFrame([Row(doc_id=1, text="t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")])
    out = sorted(
        chunk_documents(df, chunk_tokens=6, overlap=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [(r["chunk_id"], r["start_token"], r["n_tokens"]) for r in out] == [
        (0, 0, 6),
        (1, 4, 6),
    ]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3 t4 t5"
    assert out[1]["chunk_text"] == "t4 t5 t6 t7 t8 t9"


def test_chunk_documents_short_and_empty(spark):
    from okay_spark.textops import chunk_documents
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(doc_id=1, text="only three words"), Row(doc_id=2, text="")])
    out = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    assert len(out) == 1  # short doc -> one partial chunk; empty doc -> none
    assert out[0]["doc_id"] == 1 and out[0]["n_tokens"] == 3


def test_chunk_documents_rejects_bad_overlap(spark):
    from okay_spark.textops import chunk_documents
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_pack_chunks_respects_budget_and_covers_everything(spark):
    from okay_spark.textops import chunk_documents, pack_chunks
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"w{i}_{j}" for j in range(30))) for i in range(20)]
    )
    chunks = chunk_documents(docs, chunk_tokens=12, overlap=2)
    packed = pack_chunks(chunks, budget_tokens=30, n_buckets=4)
    rows = packed.collect()
    n_chunks_in = chunks.count()
    assert sum(r["n_chunks"] for r in rows) == n_chunks_in  # nothing lost
    # budget respected except unavoidable single-oversize chunks (none here)
    assert all(r["total_tokens"] <= 30 for r in rows)
    # deterministic: second run identical
    rows2 = pack_chunks(chunks, budget_tokens=30, n_buckets=4).collect()
    key = lambda r: (r["bucket"], r["seq_id"], r["packed_text"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, rows2))


def test_pack_chunks_oversize_chunk_becomes_singleton(spark):
    from okay_spark.textops import pack_chunks
    from pyspark.sql import Row

    chunks = spark.createDataFrame(
        [
            Row(doc_id=1, chunk_id=0, n_tokens=50, chunk_text="big " * 50),
            Row(doc_id=1, chunk_id=1, n_tokens=5, chunk_text="small"),
        ]
    )
    rows = sorted(pack_chunks(chunks, budget_tokens=20, n_buckets=2).collect(),
                  key=lambda r: r["seq_id"])
    assert rows[0]["n_chunks"] == 1 and rows[0]["total_tokens"] == 50
    assert rows[1]["n_chunks"] == 1 and rows[1]["total_tokens"] == 5


def test_pack_chunks_string_doc_ids(spark):
    """The flagship spans shape has string doc ids ('doc-%012d'); bucketing
    is hash-based so packing must work and doc_ids must keep the id type."""
    from okay_spark.textops import chunk_documents, pack_chunks
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=f"doc-{i:012d}", text=" ".join(f"w{i}_{j}" for j in range(20)))
            for i in range(12)
        ]
    )
    chunks = chunk_documents(docs, chunk_tokens=8, overlap=2)
    packed = pack_chunks(chunks, budget_tokens=24, n_buckets=4)
    assert dict(packed.dtypes)["doc_ids"] == "array<string>"
    rows = packed.collect()
    assert sum(r["n_chunks"] for r in rows) == chunks.count()
    assert all(r["total_tokens"] <= 24 for r in rows)
    assert all(d.startswith("doc-") for r in rows for d in r["doc_ids"])


def test_compression_ratio_orders_junk_below_prose(spark):
    from okay_spark.textops import compression_ratio
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  # pure run
            Row(doc_id=2, text="the quick brown fox jumps over the lazy dog and then rests"),
            Row(doc_id=3, text=None),
            Row(doc_id=4, text=""),
        ]
    )
    out = {r["doc_id"]: r["compression_ratio"] for r in compression_ratio(df).collect()}
    assert out[1] < out[2]  # repeated junk compresses far better than prose
    assert out[3] is None and out[4] == 0.0
    # deterministic across runs (fixed zlib level)
    out2 = {r["doc_id"]: r["compression_ratio"] for r in compression_ratio(df).collect()}
    assert out == out2


def test_char_entropy_extremes(spark):
    import math

    from okay_spark.textops import char_entropy
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=1, text="aaaa"), Row(doc_id=2, text="abcd"), Row(doc_id=3, text="")]
    )
    out = {r["doc_id"]: r["e"] for r in df.select("doc_id", char_entropy("text").alias("e")).collect()}
    assert out[1] == 0.0                      # one symbol -> zero entropy
    assert out[2] == pytest.approx(2.0)       # four uniform symbols -> 2 bits
    assert out[3] == 0.0
    # upper bound: log2(alphabet size)
    assert out[2] <= math.log2(4) + 1e-9
