"""Training-data pipeline operators: text analysis, dedup, similarity,
multimodal plumbing, lineage/resume, streaming — against Python oracles."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# --- textops ----------------------------------------------------------------


def test_token_count_matches_python(docs):
    from okay_spark.textops import token_count

    got = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).select("doc_id", "n_tokens").collect()}
    for row in docs.select("doc_id", "text").limit(50).collect():
        assert got[row["doc_id"]] == len([t for t in row["text"].split(" ") if t])


def test_fingerprint_is_md5(docs):
    from okay_spark.textops import fingerprint

    row = fingerprint(docs).select("text", "fp").first()
    norm = " ".join(row["text"].lower().split())
    assert row["fp"] == hashlib.md5(norm.encode()).hexdigest()


def test_language_id_and_quality(docs, spark):
    from okay_spark.textops import language_id, quality_score

    df = spark.createDataFrame(
        [
            ("the cat is in the hat and it is fine",),
            ("le chat et la vie des gens pour une fois",),
            ("zzz qqq www",),
        ],
        "text string",
    )
    langs = [r["lang_pred"] for r in language_id(df).collect()]
    assert langs == ["en", "fr", "und"]

    q = quality_score(docs).select("quality", "n_tokens", "stop_ratio", "punct_ratio").collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in q)


def test_word_shingles(spark):
    from okay_spark.textops import word_shingles

    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = [r[0] for r in df.select(word_shingles("text", 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []


# --- dedup -------------------------------------------------------------------


@pytest.fixture(scope="module")
def dup_docs(spark, docs):
    """Documents with seeded exact + near duplicates."""
    base = docs.select("doc_id", "text").limit(100)
    exact = base.limit(10).select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    near = base.limit(10).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    return base.union(exact).union(near).cache()


def test_exact_duplicates(dup_docs):
    from okay_spark.dedup import drop_exact_duplicates, exact_duplicates

    groups = exact_duplicates(dup_docs, include_ids=True).collect()
    assert len(groups) == 10
    assert all(g["cnt"] == 2 and g["keep_id"] == min(g["ids"]) for g in groups)
    # default (scale-path) output carries only bounded per-group scalars
    assert exact_duplicates(dup_docs).columns == ["fp", "cnt", "keep_id"]
    kept = drop_exact_duplicates(dup_docs)
    assert kept.count() == 110  # 120 rows - 10 exact dups
    assert exact_duplicates(kept).count() == 0


def test_minhash_near_duplicates(dup_docs):
    from okay_spark.dedup import minhash_near_duplicates

    pairs = minhash_near_duplicates(
        dup_docs, threshold=0.5, num_hashes=16, bands=8, shingle_k=3
    ).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    # every seeded near/exact dup pair recovered (ids differ by 10k/20k)
    exact_pairs = {(i, i + 10_000) for i in range(10)}
    assert exact_pairs <= found
    near_recovered = sum((i, i + 20_000) in found for i in range(10))
    assert near_recovered >= 8  # LSH with 8 bands catches ~all at j≈0.9
    assert all(r["jaccard"] >= 0.5 for r in pairs)


def test_minhash_signature_portable_to_duckdb(spark):
    """The md5-based minhash must be reproducible in ANSI SQL (DuckDB)."""
    import duckdb

    from okay_spark.dedup import minhash_signature

    df = spark.createDataFrame([("the quick brown fox jumps over the lazy dog",)], "text string")
    sig = df.select(minhash_signature("text", num_hashes=4, shingle_k=3).alias("s")).first()["s"]

    duck = duckdb.sql(
        """
        WITH toks AS (
          SELECT list_filter(string_split('the quick brown fox jumps over the lazy dog', ' '), t -> t != '') AS w
        ), sh AS (
          SELECT list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS shingles FROM toks
        )
        SELECT [list_min([md5(CAST(h AS VARCHAR) || '|' || s) FOR s IN shingles]) FOR h IN range(0, 4)] FROM sh
        """
    ).fetchone()[0]
    assert sig == duck


def test_simhash_near_duplicates(dup_docs):
    from okay_spark.dedup import simhash_near_duplicates

    pairs = simhash_near_duplicates(dup_docs, bits=32, band_bits=8, max_hamming=4).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert {(i, i + 10_000) for i in range(10)} <= found  # exact dups: hamming 0


def test_embedding_near_duplicates(spark, embeddings):
    from okay_spark.dedup import embedding_near_duplicates

    base = embeddings.limit(60)
    clones = base.limit(8).select((F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label")
    df = base.union(clones)
    dim = len(base.first()["embedding"])
    pairs = embedding_near_duplicates(df, dim=dim, threshold=0.999, planes=8).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert {(i, i + 1000) for i in range(8)} <= found


# --- similarity ---------------------------------------------------------------


def test_brute_force_topk_matches_numpy(embeddings):
    import numpy as np

    from okay_spark.similarity import brute_force_topk

    rows = embeddings.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    query = list(vecs[0])

    got = [(r["vec_id"], r["score"]) for r in brute_force_topk(embeddings, query, k=5).collect()]

    qv = np.array(query)
    scores = {
        vid: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))) for vid, v in vecs.items()
    }
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for g, e in zip(got, expect):
        assert abs(g[1] - e[1]) < 1e-9


def test_lsh_knn_recall(embeddings):
    import numpy as np

    from okay_spark.similarity import lsh_knn_join

    corpus = embeddings.limit(200).cache()
    queries = corpus.limit(10)
    dim = len(corpus.first()["embedding"])
    approx = lsh_knn_join(queries, corpus, dim=dim, k=5, planes=6).collect()

    rows = corpus.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    hits = total = 0
    by_q: dict = {}
    for r in approx:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for qid in [r["vec_id"] for r in queries.collect()]:
        qv = vecs[qid]
        scores = {
            vid: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
            for vid, v in vecs.items()
            if vid != qid
        }
        exact = {v for v, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]}
        hits += len(exact & by_q.get(qid, set()))
        total += 5
    # The driver embeddings are near-uniform random (verified: avg intra- and
    # inter-label cosine both ~0), the worst case for cosine LSH — neighbors
    # are barely closer than non-neighbors. Plumbing recall bar only; exact
    # correctness is covered by test_brute_force_topk_matches_numpy.
    assert hits / total >= 0.15


# --- multimodal ---------------------------------------------------------------


def test_multimodal_plumbing(spark):
    from okay_spark.fixtures import media_catalog
    from okay_spark.multimodal import attach_payload, extract_media_features, sample_frames

    media = attach_payload(media_catalog(spark, 50))
    feats = extract_media_features(media, feature_dim=8)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == 8 for r in rows)
    img = [r for r in rows if r["media_kind"] == "image"]
    assert all(r["width"] > 0 and r["height"] > 0 and r["duration_ms"] == 0 for r in img)
    # determinism
    again = {r["media_ref"]: r["feature"] for r in extract_media_features(media, feature_dim=8).collect()}
    assert all(again[r["media_ref"]] == r["feature"] for r in rows)

    frames = sample_frames(media.limit(10))
    assert frames.count() >= 10
    with pytest.raises(NotImplementedError):
        extract_media_features(media, use_real_codecs=True)


def test_multimodal_resize(spark):
    from okay_spark.fixtures import media_catalog
    from okay_spark.multimodal import attach_payload, resize_images

    media = attach_payload(media_catalog(spark, 30))
    out = resize_images(media, width=64, height=64).collect()
    assert len(out) == 30
    assert all(r["width"] == 64 and r["height"] == 64 and len(r["resized"]) == 32 for r in out)
    # deterministic and size-sensitive
    again = {r["media_ref"]: bytes(r["resized"]) for r in resize_images(media, width=64, height=64).collect()}
    other = {r["media_ref"]: bytes(r["resized"]) for r in resize_images(media, width=32, height=32).collect()}
    for r in out:
        assert again[r["media_ref"]] == bytes(r["resized"])
        assert other[r["media_ref"]] != bytes(r["resized"])
    with pytest.raises(NotImplementedError):
        resize_images(media, use_real_codecs=True)


# --- lineage / resume -----------------------------------------------------------


def test_resumable_validation(spark, tmp_path):
    from okay_spark.fixtures import document_schema, interleaved_documents
    from okay_spark.state import run_resumable_validation

    docs = interleaved_documents(spark, 200, parts=4)
    kwargs = dict(
        schema=document_schema,
        partition_col="part",
        violations_target=str(tmp_path / "viol"),
        lineage_target=str(tmp_path / "lineage"),
        snapshot="snap1",
    )
    first = run_resumable_validation(docs, run_id="r1", **kwargs)
    assert first["partitions"] == 4 and first["skipped"] == 0
    second = run_resumable_validation(docs, run_id="r2", **kwargs)
    assert second["partitions"] == 0 and second["skipped"] == 4
    # different snapshot -> full re-run
    third = run_resumable_validation(docs, run_id="r3", **{**kwargs, "snapshot": "snap2"})
    assert third["partitions"] == 4

    viols = spark.read.parquet(str(tmp_path / "viol"))
    assert viols.filter(F.col("run_id") == "r1").count() == first["n_violations"]
    assert viols.filter(F.col("run_id") == "r2").count() == 0


def test_resumable_run_scans_source_once(spark, tmp_path, monkeypatch):
    """Scan budget: a resumable run costs ONE full-data scan of the source —
    the violations write. Round 1 lowered the battery twice (once for the
    partition summary, once for the write) = two full scans. Proven
    structurally: (a) the battery lowering runs exactly once per run, (b) the
    per-partition doc-count frame's scan reads ONLY the partition column,
    (c) the lineage metrics come from reading the violations SINK, never
    re-scanning the source."""
    import okay_spark.state as state
    from okay_spark.fixtures import document_schema, interleaved_documents
    from okay_spark.state import partition_doc_counts, run_resumable_validation

    src = str(tmp_path / "docs_src")
    interleaved_documents(spark, 5_000, parts=4).write.parquet(src)
    spark.catalog.clearCache()
    docs = spark.read.parquet(src)

    # (b) doc counts scan only the partition column
    dc = partition_doc_counts(docs, "part")
    dc.collect()
    plan = dc._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "part" in seg and "spans" not in seg and "doc_id" not in seg, seg

    # (a) + (c): spy the battery lowering and every table read
    calls = {"validate": 0, "reads": []}
    real_vd, real_rt = state.validate_dataframe, state.read_table

    def spy_vd(*a, **k):
        calls["validate"] += 1
        return real_vd(*a, **k)

    def spy_rt(spark_, target, **k):
        calls["reads"].append(target)
        return real_rt(spark_, target, **k)

    monkeypatch.setattr(state, "validate_dataframe", spy_vd)
    monkeypatch.setattr(state, "read_table", spy_rt)

    viol = str(tmp_path / "viol")
    out = run_resumable_validation(
        docs,
        schema=document_schema,
        partition_col="part",
        violations_target=viol,
        lineage_target=str(tmp_path / "lineage"),
        run_id="r1",
        snapshot="s1",
    )
    assert out["partitions"] == 4
    assert calls["validate"] == 1  # the one full scan
    # every read_table target is a sink (violations/lineage), never the source
    assert all(t != src for t in calls["reads"])
    assert viol in calls["reads"]  # metrics derive from the written sink
    # lineage metrics agree with what actually landed in the sink
    written = spark.read.parquet(viol)
    assert written.count() == out["n_violations"]
    assert "part" in written.columns  # per-partition violation rows


def test_resume_prunes_partitions_at_scan(spark, tmp_path):
    """The skip of already-validated partitions must reach the FileScan as a
    PartitionFilter on a hive-partitioned input — a resumed 10^12-row run
    never reads completed partitions' bytes at all."""
    from okay_spark.fixtures import document_schema, interleaved_documents
    from okay_spark.state import completed_partitions, run_resumable_validation, schema_fingerprint
    from okay_spark.schema import compile_cached

    src = str(tmp_path / "docs_parted")
    interleaved_documents(spark, 300, parts=4).write.partitionBy("part").parquet(src)
    docs = spark.read.parquet(src)
    kwargs = dict(
        schema=document_schema,
        partition_col="part",
        violations_target=str(tmp_path / "viol"),
        lineage_target=str(tmp_path / "lineage"),
        snapshot="s1",
    )
    run_resumable_validation(docs, run_id="r1", **kwargs)

    fp = schema_fingerprint(compile_cached(document_schema))
    done = completed_partitions(spark, str(tmp_path / "lineage"), "s1", fp)
    assert len(done) == 4
    # the resume filter compiles to partition pruning, not a data filter
    pruned = docs.filter(~F.col("part").cast("string").isin(*done))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert seg.strip(), f"empty partition filters: {plan[:500]}"
    assert pruned.count() == 0


# --- streaming --------------------------------------------------------------------


def test_streaming_incremental_validation(spark, tmp_path):
    from okay_spark.fixtures import document_schema, interleaved_documents
    from okay_spark.engine import validate_dataframe
    from okay_spark.streaming import run_incremental

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    docs = interleaved_documents(spark, 150, parts=4)
    docs.limit(100).write.parquet(src)
    ddl = docs.schema.simpleString()[7:-1] if False else docs._jdf.schema().toDDL()

    run_incremental(
        spark,
        source_dir=src,
        source_ddl=ddl,
        schema=document_schema,
        sink_dir=sink,
        checkpoint_dir=ckpt,
    )
    n1 = spark.read.parquet(sink).count()
    assert n1 == validate_dataframe(spark.read.parquet(src), document_schema).count()

    # new files arrive; re-run processes only them
    docs.write.mode("append").parquet(src)
    run_incremental(
        spark,
        source_dir=src,
        source_ddl=ddl,
        schema=document_schema,
        sink_dir=sink,
        checkpoint_dir=ckpt,
    )
    n2 = spark.read.parquet(sink).count()
    assert n2 == validate_dataframe(spark.read.parquet(src), document_schema).count()
    assert n2 > n1


# --- duplicated-span removal ------------------------------------------------------


def test_strip_duplicate_spans_planted(spark):
    from okay_spark.dedup import strip_duplicate_spans

    boiler = " ".join(f"b{i}" for i in range(10))  # 10-token boilerplate span
    uniq_a = " ".join(f"a{i}" for i in range(6))
    uniq_b = " ".join(f"c{i}" for i in range(6))
    rows = [
        (1, f"{uniq_a} {boiler}"),            # boilerplate at tail
        (2, f"{boiler} {uniq_b}"),            # boilerplate at head
        (3, boiler),                           # entirely boilerplate
        (4, "short doc only"),                 # < n tokens: untouched
        (5, " ".join(f"z{i}" for i in range(12))),  # unique long doc: untouched
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in strip_duplicate_spans(df, n=8).collect()}

    assert len(out) == 5  # every input doc present, even the emptied one
    # every position covered by a shared 8-gram is struck: the whole 10-token
    # boilerplate span goes (overlapping grams merge), unique prefixes stay
    assert out[1]["text_dedup"] == uniq_a
    assert out[2]["text_dedup"] == uniq_b
    assert out[3]["text_dedup"] == "" and out[3]["n_kept"] == 0
    assert out[4]["text_dedup"] == "short doc only" and out[4]["n_tokens"] == 3
    assert out[5]["text_dedup"] == rows[4][1]
    assert out[1]["n_tokens"] == 16 and out[1]["n_kept"] == 6


def test_strip_duplicate_spans_within_doc_repeat_kept(spark):
    """A span repeated only WITHIN one document is not cross-document
    duplication (doc-freq 1) and must survive."""
    from okay_spark.dedup import strip_duplicate_spans

    span = " ".join(f"r{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, f"{span} {span}"), (2, "some other words here entirely distinct tokens")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in strip_duplicate_spans(df, n=8).collect()}
    assert out[1]["n_kept"] == 16
