"""New operators: exact n-gram Jaccard pairs, exact quantiles, IVF ANN,
stateful streaming totals — against DuckDB/brute-force/batch oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_ngram_jaccard_pairs_matches_duckdb(docs):
    import duckdb

    from okay_spark.dedup import ngram_jaccard_pairs

    got = {
        (r["a"], r["b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    want_rows = duckdb.sql(
        f"""
        WITH t AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
          FROM '{SF_DIR}/documents.parquet'
        ), sh AS (
          SELECT doc_id,
            list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS s
          FROM t
        ), e AS (
          SELECT doc_id, len(s) AS sz, unnest(s) AS shingle FROM sh WHERE len(s) > 0
        ), p AS (
          SELECT a.doc_id AS a, b.doc_id AS b, a.sz AS sa, b.sz AS sb, COUNT(*) AS inter
          FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4
        )
        SELECT a, b, round(inter / (sa + sb - inter), 6) AS j
        FROM p WHERE inter / (sa + sb - inter) >= 0.2
        """
    ).fetchall()
    want = {(r[0], r[1]): r[2] for r in want_rows}
    assert want, "oracle found no near-duplicate pairs — fixture regression"
    assert got == want


def test_ngram_jaccard_doc_freq_cap_bounds_posting_lists(spark):
    """Skew fixture: ONE shingle occurs in half the corpus (the stopword
    n-gram pattern). Uncapped, that posting list expands O(df^2) pairs on one
    reducer; the default-capped path must drop it (bounded reducer input)
    while leaving discriminative-shingle pairs exact."""
    from okay_spark.dedup import ngram_jaccard_pairs

    n = 60
    rows = []
    for i in range(n):
        tail = f"u{i}a u{i}b u{i}c u{i}d"
        text = ("the quick fox " + tail) if i % 2 == 0 else tail
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id int, text string")

    # hot shingle df=30 > cap: dropped, and no pair is supported by anything
    # else -> zero output, posting lists bounded by the cap
    assert ngram_jaccard_pairs(df, threshold=0.01, max_doc_freq=10).count() == 0
    # strict-exact mode still expands the hot bucket: 30 choose 2 pairs
    assert (
        ngram_jaccard_pairs(df, threshold=0.01, max_doc_freq=None).count()
        == 30 * 29 // 2
    )
    # the DEFAULT is capped (scale-safe); this corpus sits under the default
    # cap so the default equals strict-exact here
    assert ngram_jaccard_pairs(df, threshold=0.01).count() == 30 * 29 // 2


def test_ngram_jaccard_pairs_agrees_with_crossjoin_formulation(spark):
    from okay_spark.dedup import ngram_jaccard_pairs
    from okay_spark.textops import word_shingles

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d x y"),
            (3, "q w e r t y"),
            (4, "a b c d e f"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        (r["a"], r["b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(df, threshold=0.01).collect()
    }
    sh = {
        r["doc_id"]: set(r["s"])
        for r in df.select("doc_id", word_shingles("text", 3).alias("s")).collect()
    }
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= 0.01:
                want[(a, b)] = round(inter / union, 6)
    assert got == want
    assert got[(1, 4)] == 1.0


def test_exact_quantiles_match_duckdb(spark):
    import duckdb

    from okay_spark.checks import exact_quantiles

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = {
        (r["col_name"], r["p"]): round(r["q"], 6)
        for r in exact_quantiles(df, ["l_quantity", "l_extendedprice"]).collect()
    }
    want_rows = duckdb.sql(
        f"""
        SELECT 'l_quantity' AS c, unnest([0.5, 0.9, 0.99]) AS p,
               unnest(quantile_cont(l_quantity, [0.5, 0.9, 0.99])) AS q
        FROM '{SF_DIR}/lineitem.parquet'
        UNION ALL
        SELECT 'l_extendedprice', unnest([0.5, 0.9, 0.99]),
               unnest(quantile_cont(l_extendedprice, [0.5, 0.9, 0.99]))
        FROM '{SF_DIR}/lineitem.parquet'
        """
    ).fetchall()
    want = {(r[0], float(r[1])): round(r[2], 6) for r in want_rows}
    assert got == want


def test_ivf_exhaustive_probe_equals_brute_force(embeddings):
    from okay_spark.similarity import brute_force_topk, ivf_topk

    query = [float(x) for x in embeddings.filter(F.col("vec_id") == 3).first()["embedding"]]
    exact = [(r["vec_id"], round(r["score"], 6)) for r in brute_force_topk(embeddings, query, k=10).collect()]
    full = [
        (r["vec_id"], round(r["score"], 6))
        for r in ivf_topk(embeddings, query, k=10, n_lists=8, n_probe=8, iters=1).collect()
    ]
    assert full == exact


def test_ivf_partial_probe_recall(embeddings):
    from okay_spark.similarity import brute_force_topk, ivf_topk

    query = [float(x) for x in embeddings.filter(F.col("vec_id") == 3).first()["embedding"]]
    exact_ids = {r["vec_id"] for r in brute_force_topk(embeddings, query, k=10).collect()}
    approx_ids = {
        r["vec_id"]
        for r in ivf_topk(embeddings, query, k=10, n_lists=8, n_probe=4, iters=2).collect()
    }
    recall = len(exact_ids & approx_ids) / 10
    assert recall >= 0.5, f"recall@10 = {recall}"


def test_edit_distance_pairs_finds_planted_neardups(spark):
    from pyspark.sql import functions as F

    from okay_spark.dedup import edit_distance_pairs

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [(1, base), (2, base.replace("lazy", "hazy")), (3, "zz qq ww ee rr tt yy uu")]
    # filler docs pairwise far apart in edit distance (distinct word stems)
    words = ["kestrel", "lagoon", "marble", "nimbus", "orchid", "plinth",
             "quasar", "rivet", "sable", "tundra"]
    rows += [
        (10 + i, " ".join(f"{w}{i * 7 + j}" for j, w in enumerate(words)))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    out = edit_distance_pairs(df, max_distance=5, max_hamming=10)
    got = {(r["a"], r["b"]): r["edit_distance"] for r in out.collect()}
    assert got.get((1, 2)) == 1  # one-char substitution
    assert all(d <= 5 for d in got.values())
    assert (1, 3) not in got and (2, 3) not in got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan  # banded candidates, never all-pairs


def test_pairwise_corr_matches_numpy_and_is_exact(spark):
    import numpy as np

    from okay_spark.checks import pairwise_corr

    rng = [(i, float((i * 37) % 101), float(((i * 17) % 13) + (i % 7))) for i in range(500)]
    df = spark.createDataFrame(rng, "id int, x double, y double")
    got = pairwise_corr(df, "x", "y").first()
    xs = np.array([r[1] for r in rng])
    ys = np.array([r[2] for r in rng])
    want = float(np.corrcoef(xs, ys)[0, 1])
    assert got["n"] == 500
    assert abs(got["corr"] - want) < 1e-9
    # null/NaN pairs excluded
    df2 = df.union(spark.createDataFrame([(999, None, 1.0)], df.schema))
    assert pairwise_corr(df2, "x", "y").first()["n"] == 500


def test_ivf_persisted_index_prunes_partitions(spark, embeddings, tmp_path):
    """The deployment form: list_id is a PARTITION column of the written
    index, so an n_probe search is partition pruning at scan time — the plan
    must show a list_id PartitionFilter and read no data outside the probed
    lists. Exhaustive probe over the persisted index equals brute force."""
    from okay_spark.similarity import brute_force_topk, build_ivf_index, ivf_search

    path = str(tmp_path / "ivf_index")
    cents = build_ivf_index(embeddings, path, n_lists=8, iters=1)
    assert len(cents) == 8

    query = [float(x) for x in embeddings.first()["embedding"]]
    out = ivf_search(spark, path, query, k=10, n_probe=2)
    rows = out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "list_id" in seg, plan[:800]
    assert len(rows) == 10

    # n_probe = n_lists degrades to exact brute force
    exact = {r["vec_id"] for r in brute_force_topk(embeddings, query, k=10).collect()}
    full = {r["vec_id"] for r in ivf_search(spark, path, query, k=10, n_probe=8).collect()}
    assert full == exact


def test_ivf_assignments_deterministic_and_complete(embeddings):
    from okay_spark.similarity import ivf_assignments

    a1, c1 = ivf_assignments(embeddings, n_lists=8, iters=1)
    a2, c2 = ivf_assignments(embeddings, n_lists=8, iters=1)
    assert c1 == c2
    rows1 = sorted((r["vec_id"], r["list_id"]) for r in a1.collect())
    rows2 = sorted((r["vec_id"], r["list_id"]) for r in a2.collect())
    assert rows1 == rows2
    assert len(rows1) == embeddings.count()
    assert all(0 <= lst < 8 for _, lst in rows1)


def test_running_violation_totals_accumulate_across_batches(spark, tmp_path):

    from okay_spark.streaming import running_violation_totals

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    ddl = "doc_id bigint, source string, n_chars bigint"

    def schema_fn():
        from okay_spark import optional, required

        required("doc_id", type="int", min=0)
        optional("source", type="string")
        required("n_chars", type="int", min=10, max=100)

    def write_batch(rows, name):
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode("append").parquet(
            str(src / name)
        )

    def run_once(table):
        stream = spark.readStream.schema(ddl).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        out = running_violation_totals(stream, schema_fn, key_col="source")
        collected = {}

        def sink(batch_df, _batch_id):
            for r in batch_df.collect():
                collected[r["key"]] = (r["n_docs"], r["n_violations"], r["n_failed_docs"])

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return collected

    # batch 1: src0 has one violation (n_chars=5), src1 clean
    write_batch([(1, "src0", 50), (2, "src0", 5), (3, "src1", 60)], "b1")
    got1 = run_once("rvt1")
    assert got1["src0"] == (2, 1, 1)
    assert got1["src1"] == (1, 0, 0)

    # batch 2: totals must ACCUMULATE on restored state, not reset
    write_batch([(-4, "src0", 50), (5, "src1", 500)], "b2")
    got2 = run_once("rvt2")
    assert got2["src0"] == (3, 2, 2)
    assert got2["src1"] == (2, 1, 1)
