"""Physical-plan audit: verify each headline operator compiles to the plan
we would want on a 1000-executor cluster, and emit SCALE.md evidence.

For every operator this checks, from the *executed* plan string:
- scan pruning (ReadSchema carries only needed columns),
- shuffle count (Exchange hashpartitioning occurrences),
- broadcast joins where a side is known-small,
- absence of Python evaluation (BatchEvalPython/ArrowEvalPython) outside
  the explicitly-Arrow operators,
- whole-stage codegen presence in the hot path.

Run: python scripts/plan_audit.py   (writes SCALE.md at the repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

CHECKS: list[dict] = []


def audit(name: str, df, *, max_shuffles: int, want: list[str] = (), forbid: list[str] = (),
          note: str = ""):
    df.collect()  # drive execution so AQE's FINAL plan (with codegen marks) is audited
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE appends the pre-execution tree under "== Initial Plan ==" — audit
    # only the final plan or every exchange double-counts
    plan = plan.split("== Initial Plan ==")[0]
    shuffles = plan.count("Exchange hashpartitioning")
    problems = []
    if shuffles > max_shuffles:
        problems.append(f"{shuffles} shuffles > budget {max_shuffles}")
    for w in want:
        if w not in plan:
            problems.append(f"missing `{w}`")
    for f_ in forbid:
        if f_ in plan:
            problems.append(f"forbidden `{f_}` present")
    scans = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    # whole-stage-codegen stages appear as "*(n) Operator" prefixes
    codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
    CHECKS.append(
        {
            "name": name,
            "shuffles": shuffles,
            "budget": max_shuffles,
            "codegen_spans": codegen,
            "scans": scans[:3],
            "problems": problems,
            "note": note,
        }
    )
    status = "OK " if not problems else "BAD"
    print(f"{status} {name}: shuffles={shuffles}/{max_shuffles} codegen={codegen} {problems}")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("plan-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from okay_spark.checks import (
        column_stats,
        distinct_counts,
        drift_metrics,  # noqa: F401  (driver-side dict; audited via histogram below)
        duplicate_keys,
        media_ref_violations,
        numeric_histogram,
        partition_summary,
        referential_violations,
    )
    from okay_spark.dedup import minhash_lsh_buckets, simhash_near_duplicates
    from okay_spark.engine import validate_dataframe
    from okay_spark.fixtures import document_schema, interleaved_documents, media_catalog
    from okay_spark.relops import asof_join, range_join, sessionize

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    inter = interleaved_documents(spark, 10_000, parts=8)
    catalog = media_catalog(spark, 10_000)

    def doc_schema():
        from okay_spark import ignore_extra_fields, required

        required("lang", type="string", options=["en", "fr", "de"])
        required("n_chars", type="int", min=1, max=500)
        ignore_extra_fields()

    # 1. battery: shuffle-free, pruned scan, zero Python
    audit(
        "battery (flat, 2-col schema)",
        validate_dataframe(docs, doc_schema, id_cols=["doc_id"]),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="scan must read only doc_id,lang,n_chars; entire battery in one codegen stage",
    )
    audit(
        "battery (interleaved spans[])",
        validate_dataframe(inter, document_schema, id_cols=["doc_id"]),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="posexplode plan; array rules stay in codegen",
    )
    from okay_spark.fixtures import oracle_interleaved_documents

    audit(
        "battery (md5-oracle spans, parquet-derived)",
        validate_dataframe(
            oracle_interleaved_documents(docs), document_schema, id_cols=["doc_id"]
        ),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="fixture construction fuses into the scan projection; ReadSchema is doc_id,text only",
    )
    from okay_spark.checks import span_order_violations

    audit(
        "span_order (adjacent-pair zip_with)",
        span_order_violations(inter, "spans", "offset", id_cols=["doc_id"]),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="cross-element rule as a codegen array expression; linear in total spans",
    )
    from okay_spark.checks import element_rule
    from pyspark.sql import functions as Fx

    audit(
        "element_rule (per-element conditional)",
        element_rule(
            inter,
            "spans",
            when=lambda s: s["kind"] == Fx.lit("text"),
            expect=lambda s: Fx.length(s["text"]) > 0,
            field="text",
            id_cols=["doc_id"],
        ),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="transform-with-index + filter + explode; all offending indices, zero Python",
    )

    # 2. partition summary: one partial+final aggregate
    audit(
        "partition_summary",
        partition_summary(inter, document_schema, "part"),
        max_shuffles=1,
        want=["partial"],
        note="map-side partial aggregation before the single exchange",
    )

    # 3. column stats: ONE aggregate pass, no per-column jobs
    audit(
        "column_stats (4 cols)",
        column_stats(lineitem, ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"]),
        max_shuffles=0,
        note="single-row global aggregate; partial agg per partition, final on one reducer",
    )

    audit(
        "distinct_counts (2 cols)",
        distinct_counts(events, ["user_id", "event_type"]),
        max_shuffles=2,
        note="expand + two-phase distinct aggregate",
    )

    # 4. uniqueness: plain and salted
    audit(
        "duplicate_keys",
        duplicate_keys(lineitem, "l_orderkey"),
        max_shuffles=1,
        want=["partial"],
        note="partial count per partition -> one exchange on the key",
    )
    audit(
        "duplicate_keys salted",
        duplicate_keys(events, "user_id", salt_buckets=8),
        max_shuffles=2,
        note="stage 1 keyed by (key, salt) caps any single reducer's share of a hot key",
    )

    # 5. referential: broadcast vs salted SMJ
    audit(
        "referential broadcast",
        referential_violations(orders, "o_custkey", customer, "c_custkey", id_cols=["o_orderkey"]),
        max_shuffles=1,
        want=["BroadcastHashJoin"],
        note="the ONE exchange is the dim-side key dedup (tiny); the fact side never shuffles",
    )
    audit(
        "referential salted SMJ",
        referential_violations(
            events.select("event_id", "user_id"), "user_id",
            spark.read.parquet(f"{SF_DIR}/supplier.parquet"), "s_suppkey",
            id_cols=["event_id"], broadcast=False, salt_buckets=4,
        ),
        max_shuffles=3,
        forbid=["BroadcastHashJoin"],
        note="replicated-salt join: fact side salted, dim replicated x salt",
    )
    audit(
        "media_ref_violations broadcast",
        media_ref_violations(inter, catalog, broadcast=True),
        max_shuffles=1,
        want=["BroadcastHashJoin"],
        note="explode spans -> broadcast anti-join; only the catalog's keys shuffle (dedup)",
    )
    audit(
        "referential key-reduced",
        referential_violations(
            events.select("event_id", "user_id"), "user_id",
            spark.read.parquet(f"{SF_DIR}/supplier.parquet"), "s_suppkey",
            id_cols=["event_id"], key_reduce=True,
        ),
        max_shuffles=0,
        want=["BroadcastHashJoin", "LeftSemi"],
        forbid=["Sort "],
        note="big-dim path: distinct fact keys anti-join the dim in a "
        "checkpointed side plan; the violating-key set broadcasts back — "
        "the fact table NEVER shuffles or sorts (0 exchanges here)",
    )

    from okay_spark.state import partition_fingerprints

    audit(
        "partition_fingerprints",
        partition_fingerprints(
            docs, "lang",
            F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text")),
        ),
        max_shuffles=1,
        want=["partial"],
        note="order-independent md5-sum digest: partial-combines map-side, "
        "O(1) reducer state per partition key — the changed-partition "
        "detector costs one column-pruned scan",
    )

    # 6. drift histogram: partial aggregation of bins
    audit(
        "numeric_histogram",
        numeric_histogram(events.filter(F.col("event_type") == "click"), "value", 0.0, 400.0, 20),
        max_shuffles=1,
        want=["partial"],
        note="bin id computed map-side; only 20-row histogram crosses the wire",
    )

    # 6b. round-2 operators: lazy heavy hitters, engine-side categorical PSI,
    # capped inverted-index jaccard, persisted-IVF partition pruning
    from okay_spark.checks import categorical_drift_frame, heavy_hitters
    from okay_spark.dedup import ngram_jaccard_pairs

    audit(
        "heavy_hitters",
        heavy_hitters(events, "user_id", k=10),
        max_shuffles=1,
        want=["struct<>"],
        note="one keyed count exchange + TakeOrdered; the COUNT(*) share "
        "denominator is a zero-column scan (ReadSchema struct<>)",
    )
    audit(
        "categorical_drift_frame",
        categorical_drift_frame(
            events.filter(F.col("event_type") == "error"),
            events.filter(F.col("event_type") == "click"),
            "user_id",
        ),
        max_shuffles=2,
        want=["Union"],
        note="tagged union -> ONE keyed count aggregate (both sides in one "
        "shuffle, reused by the totals branch); totals broadcast back; ONE "
        "row to the driver regardless of cardinality",
    )
    audit(
        "ngram_jaccard_pairs (df-capped)",
        ngram_jaccard_pairs(docs, threshold=0.2),
        max_shuffles=2,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
        note="inverted index: posting-list groupBy + pair-count groupBy; "
        "max_doc_freq cap bounds any posting list (no O(df^2) hot reducer)",
    )

    import tempfile

    from okay_spark.similarity import build_ivf_index, ivf_search

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ivf_dir = tempfile.mkdtemp(prefix="ivf_audit_")
    build_ivf_index(emb, ivf_dir, n_lists=8, iters=1)
    qv = [float(x) for x in emb.first()["embedding"]]
    ivf_df = ivf_search(spark, ivf_dir, qv, k=10, n_probe=2)
    audit(
        "ivf_search (persisted index)",
        ivf_df,
        max_shuffles=0,
        want=["PartitionFilters: [list_id"],
        note="n_probe lists = partition pruning on the index table; "
        "2/8 of the data read, TakeOrdered top-k, no shuffle",
    )

    # 7. dedup: minhash buckets + simhash banded pairs
    audit(
        "minhash_lsh_buckets",
        minhash_lsh_buckets(docs, num_hashes=8, bands=4, shingle_k=3),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython"],
        note="signature = native expressions; banding is a projection, no shuffle until the bucket join",
    )
    audit(
        "simhash_near_duplicates",
        simhash_near_duplicates(docs, bits=32, band_bits=4, max_hamming=7),
        max_shuffles=4,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
        note="banded self-join: candidates meet only within shared 4-bit band buckets",
    )

    # 8. relops
    audit(
        "sessionize",
        sessionize(events.filter(F.col("ts").isNotNull())),
        max_shuffles=1,
        note="lag + running sum share one sort/partitioning",
    )
    p = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    audit(
        "asof_join",
        asof_join(p, c, on="user_id", left_ts="ts", right_ts="ts", right_cols=["click_id"]),
        max_shuffles=1,
        forbid=["SortMergeJoin", "CartesianProduct"],
        note="union + last-value: ONE shuffle, no key-match cross product",
    )
    audit(
        "range_join",
        range_join(events, [("lo", 0.0, 25.0), ("hi", 25.0, 1e9)], value_col="value"),
        max_shuffles=0,
        want=["BroadcastNestedLoopJoin"],
        note="tiny literal dim broadcast; fact streamed once",
    )

    # 9. round-2 pipeline ops
    from okay_spark.embedops import label_centroids, quantization_error
    from okay_spark.textops import ngram_contamination, repetition_stats

    audit(
        "repetition_stats",
        repetition_stats(docs, k=2),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="row-local k-gram dup ratio: pure codegen'd array expressions, "
        "embarrassingly parallel",
    )
    audit(
        "ngram_contamination",
        ngram_contamination(
            docs.filter(F.col("source") != "src5"),
            docs.filter(F.col("source") == "src5"),
            k=3,
        ),
        max_shuffles=6,
        forbid=["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
        note="benchmark side deduped to distinct shingles (bounded by its "
        "vocabulary) before the shingle join; per-doc re-aggregate + one "
        "left join for zero-overlap docs",
    )
    audit(
        "label_centroids",
        label_centroids(emb),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython"],
        note="posexplode to (label, pos, x) then ONE hash aggregate; shuffle "
        "key cardinality = labels x dim regardless of row count; decimal sum "
        "keeps the mean partial-order independent",
    )
    audit(
        "quantization_error",
        quantization_error(emb),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython"],
        note="int8 quantize + per-row MSE as array expressions; one "
        "aggregate keyed on label",
    )

    from okay_spark.textops import chunk_documents, pack_chunks

    chunks = chunk_documents(docs, chunk_tokens=48, overlap=8)
    audit(
        "chunk_documents",
        chunks,
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="token windows via sequence/slice/posexplode: row-local, "
        "shuffle-free, codegen'd",
    )
    audit(
        "pack_chunks (bucketed greedy)",
        pack_chunks(chunks, budget_tokens=192, n_buckets=16),
        max_shuffles=1,
        forbid=["CartesianProduct"],
        note="greedy packing is sequential per bucket: ONE shuffle on the "
        "doc-hash bucket key, then Arrow-batched applyInPandas groups pack "
        "independently (the declared Python seam for this op)",
    )

    from okay_spark.checks import ks_exact

    audit(
        "ks_exact (distributed prefix sum)",
        ks_exact(
            events.filter(F.col("event_type") == "error"),
            events.filter(F.col("event_type") == "click"),
            "value",
        ),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="exact unbinned KS without the single-task global window: "
        "per-value aggregate -> range partitions -> local window cumsums; "
        "cross-partition offsets are <= `partitions` rows fetched once and "
        "broadcast back (audited plan starts at the checkpointed local "
        "cumsums: offsets join + max aggregate)",
    )

    from okay_spark.balance import cap_per_group, resample_to_target
    from okay_spark.dedup import strip_duplicate_spans

    audit(
        "strip_duplicate_spans",
        strip_duplicate_spans(docs, n=8),
        max_shuffles=6,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="exact substring dedup: per-doc gram build is row-local "
        "(transform/sequence, codegen'd); duplicate detection is "
        "count_distinct(doc_id) per gram — Spark's two-phase distinct keys "
        "the first exchange on (gram, doc_id), so a boilerplate gram in 10M "
        "docs spreads across reducers instead of pinning one (no posting "
        "list is ever collected); coverage join + anti join shuffle on "
        "(doc_id,pos); reconstruction is one doc-keyed aggregate with "
        "state bounded by document length",
    )
    audit(
        "cap_per_group (two-phase window)",
        cap_per_group(docs, "source", max_rows=15, order_col="doc_id"),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython"],
        note="per-domain cap: shard window keyed (group, spark_partition_id) "
        "spreads a hot group over all reducers and keeps per-shard top-N; "
        "the global window then sorts <= N x shards rows per group, never "
        "the whole group",
    )
    audit(
        "resample_to_target",
        resample_to_target(
            docs, "lang", {"en": 0.4, "de": 0.2, "fr": 0.2, "es": 0.1, "zh": 0.1}
        ),
        max_shuffles=1,
        want=["BroadcastHashJoin"],
        forbid=["BatchEvalPython", "ArrowEvalPython"],
        note="distribution rebalancing: ONE count aggregate on the group "
        "column (map-side combine), scalar min over #groups rows, keep-"
        "fractions broadcast back onto the fact table; the membership test "
        "is a JVM md5 expression in the scan pipeline",
    )

    from okay_spark.dedup import minhash_candidate_pairs

    audit(
        "minhash_candidate_pairs (capped)",
        minhash_candidate_pairs(docs, num_hashes=8, bands=4, max_bucket_size=1000),
        max_shuffles=4,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="bucket-size cap is TWO-PHASE: a scalar count(1) aggregate per "
        "(band,bucket) — O(1) reducer state, partial-combined map-side — "
        "finds oversized (boilerplate-flooded) buckets, then a left-anti "
        "join removes their rows BEFORE the collect_list, so the posting "
        "aggregate's per-group state is hard-bounded at max_bucket_size; "
        "in-bucket pair expansion is a codegen'd transform, and the final "
        "distinct dedups cross-band repeats",
    )

    from okay_spark.balance import sample_to_token_budget
    from okay_spark.dedup import minhash_cross_duplicates
    from okay_spark.textops import token_count

    ref_side = docs.filter(F.col("doc_id") % 7 == 0)
    corp_side = docs.filter(F.col("doc_id") % 7 != 0)
    audit(
        "minhash_cross_duplicates",
        minhash_cross_duplicates(corp_side, ref_side, threshold=0.5),
        max_shuffles=8,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="cross-corpus near-dup: per-side signatures never cross-join — "
        "candidates meet via the (band,bucket) equi-join, each side's "
        "flooded buckets anti-joined out first (two-phase cap), exact "
        "Jaccard re-rank joins shingle sets by id on the candidate set only",
    )
    audit(
        "sample_to_token_budget (two-phase)",
        sample_to_token_budget(
            token_count(docs.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())),
            "lang",
            budget_tokens=2_000,
            token_col="n_tokens",
        ),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython"],
        note="token-budget fill: take-while over md5 order; the shard pass "
        "keyed (group, spark_partition_id) under-counts the global prefix "
        "sum, so everything it drops is provably over budget — the global "
        "window sorts only ~budget-worth of survivors per (group, shard), "
        "never a whole hot group (partition-invariance pytest-pinned)",
    )

    from okay_spark.dedup import embedding_near_duplicates

    audit(
        "embedding_near_duplicates (anchor-capped)",
        embedding_near_duplicates(
            emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")),
            dim=16,
            threshold=0.9,
            max_bucket_size=100,
        ),
        max_shuffles=6,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="hyperplane-LSH self-join with md5-sampled bucket ANCHORS on "
        "the build side: the equi-join holds no unbounded reducer state "
        "(SMJ spills) but a flooded bucket is O(n^2) cosine fan-out — the "
        "cap bounds it at n x cap while every flooded doc still meets every "
        "surviving anchor (single component downstream, pytest-pinned)",
    )

    from okay_spark.dedup import drop_duplicate_lines

    audit(
        "drop_duplicate_lines",
        drop_duplicate_lines(
            docs.filter(F.col("doc_id").isNotNull()).select(
                "doc_id",
                F.regexp_replace(F.col("text"), r"((?:\S+ ){7}\S+) ", "$1\n").alias("text"),
            ),
            min_doc_freq=2,
        ),
        max_shuffles=5,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="corpus line-dedup: split/posexplode evaluated ONCE (lazy "
        "localCheckpoint) across the count pre-pass and the anti-join; "
        "duplicate detection is count_distinct(doc_id) per line — Spark's "
        "two-phase expansion keys (line, doc_id) first so a 10M-doc "
        "boilerplate line spreads across reducers; rebuild is one hash "
        "aggregate per doc with state bounded by doc length",
    )

    from okay_spark.textops import rare_token_stats

    audit(
        "rare_token_stats",
        rare_token_stats(docs, min_df=380),
        max_shuffles=4,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="rare-token quality signal: vocabulary df comes from the "
        "pre-aggregated (doc, token) pairs (map-side combine; never a "
        "posting list); the df join back has ONE build row per token so "
        "AQE skew-split replicates it under a hot stopword; final rollup "
        "is one hash aggregate keyed by doc_id",
    )

    from okay_spark.checks import adjacent_pair_violations
    from okay_spark.fixtures import oracle_interleaved_documents

    audit(
        "adjacent_pair_violations (interleave rule)",
        adjacent_pair_violations(
            oracle_interleaved_documents(docs),
            "spans",
            id_cols=["doc_id"],
            pred=lambda a, b: (a["kind"] == F.lit("media")) & (b["kind"] == F.lit("media")),
            rule="adjacent_media",
            field="kind",
        ),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="adjacency rule: zip-with-tail + one posexplode, entirely "
        "inside the scan pipeline — shuffle-free at any scale, like the "
        "battery itself",
    )

    from okay_spark.engine import quarantine as _quarantine

    _clean_q, _quar_q = _quarantine(docs, doc_schema, id_cols=["doc_id"])
    audit(
        "quarantine (clean branch)",
        _clean_q,
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="sink split, clean side: scan -> codegen'd violations "
        "projection -> filter; zero exchanges",
    )
    audit(
        "quarantine (quarantined branch)",
        _quar_q,
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="sink split, quarantined side: same projection, reasons digest "
        "is array_sort/array_join over the violations array — row-local",
    )

    from okay_spark.checks import aggregate_consistency, hll_sketch

    audit(
        "hll_sketch",
        hll_sketch(events, "user_id", p=6),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="deterministic HLL registers: md5/shift/bitlen integer "
        "expressions + ONE hash aggregate with map-side max combine — at "
        "most 2^p rows ever shuffle; the estimate folds those rows "
        "driver-side (bounded collect)",
    )
    audit(
        "aggregate_consistency",
        aggregate_consistency(
            lineitem,
            orders,
            "l_orderkey",
            "o_orderkey",
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            "o_totalprice",
            tolerance=0.01,
        ),
        max_shuffles=3,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="stored-total vs fact-sum: the fact side partial-aggregates "
        "map-side (one decimal row per key reaches the shuffle); parent "
        "join is an equi-join on the key (broadcast/AQE); decimal(38,12) "
        "pre-cast keeps the total partition- and engine-invariant",
    )

    from okay_spark.checks import (
        bloom_contains,
        bloom_sketch,
        bloom_words,
        referential_violations_bloom,
    )

    audit(
        "bloom_sketch",
        bloom_sketch(events, "user_id", m_bits=4096, k=5),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="deterministic Bloom state: md5 probe positions + ONE bit_or "
        "hash aggregate with map-side partial combine — at most "
        "ceil(m_bits/63) word rows ever shuffle, whatever the key "
        "cardinality",
    )
    _bw = bloom_words(bloom_sketch(events, "user_id", m_bits=4096, k=5), m_bits=4096)
    audit(
        "bloom probe (definite-miss branch)",
        events.filter(~bloom_contains(F.col("user_id"), _bw, m_bits=4096, k=5)),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="row-local membership test against the broadcast word array: "
        "pure codegen scan, zero joins — definite referential violations "
        "exit here without the fact table ever shuffling",
    )
    audit(
        "referential_violations_bloom (exact composition)",
        referential_violations_bloom(
            events.select("event_id", "user_id"),
            "user_id",
            spark.read.parquet(f"{SF_DIR}/supplier.parquet"),
            "s_suppkey",
            m_bits=256,
            k=5,
            id_cols=["event_id"],
        ),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="bloom-pruned referential: the dim aggregates into bounded "
        "filter state once; only bloom-POSITIVE distinct keys anti-join "
        "the dim (the checkpointed bad-key subplan carries those "
        "exchanges); the surviving-key set broadcasts back, so the fact "
        "side is two scans and zero sorts",
    )

    from okay_spark.checks import cms_frequency, cms_sketch

    _cms = cms_sketch(events, "user_id", depth=4, width=256)
    audit(
        "cms_sketch",
        _cms,
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="count-min state: md5 bucket per hash row + ONE count "
        "aggregate with map-side partial combine — at most depth*width "
        "cells ever shuffle, whatever the key cardinality",
    )
    audit(
        "cms_frequency (point queries)",
        cms_frequency(
            _cms, events.select("user_id").dropDuplicates(), "user_id", depth=4, width=256
        ),
        max_shuffles=3,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="probes fan out depth rows, BROADCAST-join the bounded sketch "
        "(never a shuffle of the sketched table), then one hash aggregate "
        "keyed by probe value — cost scales with the probe set only",
    )

    from okay_spark.dedup import winnow_fingerprints, winnow_shared_pairs

    audit(
        "winnow_fingerprints",
        winnow_fingerprints(docs),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        note="MOSS fingerprints: split -> gram md5s -> window mins ->"
        " distinct -> explode, all row-local — shuffle-free at any scale,"
        " like the battery",
    )
    audit(
        "winnow_shared_pairs",
        winnow_shared_pairs(docs, min_shared=2),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="substring-overlap pairs: df-capped posting lists (boilerplate"
        " fingerprints dropped observably), in-posting expansion bounded at"
        " df^2, pair-count aggregate — the ngram_jaccard_pairs shape",
    )

    from okay_spark.salt import key_skew_stats

    audit(
        "key_skew_stats (skew profiler)",
        key_skew_stats(events, "user_id", target_rows_per_task=200, top_n=20),
        max_shuffles=3,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="skew profiling never suffers the skew it measures: the count "
        "partial-combines map-side (a hot key collapses to one row per "
        "task before the exchange), then a top-N over the key-count "
        "frame — the data-driven trigger for the salted strategies",
    )

    # round-5 operators
    from okay_spark.state import snapshot_diff
    from okay_spark.checks import functional_dependency_violations, iqr_outliers
    from okay_spark.relops import grouped_cume_dist

    docs_new = docs.filter(F.col("doc_id") % 3 != 0)
    audit(
        "snapshot_diff",
        snapshot_diff(docs, docs_new, "doc_id"),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="row-level churn between snapshots: each side reduces to "
        "(key, 16-byte md5) IN THE SCAN, then one full-outer equi-join on "
        "the key — no row content ever shuffles, output proportional to "
        "churn; AQE sizes/broadcasts the join",
    )
    audit(
        "functional_dependency_violations",
        functional_dependency_violations(docs, "source", "lang"),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list", "collect_set"],
        note="two scalar-only hash aggregates (pair counts, then "
        "sum/count/min/max per determinant) — both partial-combine "
        "map-side, a hot determinant never concentrates; no value list "
        "ever materializes",
    )
    audit(
        "iqr_outliers (flagging scan)",
        iqr_outliers(events, "value", id_cols=["event_id"]),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange", "CartesianProduct"],
        note="Tukey fences come from the bounded two-pass exact-quantile "
        "jobs at build time (two doubles to the driver); the audited "
        "flagging pass is a pure codegen filter scan — zero joins, zero "
        "exchanges, trivially scan-parallel",
    )
    audit(
        "grouped_cume_dist",
        grouped_cume_dist(docs, "n_chars", "lang"),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="rows collapse to (group, value) COUNTS before the ordered "
        "window, so window state is bounded by value cardinality, not "
        "rows — the exact-percentile primitive for per-group tail "
        "filtering; cume is one bigint/bigint IEEE division",
    )

    # late round-5 operators
    from okay_spark.checks import js_divergence_frame, mad_outliers
    from okay_spark.dedup import semantic_duplicates
    from okay_spark.textops import url_domain_stats

    audit(
        "mad_outliers (flagging scan)",
        mad_outliers(events, "value", id_cols=["event_id"]),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "Exchange", "CartesianProduct"],
        note="median and MAD come from two bounded two-pass exact-quantile "
        "jobs at build time (two doubles to the driver); the audited "
        "flagging pass is a pure codegen filter scan — zero joins, zero "
        "exchanges, trivially scan-parallel",
    )
    audit(
        "js_divergence_frame",
        js_divergence_frame(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
            "source",
        ),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="the categorical-PSI plan with the JS term: ONE keyed "
        "aggregate over a tagged union (map-side partial combine), totals "
        "broadcast back, decimal(38,18) term sum — nothing proportional "
        "to category cardinality reaches the driver",
    )
    audit(
        "url_domain_stats",
        url_domain_stats(
            docs.select(
                "doc_id",
                F.concat(F.col("text"), F.lit(" https://cdn.example.org/x")).alias("text"),
            )
        ),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list", "collect_set"],
        note="codegen regexp_extract_all + explode, then the "
        "rare_token_stats two-level scalar-aggregate discipline: (domain, "
        "doc) pairs pre-aggregate map-side, so a flooded domain costs one "
        "scalar row per distinct doc — never a posting list",
    )
    emb_audit = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    audit(
        "semantic_duplicates (pair stage)",
        semantic_duplicates(emb_audit, n_lists=4, iters=1, threshold=0.999),
        max_shuffles=4,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="SemDeDup: k-means is broadcast+hash-aggregate scans (audited "
        "via ivf_topk); the audited stage self-joins the checkpointed "
        "assignment on list_id, so pair work is sum of cluster-size^2 — "
        "bounded by n_lists sizing and the max_cluster_size anti-join cap; "
        "keeper pick is a window over surviving pairs only",
    )

    from okay_spark.checks import benford_first_digit
    from okay_spark.textops import unigram_logprob_score, zipf_fit

    audit(
        "benford_first_digit",
        benford_first_digit(events, "value"),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="one hash aggregate with map-side combine down to <= 9 digit "
        "groups (the only designed exchange), broadcast-joined to a "
        "literal 9-row digit frame; total and chi2 re-derive from the "
        "aggregated counts and broadcast back — never df.count(), nothing "
        "data-proportional reaches the driver",
    )
    audit(
        "zipf_fit",
        zipf_fit(docs, top_n=200),
        max_shuffles=3,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="(doc, token) counts then token totals (two scalar "
        "aggregates, both partial-combine); the top-N cut is "
        "TakeOrderedAndProject — per-task top N merged at the driver, "
        "never a global sort; the regression moments then run over "
        "<= top_n rows in decimal(38,12)",
    )
    audit(
        "unigram_logprob_score",
        unigram_logprob_score(docs),
        max_shuffles=3,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="the rare_token_stats shape with an occurrence-frequency "
        "model: (doc, token) counts map-side, vocabulary totals as a "
        "second scalar aggregate, corpus total re-derived from the "
        "vocabulary frame and broadcast back (one input scan); the "
        "per-document term sum is decimal(38,12)",
    )

    from okay_spark.balance import mixture_weights
    from okay_spark.textops import dsir_logratio, quality_buckets

    audit(
        "mixture_weights",
        mixture_weights(docs, "source", alpha=0.5, budget_tokens=10_000_000),
        max_shuffles=3,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE hash aggregate over the fact table down to #groups rows "
        "(map-side combine), lazily localCheckpoint-ed; token total and the "
        "decimal(38,12) weight denominator re-derive from that frame as "
        "single-row aggregates broadcast back — the corpus is scanned once "
        "and everything past the aggregate is O(#groups)",
    )
    audit(
        "dsir_logratio",
        dsir_logratio(docs, F.col("lang") == "en"),
        max_shuffles=3,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="the unigram_logprob_score shape with TWO models from one "
        "vocabulary pass (tf_raw + conditional tf_target in the same "
        "aggregate — the target LM costs no extra scan or shuffle); totals "
        "and vocab size broadcast back; per-doc term sum in decimal(38,12)",
    )
    audit(
        "quality_buckets",
        quality_buckets(docs),
        max_shuffles=6,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="unigram scoring (3 designed shuffles) feeds a per-(lang, "
        "score) COUNTS aggregate and a window over distinct scores only "
        "(the grouped_cume_dist bound — never a raw-row sort); the scored "
        "frame is lazily localCheckpoint-ed so the corpus tokenizes once "
        "for both the threshold build and the probe side; buckets return "
        "via a broadcast-able (lang, score) equi-join",
    )

    from okay_spark.balance import concentration_stats
    from okay_spark.checks import group_staleness, k_anonymity_violations
    from okay_spark.textops import boilerplate_lines, pmi_collocations

    audit(
        "pmi_collocations",
        pmi_collocations(docs, min_count=5, top_n=50),
        max_shuffles=6,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="pairs via row-local zip-with-tail (no shuffle to pair up); "
        "bigram and unigram hash aggregates are vocabulary-bounded with "
        "map-side combine, both lazily localCheckpoint-ed (each feeds its "
        "total AND the candidate join — one evaluation); the two unigram "
        "joins have one-row-per-token build sides (AQE skew-splittable); "
        "the top-50 cut is TakeOrderedAndProject, never a global sort",
    )
    lined = docs.select(
        "doc_id",
        "source",
        F.regexp_replace(F.col("text"), r"((?:\S+ ){7}\S+) ", "$1\n").alias("text"),
    )
    audit(
        "boilerplate_lines",
        boilerplate_lines(lined, group_col="source", min_docs=2),
        max_shuffles=4,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="two-phase count_distinct throughout (the drop_duplicate_lines "
        "discipline): distinct (source, line, doc) tuples collapse map-side "
        "before any reducer sees a flooded line; group doc totals are one "
        "row per group joined back broadcast — never a posting list",
    )
    audit(
        "k_anonymity",
        k_anonymity_violations(
            events.withColumn("day", F.to_date("ts")),
            ["user_id", "event_type", "day"],
            k=3,
        ),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE map-side-combinable hash aggregate + a codegen filter; "
        "output bounded by the number of sub-k groups",
    )
    audit(
        "group_staleness",
        group_staleness(events, "ts", "event_type"),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE hash aggregate down to #groups rows (lazily "
        "localCheckpoint-ed); the global max re-derives from that frame as "
        "a single-row aggregate broadcast back — the fact table is scanned "
        "once; lag is the exact-integer microsecond diff over 1e6",
    )
    from okay_spark.checks import mutual_information

    audit(
        "mutual_information",
        mutual_information(docs, "lang", "source"),
        max_shuffles=4,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE corpus aggregate down to the joint (x, y) cardinality "
        "(map-side combine, lazily localCheckpoint-ed); marginals, total, "
        "and all three decimal(38,12) entropy sums re-aggregate that "
        "bounded frame — the fact table is scanned once and everything "
        "after is O(|X x Y|)",
    )
    from okay_spark.checks import chi2_independence

    audit(
        "chi2_independence",
        chi2_independence(docs, "lang", "source"),
        max_shuffles=6,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE corpus aggregate down to the joint (x, y) cardinality "
        "(map-side combine, lazily localCheckpoint-ed); the contingency "
        "grid is the cross join of the two bounded marginal frames with "
        "the joint counts broadcast back — the fact table is scanned once "
        "and everything after is O(|X x Y|)",
    )
    from okay_spark.relops import transition_stats

    audit(
        "transition_stats",
        transition_stats(events),
        max_shuffles=3,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE hash shuffle on the group for the lag window (offset "
        "frame, per-group sort bounded by the group's event count), then a "
        "hash aggregate down to the |states|^2 transition frame (lazily "
        "localCheckpoint-ed); per-from totals re-aggregate that bounded "
        "frame and broadcast back — the event table is scanned once",
    )
    from okay_spark.relops import cohort_retention

    audit(
        "cohort_retention",
        cohort_retention(events),
        max_shuffles=5,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="per-user first-event aggregate is the ONE fact-table "
        "shuffle; the cohort joins back user-to-user co-partitioned; the "
        "distinct pre-pass + final count are a two-phase exact distinct "
        "over frames bounded by #users x #active-weeks — per-key state "
        "everywhere is bounded by one user's event count",
    )
    from okay_spark.relops import funnel_conversion

    audit(
        "funnel_conversion",
        funnel_conversion(events, ["view", "click", "purchase"]),
        max_shuffles=8,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="the fact table is projected/filtered to the funnel's event "
        "types ONCE (lazily localCheckpoint-ed; each step re-reads that "
        "frame); chaining joins are user-to-user between per-user frames "
        "with per-key state bounded by one user's event count; the k step "
        "counts are single-row aggregates unioned into a k-row result",
    )
    audit(
        "concentration_stats",
        concentration_stats(docs, "lang"),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="one corpus aggregate down to #groups rows; the Gini rank "
        "window, HHI decimal(38,12) accumulation, and totals all run over "
        "that bounded frame (the window sorts #groups rows via a single-"
        "partition exchange, not hashpartitioning — never the fact table)",
    )

    from okay_spark.dedup import corpus_group_jaccard, dedup_curve, duplicated_ngram_ratio

    audit(
        "corpus_group_jaccard",
        corpus_group_jaccard(docs, "lang"),
        max_shuffles=5,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="the (group, shingle) DISTINCT is the one corpus-width "
        "shuffle (localCheckpoint-ed — shingling runs once, feeding the "
        "size aggregate and both intersection sides); intersection is an "
        "equi-join on the shingle with per-key fan-out bounded by the "
        "group count; group sizes broadcast back (#groups rows)",
    )
    audit(
        "duplicated_ngram_ratio",
        duplicated_ngram_ratio(docs),
        max_shuffles=7,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="per-doc-distinct (doc, gram) frame localCheckpoint-ed once; "
        "the per-gram count IS the doc frequency (scalar aggregate, no "
        "posting list); the frequency joins back 1:1 by gram (AQE "
        "skew-split covers boilerplate grams); short docs re-enter via an "
        "id-distinct left join",
    )
    audit(
        "dedup_curve",
        dedup_curve(docs),
        max_shuffles=7,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="integer bucket arithmetic off one bounded min/max collect; "
        "per-bucket doc counts and min(bucket)-per-text first occurrences "
        "are map-side-combinable aggregates (the text groupBy is the same "
        "width as exact dedup itself); cumulative window runs over "
        "<= buckets rows",
    )
    from okay_spark.textops import heaps_fit, log_odds_tokens

    audit(
        "log_odds_tokens",
        log_odds_tokens(docs, "lang", target="en"),
        max_shuffles=3,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE vocabulary-bounded token aggregate (localCheckpoint-ed; "
        "the corpus tokenizes once), totals re-aggregate that bounded "
        "frame and broadcast back; the cut is TakeOrderedAndProject — "
        "per-task top-N, never a global sort",
    )
    audit(
        "heaps_fit",
        heaps_fit(docs),
        max_shuffles=8,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="one (doc, token) hash aggregate localCheckpoint-ed (corpus "
        "tokenizes once), two bucket-bounded aggregates (first occurrence "
        "= min(bucket), never a posting list), cumulative window + "
        "decimal regression moments over <= 32 rows; collect_list absent "
        "by construction, min/max collect bounded at 2 values",
    )
    from okay_spark.checks import binary_filter_eval
    from okay_spark.textops import language_id

    audit(
        "binary_filter_eval",
        binary_filter_eval(
            language_id(docs),
            F.col("lang_pred") == F.lit("en"),
            F.col("lang") == F.lit("en"),
        ),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE map-side-combinable scalar aggregate — four conditional "
        "counts reduced to a single row (SinglePartition exchange only); "
        "all metrics are row-local expressions over the four counts",
    )
    from okay_spark.checks import ewma_anomalies

    audit(
        "ewma_anomalies",
        ewma_anomalies(events),
        max_shuffles=3,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="one (group, day) count aggregate, then one collect_list per "
        "group bounded by CALENDAR DAYS (a control chart's state is "
        "inherently days-per-group); the EWMA prefix folds are row-local "
        "HOF expressions on that bounded array",
    )

    from okay_spark.embedops import centroid_separation

    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    audit(
        "centroid_separation",
        centroid_separation(embeddings),
        max_shuffles=5,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="centroid build is one posexplode + (label, pos) aggregate "
        "(shuffle keys = labels x dim regardless of rows) assembled into "
        "per-label arrays (collect_list bounded by dim); scoring "
        "broadcasts the #labels-row centroid frame, fans each vector out "
        "by #labels, and reduces per vector then per label — the one "
        "corpus-width shuffle is the per-vector reduce",
    )
    from okay_spark.textops import bigram_logprob_score

    audit(
        "bigram_logprob_score",
        bigram_logprob_score(docs),
        max_shuffles=6,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="bigrams pair row-locally (zip_with over shifted slices — no "
        "window); the (doc, bigram) count frame localCheckpoints once and "
        "feeds model + probe; context totals and the successor vocabulary "
        "are bounded re-aggregates of the model frame; probe joins have "
        "one build row per key (AQE skew-split covers stopword contexts)",
    )

    from okay_spark.textops import gopher_quality_flags

    audit(
        "gopher_quality_flags",
        gopher_quality_flags(docs, min_words=20),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "collect_list", "Exchange"],
        note="the Gopher keep/drop bundle as ONE row-local projection — "
        "exact integer counts + one IEEE division per ratio inside "
        "whole-stage codegen; zero exchanges of any kind (the "
        "rule-battery discipline applied to text quality)",
    )
    from okay_spark.checks import mann_kendall_trend

    audit(
        "mann_kendall_trend",
        mann_kendall_trend(events),
        max_shuffles=5,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="one (group, day) count aggregate bounds everything after "
        "to calendar-day cardinality (localCheckpoint-ed once, feeding "
        "the pair join, the day counts, and the tie terms); the S "
        "comparison is a self-equi-join on the group over that bounded "
        "frame — days^2/2 row-local comparisons, never fact-table state",
    )

    from okay_spark.checks import grouped_exact_quantiles

    audit(
        "grouped_exact_quantiles",
        grouped_exact_quantiles(events, "event_type", "value"),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="one (group, value) count aggregate bounds all downstream "
        "state by per-group distinct-value cardinality (the "
        "grouped_cume_dist discipline — the window sorts COUNTS, never "
        "rows); totals come from a same-partition window, the permille "
        "fan-out is a bounded literal explode, selection is pure integer "
        "arithmetic",
    )
    from okay_spark.checks import classification_eval

    audit(
        "classification_eval",
        classification_eval(
            language_id(docs), F.col("lang_pred"), F.col("lang")
        ),
        max_shuffles=4,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE (pred, label) hash aggregate bounds everything by "
        "|classes|^2 (localCheckpoint-ed — the input is scanned once); "
        "marginals, diagonal, and the class union are re-aggregates/"
        "joins of that bounded frame",
    )

    from okay_spark.relops import cooccurrence_lift

    audit(
        "cooccurrence_lift",
        cooccurrence_lift(events),
        max_shuffles=5,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="the DISTINCT (entity, item) basket frame is the one "
        "corpus-width aggregate (localCheckpoint-ed — it feeds both pair "
        "sides, the marginals, and the entity total); the pair join's "
        "per-entity fan-out is bounded by the item vocabulary; marginals "
        "and the total broadcast back",
    )
    from okay_spark.embedops import embedding_dim_stats

    audit(
        "embedding_dim_stats",
        embedding_dim_stats(embeddings),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="one posexplode + pos-keyed hash aggregate — shuffle-key "
        "cardinality = dim regardless of row count, map-side combined; "
        "decimal(38,12) moments, no collect/window/join",
    )

    from okay_spark.textops import benchmark_coverage

    audit(
        "benchmark_coverage",
        benchmark_coverage(
            docs.filter(F.col("source") != "src5"),
            docs.filter(F.col("source") == "src5"),
        ),
        max_shuffles=4,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="both sides reduce to DISTINCT shingle sets before the "
        "left-semi membership join (vocabulary-bounded build sides — the "
        "corpus row count never reaches the join), then two scalar "
        "counts; no posting lists, no collect",
    )

    from okay_spark.checks import cohens_kappa, roc_auc

    audit(
        "roc_auc",
        roc_auc(docs, F.col("n_chars"), F.col("lang") == F.lit("en")),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="one (score) count aggregate bounds all downstream state by "
        "distinct-score cardinality (the grouped-quantiles discipline — "
        "the cumulative window sorts COUNTS, never rows), then one "
        "scalar reduce; 2*ranksum is exact bigint, AUC one division",
    )
    audit(
        "cohens_kappa",
        cohens_kappa(
            language_id(docs), F.col("lang_pred"), F.col("lang")
        ),
        max_shuffles=4,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE (pred, label) hash aggregate bounds everything by "
        "|classes|^2 (localCheckpoint-ed — input scanned once); the "
        "expected-agreement term is a |classes|-row join of marginals; "
        "kappa = (n*agree - pe_num)/(n^2 - pe_num) in exact bigints",
    )
    from okay_spark.checks import calibration_bins, spearman_corr
    from okay_spark.textops import STOPWORDS, _stop_hits, tokens as _tokens

    _toks = _tokens("text")
    _hits = {lang: _stop_hits(_toks, lang) for lang in STOPWORDS}
    _tot = _hits["en"] + _hits["fr"] + _hits["de"] + _hits["es"]
    audit(
        "calibration_bins",
        calibration_bins(
            docs,
            _hits["en"].cast("double") / F.greatest(_tot, F.lit(1)).cast("double"),
            F.col("lang") == F.lit("en"),
        ),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE hash aggregate keyed on the bin index — at most `bins` "
        "groups, fully map-side combined; decimal(38,12) moment sums; "
        "no window, no join, no collect",
    )
    audit(
        "spearman_corr",
        spearman_corr(
            docs,
            F.col("n_chars"),
            F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).cast(
                "bigint"
            ),
        ),
        max_shuffles=5,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="base projection localCheckpoints once (input scanned once); "
        "each average-rank frame is bounded by its column's distinct-value "
        "cardinality (the cumulative window sorts COUNTS, never rows); "
        "rank join-backs have one build row per key; then one scalar "
        "reduce with exact integer/decimal moments",
    )
    from okay_spark.relops import coverage_gaps
    from okay_spark.textops import ngram_diversity

    audit(
        "coverage_gaps",
        coverage_gaps(events, "ts", "user_id"),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="one DISTINCT (group, day) aggregate bounds the lag window "
        "by active-day cardinality (groups x calendar days, never row "
        "count); integer date arithmetic only; no join, no collect",
    )
    audit(
        "ngram_diversity",
        ngram_diversity(docs),
        max_shuffles=7,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="the (group, tokens) projection localCheckpoints once (the "
        "corpus tokenizes once, feeding totals + both explodes); distinct "
        "gram counts are Spark's two-phase count_distinct — never a "
        "posting list; final assembly joins three group-bounded frames",
    )
    from okay_spark.checks import gini_inequality
    from okay_spark.textops import readability_stats

    audit(
        "gini_inequality",
        gini_inequality(docs, "source", "n_chars"),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="one (group, value) count aggregate bounds everything by "
        "per-group distinct-value cardinality (the cumulative window "
        "sorts COUNTS, never rows); the sorted-rank identity is exact "
        "bigint per block, decimal(38,0) summed; no join, no collect",
    )
    audit(
        "readability_stats",
        readability_stats(docs),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="entirely row-local integer counts + fixed IEEE Flesch "
        "formula, then ONE map-side-combined hash aggregate on the "
        "group key; no window, no join, no Python",
    )
    from okay_spark.embedops import embedding_outliers

    audit(
        "embedding_outliers",
        embedding_outliers(embeddings, z_threshold=2.0),
        max_shuffles=4,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="centroid build = one posexplode + (label, pos) aggregate "
        "(collect_list bounded by dim); the scored frame joins the "
        "broadcast #labels-row centroid frame once and localCheckpoints "
        "(feeds moments + final projection); per-label moments broadcast "
        "back — no posting lists, no global sort",
    )
    from okay_spark.checks import autocorrelation_daily
    from okay_spark.relops import burstiness

    audit(
        "autocorrelation_daily",
        autocorrelation_daily(events),
        max_shuffles=4,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="one (group, day) count aggregate bounds everything by "
        "calendar-day cardinality (localCheckpoint-ed once, feeding both "
        "join sides); the lag pairing is a self-equi-join on (group, "
        "day+k) over that bounded frame; no window over raw rows",
    )
    audit(
        "burstiness",
        burstiness(events),
        max_shuffles=2,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="one lag window partitioned by the group key (the "
        "sessionize shuffle) then one map-side-combined aggregate per "
        "group; gaps are exact integer microseconds, moments "
        "decimal(38,12); no join, no collect",
    )
    from okay_spark.checks import wasserstein_exact

    audit(
        "wasserstein_exact",
        wasserstein_exact(events, "value", "event_type", "click", "purchase"),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="one (value) count aggregate bounds all downstream state by "
        "merged support cardinality (the roc_auc discipline — cumulative/"
        "lead windows sort COUNTS, never rows); CDF gaps are integer "
        "numerators over a constant denominator; then one scalar reduce",
    )
    from okay_spark.checks import kendall_tau_b, proportion_ztest

    audit(
        "proportion_ztest",
        proportion_ztest(
            events, "event_type", "click", "view", F.col("value") > F.lit(50.0)
        ),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE map-side-combinable scalar aggregate (four conditional "
        "counts, SinglePartition reduce only); rates and z are row-local "
        "expressions over the counts",
    )
    audit(
        "kendall_tau_b",
        kendall_tau_b(
            events.filter(F.col("ts").isNotNull()),
            F.hour("ts"),
            F.floor(F.col("value") / F.lit(20.0)).cast("bigint"),
        ),
        max_shuffles=6,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE (x, y) contingency aggregate bounds everything by "
        "|x|*|y| cells (localCheckpoint-ed — input scanned once); the "
        "concordance pass is a cells^2/2 self-join over that bounded "
        "grid (the mann_kendall discipline); tie terms re-aggregate "
        "marginals of the same frame",
    )
    from okay_spark.relops import km_survival

    audit(
        "km_survival",
        km_survival(events),
        max_shuffles=6,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="durations from two per-user min-aggregates + a bounded "
        "min-join (one row per converting user); everything after is "
        "bounded by DISTINCT DURATION cardinality — per-duration "
        "counts, one descending window over counts, one collect_list "
        "bounded by calendar days, row-local prefix folds (the EWMA "
        "discipline)",
    )
    from okay_spark.balance import effective_sample_size
    from okay_spark.textops import quality_score

    audit(
        "effective_sample_size",
        effective_sample_size(quality_score(docs), F.col("quality"), "lang"),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE map-side-combined hash aggregate on the group key — "
        "two decimal(38,12) moment sums and a count; ESS/ratio are "
        "row-local divisions; no window, no join, no collect",
    )
    from okay_spark.checks import wilson_interval

    audit(
        "wilson_interval",
        wilson_interval(events, "event_type", F.col("value") > F.lit(50.0)),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE map-side-combined hash aggregate on the group key; "
        "the score bounds are row-local fixed IEEE expressions over "
        "(n, k); no window, no join, no collect",
    )
    from okay_spark.similarity import ann_recall

    q0 = [
        float(x)
        for x in embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    audit(
        "ann_recall",
        ann_recall(embeddings, q0, k=10, n_lists=16, n_probe=4, iters=1),
        max_shuffles=8,
        forbid=["BatchEvalPython", "CartesianProduct"],
        note="offline index audit: the two rankings are the existing "
        "ivf_topk (scans n_probe/n_lists via the data-shipped centroid "
        "assignment) and brute_force_topk (one full scan) unchanged; "
        "the intersection is a k-row broadcast left-semi and one "
        "scalar count (TakeOrderedAndProject on both rankings, never "
        "a global sort)",
    )
    from okay_spark.checks import welch_ttest

    audit(
        "welch_ttest",
        welch_ttest(events, "event_type", "click", "purchase", F.col("value")),
        max_shuffles=0,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE map-side-combinable scalar aggregate (six conditional "
        "decimal(38,12) sums, SinglePartition reduce only); t and the "
        "Welch-Satterthwaite df are row-local expressions",
    )
    from okay_spark.checks import jarque_bera

    audit(
        "jarque_bera",
        jarque_bera(events, F.col("value"), "event_type"),
        max_shuffles=1,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="ONE map-side-combined hash aggregate (four decimal(38,12) "
        "power sums + count); central moments, skewness/kurtosis, and "
        "JB are row-local fixed expressions; no window, no join",
    )
    from okay_spark.checks import cusum_anomalies, theil_sen_slope

    audit(
        "cusum_anomalies",
        cusum_anomalies(events),
        max_shuffles=3,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
        note="one (group, day) count aggregate, one collect_list per "
        "group bounded by CALENDAR DAYS, prefix max/plus folds O(days^2) "
        "row-local after the explode — the exact ewma_anomalies budget",
    )
    audit(
        "theil_sen_slope",
        theil_sen_slope(events),
        max_shuffles=6,
        forbid=["BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "collect_list"],
        note="day-bounded pair self-join over the localCheckpoint-ed "
        "daily frame (days^2/2 slopes per group — the mann_kendall "
        "budget); median selection is integer arithmetic over slope "
        "COUNTS (the grouped-quantiles discipline)",
    )

    bad = [c for c in CHECKS if c["problems"]]
    write_scale_md()
    print(f"\n{len(CHECKS)-len(bad)}/{len(CHECKS)} plans OK -> SCALE.md")
    sys.exit(1 if bad else 0)


def write_scale_md() -> None:
    lines = [
        "# SCALE.md — physical-plan audit (would this survive 1000 executors?)",
        "",
        "Generated by `python scripts/plan_audit.py` from the *executed* plans at",
        f"`{SF_DIR}` on local[8]. Shuffle budget = the number of exchanges the",
        "operator needs *by design*; exceeding it means an accidental shuffle",
        "crept in. Python eval operators are forbidden outside the explicitly",
        "Arrow-batched surfaces (`custom` rules, multimodal kernels).",
        "",
        "| operator | shuffles (budget) | codegen spans | status |",
        "|---|---|---|---|",
    ]
    for c in CHECKS:
        status = "OK" if not c["problems"] else "**" + "; ".join(c["problems"]) + "**"
        lines.append(
            f"| {c['name']} | {c['shuffles']} ({c['budget']}) | {c['codegen_spans']} | {status} |"
        )
    lines.append("")
    lines.append("## Notes per operator")
    lines.append("")
    for c in CHECKS:
        lines.append(f"- **{c['name']}** — {c['note']}")
        for s in c["scans"]:
            lines.append(f"  - scan: `{s[:160]}`")
    lines.append("")
    lines.append(
        "Scaling argument: the rule battery (the 10^12-row pass) is shuffle-free —\n"
        "cost is exactly one scan + one codegen'd projection per partition, so\n"
        "throughput scales with executors until the storage layer saturates. The\n"
        "shuffle-bearing checks exchange only keys/aggregates (uniqueness: partial\n"
        "counts; drift: 20-row histograms; referential: nothing from the fact side\n"
        "when broadcast, salted otherwise), and every skew-exposed stage has a\n"
        "deterministic salting path (`okay_spark.salt`).\n\n"
        "Measured floor for the one intentional Python surface: an undeclared\n"
        "`custom` rule must ship the full value as plain Python dicts (reference\n"
        "contract). pyarrow's C-level `to_pylist` alone costs ~55us/doc\n"
        "single-thread on the 6M-doc interleaved fixture (callable: ~2.6us/doc),\n"
        "so the undeclared path's bench time IS the dict-materialization floor,\n"
        "not engine overhead; the engineered escape is the declared read-set\n"
        "(`arrow_fields=[...]`), which prunes struct fields before the Arrow\n"
        "crossing and halves the measured cost (bench: battery_custom_pruned vs\n"
        "battery_custom_arrow). Round 3 replaced the pruning projection with a\n"
        "struct-of-plain-arrays ship format after measurement showed the\n"
        "null-guarded transform rebuild ate the savings — see\n"
        "`BENCH/ARROW_FIELDS.md` for the component numbers.\n\n"
        "Exact quantiles at scale: `exact_quantiles` (full-sort `percentile`\n"
        "aggregate — every distinct value of a column lands on one reducer) is\n"
        "FIXTURE-SCALE-ONLY, like `q_embedding_pairs_exact`. The 10^12-row path\n"
        "is `exact_quantiles_twopass`: approx_percentile sketch brackets (rank\n"
        "error <= n/accuracy, mergeable, executor-bounded), one scalar\n"
        "conditional-count aggregate, then value-level counts ONLY inside the\n"
        "brackets — bounded at ~6n/accuracy candidate rows per (col, p) BEFORE\n"
        "value dedup (n=10^12, accuracy=10^5 -> <=6x10^7 candidate rows, one\n"
        "small range-sorted window per tag) — interpolating exactly; bit-equal\n"
        "to percentile_cont (pytest + DuckDB quantile_cont driver oracle,\n"
        "`quantiles_twopass_lineitem`).\n\n"
        "Companion evidence:\n\n"
        "- `BENCH/SKEW.md` — max-reducer-share measurement showing the salted\n"
        "  referential join caps the hottest reducer at ~1/buckets of the rows\n"
        "  where the unsalted plan pins a 70%-hot key on one task (and why AQE's\n"
        "  skew-join does not cover this left-anti shape);\n"
        "- `BENCH/BASELINE.md` — two-parallelism scaling efficiency of the battery\n"
        "  (north-rule criterion);\n"
        "- `tests/test_bucketed.py` — write-once bucketing makes keyed uniqueness\n"
        "  and co-bucketed joins fully exchange-free on every later run;\n"
        "- `tests/test_plan_shapes.py` — these invariants enforced in CI."
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
