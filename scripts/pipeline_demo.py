"""End-to-end training-data pipeline on the okay_spark engine.

One command composes the full surface a reference-okay user gains by
switching: schema validation plus the corpus operators okay never had.

    ingest (JSONL w/ reject capture)  ->  validate + quarantine split
    (clean docs continue; quarantined docs sink with a reasons digest)
    ->  quality gate (expectation suite)
    ->  corpus profiles (shuffle-key skew, source concentration,
    lang~source association, source-overlap Jaccard matrix, lang-ID
    filter calibration, dedup curve + Heaps' vocabulary growth)
    ->  exact + near dedup
    (SimHash -> connected components -> canonical keep)
    ->  corpus line-dedup (cross-doc boilerplate lines removed in place)
    ->  duplicated-span strip (cross-doc token n-grams removed in place)
    ->  quality / repetition / rare-token / unigram-LM filters
    ->  benchmark decontamination
    (n-gram overlap + whole-document cross-corpus minhash)
    ->  per-domain cap  ->  PII scan + redact  ->  chunk -> pack (sequence
    token budget)  ->  resample to target language mix -> per-language
    corpus token budget -> splits
    ->  parquet sinks per stage + one summary line per stage

Run: python scripts/pipeline_demo.py [--sf-dir /root/testdata/sf0.01]
     [--out /tmp/okay_pipeline]
Executed as a test by tests/test_pipeline_demo.py (stage invariants).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pipeline(spark, sf_dir: str, out: str) -> dict:
    from pyspark.sql import functions as F

    from okay_spark import ignore_extra_fields, required
    from okay_spark.dedup import dedup_clusters, simhash_near_duplicates
    from okay_spark.engine import validate_dataframe
    from okay_spark.expectations import Expectations
    from okay_spark.sampling import split_column
    from okay_spark.textops import (
        chunk_documents,
        ngram_contamination,
        pack_chunks,
        pii_redact,
        pii_scan,
        quality_score,
        repetition_stats,
    )

    stats: dict[str, int] = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats["ingested"] = docs.count()

    # 1. schema validation: violations to a sink; documents with violations
    #    are quarantined, the rest continue
    def doc_schema():
        required("doc_id", type="int", min=0)
        required("text", type="string", min=20)
        required("lang", type="string", options=["en", "fr", "de"])
        ignore_extra_fields()

    violations = validate_dataframe(docs, doc_schema, id_cols=["doc_id"])
    violations.write.mode("overwrite").parquet(f"{out}/violations")
    from okay_spark.engine import quarantine

    clean, quarantined = quarantine(docs, doc_schema, id_cols=["doc_id"])
    quarantined.write.mode("overwrite").parquet(f"{out}/quarantined")
    stats["validated"] = clean.count()

    # corpus-cardinality sanity: the deterministic HLL estimate must agree
    # with the exact count within sketch error (p=9 ~ 4.6% standard error)
    from okay_spark.checks import hll_estimate, hll_sketch

    est = hll_estimate(hll_sketch(clean, "doc_id", p=9), p=9)
    stats["hll_doc_id_estimate"] = int(est)

    # 2. table-level quality gate (fails loudly if the corpus is off)
    report = (
        Expectations()
        .expect_row_count_between(1)
        .expect_non_null("text")
        .expect_unique("doc_id")
        .run(clean)
    )
    report.write.mode("overwrite").parquet(f"{out}/quality_report")
    gate_failures = [r["check"] for r in report.collect() if not r["passed"]]
    stats["gate_failures"] = len(gate_failures)

    # 2b. shuffle-key skew profile BEFORE the dedup/cap shuffles: the
    #     measurement that decides whether the salted strategies engage
    #     downstream (suggested_salt == 1 everywhere -> plain shuffles are
    #     safe; > 1 -> feed it into salt_buckets / partition_salt). The
    #     profile itself never suffers the skew it measures (map-side
    #     partial combine) and reads the input once (single-scan share).
    from okay_spark.salt import key_skew_stats

    skew = key_skew_stats(clean, "source", target_rows_per_task=1_000_000, top_n=20)
    skew.write.mode("overwrite").parquet(f"{out}/key_skew")
    stats["max_suggested_salt"] = int(
        skew.agg(F.max("suggested_salt")).first()[0] or 1
    )

    # 2b'. corpus-mix concentration profile: one row of Gini/HHI/top-share
    #      over the source distribution — read together with the skew
    #      profile, it is the "do we need rebalancing at all?" number the
    #      domain-cap and resample stages downstream act on
    from okay_spark.balance import concentration_stats

    conc = concentration_stats(clean, "source").first()
    stats["source_gini_millis"] = int(round((conc["gini"] or 0.0) * 1000))

    # 2b''. association profile between the two stratification keys: if
    #       lang ~ determines source (high nmi / V), stratifying on both is
    #       redundant and the pair is ONE quasi-identifier for the
    #       k-anonymity stage downstream, not two
    from okay_spark.checks import chi2_independence, mutual_information

    assoc = mutual_information(clean, "lang", "source").first()
    stats["lang_source_nmi_millis"] = int(round((assoc["nmi"] or 0.0) * 1000))
    chi = chi2_independence(clean, "lang", "source").first()
    stats["lang_source_v_millis"] = int(round((chi["cramers_v"] or 0.0) * 1000))

    # 2b'''. source-overlap matrix: pairwise shingle-set Jaccard between
    #        sources — a high pair means one source is mostly redundant
    #        with another, the signal read together with the domain cap
    #        (stage 5b); reported, not acted on automatically
    from okay_spark.dedup import corpus_group_jaccard

    overlap = corpus_group_jaccard(clean, "source")
    overlap.write.mode("overwrite").parquet(f"{out}/source_overlap")
    max_overlap = overlap.agg(F.max("jaccard")).first()[0]
    stats["max_source_jaccard_millis"] = int(round((max_overlap or 0.0) * 1000))

    # 2b''''. cheap-filter calibration: before TRUSTING the stopword
    #         language-ID anywhere downstream, measure it against the gold
    #         lang column (Matthews correlation; a near-zero MCC says the
    #         heuristic is uninformative on this corpus and lang-based
    #         routing must use the gold column)
    from okay_spark.checks import binary_filter_eval
    from okay_spark.textops import language_id

    cal = binary_filter_eval(
        language_id(clean),
        F.col("lang_pred") == F.lit("en"),
        F.col("lang") == F.lit("en"),
    ).first()
    stats["langid_mcc_millis"] = int(round((cal["mcc"] or 0.0) * 1000))

    # 2c. catalog referential check (bloom-pruned): every document's source
    #     must exist in the source catalog. The catalog here is derived
    #     minus one entry so the check has real violations to carry; the
    #     violations are REPORTED to a sink, not dropped — routing is a
    #     policy decision, the engine's job is the exact violation set
    #     (definite misses exit scan-side with zero joins; bloom-positive
    #     keys are exactly confirmed).
    from okay_spark.checks import referential_violations_bloom

    catalog = (
        docs.select(F.col("source").alias("src"))
        .distinct()
        .filter(~F.col("src").endswith("7"))
    )
    cat_viol = referential_violations_bloom(
        clean.select("doc_id", "source"),
        "source",
        catalog,
        "src",
        m_bits=256,
        k=5,
        id_cols=["doc_id"],
    )
    cat_viol.write.mode("overwrite").parquet(f"{out}/catalog_violations")
    stats["catalog_violations"] = cat_viol.count()

    # 2d. dedup curve + vocabulary growth: is dedup worth its shuffle on
    #     this corpus, and is the source still adding novelty? The exact
    #     duplicate rate at the last checkpoint and the Heaps' beta are the
    #     two one-row answers (beta ~ 0 = saturated vocabulary)
    from okay_spark.dedup import dedup_curve
    from okay_spark.textops import heaps_fit

    curve = dedup_curve(clean).orderBy(F.col("bucket").desc()).first()
    stats["final_dup_rate_millis"] = int(round((curve["dup_rate"] or 0.0) * 1000))
    heaps = heaps_fit(clean).first()
    stats["heaps_beta_millis"] = int(round((heaps["beta"] or 0.0) * 1000))

    # 3. near-dedup: SimHash candidates -> connected components -> keep the
    #    canonical doc per cluster
    # the synthetic fixture texts share one small vocabulary, so their
    # SimHash space is dense — a tight hamming radius keeps "near-dup"
    # meaning near-identical here (the oracle queries use radius 7 where the
    # pigeonhole-complete banding proof needs it)
    edges = simhash_near_duplicates(clean, bits=32, band_bits=4, max_hamming=1)
    clusters = dedup_clusters(clean, edges)
    keep = clusters.filter(F.col("is_canonical")).select("doc_id")
    deduped = clean.join(keep, on="doc_id", how="left_semi")
    stats["after_dedup"] = deduped.count()

    # 3a. boilerplate-line profile: the REPORT that justifies the strike
    #     threshold used by the line-dedup right below (how many lines are
    #     shared by >= 2 docs, and within which sources) — profile first,
    #     strike second
    from okay_spark.textops import boilerplate_lines

    boiler = boilerplate_lines(
        deduped.select(
            "doc_id",
            "source",
            F.regexp_replace(F.col("text"), r"((?:\S+ ){7}\S+) ", "$1\n").alias("text"),
        ),
        group_col="source",
        min_docs=2,
    )
    boiler.write.mode("overwrite").parquet(f"{out}/boilerplate_profile")
    stats["boilerplate_lines"] = boiler.count()

    # 3a'. corpus line-dedup: lines (8-word chunks here) shared verbatim by
    #      >= 2 docs are struck from every doc — the cheap coarse pass before
    #      the token-n-gram strip below (one gram per LINE, not per token)
    from okay_spark.dedup import drop_duplicate_lines

    lined = deduped.drop("text").join(
        drop_duplicate_lines(
            deduped.select(
                "doc_id",
                F.regexp_replace(F.col("text"), r"((?:\S+ ){7}\S+) ", "$1\n").alias("text"),
            ),
            min_doc_freq=2,
        )
        .filter(F.col("n_kept") >= 5)
        .select("doc_id", F.regexp_replace("text_dedup", r"\n", " ").alias("text")),
        on="doc_id",
        how="inner",
    ).select(*deduped.columns)
    stats["after_line_dedup"] = lined.count()
    deduped = lined

    # 3b. duplicated-span strip: cross-document boilerplate n-grams are
    #     removed IN PLACE (near-dedup above drops whole documents; this
    #     keeps the document, minus the shared span); docs reduced below a
    #     minimum useful length are dropped
    from okay_spark.dedup import strip_duplicate_spans

    stripped = strip_duplicate_spans(deduped, n=8)
    deduped = (
        deduped.drop("text")
        .join(
            stripped.filter(F.col("n_kept") >= 5).select(
                "doc_id", F.col("text_dedup").alias("text")
            ),
            on="doc_id",
            how="inner",
        )
        .select(*deduped.columns)
    )
    stats["after_span_strip"] = deduped.count()

    # 3c. residual cross-document duplication AFTER the strip passes: the
    #     per-doc duplicated-3-gram ratio (CCNet dup_ngram) averaged over
    #     the corpus — the number that says whether the line/span strikes
    #     actually removed the boilerplate or merely trimmed it
    from okay_spark.dedup import duplicated_ngram_ratio
    from okay_spark.relops import decimal_avg

    residual = duplicated_ngram_ratio(deduped).agg(
        decimal_avg("dup_ratio").alias("m")
    ).first()
    stats["residual_dup_ngram_millis"] = int(round((residual["m"] or 0.0) * 1000))

    # 4. document quality + repetition + rare-token filters (Gopher-style)
    from okay_spark.textops import rare_token_stats

    from okay_spark.textops import unigram_logprob_score

    rep = repetition_stats(deduped, k=2).select("doc_id", "dup_gram_ratio")
    rare = rare_token_stats(deduped, min_df=2).select("doc_id", "rare_ratio")
    # CCNet-style LM filter (unigram model trained on the surviving corpus
    # itself): drop far-below-mode documents — gibberish/code scores well
    # below natural text under the corpus's own token distribution
    lm = unigram_logprob_score(deduped).select("doc_id", "avg_logprob")
    scored = (
        quality_score(deduped)
        .join(rep, on="doc_id")
        .join(rare, on="doc_id")
        .join(lm, on="doc_id")
    )
    filtered = scored.filter(
        (F.col("quality") >= 0.3)
        & (F.col("dup_gram_ratio") <= 0.5)
        & (F.coalesce(F.col("rare_ratio"), F.lit(0.0)) <= 0.9)
        & (F.coalesce(F.col("avg_logprob"), F.lit(0.0)) >= -8.0)
    ).select(*deduped.columns)
    stats["after_quality"] = filtered.count()

    # 4b. Gopher keep/drop bundle as a REPORT: the canonical thresholds
    #     are tuned for web prose, so on this synthetic corpus the pass
    #     rate is a profile number, not a filter — a real pipeline reads
    #     it per source before deciding to enforce
    from okay_spark.textops import gopher_quality_flags

    gopher = gopher_quality_flags(filtered, min_words=20)
    n_pass = gopher.filter(F.col("passes_gopher")).count()
    stats["gopher_pass_millis"] = int(
        round(n_pass * 1000 / max(stats["after_quality"], 1))
    )

    # 4c. filter calibration: before trusting the cheap heuristics as
    #     gates, measure them as CLASSIFIERS. (a) Does the composite
    #     quality score RANK documents the way the Gopher bundle decides
    #     them (threshold-free ROC-AUC)? (b) Is the stopword lang-ID's
    #     agreement with the gold label better than chance (Cohen's
    #     kappa — accuracy alone lies under class imbalance)?
    from okay_spark.checks import cohens_kappa, roc_auc
    from okay_spark.textops import language_id

    auc_row = roc_auc(
        quality_score(filtered)
        .select("doc_id", "quality")
        .join(gopher.select("doc_id", "passes_gopher"), on="doc_id"),
        F.col("quality"),
        F.col("passes_gopher"),
    ).first()
    stats["quality_vs_gopher_auc_millis"] = int(
        round((auc_row["auc"] or 0.0) * 1000)
    )
    kap = cohens_kappa(
        language_id(filtered), F.col("lang_pred"), F.col("lang")
    ).first()
    stats["langid_kappa_millis"] = int(round((kap["kappa"] or 0.0) * 1000))

    # 5. benchmark decontamination: drop docs overlapping the held-out slice
    benchmark = docs.filter(F.col("source") == "src5")
    corpus = filtered.filter(F.col("source") != "src5")

    # 5-pre. domain coverage the OTHER way: does the surviving corpus
    #        still speak the benchmark's language (shared shingle
    #        fraction)? Read together with the contamination scan — high
    #        contamination with LOW coverage means verbatim leakage, high
    #        coverage with low contamination means healthy domain match
    from okay_spark.textops import benchmark_coverage

    cov = benchmark_coverage(corpus, benchmark).first()
    stats["benchmark_coverage_millis"] = int(
        round((cov["coverage"] or 0.0) * 1000)
    )
    contam = ngram_contamination(corpus, benchmark, k=3)
    ok_ids = contam.filter(F.col("contamination") <= 0.8).select("doc_id")
    decontaminated = corpus.join(ok_ids, on="doc_id", how="left_semi")
    stats["after_decontamination"] = decontaminated.count()

    # 5b'. document-level decontamination: whole near-duplicates of benchmark
    #      docs (an n-gram overlap SCORE can under-rank a verbatim benchmark
    #      copy padded with noise; the cross-corpus minhash join catches the
    #      document shape itself)
    from okay_spark.dedup import minhash_cross_duplicates

    doc_hits = minhash_cross_duplicates(decontaminated, benchmark, threshold=0.8)
    decontaminated = decontaminated.join(
        doc_hits.select(F.col("a").alias("doc_id")).distinct(), on="doc_id", how="left_anti"
    )
    stats["after_doc_decontamination"] = decontaminated.count()

    # 5b. per-domain cap: no single source may dominate the corpus
    from okay_spark.balance import cap_per_group

    decontaminated = cap_per_group(
        decontaminated, "source", max_rows=10_000, order_col="doc_id"
    )
    stats["after_domain_cap"] = decontaminated.count()

    # 6. privacy gate: count PII-bearing docs, then redact in place (keeps
    #    the doc, strips the match). The synthetic corpus is PII-free, so
    #    this passes through unchanged here — the scan and redaction still
    #    execute; planted-PII behavior is pinned in tests/test_pii.py
    pii = pii_scan(decontaminated)
    stats["pii_docs_redacted"] = pii.filter(F.col("has_pii")).count()
    redacted = decontaminated.withColumn("text", pii_redact("text"))

    # 6b. k-anonymity audit on the metadata that ships with the corpus:
    #     any (lang, source) combination carried by fewer than 2 documents
    #     is a potential re-identification handle — reported, with
    #     suppression left as a policy decision (the PII gate above covers
    #     content; this covers the metadata columns)
    from okay_spark.checks import k_anonymity_violations

    kanon = k_anonymity_violations(redacted, ["lang", "source"], k=2)
    kanon.write.mode("overwrite").parquet(f"{out}/k_anonymity")
    stats["k_anonymity_violations"] = kanon.count()

    # 7. chunk + pack into training sequences
    chunks = chunk_documents(redacted, chunk_tokens=48, overlap=8)
    packed = pack_chunks(chunks, budget_tokens=192, n_buckets=16)
    packed.write.mode("overwrite").parquet(f"{out}/sequences")
    stats["chunks"] = chunks.count()
    stats["sequences"] = packed.count()

    # 8. per-language rebalance + leak-proof splits on the surviving docs:
    #    data-dependent resampling toward a target mix (the static
    #    stratified_sample remains available for fixed fractions)
    from okay_spark.balance import resample_to_target

    balanced = resample_to_target(
        redacted, "lang", {"en": 0.5, "fr": 0.25, "de": 0.25}, key_col="doc_id"
    )

    # 8b. token-budget fill: each language stops at a token quota (the mix
    #     above fixes PROPORTIONS; the budget fixes the absolute size)
    from okay_spark.balance import sample_to_token_budget
    from okay_spark.textops import token_count

    budgeted = sample_to_token_budget(
        token_count(balanced), "lang", budget_tokens=1_000, token_col="n_tokens"
    ).drop("n_tokens")
    stats["after_token_budget"] = budgeted.count()

    final = split_column(budgeted, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    final.write.mode("overwrite").partitionBy("split").parquet(f"{out}/corpus")
    stats["final_docs"] = final.count()

    # 9. ship-manifest profile of what actually ships: per-source Flesch
    #    readability, distinct-2 lexical diversity, and length-Gini — the
    #    three numbers a training-run owner reads off the manifest before
    #    pointing a trainer at the corpus (flat reading ease, collapsing
    #    dist-2, or one source's length Gini spiking all mean re-open the
    #    filters, not train)
    from okay_spark.checks import gini_inequality
    from okay_spark.textops import ngram_diversity, readability_stats

    prof = (
        readability_stats(final)
        .join(ngram_diversity(final).select("grp", "dist_1", "dist_2"), on="grp")
        .join(
            gini_inequality(final, "source", "n_chars").select("grp", "gini"),
            on="grp",
        )
    )
    prof.write.mode("overwrite").parquet(f"{out}/ship_profile")
    agg = prof.agg(
        F.min("mean_flesch").alias("fl"),
        F.min("dist_2").alias("d2"),
        F.max("gini").alias("gi"),
    ).first()
    stats["ship_min_flesch_int"] = int(round(agg["fl"] or 0.0))
    stats["ship_min_dist2_millis"] = int(round((agg["d2"] or 0.0) * 1000))
    stats["ship_max_length_gini_millis"] = int(round((agg["gi"] or 0.0) * 1000))
    return stats


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/okay_pipeline")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("okay_spark-pipeline-demo")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(args.out, ignore_errors=True)
    stats = run_pipeline(spark, args.sf_dir, args.out)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
