"""The composed end-to-end pipeline (scripts/pipeline_demo.py): every stage
runs on real parquet and the funnel invariants hold."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_pipeline_demo_funnel(spark, tmp_path):
    from pipeline_demo import run_pipeline

    out = str(tmp_path / "pipe")
    stats = run_pipeline(spark, "/root/testdata/sf0.001", out)
    # monotone funnel: each stage can only drop documents
    assert stats["ingested"] >= stats["validated"] >= stats["after_dedup"]
    assert stats["after_dedup"] >= stats["after_line_dedup"]
    assert stats["after_line_dedup"] >= stats["after_span_strip"] >= stats["after_quality"]
    # the deterministic HLL estimate agrees with the exact count within
    # sketch error (p=9, ~4.6% standard error; allow 3 sigma)
    assert abs(stats["hll_doc_id_estimate"] - stats["validated"]) <= max(
        0.15 * stats["validated"], 5
    )
    # round-5 stages: the skew profile ran (no hot source at fixture scale
    # -> salt factor 1, i.e. "plain shuffles are safe" recorded as data);
    # the bloom catalog check carries the planted violations (sources
    # ending in '7' were held out of the catalog)
    assert stats["max_suggested_salt"] == 1
    assert stats["catalog_violations"] > 0
    # late round-5 profile stages: the fixture's 20 sources are near-uniform
    # (Gini well below 0.5), the 8-word-line derivation shares lines across
    # docs (the report justifies the strike threshold below it), and the
    # k-anonymity audit ran (count is data-dependent, sink must exist)
    assert 0 <= stats["source_gini_millis"] < 500
    # association profile: lang and source are generated independently in
    # the fixture, so both normalized-MI and Cramér's V stay low — the
    # report's "two quasi-identifiers, not one" reading
    assert 0 <= stats["lang_source_nmi_millis"] < 500
    assert 0 <= stats["lang_source_v_millis"] < 500
    assert stats["boilerplate_lines"] >= 0
    assert "k_anonymity_violations" in stats
    # filter-calibration stage: AUC of the composite quality score as a
    # ranker for the Gopher verdict is a valid probability-of-correct-pair
    # (in [0,1000] millis; on real corpora it should sit well above 500),
    # and the lang-ID kappa is a bounded chance-corrected agreement (the
    # synthetic token soup earns ~0 -- the profile honestly says the
    # heuristic is uninformative HERE, which is exactly its job)
    assert 0 <= stats["quality_vs_gopher_auc_millis"] <= 1000
    assert -1000 <= stats["langid_kappa_millis"] <= 1000
    # ship-manifest profile: diversity/inequality stay in their ranges and
    # the sink exists (checked below)
    assert 0 < stats["ship_min_dist2_millis"] <= 1000
    assert 0 <= stats["ship_max_length_gini_millis"] < 1000
    assert "ship_min_flesch_int" in stats
    assert stats["after_quality"] >= stats["after_decontamination"]
    assert stats["after_decontamination"] >= stats["after_doc_decontamination"]
    assert stats["after_doc_decontamination"] >= stats["after_domain_cap"]
    assert stats["after_domain_cap"] >= stats["after_token_budget"] >= stats["final_docs"]
    # nothing degenerate: the pipeline keeps a real corpus
    assert stats["validated"] > 0 and stats["after_dedup"] > 100
    assert stats["after_span_strip"] > 100
    assert stats["sequences"] > 0 and stats["chunks"] >= stats["sequences"]
    assert stats["gate_failures"] == 0
    # privacy gate ran; the synthetic corpus carries no PII, and redaction
    # keeps docs (it never changes the funnel count)
    assert stats["pii_docs_redacted"] == 0
    # sinks exist and are readable with the expected shapes
    v = spark.read.parquet(f"{out}/violations")
    assert {"doc_id", "path", "rule"} <= set(v.columns)
    q = spark.read.parquet(f"{out}/quarantined")
    assert {"doc_id", "n_violations", "reasons"} <= set(q.columns)
    # quarantine + clean partition the input exactly
    assert q.count() + stats["validated"] == stats["ingested"]
    seqs = spark.read.parquet(f"{out}/sequences")
    assert seqs.count() == stats["sequences"]
    prof = spark.read.parquet(f"{out}/ship_profile")
    assert {"grp", "mean_flesch", "dist_2", "gini"} <= set(prof.columns)
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.count() == stats["final_docs"]
    assert set(r["split"] for r in corpus.select("split").distinct().collect()) <= {
        "train", "val", "test",
    }
