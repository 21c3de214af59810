"""Skew evidence for the engine's hot-key shuffles -> BENCH/SKEW.md.

Two scenarios, both scale-invariant (the metric is the largest reducer's
share of the stage's work, which bounds stage time on ANY cluster size):

1. Referential check on a hot-fk fact table: salted vs unsalted sort-merge
   (the "default avatar" pattern — one fk dominates).
2. MinHash LSH dedup on a boilerplate-flooded corpus: the (band, bucket)
   groupBy is the hot shuffle, and pair expansion is QUADRATIC in bucket
   size, so a flooded bucket concentrates nearly all the stage's work on one
   reducer. The two-phase cap (count pre-pass + anti-join before the
   collect) removes that work bound; this measures it capped vs uncapped.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FACT = int(os.environ.get("SKEW_FACT_ROWS", "8000000"))
N_DIM = int(os.environ.get("SKEW_DIM_ROWS", "1000000"))
SKEW_FRAC = float(os.environ.get("SKEW_FRAC", "0.3"))
N_CORPUS = int(os.environ.get("SKEW_CORPUS_DOCS", "60000"))
N_FLOOD = int(os.environ.get("SKEW_FLOOD_DOCS", "3000"))
REPEATS = 3
PARTS = 64


def _best_of(fn, repeats=REPEATS):
    best, out = None, None
    for _ in range(repeats):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def referential_section(spark) -> str:
    from pyspark.sql import functions as F

    from okay_spark.checks import referential_violations
    from okay_spark.salt import partition_salt

    hot_cut = int(N_FACT * SKEW_FRAC)
    fact = (
        spark.range(0, N_FACT, 1, 64)
        .select(
            F.col("id").alias("row_id"),
            F.when(F.col("id") < hot_cut, F.lit(7))  # hot key, present in dim
            .otherwise((F.pmod(F.xxhash64("id"), N_DIM * 2)).cast("long"))
            .alias("fk"),
        )
        .cache()
    )
    dim = spark.range(0, N_DIM).select(F.col("id").alias("pk")).cache()
    fact.count(), dim.count()  # materialize caches

    def run(salt):
        out = referential_violations(
            fact, "fk", dim, "pk", id_cols=["row_id"], broadcast=False, salt_buckets=salt
        )
        return _best_of(out.count)

    t_plain, n_plain = run(None)
    t_salted, n_salted = run(16)
    assert n_plain == n_salted, (n_plain, n_salted)

    # The scale-invariant metric: the largest reducer's share of the fact
    # rows under each partitioning. Wall-clock on local[8] barely moves
    # (the whole table sorts in seconds), but at 10^12 rows a stage cannot
    # finish faster than its largest reducer — share bounds stage time on
    # ANY cluster size.
    share_plain = (
        fact.groupBy(F.pmod(F.hash("fk"), F.lit(PARTS)).alias("p"))
        .count()
        .agg(F.max("count"))
        .first()[0]
        / N_FACT
    )
    share_salted = (
        fact.withColumn("_s", partition_salt(16))
        .groupBy(F.pmod(F.hash("fk", "_s"), F.lit(PARTS)).alias("p"))
        .count()
        .agg(F.max("count"))
        .first()[0]
        / N_FACT
    )
    fact.unpersist(), dim.unpersist()

    return f"""## 1. Referential check — salting the hot fk

Fact: {N_FACT:,} rows, {SKEW_FRAC:.0%} of them sharing ONE fk value (the
"default avatar" pattern); dim: {N_DIM:,} keys; sort-merge left-anti over {PARTS}
shuffle partitions (auto-broadcast disabled to model a dim too large to
broadcast). AQE's skew-join optimizer does NOT rewrite this plan (verified:
no `skew=true` in the executed join) — runtime skew handling cannot be
relied on for this shape, so the engine salts explicitly.

**The metric that matters is the largest reducer's share of the rows** — a
stage can never finish faster than its largest task, on any cluster size:

| partitioning | max reducer share of fact rows | implied max parallel speedup |
| --- | --- | --- |
| hash(fk) (unsalted) | {share_plain:.1%} | {1/share_plain:.1f}x |
| hash(fk, salt16) (`okay_spark.salt`) | {share_salted:.1%} | {1/share_salted:.1f}x |

Unsalted, adding executors beyond ~{1/share_plain:.0f} buys nothing: the
{SKEW_FRAC:.0%}-hot key pins one reducer. Salted x16, the hot key spreads and
the stage keeps scaling to ~{1/share_salted:.0f} tasks.

local[8] wall-clock for completeness (best of {REPEATS}, same result rows
{n_plain:,}): unsalted {t_plain:.2f}s, salted {t_salted:.2f}s. At this toy
scale the whole table sorts in seconds and salting's extra work (dim
replicated x16, wider sort key) is visible while the straggler is not — the
crossover argument is the share bound above, which is what 10^12 rows on
1000 executors hits. Salting therefore stays OPT-IN per check
(`salt_buckets=`), keyed by observed key-frequency stats
(`okay_spark.checks.column_stats` approx_distinct vs row count), not applied
blindly.
"""


def minhash_flood_section(spark) -> str:
    from pyspark.sql import functions as F

    from okay_spark.dedup import minhash_candidate_pairs, minhash_lsh_buckets

    # Boilerplate-flooded corpus: N_FLOOD docs share IDENTICAL text (licence
    # header / templated page), so every band hashes them to the same bucket;
    # 3,000 docs form 600 small duplicate clusters of 5 (the legitimate
    # near-dup signal the cap must NOT destroy); the rest are unique word
    # sequences derived from md5(doc_id) — tiny buckets by construction.
    boiler = " ".join(f"boiler{w}" for w in range(24))
    cluster = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(23)),
            lambda j: F.substring(
                F.md5(
                    F.concat(
                        F.pmod(F.col("id"), F.lit(600)).cast("string"),
                        F.lit("#"),
                        j.cast("string"),
                    )
                ),
                1,
                8,
            ),
        ),
    )
    docs = (
        spark.range(0, N_CORPUS, 1, 32)
        .select(
            F.concat(F.lit("D"), F.col("id").cast("string")).alias("doc_id"),
            F.when(F.col("id") < N_FLOOD, F.lit(boiler))
            .when(F.col("id") < N_FLOOD + 3000, cluster)
            .otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(23)),
                        lambda j: F.substring(
                            F.md5(F.concat(F.col("id").cast("string"), F.lit("|"), j.cast("string"))),
                            1,
                            8,
                        ),
                    ),
                )
            )
            .alias("text"),
        )
        .cache()
    )
    docs.count()

    buckets = minhash_lsh_buckets(docs).localCheckpoint(eager=True)
    sizes = buckets.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))

    def work_share(sz_df):
        """Largest reducer's share of the pair-expansion work (sum of
        n*(n-1)/2 over the buckets hashed to that reducer) — pair expansion
        is quadratic, so this, not row count, is what bounds the stage."""
        w = sz_df.select(
            F.pmod(F.hash("band", "bucket"), F.lit(PARTS)).alias("p"),
            (F.col("n") * (F.col("n") - 1) / 2).alias("w"),
        ).groupBy("p").agg(F.sum("w").alias("w"))
        tot = w.agg(F.sum("w")).first()[0] or 1.0
        mx = w.agg(F.max("w")).first()[0] or 0.0
        return mx / tot

    cap = 1000
    share_uncapped = work_share(sizes)
    share_capped = work_share(sizes.filter(F.col("n") <= cap))
    max_state_uncapped = sizes.agg(F.max("n")).first()[0]
    max_state_capped = sizes.filter(F.col("n") <= cap).agg(F.max("n")).first()[0]

    t_uncapped, n_uncapped = _best_of(
        lambda: minhash_candidate_pairs(docs, max_bucket_size=None).count()
    )
    t_capped, n_capped = _best_of(
        lambda: minhash_candidate_pairs(docs, max_bucket_size=cap).count()
    )
    n_oversized = (
        minhash_lsh_buckets(docs)
        .groupBy("band", "bucket")
        .count()
        .filter(F.col("count") > cap)
        .count()
    )

    # Connected-components' per-component min-label aggregate must partial-
    # combine map-side (a giant component then costs one row per map task at
    # the reducer, not one per member) — assert it from the executed plan.
    cc_agg = (
        buckets.select(F.col("doc_id").alias("node"), F.col("bucket").alias("component"))
        .groupBy("component")
        .agg(F.min("node").alias("m"))
    )
    cc_agg.collect()
    cc_plan = cc_agg._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "partial_min" in cc_plan, "component min-label aggregate lost its partial combine"
    docs.unpersist()

    return f"""## 2. MinHash LSH dedup — the flooded-bucket cap

Corpus: {N_CORPUS:,} docs — {N_FLOOD:,} IDENTICAL boilerplate (licence
header / templated page, each band's hot bucket holds all {N_FLOOD:,}) plus
600 small duplicate clusters of 5 (the legitimate near-dup signal the cap
must not destroy). The hot shuffle is `groupBy(band, bucket)` and the cost
it feeds is QUADRATIC:
a bucket of n docs expands to n(n-1)/2 pairs inside ONE reducer task, and
the `collect_list` state is O(n). Row-share metrics understate this — the
right bound is the largest reducer's share of the pair-expansion work:

| plan | max reducer share of pair work | max collect_list state (docs) | candidate pairs | local[8] sec (best of {REPEATS}) |
| --- | --- | --- | --- | --- |
| uncapped (`max_bucket_size=None`) | {share_uncapped:.1%} | {max_state_uncapped:,} | {n_uncapped:,} | {t_uncapped:.2f} |
| capped at {cap:,} (default, two-phase) | {share_capped:.1%} | {max_state_capped:,} | {n_capped:,} | {t_capped:.2f} |

Uncapped, {share_uncapped:.0%} of all pair work lands on one task — at 10^12
docs a boilerplate cluster of 10M docs would demand 5x10^13 pair expansions
from a single reducer (and an O(10M) collect_list): the stage never
finishes, no matter the cluster size. The two-phase cap (scalar count
pre-pass, anti-join BEFORE the collect — okay_spark/dedup.py
`_cap_bucket_flood`) removes the flooded bucket's rows before any list or
pair materializes, bounding per-reducer state at {cap:,} docs and per-bucket
work at {cap*(cap-1)//2:,} pairs — while every pair of the 600 legitimate
small clusters survives ({n_capped:,} pairs, the capped row). Truncation is
observable, never silent: `minhash_oversized_buckets` reports the
{n_oversized} dropped buckets (= the boilerplate cluster in all 4 bands),
which exact fingerprint dedup then handles at O(n).

Connected-components note: the label joins key on unique node ids (no key
skew possible), and the per-component min-label aggregation partial-combines
map-side (`partial_min` asserted in this script's executed plan), so a giant
component contributes at most one row per map task to its reducer — both
CC shuffles are skew-safe by construction.
"""


def posting_flood_section(spark) -> str:
    from pyspark.sql import functions as F

    from okay_spark.dedup import ngram_jaccard_pairs
    from okay_spark.textops import word_shingles

    # Boilerplate-flooded corpus for the INVERTED-INDEX pair generators
    # (ngram Jaccard / winnowing share the same _cap_posting_flood): every
    # flood doc carries one shared licence sentence, so each of its word
    # 3-grams has df = N_FLOOD; 600 clusters of 5 share a cluster-unique
    # sentence (the signal); the rest is md5-unique filler.
    boiler = " ".join(f"lic{w}" for w in range(12))
    cluster_sent = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda j: F.substring(
                F.md5(
                    F.concat(
                        F.pmod(F.col("id"), F.lit(600)).cast("string"),
                        F.lit("@"),
                        j.cast("string"),
                    )
                ),
                1,
                8,
            ),
        ),
    )
    filler = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda j: F.substring(
                F.md5(F.concat(F.col("id").cast("string"), F.lit("~"), j.cast("string"))),
                1,
                8,
            ),
        ),
    )
    docs = (
        spark.range(0, N_CORPUS, 1, 32)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < N_FLOOD, F.concat_ws(" ", F.lit(boiler), filler))
            .when(F.col("id") < N_FLOOD + 3000, cluster_sent)
            .otherwise(filler)
            .alias("text"),
        )
        .cache()
    )
    docs.count()

    df_counts = (
        docs.select(F.col("doc_id"), F.explode(word_shingles(F.col("text"), 3)).alias("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )

    def work_share(sz_df):
        w = (
            sz_df.select(
                F.pmod(F.hash("sh"), F.lit(PARTS)).alias("p"),
                (F.col("n") * (F.col("n") - 1) / 2).alias("w"),
            )
            .groupBy("p")
            .agg(F.sum("w").alias("w"))
        )
        tot = w.agg(F.sum("w")).first()[0] or 1.0
        mx = w.agg(F.max("w")).first()[0] or 0.0
        return mx / tot

    cap = 1000
    share_uncapped = work_share(df_counts)
    share_capped = work_share(df_counts.filter(F.col("n") <= cap))
    max_state_uncapped = df_counts.agg(F.max("n")).first()[0]
    max_state_capped = df_counts.filter(F.col("n") <= cap).agg(F.max("n")).first()[0]
    n_dropped = df_counts.filter(F.col("n") > cap).count()

    t_uncapped, n_uncapped = _best_of(
        lambda: ngram_jaccard_pairs(docs, max_doc_freq=None, threshold=0.3).count()
    )
    t_capped, n_capped = _best_of(
        lambda: ngram_jaccard_pairs(docs, max_doc_freq=cap, threshold=0.3).count()
    )
    docs.unpersist()

    return f"""## 3. Inverted-index pair generators — the posting-list cap

Corpus: {N_CORPUS:,} docs — {N_FLOOD:,} sharing one boilerplate licence
sentence (every one of its word 3-grams has df = {N_FLOOD:,}) plus 600
small clusters of 5 sharing a cluster-unique sentence (the signal), rest
md5-unique filler. The hot shuffle is `groupBy(shingle)` feeding
`collect_list` posting lists, and the in-posting pair expansion is
QUADRATIC — structurally the same pathology as the LSH bucket flood (§2),
keyed by shingle instead of (band, bucket). Round 4 filtered oversized
postings AFTER the collect (bounding the expansion but NOT the reducer
state); round 5's `_cap_posting_flood` anti-joins over-cap shingles out
BEFORE the aggregate, the same two-phase + localCheckpoint discipline as
`_cap_bucket_flood`. `winnow_shared_pairs` shares the helper (key = MOSS
fingerprint), so this section evidences both.

| plan | max reducer share of pair work | max collect_list state (docs) | pairs >= 0.3 | local[8] sec (best of {REPEATS}) |
| --- | --- | --- | --- | --- |
| uncapped (`max_doc_freq=None`) | {share_uncapped:.1%} | {max_state_uncapped:,} | {n_uncapped:,} | {t_uncapped:.2f} |
| capped at {cap:,} (default, two-phase) | {share_capped:.1%} | {max_state_capped:,} | {n_capped:,} | {t_capped:.2f} |

Uncapped, {share_uncapped:.0%} of all pair work lands on the reducers
holding the boilerplate shingles, and ONE reducer materializes and sorts a
{max_state_uncapped:,}-doc posting list — at corpus scale (a licence header
shared by 10M docs) that is an O(10M) sort inside one task feeding an
O(5x10^13) expansion: the stage never finishes. Capped, per-reducer state
is bounded at {cap:,} and the {n_dropped:,} over-cap shingles are dropped
observably (pairs supported only by boilerplate score ~0 and vanish; the
600 legitimate clusters survive intact — {n_capped:,} pairs kept).
"""


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", str(PARTS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .appName("skew-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ref_md = referential_section(spark)
    mh_md = minhash_flood_section(spark)
    post_md = posting_flood_section(spark)

    md = f"""# SKEW — max-reducer-share evidence for the hot-key shuffles

{ref_md}
{mh_md}
{post_md}
Generated by `python scripts/skew_bench.py` (env: SKEW_FACT_ROWS,
SKEW_DIM_ROWS, SKEW_FRAC, SKEW_CORPUS_DOCS, SKEW_FLOOD_DOCS).
"""
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "SKEW.md"
    )
    with open(out_path, "w") as fh:
        fh.write(md)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
