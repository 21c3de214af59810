"""Skew evidence: salted vs unsalted sort-merge referential check on a
hot-key fact table -> BENCH/SKEW.md.

Scenario at 10^12-row scale: one media_ref / fk value dominates (a site-wide
logo, a default avatar). In an unsalted sort-merge join every row with the
hot key lands on ONE reducer task — the stage runs at the speed of that
straggler. Salting spreads the hot key over ``salt_buckets`` tasks
deterministically (``okay_spark.salt``): the dim side is replicated x
buckets (tiny), the fact side hashes into buckets.

This script builds a fact table where ``skew_frac`` of rows share one fk,
then times the same referential check unsalted vs salted, with AQE's
skew-join optimizer ON both times (it does not fire for this left-anti
shape, which is exactly why the engine salts explicitly). Timings are
best-of-N separate actions on a warm JVM.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FACT = int(os.environ.get("SKEW_FACT_ROWS", "8000000"))
N_DIM = int(os.environ.get("SKEW_DIM_ROWS", "1000000"))
SKEW_FRAC = float(os.environ.get("SKEW_FRAC", "0.3"))
REPEATS = 3


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from okay_spark.checks import referential_violations

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .appName("skew-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

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
        best = None
        n = None
        for _ in range(REPEATS):
            t0 = time.time()
            n = out.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best, n

    t_plain, n_plain = run(None)
    t_salted, n_salted = run(16)
    assert n_plain == n_salted, (n_plain, n_salted)

    # The scale-invariant metric: the largest reducer's share of the fact
    # rows under each partitioning. Wall-clock on local[8] barely moves
    # (the whole table sorts in seconds), but at 10^12 rows a stage cannot
    # finish faster than its largest reducer — share bounds stage time on
    # ANY cluster size.
    parts = 64
    share_plain = (
        fact.groupBy(F.pmod(F.hash("fk"), F.lit(parts)).alias("p"))
        .count()
        .agg(F.max("count"))
        .first()[0]
        / N_FACT
    )
    from okay_spark.salt import partition_salt

    share_salted = (
        fact.withColumn("_s", partition_salt(16))
        .groupBy(F.pmod(F.hash("fk", "_s"), F.lit(parts)).alias("p"))
        .count()
        .agg(F.max("count"))
        .first()[0]
        / N_FACT
    )

    md = f"""# SKEW — salting evidence for the hot-key referential check

Fact: {N_FACT:,} rows, {SKEW_FRAC:.0%} of them sharing ONE fk value (the
"default avatar" pattern); dim: {N_DIM:,} keys; sort-merge left-anti over 64
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

Generated by `python scripts/skew_bench.py`
(env: SKEW_FACT_ROWS, SKEW_DIM_ROWS, SKEW_FRAC).
"""
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "SKEW.md"
    )
    with open(out_path, "w") as fh:
        fh.write(md)
    print(
        f"plain {t_plain:.2f}s  salted {t_salted:.2f}s  "
        f"max-reducer-share {share_plain:.1%} -> {share_salted:.1%} -> {out_path}"
    )


if __name__ == "__main__":
    main()
