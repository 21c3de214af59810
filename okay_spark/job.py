"""The full validation job: what ``spark-submit --py-files okay_spark.zip``
runs on the cluster (north rule).

One invocation = one resumable run over an input table of interleaved
documents:

1. rule battery  -> violations sink            (shuffle-free)
2. doc_id uniqueness (salted)                  (hash-aggregate shuffle)
3. media_ref referential vs the media catalog  (broadcast | salted SMJ)
4. per-column stats + drift vs a reference snapshot -> metrics sink
5. per-partition pass/fail summaries + lineage -> resume skips done parts

Usage (cluster) — spark-submit's primary file must be a top-level script
(relative imports have no parent package there), so the repo-root launcher
``submit_job.py`` dispatches into this module:

    zip -qr okay_spark.zip okay_spark
    spark-submit --py-files okay_spark.zip submit_job.py \\
        --input warehouse.docs --catalog warehouse.media \\
        --output /sinks/validation --run-id nightly-2026-08-16

Executed end-to-end (real spark-submit subprocess, zip on --py-files) by
tests/test_spark_submit.py.

Sandbox smoke:
    python -m okay_spark.job --n-docs 100000 --output /tmp/okay_run
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession, functions as F

from .checks import (
    column_stats,
    drift_metrics,
    media_ref_violations,
    partition_summary,
    rule_summary,
    uniqueness_violations,
)
from .engine import validate_dataframe
from .io import read_table, write_table
from .schema import compile_cached
from .state import run_resumable_validation


def run_full_validation(
    spark: SparkSession,
    docs,
    catalog,
    schema,
    *,
    output: str,
    run_id: str,
    partition_col: str = "part",
    input_snapshot: str = "",
    reference_snapshot=None,
    broadcast_catalog: bool = True,
    salt_buckets: int = 16,
) -> dict:
    """Run the complete check battery; returns run metrics (also written to
    ``{output}/run_metrics``).

    ``input_snapshot`` identifies the INPUT data version (e.g. the Iceberg
    snapshot id); resume skips a partition only when the same (input
    snapshot, schema fingerprint) pair already completed it. Earlier this
    passed the schema fingerprint as the snapshot, which made a nightly run
    over NEW data with an unchanged schema skip everything."""
    compiled = compile_cached(schema) if callable(schema) else schema
    t0 = time.time()

    battery = run_resumable_validation(
        docs,
        compiled,
        partition_col=partition_col,
        violations_target=f"{output}/violations",
        lineage_target=f"{output}/lineage",
        run_id=run_id,
        snapshot=input_snapshot,
    )

    dup = uniqueness_violations(docs, "doc_id", salt_buckets=salt_buckets).withColumn(
        "run_id", F.lit(run_id)
    )
    write_table(dup, f"{output}/violations_uniqueness", mode="append")
    n_dup = dup.count()

    refv = media_ref_violations(
        docs,
        catalog,
        broadcast=broadcast_catalog,
        salt_buckets=None if broadcast_catalog else salt_buckets,
    ).withColumn("run_id", F.lit(run_id))
    write_table(refv, f"{output}/violations_referential", mode="append")
    n_ref = refv.count()

    stats = column_stats(docs.select("doc_id", partition_col)).withColumn("run_id", F.lit(run_id))
    write_table(stats, f"{output}/metrics_stats", mode="append")

    drift = None
    if reference_snapshot is not None:
        sizes_cur = docs.select(F.size("spans").cast("double").alias("n_spans"))
        sizes_ref = reference_snapshot.select(F.size("spans").cast("double").alias("n_spans"))
        drift = drift_metrics(sizes_cur, sizes_ref, "n_spans", bins=16)
        write_table(
            spark.createDataFrame(
                [(run_id, drift["column"], float(drift["psi"]), float(drift["ks"]))],
                "run_id string, column string, psi double, ks double",
            ),
            f"{output}/metrics_drift",
            mode="append",
        )

    summary = partition_summary(docs, compiled, partition_col).withColumn("run_id", F.lit(run_id))
    write_table(summary, f"{output}/summaries", mode="append")
    rules = rule_summary(docs, compiled, partition_col).withColumn("run_id", F.lit(run_id))
    write_table(rules, f"{output}/summaries_by_rule", mode="append")

    metrics = {
        "run_id": run_id,
        "elapsed_sec": round(time.time() - t0, 2),
        "battery": battery,
        "duplicate_keys": n_dup,
        "unknown_media_refs": n_ref,
        "drift": drift,
    }
    write_table(
        spark.createDataFrame([(run_id, json.dumps(metrics, default=str))], "run_id string, metrics string"),
        f"{output}/run_metrics",
        mode="append",
    )
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="input docs table/path (default: synthesize fixture)")
    ap.add_argument("--catalog", help="media catalog table/path (default: synthesize)")
    ap.add_argument("--n-docs", type=int, default=100_000, help="fixture size when no --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="run-1")
    ap.add_argument("--snapshot", default="", help="input data snapshot id (resume key with the schema fingerprint)")
    ap.add_argument("--no-broadcast", action="store_true", help="force salted sort-merge referential join")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("okay_spark-validation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from .fixtures import document_schema, interleaved_documents, media_catalog

    docs = read_table(spark, args.input) if args.input else interleaved_documents(spark, args.n_docs)
    catalog = read_table(spark, args.catalog) if args.catalog else media_catalog(spark)

    metrics = run_full_validation(
        spark,
        docs,
        catalog,
        document_schema,
        output=args.output,
        run_id=args.run_id,
        input_snapshot=args.snapshot,
        broadcast_catalog=not args.no_broadcast,
    )
    print(json.dumps(metrics, default=str))


if __name__ == "__main__":
    main()
