"""Per-partition lineage, metrics, and checkpoint-resume (north rule).

okay has no notion of resumability (single doc, single process); at 10^12
documents a validation run must be idempotent and restartable. The unit of
progress is a *table partition*: after a partition's battery + summaries are
durably written, a lineage row (partition value, run_id, snapshot, status,
metrics) is appended. A re-run loads the lineage table, prunes partitions
already marked ``done`` for the same (input snapshot, schema fingerprint),
and validates only the remainder — partition pruning makes the skip free at
scan time.

Lineage table schema:
    part        : partition value (stringified)
    run_id      : caller-supplied run identifier
    snapshot    : input snapshot id / fingerprint ('' when unknown)
    schema_fp   : fingerprint of the compiled schema (rules change -> re-run)
    status      : 'done'
    n_docs, n_violations, n_failed_docs : bigint
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checks import partition_summary
from .engine import validate_dataframe
from .io import read_table, table_exists, write_table
from .schema import CompiledSchema, compile_cached

LINEAGE_DDL = (
    "part string, run_id string, snapshot string, schema_fp string, "
    "status string, n_docs bigint, n_violations bigint, n_failed_docs bigint"
)


def schema_fingerprint(compiled: CompiledSchema) -> str:
    """Stable digest of the rule table (custom callables by qualname)."""
    payload = []
    for path, spec in compiled.fields.items():
        for rule in spec.rules:
            params = {
                k: (getattr(v, "__qualname__", str(v)) if callable(v) else v)
                for k, v in rule.params.items()
                if k != "kwargs"
            }
            payload.append((path, spec.strictness, rule.type, rule.nullable, rule.implicit, sorted(params.items())))
    blob = json.dumps(payload, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def completed_partitions(
    spark: SparkSession, lineage_target: str, snapshot: str, schema_fp: str
) -> set[str]:
    if not table_exists(spark, lineage_target):
        return set()
    lin = read_table(spark, lineage_target)
    rows = (
        lin.filter(
            (F.col("status") == "done")
            & (F.col("snapshot") == snapshot)
            & (F.col("schema_fp") == schema_fp)
        )
        .select("part")
        .distinct()
        .collect()
    )
    return {r["part"] for r in rows}


def run_resumable_validation(
    df: DataFrame,
    schema,
    *,
    partition_col: str,
    violations_target: str,
    lineage_target: str,
    run_id: str,
    snapshot: str = "",
) -> dict:
    """Validate only partitions not yet marked done; append violations and
    lineage. Returns run metrics.

    Partition-granular idempotency: a crashed run re-appends nothing for
    partitions whose lineage row landed; interrupted partitions are re-run
    wholesale (violation sinks should be de-duplicated downstream by
    (run_id, part) if exactly-once matters).
    """
    spark = df.sparkSession
    compiled = schema if isinstance(schema, CompiledSchema) else compile_cached(schema)
    fp = schema_fingerprint(compiled)

    done = completed_partitions(spark, lineage_target, snapshot, fp)
    if done:
        df = df.filter(~F.col(partition_col).cast("string").isin(*done))

    summary = partition_summary(df, compiled, partition_col).collect()
    if not summary:
        return {"run_id": run_id, "partitions": 0, "skipped": len(done), "n_docs": 0}

    violations = validate_dataframe(df, compiled).withColumn("run_id", F.lit(run_id))
    write_table(violations, violations_target, mode="append")

    lineage_rows = [
        (
            str(r[partition_col]),
            run_id,
            snapshot,
            fp,
            "done",
            r["n_docs"],
            r["n_violations"],
            r["n_failed_docs"],
        )
        for r in summary
    ]
    write_table(spark.createDataFrame(lineage_rows, LINEAGE_DDL), lineage_target, mode="append")
    return {
        "run_id": run_id,
        "partitions": len(summary),
        "skipped": len(done),
        "n_docs": sum(r["n_docs"] for r in summary),
        "n_violations": sum(r["n_violations"] for r in summary),
    }
