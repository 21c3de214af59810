"""Expectation-suite (Deequ-style quality gate) semantics + plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Row


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", n=5, ref="m-1"),
            Row(doc_id=2, lang="fr", n=50, ref="m-2"),
            Row(doc_id=2, lang="xx", n=-1, ref="m-404"),  # dup id, bad lang, bad n, orphan ref
            Row(doc_id=4, lang=None, n=9, ref=None),
        ]
    )


def _dim(spark):
    return spark.createDataFrame([Row(media_ref="m-1"), Row(media_ref="m-2")])


def test_expectations_report_pass_fail(spark):
    from okay_spark.expectations import Expectations

    report = (
        Expectations()
        .expect_row_count_between(1, 100)
        .expect_non_null("lang", max_null_frac=0.30)
        .expect_values_in("lang", ["en", "fr", "de"])
        .expect_min("n", 0)
        .expect_unique("doc_id")
        .expect_reference("ref", _dim(spark), "media_ref")
        .run(_docs(spark))
    )
    rows = {(r["check"], r["column"]): r for r in report.collect()}
    assert rows[("row_count_min", "*")]["passed"]
    assert rows[("row_count_max", "*")]["passed"]
    # 1 null lang of 4 rows = 0.25 <= 0.30
    assert rows[("null_frac", "lang")]["observed"] == pytest.approx(0.25)
    assert rows[("null_frac", "lang")]["passed"]
    # 'xx' violates the option set
    assert rows[("invalid_option_frac", "lang")]["observed"] == pytest.approx(0.25)
    assert not rows[("invalid_option_frac", "lang")]["passed"]
    assert rows[("min", "n")]["observed"] == -1.0
    assert not rows[("min", "n")]["passed"]
    assert rows[("duplicate_keys", "doc_id")]["observed"] == 1.0
    assert not rows[("duplicate_keys", "doc_id")]["passed"]
    # one non-null orphan (m-404); the null ref doesn't count
    assert rows[("unknown_reference", "ref")]["observed"] == 1.0
    assert not rows[("unknown_reference", "ref")]["passed"]


def test_expectations_regex_and_thresholds(spark):
    from okay_spark.expectations import Expectations

    df = spark.createDataFrame(
        [Row(code="A-1"), Row(code="A-2"), Row(code="oops"), Row(code=None)]
    )
    report = (
        Expectations()
        .expect_regex("code", r"A-\d", max_viol_frac=0.30)
        .run(df)
    )
    r = report.collect()[0]
    # 1 violation of 4 rows (null doesn't violate regex) = 0.25 <= 0.30
    assert r["observed"] == pytest.approx(0.25)
    assert r["passed"]


def test_row_local_expectations_share_one_scan(spark):
    from okay_spark.expectations import Expectations

    df = spark.createDataFrame([Row(a=1, b="x")] * 10)
    report = (
        Expectations()
        .expect_non_null("a")
        .expect_non_null("b")
        .expect_min("a", 0)
        .expect_max("a", 100)
        .expect_row_count_between(1)
        .run(df)
    )
    report.collect()
    plan = report._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # one aggregate over the source: no per-constraint rescans
    assert plan.count("Scan ExistingRDD") <= 1
    assert "Exchange hashpartitioning" not in plan


def test_empty_suite_returns_empty_report(spark):
    from okay_spark.expectations import Expectations

    out = Expectations().run(_docs(spark))
    assert out.count() == 0
    assert out.columns == ["check", "column", "observed", "threshold", "passed"]


def test_violation_trend_flags_rate_regression(spark, tmp_path):
    from okay_spark.state import LINEAGE_DDL, violation_trend

    out = str(tmp_path / "sinks")
    rows = [
        # run-1: 2 partitions, 1000 docs, 10 violations (rate 0.01)
        ("p0", "run-1", 0, "s", "fp", "done", 500, 5, 5, None),
        ("p1", "run-1", 0, "s", "fp", "done", 500, 5, 5, None),
        # run-2: same docs, 11 violations (rate 0.011 -> +10%, ok at 50%)
        ("p0", "run-2", 1, "s", "fp", "done", 500, 6, 6, None),
        ("p1", "run-2", 1, "s", "fp", "done", 500, 5, 5, None),
        # run-3: 30 violations (rate 0.03 -> +172%, regression)
        ("p0", "run-3", 2, "s", "fp", "done", 500, 20, 20, None),
        ("p1", "run-3", 2, "s", "fp", "done", 500, 10, 10, None),
    ]
    spark.createDataFrame(rows, LINEAGE_DDL).write.parquet(f"{out}/lineage")
    trend = {r["run_id"]: r for r in violation_trend(spark, out).collect()}
    assert not trend["run-1"]["regressed"]
    assert trend["run-1"]["prev_rate"] is None
    assert not trend["run-2"]["regressed"]
    assert trend["run-3"]["regressed"]
    assert trend["run-3"]["rate"] == pytest.approx(0.03)


def test_violation_trend_orders_on_run_seq_not_run_id(spark, tmp_path):
    """'run-10' sorts before 'run-2' lexicographically; the trend window must
    pair adjacent runs by write-time run_seq, not by run_id string order."""
    from okay_spark.state import LINEAGE_DDL, violation_trend

    out = str(tmp_path / "sinks")
    rows = [
        # write order: run-2 (rate 0.01) then run-10 (rate 0.03). A
        # lexicographic sort would make run-2 "follow" run-10 and see a DROP;
        # seq order must flag run-10 as the +200% regression.
        ("p0", "run-2", 0, "s", "fp", "done", 1000, 10, 10, None),
        ("p0", "run-10", 1, "s", "fp", "done", 1000, 30, 30, None),
    ]
    spark.createDataFrame(rows, LINEAGE_DDL).write.parquet(f"{out}/lineage")
    trend = {r["run_id"]: r for r in violation_trend(spark, out).collect()}
    assert trend["run-2"]["prev_rate"] is None
    assert trend["run-10"]["prev_rate"] == pytest.approx(0.01)
    assert trend["run-10"]["regressed"]


def test_run_seq_increments_across_runs(spark, tmp_path):
    """run_resumable_validation stamps a monotonic run_seq on each run's
    lineage rows (the ordering key violation_trend windows over)."""
    from okay_spark.schema import required
    from okay_spark.state import run_resumable_validation

    docs = spark.createDataFrame(
        [(1, "a", 0), (2, None, 1)], "doc_id bigint, text string, part int"
    )

    def schema():
        required("text", type="string")

    kwargs = dict(
        schema=schema,
        partition_col="part",
        violations_target=str(tmp_path / "viol"),
        lineage_target=str(tmp_path / "lineage"),
    )
    run_resumable_validation(docs, run_id="run-2", snapshot="s1", **kwargs)
    run_resumable_validation(docs, run_id="run-10", snapshot="s2", **kwargs)
    lin = spark.read.parquet(str(tmp_path / "lineage"))
    seqs = {
        r["run_id"]: r["run_seq"]
        for r in lin.select("run_id", "run_seq").distinct().collect()
    }
    assert seqs["run-2"] == 0 and seqs["run-10"] == 1


def test_read_with_rejects_jsonl(spark, tmp_path):
    from okay_spark.io import read_with_rejects

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok"}\n'
        '{"doc_id": "broken json line\n'
    )
    good, rejects = read_with_rejects(spark, str(p), "doc_id bigint, text string")
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    rej = rejects.collect()
    assert len(rej) == 2
    assert all(r["rule"] == "malformed_record" for r in rej)
    assert any("not json" in r["raw"] for r in rej)


def test_read_with_rejects_csv(spark, tmp_path):
    from okay_spark.io import read_with_rejects

    p = tmp_path / "docs.csv"
    p.write_text("doc_id,n\n1,10\n2,notanumber\n3,30\n")
    good, rejects = read_with_rejects(
        spark, str(p), "doc_id bigint, n bigint", format="csv"
    )
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 3]
    assert rejects.count() == 1
