"""PII scan / redact: exact counts on a planted fixture, redaction output,
and the shuffle-free row-local plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from okay_spark.textops import pii_redact, pii_scan

ROWS = [
    (0, "reach me at alice.smith+news@mail.example.org thanks"),
    (1, "server 192.168.1.7 and 10.0.0.255 both up"),
    (2, "call +1 555-123-4567 or 555 987 6543 today"),
    (3, "no sensitive content here"),
    (4, "bob@x.io pinged 8.8.8.8 then dialed 212-555-0199"),
    (5, None),
]


def _scan(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    return {r["doc_id"]: r.asDict() for r in pii_scan(df).collect()}


def test_pii_counts_planted(spark):
    out = _scan(spark)
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (1, 0, 0)
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (0, 2, 0)
    # "+1 555-123-4567" matches at "555-..."; "555 987 6543" has the
    # space-separated shape the pattern also accepts
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 2)
    assert out[3]["pii_total"] == 0 and out[3]["has_pii"] is False
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (1, 1, 1)
    assert out[4]["pii_total"] == 3 and out[4]["has_pii"] is True
    # null text -> definite zero counts / has_pii=false, so the doc lands in
    # exactly one branch of a filter(has_pii) / filter(~has_pii) split
    assert out[5]["n_email"] == 0 and out[5]["pii_total"] == 0
    assert out[5]["has_pii"] is False


def test_pii_scan_null_text_lands_in_exactly_one_branch(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    scanned = pii_scan(df)
    kept = scanned.filter(~F.col("has_pii")).count()
    dropped = scanned.filter(F.col("has_pii")).count()
    assert kept + dropped == len(ROWS)


def test_pii_redact(spark):
    df = spark.createDataFrame(ROWS[:5], "doc_id bigint, text string")
    red = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", pii_redact("text").alias("t")).collect()
    }
    assert red[0] == "reach me at [EMAIL] thanks"
    assert red[1] == "server [IPV4] and [IPV4] both up"
    assert "[PHONE]" in red[2] and "4567" not in red[2]
    assert red[3] == "no sensitive content here"
    # redacted text carries no residue of any match
    for t in red.values():
        assert "@" not in t


def test_pii_scan_plan_is_row_local(spark):
    spark.catalog.clearCache()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pii_scan(docs)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # column pruning: only doc_id + text scanned
    assert "n_chars" not in plan.split("ReadSchema:")[1]
