"""Fixture generator determinism + engine-level checks (stats, uniqueness,
referential, drift, summaries) against independent oracles."""

from __future__ import annotations

import math

import pytest

from okay_spark import compile_schema
from okay_spark.checks import (
    categorical_drift,
    column_stats,
    drift_metrics,
    duplicate_keys,
    media_ref_violations,
    partition_summary,
    referential_violations,
    rule_summary,
    uniqueness_violations,
)
from okay_spark.engine import validate_dataframe
from okay_spark.fixtures import (
    accommodation_schema,
    accommodations,
    document_schema,
    interleaved_documents,
    media_catalog,
)

N = 600


@pytest.fixture(scope="module")
def docs(spark):
    return interleaved_documents(spark, N, parts=8).cache()


def test_fixture_deterministic(spark, docs):
    again = interleaved_documents(spark, N, parts=8)
    a = [r.asDict(recursive=True) for r in docs.orderBy("doc_id", "part").collect()]
    b = [r.asDict(recursive=True) for r in again.orderBy("doc_id", "part").collect()]
    assert a == b
    assert docs.count() == N


def test_fixture_shape_and_injection(docs):
    from pyspark.sql import functions as F

    row = docs.first()
    assert set(row.asDict()) == {"doc_id", "spans", "part"}
    stats = docs.select(
        F.count_if(F.col("doc_id").rlike(r"^doc-\d{12}$")).alias("good_ids"),
        F.count_if(F.size("spans") == 0).alias("empty"),
    ).first()
    assert stats["good_ids"] > N * 0.9
    assert 0 < stats["empty"] < N * 0.1


def test_battery_on_fixture_matches_oracle(spark, docs, okay_reference):
    """The flagship end-to-end: full rule battery on the north-rule table,
    every sampled row cross-checked against the reference validator."""
    from okay import validate  # type: ignore
    from okay.schema import required, optional  # type: ignore
    from okay_spark.messages import parse_expected

    sample = docs.limit(120)
    got: dict[str, set] = {}
    out = validate_dataframe(sample, compile_schema(document_schema), id_cols=["doc_id"])
    rows = sample.collect()
    for r in out.collect():
        got.setdefault(r["doc_id"], set()).add(
            (r["rule"], r["path"], _freeze(parse_expected(r["expected"])))
        )

    def ref_schema():
        required("doc_id", type="string", regex=r"doc-\d{12}")
        required("spans", type="list", min=1)
        required("spans[]", type="object")
        required("spans[].kind", type="string", options=["text", "media"])
        optional("spans[].text", type="string?", min=1)
        optional("spans[].media_ref", type="string?", regex=r"media-\d{8}")
        required("spans[].offset", type="int", min=0)
        optional("part", type="int?")

    mismatches = 0
    for row in rows:
        doc = row.asDict(recursive=True)
        expect = {
            (m.type, m.field, _freeze(getattr(m, "expected", None)))
            for m in validate(ref_schema, doc)
        }
        if got.get(doc["doc_id"], set()) != expect:
            mismatches += 1
    assert mismatches == 0


def _freeze(expected):
    if expected is None:
        return None
    return tuple(sorted((k, tuple(v) if isinstance(v, list) else v) for k, v in expected.items()))


def test_accommodations_valid_invalid_split(spark):
    from pyspark.sql import functions as F

    df = accommodations(spark, 40).withColumn("_id", F.monotonically_increasing_id())
    out = validate_dataframe(df.withColumn("_id", F.col("metadata.accommodation_id")),
                             compile_schema(_acc_schema_with_id()), id_cols=["_id"])
    rules = {r["rule"] for r in out.collect()}
    assert "number_too_small" in rules  # accommodation_id = -1
    assert "no_match" in rules  # 'midnight', '-90'
    assert "invalid_string_option" in rules  # 'loneliness'
    assert "null_value" in rules  # source_type / out_of nulls
    assert "score_too_high" in rules  # custom validator


def _acc_schema_with_id():
    from okay_spark.schema import optional as opt

    def schema_fn():
        opt("_id", type="any?")
        accommodation_schema()

    return schema_fn


def test_column_stats(spark, docs):
    import duckdb

    pdf = docs.select("doc_id", "part").toPandas()
    stats = {r["column"]: r.asDict() for r in column_stats(docs, ["doc_id", "part"]).collect()}
    assert stats["doc_id"]["n_rows"] == N
    assert stats["doc_id"]["n_nulls"] == 0
    assert stats["part"]["min_num"] == float(pdf["part"].min())
    assert stats["part"]["max_num"] == float(pdf["part"].max())
    assert abs(stats["part"]["avg_num"] - float(pdf["part"].mean())) < 1e-9
    assert stats["doc_id"]["min_str"] == pdf["doc_id"].min()
    # approx distinct within rsd bounds
    exact = pdf["doc_id"].nunique()
    assert abs(stats["doc_id"]["approx_distinct"] - exact) <= max(3, 0.15 * exact)


def test_duplicate_keys_plain_and_salted_agree(spark, docs):
    import pandas as pd

    pdf = docs.select("doc_id").toPandas()
    expect = pdf.groupby("doc_id").size()
    expect = {k: int(v) for k, v in expect[expect > 1].items()}
    plain = {r["doc_id"]: r["cnt"] for r in duplicate_keys(docs, "doc_id").collect()}
    salted = {r["doc_id"]: r["cnt"] for r in duplicate_keys(docs, "doc_id", salt_buckets=4).collect()}
    assert plain == expect and salted == expect
    assert len(expect) > 0  # fixture injects dups
    v = uniqueness_violations(docs, "doc_id").first()
    assert v["rule"] == "duplicate_key"


def test_referential_broadcast_and_salted_agree(spark, docs):
    catalog = media_catalog(spark, 100_000)
    b = media_ref_violations(docs, catalog, broadcast=True)
    s = media_ref_violations(docs, catalog, broadcast=False, salt_buckets=4)
    bset = {(r["doc_id"], r["path"]) for r in b.collect()}
    sset = {(r["doc_id"], r["path"]) for r in s.collect()}
    assert bset == sset
    assert len(bset) > 0  # fixture injects orphans
    # no Exchange on the probe side beyond the anti-join itself; broadcast hint honored
    assert "BroadcastHashJoin" in b._jdf.queryExecution().executedPlan().toString()


def test_drift_metrics_against_numpy(spark):
    import numpy as np

    ref_vals = [float(x) for x in np.random.RandomState(7).normal(0, 1, 4000)]
    cur_vals = [float(x) for x in np.random.RandomState(8).normal(0.8, 1.2, 4000)]
    ref = spark.createDataFrame([(v,) for v in ref_vals], "x double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "x double")
    m = drift_metrics(cur, ref, "x", bins=10)

    lo, hi = min(ref_vals), max(ref_vals)
    width = (hi - lo) / 10
    def hist(vals):
        h = [0] * 10
        for v in vals:
            b = min(max(int((v - lo) // width), 0), 9)
            h[b] += 1
        return h
    hr, hc = hist(ref_vals), hist(cur_vals)
    psi = 0.0
    ks = 0.0
    cr = cc = 0.0
    eps = 1e-6
    for b in range(10):
        p, q = hc[b] / 4000, hr[b] / 4000
        psi += (max(p, eps) - max(q, eps)) * math.log(max(p, eps) / max(q, eps))
        cc += p
        cr += q
        ks = max(ks, abs(cc - cr))
    assert abs(m["psi"] - psi) < 1e-9
    assert abs(m["ks"] - ks) < 1e-9
    assert m["psi"] > 0.1  # shifted distribution detected

    same = drift_metrics(ref, ref, "x", bins=10)
    assert same["psi"] < 1e-12 and same["ks"] < 1e-12


def test_categorical_drift(spark):
    a = spark.createDataFrame([("x",)] * 90 + [("y",)] * 10, "c string")
    b = spark.createDataFrame([("x",)] * 50 + [("y",)] * 50, "c string")
    assert categorical_drift(a, a, "c")["psi"] < 1e-12
    assert categorical_drift(a, b, "c")["psi"] > 0.1


def test_partition_summary_consistent_with_battery(spark, docs):
    compiled = compile_schema(document_schema)
    summary = partition_summary(docs, compiled, "part")
    total_viols = sum(r["n_violations"] for r in summary.collect())
    assert total_viols == validate_dataframe(docs, compiled).count()
    assert sum(r["n_docs"] for r in summary.collect()) == N
    rs = rule_summary(docs, compiled, "part")
    assert sum(r["cnt"] for r in rs.collect()) == total_viols


# --- outliers and exemplars -------------------------------------------------------


def test_numeric_outliers_exact_and_partition_independent(spark):
    from okay_spark.checks import numeric_outliers

    # 99 values at 10.0 plus one extreme: only the extreme exceeds z=3
    rows = [(i, 10.0) for i in range(99)] + [(99, 1000.0)]
    df = spark.createDataFrame(rows, "event_id int, value double")
    out = numeric_outliers(df, "value", z_threshold=3.0, id_cols=["event_id"]).collect()
    assert [r["event_id"] for r in out] == [99]
    z1 = out[0]["z"]
    # identical z on a different partitioning (decimal moments are exact)
    out2 = numeric_outliers(
        df.repartition(7), "value", z_threshold=3.0, id_cols=["event_id"]
    ).collect()
    assert out2[0]["z"] == z1


def test_numeric_outliers_ignores_null_and_nan(spark):
    from okay_spark.checks import numeric_outliers

    rows = [(1, 5.0), (2, None), (3, float("nan")), (4, 5.0), (5, 5.0)]
    df = spark.createDataFrame(rows, "event_id int, value double")
    # all non-null values identical -> std 0 -> no outliers, no crash
    assert numeric_outliers(df, "value", id_cols=["event_id"]).count() == 0


def test_violation_exemplars_bounded_examples(spark):
    from okay_spark.checks import violation_exemplars

    rows = [(i, "lang", "invalid_string_option") for i in range(50)] + [
        (7, "n_chars", "number_too_large")
    ]
    viol = spark.createDataFrame(rows, "doc_id int, path string, rule string")
    out = {(r["path"], r["rule"]): r for r in violation_exemplars(viol, "doc_id").collect()}
    big = out[("lang", "invalid_string_option")]
    assert big["n_violations"] == 50
    assert big["example_ids"] == [0, 1, 2]  # smallest ids, bounded at 3
    small = out[("n_chars", "number_too_large")]
    assert small["n_violations"] == 1 and small["example_ids"] == [7]


def test_cross_field_rule_null_and_plan(spark):
    from okay_spark.checks import cross_field_rule
    from pyspark.sql import functions as F

    rows = [
        (1, "purchase", 5.0),   # ok
        (2, "purchase", 0.2),   # violates expect
        (3, "purchase", None),  # null expect counts as violation
        (4, "click", None),     # when doesn't hold: ignored
    ]
    df = spark.createDataFrame(rows, "event_id int, event_type string, value double")
    out = cross_field_rule(
        df,
        when=F.col("event_type") == "purchase",
        expect=F.col("value") >= 1.0,
        path="value",
        id_cols=["event_id"],
    )
    assert sorted(r["event_id"] for r in out.collect()) == [2, 3]
    # the conditional rule must stay in the codegen scan pipeline: no
    # shuffle, no Python eval
    plan = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "Exchange" not in plan and "Python" not in plan


def test_quantile_drift_detects_shift(spark):
    from okay_spark.checks import quantile_drift

    cur = spark.createDataFrame([(float(i + 100),) for i in range(100)], "x double")
    ref = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    out = {r["p"]: r for r in quantile_drift(cur, ref, ["x"]).collect()}
    # a pure +100 shift moves every quantile by exactly 100
    assert all(abs(out[p]["drift"] - 100.0) < 1e-9 for p in out)
    # and no drift against itself
    same = quantile_drift(ref, ref, ["x"]).collect()
    assert all(r["drift"] == 0.0 for r in same)


def test_referential_composite_key_and_salted(spark):
    from okay_spark.checks import referential_violations

    fact = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 10), (4, None, 10), (5, "a", None)],
        "rid int, k1 string, k2 int",
    )
    dim = spark.createDataFrame([("a", 10), ("b", 10)], "k1 string, k2 int")
    out = referential_violations(
        fact, ["k1", "k2"], dim, ["k1", "k2"], id_cols=["rid"]
    ).collect()
    # only row 2 has a fully-non-null composite key missing from dim; rows
    # with a partially-null key are the battery's problem, not referential
    assert [r["rid"] for r in out] == [2]
    assert out[0]["path"] == "k1,k2"
    assert '"k1":"a"' in out[0]["expected"] and '"k2":20' in out[0]["expected"]

    # the salted sort-merge variant must agree exactly
    salted = referential_violations(
        fact, ["k1", "k2"], dim, ["k1", "k2"],
        id_cols=["rid"], broadcast=False, salt_buckets=3,
    ).collect()
    assert [r["rid"] for r in salted] == [2]

    # single-key path keeps its original expected shape: {"value": ...}
    single = referential_violations(
        fact.filter("k1 is not null"), "k2", dim.filter("k1 = 'a'"), "k2",
        id_cols=["rid"],
    ).collect()
    assert all(r["expected"].startswith('{"value":') for r in single)


def test_numeric_outliers_grouped_uses_group_moments(spark):
    from okay_spark.checks import numeric_outliers

    # group A: tight around 10 with one spike; group B: huge values, the
    # same spike magnitude would be normal there
    rows = (
        [(i, "A", 10.0) for i in range(50)]
        + [(50, "A", 100.0)]
        + [(100 + i, "B", 1000.0 * (1 + (i % 5))) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "event_id int, grp string, value double")
    out = numeric_outliers(
        df, "value", z_threshold=3.0, id_cols=["event_id"], group_by="grp"
    ).collect()
    assert [(r["grp"], r["event_id"]) for r in out] == [("A", 50)]
    # global moments would NOT flag the A-spike (B's spread dominates)
    glob = numeric_outliers(df, "value", z_threshold=3.0, id_cols=["event_id"]).collect()
    assert all(r["event_id"] != 50 for r in glob)


def test_numeric_outliers_shuffle_join_path_matches_broadcast(spark):
    """broadcast=False (high-cardinality group keys: #groups rows no longer
    fit on every executor) must produce the identical answer via a plain
    shuffle join, and its plan must carry no broadcast hint of ours."""
    from okay_spark.checks import numeric_outliers

    rows = (
        [(i, "A", 10.0) for i in range(50)]
        + [(50, "A", 100.0)]
        + [(100 + i, "B", 1000.0 * (1 + (i % 5))) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "event_id int, grp string, value double")
    kw = dict(z_threshold=3.0, id_cols=["event_id"], group_by="grp")
    bcast = numeric_outliers(df, "value", **kw)
    shuffled = numeric_outliers(df, "value", broadcast=False, **kw)
    assert sorted(map(tuple, bcast.collect())) == sorted(map(tuple, shuffled.collect()))
    # the hint is what forces a broadcast even past autoBroadcastJoinThreshold;
    # its absence is what lets a huge stats side shuffle instead of OOM-ing
    assert "UnresolvedHint" not in shuffled._jdf.queryExecution().logical().toString()
    assert "ResolvedHint" not in shuffled._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in bcast._jdf.queryExecution().analyzed().toString()


def test_oracle_interleaved_battery_matches_duckdb(spark):
    """Cross-engine gate for the md5-replayable spans fixture: DuckDB rebuilds
    the exact table from the documents parquet and predicts the exact
    violation rows. Regression for the lateral-column-alias capture bug:
    spans hash streams must key off the source long doc_id, not the formatted
    `sid AS doc_id` output alias."""
    import duckdb

    import __spark_entry__ as entry
    from okay_spark.fixtures import oracle_interleaved_documents

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(entry._BATTERY_SPANS_SQL).fetchall()))

    docs = oracle_interleaved_documents(spark.read.parquet(f"{sf}/documents.parquet"))
    out = validate_dataframe(docs, compile_schema(document_schema), id_cols=["doc_id"])
    got = sorted((r["doc_id"], r["path"], r["rule"]) for r in out.collect())
    assert got == want
    assert len(got) > 0  # non-vacuous: defects are present at sf0.001

    # the LCA-capture regression guard: at least one media span must exist
    from pyspark.sql import functions as F

    n_media = docs.select(
        F.sum(F.size(F.filter("spans", lambda s: s["kind"] == "media"))).alias("n")
    ).first()["n"]
    assert n_media and n_media > 0


def test_span_order_violations_semantics_and_plan(spark):
    from okay_spark.checks import span_order_violations

    rows = [
        (1, [(0,), (5,), (9,)]),          # strictly increasing: ok
        (2, [(0,), (5,), (5,)]),          # tie at index 2: strict-only violation
        (3, [(0,), (7,), (3,), (1,)]),    # first offender index 2 (3 <= 7)
        (4, [(4,), (None,), (9,)]),       # null element skipped: ok
        (5, [(8,)]),                      # single span: ok
        (6, []),                          # empty: ok (battery owns min=1)
    ]
    df = spark.createDataFrame(rows, "doc_id int, spans array<struct<offset:int>>")

    strict = {
        (r["doc_id"], r["path"])
        for r in span_order_violations(df, "spans", "offset", id_cols=["doc_id"]).collect()
    }
    assert strict == {(2, "spans[2].offset"), (3, "spans[2].offset")}

    weak = {
        (r["doc_id"], r["path"])
        for r in span_order_violations(
            df, "spans", "offset", id_cols=["doc_id"], strict=False
        ).collect()
    }
    assert weak == {(3, "spans[2].offset")}

    out = span_order_violations(df, "spans", "offset", id_cols=["doc_id"])
    plan = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "Exchange" not in plan and "Python" not in plan


def test_element_rule_semantics_and_plan(spark):
    from okay_spark.checks import element_rule
    from pyspark.sql import functions as F

    rows = [
        (1, [("text", "hi"), ("media", None), ("text", "")]),   # idx 2 fails
        (2, [("text", None), ("text", "x")]),                   # null expect at idx 0 fails
        (3, [(None, None), ("media", None)]),                   # when null/false: ignored
        (4, [("text", ""), ("text", "")]),                      # both indices reported
        (5, []),                                                # empty: ok
    ]
    df = spark.createDataFrame(rows, "doc_id int, spans array<struct<kind:string,text:string>>")
    out = element_rule(
        df,
        "spans",
        when=lambda s: s["kind"] == F.lit("text"),
        expect=lambda s: F.length(s["text"]) > 0,
        field="text",
        id_cols=["doc_id"],
        rule="empty_text_span",
    )
    got = sorted((r["doc_id"], r["path"]) for r in out.collect())
    assert got == [
        (1, "spans[2].text"),
        (2, "spans[0].text"),
        (4, "spans[0].text"),
        (4, "spans[1].text"),
    ]
    assert {r["rule"] for r in out.collect()} == {"empty_text_span"}
    plan = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "Exchange" not in plan and "Python" not in plan


def test_oracle_interleaved_battery_matches_reference_validator(spark, docs, okay_reference):
    """Triple verification for the flagship shape: the md5-replayable spans
    table is checked against DuckDB elsewhere; here every row is ALSO
    validated by the reference okay validator itself — Spark, DuckDB, and
    the original Python library must agree on the same table."""
    from okay import validate  # type: ignore
    from okay.schema import required, optional  # type: ignore
    from okay_spark.fixtures import oracle_interleaved_documents

    table = oracle_interleaved_documents(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    out = validate_dataframe(table, compile_schema(document_schema), id_cols=["doc_id"])
    got: dict[str, set] = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], set()).add((r["rule"], r["path"]))

    def ref_schema():
        required("doc_id", type="string", regex=r"doc-\d{12}")
        required("spans", type="list", min=1)
        required("spans[]", type="object")
        required("spans[].kind", type="string", options=["text", "media"])
        optional("spans[].text", type="string?", min=1)
        optional("spans[].media_ref", type="string?", regex=r"media-\d{8}")
        required("spans[].offset", type="int", min=0)
        optional("part", type="int?")

    mismatches = []
    for row in table.collect():
        doc = row.asDict(recursive=True)
        expect = {(m.type, m.field) for m in validate(ref_schema, doc)}
        if got.get(doc["doc_id"], set()) != expect:
            mismatches.append(doc["doc_id"])
    assert mismatches == []
