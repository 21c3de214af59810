"""Table-level schema reconciliation (schema_table_diff): static missing /
unresolvable / extra detection against the Spark schema, zero rows scanned."""

from __future__ import annotations


def _diff(spark, ddl, schema_fn):
    from okay_spark.checks import schema_table_diff

    df = spark.createDataFrame([], ddl)
    return {(r["path"], r["rule"]) for r in schema_table_diff(df, schema_fn).collect()}


def test_missing_required_column(spark):
    def schema():
        from okay_spark import ignore_extra_fields, required

        required("title", type="string")
        required("n", type="int")
        ignore_extra_fields()

    got = _diff(spark, "n bigint", schema)
    assert got == {("title", "missing_field")}


def test_unresolvable_optional_and_nested(spark):
    def schema():
        from okay_spark import optional, required

        required("a.b", type="string")
        optional("a.c", type="int")

    got = _diff(spark, "a struct<b string>", schema)
    assert got == {("a.c", "unresolvable_field")}


def test_extra_topmost_only(spark):
    def schema():
        from okay_spark import required

        required("a.b", type="string")

    got = _diff(spark, "a struct<b string, junk struct<deep string>>, stray string", schema)
    # junk reported once (topmost), its subtree never walked; stray reported
    assert got == {("a.junk", "extra_field"), ("stray", "extra_field")}


def test_ignore_extra_fields_suppresses(spark):
    def schema():
        from okay_spark import ignore_extra_fields, required

        required("a", type="int")
        ignore_extra_fields()

    got = _diff(spark, "a bigint, stray string", schema)
    assert got == set()


def test_array_and_map_segments(spark):
    def schema():
        from okay_spark import required

        required("spans", type="list")
        required("spans[].kind", type="string")
        required("meta.k1", type="string")

    ddl = (
        "spans array<struct<kind string, extra_member int>>, "
        "meta map<string, string>"
    )
    got = _diff(spark, ddl, schema)
    # array element member undeclared -> extra; map keys are open -> nothing
    assert got == {("spans[].extra_member", "extra_field")}


def test_clean_table_no_rows(spark):
    def schema():
        from okay_spark import required

        required("doc_id", type="int")
        required("text", type="string")
        required("lang", type="string")
        required("source", type="string")
        required("n_chars", type="int")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from okay_spark.checks import schema_table_diff

    assert schema_table_diff(docs, schema).count() == 0
