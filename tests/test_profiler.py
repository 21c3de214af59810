"""Schema inference (okay_spark/profiler.py): profile -> suggest -> validate.

The reference has no inference; these tests pin the engine-level contract:
the suggested schema round-trips (validates the profiled table clean),
decisions are exact and deterministic, and the rendered source compiles."""

from __future__ import annotations

from okay_spark import compile_schema
from okay_spark.engine import validate_dataframe
from okay_spark.fixtures import interleaved_documents
from okay_spark.profiler import profile_table, render_schema, suggest_schema


def test_roundtrip_interleaved(spark):
    """Inferred schema on the clean north-rule fixture: validates clean,
    recovers the hand-written document_schema's structure (kind options,
    nullable text/media_ref, int offset), and flags injected defects."""
    clean = interleaved_documents(spark, 1500, inject_errors=False)
    s = suggest_schema(clean)
    by_path = {path: (decl, typ, params) for decl, path, typ, params in s.decls}

    assert by_path["doc_id"] == ("required", "string", {})
    assert by_path["spans"][1] == "list"
    assert by_path["spans[]"] == ("required", "object", {})
    assert by_path["spans[].kind"] == ("required", "string", {"options": ["media", "text"]})
    assert by_path["spans[].text"][0] == "optional"
    assert by_path["spans[].text"][1] == "string?"
    assert by_path["spans[].offset"] == ("required", "int", {})

    assert validate_dataframe(clean, s.schema, id_cols=["doc_id"]).count() == 0

    dirty = interleaved_documents(spark, 1500, inject_errors=True)
    rules = {
        r["rule"]
        for r in validate_dataframe(dirty, s.schema, id_cols=["doc_id"]).collect()
    }
    assert "invalid_string_option" in rules and "null_value" in rules


def test_options_boundary_is_exact(spark):
    """options ship iff the EXACT distinct count <= max_options."""
    at = spark.createDataFrame([(f"v{i:02d}",) for i in range(5) for _ in range(3)], "s string")
    over = spark.createDataFrame([(f"v{i:02d}",) for i in range(6)], "s string")
    s_at = suggest_schema(at, max_options=5)
    s_over = suggest_schema(over, max_options=5)
    assert s_at.decls[0][3] == {"options": [f"v{i:02d}" for i in range(5)]}
    assert s_over.decls[0][3] == {}


def test_numeric_and_nullable_decisions(spark):
    df = spark.createDataFrame(
        [(1.0, 0.5, 1, True), (2.0, 1.5, None, False)],
        "whole double, frac double, n int, b boolean",
    )
    by_path = {p: t for _d, p, t, _par in suggest_schema(df).decls}
    assert by_path["whole"] == "int"  # all-whole doubles infer as int
    assert by_path["frac"] == "number"
    assert by_path["n"] == "int?"  # observed nulls -> nullable type
    assert by_path["b"] == "bool"


def test_struct_members_profiled_without_explode(spark):
    df = spark.createDataFrame(
        [((1, "a"),), ((2, None),)], "m struct<x: bigint, y: string>"
    )
    by_path = {p: (d, t) for d, p, t, _par in suggest_schema(df).decls}
    assert by_path["m"] == ("required", "object")
    assert by_path["m.x"] == ("required", "int")
    assert by_path["m.y"] == ("required", "string?")


def test_bounds_opt_in(spark):
    df = spark.createDataFrame([(3,), (9,)], "n bigint")
    s = suggest_schema(df, bounds=True, strict=False)
    assert s.decls[0][3] == {"min": 3, "max": 9}
    v = validate_dataframe(
        spark.createDataFrame([(1, 11)], "doc_id int, n bigint"), s.schema, id_cols=["doc_id"]
    )
    assert [r["rule"] for r in v.collect()] == ["number_too_large"]


def test_rendered_source_compiles_and_matches(spark):
    clean = interleaved_documents(spark, 300, inject_errors=False)
    s = suggest_schema(clean)
    ns: dict = {}
    exec(s.source, ns)  # noqa: S102 - rendered source is our own output
    compiled = compile_schema(ns["inferred_schema"])
    assert set(compiled.fields) - {"."} == {path for _d, path, _t, _p in s.decls}


def test_profile_evidence(spark):
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "b")], "n bigint, s string")
    profs = {p.path: p for p in profile_table(df)}
    assert profs["n"].n_rows == 3 and profs["n"].n_nulls == 0
    assert profs["n"].min_num == 1.0 and profs["n"].max_num == 3.0
    assert profs["s"].n_nulls == 1 and profs["s"].options == ["a", "b"]


def test_render_schema_plain():
    src = render_schema(
        [("required", "a", "string", {"options": ["x"]}), ("optional", "b", "int?", {})],
        strict=False,
    )
    assert "required('a', type='string', options=['x'])" in src
    assert "optional('b', type='int?')" in src
    assert "ignore_extra_fields()" in src
