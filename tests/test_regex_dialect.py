"""Python-regex dialect auto-routing (round-2 guard).

The columnar battery evaluates regex rules in Java's dialect (`rlike`); the
reference runs Python `re.fullmatch` (string_validator.py:7,36). Patterns
using Python-only constructs — `(?P<name>...)`, `(?P=name)`, `(?#...)`,
conditionals, a/u/L inline flags, `\\Z` — are detected at COMPILE time and
the whole rule auto-routes to the Arrow pass, which runs Python `re`
exactly. Round 1 documented this divergence; this file makes it enforced
behavior: a user porting a real okay schema with such a regex gets the
reference's answers, not silent Java-dialect drift.
"""

from __future__ import annotations

import pytest

from okay_spark.engine import validate_dataframe
from okay_spark.schema import _PY_ONLY_REGEX, compile_schema


@pytest.mark.parametrize(
    "pattern",
    [
        r"(?P<h>\d+)h",
        r"(?P<a>x)(?P=a)",
        r"ab(?#comment)c",
        r"(?a)\w+",
        r"(?i:x)(?u)y",
        r"abc\Z",
        r"a\\\Z",  # escaped backslash then \Z -> still the \Z anchor
    ],
)
def test_python_only_constructs_detected(pattern):
    assert _PY_ONLY_REGEX.search(pattern), pattern


@pytest.mark.parametrize(
    "pattern",
    [
        r"src[0-5]",
        r"(?:ab|cd)+e?",
        r"^a.b$",
        r"(?i)hello",
        r"(?<name>x)",  # Java-style named group is NOT Python-only
        r"a\\Z",  # escaped backslash + literal Z, not the anchor
        r"\d{2}:\d{2}",
    ],
)
def test_shared_dialect_stays_native(pattern):
    assert not _PY_ONLY_REGEX.search(pattern), pattern


def test_compile_flags_python_regex():
    from okay_spark.rules import is_arrow_routed

    def schema():
        from okay_spark import required

        required("a", type="string", regex=r"(?P<h>\d+)h")
        required("b", type="string", regex=r"b+")

    compiled = compile_schema(schema)
    assert is_arrow_routed(compiled.fields["a"].rules[0]) is True
    assert is_arrow_routed(compiled.fields["b"].rules[0]) is False
    # params stay reference-shaped: no internal routing keys leak into the
    # validator-constructor surface
    assert "python_regex" not in compiled.fields["a"].rules[0].params


def _dur_schema_for(required, ignore_extra_fields):
    def schema():
        required("dur", type="string", regex=r"(?P<h>\d+)h")
        ignore_extra_fields()

    return schema


def test_python_regex_routes_to_arrow_and_matches_reference(spark, okay_reference):
    import okay_spark as dsl
    from okay.schema import ignore_extra_fields as r_ief, required as r_req  # type: ignore

    docs = spark.createDataFrame(
        [(1, "12h"), (2, "xh"), (3, None), (4, "7h"), (5, "h")],
        "doc_id bigint, dur string",
    )
    out = validate_dataframe(
        docs, _dur_schema_for(dsl.required, dsl.ignore_extra_fields), id_cols=["doc_id"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # the rule body runs under Python re

    got = {(r["doc_id"], r["path"], r["rule"]) for r in out.collect()}
    want = set()
    ref_schema = _dur_schema_for(r_req, r_ief)
    for row in docs.collect():
        msgs = okay_reference.validate(ref_schema, {"doc_id": row["doc_id"], "dur": row["dur"]})
        for m in msgs:
            want.add((row["doc_id"], m.field, m.type))
    assert want  # fixture must actually exercise failures
    assert got == want


def test_unicode_and_newline_regex_parity_vs_reference(spark, okay_reference):
    """Two Java-vs-Python traps, verified fixed against the reference by
    execution: Python \\d matches Unicode digits (Java defaults to ASCII —
    (?U) aligns it); Python fullmatch rejects a trailing newline (Java
    ^...$ would accept it — \\A..\\z aligns it)."""
    from okay.schema import ignore_extra_fields as r_ief, required as r_req  # type: ignore

    import okay_spark as dsl

    def make(required, ief):
        def schema():
            required("v", type="string", regex=r"\d+")
            ief()

        return schema

    docs = spark.createDataFrame([(1, "123"), (2, "١٢٣"), (3, "12\n"), (4, "x1")],
                                 "doc_id bigint, v string")
    out = validate_dataframe(docs, make(dsl.required, dsl.ignore_extra_fields),
                             id_cols=["doc_id"])
    got = {r["doc_id"] for r in out.collect()}
    want = set()
    ref_schema = make(r_req, r_ief)
    for row in docs.collect():
        if okay_reference.validate(ref_schema, {"doc_id": row["doc_id"], "v": row["v"]}):
            want.add(row["doc_id"])
    assert got == want
    assert 2 not in got  # unicode digits accepted, like Python re
    assert 3 in got  # trailing newline rejected, like Python fullmatch


@pytest.mark.parametrize(
    "pattern",
    [r"doc-\d{12}", r"media-\d{8}", r"src[0-5]", r"[0-2]\d:[0-2]\d", r"ab{3}c\.x"],
)
def test_fast_prefilter_is_sound_subset(spark, pattern):
    """The native fixed-width prefilter may only accept strings Python
    re.fullmatch accepts (no false positives); engine pass/fail must equal
    Python exactly with the prefilter in front."""
    import random
    import re as pyre

    from pyspark.sql import functions as F

    from okay_spark.rules import regex_fast_prefilter

    rng = random.Random(42)
    alphabet = "abcdxz0157-.:\n ١"
    samples = {"", "doc-000000000000", "media-00000000", "src3", "12:04", "abbbc.x"}
    for _ in range(300):
        samples.add("".join(rng.choice(alphabet) for _ in range(rng.randint(0, 18))))
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    fast = regex_fast_prefilter(pattern, F.col("s"))
    assert fast is not None
    rows = df.select(
        "s", fast.alias("fast"), F.col("s").rlike(f"(?U)\\A(?:{pattern})\\z").alias("full")
    ).collect()
    for r in rows:
        want = bool(pyre.fullmatch(pattern, r["s"]))
        assert (r["fast"] or r["full"]) == want, (pattern, repr(r["s"]))
        if r["fast"]:
            assert want, f"false positive: {pattern} {r['s']!r}"


@pytest.mark.parametrize(
    "pattern",
    [r"a|b", r"a+", r"(ab)c", r"\w+", r"a{2,4}", r"[^ab]", r"a*", r".x"],
)
def test_fast_prefilter_bails_outside_subset(pattern):
    from pyspark.sql import functions as F

    from okay_spark.rules import regex_fast_prefilter

    assert regex_fast_prefilter(pattern, F.col("s")) is None


def test_native_regex_battery_stays_python_free(spark):
    docs = spark.createDataFrame([(1, "src3"), (2, "nope")], "doc_id bigint, source string")

    def schema():
        from okay_spark import ignore_extra_fields, required

        required("source", type="string", regex=r"src[0-5]")
        ignore_extra_fields()

    out = validate_dataframe(docs, schema, id_cols=["doc_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert {r["doc_id"] for r in out.collect()} == {2}
