"""Dynamic (raw JSON) validation vs the reference — the okay-parity surface
for documents a fixed Spark schema cannot express: heterogeneous types,
truly absent keys, arbitrary extra keys, varying shapes per row."""

from __future__ import annotations

import json

import pytest

from okay_spark import compile_schema
from okay_spark import schema as dsl
from okay_spark.dynamic import validate_document, validate_json

DOCS = [
    {"a": 1, "b": "xx", "spans": [{"kind": "text", "off": 0}]},
    {"a": "not-an-int", "b": 5, "spans": "not-a-list"},          # heterogeneous types
    {"b": "xx"},                                                  # absent required key
    {"a": 2.0, "b": "xx", "spans": [], "zz": {"deep": 1}},       # 2.0-is-int + extra subtree
    {"a": True, "b": "xx", "spans": [{"kind": "bogus"}, 7]},     # bool-as-int + bad element
    {"a": None, "b": None, "spans": [{"kind": None, "off": -3}]},
    {"a": 3, "b": "toolongvalue", "spans": [{"kind": "text", "off": 1, "extra_in_elem": 9}]},
    5,                                                            # non-dict root
    {},                                                           # empty doc
    {"a": 1, "b": "xx", "spans": [[1, 2]]},                      # list where object expected
]


def _decls(required, optional, ignore=None):
    required("a", type="int", min=0, max=100)
    required("b", type="string", min=1, max=8)
    optional("spans", type="list", min=1)
    optional("spans[].kind", type="string", options=["text", "media"])
    optional("spans[].off", type="int?", min=0)


def _freeze(expected):
    if expected is None:
        return None
    return tuple(sorted((k, tuple(v) if isinstance(v, list) else v) for k, v in expected.items()))


@pytest.mark.parametrize("i", range(len(DOCS)))
def test_validate_document_matches_okay(okay_reference, i):
    from okay import validate  # type: ignore
    from okay.schema import required, optional  # type: ignore

    doc = DOCS[i]

    def ref_schema():
        _decls(required, optional)

    expect = [
        (m.type, m.field, _freeze(getattr(m, "expected", None)))
        for m in validate(ref_schema, doc)
    ]
    compiled = compile_schema(lambda: _decls(dsl.required, dsl.optional))
    got = [
        (rule, path, _freeze(json.loads(exp)) if exp else None)
        for rule, path, exp in validate_document(compiled, doc)
    ]
    assert got == expect  # exact list equality: same messages, same order


def test_validate_json_dataframe(spark, okay_reference):
    from okay import validate  # type: ignore
    from okay.schema import required, optional  # type: ignore

    rows = [(i, json.dumps(d)) for i, d in enumerate(DOCS)]
    rows.append((len(DOCS), "{not json"))
    rows.append((len(DOCS) + 1, None))
    df = spark.createDataFrame(rows, "doc_id int, body string")

    out = validate_json(df, "body", lambda: _decls(dsl.required, dsl.optional), id_cols=["doc_id"])
    got: dict[int, set] = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], set()).add((r["rule"], r["path"]))

    def ref_schema():
        _decls(required, optional)

    for i, doc in enumerate(DOCS):
        expect = {(m.type, m.field) for m in validate(ref_schema, doc)}
        assert got.get(i, set()) == expect, f"doc {i}"
    assert got[len(DOCS)] == {("invalid_json", ".")}
    assert got[len(DOCS) + 1] == {("invalid_json", ".")}
