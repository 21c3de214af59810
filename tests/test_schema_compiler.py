"""Compiler conformance: okay_spark.schema vs the reference compiler.

Strategy: a corpus of schema declarations is compiled by BOTH compilers and
the resulting field tables are compared structurally (field set + order,
strictness, nullability, rule types/implicitness/order). Errors are compared
by (exception type, error type, field). This is differential testing against
the reference as oracle — no reference code is copied.

Documented divergences (SURVEY.md §2.3) are asserted explicitly at the end.
"""

from __future__ import annotations

import pytest

from okay_spark.errors import SchemaError
from okay_spark.schema import compile_schema, compile_cached
from okay_spark import schema as dsl

# Each case: (name, [(verb, field, type, kwargs), ...])
CASES = [
    ("single_required", [("required", "a", "string", {})]),
    ("single_optional", [("optional", "a", "number", {})]),
    ("untyped", [("required", "a", None, {})]),
    ("nullable", [("required", "a", "string?", {})]),
    ("nested", [("required", "a.b.c", "int", {})]),
    ("list_elements", [("required", "a[].b", "string", {})]),
    ("nested_lists", [("required", "m[][]", "number", {})]),
    ("list_type", [("required", "a", "list", {"min": 1})]),
    ("optional_list_type", [("optional", "a", "list", {})]),
    ("root", [("required", ".", "object", {})]),
    ("root_int", [("required", ".", "int", {})]),
    (
        "explicit_then_parent",
        [("required", "a", "object?", {}), ("required", "a.b", "string", {})],
    ),
    (
        "parent_then_explicit",
        [("required", "a.b", "string", {}), ("required", "a", "object?", {})],
    ),
    (
        "multi_rule_field",
        [
            ("required", "x", "string", {"min": 5}),
            ("required", "x", "string", {"regex": r"[a-z]+"}),
        ],
    ),
    (
        "string_params",
        [("required", "x", "string", {"regex": r"\d+", "options": ["A", "b"], "case_sensitive": False, "min": 1, "max": 9})],
    ),
    ("number_params", [("required", "x", "number", {"min": 0, "max": 10, "options": [1, 2.5]})]),
    ("int_params", [("optional", "x", "int", {"min": -5})]),
    ("ignore_extra", [("ignore_extra_fields",)]),
    (
        "deep_mixed",
        [
            ("required", "accommodation.ratings[].score", "number", {"min": 0, "max": 10}),
            ("optional", "accommodation.ratings[].aspect", "string", {}),
            ("required", "accommodation.name", "string", {}),
        ],
    ),
    # conflict cases (expected to raise)
    ("conflict_required_then_optional", [("required", "a", "string", {}), ("optional", "a", "string", {})]),
    ("conflict_optional_then_required", [("optional", "a", "string", {}), ("required", "a", "string", {})]),
    ("conflict_nullable", [("required", "a", "string?", {}), ("required", "a", "string", {})]),
    ("conflict_non_nullable", [("required", "a", "string", {}), ("required", "a", "string?", {})]),
    ("optional_root", [("optional", ".", "object", {})]),
    ("bad_type_name", [("required", "a", "datetime", {})]),
    ("conflict_list_elem", [("optional", "a", "list", {}), ("required", "a[]", "string", {})]),
]


def _run_decls(decls, required, optional, ignore_extra_fields):
    def schema_fn():
        for decl in decls:
            if decl[0] == "ignore_extra_fields":
                ignore_extra_fields()
            else:
                verb, field, type_name, kwargs = decl
                fn = required if verb == "required" else optional
                if type_name is None:
                    fn(field, **kwargs)
                else:
                    fn(field, type=type_name, **kwargs)

    return schema_fn


def _ours(decls):
    return compile_schema(_run_decls(decls, dsl.required, dsl.optional, dsl.ignore_extra_fields))


def _reference(decls, okay_reference):
    from okay.schema_compiler import compile as ref_compile  # type: ignore
    from okay.schema import required, optional, ignore_extra_fields  # type: ignore

    return ref_compile(_run_decls(decls, required, optional, ignore_extra_fields))


def _shape(compiled, is_ref):
    fields = {}
    for name, f in compiled.fields.items():
        rules = [
            (r.type, r.nullable, r.is_implicit if is_ref else r.implicit) for r in f.rules
        ]
        fields[name] = (f.strictness, f.nullable, rules)
    order = list(compiled.fields.keys())
    return fields, order, compiled.ignore_extra_fields


@pytest.mark.parametrize("name,decls", CASES, ids=[c[0] for c in CASES])
def test_compiler_parity(name, decls, okay_reference):
    ref_err = our_err = None
    ref = ours = None
    try:
        ref = _reference(decls, okay_reference)
    except Exception as e:  # noqa: BLE001
        ref_err = e
    try:
        ours = _ours(decls)
    except Exception as e:  # noqa: BLE001
        our_err = e

    if ref_err is not None:
        assert our_err is not None, f"reference raised {ref_err!r}, ours succeeded"
        assert type(our_err).__name__ == type(ref_err).__name__
        if isinstance(ref_err, Exception) and hasattr(ref_err, "type"):
            assert getattr(our_err, "type", None) == getattr(ref_err, "type", None)
            assert getattr(our_err, "field", None) == getattr(ref_err, "field", None)
        return

    assert our_err is None, f"ours raised {our_err!r}, reference succeeded"
    assert _shape(ours, is_ref=False) == _shape(ref, is_ref=True)


def test_string_options_folded_when_case_insensitive():
    s = _ours([("required", "x", "string", {"options": ["Ab", "CD"], "case_sensitive": False})])
    rule = s.fields["x"].rules[0]
    assert rule.params["options"] == ["ab", "cd"]


def test_custom_rule_requires_callable():
    with pytest.raises(SchemaError):
        _ours([("required", "x", "custom", {})])
    with pytest.raises(SchemaError):
        _ours([("required", "x", "custom", {"validator": 42})])
    ok = _ours([("required", "x", "custom", {"validator": lambda f, v: None, "limit": 3})])
    assert ok.fields["x"].rules[0].params["kwargs"] == {"limit": 3}


def test_unknown_param_raises_type_error():
    with pytest.raises(TypeError):
        _ours([("required", "x", "string", {"bogus": 1})])
    with pytest.raises(TypeError):
        _ours([("required", "x", "object", {"min": 1})])


def test_compile_cached_wraps_and_caches():
    def bad():
        dsl.required("a", type="nope")

    with pytest.raises(SchemaError) as exc:
        compile_cached(bad)
    assert "Schema raised `SchemaError`." in str(exc.value)

    def good():
        dsl.required("a", type="string")

    assert compile_cached(good) is compile_cached(good)


def test_divergence_implicit_rule_removal_does_not_crash():
    """Reference bug (schema_compiler.py:143 NameError) we deliberately fix:
    an explicit object rule on a field that already has another rule."""
    s = _ours(
        [
            ("required", "a", "custom", {"validator": lambda f, v: None}),
            ("required", "a.b", "string", {}),  # implicit object on 'a'
            ("required", "a", "object", {}),  # explicit object replaces implicit
        ]
    )
    types = [(r.type, r.implicit) for r in s.fields["a"].rules]
    assert ("custom", False) in types
    assert ("object", False) in types
    assert ("object", True) not in types
