"""Property-based differential conformance: random schemas x random documents,
the reference validator as the oracle.

Covers the full dynamic surface (okay-parity interpreter,
``okay_spark.dynamic.validate_document``) plus compiler conflict parity.
Comparison is the multiset of ``(message type, instance path, expected)``
triples — the reference's message identity (``docs/reference.md:79-89``),
including multiplicity (a field with two rules emits two ``null_value``
messages on null, ``validator.py:44-54``).

Generation deliberately avoids the reference's documented crash bugs, which
our engine diverges from on purpose (SURVEY.md §2.3):

- ``float('inf')``/``nan`` under int rules (``int_validator.py:10`` raises
  ``OverflowError``/``ValueError``) — no non-finite floats are generated;
- the ``NameError`` in ``Field.remove_implicit_rule_for``
  (``schema_compiler.py:143``) — declarations are ordered so explicit
  ``object``/``list`` rules always precede any other rule on the same field;
- the defaultdict-mutation ``RuntimeError`` in ``_report_missing_fields``
  (``validator.py:82``, triggered by ``None`` elements inside lists with
  declared children) — such oracle runs are skipped via ``assume``.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, assume, given, settings, strategies as st

from okay_spark.dynamic import validate_document
from okay_spark.errors import SchemaError
from okay_spark.messages import parse_expected
from okay_spark import schema as dsl
from okay_spark.schema import compile_schema

# --------------------------------------------------------------------------
# strategies
# --------------------------------------------------------------------------

NAMES = ["a", "b", "c", "d"]
EXTRA_KEYS = NAMES + ["z"]

_segment = st.builds(
    lambda n, k: n + "[]" * k, st.sampled_from(NAMES), st.integers(0, 2)
)
_path = st.lists(_segment, min_size=1, max_size=3).map(".".join)

_REGEXES = [r"\d+", r"[a-z]{2,4}", r"x.*y", r"src[0-5]"]
_STR_POOL = ["en", "fr", "DE", "xy", "x123y", "12", "abcd", "", "source x"]
_NUM_POOL = [0, 1, -3, 7, 10, 0.5, 1.0, 2.5, -0.25, 1000]

_string_kwargs = st.fixed_dictionaries(
    {},
    optional={
        "regex": st.sampled_from(_REGEXES),
        "options": st.lists(st.sampled_from(_STR_POOL), max_size=3),
        "case_sensitive": st.booleans(),
        "min": st.integers(0, 6),
        "max": st.integers(0, 8),
    },
)
_number_kwargs = st.fixed_dictionaries(
    {},
    optional={
        "min": st.sampled_from(_NUM_POOL),
        "max": st.sampled_from(_NUM_POOL),
        "options": st.lists(st.sampled_from(_NUM_POOL), max_size=3),
    },
)
_list_kwargs = st.fixed_dictionaries(
    {}, optional={"min": st.integers(0, 3), "max": st.integers(0, 4)}
)


@st.composite
def _declaration(draw):
    path = draw(_path)
    type_name = draw(
        st.sampled_from(
            [None, "any", "bool", "int", "number", "string", "list", "object"]
        )
    )
    if type_name == "string":
        kwargs = draw(_string_kwargs)
    elif type_name in ("int", "number"):
        kwargs = draw(_number_kwargs)
    elif type_name == "list":
        kwargs = draw(_list_kwargs)
    else:
        kwargs = {}
    nullable = draw(st.booleans()) if type_name is not None else False
    required_flag = draw(st.booleans())
    return (required_flag, path, type_name, nullable, kwargs)


@st.composite
def _schema_decls(draw):
    decls = draw(st.lists(_declaration(), min_size=1, max_size=6))
    # one declaration per path (reference re-declaration conflicts are
    # exercised separately in test_conflict_parity)
    seen, unique = set(), []
    for d in decls:
        if d[1] not in seen:
            seen.add(d[1])
            unique.append(d)
    # explicit object/list declarations first, parents before children:
    # prevents the reference's remove_implicit_rule_for NameError while
    # keeping every conflict-free shape reachable
    containers = sorted(
        (d for d in unique if d[2] in ("object", "list")),
        key=lambda d: (len(d[1]), d[1]),
    )
    others = [d for d in unique if d[2] not in ("object", "list")]
    return containers + others


def _decls_to_fn(decls, required, optional):
    def schema_fn():
        for required_flag, path, type_name, nullable, kwargs in decls:
            fn = required if required_flag else optional
            if type_name is None:
                fn(path, **kwargs)
            else:
                fn(path, type=type_name + ("?" if nullable else ""), **kwargs)

    return schema_fn


_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-10, 1000),
    st.sampled_from([0.5, 1.0, 2.5, -0.25, 3.14159, 1e6]),
    st.sampled_from(_STR_POOL),
)
_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.sampled_from(EXTRA_KEYS), children, max_size=3),
    ),
    max_leaves=12,
)
_document = st.one_of(
    st.dictionaries(st.sampled_from(EXTRA_KEYS), _value, max_size=4),
    _scalar,
    st.lists(_scalar, max_size=3),
)


# --------------------------------------------------------------------------
# oracle plumbing
# --------------------------------------------------------------------------


def _freeze(expected):
    if expected is None:
        return None
    out = []
    for k, v in sorted(expected.items()):
        out.append((k, tuple(v) if isinstance(v, list) else v))
    return tuple(out)


def _oracle_multiset(okay_reference, decls, doc):
    """Run the reference; returns (raised, Counter-of-messages)."""
    from okay import validate  # type: ignore
    from okay.schema import optional, required  # type: ignore

    fn = _decls_to_fn(decls, required, optional)
    try:
        msgs = validate(fn, doc)
    except SchemaError:
        raise
    except Exception as e:  # okay's own SchemaError class, or crash bugs
        if type(e).__name__ == "SchemaError":
            return True, None
        raise
    return False, Counter(
        (m.type, m.field, _freeze(getattr(m, "expected", None))) for m in msgs
    )


def _engine_multiset(decls, doc):
    fn = _decls_to_fn(decls, dsl.required, dsl.optional)
    try:
        compiled = compile_schema(fn)
    except Exception:
        return True, None
    return False, Counter(
        (rule, path, _freeze(parse_expected(expected)))
        for rule, path, expected in validate_document(compiled, doc)
    )


# --------------------------------------------------------------------------
# properties
# --------------------------------------------------------------------------


@settings(
    max_examples=400,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)
@given(decls=_schema_decls(), doc=_document)
def test_dynamic_interpreter_matches_reference(okay_reference, decls, doc):
    try:
        ref_raised, ref_msgs = _oracle_multiset(okay_reference, decls, doc)
    except RuntimeError:
        # reference defaultdict-mutation crash (validator.py:82) — documented
        # divergence, engine behavior covered by explicit unit tests
        assume(False)
        return
    eng_raised, eng_msgs = _engine_multiset(decls, doc)
    assert ref_raised == eng_raised, (
        f"schema-error parity: reference raised={ref_raised} engine "
        f"raised={eng_raised} decls={decls}"
    )
    if not ref_raised:
        assert eng_msgs == ref_msgs, (
            f"decls={decls}\ndoc={doc!r}\n"
            f"engine-only={eng_msgs - ref_msgs}\nreference-only={ref_msgs - eng_msgs}"
        )


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)
@given(decls=_schema_decls(), doc=_document)
def test_dropin_validate_matches_reference_in_order(okay_reference, decls, doc):
    """okay_spark.validate is a drop-in for okay.validate: same Message
    stream in the SAME ORDER (rule scan in traversal order -> missing fields
    in schema order -> extra fields in document order, ``validator.py:7-16``),
    including expected payloads and message_values stamping."""
    from okay import validate as ref_validate  # type: ignore
    from okay.schema import optional as r_opt, required as r_req  # type: ignore

    from okay_spark import validate as our_validate

    stamp = {"doc_no": 7}
    try:
        ref = ref_validate(_decls_to_fn(decls, r_req, r_opt), doc, stamp)
    except RuntimeError:
        assume(False)
        return
    except Exception as e:
        if type(e).__name__ != "SchemaError":
            raise
        with pytest.raises(SchemaError):
            our_validate(_decls_to_fn(decls, dsl.required, dsl.optional), doc, stamp)
        return
    got = our_validate(_decls_to_fn(decls, dsl.required, dsl.optional), doc, stamp)
    ref_t = [
        (m.type, m.field, _freeze(getattr(m, "expected", None)), m.doc_no) for m in ref
    ]
    got_t = [
        (m.type, m.field, _freeze(getattr(m, "expected", None)), m.doc_no) for m in got
    ]
    assert got_t == ref_t, f"decls={decls}\ndoc={doc!r}"


@st.composite
def _conflicting_decls(draw):
    """Pairs of declarations on the SAME path — the conflict surface."""
    base = draw(_declaration())
    other = draw(_declaration())
    # same path, independent strictness/type/nullability; exclude explicit
    # object/list on the second decl (reference NameError bug territory)
    other = (other[0], base[1], None if other[2] in ("object", "list") else other[2], other[3], other[4])
    return [base, other]


@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)
@given(decls=_conflicting_decls(), doc=_document)
def test_conflict_parity(okay_reference, decls, doc):
    try:
        ref_raised, ref_msgs = _oracle_multiset(okay_reference, decls, doc)
    except RuntimeError:
        assume(False)
        return
    eng_raised, eng_msgs = _engine_multiset(decls, doc)
    assert ref_raised == eng_raised, f"decls={decls}"
    if not ref_raised:
        assert eng_msgs == ref_msgs, (
            f"decls={decls}\ndoc={doc!r}\n"
            f"engine-only={eng_msgs - ref_msgs}\nreference-only={ref_msgs - eng_msgs}"
        )


# --------------------------------------------------------------------------
# per-validator kernels vs the reference validator classes (O9-O14)
# --------------------------------------------------------------------------

_kernel_value = st.one_of(
    _scalar, st.lists(_scalar, max_size=5), st.dictionaries(st.sampled_from(NAMES), _scalar, max_size=2)
)


@settings(max_examples=500, deadline=None)
@given(kwargs=_string_kwargs, value=_kernel_value)
def test_string_kernel_matches_reference(okay_reference, kwargs, value):
    _assert_kernel_parity("string", kwargs, value)


@settings(max_examples=500, deadline=None)
@given(kwargs=_number_kwargs, value=_kernel_value)
def test_number_kernel_matches_reference(okay_reference, kwargs, value):
    _assert_kernel_parity("number", kwargs, value)


@settings(max_examples=500, deadline=None)
@given(kwargs=_number_kwargs, value=_kernel_value)
def test_int_kernel_matches_reference(okay_reference, kwargs, value):
    _assert_kernel_parity("int", kwargs, value)


@settings(max_examples=300, deadline=None)
@given(kwargs=_list_kwargs, value=_kernel_value)
def test_list_kernel_matches_reference(okay_reference, kwargs, value):
    _assert_kernel_parity("list", kwargs, value)


@settings(max_examples=200, deadline=None)
@given(value=_kernel_value)
def test_bool_object_kernels_match_reference(okay_reference, value):
    _assert_kernel_parity("bool", {}, value)
    _assert_kernel_parity("object", {}, value)


def _assert_kernel_parity(type_name, kwargs, value):
    from okay.type_validators import (  # type: ignore
        BoolValidator,
        IntValidator,
        ListValidator,
        NumberValidator,
        ObjectValidator,
        StringValidator,
    )

    builders = {
        "string": StringValidator,
        "number": NumberValidator,
        "int": IntValidator,
        "list": ListValidator,
        "bool": BoolValidator,
        "object": ObjectValidator,
    }
    ref = builders[type_name]("f", **kwargs)("f", value)
    ref_triple = (
        None
        if ref is None
        else (ref.type, ref.field, _freeze(getattr(ref, "expected", None)))
    )

    def schema_fn():
        dsl.required("f", type=type_name, **kwargs)

    rule = next(r for r in compile_schema(schema_fn).fields["f"].rules if not r.implicit)
    from okay_spark.dynamic import _check_rule

    got = _check_rule(rule, "f", value)
    got_triple = (
        None if got is None else (got[0], got[1], _freeze(parse_expected(got[2])))
    )
    assert got_triple == ref_triple, f"{type_name} kwargs={kwargs} value={value!r}"


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
