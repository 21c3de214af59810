"""Run the REFERENCE's own test suite against okay_spark.

The strongest parity proof available: ALL 209 of the reference's tests —
the 87 golden end-to-end tests (``test_validator.py``, the conformance
contract per SURVEY.md §5), the 38 schema-compiler tests, the 66
type-validator unit tests, and the 18 ``test_index.py`` unit tests —
execute unmodified, with ``okay`` aliased to okay_spark's drop-in surfaces
(``okay_spark.dynamic.validate``/``create_index``, ``okay_spark.validators``,
the okay-compatible ``Message``/``SchemaError`` and schema DSL). No
reference code is copied — the tests run from their original location,
read-only.

``test_index.py`` runs against :func:`okay_spark.dynamic.create_index`, a
thin ``Index``-shaped view over the interpreter's ``_build_index`` walk —
the engine itself never builds a per-document index (the document walk is a
columnar plan), but the walk's semantics are now unit-verified directly in
addition to the end-to-end coverage.

Pre-registering the alias modules in ``sys.modules`` takes precedence over
the reference's own ``src/`` path that its conftest inserts.

Run: python scripts/reference_suite.py   (exit 0 = full parity)
"""

from __future__ import annotations

import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONDONTWRITEBYTECODE"] = "1"  # never write into /root/reference
sys.dont_write_bytecode = True

import okay_spark.validators as validators  # noqa: E402
from okay_spark.dynamic import validate  # noqa: E402
from okay_spark.errors import SchemaError  # noqa: E402
from okay_spark.messages import Message  # noqa: E402
from okay_spark.schema import ignore_extra_fields, optional, required  # noqa: E402

okay = types.ModuleType("okay")
okay.validate = validate
okay.SchemaError = SchemaError
okay.Message = Message

okay_schema = types.ModuleType("okay.schema")
okay_schema.required = required
okay_schema.optional = optional
okay_schema.ignore_extra_fields = ignore_extra_fields
okay_schema.__all__ = ["required", "optional", "ignore_extra_fields"]
okay.schema = okay_schema

okay_message = types.ModuleType("okay.message")
okay_message.Message = Message
okay.message = okay_message

okay_tv = types.ModuleType("okay.type_validators")
for _name in validators.__all__:
    setattr(okay_tv, _name, getattr(validators, _name))
okay.type_validators = okay_tv

okay_sc = types.ModuleType("okay.schema_compiler")
okay_sc.required = required
okay_sc.optional = optional
okay_sc.compile = validators.compile
okay.schema_compiler = okay_sc

from okay_spark.dynamic import Index, IndexEntry, create_index  # noqa: E402

okay_index = types.ModuleType("okay.index")
okay_index.Index = Index
okay_index.IndexEntry = IndexEntry
okay_index.create_index = create_index
okay.index = okay_index

sys.modules["okay"] = okay
sys.modules["okay.schema"] = okay_schema
sys.modules["okay.message"] = okay_message
sys.modules["okay.type_validators"] = okay_tv
sys.modules["okay.schema_compiler"] = okay_sc
sys.modules["okay.index"] = okay_index

FILES = [
    "test_index.py",
    "test_validator.py",
    "test_schema_compiler.py",
    "test_string_validator.py",
    "test_number_validator.py",
    "test_int_validator.py",
    "test_list_validator.py",
    "test_custom_validator.py",
    "test_bool_validator.py",
    "test_object_validator.py",
]

import pytest  # noqa: E402

sys.exit(
    pytest.main(
        ["-q", "-p", "no:cacheprovider", "--rootdir", "/tmp"]
        + [f"/root/reference/tests/{f}" for f in FILES]
        + sys.argv[1:]
    )
)
