"""okay_spark — a PySpark-native schema + constraint validation engine.

Re-imagines the reference dict validator (williamwilling/okay, read-only at
/root/reference) as a distributed, columnar system: the okay schema DSL
compiles on the driver into a plain-data rule table, which lowers to native
Spark Column expressions (zero per-row Python) producing a violations
DataFrame ``(id..., path, rule, expected)``; engine-level checks okay never
had (column stats, uniqueness, referential integrity, distribution drift)
live in :mod:`okay_spark.checks`.
"""

from .errors import SchemaError
from .messages import Message, expected_json, parse_expected
from .schema import (
    CompiledSchema,
    FieldSpec,
    Rule,
    compile_cached,
    compile_schema,
    ignore_extra_fields,
    optional,
    required,
)

from .dynamic import validate, validate_document, validate_json
from .validators import (
    AnyValidator,
    BoolValidator,
    CustomValidator,
    IntValidator,
    ListValidator,
    NumberValidator,
    ObjectValidator,
    StringValidator,
)

__all__ = [
    "AnyValidator",
    "BoolValidator",
    "CustomValidator",
    "IntValidator",
    "ListValidator",
    "NumberValidator",
    "ObjectValidator",
    "StringValidator",
    "validate",
    "validate_document",
    "validate_json",
    "SchemaError",
    "Message",
    "expected_json",
    "parse_expected",
    "CompiledSchema",
    "FieldSpec",
    "Rule",
    "compile_schema",
    "compile_cached",
    "required",
    "optional",
    "ignore_extra_fields",
]

__version__ = "0.1.0"
