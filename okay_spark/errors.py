"""Schema-error type for the okay_spark engine.

Mirrors the reference's error surface (``/root/reference/src/okay/schema_error.py:1-5``):
a single exception class carrying an optional machine-readable ``type`` and the
offending ``field`` path. The full error taxonomy produced by the compiler is:

``optional_not_allowed``, ``already_required``, ``already_optional``,
``already_nullable``, ``already_non_nullable`` (see
``/root/reference/src/okay/schema_compiler.py:17-25,63-89``) plus untyped
errors for invalid type names and broken custom validators.
"""

from __future__ import annotations


class SchemaError(Exception):
    """Raised for any defect in the schema itself (never for bad data)."""

    def __init__(self, message: str, type: str | None = None, field: str | None = None):
        super().__init__(message)
        self.type = type
        self.field = field
