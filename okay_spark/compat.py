"""Arrow-batched evaluation of ``custom`` rules (reference operator O16).

okay's extension point is a user callable ``(field, value, **kwargs) ->
Message | None`` (``/root/reference/src/okay/type_validators/custom_validator.py:17-26``).
Arbitrary Python cannot lower to Column expressions, so custom rules run as
vectorized ``pandas_udf``\\ s: Arrow ships the relevant top-level column to
Python in batches, the UDF walks each value down the remaining path steps
(mirroring the index fan-out, ``index.py:37-51``) and applies the callable,
returning an ``array<violation>`` that the engine concatenates with the
native battery. Everything else in the battery stays JVM-side.

Error semantics mirror the reference: a custom callable that raises, or
returns something other than ``Message``/``None``, aborts the run with a
``SchemaError`` carrying the same message text (``custom_validator.py:21-24``)
— surfaced as a task failure in a distributed run.
"""

from __future__ import annotations

import math
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

from .errors import SchemaError
from .messages import Message, expected_json
from .paths import ELEM, ROOT, Name, Step, parse_path
from .rules import VIOL_ARRAY_DDL
from .schema import CompiledSchema, Rule


def _to_py(value: Any, dtype: DataType) -> Any:
    """Arrow/pandas value -> plain-Python value, driven by the Spark type."""
    if value is None:
        return None
    if isinstance(dtype, StructType):
        if isinstance(value, float) and math.isnan(value):  # null struct in some paths
            return None
        return {f.name: _to_py(value.get(f.name), f.dataType) for f in dtype.fields}
    if isinstance(dtype, ArrayType):
        return [_to_py(v, dtype.elementType) for v in value]
    if isinstance(dtype, MapType):
        items = value.items() if isinstance(value, dict) else value
        return {k: _to_py(v, dtype.valueType) for k, v in items}
    if hasattr(value, "item"):  # numpy scalar
        return value.item()
    return value


def _walk(value: Any, steps: list[Step], path: str, out: list[tuple[str, Any]]) -> None:
    """Instance fan-out for the remaining path steps (mirrors index.py)."""
    if not steps:
        out.append((path, value))
        return
    step, rest = steps[0], steps[1:]
    if step is ELEM:
        if isinstance(value, list):
            for i, elem in enumerate(value):
                _walk(elem, rest, f"{path}[{i}]", out)
        return
    assert isinstance(step, Name)
    if isinstance(value, dict) and step.name in value:
        _walk(value[step.name], rest, f"{path}.{step.name}", out)


def _apply_custom(rule: Rule, ipath: str, value: Any, seq: int) -> dict | None:
    fn = rule.params["validator"]
    kwargs = rule.params["kwargs"]
    try:
        message = fn(ipath, value, **kwargs)
    except Exception as e:  # noqa: BLE001 - parity with reference
        raise SchemaError(
            f"Custom validation function `{fn.__name__}()` specified for field "
            f"'{ipath}' raised exception `{type(e).__name__}`."
        ) from e
    if message is None:
        return None
    if not isinstance(message, Message) and type(message).__name__ != "Message":
        raise SchemaError(
            f"Custom validation function `{fn.__name__}()` specified for field "
            f"'{ipath}' must return a `Message` object, but it returned a "
            f"`{type(message).__name__}` object instead."
        )
    return {
        "path": getattr(message, "field", ipath),
        "rule": message.type,
        "expected": expected_json(getattr(message, "expected", None)),
        "seq": seq,
    }


def custom_violation_arrays(
    df_schema: StructType, compiled: CompiledSchema
) -> list[Column]:
    """One array<violation> Column per field that carries custom rules.

    The relevant top-level column is wrapped in ``struct(v := col)`` before
    crossing Arrow: Spark hands struct columns to a pandas_udf as a
    ``pd.DataFrame`` of field columns, and the wrapper keeps top-level
    null-ness observable (a bare null struct would otherwise be
    indistinguishable from a struct of nulls). Known Arrow artifact: a null
    double *inside* a struct surfaces as NaN, not None — custom callables
    comparing against such fields see ``nan`` where the reference sees
    ``None`` (documented divergence; comparisons involving NaN are False
    either way)."""
    arrays: list[Column] = []
    for fidx, (path, spec) in enumerate(compiled.fields.items()):
        custom_rules = [
            (fidx * 1_000 + ridx, rule)
            for ridx, rule in enumerate(spec.rules)
            if rule.type == "custom"
        ]
        if not custom_rules:
            continue
        steps = parse_path(path)
        if path == ROOT:
            top_dt: DataType = df_schema
            inner = F.struct(*[F.col("`" + c + "`").alias(c) for c in df_schema.names])
            base_path, rest = ROOT, []
        else:
            head = steps[0]
            assert isinstance(head, Name)
            if head.name not in df_schema.names:
                continue  # no instances (column statically absent)
            top_dt = df_schema[head.name].dataType
            inner = F.col("`" + head.name + "`")
            base_path, rest = head.name, steps[1:]
        wrapped = F.struct(inner.alias("v"))

        def make_udf(rules=custom_rules, dtype=top_dt, base=base_path, rem=rest):
            @F.pandas_udf(VIOL_ARRAY_DDL)
            def run(col: pd.DataFrame) -> pd.Series:
                results = []
                for rec in col.to_dict("records"):
                    value = _to_py(rec.get("v"), dtype)
                    instances: list[tuple[str, Any]] = []
                    _walk(value, rem, base, instances)
                    viols = [
                        v
                        for ipath, val in instances
                        if val is not None
                        for seq, rule in rules
                        if (v := _apply_custom(rule, ipath, val, seq)) is not None
                    ]
                    results.append(viols)
                return pd.Series(results, dtype=object)

            return run

        arrays.append(F.coalesce(make_udf()(wrapped), F.array().cast(VIOL_ARRAY_DDL)))
    return arrays
