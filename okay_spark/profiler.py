"""Schema inference: profile a table and suggest a starting okay schema.

The reference has no counterpart — its schemas are hand-written Python
(``/root/reference/src/okay/schema.py``); inference is the engine-level
on-ramp: point it at a table, get an okay schema whose compiled rule battery
then validates that table (and future loads of it) natively.

Scale shape (designed for the 10^12-row table, measured at sf0.01):

- one wide aggregate pass over all scalar columns — including struct members,
  which are plain column expressions — with map-side partial aggregation and
  a single reduce (the ``checks.column_stats`` plan);
- one additional exploded aggregate pass per ``array<struct>`` column for its
  element fields (one level, the north-rule ``spans[]`` shape);
- one bounded option-harvest aggregate for low-cardinality string columns,
  pre-filtered by approx_count_distinct and capped at ``max_options + 1``
  values per column, so the final ship-options decision is EXACT (and
  therefore reproducible by a SQL oracle) while nothing collected to the
  driver grows with the data: every collect is O(columns x max_options).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructType,
)

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
_FRACTIONAL = (FloatType, DoubleType)


@dataclass
class ColumnProfile:
    path: str  # okay path: "lang", "spans[].kind", "meta.author"
    dtype: str  # Spark simpleString of the column type
    nested: bool  # True for array<struct> element fields (second pass)
    n_rows: int  # instances profiled (elements, for nested paths)
    n_nulls: int
    n_nonwhole: int = 0  # fractional columns: values that are not whole
    min_num: float | None = None
    max_num: float | None = None
    options: list | None = None  # exact low-cardinality value set, sorted


@dataclass
class SuggestedSchema:
    decls: list  # (decl, path, okay_type, params) tuples, declaration order
    profiles: list  # the ColumnProfile evidence behind each decision
    strict: bool = True
    source: str = ""

    def schema(self) -> None:
        """An okay schema callable: pass to ``compile_schema`` /
        ``validate_dataframe`` directly (``suggest.schema``)."""
        from .schema import ignore_extra_fields, optional, required

        for decl, path, okay_type, params in self.decls:
            fn = required if decl == "required" else optional
            fn(path, type=okay_type, **params)
        if not self.strict:
            ignore_extra_fields()


def _scalar_aggs(col, name: str, dtype: DataType, max_options: int) -> list:
    aggs = [
        F.count(F.lit(1)).alias(f"{name}__rows"),
        F.count(col).alias(f"{name}__cnt"),
    ]
    if not isinstance(dtype, StructType):
        aggs.append(F.approx_count_distinct(col).alias(f"{name}__adist"))
    if isinstance(dtype, _INTEGRAL + _FRACTIONAL) or isinstance(dtype, DecimalType):
        aggs.append(F.min(col).cast("double").alias(f"{name}__min"))
        aggs.append(F.max(col).cast("double").alias(f"{name}__max"))
    if isinstance(dtype, _FRACTIONAL):
        nonwhole = col.isNotNull() & ~((col % F.lit(1.0)) == F.lit(0.0))
        aggs.append(
            F.sum(F.when(nonwhole, F.lit(1)).otherwise(F.lit(0))).alias(
                f"{name}__nonwhole"
            )
        )
    return aggs


def _walk_scalars(dtype: DataType, path: str, prefix: str):
    """Yield (okay_path, column_expr_path, dtype) for every profilable scalar
    reachable without explode: top-level scalars and struct members."""
    if isinstance(dtype, StructType):
        yield path, prefix, dtype  # the object node: presence/null evidence
        for f_ in dtype.fields:
            yield from _walk_scalars(f_.dataType, f"{path}.{f_.name}", f"{prefix}.`{f_.name}`")
    elif not isinstance(dtype, ArrayType):
        yield path, prefix, dtype


def _profile_frame(df: DataFrame, fields: list) -> dict:
    """One wide aggregate over ``fields`` = [(okay_path, col_expr, dtype)];
    returns {okay_path: row-slice dict}. Single job, single reduce."""
    aggs, meta = [], []
    for i, (path, expr, dtype) in enumerate(fields):
        name = f"c{i}"
        aggs.extend(_scalar_aggs(F.expr(expr), name, dtype, 0))
        meta.append((name, path, dtype))
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0].asDict()
    out = {}
    for name, path, dtype in meta:
        out[path] = {
            "rows": row[f"{name}__rows"],
            "cnt": row[f"{name}__cnt"],
            "adist": row.get(f"{name}__adist"),
            "min": row.get(f"{name}__min"),
            "max": row.get(f"{name}__max"),
            "nonwhole": row.get(f"{name}__nonwhole") or 0,
            "dtype": dtype,
        }
    return out


def profile_table(
    df: DataFrame, cols: list[str] | None = None, *, max_options: int = 20
) -> list[ColumnProfile]:
    """Profile every scalar path of ``df`` (top-level, struct members, and
    one level of ``array<struct>`` element fields) into bounded driver-side
    evidence. See module docstring for the pass structure."""
    cols = cols or df.columns
    scalar_fields: list = []
    array_fields: list = []  # (okay_prefix, column_name, element_type)
    for c in cols:
        dtype = df.schema[c].dataType
        if isinstance(dtype, ArrayType):
            array_fields.append((c, dtype.elementType))
        else:
            scalar_fields.extend(_walk_scalars(dtype, c, f"`{c}`"))

    profiles: dict[str, ColumnProfile] = {}

    def ingest(stats: dict, *, nested: bool) -> None:
        for path, s in stats.items():
            profiles[path] = ColumnProfile(
                path=path,
                dtype=s["dtype"].simpleString(),
                nested=nested,
                n_rows=s["rows"],
                n_nulls=s["rows"] - s["cnt"],
                n_nonwhole=s["nonwhole"],
                min_num=s["min"],
                max_num=s["max"],
                options=None,
            )
            profiles[path]._adist = s["adist"]  # evidence for the harvest pass

    ingest(_profile_frame(df, scalar_fields), nested=False)

    # second pass per array column: explode once, profile element scalars
    # (and element struct members) in one aggregate
    for c, elem in array_fields:
        exploded = df.select(F.explode(F.col("`" + c + "`")).alias("_e"))
        if isinstance(elem, StructType):
            fields = [
                (p.replace("_e.", f"{c}[]."), e, t)
                for sub in elem.fields
                for p, e, t in _walk_scalars(sub.dataType, f"_e.{sub.name}", "`_e`.`" + sub.name + "`")
            ]
            fields = [(p if p.startswith(c) else f"{c}[].{p.split('.', 1)[1]}", e, t) for p, e, t in fields]
        else:
            fields = [(f"{c}[]", "`_e`", elem)]
        ingest(_profile_frame(exploded, fields), nested=True)
        # list-level stats ride the scalar pass shape: size bounds
        sizes = df.agg(
            F.count(F.lit(1)).alias("rows"),
            F.count(F.col("`" + c + "`")).alias("cnt"),
            F.min(F.size(F.col("`" + c + "`"))).alias("szmin"),
            F.max(F.size(F.col("`" + c + "`"))).alias("szmax"),
        ).collect()[0]
        lp = ColumnProfile(
            path=c,
            dtype=df.schema[c].dataType.simpleString(),
            nested=False,
            n_rows=sizes["rows"],
            n_nulls=sizes["rows"] - sizes["cnt"],
            min_num=float(sizes["szmin"]) if sizes["szmin"] is not None else None,
            max_num=float(sizes["szmax"]) if sizes["szmax"] is not None else None,
        )
        lp._adist = 0
        profiles[c] = lp

    # bounded option harvest: strings whose approx distinct count clears a
    # 2x pre-filter; the ship decision is exact (len(set) <= max_options)
    harvest = [
        (p, prof)
        for p, prof in profiles.items()
        if prof.dtype == "string"
        and prof.n_rows > prof.n_nulls
        and getattr(prof, "_adist", 1 << 62) <= max_options * 2
    ]
    flat = [(p, prof) for p, prof in harvest if not prof.nested and "[]" not in p]
    nested_h = [(p, prof) for p, prof in harvest if (p, prof) not in flat]

    def harvest_pass(frame: DataFrame, items: list, to_expr) -> None:
        if not items:
            return
        aggs = [
            F.slice(
                F.array_sort(F.collect_set(to_expr(p))), 1, max_options + 1
            ).alias(f"h{i}")
            for i, (p, _prof) in enumerate(items)
        ]
        row = frame.agg(*aggs).collect()[0]
        for i, (p, prof) in enumerate(items):
            values = list(row[f"h{i}"])
            if 0 < len(values) <= max_options:
                prof.options = values

    harvest_pass(df, flat, lambda p: F.expr(".".join("`" + s + "`" for s in p.split("."))))
    for c, elem in array_fields:
        mine = [(p, prof) for p, prof in nested_h if p.startswith(f"{c}[].") or p == f"{c}[]"]
        if mine:
            exploded = df.select(F.explode(F.col("`" + c + "`")).alias("_e"))
            harvest_pass(
                exploded,
                mine,
                lambda p, _c=c: F.expr(
                    "`_e`" if p == f"{_c}[]" else "`_e`.`" + p.split("[].", 1)[1].replace(".", "`.`") + "`"
                ),
            )

    return list(profiles.values())


_OKAY_TYPE = {
    "string": "string",
    "boolean": "bool",
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
}


def _decide(prof: ColumnProfile, *, bounds: bool):
    t = prof.dtype
    if t in _OKAY_TYPE:
        okay_type = _OKAY_TYPE[t]
    elif t in ("float", "double"):
        okay_type = "int" if prof.n_nonwhole == 0 else "number"
    elif t.startswith("decimal"):
        okay_type = "number"
    elif t.startswith("array"):
        okay_type = "list"
    elif t.startswith("struct") or t.startswith("map"):
        okay_type = "object"
    else:  # binary / timestamp / ... : presence check only
        okay_type = "any"

    nullable = prof.n_nulls > 0
    decl = "optional" if (prof.nested and nullable) else "required"
    if nullable and okay_type not in ("any",):
        okay_type += "?"

    params: dict = {}
    if prof.options is not None and okay_type.rstrip("?") == "string":
        params["options"] = prof.options
    if bounds and okay_type.rstrip("?") in ("int", "number") and prof.min_num is not None:
        lo, hi = prof.min_num, prof.max_num
        if okay_type.rstrip("?") == "int":
            lo, hi = int(lo), int(hi)
        params["min"], params["max"] = lo, hi
    if bounds and okay_type.rstrip("?") == "list" and prof.min_num is not None:
        params["min"], params["max"] = int(prof.min_num), int(prof.max_num)
    return decl, okay_type, params


def suggest_schema(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    max_options: int = 20,
    bounds: bool = False,
    strict: bool = True,
) -> SuggestedSchema:
    """Infer an okay schema for ``df``. ``bounds=True`` additionally pins the
    observed numeric / list-size min and max as rule parameters (off by
    default — observed bounds overfit a sample). ``strict=False`` appends
    ``ignore_extra_fields()`` so undeclared columns pass."""
    profiles = profile_table(df, cols, max_options=max_options)
    # declaration order: table column order, then nested paths (parents first)
    order = {c: i for i, c in enumerate(cols or df.columns)}
    profiles.sort(key=lambda p: (order.get(p.path.split(".")[0].split("[")[0], 1 << 30), p.path))
    decls = []
    for prof in profiles:
        decl, okay_type, params = _decide(prof, bounds=bounds)
        decls.append((decl, prof.path, okay_type, params))
        if okay_type.rstrip("?") == "list" and any(
            p.path.startswith(prof.path + "[].") for p in profiles
        ):
            decls.append(("required", prof.path + "[]", "object", {}))
    out = SuggestedSchema(decls=decls, profiles=profiles, strict=strict)
    out.source = render_schema(decls, strict=strict)
    return out


def render_schema(decls: list, *, strict: bool = True, name: str = "inferred_schema") -> str:
    """Render declarations as paste-able okay schema source."""
    lines = [
        "from okay_spark import ignore_extra_fields, optional, required",
        "",
        "",
        f"def {name}():",
    ]
    for decl, path, okay_type, params in decls:
        args = [repr(path), f"type={okay_type!r}"]
        for k, v in params.items():
            args.append(f"{k}={v!r}")
        lines.append(f"    {decl}({', '.join(args)})")
    if not strict:
        lines.append("    ignore_extra_fields()")
    return "\n".join(lines) + "\n"
