"""Type conversion operator.

Parity with the reference type_conversion component
(``src/etl_core/components/data_operations/type_conversion/
type_conversion_component.py:57-145``; semantics tables and the
``*`` array-path handling in
``receivers/.../type_conversion/type_conversion_helper.py:26-277``).

Paths: ``a.b`` descends into structs, ``a.items.*.price`` converts
each array element's field. Struct rebuilds use ``withField`` and
array rebuilds use ``F.transform`` — no explode/regroup shuffle, the
conversion stays a narrow map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_core_spark.functions.casts import (
    CastRule,
    _convert,
    _convert_stages,
    _resolve_type,
    raise_on_unconvertible,
)
from etl_core_spark.operators.base import Operator, OperatorConfigError, PortMap, register_operator


def _staged_convert(df: DataFrame, name: str, out_name: str, src_type: T.DataType, target: str) -> DataFrame:
    """Convert a top-level column via a two-projection plan: the parse
    intermediate is materialized once as its own (non-cheap,
    multi-referenced) projection, so CollapseProject cannot inline it
    into every reference of the finishing ladder."""
    prep, finish = _convert_stages(F.col(name), src_type, target)
    if prep is None:
        return df.withColumn(out_name, finish(F.col(name)))
    tmp = f"__tc_prep_{name}"
    return (
        df.withColumn(tmp, prep)
        .withColumn(out_name, finish(F.col(tmp)))
        .drop(tmp)
    )


def _apply_rule(df: DataFrame, rule: CastRule) -> DataFrame:
    parts = rule.column_path.split(".")
    src_type = _resolve_type(df.schema, rule.column_path)

    if rule.on_error == "raise" and "*" not in parts and len(parts) == 1:
        # one aggregate pass over the conversion expr; fails fast with
        # the first offending value (≈ reference helper:149-162)
        probe = _staged_convert(df, parts[0], "__conv_probe", src_type, rule.target)
        raise_on_unconvertible(probe, rule, "__conv_probe")

    if "*" not in parts and len(parts) == 1:
        return _staged_convert(df, parts[0], parts[0], src_type, rule.target)
    return df.withColumn(
        parts[0],
        _rebuild(
            F.col(parts[0]), _subtype(df.schema, parts[0]), parts[1:], src_type, rule.target
        ),
    )


def _subtype(schema: T.StructType, name: str) -> T.DataType:
    match = next((f for f in schema.fields if f.name == name), None)
    if match is None:
        raise OperatorConfigError(f"column {name!r} not found")
    return match.dataType


def _rebuild(col: Column, dtype: T.DataType, rest: list[str], leaf_type: T.DataType, target: str) -> Column:
    """Recursively rebuild struct/array columns, converting the leaf."""
    if not rest:
        return _convert(col, leaf_type, target)
    head, tail = rest[0], rest[1:]
    if head == "*":
        if not isinstance(dtype, T.ArrayType):
            raise OperatorConfigError("'*' path segment requires an array column")
        elem = dtype.elementType
        return F.transform(col, lambda x: _rebuild(x, elem, tail, leaf_type, target))
    if not isinstance(dtype, T.StructType):
        raise OperatorConfigError(f"cannot descend into {dtype} at {head!r}")
    sub = next((f for f in dtype.fields if f.name == head), None)
    if sub is None:
        raise OperatorConfigError(f"field {head!r} not found in struct")
    return col.withField(head, _rebuild(col.getField(head), sub.dataType, tail, leaf_type, target))


def _unconvertible_predicate(df: DataFrame, rule: CastRule):
    """True where this rule would turn a real (non-null, non-marker)
    source value into NULL. Only direct top-level paths participate —
    nested/array element failures aren't row-addressable."""
    from etl_core_spark.functions.casts import _null_marker

    parts = rule.column_path.split(".")
    if "*" in parts or len(parts) > 1:
        return None
    src = F.col(rule.column_path)
    src_type = _resolve_type(df.schema, rule.column_path)
    converted = _convert(src, src_type, rule.target)
    return src.isNotNull() & ~_null_marker(src) & converted.isNull()


@register_operator("type_conversion")
class TypeConversionOperator(Operator):
    """Out ports:

    - ``out``: converted rows (all policies).
    - ``errors``: the ORIGINAL (pre-conversion) rows where any rule
      failed to convert a real value. This is the engine's answer to
      the reference's ``on_error='skip'`` mixed-dtype columns
      (type_conversion_helper.py:162,262-277) — Spark columns are
      typed, so instead of keeping originals inline, the originals
      route to a dedicated port (SURVEY.md §7.4 deviation, narrowed).
    """

    in_ports = ("in",)
    out_ports = ("out", "errors")

    def validate_config(self) -> None:
        rules = self.config.get("rules")
        if not rules:
            raise OperatorConfigError("type_conversion requires 'rules'")
        self.rules = [r if isinstance(r, CastRule) else CastRule(**r) for r in rules]

    def apply(self, inputs: PortMap) -> PortMap:
        df = self.single_input(inputs)
        failed = None
        for rule in self.rules:
            pred = _unconvertible_predicate(df, rule)
            if pred is not None:
                failed = pred if failed is None else (failed | pred)
        out = df
        for rule in self.rules:
            out = _apply_rule(out, rule)
        errors = (
            df.filter(failed) if failed is not None else df.limit(0)
        )
        return {"out": out, "errors": errors}
