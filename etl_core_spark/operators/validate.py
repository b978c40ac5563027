"""Schema / payload validation operator.

Parity with the reference's runtime payload validation
(``src/etl_core/components/wiring/validation.py:133-235``): required
columns present, no unknown extras (strict mode,
``utils/common_helpers.py:161-179``), non-nullable fields contain no
nulls, ENUM fields stay inside their declared domain.

Structural checks (columns/extras) run at plan-build time — free.
Row-level checks (nulls, enum domains) compile to ONE boolean Column;
rows route to `valid` / `invalid` ports (the reference raises on the
first bad row; routing is the distributed-friendly superset — a
`mode='raise'` option reproduces fail-fast via a limit-1 probe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_core_spark.operators.base import Operator, OperatorConfigError, PortMap, register_operator
from etl_core_spark.schema import DataType, FieldDef, Schema


class ValidationError(ValueError):
    pass


def _field_checks(
    fd: FieldDef, path_prefix: str = "", parent: Column | None = None
) -> list[tuple[str, Column]]:
    """(description, is_valid_column) pairs for one field subtree.

    Checks on NESTED children are gated on the parent struct being
    present: with a NULLABLE parent p and a non-nullable child p.c, a
    row with p = NULL is VALID (the schema explicitly allows the
    whole struct to be absent) — ungated, ``p.c IS NOT NULL``
    evaluates false through the NULL parent and misroutes the row to
    the invalid port. An immediate-parent gate covers deeper
    ancestors too (a NULL grandparent nulls the parent)."""
    path = f"{path_prefix}{fd.name}"
    col = F.col(path)

    def gate(check: Column) -> Column:
        return check if parent is None else (parent.isNull() | check)

    checks: list[tuple[str, Column]] = []
    if not fd.nullable:
        checks.append((f"{path} not null", gate(col.isNotNull())))
    if fd.data_type == DataType.ENUM:
        assert fd.enum_values is not None
        checks.append(
            (f"{path} in enum", col.isNull() | col.isin(list(fd.enum_values)))
        )
    if fd.data_type == DataType.OBJECT and fd.children:
        for child in fd.children:
            checks.extend(
                _field_checks(child, path_prefix=f"{path}.", parent=col)
            )
    return checks


def structural_check(df: DataFrame, schema: Schema, strict: bool = True) -> None:
    expected = {f.name for f in schema.fields}
    actual = set(df.columns)
    missing = sorted(expected - actual)
    if missing:
        raise ValidationError(f"missing required columns: {missing}")
    if strict:
        extra = sorted(actual - expected)
        if extra:
            raise ValidationError(f"unknown extra columns: {extra}")


def validity_column(schema: Schema) -> tuple[Column, list[str]]:
    checks = []
    for fd in schema.fields:
        checks.extend(_field_checks(fd))
    if not checks:
        return F.lit(True), []
    cond = checks[0][1]
    for _, c in checks[1:]:
        cond = cond & c
    return cond, [d for d, _ in checks]


@register_operator("validate")
class ValidateOperator(Operator):
    """Config: ``schema`` (reference-shaped field list), ``strict``
    (reject unknown columns, default True), ``mode`` ∈
    {route (default), raise}."""

    in_ports = ("in",)
    out_ports = ("valid", "invalid")

    def validate_config(self) -> None:
        s = self.config.get("schema")
        if s is None:
            raise OperatorConfigError("validate requires 'schema'")
        self.schema = s if isinstance(s, Schema) else Schema.from_dict(s)
        self.strict = bool(self.config.get("strict", True))
        self.mode = self.config.get("mode", "route")
        if self.mode not in ("route", "raise"):
            raise OperatorConfigError(f"unknown validate mode {self.mode!r}")

    def apply(self, inputs: PortMap) -> PortMap:
        df = self.single_input(inputs)
        structural_check(df, self.schema, self.strict)
        cond, descriptions = validity_column(self.schema)
        if self.mode == "raise":
            bad = df.filter(~F.coalesce(cond, F.lit(False))).limit(1).collect()
            if bad:
                raise ValidationError(
                    f"validation failed (checks: {descriptions}); "
                    f"first bad row: {bad[0].asDict()}"
                )
            return {"valid": df, "invalid": df.limit(0)}
        ok = F.coalesce(cond, F.lit(False))
        return {"valid": df.filter(ok), "invalid": df.filter(~ok)}
