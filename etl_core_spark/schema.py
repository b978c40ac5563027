"""Schema model: declarative field definitions compiled to Spark types.

Capability parity with the reference's port-schema system
(``src/etl_core/components/wiring/column_definition.py:7-64`` and
``schema.py:8-21`` in the reference): a recursive ``FieldDef`` tree
with ``STRING INTEGER FLOAT BOOLEAN OBJECT ARRAY ENUM PATH`` kinds,
per-field nullability, dotted-path access, and ENUM value domains.

Differences by design (SURVEY.md §1.2): the Spark engine uses *real*
nested ``StructType`` columns instead of dotted-flat pandas columns,
so `user.address.city` is native column resolution, and adds the
types the reference lacks (timestamp/date/decimal/binary/map) since
the test tables carry timestamps.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Iterator, Optional, Sequence

from pyspark.sql import types as T


class DataType(str, enum.Enum):
    STRING = "string"
    INTEGER = "integer"
    FLOAT = "float"
    BOOLEAN = "boolean"
    OBJECT = "object"
    ARRAY = "array"
    ENUM = "enum"
    PATH = "path"
    # extensions beyond the reference's type system
    TIMESTAMP = "timestamp"
    DATE = "date"
    DECIMAL = "decimal"
    BINARY = "binary"
    MAP = "map"


_SIMPLE_SPARK_TYPES: dict[DataType, T.DataType] = {
    DataType.STRING: T.StringType(),
    DataType.PATH: T.StringType(),
    DataType.INTEGER: T.LongType(),
    DataType.FLOAT: T.DoubleType(),
    DataType.BOOLEAN: T.BooleanType(),
    DataType.TIMESTAMP: T.TimestampType(),
    DataType.DATE: T.DateType(),
    DataType.BINARY: T.BinaryType(),
}


class SchemaError(ValueError):
    """Raised for invalid schema definitions or schema mismatches."""


@dataclasses.dataclass
class FieldDef:
    """One field in a port schema; recursive for OBJECT/ARRAY.

    Mirrors the reference's FieldDef contract: OBJECT requires
    ``children``, ARRAY requires ``item``, ENUM requires
    ``enum_values`` (compiled to StringType + an `isin` check that
    the validation layer applies).
    """

    name: str
    data_type: DataType
    nullable: bool = True
    children: Optional[list["FieldDef"]] = None
    item: Optional["FieldDef"] = None
    enum_values: Optional[list[str]] = None
    key_type: Optional[DataType] = None  # MAP only
    precision: int = 38  # DECIMAL only
    scale: int = 9  # DECIMAL only

    def __post_init__(self) -> None:
        if not self.name:
            raise SchemaError("field name must be non-empty")
        if self.data_type == DataType.OBJECT and not self.children:
            raise SchemaError(f"OBJECT field '{self.name}' requires children")
        if self.data_type == DataType.ARRAY and self.item is None:
            raise SchemaError(f"ARRAY field '{self.name}' requires item")
        if self.data_type == DataType.ENUM and not self.enum_values:
            raise SchemaError(f"ENUM field '{self.name}' requires enum_values")
        if self.data_type == DataType.MAP:
            if self.item is None:
                raise SchemaError(f"MAP field '{self.name}' requires item")
            if self.key_type is not None and self.key_type not in _SIMPLE_SPARK_TYPES:
                raise SchemaError(
                    f"MAP field '{self.name}' key_type must be a simple "
                    f"type, got {self.key_type}"
                )

    def to_spark_type(self) -> T.DataType:
        dt = self.data_type
        if dt in _SIMPLE_SPARK_TYPES:
            return _SIMPLE_SPARK_TYPES[dt]
        if dt == DataType.ENUM:
            return T.StringType()
        if dt == DataType.DECIMAL:
            return T.DecimalType(self.precision, self.scale)
        if dt == DataType.OBJECT:
            assert self.children is not None
            return T.StructType([c.to_struct_field() for c in self.children])
        if dt == DataType.ARRAY:
            assert self.item is not None
            return T.ArrayType(self.item.to_spark_type(), containsNull=self.item.nullable)
        if dt == DataType.MAP:
            key = _SIMPLE_SPARK_TYPES[self.key_type or DataType.STRING]
            return T.MapType(key, self.item.to_spark_type(), valueContainsNull=self.item.nullable)
        raise SchemaError(f"unsupported data_type: {dt}")

    def to_struct_field(self) -> T.StructField:
        return T.StructField(self.name, self.to_spark_type(), nullable=self.nullable)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "FieldDef":
        """Parse the reference-shaped JSON field definition."""
        return cls(
            name=d["name"],
            data_type=DataType(str(d.get("data_type", "string")).lower()),
            nullable=bool(d.get("nullable", True)),
            children=[cls.from_dict(c) for c in d["children"]] if d.get("children") else None,
            item=cls.from_dict(d["item"]) if d.get("item") else None,
            enum_values=d.get("enum_values"),
            key_type=DataType(str(d["key_type"]).lower()) if d.get("key_type") else None,
            precision=int(d.get("precision", 38)),
            scale=int(d.get("scale", 9)),
        )


@dataclasses.dataclass
class Schema:
    """A non-empty, uniquely-named list of FieldDefs for one port."""

    fields: list[FieldDef]

    def __post_init__(self) -> None:
        if not self.fields:
            raise SchemaError("schema requires at least one field")
        names = [f.name for f in self.fields]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise SchemaError(f"duplicate field names: {sorted(dupes)}")

    def to_struct_type(self) -> T.StructType:
        return T.StructType([f.to_struct_field() for f in self.fields])

    @classmethod
    def from_dict(cls, d: dict[str, Any] | list[dict[str, Any]]) -> "Schema":
        fields = d["fields"] if isinstance(d, dict) else d
        return cls(fields=[FieldDef.from_dict(f) for f in fields])

    def leaf_paths(self) -> list[str]:
        """Dotted paths of all leaf fields (the reference's flattened
        column names; used for projection pushdown and validation)."""
        return list(_iter_leaf_paths(self.fields, prefix=""))

    def field_for_path(self, path: str, separator: str = ".") -> FieldDef:
        parts = path.split(separator)
        fields: Sequence[FieldDef] = self.fields
        fd: FieldDef | None = None
        for i, part in enumerate(parts):
            fd = next((f for f in fields if f.name == part), None)
            if fd is None:
                raise SchemaError(f"path '{path}' not in schema (missing '{part}')")
            if i < len(parts) - 1:
                if fd.data_type == DataType.OBJECT:
                    fields = fd.children or []
                else:
                    raise SchemaError(f"path '{path}': '{part}' is not an OBJECT")
        assert fd is not None
        return fd


def _iter_leaf_paths(fields: Sequence[FieldDef], prefix: str) -> Iterator[str]:
    for f in fields:
        path = f"{prefix}{f.name}"
        if f.data_type == DataType.OBJECT and f.children:
            yield from _iter_leaf_paths(f.children, prefix=f"{path}.")
        else:
            yield path


def struct_type_to_schema(st: T.StructType) -> Schema:
    """Inverse compiler: Spark StructType → engine Schema (used to
    derive out-port schemas, e.g. after type conversion)."""
    return Schema(fields=[_struct_field_to_fielddef(f) for f in st.fields])


def _struct_field_to_fielddef(f: T.StructField) -> FieldDef:
    return _spark_type_to_fielddef(f.name, f.dataType, f.nullable)


def _spark_type_to_fielddef(name: str, dt: T.DataType, nullable: bool) -> FieldDef:
    if isinstance(dt, T.StructType):
        return FieldDef(
            name=name,
            data_type=DataType.OBJECT,
            nullable=nullable,
            children=[_struct_field_to_fielddef(c) for c in dt.fields],
        )
    if isinstance(dt, T.ArrayType):
        return FieldDef(
            name=name,
            data_type=DataType.ARRAY,
            nullable=nullable,
            item=_spark_type_to_fielddef("item", dt.elementType, dt.containsNull),
        )
    if isinstance(dt, T.MapType):
        # carry the KEY type: dropping it round-tripped every map to
        # string keys and broke declared-vs-actual schema parity
        key_dt = next(
            (k for k, v in _SIMPLE_SPARK_TYPES.items() if v == dt.keyType),
            DataType.STRING,
        )
        return FieldDef(
            name=name,
            data_type=DataType.MAP,
            nullable=nullable,
            key_type=key_dt,
            item=_spark_type_to_fielddef("value", dt.valueType, dt.valueContainsNull),
        )
    if isinstance(dt, T.DecimalType):
        return FieldDef(
            name=name, data_type=DataType.DECIMAL, nullable=nullable,
            precision=dt.precision, scale=dt.scale,
        )
    mapping: dict[type, DataType] = {
        T.StringType: DataType.STRING,
        T.LongType: DataType.INTEGER,
        T.IntegerType: DataType.INTEGER,
        T.ShortType: DataType.INTEGER,
        T.ByteType: DataType.INTEGER,
        T.DoubleType: DataType.FLOAT,
        T.FloatType: DataType.FLOAT,
        T.BooleanType: DataType.BOOLEAN,
        T.TimestampType: DataType.TIMESTAMP,
        T.DateType: DataType.DATE,
        T.BinaryType: DataType.BINARY,
    }
    for cls, mapped in mapping.items():
        if isinstance(dt, cls):
            return FieldDef(name=name, data_type=mapped, nullable=nullable)
    raise SchemaError(f"cannot map Spark type {dt} to engine schema")
