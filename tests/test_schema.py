import pytest
from pyspark.sql import types as T

from etl_core_spark.schema import (
    DataType,
    FieldDef,
    Schema,
    SchemaError,
    struct_type_to_schema,
)


def test_simple_types():
    s = Schema(
        fields=[
            FieldDef("name", DataType.STRING, nullable=False),
            FieldDef("age", DataType.INTEGER),
            FieldDef("score", DataType.FLOAT),
            FieldDef("active", DataType.BOOLEAN),
            FieldDef("home", DataType.PATH),
        ]
    )
    st = s.to_struct_type()
    assert st["name"].dataType == T.StringType()
    assert st["name"].nullable is False
    assert st["age"].dataType == T.LongType()
    assert st["score"].dataType == T.DoubleType()
    assert st["active"].dataType == T.BooleanType()
    assert st["home"].dataType == T.StringType()


def test_nested_object_array_enum():
    s = Schema.from_dict(
        {
            "fields": [
                {
                    "name": "user",
                    "data_type": "object",
                    "children": [
                        {"name": "address", "data_type": "object", "children": [
                            {"name": "city", "data_type": "string"},
                        ]},
                    ],
                },
                {"name": "tags", "data_type": "array", "item": {"name": "item", "data_type": "string"}},
                {"name": "status", "data_type": "enum", "enum_values": ["a", "b"]},
            ]
        }
    )
    st = s.to_struct_type()
    assert isinstance(st["user"].dataType, T.StructType)
    assert st["user"].dataType["address"].dataType["city"].dataType == T.StringType()
    assert isinstance(st["tags"].dataType, T.ArrayType)
    assert st["status"].dataType == T.StringType()
    assert s.leaf_paths() == ["user.address.city", "tags", "status"]
    assert s.field_for_path("user.address.city").data_type == DataType.STRING


def test_invalid_schemas():
    with pytest.raises(SchemaError):
        Schema(fields=[])
    with pytest.raises(SchemaError):
        Schema(fields=[FieldDef("a", DataType.STRING), FieldDef("a", DataType.STRING)])
    with pytest.raises(SchemaError):
        FieldDef("o", DataType.OBJECT)
    with pytest.raises(SchemaError):
        FieldDef("a", DataType.ARRAY)
    with pytest.raises(SchemaError):
        FieldDef("e", DataType.ENUM)


def test_roundtrip_from_struct_type():
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
            T.StructField("nested", T.StructType([T.StructField("x", T.StringType())])),
            T.StructField("arr", T.ArrayType(T.LongType())),
        ]
    )
    s = struct_type_to_schema(st)
    assert s.to_struct_type() == st
