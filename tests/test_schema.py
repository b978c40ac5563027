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


# ---------------------------------------------------------- k_anonymize

def _kanon(spark, rows, **cfg):
    from etl_core_spark.operators.base import get_operator

    df = spark.createDataFrame(rows, "zip string, age long, payload string")
    return get_operator("k_anonymize")(quasi_cols=["zip", "age"], **cfg).apply(
        {"in": df}
    )["out"]


def test_k_anonymize_drops_small_classes(spark):
    rows = [("94110", 30, f"p{i}") for i in range(3)] + [
        ("94110", 31, "solo"),            # class of 1: suppressed
        (None, 30, "n1"), (None, 30, "n2"),  # NULL class of 2: kept at k=2
    ]
    out = _kanon(spark, rows, k=2)
    kept = {r["payload"] for r in out.collect()}
    assert kept == {"p0", "p1", "p2", "n1", "n2"}
    assert out.columns == ["zip", "age", "payload"]


def test_k_anonymize_flag_mode_row_preserving(spark):
    rows = [("a", 1, "x"), ("a", 1, "y"), ("b", 2, "z")]
    out = _kanon(spark, rows, k=2, mode="flag")
    got = {r["payload"]: r["k_anonymous"] for r in out.collect()}
    assert got == {"x": True, "y": True, "z": False}


def test_k_anonymize_validation(spark):
    from etl_core_spark.operators.base import OperatorConfigError, get_operator

    with pytest.raises(OperatorConfigError):
        get_operator("k_anonymize")(quasi_cols=[])
    with pytest.raises(OperatorConfigError):
        get_operator("k_anonymize")(quasi_cols=["zip"], mode="mask")
    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(OperatorConfigError, match="not found"):
        get_operator("k_anonymize")(quasi_cols=["zip"]).apply({"in": df})


def test_l_diversity_drop_and_flag(spark):
    from etl_core_spark.operators.base import get_operator

    rows = [
        ("94110", "flu", "a"), ("94110", "cold", "b"),   # 2 distinct: ok
        ("94111", "flu", "c"), ("94111", "flu", "d"),    # 1 distinct: bad
        (None, "flu", "e"), (None, None, "f"),           # NULL class, NULL
    ]                                                    # counts distinct
    df = spark.createDataFrame(rows, "zip string, dx string, payload string")
    op = get_operator("l_diversity")(
        quasi_cols=["zip"], sensitive_col="dx", l=2
    )
    kept = {r["payload"] for r in op.apply({"in": df})["out"].collect()}
    assert kept == {"a", "b", "e", "f"}
    flag = get_operator("l_diversity")(
        quasi_cols=["zip"], sensitive_col="dx", l=2, mode="flag"
    ).apply({"in": df})["out"]
    got = {r["payload"]: r["l_diverse"] for r in flag.collect()}
    assert got == {"a": True, "b": True, "c": False, "d": False,
                   "e": True, "f": True}


def test_l_diversity_validation(spark):
    from etl_core_spark.operators.base import OperatorConfigError, get_operator

    with pytest.raises(OperatorConfigError):
        get_operator("l_diversity")(quasi_cols=["z"], sensitive_col="")
    with pytest.raises(OperatorConfigError):
        get_operator("l_diversity")(
            quasi_cols=["z"], sensitive_col="dx", mode="mask"
        )
