"""pivot / unpivot reshaping operators."""

import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.reshape import pivot, unpivot


@pytest.fixture(scope="module")
def long_df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 5.0), (2, "a", 7.0)],
        "k long, cat string, v double",
    )


def test_pivot_declared_values(spark, long_df):
    out = pivot(long_df, ["k"], "cat", ["a", "b", "c"], agg="sum", agg_col="v")
    got = {r["k"]: (r["a"], r["b"], r["c"]) for r in out.collect()}
    assert got == {1: (10.0, 20.0, 0.0), 2: (12.0, 0.0, 0.0)}
    # undeclared category 'd' would simply not exist as a column
    assert set(out.columns) == {"k", "a", "b", "c"}


def test_pivot_requires_values_and_valid_agg(spark, long_df):
    with pytest.raises(OperatorConfigError, match="values"):
        pivot(long_df, ["k"], "cat", [])
    with pytest.raises(OperatorConfigError, match="agg"):
        pivot(long_df, ["k"], "cat", ["a"], agg="median")


def test_unpivot_keeps_nulls_and_order(spark):
    df = spark.createDataFrame(
        [(1, 2.0, None), (2, 5.0, 6.0)], "id long, a double, b double"
    )
    out = unpivot(df, ["id"], ["a", "b"])
    rows = {(r["id"], r["metric"]): r["value"] for r in out.collect()}
    assert rows == {(1, "a"): 2.0, (1, "b"): None, (2, "a"): 5.0, (2, "b"): 6.0}
    assert out.columns == ["id", "metric", "value"]


def test_unpivot_is_shuffle_free(spark, tables):
    out = unpivot(
        tables["lineitem"], ["l_orderkey"], ["l_quantity", "l_discount"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # Expand projection, no shuffle


def test_reshape_operators_registered(spark, long_df):
    wide = get_operator("pivot")(
        group_by=["k"], pivot_col="cat", values=["a", "b"]
    ).apply({"in": long_df})["out"]
    assert set(wide.columns) == {"k", "a", "b"}
    back = get_operator("unpivot")(
        id_cols=["k"], value_cols=["a", "b"]
    ).apply({"in": wide})["out"]
    assert back.count() == 4
    with pytest.raises(OperatorConfigError, match="unknown columns"):
        unpivot(long_df, ["k"], ["nope"])
