"""profile operator: melted column statistics, single-pass plan for
the approx default, exact mode isolation of the Expand."""

import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.profile import profile


def test_profile_values(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 3.5)],
        "k long, s string, v double",
    )
    got = {r["column"]: r for r in profile(df, approx_ndv=False).collect()}
    assert set(got) == {"k", "s", "v"}
    k = got["k"]
    assert (k["n_rows"], k["n_nulls"], k["ndv"]) == (3, 0, 2)
    assert (k["min_num"], k["max_num"], k["mean"]) == (1.0, 2.0, round(5 / 3, 6))
    assert k["min_str"] is None and k["max_str"] is None
    s = got["s"]
    assert (s["n_nulls"], s["ndv"], s["min_str"], s["max_str"]) == (1, 2, "a", "b")
    assert s["min_num"] is None
    v = got["v"]
    assert (v["n_nulls"], v["min_num"], v["max_num"]) == (1, 1.5, 3.5)


def test_profile_approx_is_single_pass(spark, tables):
    """The default mode must profile every column in ONE aggregate
    over ONE scan — no Expand, no per-column jobs."""
    out = profile(tables["orders"], approx_ndv=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert plan.count("FileScan parquet") == 1
    # approx ndv lands within the documented hll error of exact
    got = {r["column"]: r["ndv"] for r in out.collect()}
    exact = {
        c: tables["orders"].select(c).distinct().count()
        for c in tables["orders"].columns
    }
    for c, e in exact.items():
        assert abs(got[c] - e) / max(e, 1) < 0.1


def test_profile_exact_mode_matches_distinct(spark, tables):
    got = {
        r["column"]: r["ndv"]
        for r in profile(
            tables["orders"], ["o_custkey", "o_orderstatus"], approx_ndv=False
        ).collect()
    }
    assert got["o_custkey"] == tables["orders"].select("o_custkey").distinct().count()
    assert got["o_orderstatus"] == 3


def test_profile_unknown_column(spark, tables):
    with pytest.raises(OperatorConfigError, match="unknown columns"):
        profile(tables["orders"], ["nope"])
    out = get_operator("profile")().apply({"in": tables["orders"]})["out"]
    assert out.count() == len(tables["orders"].columns)


def test_profile_temporal_range(spark, tables):
    got = {r["column"]: r for r in profile(
        tables["orders"], ["o_orderdate"], approx_ndv=False
    ).collect()}
    r = got["o_orderdate"]
    assert r["min_str"] == "1995-01-01 00:00:00"
    assert r["min_num"] is None and r["mean"] is None
    assert r["max_str"] > r["min_str"]
