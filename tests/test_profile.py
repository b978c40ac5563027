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


# --------------------------------------------------- benford_deviation

def test_benford_chi2_matches_hand_computation(spark):
    import math

    from etl_core_spark.operators.profile import BENFORD_P

    # 20 values with first digits 1..9 in a known mix
    vals = [1.0] * 6 + [2.5] * 4 + [3.0] * 3 + [40.0] * 3 + [500.0] * 2 + [
        6.0, 7.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = get_operator("benford_deviation")(
        value_col="v",
    ).apply({"in": df})["out"].collect()[0]
    counts = [6, 4, 3, 3, 2, 1, 1, 0, 0]
    n = sum(counts)
    assert r["n"] == n
    chi2 = 0.0
    mad = 0.0
    for c, p in zip(counts, BENFORD_P):
        s = c / n
        chi2 = chi2 + (s - p) * (s - p) / p
        mad = mad + abs(s - p)
    chi2 = n * chi2
    assert r["chi2"] == math.floor(chi2 * 1e9) / 1e9
    assert r["mad"] == math.floor((mad / 9.0) * 1e9) / 1e9
    assert r["alarm"] == (chi2 > 15.507)


def test_benford_digit_from_cents_never_log10(spark):
    # 0.07 -> cents 7 -> digit 7; 0.004 (sub-cent), 0.0, -5.0 excluded
    df = spark.createDataFrame(
        [(0.07,), (0.004,), (0.0,), (-5.0,), (None,), (19.99,)], "v double"
    )
    r = get_operator("benford_deviation")(
        value_col="v",
    ).apply({"in": df})["out"].collect()[0]
    assert r["n"] == 2                     # 0.07 and 19.99 only
    plan = get_operator("benford_deviation")(value_col="v").apply(
        {"in": df}
    )["out"]._jdf.queryExecution().executedPlan().toString()
    assert "log10" not in plan.lower()


def test_benford_grouped_and_threshold_none(spark):
    df = spark.createDataFrame(
        [("a", float(10 ** (i % 3))) for i in range(30)]
        + [("b", 9000.0)] * 10,
        "g string, v double",
    )
    out = get_operator("benford_deviation")(
        value_col="v", group_cols=["g"], threshold=None,
    ).apply({"in": df})["out"]
    rows = {r["g"]: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    assert "alarm" not in out.columns
    assert rows["b"]["n"] == 10


def test_benford_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("benford_deviation")(value_col="")
