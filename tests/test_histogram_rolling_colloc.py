"""Hand-computed pins for the round-8 analytics additions:
histogram, rolling_aggregate, collocations."""

import math

import pytest

from etl_core_spark.operators.base import get_operator, OperatorConfigError
from tests.conftest import SF_DIR  # noqa: F401  (fixture wiring)


def test_histogram_hand_computed(spark):
    df = spark.createDataFrame(
        [(0.0,), (1.0,), (2.5,), (4.9,), (5.0,), (None,), (float("nan"),)],
        "v double",
    )
    out = get_operator("histogram")(value_col="v", bins=5).apply({"in": df})[
        "out"
    ].collect()
    # lo=0, hi=5, width=1; 5.0 (== hi) closes into the top bin
    assert [(r["bin"], r["lo_edge"], r["hi_edge"], r["n"]) for r in out] == [
        (0, 0.0, 1.0, 1),
        (1, 1.0, 2.0, 1),
        (2, 2.0, 3.0, 1),
        (3, 3.0, 4.0, 0),  # empty bin still present
        (4, 4.0, 5.0, 2),
    ]


def test_histogram_explicit_bounds_drop_out_of_range(spark):
    df = spark.createDataFrame([(-1.0,), (0.5,), (1.5,), (99.0,)], "v double")
    out = get_operator("histogram")(
        value_col="v", bins=2, lo=0.0, hi=2.0
    ).apply({"in": df})["out"].collect()
    assert [(r["bin"], r["n"]) for r in out] == [(0, 1), (1, 1)]


def test_histogram_constant_column(spark):
    df = spark.createDataFrame([(7.0,)] * 4, "v double")
    out = get_operator("histogram")(value_col="v", bins=3).apply({"in": df})[
        "out"
    ].collect()
    # zero width: everything in bin 0, other bins empty, edges degenerate
    assert [(r["bin"], r["lo_edge"], r["hi_edge"], r["n"]) for r in out] == [
        (0, 7.0, 7.0, 4),
        (1, 7.0, 7.0, 0),
        (2, 7.0, 7.0, 0),
    ]


def test_histogram_rejects_bad_bins(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(OperatorConfigError):
        get_operator("histogram")(value_col="v", bins=0).apply({"in": df})


def test_rolling_aggregate_hand_computed(spark):
    rows = [
        # key, epoch-second timestamp, value
        ("a", 0, 10.0),
        ("a", 5, 20.0),
        ("a", 11, 40.0),   # t-10 window: excludes t=0 (range [1, 11])
        ("b", 5, 7.5),
        ("a", 5, None),    # NULL value: in frame, excluded from sum/count
        ("a", None, 3.0),  # NULL time: NULL rolling columns
    ]
    df = spark.createDataFrame(rows, "k string, ts long, v double").select(
        "k", "v", __ts_as_timestamp("ts")
    )
    out = get_operator("rolling_aggregate")(
        time_col="t", value_col="v", window_seconds=10,
        partition_cols=["k"], aggs=["sum", "count", "mean", "min", "max"],
    ).apply({"in": df})["out"]
    got = {
        (r["k"], r["v"]): (
            r["rolling_sum"], r["rolling_count"], r["rolling_mean"],
            r["rolling_min"], r["rolling_max"],
        )
        for r in out.collect()
    }
    assert got[("a", 10.0)] == (10.0, 1, 10.0, 10.0, 10.0)
    # t=5 peers (incl. the NULL-value row): frame [max(-5,..), 5] = {0, 5}
    assert got[("a", 20.0)] == (30.0, 2, 15.0, 10.0, 20.0)
    assert got[("a", 40.0)] == (60.0, 2, 30.0, 20.0, 40.0)
    assert got[("b", 7.5)] == (7.5, 1, 7.5, 7.5, 7.5)
    assert got[("a", None)] == (30.0, 2, 15.0, 10.0, 20.0)
    assert got[("a", 3.0)] == (None, None, None, None, None)


def test_rolling_global_window_requires_opt_in(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("rolling_aggregate")(
            time_col="t", value_col="v", window_seconds=10
        )
    # explicit opt-in builds fine
    get_operator("rolling_aggregate")(
        time_col="t", value_col="v", window_seconds=10,
        allow_global_window=True,
    )


def test_rolling_rejects_unknown_agg(spark):
    df = spark.createDataFrame([("a", 0, 1.0)], "k string, ts long, v double")
    with pytest.raises(OperatorConfigError):
        get_operator("rolling_aggregate")(
            time_col="ts", value_col="v", window_seconds=10,
            partition_cols=["k"], aggs=["median"],
        ).apply({"in": df})


def test_collocations_hand_computed(spark):
    # corpus: "x y" twice, "x z" once -> bigrams: (x,y):2, (x,z):1
    # unigrams: x:3 y:2 z:1 ... include a second doc to make totals real
    df = spark.createDataFrame(
        [("x y",), ("x y",), ("x z",)], "text string"
    )
    out = get_operator("collocations")(min_count=1, top_k=10).apply(
        {"in": df}
    )["out"].collect()
    got = {(r["w1"], r["w2"]): r for r in out}
    # U=6 unigrams, B=3 bigrams
    r = got[("x", "y")]
    assert (r["n12"], r["n1"], r["n2"]) == (2, 3, 2)
    expect = math.floor((2.0 * 6 * 6) / (3.0 * 3 * 2) * 1e6) / 1e6
    assert r["lift"] == expect  # 4.0
    r = got[("x", "z")]
    assert (r["n12"], r["n1"], r["n2"]) == (1, 3, 1)
    assert r["lift"] == math.floor((1.0 * 6 * 6) / (3.0 * 3 * 1) * 1e6) / 1e6


def test_collocations_min_count_filters(spark):
    df = spark.createDataFrame([("x y",), ("x y",), ("x z",)], "text string")
    out = get_operator("collocations")(min_count=2, top_k=10).apply(
        {"in": df}
    )["out"].collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("x", "y")]


def test_collocations_single_token_docs_contribute_unigrams_only(spark):
    df = spark.createDataFrame(
        [("x y",), ("y",), ("",), (None,)], "text string"
    )
    out = get_operator("collocations")(min_count=1, top_k=10).apply(
        {"in": df}
    )["out"].collect()
    got = {(r["w1"], r["w2"]): r for r in out}
    # U=3 (x, y, y), B=1
    assert got[("x", "y")]["n1"] == 1 and got[("x", "y")]["n2"] == 2


def __ts_as_timestamp(col):
    from pyspark.sql import functions as F

    return F.col(col).cast("timestamp").alias("t")
