"""Hand-computed pins for bm25 (Okapi retrieval scoring) and
interpolate (dense-grid gap fill, linear/ffill)."""

import math
import re

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator


def _bm25(spark, rows, **cfg):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = get_operator("bm25")(**cfg).apply({"in": df})["out"]
    return {r["doc_id"]: (r["n_matched"], r["score"]) for r in out.collect()}


def _expected(idf_num, idf_den, tf, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + idf_num / idf_den)
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def _q6(x):
    return math.floor(x * 1e6) / 1e6


def test_bm25_hand_computed(spark):
    out = _bm25(
        spark,
        [(1, "a b a c"), (2, "b b d"), (3, "e f")],
        query=["a", "b"],
    )
    # N=3, avgdl=3; df(a)=1, df(b)=2
    d1 = _expected(3 - 1 + 0.5, 1.5, 2, 4, 3.0) + _expected(
        3 - 2 + 0.5, 2.5, 1, 4, 3.0
    )
    d2 = _expected(3 - 2 + 0.5, 2.5, 2, 3, 3.0)
    assert out == {1: (2, _q6(d1)), 2: (1, _q6(d2)), 3: (0, 0.0)}


def test_bm25_null_and_empty_text_score_zero(spark):
    out = _bm25(spark, [(1, "a a"), (2, None), (3, "  ")], query=["a"])
    assert out[2] == (0, 0.0) and out[3] == (0, 0.0)
    assert out[1][0] == 1 and out[1][1] > 0


def test_bm25_query_string_splits_and_dedupes(spark):
    rows = [(1, "a b"), (2, "c d")]
    assert _bm25(spark, rows, query="a  A a") == _bm25(
        spark, rows, query=["a"]
    )


def test_bm25_top_k_retrieval_mode(spark):
    rows = [(i, "x " * i + "y") for i in range(1, 6)]
    out = (
        get_operator("bm25")(query=["x"], top_k=2)
        .apply({"in": spark.createDataFrame(rows, "doc_id long, text string")})[
            "out"
        ]
        .collect()
    )
    assert len(out) == 2
    assert out[0]["score"] >= out[1]["score"]


def test_bm25_config_errors(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("bm25")(query=[])
    from etl_core_spark.operators.text_analysis import bm25_score

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(OperatorConfigError):
        bm25_score(df, ["a"], b=1.5)


def test_bm25_plan_no_smj_no_window(spark):
    from tests.test_plans_quality import plan_of

    from etl_core_spark.operators.text_analysis import bm25_score

    df = spark.createDataFrame(
        [(i, "hash join scan") for i in range(50)], "doc_id long, text string"
    )
    plan = plan_of(bm25_score(df, ["hash", "join"]))
    # df-per-term is a broadcast join, N/avgdl ride as a broadcast
    # one-row aggregate; no window, no cartesian. The row-preserving
    # id join-back MAY plan as SMJ statically (doc-sized x doc-sized
    # on the key is the correct 100 TB shape; AQE broadcasts it when
    # the scored side is actually small).
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def _interp(spark, rows, **cfg):
    df = spark.createDataFrame(rows, "k long, t long, v double")
    base = dict(key_cols=["k"], time_col="t", value_col="v", step="1")
    out = get_operator("interpolate")(**{**base, **cfg}).apply({"in": df})[
        "out"
    ]
    return {
        (r["k"], r["t"]): (r["v"], r["is_filled"]) for r in out.collect()
    }


def test_interpolate_linear_hand_computed(spark):
    out = _interp(spark, [(1, 0, 10.0), (1, 4, 20.0)])
    assert out == {
        (1, 0): (10.0, False),
        (1, 1): (12.5, True),
        (1, 2): (15.0, True),
        (1, 3): (17.5, True),
        (1, 4): (20.0, False),
    }


def test_interpolate_ffill(spark):
    out = _interp(spark, [(1, 0, 10.0), (1, 3, 20.0)], method="ffill")
    assert out == {
        (1, 0): (10.0, False),
        (1, 1): (10.0, True),
        (1, 2): (10.0, True),
        (1, 3): (20.0, False),
    }


def test_interpolate_edges_stay_null_under_linear(spark):
    # explicit NULL observations make leading/trailing gaps: linear
    # never extrapolates, ffill carries forward but not backward
    rows = [(1, 0, None), (1, 1, 5.0), (1, 3, None)]
    assert _interp(spark, rows) == {
        (1, 0): (None, True),
        (1, 1): (5.0, False),
        (1, 2): (None, True),
        (1, 3): (None, True),
    }
    ff = _interp(spark, rows, method="ffill")
    assert ff[(1, 0)] == (None, True)
    assert ff[(1, 2)] == (5.0, True) and ff[(1, 3)] == (5.0, True)


def test_interpolate_duplicates_collapse_by_mean(spark):
    out = _interp(spark, [(1, 0, 1.0), (1, 0, 3.0), (1, 1, 4.0)])
    assert out[(1, 0)] == (2.0, False)


def test_interpolate_multiple_keys_independent_spans(spark):
    out = _interp(spark, [(1, 0, 1.0), (1, 2, 3.0), (2, 10, 7.0)])
    assert out == {
        (1, 0): (1.0, False),
        (1, 1): (2.0, True),
        (1, 2): (3.0, False),
        (2, 10): (7.0, False),
    }


def test_interpolate_config_errors(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("interpolate")(
            key_cols=[], time_col="t", value_col="v", step="1"
        )
    from etl_core_spark.operators.timeseries import interpolate

    df = spark.createDataFrame([(1, 0, 1.0)], "k long, t long, v double")
    with pytest.raises(OperatorConfigError):
        interpolate(df, ["k"], "t", "v", "1", method="cubic")


def test_interpolate_single_window_node(spark):
    from tests.test_plans_quality import plan_of

    from etl_core_spark.operators.timeseries import interpolate

    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 5, 2.0)], "k long, t long, v double"
    )
    plan = plan_of(interpolate(df, ["k"], "t", "v", "1"))
    # all four framed neighbor lookups share one (key, time) sort:
    # exactly one Window node, no self-join for prev/next
    assert len(re.findall(r"\(\d+\) Window\n", plan)) == 1


def test_interpolate_null_time_observation_passes_through(spark):
    # a NULL-time observed row survives as its own row (the spine has
    # no NULL bucket to pair it with; min/max span ignores NULL) —
    # the documented divergence from SQL spine-left-join oracles
    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 2, 3.0), (1, None, 9.0)], "k long, t long, v double"
    )
    out = get_operator("interpolate")(
        key_cols=["k"], time_col="t", value_col="v", step="1"
    ).apply({"in": df})["out"]
    got = {(r["k"], r["t"]): (r["v"], r["is_filled"]) for r in out.collect()}
    assert got == {
        (1, 0): (1.0, False),
        (1, 1): (2.0, True),
        (1, 2): (3.0, False),
        (1, None): (9.0, False),
    }


def test_interpolate_null_time_never_leaks_into_ffill(spark):
    # the NULL-time row sorts NULLS FIRST in the neighbor window; if
    # it entered the window its value would carry into grid rows
    # whose true leading state is NULL. It must pass through as its
    # own row but be EXCLUDED from neighbor lookup.
    df = spark.createDataFrame(
        [(1, None, 9.0), (1, 0, None), (1, 2, 4.0)],
        "k long, t long, v double",
    )
    out = get_operator("interpolate")(
        key_cols=["k"], time_col="t", value_col="v", step="1",
        method="ffill",
    ).apply({"in": df})["out"]
    got = {(r["k"], r["t"]): (r["v"], r["is_filled"]) for r in out.collect()}
    assert got == {
        (1, 0): (None, True),   # leading gap stays NULL — not 9.0
        (1, 1): (None, True),
        (1, 2): (4.0, False),
        (1, None): (9.0, False),
    }
