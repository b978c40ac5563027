"""Hand-computed pins for event_paths (top user journeys) and
approx_topk (Misra-Gries heavy hitters with exact recount)."""

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator


def _paths(spark, rows, **cfg):
    df = spark.createDataFrame(rows, "u long, t long, e string, tb long")
    base = dict(user_col="u", time_col="t", event_col="e")
    return [
        (r["path"], r["n"])
        for r in get_operator("event_paths")(**{**base, **cfg})
        .apply({"in": df})["out"]
        .collect()
    ]


def test_event_paths_hand_computed(spark):
    rows = [
        (1, 1, "a", 0), (1, 2, "b", 0), (1, 3, "c", 0),
        (2, 5, "a", 0), (2, 6, "b", 0), (2, 7, "c", 0),
        (3, 1, "a", 0), (3, 9, "x", 0),
    ]
    assert _paths(spark, rows) == [("a>b>c", 2), ("a>x", 1)]


def test_event_paths_tie_order_count_desc_path_asc(spark):
    rows = [(1, 1, "b", 0), (2, 1, "a", 0), (3, 1, "c", 0)]
    assert _paths(spark, rows) == [("a", 1), ("b", 1), ("c", 1)]


def test_event_paths_max_len_caps_journey(spark):
    rows = [(1, i, f"e{i}", 0) for i in range(1, 6)]
    assert _paths(spark, rows, max_len=3) == [("e1>e2>e3", 1)]


def test_event_paths_top_k_limits_output(spark):
    rows = [(u, 1, f"e{u}", 0) for u in range(10)]
    out = _paths(spark, rows, top_k=4)
    assert out == [("e0", 1), ("e1", 1), ("e2", 1), ("e3", 1)]


def test_event_paths_null_rows_dropped(spark):
    rows = [
        (1, 1, "a", 0), (1, None, "zz", 0), (1, 3, "b", 0),
        (None, 1, "a", 0), (2, 1, None, 0),
    ]
    # NULL time/user/event rows vanish; user 2's only event was NULL
    # so user 2 contributes no journey at all (not an empty path)
    assert _paths(spark, rows) == [("a>b", 1)]


def test_event_paths_order_cols_break_time_ties(spark):
    rows = [(1, 1, "b", 2), (1, 1, "a", 1)]
    assert _paths(spark, rows, order_cols=["tb"]) == [("a>b", 1)]


def test_event_paths_config_errors(spark):
    from etl_core_spark.operators.timeseries import event_paths

    with pytest.raises(OperatorConfigError):
        get_operator("event_paths")(user_col="u", time_col="t", event_col="")
    df = spark.createDataFrame([(1, 1, "a")], "u long, t long, e string")
    with pytest.raises(OperatorConfigError):
        event_paths(df, "u", "t", "e", max_len=0)


def _topk(spark, values, partitions=1, **cfg):
    df = spark.createDataFrame(
        [(v,) for v in values], "v string"
    ).repartition(partitions)
    return [
        (r["value"], r["n"])
        for r in get_operator("approx_topk")(col="v", **cfg)
        .apply({"in": df})["out"]
        .collect()
    ]


def test_approx_topk_exact_when_capacity_ample(spark):
    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]
    assert _topk(spark, vals, k=3, capacity=64) == [
        ("a", 5), ("b", 3), ("c", 2)
    ]


def test_approx_topk_eviction_path_keeps_true_heavy_hitter(spark):
    # capacity=2 forces Misra-Gries decrements inside the partition;
    # 'a' (freq 12 > n/capacity = 20/2) is GUARANTEED to survive and
    # its returned count is exact (second-pass recount), per the MG
    # bound the operator docstring states
    vals = ["a"] * 12 + [f"x{i}" for i in range(8)]
    out = _topk(spark, vals, k=1, capacity=2)
    assert out == [("a", 12)]


def test_approx_topk_merges_partitions(spark):
    # each partition sees a slice; the candidate union + exact
    # recount restores global counts
    vals = (["a"] * 6 + ["b"] * 4 + ["c"] * 2) * 3
    assert _topk(spark, vals, partitions=4, k=2, capacity=64) == [
        ("a", 18), ("b", 12)
    ]


def test_approx_topk_tie_order_and_nulls(spark):
    vals = ["b", "a", None, None, "c"]
    assert _topk(spark, vals, k=2, capacity=16) == [("a", 1), ("b", 1)]


def test_approx_topk_config_errors(spark):
    from etl_core_spark.operators.sketch import approx_topk

    with pytest.raises(OperatorConfigError):
        get_operator("approx_topk")(col="")
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(OperatorConfigError):
        approx_topk(df, "v", k=10, capacity=4)


def test_approx_topk_recount_join_is_broadcast(spark):
    from tests.test_plans_quality import plan_of

    from etl_core_spark.operators.sketch import approx_topk

    df = spark.range(1000).selectExpr("cast(id % 7 as string) as v")
    plan = plan_of(approx_topk(df, "v", k=3, capacity=256))
    # candidate set (<= capacity x partitions rows) must broadcast
    # into the exact recount — never a shuffle of the raw values
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_event_paths_no_window_no_join(spark):
    from tests.test_plans_quality import plan_of

    from etl_core_spark.operators.timeseries import event_paths

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "u long, t long, e string"
    )
    plan = plan_of(event_paths(df, "u", "t", "e"))
    # in-group order lives inside the aggregate: one groupBy-entity
    # shuffle, no Window, no join, top-k as TakeOrdered
    assert "Window" not in plan
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
