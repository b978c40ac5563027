"""zscore_outliers + densify_buckets (operators/timeseries.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.timeseries import densify_buckets, zscore_outliers


def test_zscore_flags_the_planted_outlier(spark):
    rows = [("a", float(v)) for v in [10, 11, 9, 10, 10, 12, 9, 100]] + [
        ("b", 5.0), ("b", 5.0)  # constant group: std 0 -> never outliers
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    out = zscore_outliers(df, "value", ["g"], threshold=2.0)
    flagged = [(r["g"], r["value"]) for r in out.where("is_outlier").collect()]
    assert flagged == [("a", 100.0)]
    b_rows = out.where(F.col("g") == "b").collect()
    assert all(r["zscore"] == 0.0 and not r["is_outlier"] for r in b_rows)


def test_zscore_global_and_plan_has_no_window(spark):
    df = spark.createDataFrame([(float(i),) for i in range(50)], "value double")
    out = zscore_outliers(df, "value", [], threshold=3.0)
    assert out.count() == 50
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # stats broadcast, not a sorted window
    assert "Broadcast" in plan


def test_zscore_broadcast_modes(spark):
    """The per-group stats broadcast is stats-gated like funnel's (a
    high-cardinality group key makes the stats relation O(|groups|),
    and an explicit hint bypasses autoBroadcastJoinThreshold): all
    three modes give identical results; False suppresses the hint;
    True forces it."""
    rows = [("a", float(v)) for v in [10, 11, 9, 10, 10, 12, 9, 100]] + [
        ("b", 5.0), ("b", 5.0)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    want = {(r["g"], r["value"], r["zscore"], r["is_outlier"])
            for r in zscore_outliers(df, "value", ["g"], 2.0).collect()}
    for mode in (True, False, None):
        got = {(r["g"], r["value"], r["zscore"], r["is_outlier"])
               for r in zscore_outliers(df, "value", ["g"], 2.0,
                                        broadcast_stats=mode).collect()}
        assert got == want, mode
    hinted = zscore_outliers(df, "value", ["g"], 2.0, broadcast_stats=True)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    unhinted = zscore_outliers(df, "value", ["g"], 2.0, broadcast_stats=False)
    assert "ResolvedHint" not in unhinted._jdf.queryExecution().analyzed().toString()


def test_densify_fills_gaps_with_typed_zero(spark):
    base = dt.datetime(2026, 1, 1, 0, 0)
    rows = [
        ("a", base, 1.5), ("a", base, 2.5),            # hour 0: n=2
        ("a", base + dt.timedelta(hours=3), 4.0),       # hours 1,2 missing
        ("b", base, 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double") \
        .withColumn("bucket", F.date_trunc("hour", F.col("ts")))
    out = densify_buckets(df, ["k"], "bucket", "INTERVAL 1 HOUR",
                          {"n": "count:*", "total": "sum:value"})
    got = {(r["k"], r["bucket"].hour): (r["n"], r["total"]) for r in out.collect()}
    assert got[("a", 0)] == (2, 4.0)
    assert got[("a", 1)] == (0, 0.0) and got[("a", 2)] == (0, 0.0)
    assert got[("a", 3)] == (1, 4.0)
    assert got[("b", 0)] == (1, 1.0)
    assert ("b", 1) not in got  # spine is per-key [min, max], not global
    # count column keeps its integer type after the fill
    assert dict(out.dtypes)["n"] == "bigint"


def test_densify_numeric_buckets(spark):
    df = spark.createDataFrame([("x", 1), ("x", 4)], "k string, bucket int")
    out = densify_buckets(df, ["k"], "bucket", F.lit(1), {"n": "count:*"})
    assert {(r["bucket"], r["n"]) for r in out.collect()} == {
        (1, 1), (2, 0), (3, 0), (4, 1)
    }


def test_timeseries_config_validation(spark):
    with pytest.raises(OperatorConfigError, match="value_col"):
        get_operator("zscore_outliers")()
    with pytest.raises(OperatorConfigError, match="step"):
        get_operator("densify_buckets")(key_cols=["k"], bucket_col="b")
    df = spark.createDataFrame([("x", 1)], "k string, bucket int")
    with pytest.raises(OperatorConfigError, match="unknown densify agg"):
        densify_buckets(df, ["k"], "bucket", F.lit(1), {"n": "median:bucket"})


# ----------------------------------------------------------------------
# funnel (ordered sequence matching via cascaded conditional mins)
# ----------------------------------------------------------------------

def _funnel_events(spark):
    rows = [
        # u1 completes the funnel in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2 clicks BEFORE viewing: click must not count; stops at view
        (2, 10, "click"), (2, 20, "view"),
        # u3 purchase before click: reaches click only
        (3, 10, "view"), (3, 15, "purchase"), (3, 20, "click"),
        # u4 never views: excluded entirely
        (4, 10, "click"), (4, 20, "purchase"),
        # u5 out-of-funnel events ignored; later duplicate steps ok
        (5, 10, "signup"), (5, 20, "view"), (5, 25, "view"),
        (5, 30, "click"), (5, 40, "click"), (5, 50, "purchase"),
    ]
    return spark.createDataFrame(
        [(u, float(t), e) for u, t, e in rows], "user_id long, ts double, event_type string"
    )


def test_funnel_stages(spark):
    from etl_core_spark.operators.timeseries import funnel

    out = funnel(_funnel_events(spark), "user_id", "ts", "event_type",
                 ["view", "click", "purchase"])
    got = {r["user_id"]: r["stage"] for r in out.collect()}
    assert got == {1: 3, 2: 1, 3: 2, 5: 3}


def test_funnel_strictly_after(spark):
    """A step at exactly the same timestamp as the previous one does
    not advance the funnel (strict >)."""
    from etl_core_spark.operators.timeseries import funnel

    df = spark.createDataFrame(
        [(1, 10.0, "view"), (1, 10.0, "click"), (2, 10.0, "view"), (2, 11.0, "click")],
        "user_id long, ts double, event_type string",
    )
    out = funnel(df, "user_id", "ts", "event_type", ["view", "click"])
    got = {r["user_id"]: r["stage"] for r in out.collect()}
    assert got == {1: 1, 2: 2}


def test_funnel_single_step_and_validation(spark):
    import pytest as _pytest

    from etl_core_spark.operators.base import OperatorConfigError, get_operator
    from etl_core_spark.operators.timeseries import funnel

    df = _funnel_events(spark)
    out = funnel(df, "user_id", "ts", "event_type", ["purchase"])
    assert {r["user_id"] for r in out.collect()} == {1, 3, 4, 5}
    with _pytest.raises(OperatorConfigError, match="steps"):
        get_operator("funnel")(user_col="u", ts_col="t", type_col="e")
    with _pytest.raises(OperatorConfigError, match="at least one step"):
        funnel(df, "user_id", "ts", "event_type", [])


def test_funnel_operator_broadcasts_stage_tables(spark):
    """The events side must never be the build side. With the stage
    tables' stats unknown (aggregate output), the gate defers to AQE,
    which converts to broadcast at runtime — the FINAL adaptive plan
    must show it."""
    from etl_core_spark.operators.base import get_operator

    out = get_operator("funnel")(
        user_col="user_id", ts_col="ts", type_col="event_type",
        steps=["view", "click", "purchase"],
    ).apply({"in": _funnel_events(spark)})["out"]
    out.collect()  # let AQE finalize
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_funnel_null_timestamps_ignored(spark):
    """NULL event times follow SQL aggregate/predicate semantics (the
    same rows the oracle CTEs would produce): a user whose only
    first-step event has NULL ts still groups into stage 1 (min over
    NULLs emits a NULL t1 row) but can never be advanced past it
    (ts > NULL is never true), and NULL-ts later-step events never
    advance anything."""
    from etl_core_spark.operators.timeseries import funnel

    df = spark.createDataFrame(
        [(1, None, "view"), (1, 10.0, "click"),
         (2, 5.0, "view"), (2, None, "click"), (2, 8.0, "click")],
        "user_id long, ts double, event_type string",
    )
    out = funnel(df, "user_id", "ts", "event_type", ["view", "click"])
    got = {r["user_id"]: r["stage"] for r in out.collect()}
    # u1: NULL-ts view -> stage 1 only (the 10.0 click can't beat NULL)
    # u2: NULL-ts click ignored; the 8.0 click advances normally
    assert got == {1: 1, 2: 2}


def test_funnel_broadcast_modes(spark):
    """The stage-table broadcast is stats-gated (unconditional hints
    are OOM promises at web scale): all three modes give identical
    results; False suppresses the explicit hint."""
    from etl_core_spark.operators.timeseries import funnel

    df = _funnel_events(spark)
    want = {(r["user_id"], r["stage"]) for r in
            funnel(df, "user_id", "ts", "event_type",
                   ["view", "click", "purchase"]).collect()}
    for mode in (True, False):
        got = {(r["user_id"], r["stage"]) for r in
               funnel(df, "user_id", "ts", "event_type",
                      ["view", "click", "purchase"],
                      broadcast_stages=mode).collect()}
        assert got == want, mode
    hinted = funnel(df, "user_id", "ts", "event_type", ["view", "click"],
                    broadcast_stages=True)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()


def test_zscore_keeps_null_group_rows(spark):
    """Annotate operators must not change row count: a NULL group key
    forms its own group (groupBy keeps it) and the stats join-back is
    null-safe, so the row survives with its own group's stats."""
    rows = [("a", 1.0), ("a", 2.0), (None, 5.0), (None, 7.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    out = zscore_outliers(df, "value", ["g"], threshold=1.0)
    assert out.count() == 4
    nulls = out.where(F.col("g").isNull()).collect()
    assert len(nulls) == 2
    assert all(r["mean"] == 6.0 for r in nulls)  # stats from the NULL group


def test_densify_keeps_off_grid_buckets(spark):
    """Observed buckets that don't land on the min+k*step grid must
    keep their rows and aggregates (full outer with the spine), not
    vanish under a spine-sided left join."""
    df = spark.createDataFrame(
        [("x", 0), ("x", 5), ("x", 7)], "k string, bucket int"
    )
    out = densify_buckets(df, ["k"], "bucket", F.lit(2), {"n": "count:*"})
    got = {r["bucket"]: r["n"] for r in out.collect()}
    # grid 0,2,4,6 filled; observed off-grid 5 and 7 retained
    assert got == {0: 1, 2: 0, 4: 0, 6: 0, 5: 1, 7: 1}


def test_ewma_recursion_and_null_policy(spark):
    """EWMA per key: hand-computed recursion, NULL values don't
    advance the smoother (carry previous state; NULL before the
    first observation), total-order tiebreak, validation."""
    import math

    import pytest as _pytest

    from etl_core_spark.operators.base import OperatorConfigError, get_operator
    from etl_core_spark.operators.timeseries import ewma

    rows = [
        # key 1: plain series
        (1, 1, 10.0), (1, 2, 20.0), (1, 3, 0.0),
        # key 2: NULL before first obs, NULL mid-series
        (2, 1, None), (2, 2, 4.0), (2, 3, None), (2, 4, 8.0),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, value double")
    out = {
        (r["k"], r["seq"]): r["ewma"]
        for r in ewma(
            df, ["k"], ["seq"], "value", alpha=0.5
        ).collect()
    }
    f = lambda v: math.floor(v * 1e9) / 1e9  # noqa: E731
    s1 = 10.0
    s2 = 0.5 * 20.0 + 0.5 * s1
    s3 = 0.5 * 0.0 + 0.5 * s2
    assert out[(1, 1)] == f(s1) and out[(1, 2)] == f(s2)
    assert out[(1, 3)] == f(s3)
    assert out[(2, 1)] is None          # no observation yet
    assert out[(2, 2)] == f(4.0)
    assert out[(2, 3)] == f(4.0)        # NULL carries state
    assert out[(2, 4)] == f(0.5 * 8.0 + 0.5 * 4.0)
    # row-preserving and registry-routed
    op_out = get_operator("ewma")(
        key_cols=["k"], order_cols=["seq"], value_col="value"
    ).apply({"in": df})["out"]
    assert op_out.count() == len(rows)
    assert set(op_out.columns) == {"k", "seq", "value", "ewma"}
    with _pytest.raises(OperatorConfigError):
        ewma(df, [], ["seq"], "value")
    with _pytest.raises(OperatorConfigError):
        ewma(df, ["k"], ["seq"], "value", alpha=0.0)


# ----------------------------------------------------------- winsorize

def test_winsorize_clips_to_exact_percentiles(spark):
    rows = [(1, float(v)) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, "g long, v double")
    out = {
        r["v"]: r["v_w"]
        for r in get_operator("winsorize")(
            value_col="v", lower=0.05, upper=0.95
        ).apply({"in": df})["out"].collect()
    }
    # interpolated p5 of 1..100 = 5.95, p95 = 95.05
    assert out[1.0] == 5.95 and out[3.0] == 5.95
    assert out[100.0] == 95.05 and out[99.0] == 95.05
    assert out[50.0] == 50.0  # interior values untouched


def test_winsorize_per_group_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 100.0), ("b", 5.0), ("b", None)],
        "g string, v double",
    )
    out = [
        (r["g"], r["v"], r["v_w"])
        for r in get_operator("winsorize")(
            value_col="v", group_cols=["g"], lower=0.0, upper=0.5
        ).apply({"in": df})["out"].collect()
    ]
    by = {(g, v): w for g, v, w in out}
    assert by[("a", 100.0)] == 2.0  # clipped to group-a median
    assert by[("b", 5.0)] == 5.0    # group-b median is itself
    assert by[("b", None)] is None  # NULL passes through
    assert len(out) == 5            # row-preserving


def test_winsorize_nan_passthrough_and_all_null_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", float("nan")), ("n", None)],
        "g string, v double",
    )
    out = {
        (r["g"], str(r["v"])): r["v_w"]
        for r in get_operator("winsorize")(
            value_col="v", group_cols=["g"]
        ).apply({"in": df})["out"].collect()
    }
    import math
    assert math.isnan(out[("a", "nan")])   # NaN unclipped
    assert out[("n", "None")] is None      # all-NULL group passes rows


def test_winsorize_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("winsorize")(value_col="")
    with pytest.raises(OperatorConfigError):
        get_operator("winsorize")(value_col="v", lower=0.9, upper=0.1)


# --------------------------------------------------------- holt_linear

def test_holt_linear_matches_python_recursion(spark):
    import math

    xs = [10.0, 12.0, 15.0, 13.0, 18.0, 21.0]
    rows = [(1, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = {
        r["t"]: (r["level"], r["trend"])
        for r in get_operator("holt_linear")(
            key_cols=["k"], order_cols=["t"], value_col="v",
            alpha=0.3, beta=0.2,
        ).apply({"in": df})["out"].collect()
    }
    lv, tv = None, 0.0
    for i, x in enumerate(xs):
        if lv is None:
            lv, tv = x, 0.0
        else:
            lnew = 0.3 * x + (1.0 - 0.3) * (lv + tv)
            tv = 0.2 * (lnew - lv) + (1.0 - 0.2) * tv
            lv = lnew
        assert out[i] == (
            math.floor(lv * 1e9) / 1e9, math.floor(tv * 1e9) / 1e9
        )


def test_holt_linear_null_carries_state(spark):
    rows = [(1, 0, None), (1, 1, 10.0), (1, 2, None), (1, 3, 20.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = {
        r["t"]: (r["level"], r["trend"])
        for r in get_operator("holt_linear")(
            key_cols=["k"], order_cols=["t"], value_col="v",
        ).apply({"in": df})["out"].collect()
    }
    assert out[0] == (None, None)       # before the first observation
    assert out[1] == (10.0, 0.0)
    assert out[2] == (10.0, 0.0)        # NULL carries state
    assert out[3][0] > 10.0             # the 20.0 advances the level


def test_holt_linear_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("holt_linear")(key_cols=[], order_cols=["t"], value_col="v")
    with pytest.raises(OperatorConfigError):
        get_operator("holt_linear")(
            key_cols=["k"], order_cols=["t"], value_col="v", beta=1.5
        )


# --------------------------------------------------------------- cusum

def test_cusum_matches_python_recursion(spark):
    import math

    xs = [10.0, 12.0, 30.0, 31.0, 29.0, 5.0, 4.0]
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)], "k long, t long, v double"
    )
    out = {
        r["t"]: (r["s_pos"], r["s_neg"], r["alarm"])
        for r in get_operator("cusum")(
            key_cols=["k"], order_cols=["t"], value_col="v",
            target=12.0, slack=1.0, threshold=20.0,
        ).apply({"in": df})["out"].collect()
    }
    sp = sn = 0.0
    for i, x in enumerate(xs):
        sp = max(0.0, sp + (x - 12.0 - 1.0))
        sn = max(0.0, sn + (12.0 - x - 1.0))
        assert out[i] == (
            math.floor(sp * 1e9) / 1e9,
            math.floor(sn * 1e9) / 1e9,
            sp > 20.0 or sn > 20.0,
        )
    # the 30/31/29 burst must actually have alarmed the positive side
    assert out[4][2] is True


def test_cusum_null_carries_and_no_threshold(spark):
    df = spark.createDataFrame(
        [(1, 0, 100.0), (1, 1, None)], "k long, t long, v double"
    )
    out = {
        r["t"]: (r["s_pos"], r["alarm"])
        for r in get_operator("cusum")(
            key_cols=["k"], order_cols=["t"], value_col="v", target=10.0,
        ).apply({"in": df})["out"].collect()
    }
    assert out[0][0] == 90.0
    assert out[1][0] == 90.0     # NULL carries state
    assert out[0][1] is None     # no threshold -> alarm NULL


def test_cusum_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("cusum")(key_cols=["k"], order_cols=["t"], value_col="v")
    with pytest.raises(OperatorConfigError):
        get_operator("cusum")(
            key_cols=["k"], order_cols=["t"], value_col="v",
            target=0.0, slack=-1,
        )


# -------------------------------------------------------- holt_winters

def test_holt_winters_matches_python_recursion(spark):
    import collections
    import math

    xs = [10.0, 14.0, 8.0, 12.0, 11.0, 15.0, 9.0, 13.0, 12.0, 16.0]
    m, a, bb, g = 4, 0.3, 0.1, 0.2
    rows = [(1, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = {
        r["t"]: (r["level"], r["trend"], r["seasonal"])
        for r in get_operator("holt_winters")(
            key_cols=["k"], order_cols=["t"], value_col="v",
            period=m, alpha=a, beta=bb, gamma=g,
        ).apply({"in": df})["out"].collect()
    }
    lv, tv, sv = None, 0.0, 0.0
    ring = collections.deque([0.0] * m)
    for i, x in enumerate(xs):
        if lv is None:
            lv, tv, sv = x, 0.0, 0.0
        else:
            s_old = ring.popleft()
            lnew = a * (x - s_old) + (1.0 - a) * (lv + tv)
            tv = bb * (lnew - lv) + (1.0 - bb) * tv
            sv = g * (x - lnew) + (1.0 - g) * s_old
            lv = lnew
            ring.append(sv)
        assert out[i] == (
            math.floor(lv * 1e9) / 1e9,
            math.floor(tv * 1e9) / 1e9,
            math.floor(sv * 1e9) / 1e9,
        )


def test_holt_winters_seasonal_converges_to_cycle(spark):
    # a pure period-2 alternating series: the seasonal indices should
    # take opposite signs once warmed up, and the trend should stay
    # near zero (no drift in the series)
    xs = [10.0, 20.0] * 20
    rows = [(1, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = sorted(
        get_operator("holt_winters")(
            key_cols=["k"], order_cols=["t"], value_col="v",
            period=2, alpha=0.3, beta=0.1, gamma=0.4,
        ).apply({"in": df})["out"].collect(),
        key=lambda r: r["t"],
    )
    tail = out[-4:]
    lows = [r["seasonal"] for r in tail if r["v"] == 10.0]
    highs = [r["seasonal"] for r in tail if r["v"] == 20.0]
    assert all(s < -2.0 for s in lows)
    assert all(s > 2.0 for s in highs)
    assert all(abs(r["trend"]) < 1.0 for r in tail)


def test_holt_winters_null_carries_all_state(spark):
    rows = [(1, 0, 10.0), (1, 1, None), (1, 2, 20.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = {
        r["t"]: (r["level"], r["trend"], r["seasonal"])
        for r in get_operator("holt_winters")(
            key_cols=["k"], order_cols=["t"], value_col="v", period=3,
        ).apply({"in": df})["out"].collect()
    }
    assert out[1] == out[0]              # NULL carries, ring untouched
    assert out[2][0] > out[0][0]         # the 20.0 advances the level


def test_holt_winters_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("holt_winters")(
            key_cols=["k"], order_cols=["t"], value_col="v", period=1
        )
    with pytest.raises(OperatorConfigError):
        get_operator("holt_winters")(
            key_cols=["k"], order_cols=["t"], value_col="v",
            period=4, gamma=1.5,
        )
    with pytest.raises(OperatorConfigError):
        get_operator("holt_winters")(
            key_cols=[], order_cols=["t"], value_col="v", period=4
        )


# ----------------------------------------------------------- theil_sen

def test_theil_sen_known_series(spark):
    import math
    import statistics

    # v = 2*t + noise on one key; hand-check against the definition
    pts = [(0.0, 1.0), (1.0, 3.5), (2.0, 4.5), (3.0, 7.5), (4.0, 8.0)]
    df = spark.createDataFrame(
        [(1, t, v) for t, v in pts], "k long, t double, v double"
    )
    out = get_operator("theil_sen")(
        key_cols=["k"], time_col="t", value_col="v",
    ).apply({"in": df})["out"].collect()
    assert len(out) == 1
    r = out[0]
    slopes = sorted(
        (vj - vi) / ((tj - ti) / 1.0)
        for i, (ti, vi) in enumerate(pts)
        for tj, vj in pts[i + 1:]
    )
    med = statistics.median(slopes)
    assert r["n_obs"] == 5 and r["n_pairs"] == 10
    assert r["slope"] == math.floor(med * 1e9) / 1e9
    resid = sorted(v - med * t for t, v in pts)
    assert r["intercept"] == math.floor(statistics.median(resid) * 1e9) / 1e9


def test_theil_sen_robust_to_outlier_and_equal_times_excluded(spark):
    rows = [(1, float(t), 2.0 * t) for t in range(10)]
    rows[5] = (1, 5.0, 500.0)             # one wild outlier
    rows.append((1, 9.0, 999.0))          # duplicate time: pairs with
    df = spark.createDataFrame(rows, "k long, t double, v double")
    r = get_operator("theil_sen")(
        key_cols=["k"], time_col="t", value_col="v",
    ).apply({"in": df})["out"].collect()[0]
    assert abs(r["slope"] - 2.0) < 1.0    # OLS would be wrecked
    # 11 obs -> 55 unordered pairs minus the 1 equal-time pair
    assert r["n_pairs"] == 54


def test_theil_sen_max_points_guard(spark):
    df = spark.createDataFrame(
        [(1, float(i), float(i)) for i in range(30)],
        "k long, t double, v double",
    )
    with pytest.raises(OperatorConfigError, match="max_points"):
        get_operator("theil_sen")(
            key_cols=["k"], time_col="t", value_col="v", max_points=10,
        ).apply({"in": df})["out"]
    # None skips the probe entirely
    out = get_operator("theil_sen")(
        key_cols=["k"], time_col="t", value_col="v", max_points=None,
    ).apply({"in": df})["out"]
    assert out.count() == 1


def test_theil_sen_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("theil_sen")(key_cols=[], time_col="t", value_col="v")
    with pytest.raises(OperatorConfigError):
        get_operator("theil_sen")(
            key_cols=["k"], time_col="t", value_col="v", time_divisor=0.0
        )


# ----------------------------------------------------------- ols_trend

def test_ols_exact_line_and_hand_check(spark):
    import math

    # exact line y = 2t + 5 -> slope 2, intercept 5, r2 = 1
    rows = [(1, t, 2.0 * t + 5.0) for t in range(10)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    r = get_operator("ols_trend")(
        key_cols=["k"], time_col="t", value_col="v",
    ).apply({"in": df})["out"].collect()[0]
    assert r["n"] == 10
    assert abs(r["slope"] - 2.0) < 1e-9
    assert abs(r["intercept"] - 5.0) < 1e-9
    assert r["r2"] == math.floor(1.0 * 1e9) / 1e9 or r["r2"] == 1.0

    # noisy series: compare against the numpy-free textbook formula
    vals = [3.0, 7.0, 6.0, 12.0, 11.0, 18.0]
    df2 = spark.createDataFrame(
        [(1, t, v) for t, v in enumerate(vals)], "k long, t long, v double"
    )
    r2 = get_operator("ols_trend")(
        key_cols=["k"], time_col="t", value_col="v",
    ).apply({"in": df2})["out"].collect()[0]
    n = len(vals)
    xs = list(range(n))
    ys = [round(v * 100) for v in vals]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    sl = num / den
    assert r2["slope"] == math.floor(sl / 100.0 * 1e9) / 1e9 or abs(
        r2["slope"] - sl / 100.0
    ) < 1e-8
    exp_r2 = (num * num) / (den * (n * syy - sy * sy))
    assert abs(r2["r2"] - exp_r2) < 1e-8


def test_ols_degenerate_fits_are_null(spark):
    # all x equal -> vertical; all y equal -> zero variance
    df = spark.createDataFrame(
        [(1, 5, 1.0), (1, 5, 2.0), (2, 1, 7.0), (2, 2, 7.0)],
        "k long, t long, v double",
    )
    rows = {r["k"]: r for r in get_operator("ols_trend")(
        key_cols=["k"], time_col="t", value_col="v",
    ).apply({"in": df})["out"].collect()}
    assert rows[1]["slope"] is None and rows[1]["r2"] is None
    assert rows[2]["slope"] is None


def test_ols_moments_are_reduction_order_independent(spark):
    # same data, 1 vs 32 partitions: identical output (integer sums)
    rows = [(1, t, float((t * 37) % 101) + 0.13) for t in range(2000)]
    df1 = spark.createDataFrame(rows, "k long, t long, v double").coalesce(1)
    df32 = spark.createDataFrame(rows, "k long, t long, v double").repartition(32)
    op = get_operator("ols_trend")(key_cols=["k"], time_col="t", value_col="v")
    a = op.apply({"in": df1})["out"].collect()[0]
    b = op.apply({"in": df32})["out"].collect()[0]
    assert (a["slope"], a["intercept"], a["r2"]) == (
        b["slope"], b["intercept"], b["r2"]
    )


def test_ols_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("ols_trend")(key_cols=[], time_col="t", value_col="v")
    with pytest.raises(OperatorConfigError):
        get_operator("ols_trend")(
            key_cols=["k"], time_col="t", value_col="v", value_scale=0
        )


# -------------------------------------------------------- kaplan_meier

def test_kaplan_meier_textbook_example(spark):
    # durations: events at 1, 3; censored at 2; event at 4
    rows = [
        (1, 1.0, True), (1, 2.0, False), (1, 3.0, True), (1, 4.0, True),
    ]
    df = spark.createDataFrame(rows, "k long, d double, e boolean")
    out = {r["t"]: r for r in get_operator("kaplan_meier")(
        key_cols=["k"], duration_col="d", event_col="e",
    ).apply({"in": df})["out"].collect()}
    import math

    # t=1: n=4, d=1 -> S = 3/4
    s1 = 1.0 * (1.0 - 1.0 / 4.0)
    assert out[1.0]["n_risk"] == 4 and out[1.0]["n_event"] == 1
    assert out[1.0]["survival"] == math.floor(s1 * 1e9) / 1e9
    # t=2: censor only -> S unchanged, risk set shrinks
    s2 = s1 * (1.0 - 0.0 / 3.0)
    assert out[2.0]["n_censor"] == 1 and out[2.0]["n_risk"] == 3
    assert out[2.0]["survival"] == math.floor(s2 * 1e9) / 1e9
    # t=3: n=2, d=1 -> S = 3/4 * 1/2
    s3 = s2 * (1.0 - 1.0 / 2.0)
    assert out[3.0]["survival"] == math.floor(s3 * 1e9) / 1e9
    # t=4: last subject dies -> S = 0
    assert out[4.0]["survival"] == 0.0


def test_kaplan_meier_ties_and_null_event_is_censor(spark):
    rows = [(1, 5.0, True), (1, 5.0, True), (1, 5.0, None), (1, 7.0, False)]
    df = spark.createDataFrame(rows, "k long, d double, e boolean")
    out = sorted(get_operator("kaplan_meier")(
        key_cols=["k"], duration_col="d", event_col="e",
    ).apply({"in": df})["out"].collect(), key=lambda r: r["t"])
    assert out[0]["n_risk"] == 4 and out[0]["n_event"] == 2
    assert out[0]["n_censor"] == 1            # NULL event flag = censored
    assert out[1]["n_risk"] == 1 and out[1]["survival"] == out[0]["survival"]


def test_kaplan_meier_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("kaplan_meier")(key_cols=[], duration_col="d", event_col="e")


# -------------------------------------------------- seasonal_decompose

def test_seasonal_decompose_recovers_cycle_and_linear_trend(spark):
    cyc = [5.0, -3.0, 1.0, -3.0]              # sums to zero already
    rows = [(1, t, 10.0 + 0.5 * t + cyc[t % 4]) for t in range(24)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = {r["t"]: r for r in get_operator("seasonal_decompose")(
        key_cols=["k"], order_cols=["t"], value_col="v", period=4,
    ).apply({"in": df})["out"].collect()}
    # edge rows: no full centered window
    assert out[0]["trend"] is None and out[23]["trend"] is None
    for t in range(2, 22):
        assert abs(out[t]["trend"] - (10.0 + 0.5 * t)) < 1e-6
        assert abs(out[t]["seasonal"] - cyc[t % 4]) < 1e-6
        assert abs(out[t]["residual"]) < 1e-6


def test_seasonal_decompose_odd_period_and_partition_invariance(spark):
    cyc = [2.0, 0.0, -2.0]
    rows = [(1, t, 7.0 + cyc[t % 3]) for t in range(30)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    op = get_operator("seasonal_decompose")(
        key_cols=["k"], order_cols=["t"], value_col="v", period=3,
    )
    a = sorted(op.apply({"in": df.coalesce(1)})["out"].collect(),
               key=lambda r: r["t"])
    b = sorted(op.apply({"in": df.repartition(16)})["out"].collect(),
               key=lambda r: r["t"])
    assert [(r["trend"], r["seasonal"], r["residual"]) for r in a] == [
        (r["trend"], r["seasonal"], r["residual"]) for r in b
    ]
    mid = a[10]
    assert abs(mid["trend"] - 7.0) < 1e-6
    assert abs(mid["seasonal"] - cyc[10 % 3]) < 1e-6


def test_seasonal_decompose_short_series_null_seasonal(spark):
    # 3 rows with period 4: no phase ever gets a valid detrended value
    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, 2.0), (1, 2, 3.0)], "k long, t long, v double"
    )
    out = get_operator("seasonal_decompose")(
        key_cols=["k"], order_cols=["t"], value_col="v", period=4,
    ).apply({"in": df})["out"].collect()
    assert all(r["seasonal"] is None and r["residual"] is None for r in out)


def test_seasonal_decompose_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("seasonal_decompose")(
            key_cols=["k"], order_cols=["t"], value_col="v", period=1
        )
    with pytest.raises(OperatorConfigError):
        get_operator("seasonal_decompose")(
            key_cols=[], order_cols=["t"], value_col="v", period=4
        )


# ------------------------------------------------------------------------ acf


def _acf_ref(ys, k, scale=100):
    import math

    y = [math.floor(v * scale + 0.5) for v in ys]
    n = len(y)
    if n <= k:
        return None
    yb = sum(y) / n
    num = sum((y[t] - yb) * (y[t + k] - yb) for t in range(n - k))
    den = sum((v - yb) ** 2 for v in y)
    if den == 0:
        return None
    return math.floor(num / den * 1e9) / 1e9


def test_acf_matches_python_reference(spark):
    import random

    rng = random.Random(7)
    rows = []
    series = {}
    for key in ("a", "b"):
        ys = [round(rng.uniform(0, 50), 2) for _ in range(30)]
        series[key] = ys
        rows += [(key, t, v) for t, v in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = get_operator("acf")(
        key_cols=["k"], order_cols=["t"], value_col="v", max_lag=4
    ).apply({"in": df})["out"]
    got = {(r["k"], r["lag"]): (r["n_pairs"], r["acf"])
           for r in out.collect()}
    for key, ys in series.items():
        for k in range(1, 5):
            assert got[(key, k)] == (len(ys) - k, _acf_ref(ys, k))


def test_acf_perfect_cycle_and_constant_series(spark):
    # period-2 alternating series: acf(2) near +1, acf(1) near -1
    ys = [1.0, 5.0] * 10
    rows = [("a", t, v) for t, v in enumerate(ys)]
    rows += [("c", t, 3.0) for t in range(8)]  # constant -> NULL
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = get_operator("acf")(
        key_cols=["k"], order_cols=["t"], value_col="v", max_lag=2
    ).apply({"in": df})["out"]
    got = {(r["k"], r["lag"]): r["acf"] for r in out.collect()}
    assert got[("a", 2)] > 0.85 and got[("a", 1)] < -0.85
    assert got[("c", 1)] is None and got[("c", 2)] is None


def test_acf_short_series_emits_only_feasible_lags(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 2.0)], "k string, t int, v double"
    )
    out = get_operator("acf")(
        key_cols=["k"], order_cols=["t"], value_col="v", max_lag=5
    ).apply({"in": df})["out"]
    rows = out.collect()
    assert [r["lag"] for r in rows] == [1] and rows[0]["n_pairs"] == 1


def test_acf_null_values_drop_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, None), ("a", 2, 2.0), ("a", 3, 4.0)],
        "k string, t int, v double",
    )
    out = get_operator("acf")(
        key_cols=["k"], order_cols=["t"], value_col="v", max_lag=1
    ).apply({"in": df})["out"]
    # NULL row drops BEFORE pairing: 3 points -> 2 lag-1 pairs
    assert out.collect()[0]["n_pairs"] == 2
    with pytest.raises(OperatorConfigError):
        get_operator("acf")(
            key_cols=["k"], order_cols=["t"], value_col="v", max_lag=0
        ).validate_config()
    with pytest.raises(OperatorConfigError):
        get_operator("acf")(
            key_cols=[], order_cols=["t"], value_col="v"
        ).validate_config()
    with pytest.raises(OperatorConfigError):
        get_operator("acf")(
            key_cols=["k"], order_cols=[], value_col="v"
        ).validate_config()


# ------------------------------------------------------------------------ ccf


def _ccf_ref(xs, ys, k, scale=100):
    import math

    X = [math.floor(v * scale + 0.5) for v in xs]
    Y = [math.floor(v * scale + 0.5) for v in ys]
    n = len(X)
    sx, sy = sum(X), sum(Y)
    if k >= 0:
        pairs = [(X[t], Y[t + k]) for t in range(n - k)]
    else:
        pairs = [(X[t - k], Y[t]) for t in range(n + k)]
    nk = len(pairs)
    if nk == 0:
        return None
    num = (n * n * sum(x * y for x, y in pairs)
           - n * sy * sum(x for x, _ in pairs)
           - n * sx * sum(y for _, y in pairs)
           + nk * sx * sy)
    dx = n * sum(v * v for v in X) - sx * sx
    dy = n * sum(v * v for v in Y) - sy * sy
    if dx == 0 or dy == 0:
        return (nk, None)
    r = num / (n * math.sqrt(dx) * math.sqrt(dy))
    return (nk, math.floor(r * 1e9) / 1e9)


def test_ccf_matches_python_reference_and_finds_lead(spark):
    import random

    rng = random.Random(13)
    xs = [round(rng.uniform(0, 20), 2) for _ in range(30)]
    # y follows x two steps later
    ys = [round(x * 0.7 + rng.uniform(0, 2), 2)
          for x in [0.0, 0.0] + xs[:-2]]
    rows = [("a", t, x, y) for t, (x, y) in enumerate(zip(xs, ys))]
    df = spark.createDataFrame(rows, "k string, t int, x double, y double")
    out = get_operator("ccf")(
        key_cols=["k"], order_cols=["t"], x_col="x", y_col="y", max_lag=3
    ).apply({"in": df})["out"]
    got = {r["lag"]: (r["n_pairs"], r["ccf"]) for r in out.collect()}
    for k in range(-3, 4):
        assert got[k] == _ccf_ref(xs, ys, k)
    assert max(got, key=lambda k: got[k][1]) == 2


def test_ccf_constant_series_null_and_symmetry(spark):
    # ccf of (x, x) at lag k equals acf at |k| and is symmetric
    ys = [1.0, 4.0, 2.0, 8.0, 5.0, 7.0, 3.0, 6.0]
    rows = [("a", t, v, v) for t, v in enumerate(ys)]
    rows += [("c", t, 2.0, float(t)) for t in range(5)]
    df = spark.createDataFrame(rows, "k string, t int, x double, y double")
    out = get_operator("ccf")(
        key_cols=["k"], order_cols=["t"], x_col="x", y_col="y", max_lag=2
    ).apply({"in": df})["out"]
    got = {(r["k"], r["lag"]): r["ccf"] for r in out.collect()}
    assert got[("a", 0)] == 1.0  # exact: num == n*sqrt(dx)*sqrt(dx)
    assert got[("a", 1)] == got[("a", -1)]
    assert got[("a", 2)] == got[("a", -2)]
    assert all(got[("c", k)] is None for k in range(-2, 3))


def test_ccf_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("ccf")(
            key_cols=["k"], order_cols=["t"], x_col="x"
        ).validate_config()
    with pytest.raises(OperatorConfigError):
        get_operator("ccf")(
            key_cols=["k"], order_cols=["t"], x_col="x", y_col="y",
            max_lag=-1,
        ).validate_config()


def test_acf_ccf_moment_overflow_raises_loudly(spark):
    """DECIMAL(38,0) moment overflow must be loud, never a NULL acf
    that reads as zero variance (ADVICE r11). Under ANSI Spark the
    decimal arithmetic itself raises; with ansi off the NULL-moment
    guard in the final projection fires. Either way: an error."""
    rows = [("k", t, 9e17, 9e17) for t in range(20)]

    def build(ansi_df):
        a = get_operator("acf")(
            key_cols=["k"], order_cols=["t"], value_col="v",
            value_scale=1, max_lag=1,
        ).apply({"in": ansi_df})["out"]
        c = get_operator("ccf")(
            key_cols=["k"], order_cols=["t"], x_col="v", y_col="y",
            value_scale=1, max_lag=1,
        ).apply({"in": ansi_df})["out"]
        return a, c

    old = spark.conf.get("spark.sql.ansi.enabled")
    try:
        # exercise OUR guard: non-ANSI overflow silently NULLs the
        # moments, and the projection must turn that into a raise.
        # The null-on-overflow flag is baked in at ANALYSIS time, so
        # the plan must be BUILT under ansi=false as well.
        spark.conf.set("spark.sql.ansi.enabled", "false")
        df = spark.createDataFrame(
            rows, "k string, t int, v double, y double"
        )
        acf_out, ccf_out = build(df)
        with pytest.raises(Exception, match="overflow"):
            acf_out.collect()
        with pytest.raises(Exception, match="overflow"):
            ccf_out.collect()
        # ANSI path: Spark's own decimal check raises first
        spark.conf.set("spark.sql.ansi.enabled", "true")
        acf_ansi, _ = build(df)
        with pytest.raises(Exception,
                           match="overflow|cannot be represented"):
            acf_ansi.collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_acf_ccf_empty_inputs(spark):
    empty = spark.createDataFrame([], "k string, t int, v double")
    out = get_operator("acf")(
        key_cols=["k"], order_cols=["t"], value_col="v"
    ).apply({"in": empty})["out"]
    assert out.count() == 0
    empty2 = spark.createDataFrame([], "k string, t int, x double, y double")
    out2 = get_operator("ccf")(
        key_cols=["k"], order_cols=["t"], x_col="x", y_col="y"
    ).apply({"in": empty2})["out"]
    assert out2.count() == 0
