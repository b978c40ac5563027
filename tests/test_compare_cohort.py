"""Hand-computed pins for the dataset-comparison and behavioral-
analytics operators: diff_datasets, scd2_merge, mad_outliers,
retention_cohorts, markov_transitions."""

import datetime

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator


def _diff(spark, left_rows, right_rows, **cfg):
    left = spark.createDataFrame(left_rows, "k long, a string, b double")
    right = spark.createDataFrame(right_rows, "k long, a string, b double")
    return {
        r["k"]: (r["diff_status"], r["changed_cols"])
        for r in get_operator("diff_datasets")(key_cols=["k"], **cfg)
        .apply({"left": left, "right": right})["out"]
        .collect()
    }


def test_diff_datasets_hand_computed(spark):
    out = _diff(
        spark,
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (4, "w", 4.0)],
        [(1, "x", 1.0), (2, "Y", 2.0), (4, "w", 9.0), (5, "n", 5.0)],
    )
    assert out == {
        1: ("unchanged", []),
        2: ("changed", ["a"]),
        3: ("removed", []),
        4: ("changed", ["b"]),
        5: ("added", []),
    }


def test_diff_datasets_null_safe_values_and_keys(spark):
    # NULL vs value is a change; NULL vs NULL is not; NULL keys PAIR
    # (null-safe join) instead of landing in both added and removed
    out = _diff(
        spark,
        [(None, "x", None), (7, None, 1.0)],
        [(None, "x", 5.0), (7, None, 1.0)],
    )
    assert out == {None: ("changed", ["b"]), 7: ("unchanged", [])}


def test_diff_datasets_multi_change_sorted(spark):
    out = _diff(spark, [(1, "x", 1.0)], [(1, "q", 2.0)])
    assert out == {1: ("changed", ["a", "b"])}  # sorted col names


def test_diff_datasets_default_compare_cols(spark):
    # default = shared non-key columns: right lacks 'b', so only 'a'
    # is compared
    left = spark.createDataFrame([(1, "x", 1.0)], "k long, a string, b double")
    right = spark.createDataFrame([(1, "x")], "k long, a string")
    rows = (
        get_operator("diff_datasets")(key_cols=["k"])
        .apply({"left": left, "right": right})["out"]
        .collect()
    )
    assert [(r["diff_status"], r["changed_cols"]) for r in rows] == [
        ("unchanged", [])
    ]


def test_diff_datasets_requires_keys():
    with pytest.raises(OperatorConfigError):
        get_operator("diff_datasets")(key_cols=[])


D = datetime.date


def _scd2(spark, current_rows, update_rows):
    cur = spark.createDataFrame(
        current_rows, "k long, v string, valid_from date, valid_to date"
    )
    upd = spark.createDataFrame(update_rows, "k long, v string, eff date")
    out = (
        get_operator("scd2_merge")(
            key_cols=["k"], tracked_cols=["v"], effective_col="eff"
        )
        .apply({"current": cur, "updates": upd})["out"]
        .collect()
    )
    return sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"]) for r in out
    )


def test_scd2_merge_hand_computed(spark):
    eff = D(2024, 6, 1)
    out = _scd2(
        spark,
        [
            (1, "a", D(2023, 1, 1), None),       # will change
            (2, "b", D(2023, 1, 1), None),       # no-op update
            (3, "c", D(2023, 1, 1), None),       # no update at all
            (1, "a0", D(2022, 1, 1), D(2023, 1, 1)),  # history
        ],
        [(1, "a2", eff), (2, "b", eff), (9, "new", eff)],
    )
    assert out == sorted(
        [
            (1, "a0", D(2022, 1, 1), D(2023, 1, 1)),  # history untouched
            (1, "a", D(2023, 1, 1), eff),             # closed
            (1, "a2", eff, None),                     # new open version
            (2, "b", D(2023, 1, 1), None),            # no-op: stays open
            (3, "c", D(2023, 1, 1), None),            # untouched open
            (9, "new", eff, None),                    # brand-new key
        ]
    )


def test_scd2_merge_latest_update_wins_in_batch(spark):
    # two updates for one key in a batch: only the latest effective
    # time materializes (intermediate version is NOT created)
    out = _scd2(
        spark,
        [(1, "a", D(2023, 1, 1), None)],
        [(1, "mid", D(2024, 3, 1)), (1, "late", D(2024, 6, 1))],
    )
    assert out == sorted(
        [
            (1, "a", D(2023, 1, 1), D(2024, 6, 1)),
            (1, "late", D(2024, 6, 1), None),
        ]
    )


def test_scd2_merge_late_update_never_inverts_interval(spark):
    # an update effective BEFORE the open version's valid_from must
    # not emit valid_to < valid_from; the boundary clamps to the open
    # version's start (zero-length closed row, correction semantics)
    out = _scd2(
        spark,
        [(1, "a", D(2024, 1, 1), None)],
        [(1, "b", D(2023, 6, 1))],  # late: precedes valid_from
    )
    assert out == sorted(
        [
            (1, "a", D(2024, 1, 1), D(2024, 1, 1)),  # zero-length close
            (1, "b", D(2024, 1, 1), None),           # opens at clamp
        ]
    )
    for _k, _v, f, t in out:
        assert t is None or t >= f, f"inverted interval: [{f}, {t})"


def test_scd2_merge_idempotent_redelivery(spark):
    # applying the same batch twice: second application is a no-op
    cur = [(1, "a", D(2023, 1, 1), None)]
    upd = [(1, "b", D(2024, 6, 1))]
    once = _scd2(spark, cur, upd)
    twice = _scd2(spark, [(k, v, f, t) for k, v, f, t in once], upd)
    assert once == twice


def test_ks_drift_matches_reference(spark):
    """Exact two-sample KS vs an independent reference (numpy
    sort-based sup |F1-F2| with tie-correct evaluation), plus the
    poles: identical samples D=0, disjoint ranges D=1, and the
    one-sided-group contract."""
    import math

    import numpy as np

    from etl_core_spark.operators.base import get_operator

    rng_a = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0]
    rng_b = [1.0, 2.0, 4.0, 4.0, 6.0]

    def ref_ks(a, b):
        vals = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        d = 0.0
        for v in vals:
            f1 = sum(1 for x in a if x <= v) / na
            f2 = sum(1 for x in b if x <= v) / nb
            d = max(d, abs(f1 - f2))
        return math.floor(d * 1e6) / 1e6

    left = spark.createDataFrame(
        [("g", v) for v in rng_a]
        + [("same", float(v)) for v in (1, 2, 3)]
        + [("disjoint", float(v)) for v in (1, 2)]
        + [("only_left", 7.0)],
        "grp string, v double",
    )
    right = spark.createDataFrame(
        [("g", v) for v in rng_b]
        + [("same", float(v)) for v in (1, 2, 3)]
        + [("disjoint", float(v)) for v in (10, 11)],
        "grp string, v double",
    )
    out = get_operator("ks_drift")(
        value_col="v", group_cols=["grp"]
    ).apply({"left": left, "right": right})["out"]
    got = {
        r["grp"]: (r["n_left"], r["n_right"], r["ks_stat"])
        for r in out.collect()
    }
    assert got["g"] == (6, 5, ref_ks(rng_a, rng_b))
    assert got["same"] == (3, 3, 0.0)
    assert got["disjoint"] == (2, 2, 1.0)
    assert got["only_left"] == (1, 0, 1.0)
    # scipy cross-check when available (container has no scipy —
    # guard, don't skip silently elsewhere)
    try:
        from scipy.stats import ks_2samp

        assert got["g"][2] == pytest.approx(
            math.floor(ks_2samp(np.array(rng_a), np.array(rng_b)).statistic * 1e6) / 1e6,
            abs=1e-9,
        )
    except ImportError:
        pass


def test_mad_outliers_hand_computed(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4, 100)]
        + [("const", 5.0), ("const", 5.0), ("g", None)],
        "grp string, v double",
    )
    rows = {
        (r["grp"], r["v"]): (
            r["median"], r["mad"], r["robust_z"], r["is_outlier"]
        )
        for r in get_operator("mad_outliers")(
            value_col="v", group_cols=["grp"]
        )
        .apply({"in": df})["out"]
        .collect()
    }
    # g: median 3, |dev| = [2,1,0,1,97] -> MAD 1; z(100) = .6745*97
    med, mad, z, flag = rows[("g", 100.0)]
    assert (med, mad) == (3.0, 1.0)
    assert abs(z - 0.6744897501960817 * 97) < 1e-6 and flag is True
    assert rows[("g", 3.0)][2:] == (0.0, False)
    # constant group: MAD 0 -> z 0, never an outlier
    assert rows[("const", 5.0)] == (5.0, 0.0, 0.0, False)
    # NULL value: NULL z, REAL false flag (annotate contract)
    assert rows[("g", None)][2:] == (None, False)


def test_retention_cohorts_hand_computed(spark):
    # u1 first seen wk of Mon 2024-01-01; active again wk of 01-15
    # u2 first seen wk of 01-08; active 01-08 twice (counted once)
    rows = [
        (1, "2024-01-02 10:00:00"),
        (1, "2024-01-16 10:00:00"),
        (2, "2024-01-08 09:00:00"),
        (2, "2024-01-09 23:00:00"),
        (None, "2024-01-01 00:00:00"),  # NULL user dropped
        (3, None),                      # NULL time dropped
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string")
    out = {
        (r["cohort"], r["period_offset"]): r["n_users"]
        for r in get_operator("retention_cohorts")(
            user_col="user_id", time_col="ts", granularity="week"
        )
        .apply({"in": df})["out"]
        .collect()
    }
    assert out == {
        (D(2024, 1, 1), 0): 1,
        (D(2024, 1, 1), 2): 1,
        (D(2024, 1, 8), 0): 1,
    }


def test_retention_cohorts_month_offsets(spark):
    df = spark.createDataFrame(
        [(1, "2023-11-15 00:00:00"), (1, "2024-02-01 00:00:00")],
        "user_id long, ts string",
    )
    out = {
        (r["cohort"], r["period_offset"]): r["n_users"]
        for r in get_operator("retention_cohorts")(
            user_col="user_id", time_col="ts", granularity="month"
        )
        .apply({"in": df})["out"]
        .collect()
    }
    # Nov 2023 -> Feb 2024 = 3 months across the year boundary
    assert out == {(D(2023, 11, 1), 0): 1, (D(2023, 11, 1), 3): 1}


def test_markov_transitions_hand_computed(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, e string")
    out = {
        (r["from_event"], r["to_event"]): (r["n"], r["p"])
        for r in get_operator("markov_transitions")(
            user_col="u", time_col="t", event_col="e", order_cols=[]
        )
        .apply({"in": df})["out"]
        .collect()
    }
    # from a: ->b twice, ->c once; from b: ->a once (user 2 ends at b)
    assert out == {
        ("a", "b"): (2, 0.666667),
        ("a", "c"): (1, 0.333333),
        ("b", "a"): (1, 1.0),
    }


def test_markov_transitions_tiebreak_is_deterministic(spark):
    # equal timestamps: order_cols breaks the tie the same way every
    # run (without it the lead() would be nondeterministic)
    rows = [(1, 1, 10, "a"), (1, 1, 11, "b"), (1, 2, 12, "c")]
    df = spark.createDataFrame(rows, "u long, t long, eid long, e string")
    out = {
        (r["from_event"], r["to_event"]): r["n"]
        for r in get_operator("markov_transitions")(
            user_col="u", time_col="t", event_col="e", order_cols=["eid"]
        )
        .apply({"in": df})["out"]
        .collect()
    }
    assert out == {("a", "b"): 1, ("b", "c"): 1}


def _cdc(spark, snap_rows, change_rows, **cfg):
    snap = spark.createDataFrame(snap_rows, "k long, v string, extra double")
    ch = spark.createDataFrame(change_rows, "k long, seq long, op string, v string")
    out = (
        get_operator("cdc_apply")(key_cols=["k"], **cfg)
        .apply({"snapshot": snap, "changes": ch})["out"]
    )
    assert out.columns == ["k", "v", "extra"]
    return {r["k"]: (r["v"], r["extra"]) for r in out.collect()}


def test_cdc_apply_upsert_delete_passthrough(spark):
    out = _cdc(
        spark,
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        [
            (2, 10, "U", "B"),      # update existing
            (3, 10, "D", None),     # delete existing
            (4, 10, "I", "d"),      # brand-new key
            (5, 10, "D", None),     # delete of a key we never had: no-op
        ],
    )
    # 1 untouched; 2 updated (extra carries over); 3 gone; 4 new
    # (extra NULL: the log carries no image for it)
    assert out == {1: ("a", 1.0), 2: ("B", 2.0), 4: ("d", None)}


def test_cdc_apply_last_writer_wins(spark):
    out = _cdc(
        spark,
        [(1, "a", 1.0), (2, "b", 2.0)],
        [
            (1, 1, "U", "x"), (1, 3, "U", "z"), (1, 2, "U", "y"),
            (2, 1, "U", "x"), (2, 2, "D", None),  # delete is latest
        ],
    )
    assert out == {1: ("z", 1.0)}


def test_cdc_apply_delete_then_reinsert(spark):
    # latest op is the insert: the delete at seq 1 is superseded
    out = _cdc(spark, [(1, "a", 1.0)], [(1, 1, "D", None), (1, 2, "I", "re")])
    assert out == {1: ("re", 1.0)}


def test_cdc_apply_null_seq_sorts_last(spark):
    # NULL sequence = lowest priority: the seq=1 update beats it
    out = _cdc(spark, [(1, "a", 1.0)], [(1, None, "U", "nul"), (1, 1, "U", "one")])
    assert out == {1: ("one", 1.0)}


def test_cdc_apply_custom_delete_ops_and_validation(spark):
    out = _cdc(
        spark,
        [(1, "a", 1.0)],
        [(1, 1, "remove", None)],
        delete_ops=["remove"],
    )
    assert out == {}
    with pytest.raises(OperatorConfigError):
        get_operator("cdc_apply")(key_cols=[])


def test_cdc_apply_missing_value_col_raises(spark):
    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    ch = spark.createDataFrame([(1, 1, "U")], "k long, seq long, op string")
    with pytest.raises(OperatorConfigError, match="value_cols missing"):
        get_operator("cdc_apply")(key_cols=["k"], value_cols=["v"]).apply(
            {"snapshot": snap, "changes": ch}
        )


def test_cdc_apply_wrong_ports_raises(spark):
    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(OperatorConfigError, match="ports"):
        get_operator("cdc_apply")(key_cols=["k"]).apply({"in": snap})


# ----------------------------------------------------------- psi_drift

def test_psi_matches_hand_computation(spark):
    import math

    edges = [10.0, 20.0]
    nb, eps = 3, 1e-4
    lrows = [5.0] * 6 + [15.0] * 3 + [25.0] * 1
    rrows = [5.0] * 2 + [15.0] * 3 + [25.0] * 5
    left = spark.createDataFrame([(v,) for v in lrows], "value double")
    right = spark.createDataFrame([(v,) for v in rrows], "value double")
    r = get_operator("psi_drift")(
        value_col="value", edges=edges,
    ).apply({"left": left, "right": right})["out"].collect()[0]
    ec, ac = [6, 3, 1], [2, 3, 5]
    psi = 0.0
    for i in range(nb):
        e_i = (ec[i] + eps) / (10 + nb * eps)
        a_i = (ac[i] + eps) / (10 + nb * eps)
        psi = psi + (a_i - e_i) * math.log(a_i / e_i)
    assert r["n_left"] == 10 and r["n_right"] == 10
    assert r["psi"] == math.floor(psi * 1e6) / 1e6
    assert r["drift"] == (psi > 0.2)


def test_psi_identical_distributions_score_zero(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in range(100)], "value double"
    )
    r = get_operator("psi_drift")(
        value_col="value", edges=[25.0, 50.0, 75.0],
    ).apply({"left": df, "right": df})["out"].collect()[0]
    assert r["psi"] == 0.0 and r["drift"] is False


def test_psi_one_sided_group_is_loud_not_null(spark):
    left = spark.createDataFrame([("g1", 5.0), ("g2", 5.0)], "g string, value double")
    right = spark.createDataFrame([("g1", 5.0)], "g string, value double")
    rows = {r["g"]: r for r in get_operator("psi_drift")(
        value_col="value", edges=[10.0], group_cols=["g"],
    ).apply({"left": left, "right": right})["out"].collect()}
    assert rows["g2"]["n_right"] == 0
    assert rows["g2"]["psi"] is not None and rows["g2"]["drift"] is True


def test_psi_validation(spark):
    with pytest.raises(OperatorConfigError, match="edges"):
        get_operator("psi_drift")(value_col="v", edges=[])
    from etl_core_spark.operators.compare import psi_drift as psi_fn
    df = None
    with pytest.raises(OperatorConfigError, match="increasing"):
        psi_fn(df, df, "v", [2.0, 1.0])
    with pytest.raises(OperatorConfigError, match="epsilon"):
        psi_fn(df, df, "v", [1.0], epsilon=0.0)


# ---------------------------------------------------------- prop_ztest

def test_prop_ztest_matches_hand_formula(spark):
    import math

    rows = (
        [("A", True)] * 30 + [("A", False)] * 70
        + [("B", True)] * 45 + [("B", False)] * 55
    )
    df = spark.createDataFrame(rows, "variant string, ok boolean")
    r = get_operator("prop_ztest")(
        variant_col="variant", success_col="ok",
        control="A", treatment="B",
    ).apply({"in": df})["out"].collect()[0]
    assert (r["n_c"], r["x_c"], r["n_t"], r["x_t"]) == (100, 30, 100, 45)
    pc, pt, pp = 0.3, 0.45, 0.375
    z = (pt - pc) / math.sqrt(pp * (1.0 - pp) * (1.0 / 100 + 1.0 / 100))
    assert r["z"] == math.floor(z * 1e9) / 1e9
    assert r["significant"] == (abs(z) > 1.959963984540054)
    assert r["significant"] is True


def test_prop_ztest_null_success_counts_as_failure(spark):
    rows = [("A", True), ("A", None), ("B", None), ("B", True)]
    df = spark.createDataFrame(rows, "variant string, ok boolean")
    r = get_operator("prop_ztest")(
        variant_col="variant", success_col="ok",
        control="A", treatment="B",
    ).apply({"in": df})["out"].collect()[0]
    assert (r["x_c"], r["x_t"]) == (1, 1)


def test_prop_ztest_undefined_cases_are_null(spark):
    # no treatment arm; all-success pooled rate
    df1 = spark.createDataFrame([("A", True)], "variant string, ok boolean")
    r1 = get_operator("prop_ztest")(
        variant_col="variant", success_col="ok", control="A", treatment="B",
    ).apply({"in": df1})["out"].collect()[0]
    assert r1["z"] is None and r1["significant"] is None
    df2 = spark.createDataFrame(
        [("A", True), ("B", True)], "variant string, ok boolean"
    )
    r2 = get_operator("prop_ztest")(
        variant_col="variant", success_col="ok", control="A", treatment="B",
    ).apply({"in": df2})["out"].collect()[0]
    assert r2["z"] is None


def test_prop_ztest_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("prop_ztest")(
            variant_col="v", success_col="s", control="A", treatment="A"
        )


# ------------------------------------------------------- mannwhitney_u

def test_mwu_matches_hand_ranks_with_ties(spark):
    left = spark.createDataFrame(
        [(v,) for v in [1.0, 2.0, 2.0, 5.0]], "value double"
    )
    right = spark.createDataFrame(
        [(v,) for v in [2.0, 6.0, 7.0]], "value double"
    )
    r = get_operator("mannwhitney_u")(
        value_col="value",
    ).apply({"left": left, "right": right})["out"].collect()[0]
    # combined sorted: 1(L) 2 2 2(L,L,R) 5(L) 6(R) 7(R)
    # avg rank of the 2-tie block = (2+3+4)/3 = 3
    # R2 = 3 + 6 + 7 = 16; U = 16 - 3*4/2 = 10
    assert (r["n_left"], r["n_right"]) == (4, 3)
    assert r["u"] == 10.0
    import math

    n1, n2, nn = 4.0, 3.0, 7.0
    ties = 3 ** 3 - 3
    sigma = math.sqrt((n1 * n2 / 12.0) * ((nn + 1.0) - ties / (nn * (nn - 1.0))))
    z = (10.0 - n1 * n2 / 2.0) / sigma
    assert r["z"] == math.floor(z * 1e9) / 1e9


def test_mwu_shift_is_significant_and_zero_variance_null(spark):
    left = spark.createDataFrame([(float(v),) for v in range(30)], "value double")
    right = spark.createDataFrame(
        [(float(v + 100),) for v in range(30)], "value double"
    )
    r = get_operator("mannwhitney_u")(
        value_col="value",
    ).apply({"left": left, "right": right})["out"].collect()[0]
    assert r["u"] == 900.0                    # complete separation
    assert r["significant"] is True
    same = spark.createDataFrame([(5.0,)] * 10, "value double")
    r2 = get_operator("mannwhitney_u")(
        value_col="value",
    ).apply({"left": same, "right": same})["out"].collect()[0]
    assert r2["z"] is None and r2["significant"] is None


def test_mwu_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("mannwhitney_u")(value_col="")


# --------------------------------------------------------- welch_ttest

def test_welch_matches_hand_formula_exact_moments(spark):
    import math

    lvals = [10.0, 12.0, 11.5, 9.5, 13.0]
    rvals = [14.0, 15.5, 16.0, 13.5]
    left = spark.createDataFrame([(v,) for v in lvals], "value double")
    right = spark.createDataFrame([(v,) for v in rvals], "value double")
    r = get_operator("welch_ttest")(
        value_col="value",
    ).apply({"left": left, "right": right})["out"].collect()[0]

    def mv(xs):
        ys = [round(v * 100) for v in xs]
        n, s, ss = len(ys), sum(ys), sum(y * y for y in ys)
        return (s / n) / 100.0, ((n * ss - s * s) / (n * (n - 1))) / 1e4, n

    m1, v1, n1 = mv(lvals)
    m2, v2, n2 = mv(rvals)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    dfree = (se2 * se2) / (
        (v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)
    )
    assert r["mean_left"] == math.floor(m1 * 1e9) / 1e9
    assert r["t"] == math.floor(t * 1e9) / 1e9
    assert r["df"] == math.floor(dfree * 1e9) / 1e9
    assert r["significant"] == (abs(t) > 1.959963984540054)


def test_welch_partition_invariance_and_degenerate_null(spark):
    rows = [(float((i * 37) % 101) + 0.13,) for i in range(2000)]
    l1 = spark.createDataFrame(rows, "value double").coalesce(1)
    l32 = spark.createDataFrame(rows, "value double").repartition(32)
    right = spark.createDataFrame(rows[:500], "value double")
    op = get_operator("welch_ttest")(value_col="value")
    a = op.apply({"left": l1, "right": right})["out"].collect()[0]
    b = op.apply({"left": l32, "right": right})["out"].collect()[0]
    assert (a["t"], a["df"]) == (b["t"], b["df"])
    # constant samples: zero variance -> NULL t, not inf
    const = spark.createDataFrame([(5.0,)] * 10, "value double")
    r = op.apply({"left": const, "right": const})["out"].collect()[0]
    assert r["t"] is None and r["significant"] is None


# -------------------------------------------------- chi2_independence

def test_chi2_matches_hand_contingency(spark):
    import math

    rows = (
        [("x", "p")] * 20 + [("x", "q")] * 10
        + [("y", "p")] * 5 + [("y", "q")] * 25
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = get_operator("chi2_independence")(
        col_a="a", col_b="b", categories_a=["x", "y"],
        categories_b=["p", "q"],
    ).apply({"in": df})["out"].collect()[0]
    cells = {("x", "p"): 20, ("x", "q"): 10, ("y", "p"): 5, ("y", "q"): 25}
    n = 60
    chi2 = 0.0
    for (i, j), c in cells.items():
        ri = sum(v for (a, _), v in cells.items() if a == i)
        kj = sum(v for (_, b), v in cells.items() if b == j)
        e = ri * kj / n
        chi2 = chi2 + (c - e) * (c - e) / e
    assert r["n"] == 60 and r["dof"] == 1
    assert r["chi2"] == math.floor(chi2 * 1e9) / 1e9
    v = math.sqrt(chi2 / (n * 1))
    assert r["cramers_v"] == math.floor(v * 1e9) / 1e9


def test_chi2_out_of_list_excluded_and_degenerate_null(spark):
    rows = [("x", "p"), ("x", "q"), ("UNLISTED", "p"), ("x", "ALSO_NOT")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = get_operator("chi2_independence")(
        col_a="a", col_b="b", categories_a=["x", "y"],
        categories_b=["p", "q"],
    ).apply({"in": df})["out"].collect()[0]
    assert r["n"] == 2                       # only the listed pairs
    assert r["chi2"] is None                 # y-row marginal is zero


def test_chi2_validation(spark):
    with pytest.raises(OperatorConfigError, match="categories"):
        get_operator("chi2_independence")(
            col_a="a", col_b="b", categories_a=[], categories_b=["p"],
        )
    with pytest.raises(OperatorConfigError, match="unique"):
        from etl_core_spark.operators.compare import chi2_independence
        chi2_independence(None, "a", "b", ["x", "x"], ["p", "q"])
    # single-element category lists would make dof = 0 and Cramér's V
    # divide by zero — rejected at config time
    with pytest.raises(OperatorConfigError, match=">= 2"):
        get_operator("chi2_independence")(
            col_a="a", col_b="b", categories_a=["x"],
            categories_b=["p", "q"],
        )
    with pytest.raises(OperatorConfigError, match=">= 2"):
        from etl_core_spark.operators.compare import chi2_independence
        chi2_independence(None, "a", "b", ["x", "y"], ["p"])
