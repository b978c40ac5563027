"""record_linkage (operators/linkage.py): Fellegi-Sunter scoring,
blocking semantics, oversize-block policies."""

import math

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.linkage import _weights, record_linkage


def _people(spark):
    rows = [
        (1, "blk", "alice johnson", 100.0),
        (2, "blk", "alice jonson", 105.0),    # near-dup of 1
        (3, "blk", "robert smith", 900.0),
        (4, "blk", "bob smith", 901.0),
        (5, "other", "alice johnson", 100.0),  # right name, wrong block
    ]
    return spark.createDataFrame(rows, "id long, b string, name string, bal double")


COMPS = [
    {"col": "name", "kind": "levenshtein", "threshold": 2, "m": 0.9, "u": 0.05},
    {"col": "bal", "kind": "abs_diff", "threshold": 10.0, "m": 0.8, "u": 0.1},
]


def test_self_linkage_scores_match_hand_weights(spark):
    out = record_linkage(
        _people(spark), "id", ["b"], COMPS, lower=-100.0, upper=3.0,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r for r in out}
    # block 'blk' has C(4,2)=6 pairs; id 5 never pairs across blocks
    assert len(got) == 6
    assert all(a < b for a, b in got)
    assert not any(5 in k for k in got)
    ws = _weights(COMPS)
    exp = ws[0][0] + ws[1][0]            # both agree
    pair = got[(1, 2)]
    assert pair["agree_name"] and pair["agree_bal"]
    assert pair["score"] == math.floor(exp * 1e6) / 1e6
    assert pair["match_class"] == "match"
    both_disagree = got[(1, 3)]
    exp_d = ws[0][1] + ws[1][1]
    assert both_disagree["score"] == math.floor(exp_d * 1e6) / 1e6
    assert both_disagree["match_class"] == "possible"


def test_lower_threshold_drops_nonmatches(spark):
    out = record_linkage(
        _people(spark), "id", ["b"], COMPS, lower=0.0, upper=3.0,
    ).collect()
    # only the two agreeing pairs survive: (1,2) and (3,4)-bal-agree?
    keys = sorted((r["id_a"], r["id_b"]) for r in out)
    assert (1, 2) in keys
    assert all(r["score"] >= 0.0 for r in out)


def test_two_dataset_mode_and_null_semantics(spark):
    a = spark.createDataFrame(
        [(1, "x", "ann", None), (2, None, "bob", 5.0)],
        "id long, b string, name string, bal double",
    )
    b = spark.createDataFrame(
        [(10, "x", "ann", None), (11, "x", "ann", 7.0)],
        "id long, b string, name string, bal double",
    )
    out = record_linkage(
        a, "id", ["b"], COMPS, lower=-100.0, upper=1.0, df_b=b,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r for r in out}
    # id 2 has a NULL block key -> excluded entirely
    assert set(got) == {(1, 10), (1, 11)}
    # NULL bal vs NULL bal: abs_diff comparison DISAGREES (unknown)
    assert not got[(1, 10)]["agree_bal"]
    assert got[(1, 10)]["agree_name"]


def test_equal_kind_is_null_safe(spark):
    a = spark.createDataFrame(
        [(1, "x", None), (2, "x", None), (3, "x", "v")],
        "id long, b string, tag string",
    )
    comps = [{"col": "tag", "kind": "equal", "m": 0.7, "u": 0.2}]
    out = record_linkage(a, "id", ["b"], comps, lower=-100.0, upper=100.0)
    got = {(r["id_a"], r["id_b"]): r["agree_tag"] for r in out.collect()}
    assert got[(1, 2)] is True             # NULL == NULL agrees
    assert got[(1, 3)] is False


def test_oversize_block_error_and_skip(spark):
    rows = [(i, "hot", f"n{i}", 1.0) for i in range(50)] + [
        (100, "cold", "a", 1.0), (101, "cold", "a", 1.0),
    ]
    df = spark.createDataFrame(rows, "id long, b string, name string, bal double")
    with pytest.raises(OperatorConfigError, match="max_block_size"):
        record_linkage(
            df, "id", ["b"], COMPS, lower=-100.0, upper=3.0,
            max_block_size=10,
        )
    out = record_linkage(
        df, "id", ["b"], COMPS, lower=-100.0, upper=3.0,
        max_block_size=10, oversize_policy="skip",
    ).collect()
    # the hot block is dropped; only the cold pair survives
    assert [(r["id_a"], r["id_b"]) for r in out] == [(100, 101)]


def test_linkage_validation(spark):
    with pytest.raises(OperatorConfigError, match="block_cols"):
        get_operator("record_linkage")(
            id_col="id", block_cols=[], comparisons=COMPS,
            lower=0.0, upper=1.0,
        )
    with pytest.raises(OperatorConfigError, match="0 < u < m < 1"):
        get_operator("record_linkage")(
            id_col="id", block_cols=["b"],
            comparisons=[{"col": "x", "kind": "equal", "m": 0.2, "u": 0.9}],
            lower=0.0, upper=1.0,
        )
    with pytest.raises(OperatorConfigError, match="oversize_policy"):
        get_operator("record_linkage")(
            id_col="id", block_cols=["b"], comparisons=COMPS,
            lower=0.0, upper=1.0, oversize_policy="quietly",
        )
    with pytest.raises(OperatorConfigError, match="kind"):
        record_linkage(
            _people(spark), "id", ["b"],
            [{"col": "name", "kind": "soundex", "m": 0.9, "u": 0.1}],
            lower=0.0, upper=1.0,
        ).collect()
    # levenshtein / abs_diff comparisons require a numeric threshold at
    # config time (not a raw TypeError at apply time)
    for kind in ("levenshtein", "abs_diff"):
        with pytest.raises(OperatorConfigError, match="threshold"):
            get_operator("record_linkage")(
                id_col="id", block_cols=["b"],
                comparisons=[
                    {"col": "name", "kind": kind, "m": 0.9, "u": 0.1}
                ],
                lower=0.0, upper=1.0,
            )
    with pytest.raises(OperatorConfigError, match="threshold"):
        get_operator("record_linkage")(
            id_col="id", block_cols=["b"],
            comparisons=[{"col": "name", "kind": "levenshtein",
                          "threshold": "two", "m": 0.9, "u": 0.1}],
            lower=0.0, upper=1.0,
        )


def test_linkage_port_validation(spark):
    op = get_operator("record_linkage")(
        id_col="id", block_cols=["b"], comparisons=COMPS,
        lower=0.0, upper=1.0,
    )
    df = _people(spark)
    with pytest.raises(OperatorConfigError, match="port"):
        op.apply({"in_b": df})
    with pytest.raises(OperatorConfigError, match="port"):
        op.apply({"input": df})


def test_linkage_plan_is_hash_join_not_cartesian(spark):
    out = record_linkage(
        _people(spark), "id", ["b"], COMPS, lower=-100.0, upper=3.0,
        max_block_size=None,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "Join" in plan


# --------------------------------------------- sorted-neighborhood

def test_snm_pairs_are_rank_adjacent(spark):
    # sort key: v; ranks are 10,20,...,100 -> window 3 pairs ranks
    # within distance 1..2
    rows = [(i, float(i * 10)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "id long, v double")
    comps = [{"col": "v", "kind": "abs_diff", "threshold": 15.0,
              "m": 0.8, "u": 0.1}]
    out = record_linkage(
        df, "id", None, comps, lower=-100.0, upper=100.0,
        method="sorted", sort_cols=["v"], window=3,
    ).collect()
    got = sorted((r["id_a"], r["id_b"]) for r in out)
    exp = sorted(
        (i, j) for i in range(1, 11) for j in range(1, 11)
        if 1 <= j - i <= 2
    )
    assert got == exp                    # 9 + 8 = 17 pairs, each once
    # distance-1 neighbors agree on abs_diff<=15, distance-2 don't
    agree = {(r["id_a"], r["id_b"]): r["agree_v"] for r in out}
    assert agree[(1, 2)] is True and agree[(1, 3)] is False


def test_snm_id_a_is_lower_rank_not_lower_id(spark):
    # descending values: id 1 has the HIGHEST v, so it ranks last
    rows = [(1, 30.0), (2, 20.0), (3, 10.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    comps = [{"col": "v", "kind": "equal", "m": 0.8, "u": 0.1}]
    out = record_linkage(
        df, "id", None, comps, lower=-100.0, upper=100.0,
        method="sorted", sort_cols=["v"], window=2,
    ).collect()
    got = sorted((r["id_a"], r["id_b"]) for r in out)
    assert got == [(2, 1), (3, 2)]       # rank order, not id order


def test_snm_rank_survives_many_partitions(spark):
    # enough rows that repartitionByRange actually spreads them; the
    # distributed rank must still produce exactly n-1 adjacent pairs
    n = 5000
    df = spark.range(n).selectExpr("id", "cast(id * 7 % 4999 as double) as v")
    comps = [{"col": "v", "kind": "abs_diff", "threshold": 1e9,
              "m": 0.8, "u": 0.1}]
    out = record_linkage(
        df, "id", None, comps, lower=-100.0, upper=100.0,
        method="sorted", sort_cols=["v"], window=2,
    )
    assert out.count() == n - 1


def test_snm_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    comps = [{"col": "v", "kind": "equal", "m": 0.8, "u": 0.1}]
    with pytest.raises(OperatorConfigError, match="sort_cols"):
        record_linkage(df, "id", None, comps, 0.0, 1.0, method="sorted")
    with pytest.raises(OperatorConfigError, match="window"):
        record_linkage(df, "id", None, comps, 0.0, 1.0,
                       method="sorted", sort_cols=["v"], window=1)
    with pytest.raises(OperatorConfigError, match="self-linkage"):
        record_linkage(df, "id", None, comps, 0.0, 1.0, df_b=df,
                       method="sorted", sort_cols=["v"], window=2)
    with pytest.raises(OperatorConfigError, match="method"):
        get_operator("record_linkage")(
            id_col="id", comparisons=comps, lower=0.0, upper=1.0,
            method="shuffled",
        )
