import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.asof import as_of_join, range_join
from etl_core_spark.operators.base import get_operator


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 101.0), (2, 15, 50.0), (3, 5, 7.0)],
        "sym long, ts long, trade_px double",
    )
    quotes = spark.createDataFrame(
        [(1, 5, 99.0), (1, 15, 100.5), (1, 20, 101.5), (2, 30, 49.0)],
        "sym long, ts long, quote_px double",
    )
    return trades, quotes


def test_asof_basic(trades_quotes):
    trades, quotes = trades_quotes
    out = as_of_join(trades, quotes, "sym", "ts", "ts", ["quote_px"])
    got = {(r["sym"], r["ts"]): r["quote_px"] for r in out.collect()}
    assert got == {
        (1, 10): 99.0,     # latest quote at ts<=10 is ts=5
        (1, 20): 101.5,    # equal timestamp matches (non-strict)
        (2, 15): None,     # first quote for sym 2 is later
        (3, 5): None,      # no quotes at all for sym 3
    }
    # all original left columns survive
    assert set(out.columns) == {"sym", "ts", "trade_px", "quote_px"}


def test_asof_strict(trades_quotes):
    trades, quotes = trades_quotes
    out = as_of_join(trades, quotes, "sym", "ts", "ts", ["quote_px"], strict=True)
    got = {(r["sym"], r["ts"]): r["quote_px"] for r in out.collect()}
    # strict: the ts=20 quote no longer serves the ts=20 trade
    assert got[(1, 20)] == 100.5


def test_asof_operator_registered(trades_quotes):
    trades, quotes = trades_quotes
    out = get_operator("as_of_join")(
        on="sym", left_ts="ts", right_ts="ts", value_cols=["quote_px"]
    ).apply({"left": trades, "right": quotes})["out"]
    assert out.count() == trades.count()


def test_asof_preserves_left_cardinality(spark, tables):
    ev = tables["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    out = as_of_join(clicks, purchases, "user_id", "ts", "ts", ["pv"])
    assert out.count() == clicks.count()


def test_range_join_inner_and_left(spark):
    points = spark.createDataFrame(
        [(1, 10.0), (2, 250.0), (3, 699.9), (4, 5000.0)], "id long, x double"
    )
    bands = spark.createDataFrame(
        [("low", 0.0, 250.0), ("high", 250.0, 700.0)], "band string, lo double, hi double"
    )
    inner = range_join(points, bands, "x", "lo", "hi", bucket_width=250.0)
    got = {(r["id"], r["band"]) for r in inner.collect()}
    # boundary 250.0 belongs to 'high' ([lo, hi) semantics)
    assert got == {(1, "low"), (2, "high"), (3, "high")}

    left = range_join(points, bands, "x", "lo", "hi", bucket_width=250.0, how="left")
    assert left.count() == 4
    assert left.filter(F.col("band").isNull()).collect()[0]["id"] == 4


def test_range_join_matches_inequality_join(spark, tables):
    part = tables["part"].select("p_partkey", "p_retailprice")
    bands = spark.createDataFrame(
        [("a", 0.0, 333.0), ("b", 333.0, 1000.0), ("c", 1000.0, 3000.0)],
        "band string, lo double, hi double",
    )
    fast = range_join(part, bands, "p_retailprice", "lo", "hi", bucket_width=300.0)
    slow = part.crossJoin(bands).filter(
        (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi"))
    )
    assert sorted((r["p_partkey"], r["band"]) for r in fast.collect()) == sorted(
        (r["p_partkey"], r["band"]) for r in slow.collect()
    )


# ----------------------------------------------------------------------
# interval_join (interval-overlap, bucketized both sides)
# ----------------------------------------------------------------------

def _naive_overlap_pairs(spark, a, b):
    """Oracle: inequality cross join (fine at test scale only)."""
    return (
        a.crossJoin(b.select(F.col("b_id"), F.col("lo").alias("lo_r"),
                             F.col("hi").alias("hi_r")))
        .where((F.col("lo") < F.col("hi_r")) & (F.col("lo_r") < F.col("hi")))
        .select("a_id", "b_id")
    )


@pytest.fixture(scope="module")
def interval_sets(spark):
    a = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 6.0), (3, 20.0, 30.0), (4, 42.0, 43.0)],
        "a_id long, lo double, hi double",
    )
    b = spark.createDataFrame(
        [(1, 9.0, 21.0), (2, 5.5, 5.7), (3, 30.0, 40.0), (4, 41.0, 42.0)],
        "b_id long, lo double, hi double",
    )
    return a, b


def test_interval_join_matches_naive(spark, interval_sets):
    from etl_core_spark.operators.asof import interval_join

    a, b = interval_sets
    br = b.select("b_id", F.col("lo").alias("lo_r"), F.col("hi").alias("hi_r"))
    for bw in (1.0, 3.0, 100.0):  # narrower and wider than every interval
        got = {
            (r["a_id"], r["b_id"])
            for r in interval_join(a, br, "lo", "hi", "lo_r", "hi_r", bw).collect()
        }
        want = {(r["a_id"], r["b_id"])
                for r in _naive_overlap_pairs(spark, a, b).collect()}
        assert got == want, f"bucket_width={bw}"
    # half-open semantics: [20,30) does not overlap [30,40), and
    # [42,43) does not overlap [41,42)
    assert (3, 3) not in want and (4, 4) not in want
    # sanity on the expected pairs
    assert want == {(1, 1), (1, 2), (2, 2), (3, 1)}


def test_interval_join_drops_degenerate_intervals(spark):
    """Empty [x,x) and inverted [hi,lo) intervals overlap nothing:
    they are filtered before exploding (an inverted pair would make
    sequence() count DOWN — Spark's default step is -1 when
    start > stop — emitting spurious bucket rows), and an empty
    interval must not match an interval strictly containing its
    point (half-open semantics)."""
    from etl_core_spark.operators.asof import interval_join

    a = spark.createDataFrame(
        [(1, 5.0, 5.0),     # empty: inside b1's [0,10) but overlaps nothing
         (2, 9.0, 2.0),     # inverted: would explode buckets 0..4 descending
         (3, 4.0, 6.0)],    # real: overlaps b1 only
        "a_id long, lo double, hi double",
    )
    b = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 5.0), (3, 8.0, 3.0)],
        "b_id long, lo_r double, hi_r double",
    )
    out = interval_join(a, b, "lo", "hi", "lo_r", "hi_r", 2.0)
    assert {(r["a_id"], r["b_id"]) for r in out.collect()} == {(3, 1)}


def test_interval_join_emits_each_pair_exactly_once(spark, interval_sets):
    """The overlap-start-bucket trick replaces distinct: a pair whose
    intersection spans many buckets must still appear once."""
    from etl_core_spark.operators.asof import interval_join

    a = spark.createDataFrame([(1, 0.0, 100.0)], "a_id long, lo double, hi double")
    b = spark.createDataFrame([(9, 10.0, 90.0)], "b_id long, lo_r double, hi_r double")
    out = interval_join(a, b, "lo", "hi", "lo_r", "hi_r", 1.0)  # 80 shared buckets
    assert out.count() == 1


def test_interval_join_no_cartesian_plan(spark, interval_sets):
    from etl_core_spark.operators.asof import interval_join

    a, b = interval_sets
    br = b.select("b_id", F.col("lo").alias("lo_r"), F.col("hi").alias("hi_r"))
    plan = interval_join(a, br, "lo", "hi", "lo_r", "hi_r", 2.0)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_suffixes_colliding_columns(spark, interval_sets):
    from etl_core_spark.operators.asof import interval_join

    a, b = interval_sets  # both sides have lo/hi
    out = interval_join(a, b, "lo", "hi", "lo", "hi", 2.0)
    assert {"lo_r", "hi_r"} <= set(out.columns)


def test_interval_join_operator_registered(spark, interval_sets):
    from etl_core_spark.operators.base import get_operator

    a, b = interval_sets
    br = b.select("b_id", F.col("lo").alias("lo_r"), F.col("hi").alias("hi_r"))
    out = get_operator("interval_join")(
        left_lo="lo", left_hi="hi", right_lo="lo_r", right_hi="hi_r",
        bucket_width=2.0,
    ).apply({"left": a, "right": br})["out"]
    assert out.count() == 4


def test_interval_join_null_bounds_never_match(spark):
    """NULL lo/hi intervals and NULL-bounded pairs drop out exactly as
    SQL's three-valued overlap predicate would drop them — not a crash,
    not a spurious match (sequence(NULL) explodes to zero buckets)."""
    from etl_core_spark.operators.asof import interval_join

    a = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, None, 10.0), (3, 5.0, None)],
        "a_id long, lo double, hi double",
    )
    b = spark.createDataFrame(
        [(1, 5.0, 6.0), (2, None, None)], "b_id long, lo_r double, hi_r double"
    )
    out = interval_join(a, b, "lo", "hi", "lo_r", "hi_r", 4.0)
    assert {(r["a_id"], r["b_id"]) for r in out.collect()} == {(1, 1)}


def test_asof_null_value_in_latest_right_row_not_mixed(spark):
    """value_cols travel as one struct: when the LATEST right row has
    v1=NULL, the output must be (NULL, 30) from that row — not v1
    resurrected from an older row (a row that never existed)."""
    from etl_core_spark.operators.asof import as_of_join

    right = spark.createDataFrame(
        [(1, 1.0, 10.0, 20.0), (1, 2.0, None, 30.0)],
        "k long, ts double, v1 double, v2 double",
    )
    left = spark.createDataFrame([(1, 3.0)], "k long, ts double")
    row = as_of_join(left, right, "k", "ts", "ts", ["v1", "v2"]).collect()[0]
    assert row["v1"] is None and row["v2"] == 30.0


def test_range_join_suffixes_colliding_columns(spark):
    """Points and intervals sharing a column name ('id' is the natural
    case) must not produce ambiguous references — interval columns get
    the _r suffix, and the left branch works."""
    points = spark.createDataFrame([(1, 10.0), (2, 999.0)], "id long, x double")
    bands = spark.createDataFrame(
        [(7, 0.0, 100.0)], "id long, lo double, hi double"
    )
    inner = range_join(points, bands, "x", "lo", "hi", bucket_width=50.0)
    assert set(inner.columns) == {"id", "x", "id_r", "lo", "hi"}
    assert [(r["id"], r["id_r"]) for r in inner.collect()] == [(1, 7)]
    left = range_join(points, bands, "x", "lo", "hi", bucket_width=50.0, how="left")
    assert left.count() == 2


def test_temporal_join_point_in_time_semantics(spark):
    """Each fact matches the version valid AT its time: half-open
    [from, to) intervals, NULL valid_to = open version, coverage
    gaps NULL-pad under left, at most one match per fact on
    well-formed history."""
    from etl_core_spark.operators.base import get_operator

    dim = spark.createDataFrame(
        [
            (1, 10, "v1", 20),
            (1, 20, "v2", 40),
            (1, 50, "v3", None),   # open version after a [40,50) gap
            (2, 0, "w1", None),
        ],
        "k long, valid_from long, attr string, valid_to long",
    )
    facts = spark.createDataFrame(
        [(100, 1, 10), (101, 1, 19), (102, 1, 20), (103, 1, 45),
         (104, 1, 99), (105, 2, 5), (106, 3, 7), (107, 1, 5)],
        "fid long, k long, ts long",
    )
    out = get_operator("temporal_join")(
        on=["k"], ts_col="ts", how="left"
    ).apply({"facts": facts, "dim": dim})["out"]
    got = {r["fid"]: r["attr"] for r in out.collect()}
    assert got == {
        100: "v1",   # inclusive lower bound
        101: "v1",
        102: "v2",   # exclusive upper bound
        103: None,   # coverage gap
        104: "v3",   # open version
        105: "w1",
        106: None,   # unknown key
        107: None,   # before first version
    }
    assert out.count() == 8  # at most one version per fact
    # inner drops the unmatched facts
    inner = get_operator("temporal_join")(
        on=["k"], ts_col="ts"
    ).apply({"facts": facts, "dim": dim})["out"]
    assert {r["fid"] for r in inner.collect()} == {100, 101, 102, 104, 105}


def test_temporal_join_collision_suffix_and_validation(spark):
    import pytest as _pytest

    from etl_core_spark.operators.base import (
        OperatorConfigError,
        get_operator,
    )

    dim = spark.createDataFrame(
        [(1, 0, None, "x")],
        "k long, valid_from long, valid_to long, ts string",
    )
    facts = spark.createDataFrame([(1, 1, 5)], "fid long, k long, ts long")
    out = get_operator("temporal_join")(on=["k"], ts_col="ts").apply(
        {"facts": facts, "dim": dim}
    )["out"]
    # the dim's clashing non-key column gets the _dim suffix
    assert "ts_dim" in out.columns and out.count() == 1
    with _pytest.raises(OperatorConfigError):
        get_operator("temporal_join")(on=["k"], ts_col="ts", how="full")
    with _pytest.raises(OperatorConfigError):
        get_operator("temporal_join")(ts_col="ts")


def test_temporal_join_dim_suffix_collision_raises(spark):
    """ADVICE r9: if the computed ``_dim`` suffix name already exists
    on either side, raise instead of emitting two ambiguous columns."""
    import pytest as _pytest

    from etl_core_spark.operators.base import OperatorConfigError
    from etl_core_spark.operators.asof import temporal_join

    facts = spark.createDataFrame(
        [(1, 1, 5)], "fid long, k long, ts long"
    )
    # dim has BOTH 'ts' (clashes with facts) and a pre-existing
    # 'ts_dim' — the rename target is taken
    dim = spark.createDataFrame(
        [(1, 0, None, "x", "y")],
        "k long, valid_from long, valid_to long, ts string, ts_dim string",
    )
    with _pytest.raises(OperatorConfigError, match="ts_dim"):
        temporal_join(facts, dim, on=["k"], ts_col="ts")
    # fact side already holding the suffixed name is equally ambiguous
    facts2 = spark.createDataFrame(
        [(1, 1, 5, "z")], "fid long, k long, ts long, ts_dim string"
    )
    dim2 = spark.createDataFrame(
        [(1, 0, None, "x")],
        "k long, valid_from long, valid_to long, ts string",
    )
    with _pytest.raises(OperatorConfigError, match="ts_dim"):
        temporal_join(facts2, dim2, on=["k"], ts_col="ts")
