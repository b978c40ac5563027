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
