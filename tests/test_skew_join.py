"""salted_join (operators/skew.py): exact equivalence with the plain
equi-join under a skewed probe side, determinism under repartition,
and config validation."""

import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows) + a long tail — the shape salting exists for
    left = spark.createDataFrame(
        [(1, i) for i in range(180)] + [(k, 1000 + k) for k in range(2, 22)],
        "k long, payload long",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 25)], "k long, name string"
    )
    return left, right


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_equals_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, on="k", how="inner")
    salted = salted_join(left, right, ["k"], "inner", salt_factor=4)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_left_join_keeps_unmatched_probe_rows(spark, skewed):
    left, right = skewed
    lonely = spark.createDataFrame([(99, 9)], "k long, payload long")
    left2 = left.union(lonely)
    plain = left2.join(right, on="k", how="left")
    salted = salted_join(left2, right, ["k"], "left", salt_factor=4)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)
    assert salted.where(F.col("k") == 99).count() == 1


def test_salted_join_deterministic_under_repartition(spark, skewed):
    left, right = skewed
    a = salted_join(left, right, ["k"], salt_factor=4)
    b = salted_join(left.repartition(7), right.coalesce(1), ["k"], salt_factor=4)
    assert _rows(a) == _rows(b)


def test_salted_join_spreads_the_hot_key(spark, skewed):
    """The probe-side salt must actually scatter the hot key: with
    180 rows of k=1 and salt_factor=4, more than one salt value has
    to appear (xxhash64 over the full row varies by payload)."""
    left, right = skewed
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(4))
    n_salts = (
        left.where(F.col("k") == 1)
        .select(salt.alias("s")).distinct().count()
    )
    assert n_salts == 4


def test_salted_join_validation(spark, skewed):
    left, right = skewed
    with pytest.raises(OperatorConfigError, match="salt_factor"):
        salted_join(left, right, ["k"], salt_factor=0)
    with pytest.raises(OperatorConfigError, match="inner/left"):
        salted_join(left, right, ["k"], how="outer")
    with pytest.raises(OperatorConfigError, match="missing"):
        salted_join(left, right, ["nope"])
    with pytest.raises(OperatorConfigError, match="'on'"):
        get_operator("salted_join")()


def test_salted_join_collapse_duplicates_exact_bag_semantics(spark):
    """Identical probe tuples (the case the row-hash salt cannot
    scatter): collapse_duplicates pre-aggregates them map-side,
    joins the distinct rows salted, and re-expands — the multiset
    result must equal the plain join exactly, for inner AND left."""
    left = spark.createDataFrame(
        [(1,)] * 500 + [(2,)] * 3 + [(99,)] * 2, "k long"
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "cold")], "k long, name string"
    )
    for how in ("inner", "left"):
        plain = sorted(
            tuple(r) for r in left.join(right, on="k", how=how).collect()
        )
        got = sorted(
            tuple(r)
            for r in salted_join(
                left, right, ["k"], how, 4, collapse_duplicates=True
            ).select("k", "name").collect()
        )
        assert got == plain
