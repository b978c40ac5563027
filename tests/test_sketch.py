"""Sketch-aggregate certification: HLL error bound + merge algebra +
partition invariance, GK quantile rank-error bound. These replace the
DuckDB hash oracle (DuckDB's approximate aggregates are different
implementations; estimates legitimately differ engine-to-engine)."""

import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.sketch import (
    approx_quantiles,
    hll_build,
    hll_distinct,
    hll_merge,
)


@pytest.fixture(scope="module")
def facts(spark):
    # 3 sources x 4 days, user ids overlapping across both dimensions
    rows = [
        (f"s{u % 3}", f"d{(u // 3) % 4}", u % 5000, float(u % 997))
        for u in range(30000)
    ]
    return spark.createDataFrame(rows, "source string, day string, user long, v double")


def test_hll_estimate_within_error_bound(spark, facts):
    est = hll_distinct(facts, [], "user").collect()[0]["est_ndv"]
    exact = facts.select("user").distinct().count()
    assert exact == 5000
    # DataSketches HLL rse at lg_k=12 is ~1.6%; allow 3 sigma
    assert abs(est - exact) / exact < 0.05


def test_hll_merge_stays_within_error_bound(spark, facts):
    """The rollup algebra: union of fine-grained sketches answers any
    coarser grouping within the SAME error bound as a direct scan.
    (Not bit-equality: a union discards the order-dependent HIP
    estimator and falls back to the composite estimate — both are
    within rse, see module docstring.)"""
    fine = hll_build(facts, ["source", "day"], "user")
    assert fine.count() == 12
    for to in (["source"], ["day"], []):
        merged = hll_merge(fine, to)
        exact = {
            tuple(r[c] for c in to): r["nd"]
            for r in facts.groupBy(*to).agg(
                F.countDistinct("user").alias("nd")
            ).collect()
        } if to else {(): facts.select("user").distinct().count()}
        for r in merged.collect():
            key = tuple(r[c] for c in to) if to else ()
            assert abs(r["est_ndv"] - exact[key]) / exact[key] < 0.05, (
                f"rollup to {to}, group {key}"
            )


def test_hll_deterministic_for_fixed_layout(spark, facts):
    """Same data, same layout → identical estimates (the sketch is a
    deterministic function; no RNG in the pipeline)."""
    a = hll_distinct(facts, ["source"], "user")
    b = hll_distinct(facts, ["source"], "user")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_hll_aggregate_is_partial(spark, facts):
    """Map-side combine must survive: the plan carries a partial and a
    final HashAggregate, not a single-stage sort-based fallback."""
    plan = hll_distinct(facts, ["source"], "user")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("ObjectHashAggregate") + plan.count("HashAggregate") >= 2


def test_approx_quantiles_rank_error(spark, facts):
    out = approx_quantiles(facts, ["source"], "v", [0.5, 0.99], accuracy=10000)
    exact = facts.groupBy("source").agg(
        F.expr("percentile(v, 0.5)").alias("e50"),
        F.expr("percentile(v, 0.99)").alias("e99"),
    )
    j = {r["source"]: r for r in out.join(exact, "source").collect()}
    for r in j.values():
        # values 0..996 per source; rank error 1/accuracy → a few units
        assert abs(r["q_50"] - r["e50"]) <= 5
        assert abs(r["q_99"] - r["e99"]) <= 5


def test_sketch_operator_registration_and_validation(spark, facts):
    out = get_operator("hll_distinct")(
        group_cols=["source"], value_col="user", lg_k=13
    ).apply({"in": facts})["out"]
    assert out.count() == 3
    q = get_operator("approx_quantiles")(
        group_cols=[], value_col="v", probabilities=[0.25, 0.75]
    ).apply({"in": facts})["out"]
    assert set(q.columns) == {"q_25", "q_75"}
    with pytest.raises(OperatorConfigError, match="value_col"):
        get_operator("hll_distinct")()
    with pytest.raises(OperatorConfigError, match="lg_k"):
        hll_distinct(facts, [], "user", lg_k=30)
    with pytest.raises(OperatorConfigError, match="probabilities"):
        approx_quantiles(facts, [], "v", [1.5])
