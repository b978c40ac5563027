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


# ----------------------------------------------------------------------
# Count-Min frequency sketch
# ----------------------------------------------------------------------

def test_cms_point_query_bounds(spark):
    from etl_core_spark.operators.sketch import cms_build, cms_estimate

    n = 20000
    df = spark.createDataFrame([(i % 100,) for i in range(n)], "x long")
    sk = cms_build(df, [], "x", eps=0.001).collect()[0]["__cms"]
    est = cms_estimate(spark, sk, list(range(100)) + [999])
    for item in range(100):
        true = n // 100
        # CMS never underestimates; overestimate bounded by eps * N
        assert true <= est[item] <= true + 0.001 * n + 1
    assert est[999] <= 0.001 * n  # absent item only collides


def test_cms_per_group_and_validation(spark):
    from etl_core_spark.operators.base import OperatorConfigError
    from etl_core_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame(
        [("a", i % 3) for i in range(300)] + [("b", 7)] * 10,
        "g string, x long",
    )
    rows = {r["g"]: r["__cms"] for r in cms_build(df, ["g"], "x").collect()}
    assert cms_estimate(spark, rows["a"], [0])[0] >= 100
    assert cms_estimate(spark, rows["b"], [7])[7] >= 10
    with pytest.raises(OperatorConfigError, match="eps"):
        cms_build(df, [], "x", eps=2.0)


# ----------------------------------------------------------------------
# sketches compose with Structured Streaming
# ----------------------------------------------------------------------

def test_hll_streaming_windowed_distinct(spark, tmp_path):
    """hll_sketch_agg is an ordinary aggregate: it runs inside a
    watermarked streaming window unchanged — approximate distinct
    users per window over an unbounded feed with bounded state."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(minutes=m, seconds=s), u)
        for m in range(0, 120, 60)      # two 1-hour windows
        for s in (0, 30)
        for u in range(50)              # 50 distinct users each window
    ]
    # sentinel far past both windows: once processed, the watermark
    # (3:00 - 10min) passes both window ends and append mode emits them
    rows.append((base + datetime.timedelta(hours=3), 0))
    df = spark.createDataFrame(rows, "ts timestamp, user long")
    src = tmp_path / "src"
    # two files -> separate micro-batches: the watermark advances
    # BETWEEN batches (a single batch would leave every window open)
    df.where(F.hour("ts") == 0).coalesce(1).write.mode("append").parquet(str(src))
    df.where(F.hour("ts") >= 1).coalesce(1).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user")).alias("est"))
        .select(F.col("w.start").alias("start"), "est")
    )
    out = tmp_path / "out"
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {r["start"].hour: r["est"] for r in spark.read.parquet(str(out)).collect()}
    # append mode emits only watermark-closed windows: hour 0 closed
    # by hour 1's events; 50 distinct is far under sketch capacity →
    # exact-mode estimate
    assert got[0] == 50


# ---------------------------------------------------------------- bloom

def _bloom(spark, big_keys, member_keys, **cfg):
    big = spark.createDataFrame([(x,) for x in big_keys], "k string")
    keys = spark.createDataFrame([(x,) for x in member_keys], "k string")
    return get_operator("bloom_membership")(key_col="k", **cfg).apply(
        {"in": big, "keys": keys}
    )["out"]


def test_bloom_no_false_negatives_and_flag(spark):
    members = [f"m{i}" for i in range(50)]
    out = {
        r["k"]: r["bloom_hit"]
        for r in _bloom(
            spark, members + ["absent1", "absent2"], members, m_bits=1 << 16
        ).collect()
    }
    # every true member hits — the Bloom no-false-negative guarantee
    assert all(out[m] for m in members)
    # at m=65536, k=4, n=50 the FP odds are ~1e-12: absents miss
    assert not out["absent1"] and not out["absent2"]


def test_bloom_drop_and_keep_partition_the_flag(spark):
    members = [f"m{i}" for i in range(20)]
    probe = members[:5] + [f"x{i}" for i in range(10)]
    kept = {
        r["k"] for r in _bloom(spark, probe, members, mode="keep",
                               m_bits=1 << 16).collect()
    }
    dropped = {
        r["k"] for r in _bloom(spark, probe, members, mode="drop",
                               m_bits=1 << 16).collect()
    }
    assert kept | dropped == set(probe) and not (kept & dropped)
    assert set(members[:5]) <= kept  # no false negatives
    # drop-mode survivors are PROVABLY absent from the member set
    assert not (dropped & set(members))


def test_bloom_null_keys_membership_semantics(spark):
    out = {
        r["k"]: r["bloom_hit"]
        for r in _bloom(spark, [None, "a"], [None], m_bits=1 << 16).collect()
    }
    assert out[None] is True  # NULL probe hits: the set held a NULL
    assert out["a"] is False


def test_bloom_saturation_all_hit(spark):
    # m_bits=2 with 10 keys saturates both positions: everything hits
    out = _bloom(
        spark, ["q1", "q2"], [f"z{i}" for i in range(10)], m_bits=2, k=2
    ).collect()
    assert all(r["bloom_hit"] for r in out)


def test_bloom_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("bloom_membership")(key_col="k", mode="nope")
    with pytest.raises(OperatorConfigError):
        get_operator("bloom_membership")(key_col="")


def test_bloom_plan_broadcasts_never_shuffles_big(spark):
    big = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    keys = spark.range(10).select(F.col("id").cast("string").alias("k"))
    out = get_operator("bloom_membership")(key_col="k", k=3).apply(
        {"in": big, "keys": keys}
    )["out"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
