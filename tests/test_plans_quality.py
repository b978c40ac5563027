"""Plan-quality regression tests: assert the physical plans keep the
shapes that matter at scale (broadcasts on dimension joins, parquet
predicate pushdown, no shuffles where none are needed)."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q5_joins_are_broadcast(spark):
    import __spark_entry__ as m

    plan = plan_of(m.queries()["q5_region_revenue"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims fit under the threshold


def test_q1_filter_pushed_to_parquet(spark):
    import __spark_entry__ as m

    plan = plan_of(m.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001"))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_projection_pruned_at_scan(spark, tables):
    plan = plan_of(tables["lineitem"].select("l_orderkey", "l_quantity"))
    # ReadSchema must contain only the selected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_merge_union_has_no_shuffle(spark, tables):
    from etl_core_spark.operators.base import get_operator

    li = tables["lineitem"]
    out = get_operator("merge")().apply(
        {"in": li.filter(F.col("l_quantity") > 45), "in#1": li.filter(F.col("l_quantity") < 2)}
    )["out"]
    assert "Exchange" not in plan_of(out)


def test_split_reuses_plan_no_cache(spark, tables):
    from etl_core_spark.operators.base import get_operator

    branches = get_operator("split")(branches=["a", "b"]).apply({"in": tables["orders"]})
    # same underlying plan object — no duplication, no materialization
    assert branches["a"] is branches["b"]


def test_filter_rule_pushdown(spark, tables):
    from etl_core_spark.operators.base import get_operator

    out = get_operator("filter")(
        rule={"column": "o_totalprice", "operator": ">", "value": 100000.0}
    ).apply({"in": tables["orders"]})
    plan = plan_of(out["pass"])
    assert "GreaterThan(o_totalprice,100000.0)" in plan


def test_type_conversion_parse_not_duplicated(spark):
    """Regression guard for the cast-ladder staging: the JSON extract
    and the string→double parse must each appear exactly once in the
    optimized plan (the integral-long ladder references its input ~6×,
    and un-staged plans duplicated the parse into every reference —
    a 20× slowdown at sf0.1)."""
    import __spark_entry__ as m

    df = m.queries()["type_conversion"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("get_json_object") == 1
    assert plan.count("try_cast") == 1


def test_range_join_broadcasts_interval_side(spark):
    # the point side must stream (never shuffle/broadcast); the tiny
    # exploded interval side carries the broadcast
    import __spark_entry__ as m

    df = m.queries()["range_join"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "BuildRight" in plan
    assert "BuildLeft" not in plan


def test_asof_join_is_single_shuffle_no_explosion(spark):
    # union-and-carry: both sides exchange ONCE on the key; no range
    # condition ever reaches a join operator (no nested-loop fallback)
    import __spark_entry__ as m

    df = m.queries()["asof_join"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan  # not a join at all — a window


def test_minhash_pairs_no_cartesian(spark):
    # banding must keep the candidate join an equi-join on band_key
    import __spark_entry__ as m

    df = m.queries()["minhash_near_dup_pairs"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_topk_self_query(spark, tables):
    from etl_core_spark.operators.similarity import ivf_topk

    emb = tables["embeddings"]
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    rows = ivf_topk(emb, queries, k=3, num_centroids=4, nprobe=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        top = min(rs, key=lambda r: r["rank"])
        # a query always lands in its own cell → self is rank 1
        assert top["vec_id"] == qid
        assert top["cosine"] == pytest.approx(1.0, abs=1e-4)


def test_simhash_pairs_no_cartesian(spark):
    # pigeonhole banding must keep candidate generation an equi-join
    # on the band key — the oracle's quadratic comparison is exactly
    # the plan shape the operator must NOT have
    import __spark_entry__ as m

    df = m.queries()["simhash_near_dup_pairs"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    from etl_core_spark.session import release_intermediates

    release_intermediates()


def test_tf_idf_n_docs_is_broadcast_not_eager(spark, tables):
    # corpus size N must ride the plan as a broadcast one-row
    # aggregate; the plan therefore contains a broadcast join for it
    # (the zero-jobs-at-construction property is asserted in
    # test_dirty_dedup.py)
    from etl_core_spark.operators.text_analysis import tf_idf_top_terms

    df = tf_idf_top_terms(tables["documents"], "text", "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_training_pipeline_composes_without_cartesian(spark):
    # quality gate → null-safe dedup semi-join → hash sample must stay
    # hash/sort-merge joins end-to-end (eqNullSafe keys are valid hash
    # join keys; a planner fallback to BNLJ would be a scale bug)
    import __spark_entry__ as m

    df = m.queries()["training_pipeline"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_clean_text_is_single_narrow_stage(spark):
    """clean_text must stay one codegen'd projection over a pruned
    scan — no shuffle, no Python, only the referenced columns read."""
    import __spark_entry__ as m

    plan = plan_of(m.queries()["clean_text"](spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_stratified_sample_is_single_narrow_stage(spark):
    import __spark_entry__ as m

    plan = plan_of(m.queries()["stratified_sample"](spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_cap_per_group_prelimits_before_shuffle(spark):
    """cap_per_group must keep the map-side WindowGroupLimit: each
    input partition is cut to max_rows per group BEFORE the exchange,
    so only survivors shuffle — the difference between shipping 50
    rows per group per partition and shipping the whole corpus."""
    import __spark_entry__ as m

    plan = plan_of(m.queries()["cap_per_group"](spark, "/root/testdata/sf0.001"))
    pre, _, post = plan.partition("Exchange")
    assert "WindowGroupLimit" in pre and "WindowGroupLimit" in post


def test_q7_q9_q10_no_cartesian_or_bnlj(spark):
    """The new TPC-H analogs must stay hash joins: dimension sides
    broadcast (hinted), the fact join free for AQE/SMJ at scale —
    never a Cartesian or nested-loop fallback."""
    import __spark_entry__ as m

    for q in ("q7_volume_shipping", "q9_product_profit", "q10_returned_items"):
        plan = plan_of(m.queries()[q](spark, "/root/testdata/sf0.001"))
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q
        assert "BroadcastHashJoin" in plan, q


def test_json_expand_parses_once(spark):
    """json_expand must keep ONE from_json in the optimized plan no
    matter how many fields reference the parse — the staged-
    projection contract (same as the cast ladders)."""
    from etl_core_spark.operators.base import get_operator

    df = spark.createDataFrame(
        [(1, '{"a": 1, "b": "x", "c": 2.5}')], "id long, j string"
    )
    out = get_operator("json_expand")(json_col="j", fields=[
        {"name": "a", "data_type": "integer"},
        {"name": "b", "data_type": "string"},
        {"name": "c", "data_type": "float"},
    ]).apply({"in": df})["out"]
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("from_json") == 1


def test_partitioned_read_prunes_partitions(spark, tables, tmp_path):
    """A filter on the partition column must land in PartitionFilters
    (directory pruning), not as a post-scan Filter over all files."""
    from etl_core_spark.operators.base import get_operator

    out = tmp_path / "orders_by_status"
    get_operator("write_parquet")(
        filepath=str(out), partition_by=["o_orderstatus"]
    ).apply({"in": tables["orders"]})
    back = get_operator("read_parquet")(spark=spark, filepath=str(out)).apply({})["out"]
    plan = plan_of(back.where(F.col("o_orderstatus") == "O"))
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]


def test_semdedup_assignment_shared_and_no_unbounded_cartesian(spark, tables):
    from etl_core_spark.operators.similarity import semdedup

    plan = plan_of(semdedup(tables["embeddings"], threshold=0.4, num_centroids=8))
    # never a data×data cartesian: the only nested-loop allowed is the
    # centroid broadcast cross, bounded by num_centroids rows
    assert "CartesianProduct" not in plan
    # assignment subtree is persisted: both sides of the within-cell
    # self-join read InMemoryTableScans of ONE cached relation, so the
    # centroid cross (the only nested-loop, bounded by num_centroids)
    # and its keyed window execute once. explain re-prints the cached
    # subtree per reference — count scans, not subtree nodes.
    assert plan.count("InMemoryTableScan") >= 2
    # the pair step is an equi-join on cell id (hash/merge, salt-able)
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_shuffle_rows_no_single_partition_sort(spark, tables):
    from etl_core_spark.operators.sampling import shuffle_rows

    plan = plan_of(shuffle_rows(tables["documents"], "doc_id", n_buckets=32))
    # the scale hazard this operator exists to avoid: a GLOBAL sort
    # (range exchange) feeding one row_number window over everything.
    # ranks must come from a hash-partitioned window keyed by bucket
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning(__b" in plan
    # offsets ride a broadcast, not a shuffled join
    assert "BroadcastHashJoin" in plan


def test_salted_join_stays_hash_join_no_bnlj(spark, tables):
    from etl_core_spark.operators.skew import salted_join

    li = tables["lineitem"].select("l_suppkey", "l_quantity")
    supp = tables["supplier"].select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plan = plan_of(salted_join(li, supp, ["l_suppkey"], salt_factor=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the whole point: the join key includes the salt column
    assert "__salt" in plan


def test_corpus_overlap_no_shingle_self_join(spark, tables):
    from etl_core_spark.operators.text_analysis import corpus_overlap

    plan = plan_of(corpus_overlap(tables["documents"]))
    # the r8 reshape: grams aggregate per shingle (collect_set) and
    # pairs come from array combos — no SortMergeJoin on the raw
    # shingle stream (size joins on ≤groups rows may broadcast)
    assert "SortMergeJoin" not in plan
    # gram agg + the tiny pair/size aggregates — and nothing more
    import re

    shuffles = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(shuffles) <= 4, plan


def test_histogram_counts_side_is_broadcast(spark, tables):
    from etl_core_spark.operators.profile import histogram

    plan = plan_of(histogram(tables["lineitem"], "l_extendedprice", bins=20))
    # the spine-counts join must broadcast the ≤bins-row counts side,
    # never shuffle the scan twice for it
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rolling_aggregate_single_window_shuffle(spark, tables):
    from etl_core_spark.operators.timeseries import rolling_aggregate

    out = rolling_aggregate(
        tables["orders"], "o_orderdate", "o_totalprice", 30 * 86400,
        ["o_custkey"], ("sum", "count", "mean"),
    )
    plan = plan_of(out)
    # all three aggs ride ONE window over one hash partitioning —
    # hashpartitioning on the key appears once
    assert plan.count("hashpartitioning(o_custkey") <= 1
    assert "SortMergeJoin" not in plan


def test_collocations_totals_are_broadcast(spark, tables):
    from etl_core_spark.operators.text_analysis import collocations

    plan = plan_of(collocations(tables["documents"], min_count=5, top_k=50))
    # corpus totals (U, B) must ride broadcast one-row cross joins;
    # top-k must be TakeOrdered, not a global Sort+Limit
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_diff_datasets_single_join_no_bnlj(spark, tables):
    from etl_core_spark.operators.compare import diff_datasets

    orders = tables["orders"]
    plan = plan_of(
        diff_datasets(
            orders, orders, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
        )
    )
    # null-safe key equality must stay an equi-join (knownfloatingpoint
    # normalized eqNullSafe compiles to a hash-joinable key), never a
    # BroadcastNestedLoopJoin over the whole pair space
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Join") >= 1


def test_scd2_merge_one_pass_explode(spark, tables):
    from etl_core_spark.operators.compare import scd2_merge
    from pyspark.sql import functions as F

    cust = tables["customer"]
    cur = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("v"),
        F.to_date(F.lit("2023-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    upd = cust.select(
        F.col("c_custkey").alias("k"),
        (F.col("c_acctbal") + 1).alias("v"),
        F.to_date(F.lit("2024-06-01")).alias("eff"),
    )
    plan = plan_of(scd2_merge(cur, upd, ["k"], ["v"], "eff"))
    # the three output branches come from ONE pass over the join via
    # array-explode: exactly one Generate node (formatted explain
    # names each node twice: tree + detail), one full-outer join, no
    # three-branch re-scan (which would show three joins)
    import re

    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mad_outliers_stats_ride_broadcast(spark, tables):
    from etl_core_spark.operators.timeseries import mad_outliers

    plan = plan_of(
        mad_outliers(
            tables["events"], "value", ["event_type"], broadcast_stats=True
        )
    )
    # ONE broadcast join-back of the combined (median, MAD) table on
    # the output path (+ the broadcast median join inside the MAD
    # aggregate's lineage); the big side never sorts, windows, or
    # shuffle-joins — the two-stage naive shape SMJ'd the full input
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_retention_cohorts_no_bnlj(spark, tables):
    from etl_core_spark.operators.timeseries import retention_cohorts

    plan = plan_of(retention_cohorts(tables["events"], "user_id", "ts"))
    # first-seen join-back is a keyed equi-join (AQE-sized), and the
    # cell count is a partial-aggregated distinct
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_count(distinct" in plan.lower() or "HashAggregate" in plan


def test_markov_transitions_single_window_shuffle(spark, tables):
    from etl_core_spark.operators.timeseries import markov_transitions

    plan = plan_of(
        markov_transitions(
            tables["events"], "user_id", "ts", "event_type", ["event_id"]
        )
    )
    # ONE window shuffle on the entity key: the persisted pair-count
    # table feeds both the counts and totals branches, so the
    # user-keyed exchange appears once (unpersisted it appears twice)
    import re

    user_exchanges = {
        m.group(1)
        for m in re.finditer(
            r"\((\d+)\) Exchange\nArguments: hashpartitioning\(user_id", plan
        )
    }
    assert len(user_exchanges) <= 1, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dsir_weights_ratio_join_is_broadcast(spark):
    """The B-row log-ratio table must reach the per-doc join as a
    broadcast — a shuffle of the tf relation against it would be a
    corpus-sized exchange for a bounded dimension."""
    import __spark_entry__ as m

    plan = plan_of(m.queries()["dsir_weights"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    # no row-at-a-time Python anywhere in the selection family
    assert "BatchEvalPython" not in plan


def test_pq_topk_single_arrow_stage_no_row_python(spark):
    """PQ's encode+ADC must be ONE fused Arrow stage over the corpus
    (MapInPandas), never row-at-a-time Python; candidate cut +
    re-rank stay JVM-side."""
    import __spark_entry__ as m

    plan = plan_of(m.queries()["pq_topk"](spark, "/root/testdata/sf0.001"))
    # formatted explain names each node twice (tree + details):
    # exactly one Arrow stage == exactly two mentions
    assert plan.count("MapInPandas") == 2
    assert "BatchEvalPython" not in plan


def test_entropy_metrics_no_window(spark):
    """Entropy is two aggregates + join-back — a Window here would
    mean a per-doc sort that the groupBy shape avoids."""
    import __spark_entry__ as m

    plan = plan_of(m.queries()["entropy_metrics"](spark, "/root/testdata/sf0.001"))
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_bfs_round_join_keeps_aqe(spark, tables):
    """The BFS frontier join must stay an equi-join (AQE decides
    broadcast at runtime as the frontier shrinks) — no cartesian."""
    from etl_core_spark.operators.graph import bfs_distances

    e = tables["lineitem"].select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    s = tables["supplier"].select(F.col("s_suppkey").alias("node")).limit(5)
    plan = plan_of(bfs_distances(e, s, max_hops=1))
    assert "CartesianProduct" not in plan


def test_kmeans_assignment_is_broadcast_not_cartesian(spark, tables):
    """kmeans_cluster's centroid scoring must plan as a BROADCAST
    nested-loop over the k-row centroid side — never a cartesian —
    and the corpus side must stay JVM-side (no per-row Python)."""
    from etl_core_spark.operators.similarity import kmeans_cluster

    plan = plan_of(kmeans_cluster(tables["embeddings"], k=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan


def test_substring_and_containment_have_no_pair_cartesian(spark, tables):
    """The r10 dedup additions must keep every join keyed: substring
    dedup has NO doc-pair join at all, and containment's shingle
    self-join is an equi-join on the hashed shingle key."""
    from etl_core_spark.operators.dedup import containment_pairs
    from etl_core_spark.operators.substring import substring_dup_spans

    docs = tables["documents"]
    for df in (
        substring_dup_spans(docs, span_tokens=8),
        containment_pairs(docs, "text", "doc_id", threshold=0.3),
    ):
        plan = plan_of(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_cdc_apply_single_join_no_bnlj(spark, tables):
    from pyspark.sql import functions as F

    from etl_core_spark.operators.compare import cdc_apply

    orders = tables["orders"]
    changes = orders.limit(100).select(
        "o_orderkey",
        F.lit(1).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
    )
    plan = plan_of(cdc_apply(orders, changes, ["o_orderkey"]))
    # the null-safe key equality must compile to ONE hash-joinable
    # full-outer equi-join, never a nested-loop pair scan; the batch
    # dedup window is the only other exchange consumer
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    import re

    join_nodes = re.findall(r"\(\d+\) +\w*Join", plan)
    assert len(join_nodes) == 1, join_nodes


def test_winsorize_one_aggregate_one_joinback(spark, tables):
    from etl_core_spark.operators.timeseries import winsorize

    ev = tables["events"]
    plan = plan_of(
        winsorize(ev, "value", ["event_type"], lower=0.05, upper=0.95)
    )
    # percentile bounds: one (partial+final) aggregate, one keyed
    # join-back; the big side must not be windowed or re-aggregated
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("percentile") >= 1


def test_zorder_key_is_narrow_after_stats(spark, tables):
    from etl_core_spark.operators.layout import zorder_key

    part = tables["part"]
    plan = plan_of(zorder_key(part, ["p_size", "p_retailprice"]))
    # min/max ride a one-row broadcast; the z-value itself is a pure
    # codegen projection — no shuffle of the big side, no UDF
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mmr_greedy_stage_joins_stay_keyed(spark):
    from pyspark.sql import functions as F

    from etl_core_spark.operators.similarity import mmr_rerank

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.col("id") * (i + 3) % 17).cast("double") for i in range(8)
        ]).alias("embedding"),
    )
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = plan_of(mmr_rerank(emb, q, k=3, fetch_n=10))
    # stage 1 is the documented brute-force cross product; the greedy
    # rounds themselves must never introduce a second pair-space scan
    assert plan.count("CartesianProduct") + plan.count(
        "BroadcastNestedLoopJoin"
    ) <= 1


def test_record_linkage_block_join_is_hash_shaped(spark, tables):
    import re

    from etl_core_spark.operators.linkage import record_linkage

    cust = tables["customer"]
    plan = plan_of(record_linkage(
        cust, "c_custkey", ["c_nationkey", "c_mktsegment"],
        [
            {"col": "c_name", "kind": "levenshtein", "threshold": 2,
             "m": 0.9, "u": 0.05},
            {"col": "c_acctbal", "kind": "abs_diff", "threshold": 100.0,
             "m": 0.85, "u": 0.1},
        ],
        lower=-2.0, upper=3.0, max_block_size=None,
    ))
    # the blocked candidate join must be a single hash-shaped
    # equi-join; the levenshtein/abs_diff residuals ride as post-join
    # filters, never a pair scan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    join_nodes = re.findall(r"\(\d+\) +\w*Join", plan)
    assert len(join_nodes) == 1, join_nodes


def test_snm_rank_has_no_single_partition_global_window(spark, tables):
    from etl_core_spark.operators.linkage import _global_rank

    plan = plan_of(_global_rank(tables["customer"], ["c_acctbal", "c_custkey"]))
    # the data-sized window is partitioned by __pid (partition-local
    # ranks); the only SinglePartition exchange feeds the
    # #partitions-sized offsets window, never the data relation
    assert "rangepartitioning" in plan.lower()
    windows = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert windows and all("__pid" in ln for ln in windows), windows
    # the offsets side joins back as a broadcast, not a shuffle
    assert "BroadcastHashJoin" in plan


def test_ungrouped_rank_tests_have_no_single_partition_window(spark, tables):
    """VERDICT r10 #6: mannwhitney_u / ks_drift UNGROUPED modes walk
    all distinct values — their cumulative sums must use the
    distributed prefix-sum machinery, never a global Window.orderBy
    (a single-partition shuffle of the whole distinct-value relation
    at scale)."""
    from etl_core_spark.operators.compare import ks_drift, mannwhitney_u

    ev = tables["events"]
    left = ev.where(F.col("event_type") == "view")
    right = ev.where(F.col("event_type") == "purchase")
    for df in (
        mannwhitney_u(left, right, "value", []),
        ks_drift(left, right, "value", []),
    ):
        plan = plan_of(df)
        assert "rangepartitioning" in plan.lower()
        windows = [
            ln for ln in plan.splitlines() if "windowspecdefinition" in ln
        ]
        # every data-sized window is __pid-partitioned; the only
        # unpartitioned window is the #partitions-sized offsets side,
        # which joins back as a broadcast
        assert windows and all("__pid" in ln for ln in windows), windows
        assert "BroadcastHashJoin" in plan


def test_psi_drift_is_two_aggregates_one_join_no_window(spark, tables):
    import re

    from etl_core_spark.operators.compare import psi_drift

    ev = tables["events"]
    plan = plan_of(psi_drift(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
        "value", [10.0, 20.0, 50.0], ["user_id"],
    ))
    assert "Window" not in plan
    join_nodes = re.findall(r"\(\d+\) +\w*Join", plan)
    assert len(join_nodes) == 1, join_nodes


def test_benford_single_aggregate_no_join_no_window(spark, tables):
    from etl_core_spark.operators.profile import benford_deviation

    plan = plan_of(benford_deviation(
        tables["orders"], "o_totalprice", ["o_orderpriority"]
    ))
    assert "Join" not in plan
    assert "Window" not in plan
    # digit extraction is a codegen projection over the scan, so the
    # whole thing is one partial+final aggregate pair
    assert plan.count("HashAggregate") >= 2


def test_theil_sen_pair_join_is_keyed_and_slopes_join_not_broadcast_built(
    spark, tables
):
    from etl_core_spark.operators.timeseries import theil_sen

    ev = tables["events"].where(F.col("event_type") == "purchase").select(
        "user_id", "value", F.unix_micros(
            F.col("ts").cast("timestamp")
        ).alias("t"),
    )
    plan = plan_of(theil_sen(ev, ["user_id"], "t", "value",
                             time_divisor=86400e6, max_points=None))
    # within-key self-join and the slope join-back are both keyed
    # equi-joins; nothing cartesian, nothing nested-loop
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
