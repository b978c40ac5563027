import io
import contextlib

import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import get_operator


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tables, tmp_path):
    """Two tables bucketed on the join key join without a shuffle on
    either side — the write-once/join-many scale path."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        get_operator("write_bucketed")(
            table="b_orders", bucket_by=["o_orderkey"], num_buckets=8,
        ).apply({"in": tables["orders"]})
        get_operator("write_bucketed")(
            table="b_lineitem", bucket_by=["l_orderkey"], num_buckets=8,
        ).apply({"in": tables["lineitem"]})
        left = get_operator("read_table")(spark=spark, table="b_orders").apply({})["out"]
        right = get_operator("read_table")(spark=spark, table="b_lineitem").apply({})["out"]
        joined = left.join(right, left["o_orderkey"] == right["l_orderkey"])
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == tables["lineitem"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_type_conversion_errors_port(spark):
    df = spark.createDataFrame(
        [("1", "yes"), ("two", "no"), ("3", "maybe"), (None, "y"), ("", "t")],
        "n string, b string",
    )
    out = get_operator("type_conversion")(
        rules=[
            {"column_path": "n", "target": "integer", "on_error": "null"},
            {"column_path": "b", "target": "boolean", "on_error": "null"},
        ]
    ).apply({"in": df})
    converted = {(r["n"], r["b"]) for r in out["out"].collect()}
    assert converted == {(1, True), (None, False), (3, None), (None, True)}
    # errors port carries the ORIGINAL rows that lost a real value
    errors = {(r["n"], r["b"]) for r in out["errors"].collect()}
    assert errors == {("two", "no"), ("3", "maybe")}
    # null and null-marker sources are not errors
    assert (None, "y") not in errors and ("", "t") not in errors


def test_numpy_topk_matches_jvm_path(spark, tables):
    from etl_core_spark.operators.similarity import brute_force_topk, brute_force_topk_numpy

    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    jvm = brute_force_topk(emb, queries, k=5)
    np_ = brute_force_topk_numpy(emb, queries, k=5)
    jvm_rows = {(r["query_id"], r["vec_id"], r["rank"]): r["cosine"] for r in jvm.collect()}
    np_rows = {(r["query_id"], r["vec_id"], r["rank"]): r["cosine"] for r in np_.collect()}
    assert jvm_rows.keys() == np_rows.keys()
    for key, cos in jvm_rows.items():
        assert np_rows[key] == pytest.approx(cos, abs=1e-5)


def test_type_conversion_errors_empty_when_clean(spark):
    df = spark.createDataFrame([("1",), ("2",)], "n string")
    out = get_operator("type_conversion")(
        rules=[{"column_path": "n", "target": "integer", "on_error": "null"}]
    ).apply({"in": df})
    assert out["errors"].count() == 0
