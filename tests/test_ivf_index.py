"""Persistent IVF index (operators/similarity.py ivf_index_update /
ivf_index_topk): corpus cell assignments stored once, partitioned by
cell; query batches probe only their cells' partition directories."""

import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.similarity import (
    ivf_index_topk,
    ivf_index_update,
    ivf_topk,
    read_ivf_meta,
)
from etl_core_spark.session import release_intermediates


def _queries(tables):
    return tables["embeddings"].filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_ivf_index_matches_direct_path(spark, tables, tmp_path):
    """The persisted-index path must return EXACTLY what the direct
    in-memory ivf_topk returns for the same parameters — persistence
    must not change a single row."""
    emb = tables["embeddings"]
    path = str(tmp_path / "ivf")
    ivf_index_update(emb, path, num_centroids=8)
    got = {
        tuple(r) for r in ivf_index_topk(
            _queries(tables), path, k=5, nprobe=2
        ).collect()
    }
    want = {
        tuple(r) for r in ivf_topk(
            emb, _queries(tables), k=5, num_centroids=8, nprobe=2
        ).collect()
    }
    release_intermediates()
    assert got == want and len(got) > 0


def test_ivf_index_append_equals_full_build(spark, tables, tmp_path):
    """Index half the corpus, append the other half: results equal a
    one-shot full build (new vectors assign to the FIXED stored
    centroids, which seed from the lowest ids — present in the first
    half)."""
    emb = tables["embeddings"]
    n_cent = 8
    first = emb.orderBy("vec_id").limit(200)
    rest = emb.join(first.select("vec_id"), on="vec_id", how="left_anti")
    inc = str(tmp_path / "inc")
    ivf_index_update(first, inc, num_centroids=n_cent)
    ivf_index_update(rest, inc, num_centroids=n_cent)
    full = str(tmp_path / "full")
    ivf_index_update(emb, full, num_centroids=n_cent)
    a = {tuple(r) for r in ivf_index_topk(_queries(tables), inc, k=5, nprobe=2).collect()}
    b = {tuple(r) for r in ivf_index_topk(_queries(tables), full, k=5, nprobe=2).collect()}
    release_intermediates()
    assert a == b and len(a) > 0


def test_ivf_index_meta_pinned_and_missing(spark, tables, tmp_path):
    path = str(tmp_path / "ivf")
    ivf_index_update(tables["embeddings"], path, num_centroids=8)
    assert read_ivf_meta(path)["num_centroids"] == 8
    with pytest.raises(OperatorConfigError, match="refusing update"):
        ivf_index_update(tables["embeddings"], path, num_centroids=16)
    with pytest.raises(OperatorConfigError, match="no IVF index"):
        ivf_index_topk(_queries(tables), "/tmp/definitely_missing_ivf")


def test_ivf_index_probe_is_partition_pruned(spark, tables, tmp_path):
    """The probed-cell filter must reach the cells scan as a PARTITION
    filter (the table is partitioned by __cid), so a query batch reads
    only its nprobe cells' directories."""
    path = str(tmp_path / "ivf")
    ivf_index_update(tables["embeddings"], path, num_centroids=8)
    one_query = tables["embeddings"].filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = (
        ivf_index_topk(one_query, path, k=5, nprobe=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    release_intermediates()
    import re

    filters = [
        m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "__cid" in m
    ]
    # one query, nprobe=1 -> the cells scan reads exactly ONE cell
    # (a single-element isin compiles to an equality partition filter)
    assert filters and re.search(r"__cid#\d+L? (= \d+|IN \(\d+\))", filters[0]), (
        filters, plan[:1500],
    )


# ---------------------------------------------------------------- MMR

def _py_mmr(corpus, queries, k, fetch_n, lam):
    """Pure-Python replay of the pinned MMR arithmetic: 6dp-rounded
    unit-vector cosines, lambda math on the rounded doubles, ties by
    candidate id ascending."""
    import math

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else list(v)

    def cos(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return round(s, 6)

    out = []
    for qid, qv in queries:
        qu = unit(qv)
        scored = sorted(
            ((cos(qu, unit(cv)), cid, unit(cv)) for cid, cv in corpus),
            key=lambda t: (-t[0], t[1]),
        )[:fetch_n]
        state = [
            {"cid": cid, "rel": rel, "cv": cv, "ms": 0.0, "sel": False}
            for rel, cid, cv in scored
        ]
        for rank in range(1, k + 1):
            live = [s for s in state if not s["sel"]]
            if not live:
                break
            win = min(
                live,
                key=lambda s: (-(lam * s["rel"] - (1 - lam) * s["ms"]),
                               s["cid"]),
            )
            out.append(
                (qid, win["cid"],
                 lam * win["rel"] - (1 - lam) * win["ms"], rank)
            )
            win["sel"] = True
            for s in state:
                if not s["sel"]:
                    s["ms"] = max(s["ms"], cos(s["cv"], win["cv"]))
    return sorted(out)


def test_mmr_rerank_matches_python_reference(spark):
    import random

    rng = random.Random(7)
    corpus = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    queries = [(100 + i, [rng.uniform(-1, 1) for _ in range(8)])
               for i in range(3)]
    cdf = spark.createDataFrame(
        corpus, "vec_id long, embedding array<double>"
    )
    qdf = spark.createDataFrame(
        [(q, v) for q, v in queries],
        "query_id long, embedding array<double>",
    )
    got = sorted(
        (r["query_id"], r["vec_id"], r["mmr_score"], r["rank"])
        for r in get_operator("mmr_rerank")(k=5, fetch_n=20)
        .apply({"in": cdf, "queries": qdf})["out"]
        .collect()
    )
    want = _py_mmr(corpus, queries, k=5, fetch_n=20, lam=0.5)
    assert [(g[0], g[1], g[3]) for g in got] == [
        (w[0], w[1], w[3]) for w in want
    ]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) < 1e-9


def test_mmr_lambda_extremes(spark):
    # lambda=1: pure relevance — MMR must equal brute-force top-k order
    cdf = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    qdf = spark.createDataFrame(
        [(0, [1.0, 0.5, 0.2])], "query_id long, embedding array<double>"
    )
    mmr = get_operator("mmr_rerank")(k=4, fetch_n=10, lambda_=1.0).apply(
        {"in": cdf, "queries": qdf}
    )["out"]
    from etl_core_spark.operators.similarity import brute_force_topk

    top = brute_force_topk(cdf, qdf, k=4)
    assert [r["vec_id"] for r in mmr.orderBy("rank").collect()] == [
        r["vec_id"] for r in top.orderBy("rank").collect()
    ]


def test_mmr_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("mmr_rerank")(lambda_=1.5)
    with pytest.raises(OperatorConfigError):
        get_operator("mmr_rerank")(k=10, fetch_n=5)
