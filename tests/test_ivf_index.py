"""Persistent IVF index (operators/similarity.py ivf_index_update /
ivf_index_topk): corpus cell assignments stored once, partitioned by
cell; query batches probe only their cells' partition directories."""

import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError
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
