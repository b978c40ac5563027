import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.sampling import hash_sample, hash_split


def test_split_partition_complete_and_disjoint(tables):
    docs = tables["documents"]
    splits = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    counts = {k: v.count() for k, v in splits.items()}
    assert sum(counts.values()) == n  # complete, no row lost or doubled
    train_ids = {r["doc_id"] for r in splits["train"].select("doc_id").collect()}
    val_ids = {r["doc_id"] for r in splits["val"].select("doc_id").collect()}
    assert not (train_ids & val_ids)  # disjoint
    # roughly proportional (hash-uniform; generous tolerance at n=500)
    assert counts["train"] > 0.6 * n


def test_split_deterministic_across_runs(tables):
    docs = tables["documents"]
    a = hash_split(docs, "doc_id", {"x": 0.5, "y": 0.5})
    b = hash_split(docs.repartition(7), "doc_id", {"x": 0.5, "y": 0.5})
    ids_a = {r["doc_id"] for r in a["x"].select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b["x"].select("doc_id").collect()}
    assert ids_a == ids_b  # partitioning-independent


def test_salt_changes_assignment(tables):
    docs = tables["documents"]
    base = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    salted = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, salt="v2").collect()}
    assert base != salted


def test_sample_rate_bounds(tables):
    docs = tables["documents"]
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    assert hash_sample(docs, "doc_id", 1.0).count() == docs.count()
    with pytest.raises(OperatorConfigError):
        hash_sample(docs, "doc_id", 1.5)


def test_operator_config_validation():
    with pytest.raises(OperatorConfigError, match="sum to 1"):
        get_operator("hash_split")(key_col="id", weights={"a": 0.5, "b": 0.4})
    with pytest.raises(OperatorConfigError):
        get_operator("hash_split")(weights={"a": 1.0})
    op = get_operator("hash_split")(key_col="id", weights={"a": 0.7, "b": 0.3})
    assert op.out_ports == ("a", "b")
