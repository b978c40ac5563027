"""Incremental MinHash index: persistent signature store + new-batch
near-dup queries without corpus recompute (operators/dedup.py
minhash_index_update / incremental_near_dup_pairs and the
incremental_dedup / minhash_index operators)."""

import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.dedup import (
    incremental_near_dup_pairs,
    minhash_index_update,
    read_index_meta,
)
from etl_core_spark.session import release_intermediates

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (2, "an entirely different document about database engines"),
    (4, "spark structured streaming watermarks bound the state store"),
    (6, ""),  # zero-shingle doc: excluded from the index
]
BATCH = [
    (101, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (103, "a brand new unique document with no corpus match"),
    (105, None),                                            # null text
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def index(spark, tmp_path):
    path = str(tmp_path / "idx")
    minhash_index_update(
        _df(spark, CORPUS), "text", "doc_id", path, num_hashes=8, bands=4
    )
    return path


def test_index_meta_and_exact_dup_found(spark, index):
    assert read_index_meta(index) == {
        "num_hashes": 8, "bands": 4, "shingle_n": 3, "id_col": "doc_id"
    }
    pairs = incremental_near_dup_pairs(
        _df(spark, BATCH), index, threshold=0.5
    ).collect()
    release_intermediates()
    got = {(r["id_new"], r["id_corpus"]): r["est_jaccard"] for r in pairs}
    # identical text -> identical signature -> estimator exactly 1.0
    assert got == {(101, 0): 1.0}


def test_index_append_extends_corpus(spark, index):
    minhash_index_update(
        _df(spark, [(10, "a brand new unique document with no corpus match")]),
        "text", "doc_id", index, num_hashes=8, bands=4,
    )
    pairs = incremental_near_dup_pairs(_df(spark, BATCH), index, threshold=0.5)
    got = {(r["id_new"], r["id_corpus"]) for r in pairs.collect()}
    release_intermediates()
    assert got == {(101, 0), (103, 10)}  # both generations matched


def test_index_upsert_replaces_signature(spark, index):
    # re-crawl doc 0 with totally different content: its OLD signature
    # must be gone (101 no longer matches), the new one live
    minhash_index_update(
        _df(spark, [(0, "completely rewritten page content after recrawl")]),
        "text", "doc_id", index, num_hashes=8, bands=4, mode="upsert",
    )
    pairs = incremental_near_dup_pairs(_df(spark, BATCH), index, threshold=0.5)
    assert pairs.count() == 0
    release_intermediates()
    # and the index has exactly one signature row per id
    import os

    sigs = spark.read.parquet(os.path.join(index, "sigs"))
    assert sigs.groupBy("doc_id").count().where("count > 1").count() == 0


def test_index_parameter_mismatch_raises(spark, index):
    with pytest.raises(OperatorConfigError, match="refusing update"):
        minhash_index_update(
            _df(spark, CORPUS), "text", "doc_id", index, num_hashes=16, bands=8
        )
    with pytest.raises(OperatorConfigError, match="no index meta"):
        incremental_near_dup_pairs(_df(spark, BATCH), "/tmp/definitely_missing_idx")


def test_incremental_dedup_operator_annotate_and_drop(spark, index):
    batch = _df(spark, BATCH)
    ann = get_operator("incremental_dedup")(
        index_path=index, threshold=0.5
    ).apply({"in": batch})["out"]
    rows = {r["doc_id"]: (r["n_corpus_matches"], r["is_corpus_dup"])
            for r in ann.collect()}
    release_intermediates()
    assert rows == {101: (1, True), 103: (0, False), 105: (0, False)}
    assert ann.count() == batch.count()  # annotate preserves row count

    dropped = get_operator("incremental_dedup")(
        index_path=index, threshold=0.5, action="drop"
    ).apply({"in": batch})["out"]
    assert {r["doc_id"] for r in dropped.collect()} == {103, 105}
    release_intermediates()
    with pytest.raises(OperatorConfigError, match="index_path"):
        get_operator("incremental_dedup")()
    with pytest.raises(OperatorConfigError, match="action"):
        get_operator("incremental_dedup")(index_path=index, action="explode")


def test_minhash_index_sink_roundtrip(spark, tmp_path):
    """The dedup-then-index pipeline: drop corpus dups from the batch,
    sink survivors into the index, and verify the NEXT batch sees
    them."""
    path = str(tmp_path / "idx2")
    minhash_index_update(_df(spark, CORPUS), "text", "doc_id", path,
                         num_hashes=8, bands=4)
    batch = _df(spark, BATCH)
    survivors = get_operator("incremental_dedup")(
        index_path=path, threshold=0.5, action="drop"
    ).apply({"in": batch})["out"]
    get_operator("minhash_index")(
        index_path=path, num_hashes=8, bands=4
    ).apply({"in": survivors})
    release_intermediates()
    next_batch = _df(spark, [(201, "a brand new unique document with no corpus match")])
    got = {(r["id_new"], r["id_corpus"])
           for r in incremental_near_dup_pairs(next_batch, path, threshold=0.5).collect()}
    release_intermediates()
    assert got == {(201, 103)}  # survivor 103 is now part of the corpus


def test_streaming_incremental_dedup_end_to_end(spark, tmp_path):
    """The continuous crawl pipeline: per micro-batch, dedup within
    the batch, drop docs matching the already-indexed corpus, append
    survivors to index and output. Driven with one file per
    micro-batch so batch 2 provably sees batch 1's survivors through
    the index (the index IS the cross-batch state)."""
    import os
    import time as _time

    from etl_core_spark.streaming.stream import streaming_incremental_dedup

    src = tmp_path / "src"
    src.mkdir()

    def write_file(name, rows, mtime):
        df = _df(spark, rows)
        p = str(src / name)
        df.coalesce(1).write.parquet(p)
        for root, _d, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (mtime, mtime))

    t0 = _time.time() - 1000
    # batch 1: 1~2 near-dups (min id 1 survives), 3 unique
    write_file("f1", [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely unrelated text about parquet file layouts"),
    ], t0)
    # batch 2: 11 dups batch 1's survivor, 12 is new, 13 zero-shingle
    write_file("f2", [
        (11, "the quick brown fox jumps over the lazy dog"),
        (12, "another brand new document nothing has ever matched"),
        (13, ""),
    ], t0 + 10)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = streaming_incremental_dedup(
        stream,
        index_path=str(tmp_path / "idx"),
        out_path=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.5, num_hashes=8, bands=4,
    )
    try:
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert q.exception() is None
    release_intermediates()

    out = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    # 2 deduped within batch 1; 11 dropped against the index; 13
    # (zero-shingle) passes through — it can never verify as a dup
    assert out == {1, 3, 12, 13}
    sigs = spark.read.parquet(str(tmp_path / "idx" / "sigs"))
    assert {r["doc_id"] for r in sigs.select("doc_id").collect()} == {1, 3, 12}


def test_minhash_index_compact(spark, index):
    """by='row' removes re-run duplicate rows; by='id' keeps one
    whole-tuple signature per id (never a per-column chimera)."""
    import os

    from etl_core_spark.operators.dedup import (
        minhash_index_compact,
        minhash_index_update,
    )

    # simulate an at-least-once re-run: append the same corpus again
    minhash_index_update(_df(spark, CORPUS), "text", "doc_id", index,
                         num_hashes=8, bands=4)
    table = os.path.join(index, "sigs")
    assert spark.read.parquet(table).count() == 6  # 3 non-empty docs x2
    removed = minhash_index_compact(spark, index, by="row")
    assert removed == 3
    sigs = spark.read.parquet(table)
    assert sigs.count() == 3
    # re-crawl id 0 with different content, then compact by id
    minhash_index_update(
        _df(spark, [(0, "totally different recrawled body text")]),
        "text", "doc_id", index, num_hashes=8, bands=4,
    )
    assert spark.read.parquet(table).count() == 4
    removed = minhash_index_compact(spark, index, by="id")
    assert removed == 1
    kept = {r["doc_id"] for r in spark.read.parquet(table).collect()}
    assert kept == {0, 2, 4}
    # the kept signature for id 0 is ONE of the two real tuples, not a
    # per-column mixture: it must exactly equal one of the candidates
    both = [tuple(r) for r in minhash_sig_rows(spark, index)]
    assert len(both) == 1
    import pytest as _pytest

    with _pytest.raises(Exception, match="compact mode"):
        minhash_index_compact(spark, index, by="bogus")


def minhash_sig_rows(spark, index):
    """Rows for doc 0 in the index, checked against freshly-computed
    signatures of both historical contents of doc 0."""
    import os

    from etl_core_spark.operators.dedup import _shingle_table, minhash_sig_table

    stored = (
        spark.read.parquet(os.path.join(index, "sigs"))
        .where("doc_id = 0")
        .collect()
    )
    candidates = set()
    for text in (CORPUS[0][1], "totally different recrawled body text"):
        df = _df(spark, [(0, text)])
        sh = _shingle_table(df, "text", "doc_id", 3, persist=False)
        row = minhash_sig_table(sh, "doc_id", 8).collect()[0]
        candidates.add(tuple(row))
    assert all(tuple(r) in candidates for r in stored)
    return stored


def test_incremental_pairs_no_cartesian_plan(spark, index):
    plan = (
        incremental_near_dup_pairs(_df(spark, BATCH), index, threshold=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    release_intermediates()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
