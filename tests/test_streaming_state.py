"""Structured Streaming end-to-end: custom stateful sessionization
via applyInPandasWithState, driven with availableNow micro-batches."""

import datetime

import pytest
from pyspark.sql import functions as F


def test_sessionize_streaming_runs_and_checkpoints(spark, tmp_path):
    src_dir = tmp_path / "src"
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for u in range(3):
        # two bursts >30min apart → 2 sessions per user once state times out
        for i in range(5):
            rows.append((u, base + datetime.timedelta(seconds=i * 60)))
        for i in range(5):
            rows.append((u, base + datetime.timedelta(hours=2, seconds=i * 60)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.coalesce(1).write.parquet(str(src_dir))

    from etl_core_spark.streaming import sessionize

    # state-store instances are per shuffle partition; keep the test
    # fast with a few (production sizing is a real conf decision)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    stream = spark.readStream.schema(df.schema).parquet(str(src_dir))
    out_dir = tmp_path / "out"
    q = (
        sessionize(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert q.exception() is None
    # processing-time timeouts don't fire inside a single availableNow
    # run — state persists in the checkpoint; a successful terminated
    # run with committed state is the contract here
    import os

    assert (tmp_path / "ckpt" / "state").exists()
    assert q.lastProgress is not None


def test_sessionize_batch_equivalent_counts(spark, tables, duck):
    """The batch window-function analog (oracle-checked in
    __spark_entry__) agrees with DuckDB on the events table."""
    import __spark_entry__ as m

    out = m.q_sessionize_batch(spark, "/root/testdata/sf0.001")
    want = dict(
        duck.execute(
            """
            WITH g AS (
              SELECT user_id,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                  > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS s
              FROM events)
            SELECT user_id, CAST(sum(s) AS BIGINT) FROM g GROUP BY user_id
            """
        ).fetchall()
    )
    got = {r["user_id"]: r["n_sessions"] for r in out.collect()}
    assert got == want
