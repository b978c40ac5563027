"""Streaming rate soak (VERDICT r6 stretch #10): drive
dropDuplicatesWithinWatermark + incremental_rollup from a live rate
source for ~45 s of continuous micro-batches and assert the state
store stays BOUNDED — the property that separates "runs on a demo"
from "runs for a month": without watermark eviction both operators'
state grows with every key/window ever seen.

The rate source stamps wall-clock event times, so the watermark
advances continuously and eviction must actually happen during the
soak — this is not an availableNow replay."""

import time

import pytest
from pyspark.sql import functions as F


@pytest.mark.slow
def test_rate_soak_state_stays_bounded(spark, tmp_path):
    rate = 400  # rows/sec; every row is a NEW dedup key
    dedup_horizon_s = 5
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.col("value").alias("event_id"),
            (F.col("value") % 5).alias("etype"),
        )
    )
    # stage 1: streaming dedup — unique keys arrive forever; state must
    # be bounded by the watermark horizon, not by total keys seen
    deduped = src.withWatermark(
        "ts", f"{dedup_horizon_s} seconds"
    ).dropDuplicatesWithinWatermark(["event_id"])

    from etl_core_spark.streaming.stream import incremental_rollup

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    table = str(tmp_path / "rollup")
    q = incremental_rollup(
        deduped,
        table_path=table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        ts_col="ts",
        window="10 seconds",
        group_cols=["etype"],
        agg_cols={"n": "count:*", "sum_id": "sum:event_id"},
        watermark=None,  # the dedup stage upstream already set it
        trigger_once=False,  # continuous micro-batches off the live source
    )
    state_samples = []  # (batch_id, total state rows across operators)
    try:
        deadline = time.monotonic() + 45
        while time.monotonic() < deadline:
            time.sleep(2)
            p = q.lastProgress
            if p and p.get("stateOperators"):
                total = sum(op["numRowsTotal"] for op in p["stateOperators"])
                state_samples.append((p["batchId"], total))
            assert q.exception() is None, q.exception()
    finally:
        q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    batches = {b for b, _ in state_samples}
    assert len(batches) >= 8, f"too few micro-batches observed: {state_samples}"
    # Bound: dedup state ~ rate * (horizon + trigger slack); rollup
    # windows add a handful of rows. 4x headroom on the horizon covers
    # micro-batch latency jitter — what matters is the ORDER: ~1e4
    # retained rows, not the ~2e4+ total rows emitted by the source
    # (state growing with total input would blow this bound within the
    # soak and keep growing after it).
    bound = rate * dedup_horizon_s * 4 + 1000
    peak = max(t for _, t in state_samples)
    assert peak <= bound, (peak, bound, state_samples)
    # eviction really ran: late samples must not keep growing — compare
    # the max of the last quarter to the overall peak
    tail = [t for _, t in state_samples[-max(2, len(state_samples) // 4):]]
    assert max(tail) <= peak * 1.25 + 1000
    # and the rollup table is real: windows present, counts plausible
    out = spark.read.parquet(table)
    assert out.where(F.col("n") > 0).count() > 0
    assert set(out.columns) >= {"__window", "etype", "n", "sum_id"}
