"""SparkSession factory tuned for this engine.

Local mode is a single JVM; on a real cluster the same conf applies
per-executor. All scale-sensitive knobs (AQE, adaptive skew join,
shuffle partition sizing, Arrow) are on by default so plans built by
this engine survive a 100 TB / 1000-executor deployment without
code changes: AQE coalesces small shuffle partitions at low SF and
splits skewed ones at high SF.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


#: Spark's bundled RocksDB streaming state store (Spark 3.2+)
ROCKSDB_STATE_STORE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def get_spark(
    app_name: str = "etl_core_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
    use_rocksdb_state_store: bool | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    Defaults matter at scale:

    - AQE (+ skew-join splitting + small-partition coalescing) lets a
      statically-built plan re-shape itself to the actual data volume,
      which is what makes one plan work at sf0.001 and at 100 TB.
    - ``spark.sql.shuffle.partitions`` is only the *initial* number;
      AQE coalesces. On a cluster it should be ~2-3× total cores.
    - Arrow makes the Pandas-UDF slow paths (Excel bridge, multimodal
      decode) batch-columnar instead of row-pickled.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    if use_rocksdb_state_store or (
        use_rocksdb_state_store is None
        and os.environ.get("SPARK_GRAFT_ROCKSDB_STATE") == "1"
    ):
        # Streaming state off-heap: the default HDFSBackedStateStore
        # keeps every key's state in executor JVM heap — fine for the
        # bounded watermarked states this engine builds, but a large
        # keyspace (per-user sessions over 100 TB of events) wants
        # RocksDB's disk-spilling store. Ships inside Spark 3.2+; no
        # extra jars.
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            ROCKSDB_STATE_STORE_PROVIDER,
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    # Deployment-time overrides without code edits (cluster sizing,
    # shuffle codec, AQE thresholds): semicolon-separated k=v pairs,
    # applied LAST so they win over engine defaults and caller
    # extra_conf. Empty/unset = no-op, so local behavior and the
    # bench driver contract are unchanged.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in env_conf.split(";"):
        pair = pair.strip()
        if pair and "=" in pair:
            k, _, v = pair.partition("=")
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


#: operator-internal persisted DataFrames, oldest first (see
#: ``persist_intermediate``). Process-local, driver-side only.
_CACHED_INTERMEDIATES: list = []
_MAX_CACHED_INTERMEDIATES = 8
_CACHE_LOCK = threading.Lock()


def persist_intermediate(df):
    """``df.persist()`` with a release path.

    Operators persist intermediates consumed several times within one
    plan (MinHash shingle tables, winnowing exploded fingerprints). A
    bare ``.persist()`` has no owner: in a long-lived session (the
    HTTP API server) repeated jobs accumulate cached partitions until
    executor eviction. This wrapper tracks every such persist in a
    bounded FIFO — once more than ``_MAX_CACHED_INTERMEDIATES`` are
    alive the oldest is unpersisted automatically, and
    ``release_intermediates()`` drops them all (tests/servers call it
    after the consuming action). Unpersisting is always
    correctness-safe: any plan still referencing the DataFrame simply
    recomputes it from lineage.
    """
    df.persist()
    evicted = []
    with _CACHE_LOCK:
        _CACHED_INTERMEDIATES.append(df)
        while len(_CACHED_INTERMEDIATES) > _MAX_CACHED_INTERMEDIATES:
            evicted.append(_CACHED_INTERMEDIATES.pop(0))
    for old in evicted:
        try:
            old.unpersist()
        except Exception:
            pass  # session may already be gone
    return df


def release_local_checkpoint(df) -> None:
    """Free the executor blocks behind a ``localCheckpoint``-ed
    DataFrame NOW instead of at JVM garbage-collection time.

    ``DataFrame.unpersist`` only talks to the cache manager; the
    checkpoint's materialized RDD (persisted MEMORY_AND_DISK by
    ``localCheckpoint``) stays pinned until the JVM object happens to
    be collected. In an iterative operator (``connected_components``
    runs O(log n) rounds, each checkpointing the full edge relation)
    that lag pins rounds × |edges| of executor storage on a
    long-lived driver. The checkpointed plan is a ``LogicalRDD``;
    unpersisting its RDD releases the blocks immediately. Only call
    on checkpoints nothing references anymore: a local checkpoint has
    NO lineage, so a released one cannot be recomputed.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # non-LogicalRDD plan or session already gone


class _LocalCheckpointHandle:
    """Duck-types ``unpersist`` so the release bookkeeping can free
    checkpoint blocks the same way it frees plan caches."""

    def __init__(self, df):
        self._df = df

    def unpersist(self):
        self._df.unpersist()
        release_local_checkpoint(self._df)


#: checkpoints still referenced by a returned result — released ONLY
#: by ``release_intermediates()`` (no FIFO eviction: a released local
#: checkpoint cannot be recomputed, so evicting one under load would
#: corrupt a still-running plan, unlike the always-safe persist FIFO)
_TRACKED_CHECKPOINTS: list = []


def track_local_checkpoint(df):
    """Register a ``localCheckpoint``-ed DataFrame whose blocks back a
    returned result, so ``release_intermediates()`` frees them once
    the consuming action is done. Returns ``df``."""
    with _CACHE_LOCK:
        _TRACKED_CHECKPOINTS.append(_LocalCheckpointHandle(df))
    return df


def release_intermediates() -> int:
    """Unpersist every tracked operator intermediate; returns how many
    were released. Call after the consuming action (end of a job, a
    test, or an API request) to leave zero cached partitions behind.
    Thread-safe: the threaded HTTP API server can run jobs
    concurrently, and an unlocked check-then-pop raced (unpersist is
    always correctness-safe — consumers recompute from lineage)."""
    n = 0
    while True:
        with _CACHE_LOCK:
            if _CACHED_INTERMEDIATES:
                df = _CACHED_INTERMEDIATES.pop()
            elif _TRACKED_CHECKPOINTS:
                df = _TRACKED_CHECKPOINTS.pop()
            else:
                break
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def ensure_parallelism(
    df,
    target: int | None = None,
    approx_rows: int | None = None,
    min_rows_per_partition: int = 16,
    min_bytes_per_partition: int = 8 * 1024,
):
    """Size partitions to the actual work, within ``target`` (cores).

    Parquet splits by bytes (`maxPartitionBytes`), so a small file
    arrives as ONE partition — fine for scan-bound queries, but a
    CPU-bound narrow map (shingling, hashing, vector math, Pandas
    UDFs) then runs on one core. The inverse failure also exists: a
    tiny local DataFrame arrives pre-sliced to defaultParallelism, and
    64 rows fanned to 32 Python workers pay 32× the Arrow/worker
    fixed cost. This helper caps the partition count by the estimated
    input volume (row count when known — via ``approx_rows`` or plan
    stats — else optimizer ``sizeInBytes``; the per-partition floor is
    deliberately small because CPU cost per byte is enormous for
    shingling/hashing) and then repartitions up or coalesces down.
    At 100 TB both estimates exceed ``target`` and this is a no-op.
    """
    from pyspark.sql import DataFrame

    assert isinstance(df, DataFrame)
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    cap = target
    rows = approx_rows
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        if rows is None and stats.rowCount().isDefined():
            rows = int(str(stats.rowCount().get()))
        if rows is not None:
            cap = min(cap, max(1, -(-rows // min_rows_per_partition)))
        else:
            size = int(str(stats.sizeInBytes()))
            # Long.MaxValue / huge sentinels mean "unknown". The
            # unknown case is (in this engine) always a LogicalRDD
            # from createDataFrame; a limit-count probe there costs a
            # Python-worker round-trip per partition (measured ~1-2 s
            # for 64 rows — more than the fan-out it would prevent),
            # so callers with local data pass approx_rows or pre-size
            # the DataFrame instead (synthetic_media does).
            if 0 <= size < (1 << 60):
                cap = min(cap, max(1, -(-size // min_bytes_per_partition)))
    except Exception:
        pass  # stats unavailable — fall back to core count
    current = df.rdd.getNumPartitions()
    if current < cap:
        return df.repartition(cap)
    if current > 2 * cap and cap < target:
        return df.coalesce(cap)
    return df


def estimated_size_bytes(df) -> int | None:
    """Optimizer size estimate for a relation, or None when unknown
    (LogicalRDD from createDataFrame, huge sentinel values, any
    introspection failure). The SINGLE source of truth for every
    stats-gated broadcast decision in the engine — keep the policy in
    one place so a cap or API change cannot diverge the gates."""
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        # Spark's "unknown" is defaultSizeInBytes = Long.MaxValue —
        # that sentinel must surface as None, not a 9-EB estimate
        return size if 0 <= size < (1 << 60) else None
    except Exception:  # noqa: BLE001 - introspection is best-effort
        return None


def maybe_broadcast(df, force: bool | None, cap_bytes: int = 8 << 20):
    """Stats-gated broadcast hint: ``True`` forces, ``False`` never,
    ``None`` hints only when the optimizer BOUNDS the relation under
    ``cap_bytes``. Spark hard-caps broadcasts at 8 GB and an explicit
    hint bypasses autoBroadcastJoinThreshold, so an unconditional hint
    on an unbounded relation is an OOM promise at scale."""
    from pyspark.sql import functions as F

    if force is False:
        return df
    if force is None:
        size = estimated_size_bytes(df)
        if size is None or size > cap_bytes:
            return df
    return F.broadcast(df)
