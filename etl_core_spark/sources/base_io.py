"""Shared source/sink operator bases."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from etl_core_spark.operators.base import Operator, OperatorConfigError, PortMap
from etl_core_spark.schema import Schema


class SourceOperator(Operator):
    """No in-ports; produces one `out` DataFrame lazily."""

    in_ports: tuple[str, ...] = ()
    out_ports = ("out",)

    def __init__(self, spark: Optional[SparkSession] = None, **config) -> None:
        self.spark = spark
        super().__init__(**config)

    def _session(self) -> SparkSession:
        if self.spark is not None:
            return self.spark
        active = SparkSession.getActiveSession()
        if active is None:
            raise OperatorConfigError("no active SparkSession for source")
        return active

    def declared_schema(self):
        s = self.config.get("schema")
        if s is None:
            return None
        if isinstance(s, Schema):
            return s.to_struct_type()
        return Schema.from_dict(s).to_struct_type()

    def apply(self, inputs: PortMap) -> PortMap:
        if inputs:
            raise OperatorConfigError("source takes no inputs")
        return {"out": self.read()}

    def read(self) -> DataFrame:  # pragma: no cover - abstract
        raise NotImplementedError


class SinkOperator(Operator):
    """One in-port; `apply` returns the input unchanged (for chaining
    / metrics) and `write` performs the terminal action."""

    in_ports = ("in",)
    out_ports = ("out",)

    def apply(self, inputs: PortMap) -> PortMap:
        df = self.single_input(inputs)
        self.write(df)
        return {"out": df}

    def write(self, df: DataFrame):  # pragma: no cover - abstract
        """Terminal action. MUST finish with a SQL (DataFrame)
        action, never a bare RDD action: the runner and builder ride
        ``df.observe`` row counters on the plan, and an RDD action
        (``foreachPartition``) never fires the
        QueryExecutionListener, starving every upstream
        ``Observation.get`` forever. Per-partition imperative writes
        (DML, bulk wire protocols) go through ``run_partition_dml``.
        May return a row count; the runner prefers it over the sink
        observation when present."""
        raise NotImplementedError


def resize_partitions(df: DataFrame, n: int) -> DataFrame:
    """coalesce/repartition to exactly ``n`` output partitions;
    n == current skips the pure-cost same-layout shuffle."""
    n = max(1, int(n))
    current = df.rdd.getNumPartitions() or 1
    if n < current:
        return df.coalesce(n)
    if n > current:
        return df.repartition(n)
    return df


def plain_columnar_write(df: DataFrame, config: dict, fmt: str) -> None:
    """The shared sink tail for plain columnar formats (orc, and the
    no-sort path of parquet): optional ``num_files`` resize, write
    ``mode``, ``partition_by``, ``compression``. One implementation so
    sink knobs cannot drift between formats."""
    if config.get("num_files"):
        df = resize_partitions(df, int(config["num_files"]))
    writer = df.write.mode(config.get("mode", "overwrite"))
    if config.get("partition_by"):
        writer = writer.partitionBy(*config["partition_by"])
    if config.get("compression"):
        writer = writer.option("compression", config["compression"])
    writer.format(fmt).save(str(config["filepath"]))


def run_partition_dml(df: DataFrame, fn) -> None:
    """Execute ``fn(list_of_row_dicts)`` once per partition INSIDE a
    SQL action (``mapInArrow`` + noop write) instead of a bare RDD
    ``foreachPartition``.

    Load-bearing, not cosmetic: the runner and builder attach
    ``df.observe`` row counters to every live plan, and observations
    complete ONLY when a SQL (DataFrame) action finishes — an RDD
    action never fires the QueryExecutionListener, so every upstream
    ``Observation.get`` blocks forever (found live by
    ``tests/test_pg_live.py``'s runner job). Arrow also preserves
    nullable integers exactly, where a pandas hop would coerce them
    to float64/NaN and corrupt DML values.
    """
    import pyarrow as pa

    def gen(batches):
        rows: list[dict] = []
        for b in batches:
            rows.extend(b.to_pylist())
        if rows:
            fn(rows)
        yield pa.RecordBatch.from_pylist(
            [{"rows_written": len(rows)}],
            schema=pa.schema([("rows_written", pa.int64())]),
        )

    (
        df.mapInArrow(gen, "rows_written bigint")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
