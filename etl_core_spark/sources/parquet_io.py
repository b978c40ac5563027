"""Parquet source/sink (beyond-reference; the scale-native format).

The reference has no columnar format at all — parquet is the first
thing a 100 TB deployment needs: column pruning + predicate pushdown
+ splittable compressed storage. Sinks support partitioning and
bucketing so downstream joins co-locate without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, register_operator
from etl_core_spark.sources.base_io import SinkOperator, SourceOperator


@register_operator("read_parquet")
class ReadParquet(SourceOperator):
    def validate_config(self) -> None:
        if "filepath" not in self.config:
            raise OperatorConfigError("read_parquet requires 'filepath'")

    def read(self) -> DataFrame:
        spark = self._session()
        reader = spark.read
        schema = self.declared_schema()
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(str(self.config["filepath"]))


@register_operator("write_parquet")
class WriteParquet(SinkOperator):
    """Parquet sink with write-time LAYOUT control — the knobs that
    decide whether a 100 TB table is queryable:

    - ``num_files``: exact output file count (overrides
      ``target_file_mb``; also pins the range partitioner past AQE's
      small-data coalescing, which is what you want for a
      deterministic layout).
    - ``target_file_mb``: compaction. Uncontrolled parallelism writes
      one file per task; 32 tasks x 10k jobs = millions of tiny files
      and a listing/footer storm on every read. The sink sizes the
      file count from the optimizer's byte estimate of THIS plan
      (``ceil(bytes / target)``), so output files land near the
      target regardless of upstream partitioning.
    - ``sort_by``: range-partition + sort within partitions on the
      given columns → tight per-file min/max on the leading column
      (row-group skipping for filters on it).
    - ``zorder_by``: Morton-interleaved multi-column clustering
      (functions/layout.py) → every listed column gets usable
      min/max locality, at the cost of none being perfectly tight.

    ``sort_by``/``zorder_by`` imply a range shuffle; combined with
    ``target_file_mb`` the range partitioner uses the computed count.
    """

    def validate_config(self) -> None:
        if "filepath" not in self.config:
            raise OperatorConfigError("write_parquet requires 'filepath'")
        if self.config.get("sort_by") and self.config.get("zorder_by"):
            raise OperatorConfigError("sort_by and zorder_by are exclusive")

    def _target_partitions(self, df: DataFrame) -> int | None:
        if self.config.get("num_files"):
            return max(1, int(self.config["num_files"]))
        tmb = self.config.get("target_file_mb")
        if not tmb:
            return None
        try:
            size = int(
                str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            )
        except Exception:
            return None
        if size <= 0:
            return 1
        return max(1, -(-size // (int(tmb) << 20)))

    def write(self, df: DataFrame) -> None:
        n = self._target_partitions(df)
        sort_by = list(self.config.get("sort_by") or [])
        zorder_by = list(self.config.get("zorder_by") or [])
        drop_z = False
        if zorder_by:
            from etl_core_spark.functions.layout import zvalue

            df = zvalue(df, zorder_by, str(self.config.get("zorder_method", "range")))
            sort_by = ["__z"]
            drop_z = True
        if sort_by:
            cols = [F.col(c) for c in sort_by]
            df = (
                df.repartitionByRange(n, *cols) if n else df.repartitionByRange(*cols)
            ).sortWithinPartitions(*cols)
            if drop_z:
                df = df.drop("__z")
        elif n:
            current = df.rdd.getNumPartitions() or 1
            if n < current:
                df = df.coalesce(n)
            elif n > current:
                df = df.repartition(n)
            # n == current: a repartition here would be a pure-cost
            # full shuffle to the same layout
        writer = df.write.mode(self.config.get("mode", "overwrite"))
        if self.config.get("partition_by"):
            writer = writer.partitionBy(*self.config["partition_by"])
        if self.config.get("compression"):
            writer = writer.option("compression", self.config["compression"])
        writer.parquet(str(self.config["filepath"]))
