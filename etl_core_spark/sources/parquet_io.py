"""Parquet source/sink (beyond-reference; the scale-native format).

The reference has no columnar format at all — parquet is the first
thing a 100 TB deployment needs: column pruning + predicate pushdown
+ splittable compressed storage. Sinks support partitioning and
bucketing so downstream joins co-locate without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

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
    def validate_config(self) -> None:
        if "filepath" not in self.config:
            raise OperatorConfigError("write_parquet requires 'filepath'")

    def write(self, df: DataFrame) -> None:
        writer = df.write.mode(self.config.get("mode", "overwrite"))
        if self.config.get("partition_by"):
            writer = writer.partitionBy(*self.config["partition_by"])
        if self.config.get("compression"):
            writer = writer.option("compression", self.config["compression"])
        writer.parquet(str(self.config["filepath"]))
