"""Bucketed-table sink/source (beyond-reference; the shuffle-free
co-located join path).

`bucketBy(n, key)` + `saveAsTable` hash-partitions files by key at
write time; two tables bucketed the same way join WITHOUT an
exchange on either side — at 100 TB this converts the recurring
fact⋈fact shuffle into a one-time write-side cost. Requires a
warehouse (metastore-backed table identifiers, not paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_core_spark.operators.base import OperatorConfigError, register_operator
from etl_core_spark.sources.base_io import SinkOperator, SourceOperator


@register_operator("write_bucketed")
class WriteBucketed(SinkOperator):
    """Config: ``table`` (metastore identifier), ``bucket_by``
    (key columns), ``num_buckets``, optional ``sort_by``."""

    def validate_config(self) -> None:
        for key in ("table", "bucket_by"):
            if not self.config.get(key):
                raise OperatorConfigError(f"write_bucketed requires {key!r}")
        self.num_buckets = int(self.config.get("num_buckets", 32))
        if self.num_buckets <= 0:
            raise OperatorConfigError("num_buckets must be positive")

    def write(self, df: DataFrame) -> None:
        spec = self.config["bucket_by"]
        # a bare string must mean ONE column, not its characters
        cols = [spec] if isinstance(spec, str) else list(spec)
        writer = (
            df.write.mode(self.config.get("mode", "overwrite"))
            .format(self.config.get("format", "parquet"))
            .bucketBy(self.num_buckets, *cols)
        )
        if self.config.get("sort_by"):
            writer = writer.sortBy(*self.config["sort_by"])
        writer.saveAsTable(self.config["table"])


@register_operator("read_table")
class ReadTable(SourceOperator):
    """Read a saved (possibly bucketed) table by identifier."""

    def validate_config(self) -> None:
        if not self.config.get("table"):
            raise OperatorConfigError("read_table requires 'table'")

    def read(self) -> DataFrame:
        return self._session().table(self.config["table"])
