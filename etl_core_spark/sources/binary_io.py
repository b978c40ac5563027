"""Binary-file source/sink — the multimodal ingest path.

Image/audio/video corpora arrive as directories of opaque files; the
engine's multimodal contract (operators/multimodal.py) is "binary
column + typed metadata". ``spark.read.format("binaryFile")`` is the
native bridge: each file becomes one row of
``(path, modificationTime, length, content)`` with the bytes read
executor-side (never through the driver), ``pathGlobFilter`` prunes
by extension BEFORE any I/O, and parallelism comes from the file
count — the correct scale shape for million-file corpora.

Contract note: the binaryFile source SKIPS zero-length files during
partition planning (pinned in tests/test_text_binary_sources.py) —
a corpus where "empty artifact" is meaningful must encode it as a
sentinel payload, not an empty file.

The sink is the inverse (exporting per-document artifacts — shards,
rendered samples): each row's binary column is written to
``<dir>/<name>`` from the executor that owns the row, so the write
is distributed and the driver never sees the payload bytes. Executor
Python writes through the local filesystem API; on an object store
deployment the same shape holds with the store's client library in
place of ``open()`` (documented deployment note, same class as the
JDBC drivers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, register_operator
from etl_core_spark.sources.base_io import SinkOperator, SourceOperator

BINARY_FILE_COLUMNS = ("path", "modificationTime", "length", "content")


@register_operator("read_binary_files")
class ReadBinaryFiles(SourceOperator):
    def validate_config(self) -> None:
        if "filepath" not in self.config:
            raise OperatorConfigError("read_binary_files requires 'filepath'")

    def read(self) -> DataFrame:
        spark = self._session()
        reader = spark.read.format("binaryFile")
        if self.config.get("path_glob"):
            reader = reader.option(
                "pathGlobFilter", str(self.config["path_glob"])
            )
        if self.config.get("recursive"):
            reader = reader.option("recursiveFileLookup", "true")
        df = reader.load(str(self.config["filepath"]))
        if self.config.get("file_name_only"):
            # strip the scheme+directory so downstream joins key on the
            # stable artifact name, not the deployment-specific prefix
            df = df.withColumn(
                "file_name",
                F.element_at(F.split(F.col("path"), "/"), -1),
            )
        return df


def write_binary_files(
    df: DataFrame,
    directory: str,
    name_col: str = "file_name",
    content_col: str = "content",
) -> int:
    """Write each row's ``content_col`` bytes to
    ``directory/<name_col>`` from the executors (driver never holds
    payloads). Returns the number of files written. Names must be
    relative (no ``/`` traversal) and unique — duplicates raise
    rather than silently last-write-wins."""
    import os

    for c in (name_col, content_col):
        if c not in df.columns:
            raise OperatorConfigError(
                f"write_binary_files: column {c!r} not in input {df.columns}"
            )
    os.makedirs(directory, exist_ok=True)
    dup = (
        df.groupBy(name_col).count().where(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise OperatorConfigError(
            "write_binary_files: duplicate file names in input"
        )

    target = str(directory)

    def _write_partition(rows):
        # yields the per-partition file count so the job's single pass
        # both writes and counts — a separate df.count() would re-read
        # every binary payload (full lineage re-evaluation) and could
        # disagree with the files actually written for a
        # non-deterministic upstream
        n = 0
        for row in rows:
            name = row[0]
            payload = row[1]
            if name is None or payload is None:
                raise ValueError(
                    "write_binary_files: NULL file name or content"
                )
            name = str(name)
            if name.startswith("/") or ".." in name.split("/"):
                raise ValueError(
                    f"write_binary_files: unsafe file name {name!r}"
                )
            full = os.path.join(target, name)
            parent = os.path.dirname(full)
            if parent:
                os.makedirs(parent, exist_ok=True)
            with open(full, "wb") as fh:
                fh.write(bytes(payload))
            n += 1
        yield n

    out = df.select(F.col(name_col), F.col(content_col))
    return out.rdd.mapPartitions(_write_partition).sum()


@register_operator("write_binary_files")
class WriteBinaryFiles(SinkOperator):
    def validate_config(self) -> None:
        if "filepath" not in self.config:
            raise OperatorConfigError("write_binary_files requires 'filepath'")

    def write(self, df: DataFrame) -> None:
        write_binary_files(
            df,
            str(self.config["filepath"]),
            name_col=self.config.get("name_column", "file_name"),
            content_col=self.config.get("content_column", "content"),
        )
