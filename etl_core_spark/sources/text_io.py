"""Plain-text source/sink (beyond-reference; the rawest corpus
format). Web-crawl and log corpora frequently arrive as newline-
delimited text (one document or record per line, optionally gzip'd)
or as one-file-per-document dumps; both shapes feed the training-data
pipeline directly.

Two read modes:

- line mode (default): ``spark.read.text`` — each line becomes a row
  in column ``value``. Splittable (uncompressed files split at block
  boundaries → full scan parallelism at 100 TB); gzip'd files are
  one-split-per-file, the standard Spark behavior.
- ``wholetext=True``: one row PER FILE (the one-file-per-document
  corpus shape). Not splittable by design — parallelism comes from
  the file count, which is exactly how such corpora are laid out.

The sink writes a single string column as newline-delimited text
(``lineSep`` configurable); ``single_file`` gives the byte-exact
one-file parity mode the CSV sink also offers, and stays False at
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, register_operator
from etl_core_spark.sources.base_io import (
    SinkOperator,
    SourceOperator,
    resize_partitions,
)


@register_operator("read_text")
class ReadText(SourceOperator):
    def validate_config(self) -> None:
        if "filepath" not in self.config:
            raise OperatorConfigError("read_text requires 'filepath'")

    def read(self) -> DataFrame:
        spark = self._session()
        # NB: options go through the text() kwargs, NOT .option() —
        # DataFrameReader.text's Python signature defaults
        # wholetext=False and unconditionally re-sets it, silently
        # clobbering a previously .option()-set value
        kwargs: dict = {"wholetext": bool(self.config.get("wholetext"))}
        if self.config.get("line_sep"):
            kwargs["lineSep"] = str(self.config["line_sep"])
        if self.config.get("path_glob"):
            kwargs["pathGlobFilter"] = str(self.config["path_glob"])
        if self.config.get("recursive"):
            kwargs["recursiveFileLookup"] = True
        df = spark.read.text(str(self.config["filepath"]), **kwargs)
        if self.config.get("with_file_name"):
            # provenance column for wholetext corpora: which file a
            # document came from (metadata column — no extra I/O)
            df = df.select(
                F.col("_metadata.file_path").alias("file_path"), "value"
            )
        return df


@register_operator("write_text")
class WriteText(SinkOperator):
    def validate_config(self) -> None:
        if "filepath" not in self.config:
            raise OperatorConfigError("write_text requires 'filepath'")

    def write(self, df: DataFrame) -> None:
        cols = df.columns
        value_col = self.config.get("column")
        if value_col is None:
            if len(cols) != 1:
                raise OperatorConfigError(
                    "write_text needs a single string column or an "
                    f"explicit 'column'; input has {cols}"
                )
            value_col = cols[0]
        elif value_col not in cols:
            raise OperatorConfigError(
                f"write_text column {value_col!r} not in input {cols}"
            )
        out = df.select(F.col(value_col).cast("string").alias("value"))
        if self.config.get("single_file"):
            out = out.coalesce(1)
        elif self.config.get("num_files"):
            out = resize_partitions(out, int(self.config["num_files"]))
        writer = out.write.mode(self.config.get("mode", "overwrite"))
        if self.config.get("line_sep"):
            writer = writer.option("lineSep", str(self.config["line_sep"]))
        if self.config.get("compression"):
            writer = writer.option("compression", self.config["compression"])
        writer.text(str(self.config["filepath"]))
