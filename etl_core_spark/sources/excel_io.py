"""Excel source/sink — driver-side pandas bridge.

Parity with the reference Excel components
(``src/etl_core/components/file_components/excel/read_excel.py`` →
``receivers/files/excel/excel_helper.py:110-241``). Excel has no
splittable distributed reader anywhere — the reference also reads on
one node (openpyxl/xlrd, then ``dd.from_pandas(npartitions≤8)``,
helper:133-142). Here: ``pd.read_excel`` on the driver →
``spark.createDataFrame`` via Arrow, then repartition so downstream
work is distributed. Gated behind an import-try (openpyxl may be
absent in this container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_core_spark.operators.base import OperatorConfigError, register_operator
from etl_core_spark.sources.base_io import SinkOperator, SourceOperator


def _require_pandas_excel():
    try:
        import openpyxl  # noqa: F401
        return True
    except ImportError:
        return False


@register_operator("read_excel")
class ReadExcel(SourceOperator):
    def validate_config(self) -> None:
        if "filepath" not in self.config:
            raise OperatorConfigError("read_excel requires 'filepath'")

    def read(self) -> DataFrame:
        if not _require_pandas_excel():
            raise OperatorConfigError(
                "read_excel requires openpyxl (not bundled in this container); "
                "install it or convert the workbook to CSV/parquet upstream"
            )
        import pandas as pd

        spark = self._session()
        pdf = pd.read_excel(
            str(self.config["filepath"]),
            sheet_name=self.config.get("sheet_name", 0),
            dtype=str if self.declared_schema() is None else None,
        )
        schema = self.declared_schema()
        df = spark.createDataFrame(pdf, schema) if schema is not None else spark.createDataFrame(pdf)
        return df.repartition(int(self.config.get("npartitions", 8)))


@register_operator("write_excel")
class WriteExcel(SinkOperator):
    def validate_config(self) -> None:
        if "filepath" not in self.config:
            raise OperatorConfigError("write_excel requires 'filepath'")

    def write(self, df: DataFrame) -> None:
        if not _require_pandas_excel():
            raise OperatorConfigError(
                "write_excel requires openpyxl (not bundled in this container)"
            )
        # documented driver-side collect — same single-node reality as
        # the reference's .compute()-then-write (excel_helper.py:232-241)
        df.toPandas().to_excel(
            str(self.config["filepath"]),
            sheet_name=str(self.config.get("sheet_name", "Sheet1")),
            index=False,
        )
