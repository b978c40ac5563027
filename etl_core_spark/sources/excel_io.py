"""Excel source/sink — driver-side bridge with two engines.

Parity with the reference Excel components
(``src/etl_core/components/file_components/excel/read_excel.py`` →
``receivers/files/excel/excel_helper.py:110-241``). Excel has no
splittable distributed reader anywhere — the reference also reads on
one node (openpyxl/xlrd, then ``dd.from_pandas(npartitions≤8)``,
helper:133-142). Here the driver reads/writes the workbook, then
``spark.createDataFrame`` + ``repartition`` so downstream work is
distributed.

Engines, in preference order:

- ``pandas`` (``pd.read_excel``/``to_excel``) when openpyxl is
  importable — the reference's own stack.
- ``lite`` (``xlsx_lite``, stdlib zip+XML) otherwise — always
  available, all-string read parity like ``read_csv``.

``engine`` config ("auto" default, "pandas", "lite") pins one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, register_operator
from etl_core_spark.sources import xlsx_lite
from etl_core_spark.sources.base_io import SinkOperator, SourceOperator


def _have_openpyxl() -> bool:
    try:
        import openpyxl  # noqa: F401
        return True
    except ImportError:
        return False


def _resolve_engine(config: dict) -> str:
    engine = str(config.get("engine", "auto"))
    if engine not in ("auto", "pandas", "lite"):
        raise OperatorConfigError(f"unknown excel engine {engine!r}")
    if engine == "pandas" and not _have_openpyxl():
        raise OperatorConfigError(
            "engine='pandas' requires openpyxl; use engine='lite' (stdlib) "
            "or leave engine='auto'"
        )
    if engine == "auto":
        return "pandas" if _have_openpyxl() else "lite"
    return engine


@register_operator("read_excel")
class ReadExcel(SourceOperator):
    def validate_config(self) -> None:
        if "filepath" not in self.config:
            raise OperatorConfigError("read_excel requires 'filepath'")
        _resolve_engine(self.config)

    def read(self) -> DataFrame:
        engine = _resolve_engine(self.config)
        spark = self._session()
        schema = self.declared_schema()
        npartitions = int(self.config.get("npartitions", 8))
        sheet = self.config.get("sheet_name", 0)

        if engine == "pandas":
            import pandas as pd

            pdf = pd.read_excel(
                str(self.config["filepath"]),
                sheet_name=sheet,
                dtype=str if schema is None else None,
            )
            # dtype=str keeps BLANK cells as float NaN, and
            # createDataFrame stringifies those to the literal 'nan' —
            # a real string downstream filters/joins would match.
            # Restore them to NULL (the lite engine already returns
            # None for empty cells, so the engines agree).
            pdf = pdf.where(pd.notna(pdf), None)
            df = (
                spark.createDataFrame(pdf, schema)
                if schema is not None
                else spark.createDataFrame(pdf)
            )
            return df.repartition(npartitions)

        header, rows = xlsx_lite.read_xlsx(str(self.config["filepath"]), sheet)
        if not header:
            raise OperatorConfigError(
                f"workbook sheet has no header row: {self.config['filepath']}"
            )
        # backticks in header names double-escape (the quote_ident
        # convention) or the DDL string fails to parse
        string_schema = ", ".join(
            "`{}` string".format(str(c).replace("`", "``")) for c in header
        )
        df = spark.createDataFrame(rows, schema=string_schema)
        if schema is not None:
            # all-string parse → declared types, same cast surface as read_csv
            df = df.select(
                *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
            )
        return df.repartition(npartitions)


@register_operator("write_excel")
class WriteExcel(SinkOperator):
    def validate_config(self) -> None:
        if "filepath" not in self.config:
            raise OperatorConfigError("write_excel requires 'filepath'")
        _resolve_engine(self.config)

    def write(self, df: DataFrame) -> None:
        engine = _resolve_engine(self.config)
        sheet = str(self.config.get("sheet_name", "Sheet1"))
        # documented driver-side collect — same single-node reality as
        # the reference's .compute()-then-write (excel_helper.py:232-241)
        if engine == "pandas":
            df.toPandas().to_excel(
                str(self.config["filepath"]), sheet_name=sheet, index=False
            )
            return
        header = df.columns
        rows = [[row[c] for c in header] for row in df.collect()]
        xlsx_lite.write_xlsx(str(self.config["filepath"]), header, rows, sheet)
