"""Excel bridge coverage (sources/excel_io.py).

openpyxl is absent in this container, so the real file path can't
run; what CAN and MUST be tested is (a) the gating error fires with
an actionable message, and (b) the schema/dtype plumbing around the
driver-side pandas bridge — ``dtype=str`` all-string parity when no
schema is declared (the reference's ``pd.read_excel`` reality,
``excel_helper.py:110-142``), declared schema winning otherwise, and
the sink collecting to a single driver-side ``to_excel`` call with
the configured sheet name.
"""

import pandas as pd
import pytest

from etl_core_spark.operators.base import OperatorConfigError
from etl_core_spark.sources import excel_io
from etl_core_spark.sources.excel_io import ReadExcel, WriteExcel


def test_read_gating_error_without_openpyxl(spark, monkeypatch):
    monkeypatch.setattr(excel_io, "_require_pandas_excel", lambda: False)
    op = ReadExcel(spark=spark, filepath="/nonexistent.xlsx")
    with pytest.raises(OperatorConfigError, match="openpyxl"):
        op.read()


def test_write_gating_error_without_openpyxl(spark, monkeypatch):
    monkeypatch.setattr(excel_io, "_require_pandas_excel", lambda: False)
    op = WriteExcel(filepath="/nonexistent.xlsx")
    with pytest.raises(OperatorConfigError, match="openpyxl"):
        op.write(spark.range(1))


def test_read_requires_filepath():
    with pytest.raises(OperatorConfigError, match="filepath"):
        ReadExcel(spark=None)


def test_read_all_string_parity_without_schema(spark, monkeypatch):
    monkeypatch.setattr(excel_io, "_require_pandas_excel", lambda: True)
    seen = {}

    def fake_read_excel(path, sheet_name, dtype):
        seen.update(path=path, sheet_name=sheet_name, dtype=dtype)
        return pd.DataFrame({"a": ["1", "2"], "b": ["x", "y"]})

    monkeypatch.setattr(pd, "read_excel", fake_read_excel)
    df = ReadExcel(spark=spark, filepath="/in.xlsx", sheet_name="S2").read()
    # no declared schema → dtype=str (reference all-string parity)
    assert seen == {"path": "/in.xlsx", "sheet_name": "S2", "dtype": str}
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "string"
    ]
    assert df.count() == 2


def test_read_declared_schema_wins(spark, monkeypatch):
    monkeypatch.setattr(excel_io, "_require_pandas_excel", lambda: True)
    monkeypatch.setattr(
        pd, "read_excel",
        lambda path, sheet_name, dtype: pd.DataFrame({"a": [1, 2], "b": [0.5, 1.5]}),
    )
    schema = {
        "fields": [
            {"name": "a", "data_type": "integer"},
            {"name": "b", "data_type": "float"},
        ]
    }
    df = ReadExcel(spark=spark, filepath="/in.xlsx", schema=schema).read()
    assert df.schema.simpleString() == "struct<a:bigint,b:double>"
    assert sorted(tuple(r) for r in df.collect()) == [(1, 0.5), (2, 1.5)]


def test_read_repartitions_for_downstream_parallelism(spark, monkeypatch):
    monkeypatch.setattr(excel_io, "_require_pandas_excel", lambda: True)
    monkeypatch.setattr(
        pd, "read_excel",
        lambda path, sheet_name, dtype: pd.DataFrame({"a": [str(i) for i in range(64)]}),
    )
    df = ReadExcel(spark=spark, filepath="/in.xlsx", npartitions=4).read()
    assert df.rdd.getNumPartitions() == 4


def test_write_single_driver_side_to_excel(spark, monkeypatch):
    monkeypatch.setattr(excel_io, "_require_pandas_excel", lambda: True)
    calls = []

    def fake_to_excel(self, path, sheet_name, index):
        calls.append(
            {"rows": len(self), "path": path, "sheet": sheet_name, "index": index}
        )

    monkeypatch.setattr(pd.DataFrame, "to_excel", fake_to_excel)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    WriteExcel(filepath="/out.xlsx", sheet_name="Data").write(df)
    assert calls == [
        {"rows": 2, "path": "/out.xlsx", "sheet": "Data", "index": False}
    ]
