"""Excel bridge coverage (sources/excel_io.py + sources/xlsx_lite.py).

Two engines: ``pandas`` (openpyxl, the reference's own stack —
absent in this container, so it's exercised via monkeypatched pandas)
and ``lite`` (stdlib zip+XML), which runs the REAL file path here:
write an actual .xlsx, read it back, assert values. All-string read
parity mirrors the reference's ``pd.read_excel(dtype=str)`` reality
(``excel_helper.py:110-142``).
"""

import datetime
import zipfile
import xml.etree.ElementTree as ET

import pandas as pd
import pytest

from etl_core_spark.operators.base import OperatorConfigError
from etl_core_spark.sources import excel_io, xlsx_lite
from etl_core_spark.sources.excel_io import ReadExcel, WriteExcel


# ---------------------------------------------------------- xlsx_lite

def test_col_letter_roundtrip():
    for idx, letter in [(0, "A"), (25, "Z"), (26, "AA"), (27, "AB"), (701, "ZZ"), (702, "AAA")]:
        assert xlsx_lite.col_letter(idx) == letter
        assert xlsx_lite.col_index(f"{letter}7") == idx


def test_lite_roundtrip_types_and_escaping(tmp_path):
    path = str(tmp_path / "t.xlsx")
    header = ["s", "n", "f", "b", "none", "dt"]
    rows = [
        ["a<b&\"c'>", 5, 2.5, True, None, datetime.date(2026, 8, 14)],
        ["  padded  ", -3, float("nan"), False, None,
         datetime.datetime(2026, 8, 14, 12, 30, 5)],
        ["line1\nline2", 0, 1e18, True, None, None],
    ]
    xlsx_lite.write_xlsx(path, header, rows)
    h, out = xlsx_lite.read_xlsx(path)
    assert h == header
    assert out[0] == ["a<b&\"c'>", "5", "2.5", "True", None, "2026-08-14"]
    # xml:space="preserve" keeps padding; NaN cells are omitted → None
    assert out[1] == ["  padded  ", "-3", None, "False", None, "2026-08-14 12:30:05"]
    assert out[2][0] == "line1\nline2"
    assert out[2][1] == "0"
    assert float(out[2][2]) == 1e18


def test_lite_sheet_selection_and_errors(tmp_path):
    path = str(tmp_path / "s.xlsx")
    xlsx_lite.write_xlsx(path, ["a"], [["1"]], sheet_name="Data")
    assert xlsx_lite.read_xlsx(path, "Data")[1] == [["1"]]
    assert xlsx_lite.read_xlsx(path, 0)[1] == [["1"]]
    with pytest.raises(ValueError, match="no sheet named"):
        xlsx_lite.read_xlsx(path, "Missing")
    with pytest.raises(ValueError, match="out of range"):
        xlsx_lite.read_xlsx(path, 3)


def test_lite_reads_shared_strings_and_rich_text(tmp_path):
    """Hand-built workbook with a sharedStrings table (t="s") and
    rich-text runs — the shape openpyxl/Excel itself writes."""
    path = str(tmp_path / "shared.xlsx")
    ns = xlsx_lite.NS_MAIN
    sheet = (
        '<?xml version="1.0"?>'
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        '<?xml version="1.0"?>'
        f'<sst xmlns="{ns}" count="3" uniqueCount="3">'
        "<si><t>col1</t></si><si><t>col2</t></si>"
        "<si><r><t>rich </t></r><r><t>text</t></r></si>"
        "</sst>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", xlsx_lite._CONTENT_TYPES)
        zf.writestr("_rels/.rels", xlsx_lite._ROOT_RELS)
        zf.writestr("xl/workbook.xml", xlsx_lite._workbook_xml("Sheet1"))
        zf.writestr("xl/_rels/workbook.xml.rels", xlsx_lite._WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", shared)
    header, rows = xlsx_lite.read_xlsx(path)
    assert header == ["col1", "col2"]
    assert rows == [["rich text", "42"]]


def test_lite_sparse_rows_pad_and_unnamed_headers(tmp_path):
    path = str(tmp_path / "sparse.xlsx")
    xlsx_lite.write_xlsx(path, ["a", None, "c"], [["1"], ["1", "2", "3", "4"]])
    header, rows = xlsx_lite.read_xlsx(path)
    assert header == ["a", "Unnamed: 1", "c", "Unnamed: 3"]
    assert rows == [["1", None, None, None], ["1", "2", "3", "4"]]


def test_lite_workbook_is_valid_zip_of_xml(tmp_path):
    path = str(tmp_path / "valid.xlsx")
    xlsx_lite.write_xlsx(path, ["a"], [["x"]])
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
                "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml"} <= names
        for n in names:  # every part parses as XML
            ET.fromstring(zf.read(n))


# ----------------------------------------------------- operator: lite

def test_operator_roundtrip_real_file_lite_engine(spark, tmp_path):
    """The REAL executable path in this container: Spark df →
    write_excel (lite) → actual .xlsx on disk → read_excel (lite) →
    all-string Spark df."""
    path = str(tmp_path / "rt.xlsx")
    df = spark.createDataFrame(
        [(1, "alpha", 0.5), (2, "beta & <gamma>", -1.25), (3, None, 7.0)],
        "id long, name string, score double",
    )
    WriteExcel(filepath=path, sheet_name="Data").write(df)
    out = ReadExcel(spark=spark, filepath=path, sheet_name="Data").read()
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["string"] * 3
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        ("1", "alpha", "0.5"), ("2", "beta & <gamma>", "-1.25"), ("3", None, "7.0")
    ]


def test_operator_lite_declared_schema_casts(spark, tmp_path):
    path = str(tmp_path / "typed.xlsx")
    df = spark.createDataFrame([(1, 0.5), (2, 1.5)], "a long, b double")
    WriteExcel(filepath=path).write(df)
    schema = {
        "fields": [
            {"name": "a", "data_type": "integer"},
            {"name": "b", "data_type": "float"},
        ]
    }
    out = ReadExcel(spark=spark, filepath=path, schema=schema).read()
    assert out.schema.simpleString() == "struct<a:bigint,b:double>"
    assert sorted(tuple(r) for r in out.collect()) == [(1, 0.5), (2, 1.5)]


def test_engine_pandas_gated_when_openpyxl_absent(spark, monkeypatch):
    monkeypatch.setattr(excel_io, "_have_openpyxl", lambda: False)
    with pytest.raises(OperatorConfigError, match="openpyxl"):
        ReadExcel(spark=spark, filepath="/in.xlsx", engine="pandas")
    with pytest.raises(OperatorConfigError, match="openpyxl"):
        WriteExcel(filepath="/out.xlsx", engine="pandas")


def test_engine_auto_prefers_pandas_when_available(monkeypatch):
    monkeypatch.setattr(excel_io, "_have_openpyxl", lambda: True)
    assert excel_io._resolve_engine({}) == "pandas"
    monkeypatch.setattr(excel_io, "_have_openpyxl", lambda: False)
    assert excel_io._resolve_engine({}) == "lite"
    with pytest.raises(OperatorConfigError, match="unknown excel engine"):
        excel_io._resolve_engine({"engine": "bogus"})


def test_read_requires_filepath():
    with pytest.raises(OperatorConfigError, match="filepath"):
        ReadExcel(spark=None)


# --------------------------------------------------- operator: pandas

def test_read_all_string_parity_without_schema(spark, monkeypatch):
    monkeypatch.setattr(excel_io, "_have_openpyxl", lambda: True)
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
    monkeypatch.setattr(excel_io, "_have_openpyxl", lambda: True)
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
    monkeypatch.setattr(excel_io, "_have_openpyxl", lambda: True)
    monkeypatch.setattr(
        pd, "read_excel",
        lambda path, sheet_name, dtype: pd.DataFrame({"a": [str(i) for i in range(64)]}),
    )
    df = ReadExcel(spark=spark, filepath="/in.xlsx", npartitions=4).read()
    assert df.rdd.getNumPartitions() == 4


def test_write_single_driver_side_to_excel(spark, monkeypatch):
    monkeypatch.setattr(excel_io, "_have_openpyxl", lambda: True)
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


def test_lite_xstring_escaping_control_chars_and_lookalikes(tmp_path):
    path = str(tmp_path / "ctrl.xlsx")
    rows = [
        ["bell\x07tab\there"],        # \x07 illegal in XML, \t legal
        ["literal _x0008_ text"],      # lookalike must survive verbatim
        ["_x005F_ and _xZZZZ_"],       # escape-of-escape + non-hex noise
    ]
    xlsx_lite.write_xlsx(path, ["c"], rows)
    with zipfile.ZipFile(path) as zf:  # the part must be valid XML
        ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    _, out = xlsx_lite.read_xlsx(path)
    assert [r[0] for r in out] == [r[0] for r in rows]


def test_lite_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    texts = st.text(
        alphabet=st.characters(
            codec="utf-8",
            categories=("L", "N", "P", "S", "Z", "Cc"),
            exclude_characters="\r",  # XML normalizes \r\n -> \n on parse
        ),
        max_size=40,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.lists(texts, min_size=2, max_size=2), min_size=1, max_size=4))
    def check(rows):
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "p.xlsx")
            xlsx_lite.write_xlsx(path, ["a", "b"], rows)
            _, out = xlsx_lite.read_xlsx(path)
            assert out == rows

    check()


def test_pandas_engine_blank_cells_are_null(spark, tmp_path, monkeypatch):
    """The pandas engine (openpyxl deployments) must map blank cells
    to NULL, not the literal string 'nan' that dtype=str + NaN +
    createDataFrame produces. openpyxl is absent in this container,
    so the engine gate and pd.read_excel are faked — the code under
    test (the NaN restoration in ReadExcel.read) is real."""
    import pandas as pd

    from etl_core_spark.sources import excel_io

    monkeypatch.setattr(excel_io, "_have_openpyxl", lambda: True)
    monkeypatch.setattr(
        pd, "read_excel",
        lambda *a, **k: pd.DataFrame({"a": ["x", float("nan")], "b": ["1", "2"]}),
    )
    df = excel_io.ReadExcel(
        spark=spark, filepath=str(tmp_path / "fake.xlsx"), engine="pandas"
    ).read()
    rows = {(r["a"], r["b"]) for r in df.collect()}
    assert rows == {("x", "1"), (None, "2")}
