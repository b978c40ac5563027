"""read_text/write_text and read_binary_files/write_binary_files
(sources/text_io.py, binary_io.py)."""

import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, get_operator


def test_text_line_roundtrip(spark, tmp_path):
    out = str(tmp_path / "lines")
    df = spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], ["v"])
    get_operator("write_text")(filepath=out).apply({"in": df})
    back = get_operator("read_text")(spark=spark, filepath=out).read()
    assert back.columns == ["value"]
    assert sorted(r.value for r in back.collect()) == ["alpha", "beta", "gamma"]


def test_text_write_column_selection_and_validation(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    out = str(tmp_path / "sel")
    # two columns, no explicit 'column' -> reject rather than guess
    with pytest.raises(OperatorConfigError, match="single string column"):
        get_operator("write_text")(filepath=out).apply({"in": df})
    with pytest.raises(OperatorConfigError, match="not in input"):
        get_operator("write_text")(filepath=out, column="zzz").apply({"in": df})
    get_operator("write_text")(filepath=out, column="v").apply({"in": df})
    back = get_operator("read_text")(spark=spark, filepath=out).read()
    assert sorted(r.value for r in back.collect()) == ["a", "b"]


def test_text_wholetext_one_row_per_file(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("first doc\nwith two lines")
    (d / "b.txt").write_text("second doc")
    back = get_operator("read_text")(
        spark=spark, filepath=str(d), wholetext=True, with_file_name=True
    ).read()
    rows = {r.file_path.rsplit("/", 1)[-1]: r.value for r in back.collect()}
    assert rows == {
        "a.txt": "first doc\nwith two lines",
        "b.txt": "second doc",
    }


def test_text_custom_line_sep(spark, tmp_path):
    out = str(tmp_path / "sep")
    df = spark.createDataFrame([("x",), ("y",)], ["v"])
    get_operator("write_text")(
        filepath=out, column="v", line_sep="\x1f", single_file=True
    ).apply({"in": df})
    back = get_operator("read_text")(
        spark=spark, filepath=out, line_sep="\x1f"
    ).read()
    # trailing separator yields a final empty record; content rows intact
    vals = [r.value for r in back.collect()]
    assert sorted(v for v in vals if v) == ["x", "y"]


def _payload_df(spark, names_payloads):
    return spark.createDataFrame(
        [(n, bytearray(p)) for n, p in names_payloads],
        "file_name string, content binary",
    )


def test_binary_roundtrip_bytes_exact(spark, tmp_path):
    out = str(tmp_path / "bin")
    raw = bytes([0, 1, 255]) + b"abc"
    payloads = [("a.bin", raw), ("b.bin", b""), ("c.dat", b"zz")]
    df = _payload_df(spark, payloads)
    get_operator("write_binary_files")(filepath=out).apply({"in": df})
    back = get_operator("read_binary_files")(
        spark=spark, filepath=out, path_glob="*.bin", file_name_only=True
    ).read()
    got = {r.file_name: bytes(r.content) for r in back.collect()}
    # glob pruned c.dat before any read I/O; b.bin was WRITTEN but the
    # binaryFile source skips zero-length files during partition
    # planning (pinned here — binary_io.py documents the contract)
    import os

    assert os.path.getsize(os.path.join(out, "b.bin")) == 0
    assert got == {"a.bin": raw}
    lengths = {r.file_name: r.length for r in back.collect()}
    assert lengths == {"a.bin": 6}


def test_binary_write_rejects_duplicates_and_traversal(spark, tmp_path):
    out = str(tmp_path / "dup")
    dup = _payload_df(spark, [("x.bin", b"1"), ("x.bin", b"2")])
    with pytest.raises(OperatorConfigError, match="duplicate"):
        get_operator("write_binary_files")(filepath=out).apply({"in": dup})
    evil = _payload_df(spark, [("../escape.bin", b"1")])
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception), match="unsafe|escape"):
        get_operator("write_binary_files")(filepath=out).apply({"in": evil})
    import os

    assert not os.path.exists(str(tmp_path / "escape.bin"))


def test_binary_write_subdirectories(spark, tmp_path):
    out = str(tmp_path / "nested")
    df = _payload_df(spark, [("shard=0/a.bin", b"aa"), ("shard=1/b.bin", b"bb")])
    get_operator("write_binary_files")(filepath=out).apply({"in": df})
    back = get_operator("read_binary_files")(
        spark=spark, filepath=out, recursive=True
    ).read()
    assert back.count() == 2
    assert {bytes(r.content) for r in back.collect()} == {b"aa", b"bb"}


def test_binary_read_requires_filepath():
    with pytest.raises(OperatorConfigError):
        get_operator("read_binary_files")()
    with pytest.raises(OperatorConfigError):
        get_operator("write_binary_files")()


def test_export_shards_manifest_and_determinism(spark, tmp_path):
    from etl_core_spark.operators.base import get_operator
    from etl_core_spark.sources.export_io import (
        export_shards,
        read_manifest,
        verify_export,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    out = str(tmp_path / "export")
    m = export_shards(df, out, "doc_id", n_shards=8)
    assert m["total_rows"] == 200
    assert len(m["shards"]) == 8
    assert sum(s["rows"] for s in m["shards"]) == 200
    # manifest on disk matches the returned dict
    assert read_manifest(spark, out) == m
    # shard membership is deterministic: re-export under a different
    # physical layout gives identical counts AND fingerprints
    out2 = str(tmp_path / "export2")
    m2 = export_shards(df.repartition(13), out2, "doc_id", n_shards=8)
    assert [s["rows"] for s in m2["shards"]] == [s["rows"] for s in m["shards"]]
    assert [s["fingerprint"] for s in m2["shards"]] == [
        s["fingerprint"] for s in m["shards"]
    ]
    # end-to-end verification recomputes from data and agrees
    assert set(verify_export(spark, out).values()) == {"ok"}
    # reading the export back yields the corpus with its shard column
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.select("shard").distinct().count() == 8
    # registry surface + validation
    with pytest.raises(OperatorConfigError):
        get_operator("export_shards")(filepath=out)


def test_export_shards_detects_tamper(spark, tmp_path):
    """verify_export must flag a shard whose content changed —
    the integrity contract trainers rely on."""
    import json as _json
    import os

    from etl_core_spark.sources.export_io import export_shards, verify_export

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    out = str(tmp_path / "exp")
    m = export_shards(df, out, "doc_id", n_shards=4)
    # tamper: doctor one shard's manifest fingerprint (rewrite via
    # the Hadoop FS helper — builtin open() would leave a stale .crc
    # sidecar and the next read fails on ChecksumException)
    from etl_core_spark.sources.hadoop_fs import fs_write_text

    m["shards"][2]["fingerprint"] += 1
    fs_write_text(spark, out + "/_manifest.json", _json.dumps(m))
    got = verify_export(spark, out)
    assert got[2] == "MISMATCH"
    assert all(v == "ok" for k, v in got.items() if k != 2)


def test_export_shards_append_manifest_describes_directory(spark, tmp_path):
    """Append-mode manifest must describe the WHOLE directory, not
    just the appended batch — verify_export is the contract."""
    from etl_core_spark.sources.export_io import (
        export_shards,
        verify_export,
    )

    out = str(tmp_path / "appended")
    df1 = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(60)], "doc_id long, text string"
    )
    df2 = spark.createDataFrame(
        [(100 + i, f"doc {100+i}") for i in range(40)],
        "doc_id long, text string",
    )
    export_shards(df1, out, "doc_id", n_shards=4)
    m = export_shards(df2, out, "doc_id", n_shards=4, mode="append")
    assert m["total_rows"] == 100
    assert set(verify_export(spark, out).values()) == {"ok"}


def test_export_shards_nondeterministic_upstream_still_verifies(
    spark, tmp_path
):
    """The manifest must describe the WRITTEN data even when the
    input plan is non-deterministic (sample, limit without order,
    speculative retry): stats are read back from the directory, never
    re-evaluated from the input. An unseeded rand() key re-evaluates
    differently per pass — under input-plan stats the manifest would
    fingerprint rows that were never written and fail its own
    verify_export."""
    from pyspark.sql import functions as F

    from etl_core_spark.sources.export_io import export_shards, verify_export

    df = spark.range(300).select(
        (F.rand() * F.lit(1e12)).cast("long").cast("string").alias("k")
    )
    out = str(tmp_path / "nondet")
    m = export_shards(df, out, "k", n_shards=4)
    assert m["total_rows"] == 300
    assert set(verify_export(spark, out).values()) == {"ok"}
