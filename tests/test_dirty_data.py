"""Dirty-data handling tests mirroring the reference's fixture
variants (FIXTURES.md F1/F2): missing values, wrong types, malformed
NDJSON lines, nested + wildcard paths at the operator level."""

import json

import pytest
from pyspark.sql import functions as F

from etl_core_spark.functions.casts import CastError
from etl_core_spark.operators.base import get_operator


def test_csv_missing_values(spark, tmp_path):
    # test_data_missing_values.csv analog: empty name cells → null
    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,alice\n2,\n3,carol\n")
    df = get_operator("read_csv")(spark=spark, filepath=str(p)).apply({})["out"]
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {"1": "alice", "2": None, "3": "carol"}
    # filter on the nullable column: null goes to fail, not dropped
    out = get_operator("filter")(
        rule={"column": "name", "operator": "contains", "value": "a"}
    ).apply({"in": df})
    assert {r["id"] for r in out["pass"].collect()} == {"1", "3"}
    assert {r["id"] for r in out["fail"].collect()} == {"2"}


def test_csv_wrong_types_conversion_paths(spark, tmp_path):
    # test_data_wrong_types.csv analog: id contains 'two'
    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,a\ntwo,b\n3,c\n")
    df = get_operator("read_csv")(spark=spark, filepath=str(p)).apply({})["out"]
    ok = get_operator("type_conversion")(
        rules=[{"column_path": "id", "target": "integer", "on_error": "null"}]
    ).apply({"in": df})["out"]
    assert [r["id"] for r in ok.orderBy("name").collect()] == [1, None, 3]
    with pytest.raises(CastError):
        get_operator("type_conversion")(
            rules=[{"column_path": "id", "target": "integer", "on_error": "raise"}]
        ).apply({"in": df})


def test_ndjson_bad_line(spark, tmp_path):
    # testdata_bad_line.jsonl analog: malformed line → _corrupt_record
    p = tmp_path / "d.jsonl"
    p.write_text('{"id": 1, "name": "a"}\nNOT JSON AT ALL\n{"id": 2, "name": "b"}\n')
    df = get_operator("read_json")(spark=spark, filepath=str(p)).apply({})["out"]
    # Spark requires caching before querying the corrupt-record
    # column on its own (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    df = df.cache()
    good = df.filter(F.col("_corrupt_record").isNull()) if "_corrupt_record" in df.columns else df
    assert {r["id"] for r in good.select("id").dropna().collect()} == {1, 2}
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 1
    df.unpersist()


def test_nested_json_dotted_access_and_renesting(spark, tmp_path):
    # people_nested analog (F2)
    p = tmp_path / "n.jsonl"
    rows = [
        {"id": 1, "name": "a", "addr": {"city": "Berlin", "zip": "10x"}, "tags": ["x", "y"]},
        {"id": 2, "name": "b", "addr": {"city": "Paris", "zip": "75x"}, "tags": []},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = get_operator("read_json")(spark=spark, filepath=str(p)).apply({})["out"]
    # dotted access
    assert {r[0] for r in df.select("addr.city").collect()} == {"Berlin", "Paris"}
    # re-nest via mapping rules: addr.city → location.town
    out = get_operator("schema_mapping")(
        rules_by_dest={
            "out": {
                "person_id": {"src_port": "in", "src_path": "id"},
                "location.town": {"src_port": "in", "src_path": "addr.city"},
            }
        }
    ).apply({"in": df})["out"]
    row = out.orderBy("person_id").collect()[0]
    assert row["person_id"] == 1 and row["location"]["town"] == "Berlin"


def test_array_wildcard_conversion_on_nested_json(spark, tmp_path):
    p = tmp_path / "w.jsonl"
    rows = [
        {"id": 1, "items": [{"price": "3.5"}, {"price": "4"}]},
        {"id": 2, "items": [{"price": "oops"}]},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = get_operator("read_json")(spark=spark, filepath=str(p)).apply({})["out"]
    out = get_operator("type_conversion")(
        rules=[{"column_path": "items.*.price", "target": "float", "on_error": "null"}]
    ).apply({"in": df})["out"]
    byid = {r["id"]: [x["price"] for x in r["items"]] for r in out.collect()}
    assert byid[1] == [3.5, 4.0]
    assert byid[2] == [None]


def test_empty_input_through_pipeline(spark, tmp_path):
    p = tmp_path / "e.csv"
    p.write_text("id,v\n")  # header only
    df = get_operator("read_csv")(spark=spark, filepath=str(p)).apply({})["out"]
    agg = get_operator("aggregation")(
        group_by=["id"],
        aggregations=[{"src": "*", "op": "count", "dest": "n"}],
    ).apply({"in": df})["out"]
    assert agg.count() == 0
    glob = get_operator("aggregation")(
        group_by=[],
        aggregations=[{"src": "*", "op": "count", "dest": "n"}],
    ).apply({"in": df})["out"].collect()
    assert glob[0]["n"] == 0


def test_semdedup_null_embedding_rows_survive(spark):
    """NULL-embedding rows (failed embedding jobs) can't participate
    in cosine pairing — they must SURVIVE dedup untouched, never be
    silently dropped (the engine-wide NULL-loss guard)."""
    from etl_core_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.05]),   # near-dup of 0
        (2, None),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"] for r in semdedup(df, 0.9, num_centroids=1).collect()}
    assert got == {0, 2, 3}


def test_export_shards_null_key_not_lost(spark, tmp_path):
    """A NULL shard key hashes to the sentinel bucket, lands in a real
    shard, and is counted in the manifest — never dropped."""
    from etl_core_spark.sources.export_io import export_shards

    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c")], "doc_id long, text string"
    )
    m = export_shards(df, str(tmp_path / "e"), "doc_id", n_shards=4)
    assert m["total_rows"] == 3
    back = spark.read.parquet(str(tmp_path / "e"))
    assert back.count() == 3
    assert back.where(back["doc_id"].isNull()).count() == 1
