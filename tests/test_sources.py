import json

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.sources.jdbc_io import build_update_sql, build_upsert_sql
from etl_core_spark.sources.mongodb_io import build_pipeline
from etl_core_spark.sources.xml_io import element_to_dict


def test_csv_read_all_string_default(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a;b\n1;x\n2;y\n")
    df = get_operator("read_csv")(spark=spark, filepath=str(p), separator=";").apply({})["out"]
    assert dict(df.dtypes) == {"a": "string", "b": "string"}
    assert df.count() == 2


def test_csv_declared_schema_wins(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n")
    schema = {"fields": [
        {"name": "a", "data_type": "integer"},
        {"name": "b", "data_type": "string"},
    ]}
    df = get_operator("read_csv")(spark=spark, filepath=str(p), schema=schema).apply({})["out"]
    assert dict(df.dtypes)["a"] == "bigint"


def test_csv_separator_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("read_csv")(spark=spark, filepath="/x.csv", separator="|")


def test_json_ndjson_and_array(spark, tmp_path):
    nd = tmp_path / "d.ndjson"
    nd.write_text('{"a": 1, "n": {"x": "u"}}\n{"a": 2, "n": {"x": "v"}}\n')
    df = get_operator("read_json")(spark=spark, filepath=str(nd)).apply({})["out"]
    assert df.count() == 2
    assert df.select("n.x").collect()[0][0] == "u"

    arr = tmp_path / "d.json"
    arr.write_text(json.dumps([{"a": 1}, {"a": 2}, {"a": 3}]))
    df2 = get_operator("read_json")(spark=spark, filepath=str(arr)).apply({})["out"]
    assert df2.count() == 3


def test_json_write_nested_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, ("u",))], "a long, n struct<x:string>")
    out = tmp_path / "out_json"
    get_operator("write_json")(filepath=str(out)).apply({"in": df})
    back = spark.read.json(str(out))
    assert back.select("n.x").collect()[0][0] == "u"


def test_xml_element_conventions():
    import xml.etree.ElementTree as ET

    elem = ET.fromstring(
        '<rec id="7"><name>alice</name><tag>a</tag><tag>b</tag>'
        "<addr><city>Berlin</city></addr></rec>"
    )
    d = element_to_dict(elem)
    assert d["@id"] == "7"
    assert d["name"] == "alice"
    assert d["tag"] == ["a", "b"]
    assert d["addr"]["city"] == "Berlin"


def test_xml_read_native(spark, tmp_path):
    # Spark 4 bundles the XML data source (format("xml")); values are
    # type-inferred (id → bigint)
    p = tmp_path / "t.xml"
    p.write_text(
        "<root><rec><id>1</id><name>a</name></rec>"
        "<rec><id>2</id><name>b</name></rec></root>"
    )
    df = get_operator("read_xml")(
        spark=spark, filepath=str(p), root_tag="root", record_tag="rec"
    ).apply({})["out"]
    rows = sorted([(r["id"], r["name"]) for r in df.collect()])
    assert rows == [(1, "a"), (2, "b")]


def test_xml_write_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    out = tmp_path / "out_xml"
    get_operator("write_xml")(
        filepath=str(out), root_tag="root", record_tag="rec"
    ).apply({"in": df})
    back = spark.read.format("xml").option("rowTag", "rec").load(str(out))
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_xml_append_in_place(spark, tmp_path):
    from etl_core_spark.sources.xml_io import dict_to_element

    p = tmp_path / "doc.xml"
    p.write_text('<?xml version="1.0"?><root><rec><id>1</id><name>a</name></rec></root>')
    df = spark.createDataFrame([(2, "b"), (3, "c")], "id long, name string")
    get_operator("write_xml")(
        filepath=str(p), root_tag="root", record_tag="rec", mode="append"
    ).apply({"in": df})
    # still ONE well-formed document, originals intact, appends last
    import xml.etree.ElementTree as ET

    root = ET.parse(str(p)).getroot()
    assert root.tag == "root"
    ids = [rec.find("id").text for rec in root.findall("rec")]
    assert ids == ["1", "2", "3"]

    # append to a missing file creates the document
    p2 = tmp_path / "new.xml"
    get_operator("write_xml")(
        filepath=str(p2), root_tag="root", record_tag="rec", mode="append"
    ).apply({"in": df.limit(1)})
    assert ET.parse(str(p2)).getroot().find("rec/id").text == "2"

    # dict_to_element inverts element_to_dict conventions
    el = dict_to_element("rec", {"@id": "7", "name": "x", "tag": ["a", "b"]})
    assert el.get("id") == "7" and [t.text for t in el.findall("tag")] == ["a", "b"]


def test_xml_fallback_read_is_distributed(spark, tmp_path):
    d = tmp_path / "many"
    d.mkdir()
    for i in range(3):
        (d / f"part{i}.xml").write_text(
            f"<root><rec><id>{2*i}</id><name>n{2*i}</name></rec>"
            f"<rec><id>{2*i+1}</id><name>n{2*i+1}</name></rec></root>"
        )
    op = get_operator("read_xml")(spark=spark, filepath=str(d), record_tag="rec")
    df = op._fallback_read(spark, str(d))
    rows = sorted((int(r["id"]), r["name"]) for r in df.collect())
    assert rows == [(i, f"n{i}") for i in range(6)]


def test_parquet_roundtrip_partitioned(spark, tmp_path, tables):
    out = tmp_path / "pq"
    get_operator("write_parquet")(
        filepath=str(out), partition_by=["o_orderstatus"]
    ).apply({"in": tables["orders"]})
    back = get_operator("read_parquet")(spark=spark, filepath=str(out)).apply({})["out"]
    assert back.count() == tables["orders"].count()
    # partition dirs exist → partition pruning is available
    assert any(d.name.startswith("o_orderstatus=") for d in out.iterdir())


def test_upsert_sql_dialects():
    cols = ["id", "name", "v"]
    pg = build_upsert_sql("postgresql", "t", cols, ["id"])
    assert 'ON CONFLICT ("id") DO UPDATE SET' in pg and "EXCLUDED." in pg
    my = build_upsert_sql("mariadb", "t", cols, ["id"])
    assert "ON DUPLICATE KEY UPDATE" in my and "VALUES(`name`)" in my
    ms = build_upsert_sql("sqlserver", "t", cols, ["id"])
    assert ms.startswith("MERGE [t] AS t USING") and "WHEN NOT MATCHED" in ms
    upd = build_update_sql("postgresql", "t", ["name"], ["id"])
    assert upd == 'UPDATE "t" SET "name" = ? WHERE "id" = ?'


def test_jdbc_param_binding():
    from etl_core_spark.sources.jdbc_io import bind_named_params

    q = bind_named_params(
        "SELECT * FROM t WHERE a = :a AND s = :s AND flag = :f AND n = :n",
        {"a": 5, "s": "it's", "f": True, "n": None},
    )
    assert q == "SELECT * FROM t WHERE a = 5 AND s = 'it''s' AND flag = TRUE AND n = NULL"
    # postgres-style casts (double colon) are left alone
    assert bind_named_params("SELECT x::text FROM t", {}) == "SELECT x::text FROM t"
    with pytest.raises(OperatorConfigError, match="no 'missing'"):
        bind_named_params("SELECT :missing", {})


def test_jdbc_config_validation(spark):
    with pytest.raises(OperatorConfigError):
        get_operator("write_postgresql")(operation="upsert", entity_name="t")
    with pytest.raises(OperatorConfigError):
        get_operator("read_postgresql")(spark=spark)
    op = get_operator("read_postgresql")(spark=spark, entity_name="t", url="jdbc:postgresql://h/db")
    assert op.config["dialect"] == "postgresql"


def test_mongo_pipeline_compilation():
    pipe = build_pipeline(
        query_filter={"status": "A"},
        sort=[("ts", -1)],
        skip=10,
        limit=5,
        projection_paths=["a", "n.x"],
    )
    assert pipe == [
        {"$match": {"status": "A"}},
        {"$sort": {"ts": -1}},
        {"$skip": 10},
        {"$limit": 5},
        {"$project": {"a": 1, "n.x": 1}},
    ]


def test_mongo_projection_from_schema():
    op_cls = get_operator("read_mongodb")
    op = op_cls(
        database="db", collection="c",
        schema={"fields": [
            {"name": "a", "data_type": "integer"},
            {"name": "n", "data_type": "object", "children": [
                {"name": "x", "data_type": "string"}]},
        ]},
    )
    pipe = op.pipeline()
    assert {"$project": {"a": 1, "n.x": 1}} in pipe


def test_mongo_write_wire_with_fake_pymongo(monkeypatch):
    """Drive _execute_mongo_partition through a recording fake pymongo:
    verifies upsert filters, $set docs, ordered flag, and batch
    flushing — everything short of a live server."""
    import sys
    import types

    calls = []

    class FakeUpdateOne:
        def __init__(self, flt, update, upsert=False):
            self.flt, self.update, self.upsert = flt, update, upsert

    class FakeColl:
        def bulk_write(self, ops, ordered=False):
            calls.append((list(ops), ordered))

    class FakeClient:
        def __init__(self, uri):
            self.uri = uri
            self.closed = False

        def __getitem__(self, _name):
            return {"c": FakeColl()}

        def close(self):
            self.closed = True

    fake = types.ModuleType("pymongo")
    fake.MongoClient = FakeClient
    fake.UpdateOne = FakeUpdateOne
    monkeypatch.setitem(sys.modules, "pymongo", fake)

    from etl_core_spark.sources.mongodb_io import _execute_mongo_partition

    rows = [{"id": i, "v": f"x{i}"} for i in range(5)]
    _execute_mongo_partition(
        rows, "mongodb://h", "db", "c", True, ["id"], {}, None, True, batch_size=2
    )
    # 5 rows, batch_size 2 → flushes of 2+2+1, ordered preserved
    assert [len(ops) for ops, _ in calls] == [2, 2, 1]
    assert all(ordered for _, ordered in calls)
    first = calls[0][0][0]
    assert first.flt == {"id": 0} and first.update == {"$set": {"id": 0, "v": "x0"}}
    assert first.upsert is True

    calls.clear()
    _execute_mongo_partition(
        rows[:2], "mongodb://h", "db", "c", False, [], {"status": "A"},
        ["v"], False,
    )
    ops = calls[0][0]
    assert ops[0].flt == {"status": "A"} and ops[0].update == {"$set": {"v": "x0"}}
    assert ops[0].upsert is False


def test_mongo_read_reraises_non_connector_errors(spark, monkeypatch):
    op = get_operator("read_mongodb")(spark=spark, database="db", collection="c")

    def auth_fail(_spark):
        raise ValueError("Authentication failed for user 'etl'")

    monkeypatch.setattr(op, "_connector_read", auth_fail)
    # the driver-collect fallback must NOT mask a real server error
    with pytest.raises(ValueError, match="Authentication failed"):
        op.read()


def test_mongo_read_falls_back_when_connector_absent(spark, monkeypatch):
    op = get_operator("read_mongodb")(spark=spark, database="db", collection="c")
    sentinel = spark.range(1)

    def no_connector(_spark):
        raise Exception(
            "[DATA_SOURCE_NOT_FOUND] Failed to find the data source: mongodb."
        )

    monkeypatch.setattr(op, "_connector_read", no_connector)
    monkeypatch.setattr(op, "_fallback_read", lambda _spark: sentinel)
    assert op.read() is sentinel


def test_mongo_update_requires_match_filter():
    """operation='update' without match_filter would issue
    UpdateOne({}, $set) per row — each silently rewriting an
    arbitrary document; the config must refuse it up front."""
    import pytest as _pytest

    from etl_core_spark.operators.base import OperatorConfigError, get_operator

    with _pytest.raises(OperatorConfigError, match="match_filter"):
        get_operator("write_mongodb")(
            database="db", collection="c", operation="update"
        )
    # with a filter the config is accepted
    get_operator("write_mongodb")(
        database="db", collection="c", operation="update",
        match_filter={"k": 1},
    )
