"""End-to-end JDBC DML wire-path tests.

The container has no database servers or JDBC jars, so the
executor-side DML path (``WriteJdbc.write`` → ``foreachPartition`` →
``_execute_dml_partition``) is exercised for real against an
in-process SQLite file via the ``jdbc:sqlite:`` DBAPI mapping. The
postgres-dialect upsert/update SQL the operator compiles is valid
SQLite verbatim (``ON CONFLICT .. DO UPDATE SET .. = EXCLUDED.x``,
double-quoted identifiers), so this runs the same statements a
postgres executor would.

Reference behavior: ``receivers/databases/postgresql/
postgresql_receiver.py:102-152`` (row-by-row upsert/update loops).
"""

from __future__ import annotations

import sqlite3

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.sources.jdbc_io import (
    _dbapi_connect,
    _execute_dml_partition,
    bind_named_params,
    build_update_sql,
    build_upsert_sql,
)


@pytest.fixture()
def sqlite_db(tmp_path):
    path = str(tmp_path / "wire.db")
    con = sqlite3.connect(path)
    con.execute('CREATE TABLE "target" ("id" INTEGER PRIMARY KEY, "name" TEXT, "score" REAL)')
    con.executemany(
        'INSERT INTO "target" VALUES (?, ?, ?)',
        [(1, "alice", 1.0), (2, "bob", 2.0)],
    )
    con.commit()
    con.close()
    return path


def _all_rows(path):
    con = sqlite3.connect(path)
    try:
        return sorted(con.execute('SELECT "id", "name", "score" FROM "target"').fetchall())
    finally:
        con.close()


def test_upsert_wire_end_to_end(spark, sqlite_db):
    df = spark.createDataFrame(
        [(2, "bobby", 20.0), (3, "carol", 3.0)], ["id", "name", "score"]
    )
    op = get_operator("write_postgresql")(
        url=f"jdbc:sqlite:{sqlite_db}",
        entity_name="target",
        operation="upsert",
        key_columns=["id"],
    )
    op.apply({"in": df.coalesce(1)})
    assert _all_rows(sqlite_db) == [
        (1, "alice", 1.0),
        (2, "bobby", 20.0),
        (3, "carol", 3.0),
    ]


def test_update_wire_end_to_end(spark, sqlite_db):
    df = spark.createDataFrame([(1, "ALICE", 10.0)], ["id", "name", "score"])
    op = get_operator("write_postgresql")(
        url=f"jdbc:sqlite:{sqlite_db}",
        entity_name="target",
        operation="update",
        where_columns=["id"],
    )
    op.apply({"in": df.coalesce(1)})
    assert _all_rows(sqlite_db) == [(1, "ALICE", 10.0), (2, "bob", 2.0)]


def test_upsert_wire_multi_partition(spark, sqlite_db):
    # concurrent partitions serialize on sqlite's writer lock; the
    # point is that every partition's batch lands
    rows = [(i, f"n{i}", float(i)) for i in range(3, 43)]
    df = spark.createDataFrame(rows, ["id", "name", "score"]).repartition(4)
    op = get_operator("write_postgresql")(
        url=f"jdbc:sqlite:{sqlite_db}",
        entity_name="target",
        operation="upsert",
        key_columns=["id"],
        batch_size=7,
    )
    op.apply({"in": df})
    got = _all_rows(sqlite_db)
    assert len(got) == 42
    assert (7, "n7", 7.0) in got


def test_execute_dml_partition_batching(sqlite_db):
    sql = build_upsert_sql("postgresql", "target", ["id", "name", "score"], ["id"])
    rows = [
        {"id": 1, "name": "a2", "score": 5.0},
        {"id": 9, "name": "nine", "score": 9.0},
        {"id": 10, "name": "ten", "score": 10.0},
    ]
    _execute_dml_partition(
        rows, sql, ["id", "name", "score"], f"jdbc:sqlite:{sqlite_db}", None, None, 2
    )
    assert _all_rows(sqlite_db) == [
        (1, "a2", 5.0),
        (2, "bob", 2.0),
        (9, "nine", 9.0),
        (10, "ten", 10.0),
    ]


def test_jdbc_read_write_wire_via_derby(spark, tmp_path):
    """The native spark.read/write.jdbc wire path, executed for real:
    Spark bundles Apache Derby (metastore dependency), so an embedded
    jdbc:derby: URL exercises table creation, INSERT (append),
    TRUNCATE (overwrite+truncate), and a partitioned parameterized
    read through the actual JDBC stack — no external server."""
    url = f"jdbc:derby:{tmp_path}/wiredb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"

    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(20)], "id bigint, name string, score double"
    )
    write_op = get_operator("write_postgresql")(
        url=url, driver=driver, entity_name="wire_t", operation="insert"
    )
    write_op.apply({"in": df})

    read_op = get_operator("read_postgresql")(
        spark=spark,
        url=url,
        driver=driver,
        query='SELECT "id", "name", "score" FROM wire_t WHERE "score" >= :lo',
        params={"lo": 15.0},
    )
    got = sorted((r["id"], r["name"], r["score"]) for r in read_op.apply({})["out"].collect())
    assert got == [(i, f"n{i}", float(i)) for i in range(15, 20)]

    # truncate: overwrite keeping the table, only new rows remain
    df2 = spark.createDataFrame([(99, "only", 9.9)], "id bigint, name string, score double")
    get_operator("write_postgresql")(
        url=url, driver=driver, entity_name="wire_t", operation="truncate"
    ).apply({"in": df2})
    back = get_operator("read_postgresql")(
        spark=spark, url=url, driver=driver, entity_name="wire_t"
    ).apply({})["out"]
    assert [(r["id"], r["name"]) for r in back.collect()] == [(99, "only")]


def test_update_sql_shape():
    sql = build_update_sql("postgresql", "t", ["a", "b"], ["k"])
    assert sql == 'UPDATE "t" SET "a" = ?, "b" = ? WHERE "k" = ?'


def test_sqlserver_connect_requires_pymssql():
    with pytest.raises(RuntimeError, match="pymssql"):
        _dbapi_connect("jdbc:sqlserver://host:1433;databaseName=db", "u", "p")


def test_unknown_scheme_raises():
    with pytest.raises(RuntimeError, match="no DBAPI mapping"):
        _dbapi_connect("jdbc:oracle:thin:@host", None, None)


def test_bind_params_mysql_backslash_escaping():
    # a value ending in a backslash must not swallow the closing quote
    out = bind_named_params("SELECT :v AS x", {"v": "a\\"}, dialect="mariadb")
    assert out == "SELECT 'a\\\\' AS x"
    out = bind_named_params("SELECT :v AS x", {"v": "a\\'b"}, dialect="mariadb")
    assert out == "SELECT 'a\\\\''b' AS x"


def test_bind_params_postgres_keeps_backslash_literal():
    out = bind_named_params("SELECT :v AS x", {"v": "a\\"}, dialect="postgresql")
    assert out == "SELECT 'a\\' AS x"


def test_bind_params_rejects_nonfinite_floats():
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(OperatorConfigError, match="non-finite"):
            bind_named_params("SELECT :v", {"v": bad})


def test_bind_params_sqlite_roundtrip(sqlite_db):
    # the rendered literal parses back to the original value
    val = "it's a 100% \"quoted\" value"
    sql = bind_named_params("SELECT :v AS v", {"v": val}, dialect="postgresql")
    con = sqlite3.connect(sqlite_db)
    try:
        assert con.execute(sql).fetchone()[0] == val
    finally:
        con.close()


def test_bind_params_skip_quoted_spans():
    """A ':word' inside a string literal or quoted identifier is
    content, not a placeholder — it must neither raise as unknown nor
    be substituted; real placeholders outside quotes still bind."""
    from etl_core_spark.sources.jdbc_io import bind_named_params

    out = bind_named_params(
        "SELECT * FROM t WHERE label = 'skip:this' AND ts > :since",
        {"since": 5},
    )
    assert out == "SELECT * FROM t WHERE label = 'skip:this' AND ts > 5"
    # even when params HAS the name, the literal stays untouched
    out = bind_named_params(
        "SELECT \"a:b\" FROM t WHERE x = 'it''s :v here' AND y = :v", {"v": 1}
    )
    assert out == "SELECT \"a:b\" FROM t WHERE x = 'it''s :v here' AND y = 1"


def test_qmark_to_pyformat_respects_quotes():
    """? inside quoted identifiers/literals is NOT a placeholder; % in
    literals escapes to %% for pyformat drivers."""
    from etl_core_spark.sources.jdbc_io import _qmark_to_pyformat

    assert _qmark_to_pyformat('INSERT INTO "ok?" VALUES (?, ?)') == (
        'INSERT INTO "ok?" VALUES (%s, %s)'
    )
    assert _qmark_to_pyformat("UPDATE t SET a = ? WHERE b LIKE '10%?'") == (
        "UPDATE t SET a = %s WHERE b LIKE '10%%?'"
    )
    assert _qmark_to_pyformat("SELECT `q?` FROM t WHERE x = ?") == (
        "SELECT `q?` FROM t WHERE x = %s"
    )
