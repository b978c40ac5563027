"""Vendored DML grammar: a tokenizer + recursive-descent parser for
the two write dialects that have no in-container driver or server —
MySQL/MariaDB ``INSERT ... ON DUPLICATE KEY UPDATE`` and T-SQL
``MERGE`` (reference semantics: ``receivers/databases/mariadb/
mariadb_write.py:58-65``, ``sqlserver_write.py:59-69``).

This is NOT a regex shape check: the statement is tokenized
(dialect-quoted identifiers, placeholders, keywords, punctuation) and
parsed by grammar productions that fail on any malformed token
sequence — unbalanced quotes, missing commas, keyword drift, arity
mismatches. The parse returns a structured AST the tests (and any
runtime validator) can assert column-by-column against the writer's
intent. sqlglot would be the off-the-shelf equivalent; it is not
installable in this container, so the subset grammar is vendored.

Grammar (EBNF, uppercase = keyword token):

  mysql_upsert   := INSERT [IGNORE] INTO ident "(" ident ("," ident)* ")"
                    VALUES "(" "?" ("," "?")* ")"
                    [ ON DUPLICATE KEY UPDATE assign ("," assign)* ]
  assign         := ident "=" VALUES "(" ident ")"

  tsql_merge     := MERGE ident AS name USING
                    "(" SELECT sel ("," sel)* ")" AS name
                    ON eq ("AND" eq)*
                    [ WHEN MATCHED THEN UPDATE SET set ("," set)* ]
                    WHEN NOT MATCHED THEN INSERT "(" ident ("," ident)* ")"
                    VALUES "(" qual ("," qual)* ")" ";"
  sel            := "?" AS ident
  eq | set       := qual "=" qual
  qual           := name "." ident | ident

Identifiers are backtick-quoted (MySQL) or bracket-quoted (T-SQL);
bare names are only valid as table aliases.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class DmlParseError(ValueError):
    """Generated DML failed the dialect grammar."""


@dataclass
class Tok:
    kind: str  # KW | IDENT | NAME | QMARK | PUNCT
    value: str


_KEYWORDS = {
    "INSERT", "INTO", "VALUES", "ON", "DUPLICATE", "KEY", "UPDATE",
    "MERGE", "AS", "USING", "SELECT", "WHEN", "MATCHED", "THEN", "SET",
    "IGNORE",
    "NOT", "AND", "WHERE",
}

# identifier quotes escape their closing character by DOUBLING
# (`` inside backticks, ]] inside brackets, "" inside double quotes) —
# the tokenizer consumes doubled closers and unescapes them
_TOKEN_RE = re.compile(
    r"""\s*(?:
        `(?P<bt>(?:[^`]|``)*)`       # backtick-quoted identifier
      | \[(?P<br>(?:[^\]]|\]\])*)\]  # bracket-quoted identifier
      | "(?P<dq>(?:[^"]|"")*)"      # double-quoted identifier
      | (?P<word>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<qmark>\?)
      | (?P<punct>[(),.;=])
    )""",
    re.VERBOSE,
)


def tokenize(sql: str, quote: str) -> list[Tok]:
    """``quote`` is the dialect's identifier quote style: 'backtick',
    'bracket', or 'double'. Quoted identifiers in the other styles are
    rejected — a template that quotes with the wrong dialect's
    characters must not parse."""
    toks: list[Tok] = []
    sql = sql.rstrip()  # \s* consumes leading/inter-token whitespace;
    # a whitespace-only tail would otherwise fail the match below
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m or m.end() == pos:
            raise DmlParseError(f"cannot tokenize at {sql[pos:pos + 20]!r}")
        pos = m.end()
        if m.group("bt") is not None:
            if quote != "backtick":
                raise DmlParseError("backtick identifier in non-MySQL dialect")
            toks.append(Tok("IDENT", m.group("bt").replace("``", "`")))
        elif m.group("br") is not None:
            if quote != "bracket":
                raise DmlParseError("bracket identifier in non-T-SQL dialect")
            toks.append(Tok("IDENT", m.group("br").replace("]]", "]")))
        elif m.group("dq") is not None:
            if quote != "double":
                raise DmlParseError("double-quoted identifier in this dialect")
            toks.append(Tok("IDENT", m.group("dq").replace('""', '"')))
        elif m.group("word") is not None:
            w = m.group("word")
            toks.append(
                Tok("KW", w.upper()) if w.upper() in _KEYWORDS else Tok("NAME", w)
            )
        elif m.group("qmark") is not None:
            toks.append(Tok("QMARK", "?"))
        else:
            toks.append(Tok("PUNCT", m.group("punct")))
    return toks


class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, kind: str, value: str | None = None) -> Tok:
        t = self.peek()
        if t is None or t.kind != kind or (value is not None and t.value != value):
            raise DmlParseError(
                f"expected {kind} {value or ''} at token {self.i}, got {t}"
            )
        self.i += 1
        return t

    def at(self, kind: str, value: str | None = None) -> bool:
        t = self.peek()
        return t is not None and t.kind == kind and (value is None or t.value == value)

    def done(self) -> None:
        if self.i != len(self.toks):
            raise DmlParseError(f"unparsed tail from token {self.i}: "
                                f"{[t.value for t in self.toks[self.i:]]}")

    def ident_list(self) -> list[str]:
        out = [self.take("IDENT").value]
        while self.at("PUNCT", ","):
            self.take("PUNCT", ",")
            out.append(self.take("IDENT").value)
        return out

    def qualified(self) -> tuple[str | None, str]:
        """name.ident | ident — returns (alias, column)."""
        if self.at("NAME"):
            alias = self.take("NAME").value
            self.take("PUNCT", ".")
            return alias, self.take("IDENT").value
        return None, self.take("IDENT").value


def parse_mysql_upsert(sql: str) -> dict:
    """Parse and return {table, insert_cols, placeholders, updates}
    where updates = [(target_col, values_col), ...]."""
    p = _Parser(tokenize(sql, "backtick"))
    p.take("KW", "INSERT")
    ignore = p.at("KW", "IGNORE")
    if ignore:
        p.take("KW", "IGNORE")
    p.take("KW", "INTO")
    table = p.take("IDENT").value
    p.take("PUNCT", "(")
    cols = p.ident_list()
    p.take("PUNCT", ")")
    p.take("KW", "VALUES"); p.take("PUNCT", "(")
    n_ph = 1
    p.take("QMARK")
    while p.at("PUNCT", ","):
        p.take("PUNCT", ","); p.take("QMARK")
        n_ph += 1
    p.take("PUNCT", ")")
    updates: list[tuple[str, str]] = []
    if p.at("KW", "ON"):
        p.take("KW", "ON"); p.take("KW", "DUPLICATE")
        p.take("KW", "KEY"); p.take("KW", "UPDATE")
        while True:
            tgt = p.take("IDENT").value
            p.take("PUNCT", "=")
            p.take("KW", "VALUES"); p.take("PUNCT", "(")
            src = p.take("IDENT").value
            p.take("PUNCT", ")")
            updates.append((tgt, src))
            if not p.at("PUNCT", ","):
                break
            p.take("PUNCT", ",")
    p.done()
    return {"table": table, "insert_cols": cols, "placeholders": n_ph,
            "updates": updates, "ignore": ignore}


def parse_tsql_merge(sql: str) -> dict:
    """Parse and return {table, target_alias, source_alias, source_cols,
    on, set, insert_cols, insert_vals} with on/set as
    [((t_alias, col), (s_alias, col)), ...]."""
    p = _Parser(tokenize(sql, "bracket"))
    p.take("KW", "MERGE")
    table = p.take("IDENT").value
    p.take("KW", "AS")
    t_alias = p.take("NAME").value
    p.take("KW", "USING"); p.take("PUNCT", "("); p.take("KW", "SELECT")
    src_cols = []
    while True:
        p.take("QMARK"); p.take("KW", "AS")
        src_cols.append(p.take("IDENT").value)
        if not p.at("PUNCT", ","):
            break
        p.take("PUNCT", ",")
    p.take("PUNCT", ")"); p.take("KW", "AS")
    s_alias = p.take("NAME").value

    def eq_pair():
        left = p.qualified()
        p.take("PUNCT", "=")
        right = p.qualified()
        return left, right

    p.take("KW", "ON")
    on = [eq_pair()]
    while p.at("KW", "AND"):
        p.take("KW", "AND")
        on.append(eq_pair())
    # WHEN MATCHED is optional: an all-key link table has nothing to
    # update, and the writer emits MERGE with only the INSERT branch
    sets = []
    p.take("KW", "WHEN")
    if p.at("KW", "MATCHED"):
        p.take("KW", "MATCHED"); p.take("KW", "THEN")
        p.take("KW", "UPDATE"); p.take("KW", "SET")
        sets = [eq_pair()]
        while p.at("PUNCT", ","):
            p.take("PUNCT", ",")
            sets.append(eq_pair())
        p.take("KW", "WHEN")
    p.take("KW", "NOT"); p.take("KW", "MATCHED")
    p.take("KW", "THEN"); p.take("KW", "INSERT"); p.take("PUNCT", "(")
    ins_cols = p.ident_list()
    p.take("PUNCT", ")")
    p.take("KW", "VALUES"); p.take("PUNCT", "(")
    ins_vals = [p.qualified()]
    while p.at("PUNCT", ","):
        p.take("PUNCT", ",")
        ins_vals.append(p.qualified())
    p.take("PUNCT", ")"); p.take("PUNCT", ";")
    p.done()
    return {"table": table, "target_alias": t_alias, "source_alias": s_alias,
            "source_cols": src_cols, "on": on, "set": sets,
            "insert_cols": ins_cols, "insert_vals": ins_vals}


def parse_update(sql: str, quote: str) -> dict:
    """UPDATE ident SET assigns WHERE conds (all three dialects —
    pass the dialect's quote style)."""
    p = _Parser(tokenize(sql, quote))
    p.take("KW", "UPDATE")
    table = p.take("IDENT").value
    p.take("KW", "SET")

    def assign():
        col = p.take("IDENT").value
        p.take("PUNCT", "=")
        p.take("QMARK")
        return col

    sets = [assign()]
    while p.at("PUNCT", ","):
        p.take("PUNCT", ",")
        sets.append(assign())
    p.take("KW", "WHERE")
    conds = [assign()]
    while p.at("KW", "AND"):
        p.take("KW", "AND")
        conds.append(assign())
    p.done()
    return {"table": table, "set": sets, "where": conds}
