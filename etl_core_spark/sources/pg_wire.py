"""Minimal pure-stdlib PostgreSQL v3 frontend (DBAPI-ish).

The container ships a real PostgreSQL 15 server but neither the JDBC
driver jar nor psycopg2/pg8000 — which left the postgres DML wire
path testable only against SQLite for five rounds. The frontend/
backend protocol is public and small (PostgreSQL docs, "Frontend/
Backend Protocol", protocol 3.0), so this module implements exactly
the slice the engine's executor-side DML needs:

- StartupMessage + trust / cleartext / md5 authentication (SCRAM is
  deliberately out of scope — the in-container cluster is initdb'ed
  with ``--auth=trust``; a production deployment uses psycopg2,
  which ``jdbc_io._dbapi_connect`` still prefers when importable).
- The SIMPLE QUERY protocol ('Q'): RowDescription / DataRow /
  CommandComplete / ErrorResponse / ReadyForQuery.
- A DBAPI-shaped surface (``cursor``, ``execute``, ``executemany``,
  ``fetchall``, ``commit``, ``rollback``) with ``qmark`` parameters
  rendered CLIENT-SIDE as escaped literals (the ``bind_named_params``
  escaping conventions — the simple protocol has no binds). That is
  the documented dev/test-wire trade; for hostile parameter values
  at production scale use a real driver with server-side binds.

Text-mode results decode by type OID for the common scalars; every
other type comes back as its text form.
"""

from __future__ import annotations

import hashlib
import math
import socket
import struct
from decimal import Decimal
from typing import Any, Iterable, Sequence


class PgWireError(Exception):
    """Server-reported error (severity, code, message) or protocol
    violation."""


def _render_literal(value: Any) -> str:
    """SQL literal rendering with the engine's escaping conventions
    (jdbc_io.bind_named_params): doubled quotes, no backslash escapes
    (standard_conforming_strings is the postgres default), non-finite
    floats rejected, bytes as hex bytea."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, float):
        if not math.isfinite(value):
            raise PgWireError(
                f"cannot render non-finite float {value!r} as a SQL literal"
            )
        return repr(value)
    if isinstance(value, (int, Decimal)):
        return str(value)
    if isinstance(value, (bytes, bytearray)):
        return "'\\x" + bytes(value).hex() + "'::bytea"
    s = str(value)
    if "\x00" in s:
        raise PgWireError("postgres text values cannot contain NUL")
    return "'" + s.replace("'", "''") + "'"


def _bind_qmark(sql: str, params: Sequence[Any]) -> str:
    """Substitute ``?`` placeholders OUTSIDE quoted spans (the
    _qmark_to_pyformat scanner, rendering instead of rewriting)."""
    out: list[str] = []
    it = iter(params)
    quote: str | None = None
    n_bound = 0
    for ch in sql:
        if quote is not None:
            out.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            out.append(ch)
        elif ch == "?":
            try:
                out.append(_render_literal(next(it)))
            except StopIteration:
                raise PgWireError(
                    f"statement has more '?' than the {len(params)} params"
                ) from None
            n_bound += 1
        else:
            out.append(ch)
    if n_bound != len(params):
        raise PgWireError(
            f"statement bound {n_bound} of {len(params)} params"
        )
    return "".join(out)


# text-mode decoders by type OID (pg_type.dat — public catalog)
def _decode(oid: int, text: str) -> Any:
    if oid == 16:  # bool
        return text == "t"
    if oid in (20, 21, 23, 26):  # int8/2/4, oid
        return int(text)
    if oid in (700, 701):  # float4/8
        return float(text)
    if oid == 1700:  # numeric
        return Decimal(text)
    return text


class _Cursor:
    def __init__(self, conn: "PgWireConnection") -> None:
        self._conn = conn
        self.description: list[tuple] | None = None
        self.rowcount = -1
        self._rows: list[tuple] = []
        self._pos = 0

    def execute(self, sql: str, params: Sequence[Any] | None = None):
        if params:
            sql = _bind_qmark(sql, list(params))
        cols, rows, tag = self._conn._simple_query(sql)
        self.description = (
            [(name, oid, None, None, None, None, None) for name, oid in cols]
            if cols
            else None
        )
        self._rows, self._pos = rows, 0
        # command tag: 'INSERT 0 n' / 'UPDATE n' / 'SELECT n' / ...
        parts = (tag or "").split()
        self.rowcount = (
            int(parts[-1]) if parts and parts[-1].isdigit() else -1
        )
        return self

    def executemany(self, sql: str, seq_of_params: Iterable[Sequence[Any]]):
        # one round-trip per statement batch: concatenate the rendered
        # statements (the simple protocol runs a multi-statement
        # string in ONE implicit transaction — batch atomicity for
        # free) instead of a network round-trip per row
        stmts = [_bind_qmark(sql, list(p)) for p in seq_of_params]
        if stmts:
            self._conn._simple_query("; ".join(stmts))
        self.rowcount = -1
        return self

    def fetchall(self) -> list[tuple]:
        rows = self._rows[self._pos :]
        self._pos = len(self._rows)
        return rows

    def fetchone(self):
        if self._pos >= len(self._rows):
            return None
        row = self._rows[self._pos]
        self._pos += 1
        return row

    def close(self) -> None:
        self._rows = []

    def __iter__(self):
        while True:
            row = self.fetchone()
            if row is None:
                return
            yield row


class PgWireConnection:
    paramstyle = "qmark"

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 5432,
        user: str = "postgres",
        database: str = "postgres",
        password: str | None = None,
        connect_timeout: float = 10.0,
    ) -> None:
        self._user = user
        self._password = password
        self._in_tx = False
        if host.startswith("/"):  # unix socket directory
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.settimeout(connect_timeout)
            self._sock.connect(f"{host}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection(
                (host, port), timeout=connect_timeout
            )
        self._sock.settimeout(None)
        self._buf = b""
        self._startup(user, database)

    # ---- wire primitives ----
    def _send(self, type_byte: bytes, payload: bytes) -> None:
        self._sock.sendall(
            type_byte + struct.pack("!I", len(payload) + 4) + payload
        )

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgWireError("server closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _recv_msg(self) -> tuple[bytes, bytes]:
        head = self._recv_exact(5)
        mtype = head[:1]
        (length,) = struct.unpack("!I", head[1:])
        return mtype, self._recv_exact(length - 4)

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        fields: dict[str, str] = {}
        for part in payload.split(b"\x00"):
            if part:
                fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
        return fields

    # ---- session ----
    def _startup(self, user: str, database: str) -> None:
        params = (
            f"user\x00{user}\x00database\x00{database}\x00"
            "client_encoding\x00UTF8\x00\x00"
        ).encode()
        body = struct.pack("!I", 196608) + params  # protocol 3.0
        self._sock.sendall(struct.pack("!I", len(body) + 4) + body)
        while True:
            mtype, payload = self._recv_msg()
            if mtype == b"R":
                (code,) = struct.unpack("!I", payload[:4])
                if code == 0:
                    continue
                if code == 3:  # cleartext
                    if self._password is None:
                        raise PgWireError("server wants a password")
                    self._send(
                        b"p", self._password.encode() + b"\x00"
                    )
                elif code == 5:  # md5(md5(password+user)+salt)
                    if self._password is None:
                        raise PgWireError("server wants a password")
                    salt = payload[4:8]
                    inner = hashlib.md5(
                        self._password.encode() + self._user.encode()
                    ).hexdigest()
                    digest = hashlib.md5(
                        inner.encode() + salt
                    ).hexdigest()
                    self._send(b"p", b"md5" + digest.encode() + b"\x00")
                else:
                    raise PgWireError(
                        f"unsupported auth method {code} (use trust/md5 "
                        "for the in-container cluster, psycopg2 for SCRAM)"
                    )
            elif mtype in (b"S", b"K", b"N"):
                continue
            elif mtype == b"Z":
                return
            elif mtype == b"E":
                f = self._error_fields(payload)
                raise PgWireError(
                    f"{f.get('S', 'ERROR')} {f.get('C', '')}: "
                    f"{f.get('M', 'startup failed')}"
                )
            else:
                raise PgWireError(f"unexpected startup message {mtype!r}")

    def _simple_query(
        self, sql: str
    ) -> tuple[list[tuple[str, int]], list[tuple], str | None]:
        self._send(b"Q", sql.encode() + b"\x00")
        cols: list[tuple[str, int]] = []
        rows: list[tuple] = []
        tag: str | None = None
        error: dict[str, str] | None = None
        while True:
            mtype, payload = self._recv_msg()
            if mtype == b"T":
                cols = []
                (n,) = struct.unpack("!H", payload[:2])
                off = 2
                for _ in range(n):
                    end = payload.index(b"\x00", off)
                    name = payload[off:end].decode()
                    off = end + 1
                    (_tbl, _att, oid, _tl, _tm, _fmt) = struct.unpack(
                        "!IHIhih", payload[off : off + 18]
                    )
                    off += 18
                    cols.append((name, oid))
            elif mtype == b"D":
                (n,) = struct.unpack("!H", payload[:2])
                off = 2
                vals: list[Any] = []
                for i in range(n):
                    (ln,) = struct.unpack("!i", payload[off : off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        text = payload[off : off + ln].decode()
                        off += ln
                        vals.append(_decode(cols[i][1], text))
                rows.append(tuple(vals))
            elif mtype == b"C":
                tag = payload.rstrip(b"\x00").decode()
            elif mtype == b"E":
                error = self._error_fields(payload)
            elif mtype in (b"N", b"S", b"I"):  # notice/params/empty
                continue
            elif mtype == b"Z":
                self._in_tx = payload[:1] in (b"T", b"E")
                if error is not None:
                    raise PgWireError(
                        f"{error.get('S', 'ERROR')} {error.get('C', '')}: "
                        f"{error.get('M', '?')}"
                    )
                return cols, rows, tag
            else:
                raise PgWireError(f"unexpected message {mtype!r}")

    # ---- DBAPI surface ----
    def cursor(self) -> _Cursor:
        return _Cursor(self)

    def execute(self, sql: str, params: Sequence[Any] | None = None):
        return self.cursor().execute(sql, params)

    def commit(self) -> None:
        if self._in_tx:
            self._simple_query("COMMIT")

    def rollback(self) -> None:
        if self._in_tx:
            self._simple_query("ROLLBACK")

    def close(self) -> None:
        try:
            self._sock.sendall(b"X" + struct.pack("!I", 4))
        except OSError:
            pass
        self._sock.close()

    def __enter__(self) -> "PgWireConnection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def connect(
    host: str = "127.0.0.1",
    port: int = 5432,
    user: str = "postgres",
    database: str = "postgres",
    password: str | None = None,
) -> PgWireConnection:
    return PgWireConnection(host, port, user, database, password)
