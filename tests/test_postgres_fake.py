"""Postgres loader logic exercised against an injected fake psycopg.

psycopg is an optional dependency that is absent in CI; these tests stub
the module to verify the streaming loop, query construction, ownership
semantics and dimensionality validation without a server.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


class FakeCursor:
    def __init__(self, rows, batch_fail=None):
        self._rows = list(rows)
        self._pos = 0
        self.executed = None
        self.itersize = None

    def execute(self, query, params=None):
        self.executed = (query, params)

    def fetchmany(self, n):
        out = self._rows[self._pos : self._pos + n]
        self._pos += n
        return out

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class FakeConnection:
    def __init__(self, rows):
        self.rows = rows
        self.closed = False
        self.autocommit = False
        self.cursors = []

    def cursor(self, name=None):
        cur = FakeCursor(self.rows)
        self.cursors.append(cur)
        return cur

    def close(self):
        self.closed = True


@pytest.fixture
def fake_psycopg(monkeypatch):
    mod = types.ModuleType("psycopg")
    sql_mod = types.ModuleType("psycopg.sql")

    class _Frag:
        def __init__(self, text):
            self.text = text

        def format(self, **kw):
            out = self.text
            for key, val in kw.items():
                out = out.replace("{%s}" % key, val.text if isinstance(val, _Frag) else str(val))
            return _Frag(out)

        def as_string(self, *_):
            return self.text

    sql_mod.SQL = _Frag
    sql_mod.Identifier = lambda s: _Frag(f'"{s}"')
    sql_mod.Literal = lambda v: _Frag(repr(v))
    mod.sql = sql_mod
    mod.connect = lambda dsn: FakeConnection([])
    monkeypatch.setitem(sys.modules, "psycopg", mod)
    monkeypatch.setitem(sys.modules, "psycopg.sql", sql_mod)
    return mod


def _rows(n, dim, start=0):
    rng = np.random.default_rng(0)
    return [
        (start + i, rng.standard_normal(dim).astype(np.float32).tobytes())
        for i in range(n)
    ]


def test_streams_batches_from_factory(fake_psycopg):
    from lshrs_tpu.io.postgres import iter_postgres_vectors

    conn = FakeConnection(_rows(25, 8))
    batches = list(
        iter_postgres_vectors(connection_factory=lambda: conn, batch_size=10)
    )
    assert [len(b[0]) for b in batches] == [10, 10, 5]
    assert batches[0][0] == list(range(10))
    assert batches[0][1].shape == (10, 8)
    assert batches[0][1].dtype == np.float32
    # caller owns factory connections: must not be closed by the loader
    assert not conn.closed
    assert conn.cursors[0].itersize == 10


def test_owned_dsn_connection_closed(fake_psycopg):
    from lshrs_tpu.io.postgres import iter_postgres_vectors

    conn = FakeConnection(_rows(3, 4))
    fake_psycopg.connect = lambda dsn: conn
    list(iter_postgres_vectors(dsn="postgres://x", batch_size=2))
    assert conn.closed
    assert conn.autocommit


def test_inconsistent_dim_raises(fake_psycopg):
    from lshrs_tpu.io.postgres import iter_postgres_vectors

    rows = _rows(2, 4) + _rows(1, 6, start=2)
    conn = FakeConnection(rows)
    with pytest.raises(ValueError, match="Inconsistent vector dimensionality"):
        list(iter_postgres_vectors(connection_factory=lambda: conn, batch_size=10))


def test_params_require_fetch_query(fake_psycopg):
    from lshrs_tpu.io.postgres import iter_postgres_vectors

    with pytest.raises(ValueError, match="params"):
        list(iter_postgres_vectors(dsn="x", params=[1]))


def test_fetch_query_passthrough(fake_psycopg):
    from lshrs_tpu.io.postgres import iter_postgres_vectors

    conn = FakeConnection(_rows(2, 4))
    list(
        iter_postgres_vectors(
            connection_factory=lambda: conn,
            fetch_query="SELECT id, v FROM t WHERE id > %s",
            params=[5],
        )
    )
    query, params = conn.cursors[0].executed
    assert query == "SELECT id, v FROM t WHERE id > %s"
    assert params == [5]


def test_create_signatures_postgres_end_to_end(fake_psycopg, make_device_lsh, rng):
    vectors = rng.standard_normal((30, 32)).astype(np.float32)
    rows = [(i, vectors[i].tobytes()) for i in range(30)]
    conn = FakeConnection(rows)

    lsh = make_device_lsh()
    lsh.create_signatures(
        format="pg", connection_factory=lambda: conn, batch_size=8
    )
    assert lsh.stats()["index"]["alive"] == 30
    assert lsh.get_top_k(vectors[21], topk=1) == [21]
