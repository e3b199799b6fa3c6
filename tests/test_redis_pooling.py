"""Redis backend: pool configuration, pipelining and key-schema contracts.

Mirrors the reference's mock-patch pooling suite
(`/root/reference/tests/test_redis_pooling.py:11-70`): no server, no
network — a fake ``redis`` module is injected so construction, pooling
parameters, disconnect-on-close and pipelined batching can be asserted
hermetically (redis-py itself is an optional dependency).
"""

from __future__ import annotations

import sys
import types
from unittest.mock import MagicMock

import pytest

from lshrs_tpu import LSHRS


@pytest.fixture
def fake_redis(monkeypatch):
    """Install a mock ``redis`` module and return it."""
    mod = types.ModuleType("redis")
    mod.ConnectionPool = MagicMock(name="ConnectionPool")
    mod.Redis = MagicMock(name="Redis")
    monkeypatch.setitem(sys.modules, "redis", mod)
    return mod


@pytest.fixture
def storage_cls():
    from lshrs_tpu.storage.redis import RedisStorage

    return RedisStorage


def test_pool_configuration(fake_redis, storage_cls):
    storage_cls(
        host="redis.example",
        port=6380,
        db=3,
        password="pw",
        prefix="idx",
        max_connections=17,
    )
    kwargs = fake_redis.ConnectionPool.call_args.kwargs
    assert kwargs["host"] == "redis.example"
    assert kwargs["port"] == 6380
    assert kwargs["db"] == 3
    assert kwargs["password"] == "pw"
    assert kwargs["max_connections"] == 17
    assert kwargs["socket_connect_timeout"] == 5
    assert kwargs["socket_timeout"] == 5
    assert kwargs["retry_on_timeout"] is True
    # the client is built over that pool
    pool = fake_redis.ConnectionPool.return_value
    assert fake_redis.Redis.call_args.kwargs["connection_pool"] is pool


def test_close_disconnects_pool(fake_redis, storage_cls):
    st = storage_cls()
    st.close()
    fake_redis.ConnectionPool.return_value.disconnect.assert_called_once()


def test_lshrs_passes_max_connections(fake_redis):
    LSHRS(
        dim=8, num_perm=4, num_bands=2, rows_per_band=2,
        backend="redis", redis_max_connections=7, redis_prefix="p",
    )
    assert fake_redis.ConnectionPool.call_args.kwargs["max_connections"] == 7


def test_bucket_key_schema(fake_redis, storage_cls):
    st = storage_cls(prefix="lsh")
    assert st.bucket_key(3, b"\xab\xcd") == "lsh:3:bucket:abcd"


def test_batch_add_pipelines_one_round_trip(fake_redis, storage_cls):
    st = storage_cls(prefix="lsh")
    pipe = st._client.pipeline.return_value
    ops = [(0, b"\x01", 10), (1, b"\x02", 10), (0, b"\x01", 11)]
    st.batch_add(ops)
    st._client.pipeline.assert_called_once_with(transaction=False)
    assert pipe.sadd.call_count == 3
    pipe.sadd.assert_any_call("lsh:0:bucket:01", 10)
    pipe.execute.assert_called_once()


def test_batch_add_empty_is_noop(fake_redis, storage_cls):
    st = storage_cls()
    st.batch_add([])
    st._client.pipeline.assert_not_called()


def test_get_bucket_coerces_ints(fake_redis, storage_cls):
    st = storage_cls(prefix="lsh")
    st._client.smembers.return_value = {b"4", b"7"}
    assert st.get_bucket(0, b"\x01") == {4, 7}
    st._client.smembers.assert_called_once_with("lsh:0:bucket:01")


def test_remove_indices_scans_and_srems(fake_redis, storage_cls):
    st = storage_cls(prefix="lsh")
    st._client.scan_iter.return_value = iter(["lsh:0:bucket:01", "lsh:1:bucket:02"])
    pipe = st._client.pipeline.return_value
    st.remove_indices([5, 6])
    st._client.scan_iter.assert_called_once_with(match="lsh:*:bucket:*", count=1000)
    assert pipe.srem.call_count == 2
    pipe.srem.assert_any_call("lsh:0:bucket:01", 5, 6)
    pipe.execute.assert_called_once()


def test_clear_deletes_prefix_keys(fake_redis, storage_cls):
    st = storage_cls(prefix="lsh")
    st._client.scan_iter.return_value = iter(["lsh:a", "lsh:b"])
    st.clear()
    st._client.delete.assert_called_once_with("lsh:a", "lsh:b")


def test_pipeline_contextmanager_executes_and_resets(fake_redis, storage_cls):
    st = storage_cls()
    pipe = st._client.pipeline.return_value
    with st.pipeline() as p:
        assert p is pipe
    pipe.execute.assert_called_once()
    pipe.reset.assert_called_once()


def test_pipeline_contextmanager_resets_on_error(fake_redis, storage_cls):
    st = storage_cls()
    pipe = st._client.pipeline.return_value
    with pytest.raises(RuntimeError):
        with st.pipeline():
            raise RuntimeError("boom")
    pipe.execute.assert_not_called()
    pipe.reset.assert_called_once()
