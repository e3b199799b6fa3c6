"""Fused device build (hash + append in one program): parity + integration."""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_tpu import LSHRS
from lshrs_tpu.hash.hasher import LSHHasher
from lshrs_tpu.parallel import ShardedDeviceStore, make_mesh
from lshrs_tpu.storage.device import DeviceStore

B, R, D = 4, 8, 32


@pytest.fixture
def hasher():
    return LSHHasher(num_bands=B, rows_per_band=R, dim=D, seed=42)


def make_store(**kw) -> DeviceStore:
    defaults = dict(num_bands=B, rows_per_band=R, dim=D,
                    chunk_size=64, initial_capacity=64)
    defaults.update(kw)
    return DeviceStore(**defaults)


def test_fused_build_matches_two_stage(hasher, rng):
    X = rng.standard_normal((300, D)).astype(np.float32)
    ids = rng.permutation(10_000)[:300]

    fused = make_store()
    fused.add_vectors_batch(ids[:200], X[:200], hasher.device_projection())
    fused.add_vectors_batch(ids[200:], X[200:], hasher.device_projection())

    staged = make_store()
    staged.add_signature_batch(ids, np.asarray(hasher.hash_batch_words(X)))

    qw = np.asarray(hasher.hash_batch_words(X[:10]))
    c1, i1 = fused.query_topk(qw, 12)
    c2, i2 = staged.query_topk(qw, 12)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(c1, c2)
    # stored signature rows are bit-identical to the query hash path
    np.testing.assert_array_equal(
        np.asarray(fused._sig_rows[:300]), np.asarray(staged._sig_rows[:300])
    )


def test_fused_build_payload_and_planes(hasher, rng):
    X = rng.standard_normal((150, D)).astype(np.float32)
    store = make_store(store_vectors=True, enable_hamming=True,
                       hamming_storage="planes")
    store.add_vectors_batch(np.arange(150), X, hasher.device_projection())

    np.testing.assert_allclose(store.get_vectors([7])[0], X[7], rtol=1e-6)
    qw = np.asarray(hasher.hash_batch_words(X[:5]))
    ids, sims, n = store.query_topp_batch(qw, X[:5], 8)
    assert (ids[:, 0] == np.arange(5)).all()
    np.testing.assert_allclose(sims[:, 0], 1.0, atol=1e-5)
    h, hi = store.query_hamming(qw, 3)
    assert (hi[:, 0] == np.arange(5)).all() and (h[:, 0] == 0).all()


def test_fused_build_upsert_fallback(hasher, rng):
    X = rng.standard_normal((20, D)).astype(np.float32)
    store = make_store()
    store.add_vectors_batch(np.arange(20), X, hasher.device_projection())
    X2 = rng.standard_normal((5, D)).astype(np.float32)
    store.add_vectors_batch(np.arange(5), X2, hasher.device_projection())
    assert len(store) == 20  # upserted, not duplicated
    qw = np.asarray(hasher.hash_batch_words(X2[:1]))
    _, ids = store.query_topk(qw, 1)
    assert ids[0, 0] == 0


def test_fused_build_growth_and_validation(hasher, rng):
    X = rng.standard_normal((200, D)).astype(np.float32)
    store = make_store(initial_capacity=64)
    store.add_vectors_batch(np.arange(200), X, hasher.device_projection())
    assert len(store) == 200 and store._capacity >= 256
    with pytest.raises(ValueError, match="shape"):
        store.add_vectors_batch([0], X[:1, :8], hasher.device_projection())
    with pytest.raises(ValueError, match="indices"):
        store.add_vectors_batch([-1], X[:1], hasher.device_projection())


def test_sharded_fused_build_matches_single(hasher, rng):
    import jax

    assert len(jax.devices()) >= 8
    X = rng.standard_normal((250, D)).astype(np.float32)
    single = make_store(store_vectors=True)
    single.add_vectors_batch(np.arange(250), X, hasher.device_projection())
    sharded = ShardedDeviceStore(
        mesh=make_mesh(8), num_bands=B, rows_per_band=R, dim=D,
        store_vectors=True, chunk_size=64, initial_capacity=512,
    )
    sharded.add_vectors_batch(np.arange(250), X, hasher.device_projection())
    qw = np.asarray(hasher.hash_batch_words(X[:8]))
    c1, i1 = single.query_topk(qw, 10)
    c2, i2 = sharded.query_topk(qw, 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(c1, c2)


def test_orchestrator_index_uses_fused_path(rng, monkeypatch):
    lsh = LSHRS(dim=D, num_perm=B * R, num_bands=B, rows_per_band=R,
                backend="device", chunk_size=64, initial_capacity=64)
    calls = {"fused": 0}
    orig = lsh._storage.add_vectors_batch

    def spy(*a, **k):
        calls["fused"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(lsh._storage, "add_vectors_batch", spy)
    X = rng.standard_normal((40, D)).astype(np.float32)
    lsh.index(list(range(40)), X)
    assert calls["fused"] == 1
    assert lsh.get_top_k(X[3], topk=1) == [3]
    assert lsh.stats()["counters"]["vectors_ingested"] == 40

    # buffered singles are flushed BEFORE the fused batch (order kept)
    lsh.ingest(100, X[0] + 1.0)
    lsh.index([101, 102], X[1:3] + 1.0)
    assert len(lsh._storage) == 43
    assert lsh.stats()["buffered_operations"] == 0

    # host hash mode keeps the wire path (no fused build)
    host = LSHRS(dim=D, num_perm=B * R, num_bands=B, rows_per_band=R,
                 backend="device", hash_mode="host",
                 chunk_size=64, initial_capacity=64)
    assert not host._fused_ingest()
    host.index(list(range(10)), X[:10])
    assert host.get_top_k(X[4], topk=1) == [4]
