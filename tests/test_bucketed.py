"""Bucketed query engine: exactness vs the scan engine and the oracle."""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_tpu.hash.hasher import LSHHasher
from lshrs_tpu.storage.device import DeviceStore

B, R, D = 4, 8, 32


@pytest.fixture
def hasher():
    return LSHHasher(num_bands=B, rows_per_band=R, dim=D, seed=42)


def make_pair(**kw):
    base = dict(num_bands=B, rows_per_band=R, chunk_size=64, initial_capacity=64)
    base.update(kw)
    return (
        DeviceStore(query_mode="scan", **base),
        DeviceStore(query_mode="bucket", **base),
    )


def test_bucket_matches_scan_exactly(hasher, rng):
    scan, bucket = make_pair()
    n = 600
    X = rng.standard_normal((n, D)).astype(np.float32)
    ids = rng.permutation(50_000)[:n]
    words = hasher.hash_batch_words_host(X)
    scan.add_signature_batch(ids, words)
    bucket.add_signature_batch(ids, words)

    queries = rng.standard_normal((15, D)).astype(np.float32)
    qw = hasher.hash_batch_words_host(queries)
    c1, i1 = scan.query_topk(qw, 20)
    c2, i2 = bucket.query_topk(qw, 20)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(i1, i2)
    assert bucket.stats()["bucket_overflows"] == 0


def test_bucket_index_invalidation_on_mutation(hasher, rng):
    _, bucket = make_pair()
    X = rng.standard_normal((50, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    bucket.add_signature_batch(np.arange(50), words)

    counts, out = bucket.query_topk(words[3:4], 3)
    assert out[0][0] == 3

    # delete, then query again: the stale index must not resurrect id 3
    bucket.remove_indices([3])
    counts, out = bucket.query_topk(words[3:4], 3)
    assert 3 not in out[0]

    # append after a query: new data must be visible
    x_new = rng.standard_normal((1, D)).astype(np.float32)
    bucket.add_signature_batch([777], hasher.hash_batch_words_host(x_new))
    counts, out = bucket.query_topk(hasher.hash_batch_words_host(x_new), 1)
    assert out[0][0] == 777


def test_bucket_overflow_counted(hasher):
    # bucket_cap=2 with 8 identical signatures -> every query overflows.
    bucket = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64,
        initial_capacity=64, query_mode="bucket", bucket_cap=2,
    )
    vec = np.ones((1, D), np.float32)
    words = hasher.hash_batch_words_host(vec)
    bucket.add_signature_batch(
        np.arange(8), np.repeat(words, 8, axis=0)
    )
    counts, out = bucket.query_topk(words, 8)
    assert bucket.stats()["bucket_overflows"] > 0
    # truncated but still valid: returned candidates do have max counts
    assert all(c == B for c in counts[0][:2])


def test_bucket_wide_words(rng):
    # W = 2 (r = 40): folded 32-bit keys may collide; verification keeps
    # results exact.
    h = LSHHasher(num_bands=3, rows_per_band=40, dim=D, seed=9)
    scan = DeviceStore(num_bands=3, rows_per_band=40, chunk_size=64,
                       initial_capacity=64, query_mode="scan")
    bucket = DeviceStore(num_bands=3, rows_per_band=40, chunk_size=64,
                         initial_capacity=64, query_mode="bucket")
    X = rng.standard_normal((300, D)).astype(np.float32)
    words = h.hash_batch_words_host(X)
    scan.add_signature_batch(np.arange(300), words)
    bucket.add_signature_batch(np.arange(300), words)
    qw = h.hash_batch_words_host(rng.standard_normal((8, D)).astype(np.float32))
    c1, i1 = scan.query_topk(qw, 10)
    c2, i2 = bucket.query_topk(qw, 10)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(i1, i2)


def test_bucket_mode_validation():
    with pytest.raises(ValueError, match="query_mode"):
        DeviceStore(num_bands=B, rows_per_band=R, query_mode="sideways")


def test_bucket_falls_back_when_keys_would_overflow(hasher, rng, monkeypatch):
    """Past the int32 (count, tie) packing limit the bucket engine must
    yield to the chunked scan instead of silently corrupting keys."""
    import lshrs_tpu.storage.device as device_mod

    scan, bucket = make_pair()
    X = rng.standard_normal((200, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    scan.add_signature_batch(np.arange(200), words)
    bucket.add_signature_batch(np.arange(200), words)

    # Simulate a capacity where (num_bands+1)*key_scale(C) >= 2**31.
    monkeypatch.setattr(device_mod, "supports_fast_path", lambda *a: False)
    called = []
    monkeypatch.setattr(
        device_mod, "bucketed_topk",
        lambda *a, **k: called.append(1),
    )
    qw = hasher.hash_batch_words_host(rng.standard_normal((6, D)).astype(np.float32))
    c1, i1 = scan.query_topk(qw, 10)
    c2, i2 = bucket.query_topk(qw, 10)
    assert not called  # the bucket engine was gated off
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(i1, i2)
