"""Device-fused top-p rerank: agreement with the host rerank contract."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lshrs_tpu import LSHRS


@pytest.fixture
def populated(rng):
    X = rng.standard_normal((60, 32)).astype(np.float32)
    lsh = LSHRS(
        dim=32, num_perm=32, num_bands=8, rows_per_band=4,
        backend="device", store_vectors=True,
        chunk_size=128, initial_capacity=128,
    )
    lsh.index(list(range(60)), X)
    return lsh, X


def test_fused_topp_matches_host_path(populated, rng):
    lsh, X = populated
    # Same data through the host path (explicit fetch_fn disables fusion).
    host = LSHRS(
        dim=32, num_perm=32, num_bands=8, rows_per_band=4,
        backend="device", chunk_size=128, initial_capacity=128,
        vector_fetch_fn=lambda ids: X[np.asarray(ids)],
    )
    host.index(list(range(60)), X)

    for qi in (0, 7, 33):
        fused = lsh.get_above_p(X[qi], p=0.4)
        ref = host.get_above_p(X[qi], p=0.4)
        assert len(fused) == len(ref)
        assert fused[0][0] == ref[0][0] == qi
        for (fi, fs), (ri, rs) in zip(fused, ref):
            assert abs(fs - rs) < 1e-4
        # same id set (ordering may differ only on exact float ties)
        assert {i for i, _ in fused} == {i for i, _ in ref}


def test_fused_topp_cutoff_math(populated):
    lsh, X = populated
    all_cands = lsh.query(X[5], top_k=None)
    n = len(all_cands)
    out = lsh.get_above_p(X[5], p=0.25)
    assert len(out) == max(1, math.ceil(n * 0.25))
    capped = lsh.query(X[5], top_p=1.0, top_k=3)
    assert len(capped) == min(3, n)


def test_fused_topp_validation(populated):
    lsh, X = populated
    with pytest.raises(ValueError, match="top_p"):
        lsh.query(X[0], top_p=1.5)
    with pytest.raises(ValueError, match="top_k"):
        lsh.query(X[0], top_p=0.5, top_k=0)


def test_fused_topp_scores_descending_and_exact(populated):
    lsh, X = populated
    out = lsh.get_above_p(X[11], p=1.0)
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)
    # top score is the self-match cosine ~ 1.0
    assert abs(out[0][1] - 1.0) < 1e-5
    # verify one score against NumPy cosine
    some_id, some_score = out[min(2, len(out) - 1)]
    a, b = X[11], X[some_id]
    expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(some_score - expected) < 1e-4


def test_fused_topp_empty_index():
    lsh = LSHRS(
        dim=16, num_perm=16, num_bands=4, rows_per_band=4,
        backend="device", store_vectors=True,
        chunk_size=128, initial_capacity=128,
    )
    assert lsh.query(np.ones(16, np.float32), top_p=0.5) == []


def test_get_above_p_batch_matches_single(make_device_lsh, rng):
    lsh = make_device_lsh(dim=16, num_bands=2, rows_per_band=4, num_perm=8,
                          store_vectors=True)
    X = rng.standard_normal((60, 16)).astype(np.float32)
    lsh.index(list(range(60)), X)
    Q = X[:7] + 0.01 * rng.standard_normal((7, 16)).astype(np.float32)

    batch = lsh.get_above_p_batch(Q, p=0.5)
    for qi in range(7):
        single = lsh.query(Q[qi], top_k=None, top_p=0.5)
        assert [i for i, _ in batch[qi]] == [i for i, _ in single]
        np.testing.assert_allclose(
            [s for _, s in batch[qi]], [s for _, s in single], rtol=1e-5
        )

    # top_k cap applies per query
    capped = lsh.get_above_p_batch(Q, p=1.0, top_k=3)
    assert all(len(r) <= 3 for r in capped)


def test_get_above_p_batch_fallback_bucket_backend(make_lsh, rng):
    fetched = {}

    def fetch(idx):
        fetched["n"] = len(idx)
        return base[np.asarray(idx)]

    base = rng.standard_normal((30, 32)).astype(np.float32)
    lsh = make_lsh(vector_fetch_fn=fetch)
    lsh.index(list(range(30)), base)
    out = lsh.get_above_p_batch(base[:3], p=1.0)
    assert len(out) == 3
    assert all(r[0][1] > 0.99 for r in out)  # self-match first, score ~1


def test_get_above_p_batch_validation(make_device_lsh, rng):
    lsh = make_device_lsh(dim=16, num_bands=2, rows_per_band=4, num_perm=8,
                          store_vectors=True)
    with pytest.raises(ValueError, match="top_p"):
        lsh.get_above_p_batch(np.ones((2, 16), np.float32), p=1.5)
    with pytest.raises(ValueError, match="shape"):
        lsh.get_above_p_batch(np.ones((2, 8), np.float32), p=0.5)


def test_get_above_p_batch_bf16_wire(make_device_lsh, rng):
    """The bfloat16 query wire must return the same candidates with
    cosines within bf16 rounding of the f32-wire path."""
    base = rng.standard_normal((60, 32)).astype(np.float32)
    lsh = make_device_lsh(store_vectors=True)
    lsh.index(list(range(60)), base)
    Q = base[:5]
    f32 = lsh.get_above_p_batch(Q, p=1.0, top_k=5)
    bf16 = lsh.get_above_p_batch(Q, p=1.0, top_k=5, wire_dtype="bfloat16")
    for a, b in zip(f32, bf16):
        assert a[0][0] == b[0][0]  # self-match id identical
        np.testing.assert_allclose(
            [s for _, s in a], [s for _, s in b], atol=2e-2
        )
    with pytest.raises(ValueError, match="wire_dtype"):
        lsh.get_above_p_batch(Q, p=1.0, wire_dtype="fp8")


def test_snapshot_topp_fn_matches_batch_and_staleness(make_device_lsh, rng):
    """The compiled rerank closure must match query_topp_batch exactly
    (f32 wire) and raise once the store mutates."""
    base = rng.standard_normal((50, 32)).astype(np.float32)
    lsh = make_device_lsh(store_vectors=True)
    lsh.index(list(range(50)), base)
    store = lsh._storage
    h = lsh._hasher

    qv = base[:4]
    qw = h.hash_batch_words_host(qv)
    ref_ids, ref_sims, ref_n = store.query_topp_batch(qw, qv, 7)

    serve = store.snapshot_topp_fn(7, wire="words")
    ids, sims, n = (np.asarray(x) for x in serve(qw, qv))
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(sims, ref_sims, rtol=1e-6)
    np.testing.assert_array_equal(n, ref_n)

    dense = h.hash_batch_dense_host(qv)
    serve_d = store.snapshot_topp_fn(7, wire="dense")
    ids_d, _, _ = (np.asarray(x) for x in serve_d(dense, qv))
    np.testing.assert_array_equal(ids_d, ref_ids)

    # bf16 vectors round-trip through the same closure
    import ml_dtypes

    ids_bf, _, _ = (
        np.asarray(x) for x in serve(qw, qv.astype(ml_dtypes.bfloat16))
    )
    assert (ids_bf[:, 0] == ids[:, 0]).all()

    lsh.index([99], rng.standard_normal((1, 32)).astype(np.float32))
    with pytest.raises(RuntimeError, match="stale"):
        serve(qw, qv)


def test_bf16_payload_dtype(make_device_lsh, rng):
    """payload_dtype='bfloat16' halves payload memory and keeps rerank
    correct within bf16 rounding; the config round-trips persistence."""
    import pickle

    base = rng.standard_normal((50, 32)).astype(np.float32)
    f32 = make_device_lsh(store_vectors=True)
    bf16 = make_device_lsh(store_vectors=True, payload_dtype="bfloat16")
    f32.index(list(range(50)), base)
    bf16.index(list(range(50)), base)

    assert (
        bf16._storage.stats()["payload_bytes"]
        == f32._storage.stats()["payload_bytes"] // 2
    )

    a = f32.get_above_p_batch(base[:4], p=1.0, top_k=5)
    b = bf16.get_above_p_batch(base[:4], p=1.0, top_k=5)
    for ra, rb in zip(a, b):
        assert ra[0][0] == rb[0][0]  # self-match id
        np.testing.assert_allclose(
            [s for _, s in ra], [s for _, s in rb], atol=2e-2
        )

    # fetches come back as float32; persistence keeps the dtype config
    assert bf16._storage.get_vectors([3]).dtype == np.float32
    re = pickle.loads(pickle.dumps(bf16))
    assert re._tpu_config["payload_dtype"] == "bfloat16"
    assert re._storage.payload_dtype == "bfloat16"
    rb2 = re.get_above_p_batch(base[:4], p=1.0, top_k=5)
    for x, y in zip(b, rb2):
        assert [i for i, _ in x] == [i for i, _ in y]

    import pytest

    with pytest.raises(ValueError, match="payload_dtype"):
        make_device_lsh(store_vectors=True, payload_dtype="fp8")


def test_snapshot_topp_fn_dev_batch_slicing(make_device_lsh, rng):
    """In-program batch slicing (dev_batch) must be invisible in results.

    The gather engine's refine + payload gathers scale with
    Q x max_candidates (21.5 GB at 1M slots x 8k queries x the default
    budget — a compile-time OOM in the round-5 cp_bench run), so
    snapshot_topp_fn auto-slices inside the program. Exactness across
    the slice boundaries, for both engines, on a Q that does NOT divide
    evenly into dev_batch.
    """
    base = rng.standard_normal((60, 32)).astype(np.float32)
    lsh = make_device_lsh(store_vectors=True)
    lsh.index(list(range(60)), base)
    store = lsh._storage
    h = lsh._hasher

    qv = np.concatenate([base[:7], rng.standard_normal((3, 32)).astype(np.float32)])
    qw = h.hash_batch_words_host(qv)
    for eng in ("full", "gather"):
        whole = store.snapshot_topp_fn(5, wire="words", engine=eng)
        sliced = store.snapshot_topp_fn(
            5, wire="words", engine=eng, dev_batch=4
        )
        ids_w, sims_w, n_w = (np.asarray(x) for x in whole(qw, qv))
        ids_s, sims_s, n_s = (np.asarray(x) for x in sliced(qw, qv))
        np.testing.assert_array_equal(ids_s, ids_w)
        np.testing.assert_allclose(sims_s, sims_w, rtol=1e-6)
        np.testing.assert_array_equal(n_s, n_w)
