"""Query-time id filtering (IdFilter / where=): exactness vs brute force.

The reference has no filtering concept — callers must post-filter, which
breaks top-k semantics (`/root/reference/lshrs/core/main.py:524` always
ranks the full candidate set). `lshrs_tpu` pre-filters ON DEVICE: a
filtered query returns the exact top-k over the admitted subset, on every
engine and backend. These tests pin that contract against NumPy oracles.
"""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_tpu import LSHRS, IdFilter
from lshrs_tpu.hash.hasher import LSHHasher
from lshrs_tpu.storage.device import DeviceStore
from lshrs_tpu.storage.filter import as_filter

B, R, D = 4, 8, 32


@pytest.fixture
def hasher() -> LSHHasher:
    return LSHHasher(num_bands=B, rows_per_band=R, dim=D, seed=42)


def make_store(**kw) -> DeviceStore:
    defaults = dict(num_bands=B, rows_per_band=R, chunk_size=64, initial_capacity=64)
    defaults.update(kw)
    return DeviceStore(**defaults)


def oracle_topk(words, ids, qw, k, admitted=None):
    """Exact (count desc, id asc) over the admitted subset."""
    n = words.shape[0]
    eq = (words == qw[None, :]).reshape(n, B, -1).all(-1)
    counts = eq.sum(-1)
    cand = sorted(
        (-int(c), int(i))
        for c, i in zip(counts, ids)
        if c > 0 and (admitted is None or int(i) in admitted)
    )
    return [(i, -c) for c, i in cand[:k]]


def _got(out_ids, counts, qi):
    return [(int(i), int(c)) for i, c in zip(out_ids[qi], counts[qi]) if c > 0]


# ---------------------------------------------------------------------------
# DeviceStore collision top-k
# ---------------------------------------------------------------------------


def test_topk_allowlist_vs_oracle(hasher, rng):
    n = 500
    X = rng.standard_normal((n, D)).astype(np.float32)
    ids = rng.permutation(100_000)[:n]
    words = hasher.hash_batch_words_host(X)
    store = make_store()
    store.add_signature_batch(ids, words)

    allow = set(int(i) for i in ids[::3])
    filt = IdFilter(allowed_ids=sorted(allow))
    queries = rng.standard_normal((15, D)).astype(np.float32)
    qw = hasher.hash_batch_words_host(queries)
    counts, out_ids = store.query_topk(qw, 20, where=filt)
    for qi in range(queries.shape[0]):
        assert _got(out_ids, counts, qi) == oracle_topk(words, ids, qw[qi], 20, allow)


def test_topk_denylist_and_combined(hasher, rng):
    n = 300
    X = rng.standard_normal((n, D)).astype(np.float32)
    ids = np.arange(n)
    words = hasher.hash_batch_words_host(X)
    store = make_store()
    store.add_signature_batch(ids, words)
    qw = hasher.hash_batch_words_host(X[:5])

    deny = set(range(0, n, 2))
    filt = IdFilter(disallowed_ids=sorted(deny))
    counts, out_ids = store.query_topk(qw, 10, where=filt)
    admitted = set(range(n)) - deny
    for qi in range(5):
        assert _got(out_ids, counts, qi) == oracle_topk(words, ids, qw[qi], 10, admitted)

    both = IdFilter(allowed_ids=list(range(0, n, 3)), disallowed_ids=list(range(0, n, 9)))
    admitted2 = set(range(0, n, 3)) - set(range(0, n, 9))
    counts, out_ids = store.query_topk(qw, 10, where=both)
    for qi in range(5):
        assert _got(out_ids, counts, qi) == oracle_topk(words, ids, qw[qi], 10, admitted2)


def test_empty_allowlist_admits_nothing(hasher, rng):
    X = rng.standard_normal((20, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store = make_store()
    store.add_signature_batch(np.arange(20), words)
    counts, out_ids = store.query_topk(words[:3], 5, where=IdFilter(allowed_ids=[]))
    assert (counts == 0).all() and (out_ids == -1).all()


def test_array_shorthand_is_allowlist(hasher, rng):
    X = rng.standard_normal((40, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store = make_store()
    store.add_signature_batch(np.arange(40), words)
    # the exact self-match collides on all bands; only admitted ids return
    counts, out_ids = store.query_topk(words[:4], 1, where=[1, 3, 5, 7])
    for qi in range(4):
        got = _got(out_ids, counts, qi)
        assert all(i in (1, 3, 5, 7) for i, _ in got)
    # query 1 and 3 self-match within the allowlist
    assert out_ids[1][0] == 1 and out_ids[3][0] == 3


def test_filter_validation():
    with pytest.raises(ValueError, match="allowed_ids and/or disallowed_ids"):
        IdFilter()
    with pytest.raises(ValueError, match="non-negative"):
        IdFilter(allowed_ids=[-3, 1])
    assert as_filter(None) is None
    f = IdFilter(allowed_ids=[1])
    assert as_filter(f) is f
    assert as_filter([2, 1, 2]).allowed.tolist() == [1, 2]


def test_filter_staleness_on_mutation(hasher, rng):
    """The device cache is keyed by generation: mutations retarget it."""
    X = rng.standard_normal((30, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store = make_store()
    store.add_signature_batch(np.arange(30), words)
    filt = IdFilter(allowed_ids=list(range(30)))

    counts, out_ids = store.query_topk(words[:1], 1, where=filt)
    assert out_ids[0][0] == 0
    store.remove_indices([0])  # bump generation; id 0 now tombstoned
    counts, out_ids = store.query_topk(words[:1], 1, where=filt)
    assert 0 not in set(int(i) for i in out_ids[0])


def test_filter_shared_across_stores(hasher, rng):
    """One filter instance serves two stores (weakref-keyed cache)."""
    X = rng.standard_normal((20, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    s1, s2 = make_store(), make_store()
    s1.add_signature_batch(np.arange(20), words)
    s2.add_signature_batch(np.arange(10), words[:10])  # different contents
    filt = IdFilter(allowed_ids=[3, 15])
    _, i1 = s1.query_topk(words[15:16], 1, where=filt)
    _, i2 = s2.query_topk(words[15:16], 1, where=filt)
    assert i1[0][0] == 15        # admitted and present in s1
    assert 15 not in set(int(i) for i in i2[0])  # absent from s2


def test_filter_cache_reuse_zero_recompute(hasher, rng):
    X = rng.standard_normal((20, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store = make_store()
    store.add_signature_batch(np.arange(20), words)
    filt = IdFilter(allowed_ids=list(range(10)))
    a = filt.device_state(store)
    b = filt.device_state(store)
    assert a[0] is b[0] and a[1] is b[1]  # same cached device arrays


# ---------------------------------------------------------------------------
# Hamming / asymmetric ranking
# ---------------------------------------------------------------------------


def test_hamming_filtered_is_prefix_of_postfilter(hasher, rng):
    n = 200
    X = rng.standard_normal((n, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store = make_store(enable_hamming=True)
    store.add_signature_batch(np.arange(n), words)
    qw = hasher.hash_batch_words_host(X[:6])

    allow = list(range(0, n, 2))
    ham_f, ids_f = store.query_hamming(qw, 10, where=IdFilter(allowed_ids=allow))
    ham_all, ids_all = store.query_hamming(qw, n)
    for qi in range(6):
        post = [
            (int(i), int(h))
            for i, h in zip(ids_all[qi], ham_all[qi])
            if i >= 0 and int(i) % 2 == 0
        ][:10]
        got = [(int(i), int(h)) for i, h in zip(ids_f[qi], ham_f[qi]) if i >= 0]
        assert got == post


def test_asymmetric_filtered_is_prefix_of_postfilter(hasher, rng):
    from lshrs_tpu.ops.asymmetric import quantize_coords_np

    n = 160
    X = rng.standard_normal((n, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store = make_store(enable_hamming=True, hamming_storage="planes")
    store.add_signature_batch(np.arange(n), words)
    coords = hasher.hash_batch_coords_host(X[:5])
    qc, _ = quantize_coords_np(coords)

    allow = list(range(0, n, 3))
    dots_f, ids_f = store.query_asymmetric(qc, 8, where=IdFilter(allowed_ids=allow))
    dots_all, ids_all = store.query_asymmetric(qc, n)
    for qi in range(5):
        post = [
            (int(i), int(d))
            for i, d in zip(ids_all[qi], dots_all[qi])
            if i >= 0 and int(i) % 3 == 0
        ][:8]
        got = [(int(i), int(d)) for i, d in zip(ids_f[qi], dots_f[qi]) if i >= 0]
        assert got == post


# ---------------------------------------------------------------------------
# Fused top-p rerank (full + gather engines)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("engine", ["full", "gather"])
def test_topp_batch_filtered_vs_bruteforce(hasher, rng, engine):
    n = 240
    X = rng.standard_normal((n, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store = make_store(store_vectors=True, dim=D, rerank_engine=engine)
    store.add_signature_batch(np.arange(n), words, vectors=X)
    Q = X[:5] + 0.01 * rng.standard_normal((5, D)).astype(np.float32)
    qw = hasher.hash_batch_words_host(Q)

    allow = set(range(0, n, 2))
    ids, sims, cnt = store.query_topp_batch(
        qw, Q, 10, where=IdFilter(allowed_ids=sorted(allow))
    )
    eq = (words[None, :, :] == qw[:, None, :]).reshape(5, n, B, -1).all(-1)
    counts = eq.sum(-1)  # (5, n)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    cos = Qn @ Xn.T
    for qi in range(5):
        cand = [
            (-float(cos[qi, j]), int(j))
            for j in range(n)
            if counts[qi, j] > 0 and j in allow
        ]
        cand.sort()
        expected = [j for _, j in cand[:10]]
        got = [int(i) for i in ids[qi] if i >= 0][: len(expected)]
        assert got == expected
        assert int(cnt[qi]) == len(cand)


# ---------------------------------------------------------------------------
# Orchestrator surface (device + bucket backends)
# ---------------------------------------------------------------------------


def test_lshrs_query_where_device(rng):
    lsh = LSHRS(
        dim=D, num_perm=B * R, num_bands=B, rows_per_band=R,
        backend="device", chunk_size=64, initial_capacity=64,
        store_vectors=True,
    )
    n = 120
    X = rng.standard_normal((n, D)).astype(np.float32)
    lsh.index(list(range(n)), X)

    evens = list(range(0, n, 2))
    # top-k ids path
    out = lsh.query(X[10], top_k=5, where=evens)
    assert out and all(i % 2 == 0 for i in out) and out[0] == 10
    # the exact self-match is ODD -> excluded; 11 must never appear
    out = lsh.query(X[11], top_k=5, where=evens)
    assert all(i % 2 == 0 for i in out)
    # top-p scored path
    scored = lsh.query(X[10], top_k=5, top_p=1.0, where=evens)
    assert scored and scored[0][0] == 10 and all(i % 2 == 0 for i, _ in scored)
    # batch
    rows = lsh.query_batch(X[:4], top_k=3, where=evens)
    assert all(i % 2 == 0 for row in rows for i in row)
    # filtered get_above_p_batch
    res = lsh.get_above_p_batch(X[:4], p=1.0, top_k=3, where=evens)
    assert all(i % 2 == 0 for row in res for i, _ in row)


def test_lshrs_query_where_bucket_backend(rng):
    n = 60
    X = rng.standard_normal((n, D)).astype(np.float32)
    lsh = LSHRS(
        dim=D, num_perm=B * R, num_bands=B, rows_per_band=R, backend="memory",
        vector_fetch_fn=lambda idx: X[np.asarray(idx)],
    )
    lsh.index(list(range(n)), X)
    lsh.flush()
    evens = IdFilter(allowed_ids=list(range(0, n, 2)))
    out = lsh.query(X[8], top_k=5, where=evens)
    assert out and out[0] == 8 and all(i % 2 == 0 for i in out)
    out = lsh.query(X[9], top_k=5, where=evens)
    assert all(i % 2 == 0 for i in out)
    # scored top-p on the bucket backend (host rerank over admitted set)
    scored = lsh.query(X[8], top_k=3, top_p=1.0, where=evens)
    assert scored and scored[0][0] == 8 and all(i % 2 == 0 for i, _ in scored)


def test_lshrs_query_hamming_asymmetric_where(rng):
    lsh = LSHRS(
        dim=D, num_perm=B * R, num_bands=B, rows_per_band=R,
        backend="device", enable_hamming=True,
        chunk_size=64, initial_capacity=64,
    )
    n = 100
    X = rng.standard_normal((n, D)).astype(np.float32)
    lsh.index(list(range(n)), X)
    evens = list(range(0, n, 2))
    out = lsh.query_hamming(X[42], top_k=5, where=evens)
    assert out[0][0] == 42 and all(i % 2 == 0 for i, _ in out)
    out = lsh.query_hamming(X[43], top_k=5, where=evens)
    assert all(i % 2 == 0 for i, _ in out)
    out = lsh.query_asymmetric(X[42], top_k=5, where=evens)
    assert out[0][0] == 42 and all(i % 2 == 0 for i, _ in out)
    rows = lsh.query_hamming_batch(X[:4], top_k=5, where=evens)
    assert all(i % 2 == 0 for row in rows for i, _ in row)
    rows = lsh.query_asymmetric_batch(X[:4], top_k=5, where=evens)
    assert all(i % 2 == 0 for row in rows for i, _ in row)


def test_serving_fn_where_snapshot(rng):
    lsh = LSHRS(
        dim=D, num_perm=B * R, num_bands=B, rows_per_band=R,
        backend="device", chunk_size=64, initial_capacity=64,
        store_vectors=True,
    )
    n = 80
    X = rng.standard_normal((n, D)).astype(np.float32)
    lsh.index(list(range(n)), X)
    evens = list(range(0, n, 2))

    serve = lsh.serving_fn(5, mode="collision", where=evens)
    ids = serve(X[:6])
    live = ids[ids >= 0]
    assert live.size and (live % 2 == 0).all()
    assert ids[2][0] == 2  # self-match admitted

    serve_p = lsh.serving_fn(5, mode="topp", where=evens)
    ids, sims, cnt = serve_p(X[:6])
    live = ids[ids >= 0]
    assert live.size and (live % 2 == 0).all()
    assert ids[4][0] == 4 and sims[4][0] > 0.99


# ---------------------------------------------------------------------------
# Sharded store (8 virtual devices)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh():
    import jax

    from lshrs_tpu.parallel import make_mesh

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_filtered_matches_single_device(mesh, hasher, rng):
    from lshrs_tpu.parallel import ShardedDeviceStore

    n = 400
    X = rng.standard_normal((n, D)).astype(np.float32)
    ids = rng.permutation(50_000)[:n]
    words = hasher.hash_batch_words_host(X)
    single = make_store()
    sharded = ShardedDeviceStore(
        mesh=mesh, num_bands=B, rows_per_band=R, chunk_size=64,
        initial_capacity=64,
    )
    single.add_signature_batch(ids, words)
    sharded.add_signature_batch(ids, words)

    filt = IdFilter(allowed_ids=[int(i) for i in ids[::4]])
    qw = hasher.hash_batch_words_host(X[:8])
    c1, i1 = single.query_topk(qw, 15, where=filt)
    c2, i2 = sharded.query_topk(qw, 15, where=filt)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(i1, i2)
    # nnz agrees too (the bounded-enumeration probe)
    np.testing.assert_array_equal(
        single.query_nnz(qw, where=filt), sharded.query_nnz(qw, where=filt)
    )


def test_sharded_filtered_hamming_matches_single(mesh, hasher, rng):
    from lshrs_tpu.parallel import ShardedDeviceStore

    n = 320
    X = rng.standard_normal((n, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    single = make_store(enable_hamming=True)
    sharded = ShardedDeviceStore(
        mesh=mesh, num_bands=B, rows_per_band=R, chunk_size=64,
        initial_capacity=64, enable_hamming=True,
    )
    single.add_signature_batch(np.arange(n), words)
    sharded.add_signature_batch(np.arange(n), words)
    filt = IdFilter(disallowed_ids=list(range(0, n, 2)))
    qw = hasher.hash_batch_words_host(X[:6])
    h1, i1 = single.query_hamming(qw, 9, where=filt)
    h2, i2 = sharded.query_hamming(qw, 9, where=filt)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(i1, i2)


def test_sharded_filtered_gather_rerank_matches_single(mesh, hasher, rng):
    from lshrs_tpu.parallel import ShardedDeviceStore

    n = 240
    X = rng.standard_normal((n, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    single = make_store(store_vectors=True, dim=D, rerank_engine="gather")
    sharded = ShardedDeviceStore(
        mesh=mesh, num_bands=B, rows_per_band=R, chunk_size=64,
        initial_capacity=64, store_vectors=True, dim=D,
        rerank_engine="gather",
    )
    single.add_signature_batch(np.arange(n), words, vectors=X)
    sharded.add_signature_batch(np.arange(n), words, vectors=X)
    Q = X[:5] + 0.01 * rng.standard_normal((5, D)).astype(np.float32)
    qw = hasher.hash_batch_words_host(Q)
    filt = IdFilter(allowed_ids=list(range(0, n, 2)))
    i1, s1, n1 = single.query_topp_batch(qw, Q, 8, where=filt)
    i2, s2, n2 = sharded.query_topp_batch(qw, Q, 8, where=filt)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_serving_fn_where_matches_unfiltered_on_admitted(rng):
    """Filtering by ALL ids is a no-op: exact agreement with unfiltered."""
    lsh = LSHRS(
        dim=D, num_perm=B * R, num_bands=B, rows_per_band=R,
        backend="device", chunk_size=64, initial_capacity=64,
    )
    n = 90
    X = rng.standard_normal((n, D)).astype(np.float32)
    lsh.index(list(range(n)), X)
    plain = lsh.serving_fn(7)
    filtered = lsh.serving_fn(7, where=list(range(n)))
    np.testing.assert_array_equal(plain(X[:8]), filtered(X[:8]))
