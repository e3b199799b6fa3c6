"""Orchestrator contracts: validation, queries, semantics, lifecycle.

Most tests are parametrized over both engine styles — the bucket-dict fake
(host query path) and the device signature store (fused kernel path) — to
pin identical observable behaviour.
"""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_tpu import LSHRS
from lshrs_tpu.storage.memory import MemoryStorage


@pytest.fixture(params=["memory", "device"])
def make_any_lsh(request, make_lsh, make_device_lsh):
    """Factory fixture running the test against both backends."""
    if request.param == "memory":
        return make_lsh
    return make_device_lsh


# ---------------------------------------------------------------------------
# constructor validation
# ---------------------------------------------------------------------------


def test_constructor_rejects_bad_dim():
    with pytest.raises(ValueError, match="dimensionality"):
        LSHRS(dim=0)


def test_constructor_rejects_bad_num_perm():
    with pytest.raises(ValueError, match="num_perm"):
        LSHRS(dim=8, num_perm=0)


def test_constructor_rejects_bad_buffer_size():
    with pytest.raises(ValueError, match="buffer_size"):
        LSHRS(dim=8, buffer_size=0)


def test_constructor_rejects_band_mismatch():
    with pytest.raises(ValueError, match="num_bands \\* rows_per_band"):
        LSHRS(dim=8, num_perm=16, num_bands=3, rows_per_band=4)


def test_constructor_auto_configures_bands():
    lsh = LSHRS(dim=8, num_perm=128, backend="memory")
    stats = lsh.stats()
    assert stats["num_bands"] * stats["rows_per_band"] == 128


def test_constructor_rejects_unknown_backend():
    with pytest.raises(ValueError, match="backend"):
        LSHRS(dim=8, backend="carrier-pigeon")


# ---------------------------------------------------------------------------
# ingest validation
# ---------------------------------------------------------------------------


def test_ingest_rejects_negative_index(make_any_lsh):
    lsh = make_any_lsh()
    with pytest.raises(ValueError, match="non-negative"):
        lsh.ingest(-1, np.ones(32, np.float32))


def test_ingest_rejects_wrong_dimension(make_any_lsh):
    lsh = make_any_lsh()
    with pytest.raises(ValueError, match="dimension 32"):
        lsh.ingest(0, np.ones(31, np.float32))


def test_ingest_rejects_zero_vector(make_any_lsh):
    lsh = make_any_lsh()
    with pytest.raises(ValueError, match="zero vector"):
        lsh.ingest(0, np.zeros(32, np.float32))


def test_query_rejects_zero_vector(make_any_lsh):
    lsh = make_any_lsh()
    lsh.index([0], np.ones((1, 32), np.float32))
    with pytest.raises(ValueError, match="zero vector"):
        lsh.query(np.zeros(32, np.float32))


# ---------------------------------------------------------------------------
# batch index
# ---------------------------------------------------------------------------


def test_index_empty_is_noop(make_any_lsh):
    lsh = make_any_lsh()
    lsh.index([], None)
    assert lsh.query(np.ones(32, np.float32), top_k=None) == []


def test_index_shape_validation(make_any_lsh):
    lsh = make_any_lsh()
    with pytest.raises(ValueError, match="shape \\(n, 32\\)"):
        lsh.index([0, 1], np.ones((2, 31), np.float32))
    with pytest.raises(ValueError, match="does not match number of indices"):
        lsh.index([0, 1, 2], np.ones((2, 32), np.float32))


def test_index_rejects_zero_rows(make_any_lsh):
    lsh = make_any_lsh()
    vecs = np.ones((3, 32), np.float32)
    vecs[1] = 0.0
    with pytest.raises(ValueError, match="zero vector"):
        lsh.index([0, 1, 2], vecs)


def test_index_operation_count(make_lsh, mock_storage):
    lsh = make_lsh(dim=4, num_bands=2, rows_per_band=2, num_perm=4)
    lsh.index([0, 1, 2], np.eye(3, 4, dtype=np.float32) + 0.1)
    # 3 vectors * 2 bands = 6 bucket operations
    assert mock_storage.total_operations == 6
    assert mock_storage.unique_indices == {0, 1, 2}


def test_index_uses_fetch_fn_when_vectors_missing(make_any_lsh, rng):
    X = rng.standard_normal((5, 32)).astype(np.float32)
    lsh = make_any_lsh(vector_fetch_fn=lambda ids: X[np.asarray(ids)])
    lsh.index([0, 1, 2, 3, 4])
    assert lsh.get_top_k(X[2], topk=1) == [2]


def test_index_without_fetch_fn_raises(make_any_lsh):
    lsh = make_any_lsh()
    with pytest.raises(RuntimeError, match="vector_fetch_fn"):
        lsh.index([0, 1])


# ---------------------------------------------------------------------------
# end-to-end statistical behaviour
# ---------------------------------------------------------------------------


def test_self_match_and_near_duplicate(make_any_lsh, rng):
    lsh = make_any_lsh(dim=32, num_bands=8, rows_per_band=4, num_perm=32)
    X = rng.standard_normal((100, 32)).astype(np.float32)
    lsh.index(list(range(100)), X)

    # exact self-match must rank first (maximal band collisions)
    assert lsh.get_top_k(X[42], topk=5)[0] == 42

    # a tiny perturbation of an indexed vector should retrieve it
    noisy = X[7] + 0.01 * rng.standard_normal(32).astype(np.float32)
    assert 7 in lsh.get_top_k(noisy, topk=5)


def test_backends_agree_exactly(make_lsh, make_device_lsh, rng):
    """The fused device path must reproduce the host bucket path verbatim."""
    X = rng.standard_normal((150, 32)).astype(np.float32)
    a = make_lsh()
    b = make_device_lsh()
    a.index(list(range(150)), X)
    b.index(list(range(150)), X)
    for qi in range(10):
        q = rng.standard_normal(32).astype(np.float32)
        assert a.query(q, top_k=None) == b.query(q, top_k=None)
        assert a.get_top_k(q, topk=7) == b.get_top_k(q, topk=7)


# ---------------------------------------------------------------------------
# query modes and validation
# ---------------------------------------------------------------------------


def test_query_empty_index_returns_empty(make_any_lsh):
    lsh = make_any_lsh()
    assert lsh.query(np.ones(32, np.float32), top_k=5) == []


def test_query_top_k_zero_raises_with_candidates(make_any_lsh):
    lsh = make_any_lsh()
    vec = np.ones(32, np.float32)
    lsh.index([0], vec[None, :])
    with pytest.raises(ValueError, match="top_k must be greater than zero"):
        lsh.query(vec, top_k=0)


def test_query_top_k_none_returns_all(make_any_lsh, rng):
    lsh = make_any_lsh()
    vec = np.ones(32, np.float32)
    lsh.index(list(range(10)), np.tile(vec, (10, 1)))
    out = lsh.query(vec, top_k=None)
    assert out == list(range(10))  # tie on count -> ascending id


def test_query_top_p_validation(make_any_lsh):
    lsh = make_any_lsh(vector_fetch_fn=lambda ids: np.ones((len(ids), 32), np.float32))
    vec = np.ones(32, np.float32)
    lsh.index([0], vec[None, :])
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="top_p"):
            lsh.query(vec, top_p=bad)


def test_query_top_p_requires_fetch_fn(make_any_lsh):
    lsh = make_any_lsh()
    vec = np.ones(32, np.float32)
    lsh.index([0], vec[None, :])
    with pytest.raises(RuntimeError, match="vector_fetch_fn"):
        lsh.query(vec, top_p=0.5)


def test_query_top_p_contract(make_any_lsh, rng):
    X = rng.standard_normal((40, 32)).astype(np.float32)
    lsh = make_any_lsh(
        dim=32,
        num_bands=8,
        rows_per_band=4,
        num_perm=32,
        vector_fetch_fn=lambda ids: X[np.asarray(ids)],
    )
    lsh.index(list(range(40)), X)

    results = lsh.get_above_p(X[3], p=0.2)
    assert results, "self-match must produce candidates"
    ids = [i for i, _ in results]
    scores = [s for _, s in results]
    assert ids[0] == 3 and abs(scores[0] - 1.0) < 1e-5
    assert scores == sorted(scores, reverse=True)
    assert all(isinstance(i, int) and isinstance(s, float) for i, s in results)

    # cutoff arithmetic: max(1, ceil(n * p)), additionally capped by top_k
    all_cands = lsh.query(X[3], top_k=None)
    n = len(all_cands)
    expected = max(1, -(-n * 2 // 10))  # ceil(n * 0.2)
    assert len(results) == expected

    capped = lsh.query(X[3], top_p=1.0, top_k=2)
    assert len(capped) == min(2, n)


def test_query_top_p_fetch_validation(make_any_lsh):
    vec = np.ones(32, np.float32)
    lsh = make_any_lsh(vector_fetch_fn=lambda ids: np.ones((len(ids), 31), np.float32))
    lsh.index([0], vec[None, :])
    with pytest.raises(ValueError, match="Fetched vectors"):
        lsh.query(vec, top_p=0.5)

    lsh2 = make_any_lsh(vector_fetch_fn=lambda ids: np.ones((len(ids) + 1, 32), np.float32))
    lsh2.index([0], vec[None, :])
    with pytest.raises(ValueError, match="mismatched batch size"):
        lsh2.query(vec, top_p=0.5)


def test_device_top_p_with_resident_payload(make_device_lsh, rng):
    """store_vectors=True reranks without any vector_fetch_fn."""
    X = rng.standard_normal((30, 32)).astype(np.float32)
    lsh = make_device_lsh(store_vectors=True)
    lsh.index(list(range(30)), X)
    results = lsh.get_above_p(X[9], p=0.3)
    assert results[0][0] == 9
    assert abs(results[0][1] - 1.0) < 1e-5


def test_query_batch(make_any_lsh, rng):
    X = rng.standard_normal((60, 32)).astype(np.float32)
    lsh = make_any_lsh()
    lsh.index(list(range(60)), X)
    batched = lsh.query_batch(X[:8], top_k=4)
    assert len(batched) == 8
    for i, row in enumerate(batched):
        assert row == lsh.get_top_k(X[i], topk=4)
    with pytest.raises(ValueError, match="top_k"):
        lsh.query_batch(X[:2], top_k=0)


# ---------------------------------------------------------------------------
# delete / clear / stats
# ---------------------------------------------------------------------------


def test_delete_single_and_sequence(make_any_lsh, rng):
    X = rng.standard_normal((20, 32)).astype(np.float32)
    lsh = make_any_lsh()
    lsh.index(list(range(20)), X)
    lsh.delete(7)
    assert 7 not in lsh.query(X[7], top_k=None)
    lsh.delete([8, 9])
    remaining = lsh.query(X[8], top_k=None)
    assert 8 not in remaining and 9 not in remaining


def test_clear_empties_index(make_any_lsh, rng):
    X = rng.standard_normal((10, 32)).astype(np.float32)
    lsh = make_any_lsh()
    lsh.index(list(range(10)), X)
    lsh.clear()
    assert lsh.query(X[0], top_k=None) == []


def test_stats_snapshot(make_any_lsh):
    lsh = make_any_lsh()
    stats = lsh.stats()
    assert stats["dimension"] == 32
    assert stats["num_perm"] == 16
    assert stats["num_bands"] == 4
    assert stats["rows_per_band"] == 4
    assert stats["buffer_size"] == 10_000
    assert "similarity_threshold" in stats
    assert "redis_prefix" in stats


def test_device_stats_counters(make_device_lsh, rng):
    lsh = make_device_lsh()
    X = rng.standard_normal((12, 32)).astype(np.float32)
    lsh.index(list(range(12)), X)
    lsh.delete([0, 1])
    idx = lsh.stats()["index"]
    assert idx["alive"] == 10
    assert idx["tombstones"] == 2
    assert idx["capacity"] % idx["chunk_size"] == 0


# ---------------------------------------------------------------------------
# flush failure and loader resolution
# ---------------------------------------------------------------------------


def test_flush_failure_restores_buffer(make_lsh):
    failing = MemoryStorage(fail_on_flush=True)
    lsh = make_lsh(dim=4, num_bands=2, rows_per_band=2, num_perm=4, storage=failing)
    lsh.ingest(0, np.ones(4, np.float32))
    with pytest.raises(ConnectionError):
        lsh.flush()
    # operations preserved, order intact; a later flush retries them
    assert lsh.stats()["buffered_operations"] == 2
    failing._fail_on_flush = False
    lsh.flush()
    assert lsh.stats()["buffered_operations"] == 0
    assert failing.total_operations == 2


def test_resolve_loader_aliases(make_any_lsh):
    lsh = make_any_lsh()
    from lshrs_tpu.io.parquet import iter_parquet_vectors
    from lshrs_tpu.io.postgres import iter_postgres_vectors

    assert lsh._resolve_loader("pg") is iter_postgres_vectors
    assert lsh._resolve_loader("PostgreS") is iter_postgres_vectors
    assert lsh._resolve_loader("pq") is iter_parquet_vectors
    assert lsh._resolve_loader("parquet") is iter_parquet_vectors


def test_resolve_loader_rejects_csv(make_any_lsh):
    lsh = make_any_lsh()
    with pytest.raises(ValueError, match="Unsupported signature creation format 'csv'"):
        lsh._resolve_loader("csv")


# ---------------------------------------------------------------------------
# determinism
# ---------------------------------------------------------------------------


def test_same_seed_same_results(make_device_lsh, rng):
    X = rng.standard_normal((50, 32)).astype(np.float32)
    q = rng.standard_normal(32).astype(np.float32)
    a = make_device_lsh(seed=7)
    b = make_device_lsh(seed=7)
    a.index(list(range(50)), X)
    b.index(list(range(50)), X)
    assert a.query(q, top_k=None) == b.query(q, top_k=None)


def test_different_seed_diverges(make_device_lsh, rng):
    X = rng.standard_normal((200, 32)).astype(np.float32)
    q = rng.standard_normal(32).astype(np.float32)
    a = make_device_lsh(seed=7)
    b = make_device_lsh(seed=8)
    a.index(list(range(200)), X)
    b.index(list(range(200)), X)
    assert a.query(q, top_k=None) != b.query(q, top_k=None)


def test_hash_mode_host_device_backend(rng):
    from lshrs_tpu import LSHRS

    lsh = LSHRS(
        dim=24, num_perm=16, num_bands=4, rows_per_band=4,
        backend="device", chunk_size=128, initial_capacity=128,
        hash_mode="host",
    )
    X = rng.standard_normal((50, 24)).astype(np.float32)
    lsh.index(list(range(50)), X)
    assert lsh.get_top_k(X[7], topk=1) == [7]
    assert lsh.query_batch(X[:3], top_k=1) == [[0], [1], [2]]
    assert lsh._tpu_config["hash_mode"] == "host"

    with pytest.raises(ValueError, match="hash_mode"):
        LSHRS(dim=8, num_perm=4, num_bands=2, rows_per_band=2, hash_mode="gpu")


def test_hash_mode_roundtrips_via_persistence(tmp_path, rng):
    from lshrs_tpu import LSHRS

    lsh = LSHRS(
        dim=16, num_perm=8, num_bands=2, rows_per_band=4,
        backend="device", chunk_size=128, initial_capacity=128,
        hash_mode="host",
    )
    X = rng.standard_normal((20, 16)).astype(np.float32)
    lsh.index(list(range(20)), X)
    lsh.save_to_disk(tmp_path / "m")
    back = LSHRS.load_from_disk(tmp_path / "m")
    assert back._tpu_config["hash_mode"] == "host"
    assert back.get_top_k(X[3], topk=1) == [3]


def test_hash_mode_host_with_store_vectors_and_rerank(rng):
    """Dense-wire ingest must carry payload rows through the buffer/flush
    path so top-p reranking works in host-hash mode."""
    from lshrs_tpu import LSHRS

    lsh = LSHRS(
        dim=24, num_perm=16, num_bands=4, rows_per_band=4,
        backend="device", chunk_size=128, initial_capacity=128,
        hash_mode="host", store_vectors=True, buffer_size=1000,
    )
    X = rng.standard_normal((40, 24)).astype(np.float32)
    # exercise both the buffered single-ingest path and the batch path
    for i in range(5):
        lsh.ingest(i, X[i])
    lsh.index(list(range(5, 40)), X[5:])
    assert lsh.stats()["index"]["alive"] == 40
    top = lsh.get_above_p(X[7], p=0.2)
    assert top[0][0] == 7 and top[0][1] > 0.999
    batch = lsh.get_above_p_batch(X[:4], p=0.2, top_k=5)
    assert [r[0][0] for r in batch] == [0, 1, 2, 3]


def test_serving_fn_all_modes(make_device_lsh, rng):
    """The public serving closures must agree with the per-call query
    APIs and go stale after a mutation."""
    import pytest

    base = rng.standard_normal((60, 32)).astype(np.float32)
    lsh = make_device_lsh(store_vectors=True, enable_hamming=True)
    lsh.index(list(range(60)), base)
    Q = base[:5]

    ids = lsh.serving_fn(4)(Q)
    assert ids.shape == (5, 4)
    expect = lsh.query_batch(Q, top_k=4)
    for qi in range(5):
        assert [i for i in ids[qi] if i >= 0] == expect[qi]

    hids = lsh.serving_fn(3, mode="hamming")(Q)
    hexpect = lsh.query_hamming_batch(Q, top_k=3)
    for qi in range(5):
        assert [i for i in hids[qi] if i >= 0] == [i for i, _ in hexpect[qi]]

    tids, tsims, tn = lsh.serving_fn(3, mode="topp")(Q)
    assert (tids[:, 0] == np.arange(5)).all()
    np.testing.assert_allclose(tsims[:, 0], 1.0, atol=1e-5)

    serve = lsh.serving_fn(3)
    lsh.index([99], rng.standard_normal((1, 32)).astype(np.float32))
    with pytest.raises(RuntimeError, match="stale"):
        serve(Q)


def test_serving_fn_validation(make_device_lsh, make_lsh, rng):
    import pytest

    lsh = make_device_lsh(store_vectors=True)
    lsh.index([0, 1], rng.standard_normal((2, 32)).astype(np.float32))
    with pytest.raises(ValueError, match="mode"):
        lsh.serving_fn(3, mode="cosine")
    with pytest.raises(ValueError, match="top_k"):
        lsh.serving_fn(0)
    with pytest.raises(ValueError, match="wire_dtype"):
        lsh.serving_fn(3, wire_dtype="fp8")
    gated = make_device_lsh(engine="collision")
    gated.index([0, 1], rng.standard_normal((2, 32)).astype(np.float32))
    with pytest.raises(RuntimeError, match="enable_hamming"):
        gated.serving_fn(3, mode="hamming")
    serve = lsh.serving_fn(3)
    with pytest.raises(ValueError, match="shape"):
        serve(np.ones((2, 8), np.float32))
    bucket = make_lsh()
    with pytest.raises(RuntimeError, match="device backend"):
        bucket.serving_fn(3)


def test_serving_fn_auto_refresh(rng):
    """auto_refresh=True serves through mutations: the closure
    re-snapshots the current contents instead of raising stale."""
    from lshrs_tpu import LSHRS

    lsh = LSHRS(
        dim=16, num_perm=32, num_bands=4, rows_per_band=8,
        engine="collision", initial_capacity=256,
    )
    X = rng.standard_normal((120, 16)).astype(np.float32)
    lsh.index(np.arange(120), X)
    serve = lsh.serving_fn(top_k=3, auto_refresh=True)
    assert serve(X[:4])[:, 0].tolist() == [0, 1, 2, 3]

    # mutate: default closures would now raise RuntimeError("stale")
    Y = rng.standard_normal((4, 16)).astype(np.float32)
    lsh.index([500, 501, 502, 503], Y)
    got = serve(Y)  # transparently re-snapshots, new ids are visible
    assert got[:, 0].tolist() == [500, 501, 502, 503]

    strict = lsh.serving_fn(top_k=3)
    lsh.delete([500])
    with pytest.raises(RuntimeError, match="stale"):
        strict(Y)
    assert serve(X[:2])[:, 0].tolist() == [0, 1]  # refreshed again
