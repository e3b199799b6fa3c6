"""In-place retuning (`LSHRS.rehash` / `DeviceStore.rehash`).

The reference cannot change an index's operating point without
re-streaming every vector from the primary datastore
(`/root/reference/lshrs/core/main.py:315`); with the payload resident in
HBM, signatures rebuild on device in a few hash-matmul dispatches.
"""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_tpu import LSHRS
from lshrs_tpu.hash.hasher import LSHHasher
from lshrs_tpu.storage.device import DeviceStore


def _device_lsh(rng, n=300, dim=32, **kw):
    kw.setdefault("num_perm", 16)
    kw.setdefault("num_bands", 4)
    kw.setdefault("rows_per_band", 4)
    lsh = LSHRS(
        dim=dim, backend="device", store_vectors=True, seed=42,
        chunk_size=128, initial_capacity=128, **kw,
    )
    X = rng.standard_normal((n, dim)).astype(np.float32)
    lsh.index(list(range(n)), X)
    return lsh, X


def test_store_rehash_matches_fresh_build(rng):
    """f32 payload: rehashed signatures are bit-identical to a fresh
    device build under the new hasher."""
    dim, n = 32, 257  # odd count exercises pad slots
    old = LSHHasher(num_bands=4, rows_per_band=4, dim=dim, seed=1)
    new = LSHHasher(num_bands=8, rows_per_band=4, dim=dim, seed=9)
    X = rng.standard_normal((n, dim)).astype(np.float32)

    st = DeviceStore(
        num_bands=4, rows_per_band=4, dim=dim, store_vectors=True,
        chunk_size=128, initial_capacity=512, dedupe=False,
    )
    st.add_vectors_batch(np.arange(n), X, old.device_projection())
    st.rehash(new.device_projection(), num_bands=8, rows_per_band=4)
    assert st.num_bands == 8 and st.words == new.num_bands

    fresh = DeviceStore(
        num_bands=8, rows_per_band=4, dim=dim, store_vectors=True,
        chunk_size=128, initial_capacity=512, dedupe=False,
    )
    fresh.add_vectors_batch(np.arange(n), X, new.device_projection())
    np.testing.assert_array_equal(
        np.asarray(st._sig_rows[:n]), np.asarray(fresh._sig_rows[:n])
    )
    qw = np.asarray(new.hash_batch_words(X[:16]))
    c1, i1 = st.query_topk(qw, 5)
    c2, i2 = fresh.query_topk(qw, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_store_rehash_requires_payload(rng):
    st = DeviceStore(num_bands=4, rows_per_band=4, chunk_size=128,
                     initial_capacity=128)
    h = LSHHasher(num_bands=4, rows_per_band=4, dim=16, seed=0)
    with pytest.raises(RuntimeError, match="store_vectors"):
        st.rehash(h.device_projection(), num_bands=4, rows_per_band=4)


def test_lshrs_rehash_autotunes_banding(rng):
    lsh, X = _device_lsh(rng, num_perm=64, num_bands=None,
                         rows_per_band=None, similarity_threshold=0.5)
    before = (lsh._config["num_bands"], lsh._config["rows_per_band"])
    lsh.rehash(similarity_threshold=0.9)
    after = (lsh._config["num_bands"], lsh._config["rows_per_band"])
    assert before != after
    assert lsh._config["num_bands"] * lsh._config["rows_per_band"] == 64
    assert lsh.stats()["num_bands"] == lsh._config["num_bands"]
    # retuned index still serves: exact self-match through the full stack
    assert lsh.get_top_k(X[17], topk=1)[0] == 17
    res = lsh.get_above_p(X[17], p=0.1)
    assert res[0][0] == 17 and res[0][1] > 0.9999


def test_lshrs_rehash_explicit_banding_and_seed(rng):
    lsh, X = _device_lsh(rng)
    sig_before = np.asarray(lsh._storage._sig_rows[:10]).copy()
    lsh.rehash(num_bands=4, rows_per_band=4, seed=77)
    sig_after = np.asarray(lsh._storage._sig_rows[:10])
    assert not np.array_equal(sig_before, sig_after)  # new projections
    assert lsh._config["seed"] == 77
    assert lsh.get_top_k(X[3], topk=1)[0] == 3


def test_lshrs_rehash_validation(rng):
    lsh, _ = _device_lsh(rng)
    with pytest.raises(ValueError, match="both num_bands and rows_per_band"):
        lsh.rehash(num_bands=8)
    with pytest.raises(ValueError, match="must equal num_perm"):
        lsh.rehash(num_perm=32, num_bands=4, rows_per_band=4)
    mem = LSHRS(dim=8, num_perm=16, backend="memory")
    with pytest.raises(RuntimeError, match="device backend"):
        mem.rehash(similarity_threshold=0.9)
    no_payload = LSHRS(dim=8, num_perm=16, backend="device",
                       chunk_size=128, initial_capacity=128)
    with pytest.raises(RuntimeError, match="store_vectors"):
        no_payload.rehash(similarity_threshold=0.9)


def test_rehash_host_hash_mode_keeps_one_path(rng):
    """hash_mode='host' + gaussian rebuilds through the host hasher so
    stored and query signatures stay on one hash path."""
    lsh, X = _device_lsh(rng, hash_mode="host")
    lsh.rehash(num_bands=8, rows_per_band=2, seed=5)
    # host-hashed queries must self-match the rebuilt store exactly
    idx, count = lsh._ordered_candidates(X[9])[0]
    assert idx == 9 and count == 8  # all 8 bands collide


def test_rehash_preserves_deletes_and_ids(rng):
    lsh, X = _device_lsh(rng)
    lsh.delete([5, 6])
    alive_before = lsh.stats()["index"]["alive"]
    lsh.rehash(seed=3)
    assert lsh.stats()["index"]["alive"] == alive_before
    ids = [i for i, _ in lsh.get_above_p(X[5], p=1.0)]
    assert 5 not in ids


def test_rehash_int8_payload_self_match(rng):
    lsh, X = _device_lsh(rng, payload_dtype="int8")
    lsh.rehash(seed=11)
    # signatures now derive from the quantized rows; self-queries hash the
    # original vector — near-zero margins may flip, so assert rank not
    # exact band count.
    assert lsh.get_top_k(X[21], topk=1)[0] == 21


def test_rehash_hamming_planes_rebuild(rng):
    lsh, X = _device_lsh(rng, enable_hamming=True)
    _ = lsh.query_hamming(X[2], top_k=1)  # materialize planes
    assert lsh._storage._planes is not None
    lsh.rehash(seed=8)
    assert lsh._storage._planes is None  # dropped, rebuilt lazily
    got = lsh.query_hamming(X[2], top_k=1)
    assert got[0][0] == 2


def test_rehash_staleness_guard(rng):
    lsh, X = _device_lsh(rng)
    fn = lsh.serving_fn(1)
    lsh.rehash(seed=123)
    with pytest.raises(RuntimeError, match="stale"):
        fn(X[:4])


def test_sharded_rehash_matches_single_device(rng):
    from lshrs_tpu.parallel import ShardedDeviceStore, make_mesh

    dim, n = 32, 400
    old = LSHHasher(num_bands=4, rows_per_band=8, dim=dim, seed=1)
    new = LSHHasher(num_bands=8, rows_per_band=4, dim=dim, seed=2)
    X = rng.standard_normal((n, dim)).astype(np.float32)
    words = np.asarray(old.hash_batch_words(X))
    kw = dict(num_bands=4, rows_per_band=8, dim=dim, store_vectors=True,
              chunk_size=64, initial_capacity=64)
    single = DeviceStore(**kw)
    sharded = ShardedDeviceStore(mesh=make_mesh(8), **kw)
    single.add_signature_batch(np.arange(n), words, X)
    sharded.add_signature_batch(np.arange(n), words, X)
    for st in (single, sharded):
        st.rehash(new.device_projection(), num_bands=8, rows_per_band=4,
                  block_slots=64)
    np.testing.assert_array_equal(
        np.asarray(single._sig_rows[:n]), np.asarray(sharded._sig_rows[:n])
    )
    qw = np.asarray(new.hash_batch_words(X[:8]))
    c1, i1 = single.query_topk(qw, 5)
    c2, i2 = sharded.query_topk(qw, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_rehash_persistence_roundtrip(rng, tmp_path):
    lsh, X = _device_lsh(rng)
    lsh.rehash(num_bands=8, rows_per_band=2, seed=55)
    before = lsh.get_above_p(X[4], p=0.5)
    lsh.save_to_disk(tmp_path / "idx")
    re = LSHRS.load_from_disk(tmp_path / "idx")
    assert re._config["num_bands"] == 8 and re._config["seed"] == 55
    after = re.get_above_p(X[4], p=0.5)
    assert [i for i, _ in before] == [i for i, _ in after]
