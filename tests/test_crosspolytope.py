"""Cross-polytope hash family: geometry, parity, oracle, engine gates,
persistence, probing, tuner.

The family's contract (`lshrs_tpu/hash/crosspolytope.py`): each band's key
is the signed-argmax symbol of an independent FWHT rotation, encoded as the
band's ``r = log2(2 * cp_dims)`` little-endian bits — so band-word equality
is symbol equality and the whole collision engine applies unchanged, while
bit-semantic estimators (Hamming / asymmetric) are rejected.
"""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_tpu import LSHRS
from lshrs_tpu.hash.crosspolytope import (
    cp_bits_np,
    cp_diags,
    cp_dims_for,
    cp_probe_bits_np,
    max_cp_probes,
    validate_cp_geometry,
)
from lshrs_tpu.hash.hasher import LSHHasher
from lshrs_tpu.utils.cp import (
    compute_cp_false_rates,
    cp_collision_probability,
    find_optimal_cp_br,
    get_optimal_cp_config,
)

RNG = np.random.default_rng(20260818)


def _unit_rows(n: int, dim: int, rng=RNG) -> np.ndarray:
    x = rng.standard_normal((n, dim)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# geometry / construction
# ---------------------------------------------------------------------------


def test_cp_geometry_validation():
    validate_cp_geometry(dim=100, rows_per_band=8)  # cp_dims=128 == dpad
    with pytest.raises(ValueError, match="rows_per_band >= 2"):
        validate_cp_geometry(dim=100, rows_per_band=1)
    with pytest.raises(ValueError, match="reduce rows_per_band"):
        validate_cp_geometry(dim=100, rows_per_band=9)  # cp_dims=256 > 128
    assert cp_dims_for(8) == 128
    assert max_cp_probes(4) == 8


def test_cp_hasher_construction_and_diags():
    h = LSHHasher(num_bands=6, rows_per_band=5, dim=24, seed=3,
                  hash_family="crosspolytope")
    assert h.diagonals.shape == (6, 3, 32)  # one rotation block per band
    assert np.all(np.abs(h.diagonals) == 1.0)
    with pytest.raises(ValueError, match="no projection matrices"):
        _ = h.projections
    # seeded determinism / divergence
    h2 = LSHHasher(num_bands=6, rows_per_band=5, dim=24, seed=3,
                   hash_family="crosspolytope")
    h3 = LSHHasher(num_bands=6, rows_per_band=5, dim=24, seed=4,
                   hash_family="crosspolytope")
    assert np.array_equal(h.diagonals, h2.diagonals)
    assert not np.array_equal(h.diagonals, h3.diagonals)


def test_cp_infeasible_rows_raises_at_construction():
    with pytest.raises(ValueError, match="reduce rows_per_band"):
        LSHHasher(num_bands=2, rows_per_band=12, dim=24,
                  hash_family="crosspolytope")


# ---------------------------------------------------------------------------
# signature structure
# ---------------------------------------------------------------------------


def test_cp_words_are_symbols_in_range():
    b, r, dim = 4, 5, 48  # cp_dims = 16, symbols < 32
    h = LSHHasher(num_bands=b, rows_per_band=r, dim=dim,
                  hash_family="crosspolytope")
    x = _unit_rows(64, dim)
    words = h.hash_batch_words_host(x)  # (n, b) — one word per band (r<=32)
    assert words.shape == (64, b)
    assert words.max() < 2 ** r
    # the symbol's axis index must range over cp_dims, its sign over both
    syms = words.astype(np.int64)
    axes = syms // 2
    assert axes.max() < cp_dims_for(r)
    assert (syms % 2 == 0).any() and (syms % 2 == 1).any()


def test_cp_bits_decode_back_to_symbols():
    b, r, dim = 3, 4, 20
    diags = cp_diags(9, dim=dim, num_bands=b)
    x = _unit_rows(32, dim)
    bits = cp_bits_np(x, diags, num_bands=b, rows_per_band=r)
    assert bits.shape == (32, b * r)
    sym = np.zeros((32, b), dtype=np.int64)
    for j in range(r):
        sym += bits[:, j::r].astype(np.int64) << j
    assert sym.max() < 2 ** r


def test_cp_signature_bytes_width():
    h = LSHHasher(num_bands=4, rows_per_band=9, dim=512,
                  hash_family="crosspolytope")
    sig = h.hash_vector(_unit_rows(1, 512)[0])
    assert len(sig) == 4
    assert all(len(band) == 2 for band in sig)  # ceil(9/8) = 2 bytes


def test_cp_host_device_bit_parity():
    b, r, dim = 8, 6, 96
    h = LSHHasher(num_bands=b, rows_per_band=r, dim=dim, seed=11,
                  hash_family="crosspolytope")
    x = _unit_rows(128, dim)
    host = h.hash_batch_words_host(x)
    dev = np.asarray(h.hash_batch_words(x))
    assert np.array_equal(host, dev)


def test_cp_hash_vector_matches_batch():
    h = LSHHasher(num_bands=5, rows_per_band=4, dim=40,
                  hash_family="crosspolytope")
    x = _unit_rows(8, 40)
    batch = h.hash_batch(x)
    for i in range(8):
        assert h.hash_vector(x[i]).as_tuple() == batch[i].as_tuple()


def test_cp_coords_host_raises():
    h = LSHHasher(num_bands=4, rows_per_band=4, dim=32,
                  hash_family="crosspolytope")
    with pytest.raises(ValueError, match="asymmetric"):
        h.hash_batch_coords_host(_unit_rows(4, 32))


# ---------------------------------------------------------------------------
# multi-probe
# ---------------------------------------------------------------------------


def test_cp_probe_bits_contract():
    b, r, dim = 4, 5, 48  # cp_dims = 16
    h = LSHHasher(num_bands=b, rows_per_band=r, dim=dim,
                  hash_family="crosspolytope")
    x = _unit_rows(16, dim)
    t = 4
    probes = h.hash_batch_probe_words_host(x, t)  # (n, T, b)
    assert probes.shape == (16, t, b)
    # probe 0 is the plain signature
    assert np.array_equal(probes[:, 0], h.hash_batch_words_host(x))
    # a band's probe symbols are pairwise distinct (distinct argmax axes)
    for bi in range(b):
        col = probes[:, :, bi]
        for i in range(16):
            assert len(set(col[i].tolist())) == t
    # device twin is bit-identical
    dev = np.asarray(h.hash_batch_probe_words(x, t))
    assert np.array_equal(probes, dev)
    # bound: cp_dims, not rows_per_band
    assert max_cp_probes(r) == 16
    h.hash_batch_probe_words_host(x, 16)
    with pytest.raises(ValueError, match="cp_dims"):
        h.hash_batch_probe_words_host(x, 17)


def test_cp_probe_dense_wire_roundtrip():
    from lshrs_tpu.ops.bitpack import dense_to_words

    import jax.numpy as jnp

    b, r, dim = 4, 5, 48
    h = LSHHasher(num_bands=b, rows_per_band=r, dim=dim,
                  hash_family="crosspolytope")
    x = _unit_rows(8, dim)
    dense = h.hash_batch_probe_dense_host(x, 3)  # (n, 3, b * ceil(r/8))
    words = h.hash_batch_probe_words_host(x, 3)
    for t in range(3):
        dec = np.asarray(
            dense_to_words(jnp.asarray(dense[:, t]), num_bands=b, rows_per_band=r)
        )
        assert np.array_equal(dec, words[:, t])


def test_cp_probe_bits_np_tie_rule_matches_topk():
    # ties in |coord| order by ascending axis in both host and device paths
    diags = cp_diags(5, dim=16, num_bands=2)
    x = _unit_rows(64, 16)
    bits = cp_probe_bits_np(x, diags, num_bands=2, rows_per_band=3, n_probes=4)
    assert bits.shape == (64, 4, 6)


# ---------------------------------------------------------------------------
# engine integration: oracle + end-to-end
# ---------------------------------------------------------------------------


def _brute_counts(qwords: np.ndarray, swords: np.ndarray) -> np.ndarray:
    """(Q, N) band-collision counts, one word per band."""
    return (qwords[:, None, :] == swords[None, :, :]).sum(axis=2)


def test_cp_device_store_matches_oracle():
    b, r, dim = 8, 5, 64
    lsh = LSHRS(dim=dim, num_perm=b * r, num_bands=b, rows_per_band=r,
                hash_family="crosspolytope", initial_capacity=1 << 9,
                chunk_size=128)
    x = _unit_rows(300, dim)
    lsh.index(list(range(300)), x)
    q = _unit_rows(12, dim, np.random.default_rng(7))
    swords = lsh._hasher.hash_batch_words_host(x)
    qwords = lsh._hasher.hash_batch_words_host(q)
    brute = _brute_counts(qwords, swords)
    for qi in range(12):
        got = lsh.get_top_k(q[qi], topk=10)
        order = np.lexsort((np.arange(300), -brute[qi]))
        want = [int(i) for i in order[:10] if brute[qi, i] > 0]
        assert got == want


def test_cp_self_match_and_topp():
    dim = 64
    lsh = LSHRS(dim=dim, num_perm=64, num_bands=16, rows_per_band=4,
                hash_family="crosspolytope", store_vectors=True,
                initial_capacity=1 << 9)
    x = _unit_rows(200, dim)
    lsh.index(list(range(200)), x)
    for i in (0, 57, 199):
        top = lsh.get_top_k(x[i], topk=3)
        assert top[0] == i  # self-match collides in every band
        above = lsh.get_above_p(x[i], p=0.01)
        assert above[0][0] == i
        assert above[0][1] == pytest.approx(1.0, abs=1e-5)


def test_cp_fused_build_matches_host_hash():
    from lshrs_tpu.storage.device import DeviceStore

    b, r, dim = 6, 4, 32
    h = LSHHasher(num_bands=b, rows_per_band=r, dim=dim, seed=2,
                  hash_family="crosspolytope")
    x = _unit_rows(100, dim)
    fused = DeviceStore(num_bands=b, rows_per_band=r, dim=dim,
                        initial_capacity=256, chunk_size=64)
    fused.add_vectors_batch(np.arange(100), x, h.device_projection(),
                            hash_family="crosspolytope")
    manual = DeviceStore(num_bands=b, rows_per_band=r, dim=dim,
                         initial_capacity=256, chunk_size=64)
    manual.add_signature_batch(np.arange(100), h.hash_batch_words_host(x))
    got = np.asarray(fused._sig_rows)[:100]
    want = np.asarray(manual._sig_rows)[:100]
    assert np.array_equal(got, want)


def test_cp_multiprobe_grows_candidates():
    dim = 64
    base = dict(dim=dim, num_perm=64, num_bands=16, rows_per_band=4,
                hash_family="crosspolytope", initial_capacity=1 << 9)
    x = _unit_rows(400, dim)
    q = x[:20] + 0.35 * _unit_rows(20, dim, np.random.default_rng(3))
    plain = LSHRS(**base)
    probed = LSHRS(**base, multiprobe=8)
    plain.index(list(range(400)), x)
    probed.index(list(range(400)), x)
    n_plain = sum(len(plain.query(qv, top_k=None)) for qv in q)
    n_probed = sum(len(probed.query(qv, top_k=None)) for qv in q)
    assert n_probed > n_plain


# ---------------------------------------------------------------------------
# gates
# ---------------------------------------------------------------------------


def test_cp_rejects_bit_semantic_engines():
    kw = dict(dim=32, num_perm=16, num_bands=4, rows_per_band=4,
              hash_family="crosspolytope")
    with pytest.raises(ValueError, match="sign-bit"):
        LSHRS(**kw, engine="hamming")
    with pytest.raises(ValueError, match="enable_hamming"):
        LSHRS(**kw, enable_hamming=True)
    lsh = LSHRS(**kw, engine="auto", initial_capacity=1 << 8)
    assert lsh._engine == "collision"
    assert lsh._tpu_config["enable_hamming"] is False
    x = _unit_rows(10, 32)
    lsh.index(list(range(10)), x)
    with pytest.raises((ValueError, RuntimeError)):
        lsh.query_asymmetric(x[0], top_k=3)
    with pytest.raises(ValueError, match="sign-bit"):
        lsh.serving_fn(mode="hamming")
    with pytest.raises(ValueError, match="sign-bit"):
        lsh.serving_fn(mode="asymmetric")


def test_cp_rehash_boundary_gate():
    x = _unit_rows(50, 32)
    signed = LSHRS(dim=32, num_perm=16, num_bands=4, rows_per_band=4,
                   store_vectors=True, enable_hamming=True,
                   initial_capacity=1 << 8)
    signed.index(list(range(50)), x)
    with pytest.raises(ValueError, match="cross-polytope boundary"):
        signed.rehash(hash_family="crosspolytope")


def test_cp_rehash_matches_fresh_build():
    x = _unit_rows(80, 32)
    lsh = LSHRS(dim=32, num_perm=16, num_bands=4, rows_per_band=4,
                store_vectors=True, engine="collision",
                initial_capacity=1 << 8)
    lsh.index(list(range(80)), x)
    lsh.rehash(hash_family="crosspolytope", seed=5)
    fresh = LSHRS(dim=32, num_perm=16, num_bands=4, rows_per_band=4,
                  hash_family="crosspolytope", seed=5, store_vectors=True,
                  initial_capacity=1 << 8)
    fresh.index(list(range(80)), x)
    q = _unit_rows(6, 32, np.random.default_rng(8))
    for qv in q:
        assert lsh.get_top_k(qv, topk=5) == fresh.get_top_k(qv, topk=5)


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------


def test_cp_save_load_roundtrip(tmp_path):
    lsh = LSHRS(dim=48, num_perm=20, num_bands=4, rows_per_band=5,
                hash_family="crosspolytope", store_vectors=True,
                initial_capacity=1 << 8)
    x = _unit_rows(60, 48)
    lsh.index(list(range(60)), x)
    lsh.save_to_disk(tmp_path / "idx")
    restored = LSHRS.load_from_disk(tmp_path / "idx")
    assert restored._hasher.hash_family == "crosspolytope"
    assert np.array_equal(restored._hasher.diagonals, lsh._hasher.diagonals)
    q = _unit_rows(5, 48, np.random.default_rng(1))
    for qv in q:
        assert restored.get_top_k(qv, topk=5) == lsh.get_top_k(qv, topk=5)


def test_cp_pickle_roundtrip():
    import pickle

    lsh = LSHRS(dim=32, num_perm=16, num_bands=4, rows_per_band=4,
                hash_family="crosspolytope", initial_capacity=1 << 8)
    x = _unit_rows(40, 32)
    lsh.index(list(range(40)), x)
    clone = pickle.loads(pickle.dumps(lsh))
    assert clone._hasher.hash_family == "crosspolytope"
    q = _unit_rows(4, 32, np.random.default_rng(2))
    for qv in q:
        assert clone.get_top_k(qv, topk=5) == lsh.get_top_k(qv, topk=5)


# ---------------------------------------------------------------------------
# tuner
# ---------------------------------------------------------------------------


def test_cp_collision_probability_endpoints_and_monotonicity():
    assert cp_collision_probability(1.0, 16) == pytest.approx(1.0)
    assert cp_collision_probability(0.0, 16) == pytest.approx(0.0)
    # coarse monotonicity (MC noise-tolerant): quartile means increase
    vals = [cp_collision_probability(s, 16) for s in np.linspace(0, 1, 16)]
    q = np.array(vals).reshape(4, -1).mean(axis=1)
    assert np.all(np.diff(q) > 0)
    # more buckets -> lower random-collision rate at low similarity
    assert cp_collision_probability(0.3, 128) < cp_collision_probability(0.3, 4)


def test_cp_tuner_returns_valid_factorisation():
    b, r = get_optimal_cp_config(256, 0.8, dim=768)
    assert b * r == 256
    assert 2 <= r <= 11  # cp_dims <= next_pow2(768) = 1024
    # deterministic
    assert (b, r) == get_optimal_cp_config(256, 0.8, dim=768)
    fp, fn = compute_cp_false_rates(b, r, 0.8)
    assert 0 <= fp <= 1 and 0 <= fn <= 1
    best = find_optimal_cp_br(256, 0.8, 768)
    assert best[:2] == (b, r)


def test_cp_auto_config_in_constructor():
    lsh = LSHRS(dim=96, num_perm=64, similarity_threshold=0.8,
                hash_family="crosspolytope", initial_capacity=1 << 8)
    cfg = lsh.stats()
    assert cfg["num_bands"] * cfg["rows_per_band"] == 64
    assert 1 << (cfg["rows_per_band"] - 1) <= 128  # feasible at dim=96


# ---------------------------------------------------------------------------
# sharding
# ---------------------------------------------------------------------------


def test_cp_sharded_matches_unsharded():
    """CP over an 8-device mesh: fused sharded build + query parity with the
    single-device store (the sharded ``_hash_for_ingest`` dispatches the CP
    hash program; results must be bit-identical to the unsharded path)."""
    import jax

    from lshrs_tpu.parallel import ShardedDeviceStore, make_mesh

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    b, r, dim = 8, 4, 32
    sharded = LSHRS(
        dim=dim, num_perm=b * r, num_bands=b, rows_per_band=r,
        hash_family="crosspolytope",
        storage=ShardedDeviceStore(
            mesh=mesh, num_bands=b, rows_per_band=r,
            chunk_size=64, initial_capacity=128,
        ),
    )
    single = LSHRS(
        dim=dim, num_perm=b * r, num_bands=b, rows_per_band=r,
        hash_family="crosspolytope", backend="device",
        chunk_size=64, initial_capacity=128,
    )
    x = _unit_rows(120, dim)
    sharded.index(list(range(120)), x)
    single.index(list(range(120)), x)
    q = _unit_rows(16, dim, np.random.default_rng(3))
    for qi in range(16):
        assert sharded.query(q[qi], top_k=None) == single.query(
            q[qi], top_k=None
        )
    assert sharded.get_top_k(x[11], topk=3)[0] == 11
