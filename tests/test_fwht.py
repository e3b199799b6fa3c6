"""Structured (FWHT) hash family: parity, statistics, persistence.

The structured family (`lshrs_tpu.hash.fwht`) must be bit-identical
across its NumPy, native-C and JAX implementations (fixed butterfly
association), behave statistically like the Gaussian family (per-bit
collision probability 1 - angle/pi), and round-trip through every
persistence path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lshrs_tpu.core.main import LSHRS
from lshrs_tpu.hash.fwht import (
    MAX_DPAD,
    _structured_coords,
    fwht_np,
    next_pow2,
    structured_coords_jax,
    structured_coords_np,
    structured_diags,
)
from lshrs_tpu.hash.hasher import LSHHasher


def test_fwht_is_hadamard():
    h = fwht_np(np.eye(16, dtype=np.float32))
    # Unnormalised Hadamard: H H^T = d I, entries +-1.
    assert np.array_equal(np.abs(h), np.ones((16, 16)))
    assert np.allclose(h @ h.T, 16 * np.eye(16))


def test_next_pow2():
    assert next_pow2(768) == 1024
    assert next_pow2(1024) == 1024
    assert next_pow2(1) == 2


def test_structured_diags_shapes():
    d = structured_diags(7, dim=768, num_perm=256)
    assert d.shape == (1, 3, 1024)
    assert set(np.unique(d)) == {-1.0, 1.0}
    # num_perm wider than one rotation -> extra blocks
    d2 = structured_diags(7, dim=100, num_perm=300)
    assert d2.shape == (3, 3, 128)
    with pytest.raises(ValueError):
        structured_diags(7, dim=MAX_DPAD + 1, num_perm=8)


def test_coords_np_jax_c_bitwise_identical():
    rng = np.random.default_rng(0)
    for dim, num_perm in ((768, 256), (100, 300), (32, 16)):
        diags = structured_diags(3, dim=dim, num_perm=num_perm)
        x = rng.standard_normal((65, dim)).astype(np.float32)
        y_auto = structured_coords_np(x, diags, num_perm)  # C when available
        y_np = _structured_coords(x, diags, num_perm, fwht_np, np)
        y_j = np.asarray(structured_coords_jax(x, diags, num_perm))
        assert np.array_equal(y_auto.view(np.uint32), y_np.view(np.uint32))
        assert np.array_equal(y_j.view(np.uint32), y_np.view(np.uint32))


def test_collision_probability_matches_angle():
    """Per-bit disagreement rate ~ angle/pi, like the Gaussian family."""
    rng = np.random.default_rng(1)
    dim, num_perm = 128, 1024
    diags = structured_diags(11, dim=dim, num_perm=num_perm)
    a = rng.standard_normal((200, dim)).astype(np.float32)
    noise = rng.standard_normal((200, dim)).astype(np.float32)
    for target_cos in (0.95, 0.8, 0.5):
        theta = np.arccos(target_cos)
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        nn = noise - (noise * an).sum(1, keepdims=True) * an
        nn /= np.linalg.norm(nn, axis=1, keepdims=True)
        b = np.cos(theta) * an + np.sin(theta) * nn
        ya = structured_coords_np(an.astype(np.float32), diags, num_perm) > 0
        yb = structured_coords_np(b.astype(np.float32), diags, num_perm) > 0
        rate = (ya != yb).mean()
        assert abs(rate - theta / np.pi) < 0.02, (target_cos, rate)


def test_hasher_structured_paths_agree():
    h = LSHHasher(num_bands=8, rows_per_band=16, dim=48, seed=5,
                  hash_family="structured")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((33, 48)).astype(np.float32)
    host = h.hash_batch_words_host(x)
    dev = np.asarray(h.hash_batch_words(x))
    assert np.array_equal(host, dev)  # fixed association: exact across paths
    # single-vector path agrees with the batch path
    sig = h.hash_vector(x[0])
    assert np.array_equal(h.signature_to_words(sig), host[0])
    # dense wire carries the same bits
    from lshrs_tpu.ops.bitpack import dense_to_words

    dense = h.hash_batch_dense_host(x)
    w2 = np.asarray(
        dense_to_words(jnp.asarray(dense), num_bands=8, rows_per_band=16)
    )
    assert np.array_equal(w2, host)


def test_hasher_family_properties():
    g = LSHHasher(num_bands=2, rows_per_band=8, dim=16, seed=1)
    s = LSHHasher(num_bands=2, rows_per_band=8, dim=16, seed=1,
                  hash_family="structured")
    assert g.hash_family == "gaussian" and s.hash_family == "structured"
    with pytest.raises(ValueError):
        _ = s.projections
    with pytest.raises(ValueError):
        s.projections = [np.zeros((8, 16), np.float32)] * 2
    with pytest.raises(ValueError):
        _ = g.diagonals
    with pytest.raises(ValueError):
        g.diagonals = np.ones((1, 3, 16), np.float32)
    with pytest.raises(ValueError):
        s.diagonals = np.full(s.diagonals.shape, 2.0, np.float32)  # not +-1
    # legal round-trip through the setter
    s.diagonals = np.asarray(s.diagonals)
    with pytest.raises(ValueError):
        LSHHasher(num_bands=2, rows_per_band=8, dim=16, hash_family="fourier")


def test_fused_device_build_structured_self_match():
    from lshrs_tpu.storage.device import DeviceStore

    h = LSHHasher(num_bands=4, rows_per_band=16, dim=32, seed=9,
                  hash_family="structured")
    store = DeviceStore(num_bands=4, rows_per_band=16, dim=32, dedupe=False)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((200, 32)).astype(np.float32)
    store.add_vectors_batch(
        np.arange(200), x, h.device_projection(), hash_family="structured"
    )
    qw = h.hash_batch_words(x[:64])
    _, ids = store.query_topk(qw, 1)
    assert np.array_equal(ids[:, 0], np.arange(64))
    # host-hashed queries hit the same store bit-for-bit (fixed association)
    qh = h.hash_batch_words_host(x[64:128])
    _, ids2 = store.query_topk(qh, 1)
    assert np.array_equal(ids2[:, 0], np.arange(64, 128))


def test_lshrs_structured_end_to_end_and_persistence(tmp_path):
    lsh = LSHRS(
        dim=24, num_perm=64, num_bands=8, rows_per_band=8, seed=13,
        hash_family="structured", engine="collision", buffer_size=512,
    )
    rng = np.random.default_rng(4)
    x = rng.standard_normal((150, 24)).astype(np.float32)
    lsh.index(np.arange(150), x)
    lsh.flush()
    ref = lsh.get_top_k(x[7], topk=5)
    assert ref[0] == 7

    lsh.save_to_disk(tmp_path / "idx")
    assert (tmp_path / "idx" / "diagonals.npz").exists()
    back = LSHRS.load_from_disk(tmp_path / "idx")
    assert back._hasher.hash_family == "structured"
    assert np.array_equal(back._hasher.diagonals, lsh._hasher.diagonals)
    assert back.get_top_k(x[7], topk=5) == ref

    import pickle

    rt = pickle.loads(pickle.dumps(lsh))
    assert rt._hasher.hash_family == "structured"
    assert rt.get_top_k(x[7], topk=5) == ref


def test_native_hashing_thread_safe():
    """Concurrent host hashing is bit-stable (regression: the native
    kernel used one shared static scratch buffer with the GIL released
    during the ctypes call, so parallel butterflies interleaved)."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from lshrs_tpu.hash import fwht

    rng = np.random.default_rng(0)
    d = fwht.structured_diags(1, dim=768, num_perm=256)
    X = rng.standard_normal((2048, 768)).astype(np.float32)
    want = fwht.structured_coords_np(X, d, 256)
    with ThreadPoolExecutor(8) as ex:
        outs = list(
            ex.map(lambda _: fwht.structured_coords_np(X, d, 256), range(16))
        )
    for o in outs:
        np.testing.assert_array_equal(o, want)
