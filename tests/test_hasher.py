"""Hasher contracts: determinism, packing parity, device/host agreement."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lshrs_tpu._config.config import HashSignatures
from lshrs_tpu.hash.hasher import LSHHasher


def reference_hash(projections, vec) -> tuple[bytes, ...]:
    """Oracle: the reference's per-band GEMV + packbits(little) algorithm
    (/root/reference/lshrs/hash/lsh.py:171-211), reimplemented in NumPy."""
    out = []
    for proj in projections:
        binary = (proj @ vec) > 0
        out.append(np.packbits(binary.astype(np.uint8), bitorder="little").tobytes())
    return tuple(out)


@pytest.mark.parametrize(
    "num_bands, rows_per_band, dim",
    [(0, 1, 1), (1, 0, 1), (1, 1, 0)],
)
def test_invalid_init_parameters(num_bands, rows_per_band, dim):
    with pytest.raises(ValueError):
        LSHHasher(num_bands=num_bands, rows_per_band=rows_per_band, dim=dim)


def test_hash_vector_deterministic_and_shapes():
    num_bands, rows_per_band, dim = 3, 5, 4
    vector = np.arange(dim, dtype=np.float32)

    a = LSHHasher(num_bands=num_bands, rows_per_band=rows_per_band, dim=dim, seed=123)
    b = LSHHasher(num_bands=num_bands, rows_per_band=rows_per_band, dim=dim, seed=123)

    sig_a, sig_b = a.hash_vector(vector), b.hash_vector(vector)
    assert isinstance(sig_a, HashSignatures)
    assert sig_a.as_tuple() == sig_b.as_tuple()
    assert len(sig_a) == num_bands
    expected_len = math.ceil(rows_per_band / 8)
    for band in sig_a:
        assert isinstance(band, bytes)
        assert len(band) == expected_len


def test_different_seeds_diverge():
    dim = 64
    vec = np.random.default_rng(0).standard_normal(dim).astype(np.float32)
    a = LSHHasher(num_bands=8, rows_per_band=8, dim=dim, seed=1)
    b = LSHHasher(num_bands=8, rows_per_band=8, dim=dim, seed=2)
    assert a.hash_vector(vec).as_tuple() != b.hash_vector(vec).as_tuple()


def test_projection_stream_matches_reference_layout():
    # The reference draws num_bands sequential (r, dim) matrices from one
    # seeded Generator (/root/reference/lshrs/hash/lsh.py:93-94); the fused
    # (num_perm, dim) draw must be row-for-row identical.
    rng = np.random.default_rng(99)
    expected = [rng.standard_normal((7, 12)).astype(np.float32) for _ in range(5)]
    hasher = LSHHasher(num_bands=5, rows_per_band=7, dim=12, seed=99)
    for exp, got in zip(expected, hasher.projections):
        np.testing.assert_array_equal(exp, got)


def test_packing_parity_with_reference_algorithm():
    for r in (4, 8, 13, 32, 40, 64):
        hasher = LSHHasher(num_bands=3, rows_per_band=r, dim=24, seed=5)
        vec = np.random.default_rng(r).standard_normal(24).astype(np.float32)
        assert hasher.hash_vector(vec).as_tuple() == reference_hash(
            hasher.projections, vec
        ), f"packing mismatch at rows_per_band={r}"


def test_hash_vector_dimension_mismatch():
    hasher = LSHHasher(num_bands=2, rows_per_band=3, dim=4)
    with pytest.raises(ValueError):
        hasher.hash_vector(np.arange(5, dtype=np.float32))


def test_hash_batch_roundtrip():
    hasher = LSHHasher(num_bands=4, rows_per_band=6, dim=16, seed=3)
    batch = np.random.default_rng(1).standard_normal((10, 16)).astype(np.float32)
    sigs = hasher.hash_batch(batch)
    assert len(sigs) == 10
    for i, sig in enumerate(sigs):
        assert sig.as_tuple() == hasher.hash_vector(batch[i]).as_tuple()


def test_hash_batch_validation():
    hasher = LSHHasher(num_bands=2, rows_per_band=4, dim=8)
    with pytest.raises(ValueError, match="2D"):
        hasher.hash_batch(np.zeros(8))
    with pytest.raises(ValueError, match="dimension 8"):
        hasher.hash_batch(np.zeros((3, 9)))


def test_device_words_match_host_words():
    hasher = LSHHasher(num_bands=4, rows_per_band=40, dim=32, seed=11)
    batch = np.random.default_rng(2).standard_normal((33, 32)).astype(np.float32)
    dev = np.asarray(hasher.hash_batch_words(batch))
    host = hasher.hash_batch_words_host(batch)
    assert dev.dtype == np.uint32
    np.testing.assert_array_equal(dev, host)


def test_words_signature_roundtrip():
    hasher = LSHHasher(num_bands=3, rows_per_band=20, dim=8, seed=0)
    vec = np.random.default_rng(4).standard_normal(8).astype(np.float32)
    words = hasher.hash_batch_words_host(vec[None, :])[0]
    sig = hasher.words_to_signature(words)
    assert sig.as_tuple() == hasher.hash_vector(vec).as_tuple()
    np.testing.assert_array_equal(hasher.signature_to_words(sig), words)


def test_projections_setter_validation_and_effect():
    hasher = LSHHasher(num_bands=2, rows_per_band=4, dim=8, seed=0)
    with pytest.raises(ValueError):
        hasher.projections = [np.zeros((4, 8), np.float32)]  # wrong count
    other = LSHHasher(num_bands=2, rows_per_band=4, dim=8, seed=77)
    hasher.projections = other.projections
    vec = np.random.default_rng(6).standard_normal(8).astype(np.float32)
    assert hasher.hash_vector(vec).as_tuple() == other.hash_vector(vec).as_tuple()


def test_hash_signatures_normalizes_bytearray():
    sig = HashSignatures((bytearray(b"\x01\x02"), b"\xff"))
    assert sig.bands == (b"\x01\x02", b"\xff")
    assert sig[0] == b"\x01\x02"
    assert list(sig) == [b"\x01\x02", b"\xff"]
    assert len(sig) == 2


def test_dense_wire_roundtrip():
    """dense wire bytes -> device words == direct word hashing, any r."""
    import jax.numpy as jnp

    from lshrs_tpu.hash.hasher import LSHHasher
    from lshrs_tpu.ops.bitpack import dense_to_words

    rng = np.random.default_rng(5)
    for bands, rows in ((16, 16), (4, 8), (3, 40), (2, 64), (4, 12), (2, 21)):
        h = LSHHasher(num_bands=bands, rows_per_band=rows, dim=24, seed=1)
        X = rng.standard_normal((33, 24)).astype(np.float32)
        dense = h.hash_batch_dense_host(X)
        assert dense.dtype == np.uint8
        assert dense.shape == (33, bands * (-(-rows // 8)))
        words = dense_to_words(
            jnp.asarray(dense), num_bands=bands, rows_per_band=rows
        )
        np.testing.assert_array_equal(
            np.asarray(words), h.hash_batch_words_host(X)
        )
