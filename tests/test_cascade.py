"""Hamming refinement cascade (`hamming_cascade`): the >=4M-slot engine.

Correctness contract (see `lshrs_tpu.ops.hamming.hamming_topk_cascade_core`):
exact (hamming asc, id asc) top-k WITHIN the refined pool; equal to the
full-width exact ranking when the pool covers the whole store. These tests
pin that contract, the prefix-width plane maintenance across mutations,
serving-closure parity, persistence, and the local tie-rank key branch the
cascade uses past the grouped engines' int32 ceiling.
"""

from __future__ import annotations

import pickle

import numpy as np
import pytest

from lshrs_tpu import LSHRS
from lshrs_tpu.hash.hasher import LSHHasher
from lshrs_tpu.ops.hamming import hamming_topk_cascade_core
from lshrs_tpu.storage.device import DeviceStore

B, R, D = 8, 16, 32
P = B * R  # 128 bits; prefix = 32


@pytest.fixture
def hasher():
    return LSHHasher(num_bands=B, rows_per_band=R, dim=D, seed=42)


def bits_of(words, hasher):
    n = words.shape[0]
    out = np.zeros((n, P), np.uint8)
    for j in range(P):
        band, row = j // R, j % R
        word, bit = row // 32, row % 32
        out[:, j] = (words[:, band * hasher.words_per_band + word] >> bit) & 1
    return out


def _store(cascade=32, refine=256, **kw):
    kw.setdefault("num_bands", B)
    kw.setdefault("rows_per_band", R)
    kw.setdefault("chunk_size", 64)
    kw.setdefault("initial_capacity", 256)
    kw.setdefault("group_size", 8)
    return DeviceStore(
        enable_hamming=True,
        hamming_cascade=cascade,
        hamming_cascade_refine=refine,
        **kw,
    )


def test_cascade_full_pool_matches_exact(hasher, rng):
    """refine pool >= capacity => bit-identical to the exact engine."""
    n = 700
    X = rng.standard_normal((n, D)).astype(np.float32)
    ids = rng.permutation(50_000)[:n]
    words = hasher.hash_batch_words_host(X)

    exact = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64,
        initial_capacity=256, group_size=8, enable_hamming=True,
    )
    exact.add_signature_batch(ids, words)
    cas = _store(refine=1 << 20)
    cas.add_signature_batch(ids, words)

    qw = hasher.hash_batch_words_host(rng.standard_normal((16, D)).astype(np.float32))
    h0, i0 = exact.query_hamming(qw, 12)
    h1, i1 = cas.query_hamming(qw, 12)
    assert np.array_equal(i0, i1)
    assert np.array_equal(h0, h1)


def test_cascade_returns_correct_distances_and_order(hasher, rng):
    """Returned distances are true full-width Hammings in exact
    (hamming asc, id asc) order, and the top hit agrees with the
    full-width exact ranking on every query (the pool is deep enough
    that a rank-1 miss would be a bug, not cascade approximation)."""
    n = 600
    X = rng.standard_normal((n, D)).astype(np.float32)
    ids = np.arange(n)
    words = hasher.hash_batch_words_host(X)
    cas = _store(refine=128)
    cas.add_signature_batch(ids, words)

    queries = X[:20] + 0.05 * rng.standard_normal((20, D)).astype(np.float32)
    qw = hasher.hash_batch_words_host(queries)
    h, out = cas.query_hamming(qw, 10)

    xb = bits_of(words, hasher).astype(np.int32)
    qb = bits_of(qw, hasher).astype(np.int32)
    for qi in range(20):
        true_h = np.abs(xb - qb[qi]).sum(axis=1)
        # distances exact for every returned id
        for rank in range(10):
            if out[qi, rank] >= 0:
                assert h[qi, rank] == true_h[out[qi, rank]]
        got = list(zip(h[qi].tolist(), out[qi].tolist()))
        assert got == sorted(got)
        # near-duplicate query: rank-1 must match the exact ranking
        best = sorted(zip(true_h.tolist(), ids.tolist()))[0]
        assert (h[qi, 0], out[qi, 0]) == best


def test_cascade_agreement_statistical(hasher, rng):
    """On random data, a modest pool recovers almost all of the exact
    top-10 (the coarse prefix is itself a valid SimHash)."""
    n = 2000
    X = rng.standard_normal((n, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    exact = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64,
        initial_capacity=256, group_size=8, enable_hamming=True,
    )
    exact.add_signature_batch(np.arange(n), words)
    cas = _store(cascade=64, refine=512)
    cas.add_signature_batch(np.arange(n), words)

    qw = hasher.hash_batch_words_host(
        rng.standard_normal((32, D)).astype(np.float32)
    )
    _, i0 = exact.query_hamming(qw, 10)
    _, i1 = cas.query_hamming(qw, 10)
    overlap = np.mean([
        len(set(i0[q]) & set(i1[q])) / 10 for q in range(32)
    ])
    assert overlap >= 0.9, overlap


def test_cascade_prefix_planes_memory(hasher, rng):
    """Only the prefix columns are resident: hamming_plane_bytes reports
    cascade bytes/slot, and the plane array is (capacity, cascade)."""
    cas = _store(cascade=32)
    words = hasher.hash_batch_words_host(
        rng.standard_normal((100, D)).astype(np.float32)
    )
    cas.add_signature_batch(np.arange(100), words)
    cas.query_hamming(words[:1], 1)  # materializes planes
    assert cas._planes.shape == (cas._capacity, 32)
    st = cas.stats()
    assert st["hamming_cascade"] == 32
    assert st["hamming_plane_bytes"] == cas._capacity * 32


def test_cascade_after_mutations(hasher, rng):
    """Prefix planes stay in sync through delete, upsert, and growth."""
    cas = _store()
    X = rng.standard_normal((100, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    cas.add_signature_batch(np.arange(100), words)

    h, out = cas.query_hamming(words[5:6], 1)
    assert out[0][0] == 5 and h[0][0] == 0

    cas.remove_indices([5])
    _, out = cas.query_hamming(words[5:6], 3)
    assert 5 not in out[0]

    # upsert overwrites the prefix planes too
    x_new = rng.standard_normal((1, D)).astype(np.float32)
    w_new = hasher.hash_batch_words_host(x_new)
    cas.add_signature_batch([7], w_new)
    h, out = cas.query_hamming(w_new, 1)
    assert out[0][0] == 7 and h[0][0] == 0

    # growth past the initial capacity keeps the prefix width
    X2 = rng.standard_normal((400, D)).astype(np.float32)
    cas.add_signature_batch(
        np.arange(1000, 1400), hasher.hash_batch_words_host(X2)
    )
    assert cas._planes.shape[1] == 32
    w2 = hasher.hash_batch_words_host(X2[:1])
    h, out = cas.query_hamming(w2, 1)
    assert out[0][0] == 1000 and h[0][0] == 0


def test_cascade_serving_closure_parity(hasher, rng):
    cas = _store()
    X = rng.standard_normal((300, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    cas.add_signature_batch(np.arange(300), words)

    _, expect = cas.query_hamming(words[:8], 5)
    serve = cas.snapshot_query_fn(5, mode="hamming")
    got = np.asarray(serve(words[:8]))
    assert np.array_equal(got, expect)

    # mutation invalidates the snapshot
    cas.add_signature_batch([999], words[:1])
    with pytest.raises(RuntimeError, match="stale"):
        serve(words[:8])


def test_cascade_orchestrator_and_persistence(tmp_path, rng):
    lsh = LSHRS(
        dim=D, num_perm=P, num_bands=B, rows_per_band=R,
        engine="hamming", chunk_size=64, initial_capacity=256,
        group_size=8, hamming_cascade=32, hamming_cascade_refine=256,
    )
    X = rng.standard_normal((200, D)).astype(np.float32)
    lsh.index(list(range(200)), X)
    out = lsh.query_hamming(X[42], top_k=5)
    assert out[0][0] == 42

    lsh.save_to_disk(tmp_path / "idx")
    back = LSHRS.load_from_disk(tmp_path / "idx")
    assert back._tpu_config["hamming_cascade"] == 32
    assert back._tpu_config["hamming_cascade_refine"] == 256
    assert back._storage.hamming_cascade == 32
    assert back.query_hamming(X[42], top_k=5) == out

    clone = pickle.loads(pickle.dumps(lsh))
    assert clone._storage.hamming_cascade == 32
    assert clone.query_hamming(X[42], top_k=5) == out


def test_cascade_validation():
    with pytest.raises(ValueError, match="multiple of 32"):
        _store(cascade=33)
    with pytest.raises(ValueError, match="below num_perm"):
        _store(cascade=P)
    with pytest.raises(ValueError, match="enable_hamming"):
        DeviceStore(
            num_bands=B, rows_per_band=R, chunk_size=64,
            initial_capacity=256, hamming_cascade=32,
        )
    with pytest.raises(ValueError, match="greater than zero"):
        _store(refine=0)
    with pytest.raises(ValueError, match="enable_hamming"):
        LSHRS(
            dim=D, num_perm=P, num_bands=B, rows_per_band=R,
            engine="collision", hamming_cascade=32,
        )


def test_cascade_rejects_asymmetric(hasher, rng):
    from lshrs_tpu.ops.asymmetric import quantize_coords_np

    cas = _store()
    words = hasher.hash_batch_words_host(
        rng.standard_normal((50, D)).astype(np.float32)
    )
    cas.add_signature_batch(np.arange(50), words)
    qc = quantize_coords_np(np.zeros((1, P), np.float32))
    with pytest.raises(RuntimeError, match="asymmetric"):
        cas.query_asymmetric(qc, 3)
    with pytest.raises(RuntimeError, match="asymmetric"):
        cas.snapshot_query_fn(3, mode="asymmetric")


def test_cascade_local_tie_rank_branch(hasher, rng):
    """Past the int32 key ceiling the refine re-ranks ties locally; the
    results must stay exact (hamming asc, id asc). Exercised by passing
    an inflated num_perm so ``(p + 2) * key_scale(C) >= 2**31`` without
    allocating an 8M-slot store; the true distances come from the packed
    words, so only the key packing changes."""
    n = 512
    X = rng.standard_normal((n // 2, D)).astype(np.float32)
    words_half = hasher.hash_batch_words_host(X)
    # duplicate signatures force id tie-breaking inside the refine pool
    words = np.concatenate([words_half, words_half])
    ids = np.arange(n, dtype=np.int32)

    store = _store(cascade=32, refine=n, initial_capacity=n)
    store.add_signature_batch(ids, words)
    store._ensure_ranks()
    store._ensure_planes()

    qw = np.asarray(
        hasher.hash_batch_words_host(
            rng.standard_normal((8, D)).astype(np.float32)
        ),
        dtype=np.uint32,
    )
    import jax.numpy as jnp

    from lshrs_tpu.ops.hamming import unpack_bitplanes

    qbits = unpack_bitplanes(
        jnp.asarray(qw), num_bands=B, rows_per_band=R
    )[:, :32]
    # (big_p + 2) * key_scale(512) >= 2**31 triggers the branch, while the
    # 16-group pool keeps the local key ((big_p + 2) * 128) inside int32 —
    # exactly the regime of a real >=8M-slot store (tiny pool, huge scale).
    big_p = 1 << 22
    h_big, i_big = hamming_topk_cascade_core(
        store._planes, store._sig_t, store._ids, store._tie,
        qbits, jnp.asarray(qw),
        num_perm=big_p, k=10, refine_groups=16, chunk=64, group=8,
    )
    h_ref, i_ref = hamming_topk_cascade_core(
        store._planes, store._sig_t, store._ids, store._tie,
        qbits, jnp.asarray(qw),
        num_perm=P, k=10, refine_groups=16, chunk=64, group=8,
    )
    assert np.array_equal(np.asarray(i_big), np.asarray(i_ref))
    assert np.array_equal(np.asarray(h_big), np.asarray(h_ref))
    # duplicated signatures: ties broken by ascending id
    i_ref = np.asarray(i_ref)
    h_ref = np.asarray(h_ref)
    for q in range(8):
        pairs = list(zip(h_ref[q].tolist(), i_ref[q].tolist()))
        assert pairs == sorted(pairs)


def test_cascade_coarse_scale_helper():
    """Coarse-key packing: exact below the int32 ceiling, tie-shifted
    above it, always ``(p_pre + 2) * scale < 2**31`` with a power-of-two
    scale bounding the shifted tie range."""
    from lshrs_tpu.ops.hamming import cascade_coarse_scale
    from lshrs_tpu.ops.pallas_scan import key_scale

    # below the ceiling: untouched exact-selection format
    for p_pre, cap in [(32, 1 << 10), (64, 1 << 22), (128, 1 << 22)]:
        scale, shift = cascade_coarse_scale(p_pre, cap)
        assert (scale, shift) == (key_scale(cap), 0)
    # cb=128 at 16M slots (the 12.5M sizing's capacity): one shift
    scale, shift = cascade_coarse_scale(128, 1 << 24)
    assert (scale, shift) == ((1 << 24) >> 1, 1)
    # invariants across the sweep
    for p_pre in (32, 64, 96, 128, 224):
        for logc in range(10, 31):
            scale, shift = cascade_coarse_scale(p_pre, 1 << logc)
            assert (p_pre + 2) * scale < 2**31
            assert scale == key_scale(1 << logc) >> shift
            assert scale >= 1


def test_cascade_tie_shift_selection_exact_with_full_pool(
    hasher, rng, monkeypatch
):
    """With the coarse tie term right-shifted (the >=16M-capacity regime,
    forced here by inflating key_scale) and the refine pool covering the
    whole store, the cascade must still return the exact full-width
    (hamming asc, id asc) top-k: shifted ties only perturb group
    SELECTION, and a full pool makes selection irrelevant."""
    import jax.numpy as jnp

    import lshrs_tpu.ops.hamming as hamming_mod
    from lshrs_tpu.ops.hamming import unpack_bitplanes

    n = 512
    X = rng.standard_normal((n // 2, D)).astype(np.float32)
    words_half = hasher.hash_batch_words_host(X)
    words = np.concatenate([words_half, words_half])  # forced id ties
    ids = np.arange(n, dtype=np.int32)

    store = _store(cascade=32, refine=n, initial_capacity=n)
    store.add_signature_batch(ids, words)
    store._ensure_ranks()
    store._ensure_planes()

    qw = np.asarray(
        hasher.hash_batch_words_host(
            rng.standard_normal((8, D)).astype(np.float32)
        ),
        dtype=np.uint32,
    )
    qbits = unpack_bitplanes(jnp.asarray(qw), num_bands=B, rows_per_band=R)

    h_ref, i_ref = hamming_topk_cascade_core(
        store._planes, store._sig_t, store._ids, store._tie,
        qbits[:, :32], jnp.asarray(qw),
        num_perm=P, k=10, refine_groups=n, chunk=64, group=8,
    )

    # inflate key_scale so (32 + 2) * scale >= 2**31 -> coarse tie-shift
    real_key_scale = hamming_mod.key_scale
    monkeypatch.setattr(
        hamming_mod, "key_scale", lambda c: max(real_key_scale(c), 1 << 26)
    )
    from lshrs_tpu.ops.hamming import cascade_coarse_scale

    assert cascade_coarse_scale(32, n)[1] > 0  # the shift really engages
    h_sh, i_sh = hamming_topk_cascade_core(
        store._planes, store._sig_t, store._ids, store._tie,
        qbits[:, :32], jnp.asarray(qw),
        num_perm=P, k=10, refine_groups=n, chunk=64, group=8,
    )
    assert np.array_equal(np.asarray(i_sh), np.asarray(i_ref))
    assert np.array_equal(np.asarray(h_sh), np.asarray(h_ref))


# ---------------------------------------------------------------------------
# Sharded cascade (VERDICT r4 #3): shard-local coarse scan + shard-local
# full-width refine, exact-key ICI merge — the composable 100M sizing.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh():
    import jax

    from lshrs_tpu.parallel import make_mesh

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _sharded_store(mesh, cascade=32, refine=256, **kw):
    from lshrs_tpu.parallel import ShardedDeviceStore

    kw.setdefault("num_bands", B)
    kw.setdefault("rows_per_band", R)
    kw.setdefault("chunk_size", 64)
    kw.setdefault("initial_capacity", 512)
    kw.setdefault("group_size", 8)
    return ShardedDeviceStore(
        mesh=mesh,
        enable_hamming=True,
        hamming_cascade=cascade,
        hamming_cascade_refine=refine,
        **kw,
    )


def test_sharded_cascade_full_pool_matches_exact(mesh, hasher, rng):
    """Per-shard refine pool >= local rows => every shard refines its
    whole block at full width, so the ICI merge returns exactly the
    unsharded exact engine's (hamming asc, id asc) top-k."""
    n = 700
    X = rng.standard_normal((n, D)).astype(np.float32)
    ids = rng.permutation(50_000)[:n]
    words = hasher.hash_batch_words_host(X)

    exact = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64,
        initial_capacity=256, group_size=8, enable_hamming=True,
    )
    exact.add_signature_batch(ids, words)
    cas = _sharded_store(mesh, refine=1 << 20)
    cas.add_signature_batch(ids, words)
    assert cas._planes is None or cas._planes.shape[1] == 32

    qw = hasher.hash_batch_words_host(
        rng.standard_normal((16, D)).astype(np.float32)
    )
    h0, i0 = exact.query_hamming(qw, 12)
    h1, i1 = cas.query_hamming(qw, 12)
    assert np.array_equal(i0, i1)
    assert np.array_equal(h0, h1)
    # prefix-only planes on the sharded store too
    assert cas._planes.shape == (cas._capacity, 32)


def test_sharded_cascade_agreement_statistical(mesh, hasher, rng):
    """Partial per-shard pools: near-complete agreement with the
    unsharded exact top-10 (the union pool is n_shards x deeper)."""
    n = 2000
    X = rng.standard_normal((n, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    exact = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64,
        initial_capacity=256, group_size=8, enable_hamming=True,
    )
    exact.add_signature_batch(np.arange(n), words)
    cas = _sharded_store(mesh, cascade=64, refine=128)
    cas.add_signature_batch(np.arange(n), words)

    qw = hasher.hash_batch_words_host(
        rng.standard_normal((32, D)).astype(np.float32)
    )
    _, i0 = exact.query_hamming(qw, 10)
    _, i1 = cas.query_hamming(qw, 10)
    overlap = np.mean([
        len(set(i0[q]) & set(i1[q])) / 10 for q in range(32)
    ])
    assert overlap >= 0.9, overlap


def test_sharded_cascade_serving_closure_parity(mesh, hasher, rng):
    cas = _sharded_store(mesh)
    X = rng.standard_normal((300, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    cas.add_signature_batch(np.arange(300), words)

    _, expect = cas.query_hamming(words[:8], 5)
    serve = cas.snapshot_query_fn(5, mode="hamming")
    got = np.asarray(serve(words[:8]))
    assert np.array_equal(got, expect)

    with pytest.raises(RuntimeError, match="asymmetric"):
        cas.snapshot_query_fn(5, mode="asymmetric")

    cas.add_signature_batch([999], words[:1])
    with pytest.raises(RuntimeError, match="stale"):
        serve(words[:8])


def test_sharded_cascade_mutations_and_growth(mesh, hasher, rng):
    """Prefix planes stay in sync through delete/upsert/growth on the
    sharded store (the sharded append must slice the prefix width)."""
    cas = _sharded_store(mesh)
    X = rng.standard_normal((100, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    cas.add_signature_batch(np.arange(100), words)

    h, out = cas.query_hamming(words[5:6], 1)
    assert out[0][0] == 5 and h[0][0] == 0
    cas.remove_indices([5])
    _, out = cas.query_hamming(words[5:6], 3)
    assert 5 not in out[0]

    X2 = rng.standard_normal((900, D)).astype(np.float32)
    cas.add_signature_batch(
        np.arange(1000, 1900), hasher.hash_batch_words_host(X2)
    )
    assert cas._planes.shape[1] == 32
    w2 = hasher.hash_batch_words_host(X2[:1])
    h, out = cas.query_hamming(w2, 1)
    assert out[0][0] == 1000 and h[0][0] == 0


def test_sharded_cascade_orchestrator(rng):
    """LSHRS(shards=8, hamming_cascade=...) constructs, serves, and
    round-trips its config (the round-4 guard is gone)."""
    lsh = LSHRS(
        dim=D, num_perm=P, num_bands=B, rows_per_band=R,
        engine="hamming", shards=8, chunk_size=64, initial_capacity=512,
        group_size=8, hamming_cascade=32, hamming_cascade_refine=256,
    )
    X = rng.standard_normal((200, D)).astype(np.float32)
    lsh.index(list(range(200)), X)
    out = lsh.query_hamming(X[42], top_k=5)
    assert out[0][0] == 42
    assert lsh._storage.hamming_cascade == 32
    assert lsh.stats()["index"]["hamming_cascade"] == 32

    serve = lsh.serving_fn(top_k=5)
    got = np.asarray(serve(X[:8]))
    assert got[0][0] == 0


def test_topk_wide_matches_flat_topk(rng):
    """Blockwise wide selection == flat lax.top_k on distinct keys, and
    exact top-m values on heavily duplicated keys, across widths that
    exercise 0, 1 and 2 reduction rounds plus ragged padding."""
    import jax
    import jax.numpy as jnp

    from lshrs_tpu.ops.scan import topk_wide

    for n, m in [(640, 10), (1024, 64), (4096, 64), (8192, 10),
                 (5000, 7), (33000, 64)]:
        # distinct keys: exact positional agreement with lax.top_k
        perm = np.stack([rng.permutation(n) for _ in range(4)]).astype(np.int32)
        v, p = topk_wide(jnp.asarray(perm), m)
        fv, fp = jax.lax.top_k(jnp.asarray(perm), m)
        assert np.array_equal(np.asarray(v), np.asarray(fv)), (n, m)
        assert np.array_equal(np.asarray(p), np.asarray(fp)), (n, m)
        # duplicated keys: top-m VALUES still exact
        dup = (perm // 7).astype(np.int32)
        v2, p2 = topk_wide(jnp.asarray(dup), m)
        ref = np.sort(dup, axis=1)[:, ::-1][:, :m]
        assert np.array_equal(np.asarray(v2), ref), (n, m)
        # returned positions index the returned values
        gathered = np.take_along_axis(dup, np.asarray(p2), axis=1)
        assert np.array_equal(gathered, np.asarray(v2)), (n, m)


def test_topk_wide_2key_matches_lexsort_oracle(rng):
    """Two-key blockwise selection == numpy lexsort by descending
    (primary, secondary), including duplicate primaries, negative
    secondaries and ragged widths."""
    import jax.numpy as jnp

    from lshrs_tpu.ops.scan import topk_wide_2key

    for n, m in [(512, 10), (4096, 64), (8192, 10), (3000, 16)]:
        prim = rng.integers(0, 50, size=(4, n)).astype(np.int32)
        sec = rng.permutation(n).astype(np.int32)[None, :].repeat(4, axis=0)
        sec[:, : n // 8] = -1  # dead-slot ties
        p1, p2, pos = topk_wide_2key(jnp.asarray(prim), jnp.asarray(sec), m)
        for r in range(4):
            order = np.lexsort((-sec[r], -prim[r]))[:m]
            assert np.array_equal(np.asarray(p1)[r], prim[r][order]), (n, m, r)
            assert np.array_equal(np.asarray(p2)[r], sec[r][order]), (n, m, r)
        gathered = np.take_along_axis(prim, np.asarray(pos), axis=1)
        assert np.array_equal(gathered, np.asarray(p1)), (n, m)
