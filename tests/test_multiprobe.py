"""Multi-probe LSH: query-directed probing expands candidate sets.

Classic multi-probe (Lv et al. 2007, single-bit perturbations applied
band-uniformly): probe ``t`` flips, in every band, the band's ``t``-th
lowest-|margin| bit. Counting semantics: a band contributes 1 iff the
candidate's band signature matches ANY probe variant — since variants are
pairwise distinct per band, the sum over probes equals the OR and counts
stay ``<= num_bands`` (the key packing is unchanged). The reference has no
probing at all; ``multiprobe=1`` keeps its exact semantics
(`/root/reference/lshrs/core/main.py:1088-1111`).
"""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_tpu import LSHRS
from lshrs_tpu.hash.hasher import LSHHasher
from lshrs_tpu.storage.device import DeviceStore

D, B, R = 32, 4, 8
P = B * R


@pytest.fixture
def hasher() -> LSHHasher:
    return LSHHasher(num_bands=B, rows_per_band=R, dim=D, seed=7)


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)


def _unpack_band_bits(words: np.ndarray, n: int) -> np.ndarray:
    """(n, BW) uint32 -> (n, B, 32) bool bit matrix (R <= 32 here)."""
    return np.unpackbits(
        words.view(np.uint8), bitorder="little", axis=1
    ).reshape(n, B, 32).astype(bool)


def _oracle_counts(qw_probes: np.ndarray, words: np.ndarray) -> np.ndarray:
    """Any-probe collision counts (words_per_band == 1 layout)."""
    c = np.zeros(len(words), np.int64)
    for b in range(B):
        match = np.zeros(len(words), bool)
        for t in range(qw_probes.shape[0]):
            match |= words[:, b] == qw_probes[t, b]
        c += match
    return c


# ---------------------------------------------------------------------------
# probe generation
# ---------------------------------------------------------------------------


def test_probe_words_base_is_plain_signature(hasher, rng):
    X = rng.standard_normal((50, D)).astype(np.float32)
    pw = hasher.hash_batch_probe_words_host(X, 4)
    assert pw.shape == (50, 4, B * hasher.words_per_band)
    np.testing.assert_array_equal(pw[:, 0], hasher.hash_batch_words_host(X))


def test_probe_words_flip_one_bit_per_band(hasher, rng):
    X = rng.standard_normal((40, D)).astype(np.float32)
    T = 3
    pw = hasher.hash_batch_probe_words_host(X, T)
    base = _unpack_band_bits(pw[:, 0], 40)
    seen_flips = []
    for t in range(1, T):
        bits_t = _unpack_band_bits(pw[:, t], 40)
        diff = base != bits_t
        assert (diff.sum(axis=2) == 1).all(), "exactly one flip per band"
        seen_flips.append(diff.argmax(axis=2))
    # distinct probes flip distinct bits
    assert (seen_flips[0] != seen_flips[1]).all()


def test_probe_flips_lowest_margin_bits(hasher, rng):
    X = rng.standard_normal((20, D)).astype(np.float32)
    coords = hasher.hash_batch_coords_host(X)
    order = np.argsort(np.abs(coords).reshape(20, B, R), axis=2)
    pw = hasher.hash_batch_probe_words_host(X, 3)
    base = _unpack_band_bits(pw[:, 0], 20)
    for t in (1, 2):
        diff = base != _unpack_band_bits(pw[:, t], 20)
        np.testing.assert_array_equal(diff.argmax(axis=2), order[:, :, t - 1])


def test_probe_words_device_twin_base_parity(hasher, rng):
    X = rng.standard_normal((30, D)).astype(np.float32)
    pwd = np.asarray(hasher.hash_batch_probe_words(X, 3))
    np.testing.assert_array_equal(
        pwd[:, 0], np.asarray(hasher.hash_batch_words(X))
    )
    # flip structure holds on the device path too
    base = _unpack_band_bits(pwd[:, 0], 30)
    for t in (1, 2):
        diff = base != _unpack_band_bits(pwd[:, t], 30)
        assert (diff.sum(axis=2) == 1).all()


def test_probe_words_validation(hasher, rng):
    X = rng.standard_normal((4, D)).astype(np.float32)
    with pytest.raises(ValueError, match="n_probes"):
        hasher.hash_batch_probe_words_host(X, 0)
    with pytest.raises(ValueError, match="n_probes"):
        hasher.hash_batch_probe_words_host(X, R + 1)
    with pytest.raises(ValueError, match="n_probes"):
        hasher.hash_batch_probe_words(X, 0)


# ---------------------------------------------------------------------------
# device store: oracle exactness across engines
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("chunk,cap", [(64, 64), (2048, 16384)])
def test_store_multiprobe_matches_oracle(hasher, rng, chunk, cap):
    """query_topk with a probe axis == brute-force any-probe counts.

    Covers both the grouped fast path (large cap) and small stores.
    """
    store = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=chunk, initial_capacity=cap
    )
    n = 300
    X = rng.standard_normal((n, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store.add_signature_batch(np.arange(n), words)

    queries = X[:6] + 0.15 * rng.standard_normal((6, D)).astype(np.float32)
    qw3 = hasher.hash_batch_probe_words_host(queries, 3)
    counts, ids = store.query_topk(qw3, 12)
    for qi in range(6):
        oc = _oracle_counts(qw3[qi], words)
        order = np.lexsort((np.arange(n), -oc))
        expected = [(int(i), int(oc[i])) for i in order if oc[i] > 0][:12]
        got = [
            (int(i), int(c)) for i, c in zip(ids[qi], counts[qi]) if c > 0
        ]
        assert got == expected, f"query {qi}"


def test_store_multiprobe_nnz_and_counts(hasher, rng):
    store = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64, initial_capacity=64
    )
    n = 200
    X = rng.standard_normal((n, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store.add_signature_batch(np.arange(n), words)
    qw3 = hasher.hash_batch_probe_words_host(X[:5], 2)

    nnz = store.query_nnz(qw3)
    counts, sids = store.query_counts(qw3)
    slot_of = {int(i): s for s, i in enumerate(sids) if i >= 0}
    for qi in range(5):
        oc = _oracle_counts(qw3[qi], words)
        assert nnz[qi] == (oc > 0).sum()
        for vid in range(n):
            assert counts[qi, slot_of[vid]] == oc[vid]


def test_store_single_probe_axis_equals_plain(hasher, rng):
    """(Q, 1, BW) layout is bit-identical to the (Q, BW) layout."""
    store = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64, initial_capacity=64
    )
    X = rng.standard_normal((150, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store.add_signature_batch(np.arange(150), words)
    qw = hasher.hash_batch_words_host(X[:4])
    c1, i1 = store.query_topk(qw, 8)
    c2, i2 = store.query_topk(qw[:, None, :], 8)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(i1, i2)


def test_multiprobe_is_superset(hasher, rng):
    """Every single-probe candidate survives with more probes, counts
    monotonically non-decreasing."""
    store = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64, initial_capacity=64
    )
    n = 250
    X = rng.standard_normal((n, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store.add_signature_batch(np.arange(n), words)
    queries = X[:8] + 0.2 * rng.standard_normal((8, D)).astype(np.float32)
    for t in (2, 4):
        qw1 = hasher.hash_batch_probe_words_host(queries, 1)
        qwt = hasher.hash_batch_probe_words_host(queries, t)
        n1 = store.query_nnz(qw1)
        nt = store.query_nnz(qwt)
        assert (nt >= n1).all()
        c1, _ = store.query_counts(qw1)
        ct, _ = store.query_counts(qwt)
        assert (ct >= c1).all()


# ---------------------------------------------------------------------------
# orchestrator: API, backends, persistence
# ---------------------------------------------------------------------------


def test_lshrs_multiprobe_validation():
    with pytest.raises(ValueError, match="multiprobe"):
        LSHRS(dim=D, num_perm=P, num_bands=B, rows_per_band=R, multiprobe=0)
    with pytest.raises(ValueError, match="multiprobe"):
        LSHRS(
            dim=D, num_perm=P, num_bands=B, rows_per_band=R,
            multiprobe=R + 1,
        )


def test_lshrs_multiprobe_expands_candidates(rng):
    base = LSHRS(
        dim=D, num_perm=P, num_bands=B, rows_per_band=R,
        engine="collision", initial_capacity=256, seed=7,
    )
    probing = LSHRS(
        dim=D, num_perm=P, num_bands=B, rows_per_band=R,
        engine="collision", initial_capacity=256, seed=7, multiprobe=4,
    )
    X = rng.standard_normal((400, D)).astype(np.float32)
    ids = list(range(400))
    base.index(ids, X)
    probing.index(ids, X)

    queries = X[:32] + 0.25 * rng.standard_normal((32, D)).astype(np.float32)
    grew = 0
    for q in queries:
        c_base = base.query(q, top_k=None)
        c_probe = probing.query(q, top_k=None)
        assert set(c_base) <= set(c_probe)
        grew += len(c_probe) - len(c_base)
    assert grew > 0, "4-probe candidate sets never grew on noisy queries"
    assert probing.stats()["multiprobe"] == 4


def test_lshrs_multiprobe_bucket_backend_matches_device(make_lsh, rng):
    """Memory (bucket) backend multiprobe == device backend multiprobe."""
    bucket = make_lsh(dim=D, num_bands=B, rows_per_band=R, num_perm=P)
    bucket._multiprobe = 3  # the factory has no knob; set post-construction
    device = LSHRS(
        dim=D, num_perm=P, num_bands=B, rows_per_band=R,
        engine="collision", initial_capacity=256, seed=42, multiprobe=3,
    )
    X = rng.standard_normal((300, D)).astype(np.float32)
    ids = list(range(300))
    bucket.index(ids, X)
    device.index(ids, X)
    queries = X[:10] + 0.2 * rng.standard_normal((10, D)).astype(np.float32)
    for q in queries:
        assert bucket.query(q, top_k=None) == device.query(q, top_k=None)
        assert bucket.get_top_k(q, topk=7) == device.get_top_k(q, topk=7)


def test_lshrs_multiprobe_topp_rerank(rng):
    """Top-p rerank consumes the expanded candidate sets."""
    lsh = LSHRS(
        dim=D, num_perm=P, num_bands=B, rows_per_band=R, multiprobe=3,
        engine="collision", store_vectors=True, initial_capacity=256,
    )
    X = rng.standard_normal((300, D)).astype(np.float32)
    lsh.index(list(range(300)), X)
    out = lsh.get_above_p(X[5], p=0.05)
    assert out[0][0] == 5 and out[0][1] == pytest.approx(1.0, abs=1e-5)
    batch = lsh.get_above_p_batch(X[:4], p=0.05)
    assert [row[0][0] for row in batch] == [0, 1, 2, 3]


def test_lshrs_multiprobe_persistence_roundtrip(tmp_path, rng):
    lsh = LSHRS(
        dim=D, num_perm=P, num_bands=B, rows_per_band=R, multiprobe=3,
        engine="collision", initial_capacity=256,
    )
    X = rng.standard_normal((120, D)).astype(np.float32)
    lsh.index(list(range(120)), X)
    want = lsh.query(X[7], top_k=5)

    lsh.save_to_disk(tmp_path / "idx")
    restored = LSHRS.load_from_disk(tmp_path / "idx")
    assert restored._multiprobe == 3
    assert restored.stats()["multiprobe"] == 3
    assert restored.query(X[7], top_k=5) == want

    import pickle

    clone = pickle.loads(pickle.dumps(lsh))
    assert clone._multiprobe == 3
    assert clone.query(X[7], top_k=5) == want


def test_multiprobe_recall_improves_at_strict_banding(rng):
    """The point of probing: recall lifts where candidate sets starve.

    Strict banding (2 bands x 16 rows) on clustered data — single-probe
    candidate sets miss most true neighbors; probing recovers a measurable
    fraction at zero memory cost.
    """
    dim, n_clusters, per = 16, 40, 10
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 3
    X = np.repeat(centers, per, axis=0) + 0.45 * rng.standard_normal(
        (n_clusters * per, dim)
    ).astype(np.float32)
    n = len(X)
    queries = centers + 0.45 * rng.standard_normal(
        (n_clusters, dim)
    ).astype(np.float32)

    def recall(T: int) -> float:
        lsh = LSHRS(
            dim=dim, num_perm=32, num_bands=2, rows_per_band=16,
            engine="collision", initial_capacity=1024, seed=3,
            multiprobe=T,
        )
        lsh.index(list(range(n)), X)
        hits = tot = 0
        for ci, q in enumerate(queries):
            got = set(lsh.query(q, top_k=None))
            true = set(range(ci * per, (ci + 1) * per))
            hits += len(got & true)
            tot += per
        return hits / tot

    r1, r4 = recall(1), recall(4)
    assert r4 > r1 + 0.05, f"multiprobe recall {r4:.3f} vs single {r1:.3f}"


# ---------------------------------------------------------------------------
# sharded parity
# ---------------------------------------------------------------------------


def test_sharded_multiprobe_matches_single(hasher, rng):
    import jax

    from lshrs_tpu.parallel import ShardedDeviceStore, make_mesh

    assert len(jax.devices()) >= 8
    st = ShardedDeviceStore(
        mesh=make_mesh(8), num_bands=B, rows_per_band=R, chunk_size=64,
        initial_capacity=64,
    )
    single = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64, initial_capacity=64
    )
    n = 220
    X = rng.standard_normal((n, D)).astype(np.float32)
    ids = rng.permutation(5000)[:n]
    words = hasher.hash_batch_words_host(X)
    st.add_signature_batch(ids, words)
    single.add_signature_batch(ids, words)

    queries = X[:5] + 0.2 * rng.standard_normal((5, D)).astype(np.float32)
    qw3 = hasher.hash_batch_probe_words_host(queries, 3)
    c_s, i_s = st.query_topk(qw3, 9)
    c_1, i_1 = single.query_topk(qw3, 9)
    np.testing.assert_array_equal(c_s, c_1)
    np.testing.assert_array_equal(i_s, i_1)
    np.testing.assert_array_equal(st.query_nnz(qw3), single.query_nnz(qw3))


# ---------------------------------------------------------------------------
# compiled serving closures
# ---------------------------------------------------------------------------


def test_snapshot_multiprobe_matches_query(hasher, rng):
    """snapshot_query_fn(probes=T) == query_topk ids, both wires."""
    store = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64, initial_capacity=64
    )
    n = 260
    X = rng.standard_normal((n, D)).astype(np.float32)
    words = hasher.hash_batch_words_host(X)
    store.add_signature_batch(np.arange(n), words)

    queries = X[:6] + 0.2 * rng.standard_normal((6, D)).astype(np.float32)
    qw3 = hasher.hash_batch_probe_words_host(queries, 3)
    _, want = store.query_topk(qw3, 7)

    serve_w = store.snapshot_query_fn(7, wire="words", probes=3)
    np.testing.assert_array_equal(np.asarray(serve_w(qw3)), want)

    dense3 = hasher.hash_batch_probe_dense_host(queries, 3)
    serve_d = store.snapshot_query_fn(7, wire="dense", probes=3)
    np.testing.assert_array_equal(np.asarray(serve_d(dense3)), want)

    with pytest.raises(ValueError, match="probes"):
        store.snapshot_query_fn(7, probes=0)
    with pytest.raises(ValueError, match="collision"):
        store.snapshot_query_fn(7, probes=2, mode="hamming")

    store.remove_indices([0])
    with pytest.raises(RuntimeError, match="stale"):
        serve_w(qw3)


def test_probe_dense_wire_matches_words(hasher, rng):
    """Dense probe wire decodes to the same bits as the probe words."""
    from lshrs_tpu.ops.bitpack import dense_to_words

    X = rng.standard_normal((20, D)).astype(np.float32)
    pw = hasher.hash_batch_probe_words_host(X, 4)
    pd = hasher.hash_batch_probe_dense_host(X, 4)
    decoded = np.asarray(
        dense_to_words(
            pd.reshape(20 * 4, -1), num_bands=B, rows_per_band=R
        )
    ).reshape(20, 4, -1)
    np.testing.assert_array_equal(decoded, pw)


def test_serving_fn_honors_multiprobe(rng):
    """serving_fn ids == query_batch ids on a multiprobe instance."""
    for hash_mode in ("host", "device"):
        lsh = LSHRS(
            dim=D, num_perm=P, num_bands=B, rows_per_band=R,
            engine="collision", multiprobe=3, initial_capacity=256,
            hash_mode=hash_mode, seed=11,
        )
        X = rng.standard_normal((250, D)).astype(np.float32)
        lsh.index(list(range(250)), X)
        serve = lsh.serving_fn(top_k=6)
        queries = X[:12] + 0.2 * rng.standard_normal((12, D)).astype(
            np.float32
        )
        got = serve(queries)
        want = lsh.query_batch(queries, top_k=6)
        for qi in range(12):
            assert [i for i in got[qi] if i >= 0] == want[qi], (
                hash_mode, qi,
            )


def test_sharded_snapshot_multiprobe_matches_single(hasher, rng):
    import jax

    from lshrs_tpu.parallel import ShardedDeviceStore, make_mesh

    assert len(jax.devices()) >= 8
    st = ShardedDeviceStore(
        mesh=make_mesh(8), num_bands=B, rows_per_band=R, chunk_size=64,
        initial_capacity=64,
    )
    single = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64, initial_capacity=64
    )
    n = 200
    X = rng.standard_normal((n, D)).astype(np.float32)
    ids = rng.permutation(7000)[:n]
    words = hasher.hash_batch_words_host(X)
    st.add_signature_batch(ids, words)
    single.add_signature_batch(ids, words)

    queries = X[:5] + 0.2 * rng.standard_normal((5, D)).astype(np.float32)
    qw3 = hasher.hash_batch_probe_words_host(queries, 3)
    got = np.asarray(st.snapshot_query_fn(8, probes=3)(qw3))
    want = np.asarray(single.snapshot_query_fn(8, probes=3)(qw3))
    np.testing.assert_array_equal(got, want)


def test_snapshot_topp_multiprobe_matches_batch(hasher, rng):
    """snapshot_topp_fn(probes=T) == query_topp_batch on probe words,
    for both rerank engines."""
    for eng in ("full", "gather"):
        store = DeviceStore(
            num_bands=B, rows_per_band=R, dim=D, store_vectors=True,
            chunk_size=64, initial_capacity=64, rerank_engine=eng,
        )
        n = 240
        X = rng.standard_normal((n, D)).astype(np.float32)
        words = hasher.hash_batch_words_host(X)
        store.add_signature_batch(np.arange(n), words, vectors=X)

        queries = X[:5] + 0.2 * rng.standard_normal((5, D)).astype(
            np.float32
        )
        qw3 = hasher.hash_batch_probe_words_host(queries, 3)
        w_ids, w_sims, w_n = store.query_topp_batch(qw3, queries, 8)

        serve = store.snapshot_topp_fn(8, probes=3, engine=eng)
        ids, sims, nn = serve(qw3, queries)
        np.testing.assert_array_equal(np.asarray(ids), w_ids), eng
        np.testing.assert_allclose(np.asarray(sims), w_sims, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(nn), w_n)


def test_serving_fn_topp_honors_multiprobe(rng):
    """serving_fn(mode='topp') on a multiprobe instance reranks the
    expanded candidate sets (matches get_above_p_batch)."""
    lsh = LSHRS(
        dim=D, num_perm=P, num_bands=B, rows_per_band=R, multiprobe=3,
        engine="collision", store_vectors=True, initial_capacity=256,
    )
    X = rng.standard_normal((260, D)).astype(np.float32)
    lsh.index(list(range(260)), X)
    queries = X[:6] + 0.2 * rng.standard_normal((6, D)).astype(np.float32)

    topp = lsh.serving_fn(top_k=8, mode="topp")
    ids, sims, n = topp(queries)
    want = lsh.get_above_p_batch(queries, p=1.0, top_k=8)
    for qi in range(6):
        got = [
            (int(i), float(s)) for i, s in zip(ids[qi], sims[qi]) if i >= 0
        ][: len(want[qi])]
        assert [i for i, _ in got] == [i for i, _ in want[qi]], qi


def test_sharded_multiprobe_gather_rerank_matches_single(hasher, rng):
    """8-shard gather rerank on probe words == single-device full engine."""
    import jax

    from lshrs_tpu.parallel import ShardedDeviceStore, make_mesh

    assert len(jax.devices()) >= 8
    st = ShardedDeviceStore(
        mesh=make_mesh(8), num_bands=B, rows_per_band=R, dim=D,
        chunk_size=64, initial_capacity=256, store_vectors=True,
        group_size=16, rerank_engine="gather", rerank_candidates=64,
    )
    single = DeviceStore(
        num_bands=B, rows_per_band=R, dim=D, chunk_size=64,
        initial_capacity=256, store_vectors=True, rerank_engine="full",
    )
    n = 220
    X = rng.standard_normal((n, D)).astype(np.float32)
    ids = np.arange(n)
    words = hasher.hash_batch_words_host(X)
    st.add_signature_batch(ids, words, X)
    single.add_signature_batch(ids, words, X)

    queries = X[:5] + 0.2 * rng.standard_normal((5, D)).astype(np.float32)
    qw3 = hasher.hash_batch_probe_words_host(queries, 3)
    s_ids, s_sims, s_n = st.query_topp_batch(qw3, queries, 8)
    f_ids, f_sims, f_n = single.query_topp_batch(qw3, queries, 8)
    np.testing.assert_array_equal(s_n, f_n)
    np.testing.assert_array_equal(s_ids, f_ids)
    valid = f_ids >= 0
    np.testing.assert_allclose(s_sims[valid], f_sims[valid], rtol=1e-5)


def test_multiword_band_multiprobe_matches_oracle(rng):
    """Multi-probe with r=40 (two uint32 words per band) stays exact."""
    B2, R2, D2 = 2, 40, 48
    h = LSHHasher(num_bands=B2, rows_per_band=R2, dim=D2, seed=5)
    store = DeviceStore(
        num_bands=B2, rows_per_band=R2, chunk_size=64, initial_capacity=64
    )
    n = 250
    X = rng.standard_normal((n, D2)).astype(np.float32)
    words = h.hash_batch_words_host(X)  # (n, 4): 2 words x 2 bands
    assert words.shape[1] == B2 * h.words_per_band == 4
    store.add_signature_batch(np.arange(n), words)

    queries = X[:5] + 0.1 * rng.standard_normal((5, D2)).astype(np.float32)
    qw3 = h.hash_batch_probe_words_host(queries, 3)
    # probe structure: one flipped bit per band, anywhere in the 40 bits
    w = h.words_per_band
    for t in (1, 2):
        for qi in range(5):
            for b in range(B2):
                diff = 0
                for j in range(w):
                    diff += bin(
                        int(qw3[qi, 0, b * w + j]) ^ int(qw3[qi, t, b * w + j])
                    ).count("1")
                assert diff == 1, (qi, t, b)

    counts, ids = store.query_topk(qw3, 8)
    for qi in range(5):
        c = np.zeros(n, np.int64)
        for b in range(B2):
            match = np.zeros(n, bool)
            for t in range(3):
                m = np.ones(n, bool)
                for j in range(w):
                    m &= words[:, b * w + j] == qw3[qi, t, b * w + j]
                match |= m
            c += match
        order = np.lexsort((np.arange(n), -c))
        exp = [(int(c[i]), int(i)) for i in order if c[i] > 0][:8]
        got = [
            (int(cc), int(i)) for cc, i in zip(counts[qi], ids[qi]) if cc > 0
        ]
        assert got == exp, f"query {qi}"
