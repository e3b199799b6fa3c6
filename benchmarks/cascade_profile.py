"""Stage-by-stage device profile of the Hamming refinement cascade.

The round-5 capacity sweep measured the cascade at 6.7k QPS at 4M slots
— 14x SLOWER than the exact single-pass engine it exists to beat, with
cascade64 and cascade128 within 2% of each other. Equal times at 2x
coarse width mean the coarse scan is NOT the cost; this script times
each stage of `hamming_topk_cascade_core`'s tail in isolation on the
real chip to name the owner:

  coarse     Pallas group-max keys over the prefix planes
  select     _hierarchical_top_groups (top refine_groups of C/group)
  gather     gather_refine_group_rows (one wide row per candidate group)
  popcount   full-width XOR/popcount of gathered words vs query
  topk       final packed-key topk_wide over the refined pool
  full       the complete cascade program (sanity: ~= sum of stages)
  exact      the single-pass exact engine at the same capacity (control)

Each stage is jitted standalone with the real inputs and timed with a
completion barrier; stages compose cumulatively (select needs coarse's
gmax, ...) so earlier stages' outputs are precomputed OUTSIDE the timed
region.

Usage: python benchmarks/cascade_profile.py [--slots 4194304] [--q 8192]
       [--cascade 64] [--refine 8192] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NUM_BANDS, ROWS_PER_BAND, DIM, TOP_K = 16, 16, 768, 10


def _force(out):
    """Real completion barrier: tiny np readbacks of every output leaf
    (block_until_ready can return early for tunnel-remote arrays)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        _ = np.asarray(leaf[:1])
    return out


def timed(fn, *args, trials=3):
    out = _force(fn(*args))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=1 << 22)
    ap.add_argument("--q", type=int, default=8192)
    ap.add_argument("--cascade", type=int, default=64)
    ap.add_argument("--refine", type=int, default=8192)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--exact-select", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lshrs_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from lshrs_tpu.hash.hasher import LSHHasher
    from lshrs_tpu.ops.bitpack import narrow_words_count, pack_words_narrow
    from lshrs_tpu.ops.hamming import (
        cascade_coarse_scale,
        hamming_group_max_keys,
        hamming_topk_cascade_core,
        key_scale,
        unpack_bitplanes,
    )
    from lshrs_tpu.ops.scan import (
        _hierarchical_top_groups,
        _pool_top_groups,
        gather_refine_group_rows,
        topk_wide,
    )
    from lshrs_tpu.storage.device import DeviceStore

    hasher = LSHHasher(
        num_bands=NUM_BANDS, rows_per_band=ROWS_PER_BAND, dim=DIM, seed=42
    )
    n = args.slots
    store = DeviceStore(
        num_bands=NUM_BANDS, rows_per_band=ROWS_PER_BAND, dim=DIM,
        enable_hamming=True, hamming_cascade=args.cascade,
        hamming_cascade_refine=args.refine,
        initial_capacity=n, dedupe=False,
    )
    proj = hasher.device_projection()
    key = jax.random.PRNGKey(7)
    for off in range(0, n, 1 << 19):
        m = min(1 << 19, n - off)
        x = jax.random.normal(jax.random.fold_in(key, off), (m, DIM),
                              dtype=np.float32)
        store.add_vectors_batch(np.arange(off, off + m), x, proj)
    _ = np.asarray(store._ids[:8])

    rng = np.random.default_rng(123)
    qw = jnp.asarray(
        np.asarray(
            hasher.hash_batch_words(
                rng.standard_normal((args.q, DIM)).astype(np.float32)
            ),
            dtype=np.uint32,
        )
    )
    qbits = unpack_bitplanes(
        qw, num_bands=NUM_BANDS, rows_per_band=ROWS_PER_BAND
    )[:, : args.cascade]

    num_perm = NUM_BANDS * ROWS_PER_BAND
    group = min(store.group, store._capacity)
    ham_tile = group * 128
    cap = store._capacity
    store._ensure_planes()  # planes are lazily built on first ranking use
    sig_t, ids, tie, planes = (
        store._sig_t, store._ids, store._tie, store._planes
    )
    rows = store._refine_rows_for(group, ham_tile, True)
    q_tile = 128
    refine_groups = max(TOP_K, -(-args.refine // group))
    scale, tie_shift = cascade_coarse_scale(args.cascade, cap)
    report = {
        "slots": n, "capacity": cap, "q": args.q,
        "cascade": args.cascade, "refine": args.refine,
        "refine_groups": refine_groups, "group": group,
        "tie_shift": tie_shift, "key_scale": key_scale(cap),
    }

    # -- stage: coarse Pallas group-max ------------------------------------
    @jax.jit
    def coarse(planes_, tie_, qb):
        tc = jnp.where(tie_ >= 0, tie_ >> tie_shift, tie_) if tie_shift else tie_
        return hamming_group_max_keys(
            planes_, tc, qb, group=group, chunk=ham_tile, q_tile=q_tile,
            scale=scale,
        )

    t, gmax = timed(coarse, planes, tie, qbits, trials=args.trials)
    report["coarse_ms"] = round(1000 * t, 1)

    # -- stage: top-group pool selection -----------------------------------
    # The production cascade uses _pool_top_groups (hardware partial
    # reduce); the exact hierarchical selector is timed for comparison.
    sel = jax.jit(partial(_pool_top_groups, m=refine_groups))
    t, top_groups = timed(sel, gmax, trials=args.trials)
    report["select_ms"] = round(1000 * t, 1)
    if args.exact_select:
        sel_x = jax.jit(
            partial(
                _hierarchical_top_groups, m=refine_groups,
                ngc=ham_tile // group,
            )
        )
        t, tg_x = timed(sel_x, gmax, trials=args.trials)
        report["select_exact_ms"] = round(1000 * t, 1)
        ap = np.asarray(top_groups)
        exg = np.asarray(tg_x)
        report["pool_set_recall_vs_exact"] = round(float(np.mean([
            len(set(exg[i]) & set(ap[i])) / exg.shape[1]
            for i in range(0, exg.shape[0], 64)
        ])), 4)

    # -- stage: grouped row gather -----------------------------------------
    # Mirror _select_refine exactly: the table holds NARROW-packed words
    # when rows_per_band < 32 (nw words/slot instead of num_perm // 32).
    narrow_r = store._refine_narrow_r
    if narrow_r:
        nw = narrow_words_count(NUM_BANDS, narrow_r)
        qcmp = pack_words_narrow(
            qw, num_bands=NUM_BANDS, rows_per_band=narrow_r
        )
    else:
        nw = num_perm // 32
        qcmp = qw
    report["narrow_r"] = narrow_r
    report["refine_words_per_slot"] = nw
    gat = jax.jit(partial(gather_refine_group_rows, bw=nw, group=group))
    t, (cwords, cand_tie, cand_ids) = timed(gat, rows, top_groups,
                                            trials=args.trials)
    del cand_ids
    report["gather_ms"] = round(1000 * t, 1)

    # -- stage: full-width popcount of the gathered pool -------------------
    @jax.jit
    def popcount(cw, q_):
        h = None
        for wi in range(nw):
            pc = jax.lax.population_count(cw[:, :, wi, :] ^ q_[:, wi][:, None, None])
            h = pc.astype(jnp.int32) if h is None else h + pc
        return h.reshape(args.q, -1)

    t, hamming = timed(popcount, cwords, qcmp, trials=args.trials)
    report["popcount_ms"] = round(1000 * t, 1)

    # -- stage: final packed-key top-k -------------------------------------
    ksc = key_scale(cap)

    @jax.jit
    def final_topk(h, ct):
        alive = ct.reshape(args.q, -1) >= 0
        scaled = jnp.where(alive, num_perm + 1 - h, 0)
        kkey = scaled * ksc + jnp.maximum(ct.reshape(args.q, -1), 0)
        return topk_wide(kkey, TOP_K)

    t, _ = timed(final_topk, hamming, cand_tie, trials=args.trials)
    report["topk_ms"] = round(1000 * t, 1)

    # -- full cascade program ----------------------------------------------
    # (The exact-engine control is NOT runnable from this store — a cascade
    # store materializes only the prefix plane columns; use the sweep's
    # measured exact rows in /tmp/capacity_r5.log as the reference.)
    full = jax.jit(
        partial(
            hamming_topk_cascade_core,
            num_perm=num_perm, k=TOP_K, refine_groups=refine_groups,
            chunk=ham_tile, group=group, use_pallas=True, q_tile=q_tile,
            narrow_r=narrow_r, sig_rows=rows,
        )
    )
    t, _ = timed(
        full, planes, sig_t, ids, tie, qbits, qw, trials=args.trials
    )
    report["full_cascade_ms"] = round(1000 * t, 1)

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
