"""Device-side stage breakdown of the Hamming (SimHash MXU) query path.

Same honest-timing harness as kernel_profile.py: each stage runs inside a
jitted data-dependent fori_loop (one dispatch, no tunnel RTTs inside).

Usage: python benchmarks/hamming_profile.py [--cap 1048576] [--q 8192]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_ITER = 8


def device_time(make_step, qw0, label, state=()):
    """State rides as jit arguments (not captured constants — the remote
    compile service rejects multi-hundred-MB programs)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(qw, st):
        def body(i, carry):
            dep = jnp.where(carry == jnp.uint32(0xDEADBEEF), ~qw, qw)
            out = make_step(dep, st)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.reshape(-1)[0].astype(jnp.uint32)

        return jax.lax.fori_loop(0, N_ITER, body, jnp.uint32(0))

    r = run(qw0, state)
    np.asarray(r)
    t0 = time.perf_counter()
    np.asarray(run(qw0, state))
    dt = (time.perf_counter() - t0) / N_ITER
    q = qw0.shape[0]
    print(f"{label:34s} {dt*1e3:8.2f} ms  ({q/dt:,.0f} qps)")
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=1 << 20)
    ap.add_argument("--q", type=int, default=8192)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--group", type=int, default=64)
    ap.add_argument("--q-tile", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lshrs_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lshrs_tpu.hash.hasher import LSHHasher
    from lshrs_tpu.ops.hamming import (
        hamming_topk_core,
        unpack_bitplanes,
    )
    from lshrs_tpu.ops.pallas_scan import hamming_group_max_keys, key_scale
    from lshrs_tpu.ops.scan import compute_global_tie

    B, R, D = 16, 16, 256
    C, Q, K, GROUP = args.cap, args.q, args.k, args.group
    P = B * R
    CHUNK = GROUP * 128
    QT = min(args.q_tile, Q)
    scale = key_scale(C)

    h = LSHHasher(num_bands=B, rows_per_band=R, dim=D, seed=42)
    rng = np.random.default_rng(0)
    # build signatures in slabs to bound host memory
    words_np = np.empty((C, B), np.uint32)
    planes_np = np.empty((C, P), np.int8)
    for lo in range(0, C, 1 << 18):
        hi = min(lo + (1 << 18), C)
        X = rng.standard_normal((hi - lo, D)).astype(np.float32)
        w = h.hash_batch_words_host(X)
        words_np[lo:hi] = w
        planes_np[lo:hi] = np.asarray(
            unpack_bitplanes(jnp.asarray(w), num_bands=B, rows_per_band=R)
        )
    words = jnp.asarray(words_np)
    planes = jnp.asarray(planes_np)
    sig_t = jnp.asarray(words_np.T.copy())
    ids = jnp.arange(C, dtype=jnp.int32)
    tie = compute_global_tie(ids)
    qw0 = jnp.asarray(words_np[:Q])
    qbits0 = jnp.asarray(planes_np[:Q])

    from lshrs_tpu.ops.scan import build_grouped_refine_rows

    ext = jnp.concatenate(
        [
            words,
            jax.lax.bitcast_convert_type(tie, jnp.uint32)[:, None],
            jax.lax.bitcast_convert_type(ids, jnp.uint32)[:, None],
        ],
        axis=1,
    )
    refine_rows = build_grouped_refine_rows(ext, group=GROUP, strided_chunk=CHUNK)

    flops = 2 * Q * C * P
    print(f"cap={C} q={Q} P={P} group={GROUP} chunk={CHUNK} q_tile={QT}")
    print(f"MXU int8 ideal (394 Tops/s): {flops/394e12*1e3:.1f} ms")

    def unpack_step(qw, st):
        return unpack_bitplanes(qw, num_bands=B, rows_per_band=R)

    device_time(unpack_step, qw0, "unpack qbits")

    def gmax_step(qw, st):
        planes_, tie_, qbits_ = st
        qb = jnp.where(qw[0, 0] == jnp.uint32(0xDEADBEEF), -qbits_, qbits_)
        return hamming_group_max_keys(
            planes_, tie_, qb, group=GROUP, chunk=CHUNK, q_tile=QT, scale=scale
        )

    device_time(gmax_step, qw0, "gmax kernel only (planes)", (planes, tie, qbits0))

    def full_step(qw, st):
        planes_, sig_t_, ids_, tie_, rows_ = st
        qb = unpack_bitplanes(qw, num_bands=B, rows_per_band=R)
        return hamming_topk_core(
            planes_, sig_t_, ids_, tie_, qb, qw,
            k=K, chunk=CHUNK, group=GROUP, use_pallas=True, q_tile=QT,
            sig_rows=rows_,
        )

    device_time(
        full_step, qw0, "full: unpack+kernel+select+refine",
        (planes, sig_t, ids, tie, refine_rows),
    )

    # selection+refine cost = full - gmax - unpack (approx); also measure
    # top-groups alone
    from lshrs_tpu.ops.scan import _hierarchical_top_groups

    gmax0 = jax.jit(
        lambda p_, t_, qb: hamming_group_max_keys(
            p_, t_, qb, group=GROUP, chunk=CHUNK, q_tile=QT, scale=scale
        )
    )(planes, tie, qbits0)

    def sel_step(qw, st):
        (g0,) = st
        g = jnp.where(qw[0, 0] == jnp.uint32(0xDEADBEEF), -g0, g0)
        return _hierarchical_top_groups(g, m=K, ngc=CHUNK // GROUP)

    device_time(sel_step, qw0, "hierarchical top-groups only", (gmax0,))

    from lshrs_tpu.ops.hamming import _select_refine

    def tail_step(qw, st):
        g0, sig_t_, ids_, tie_, rows_ = st
        g = jnp.where(qw[0, 0] == jnp.uint32(0xDEADBEEF), -g0, g0)
        return _select_refine(
            g, sig_t_, ids_, tie_, qw,
            p=P, k=K, chunk=CHUNK, group=GROUP, strided=True, sig_rows=rows_,
        )

    device_time(
        tail_step, qw0, "select+refine tail only",
        (gmax0, sig_t, ids, tie, refine_rows),
    )

    def full_barrier_step(qw, st):
        planes_, sig_t_, ids_, tie_, rows_ = st
        qb = unpack_bitplanes(qw, num_bands=B, rows_per_band=R)
        g = hamming_group_max_keys(
            planes_, tie_, qb, group=GROUP, chunk=CHUNK, q_tile=QT, scale=scale
        )
        g = jax.lax.optimization_barrier(g)
        return _select_refine(
            g, sig_t_, ids_, tie_, qw,
            p=P, k=K, chunk=CHUNK, group=GROUP, strided=True, sig_rows=rows_,
        )

    device_time(
        full_barrier_step, qw0, "full with optimization_barrier",
        (planes, sig_t, ids, tie, refine_rows),
    )


if __name__ == "__main__":
    main()
