"""Device-side stage breakdown of the grouped collision query (TPU).

Honest timing over the axon tunnel: each measured function is wrapped in a
single jitted `lax.fori_loop` whose iterations are data-dependent (the
previous output perturbs the next input), so per-iteration time is pure
device time — one dispatch, no tunnel round-trips inside the loop.

Usage: python benchmarks/kernel_profile.py [--cap 131072] [--q 1024]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_ITER = 16


def device_time(make_step, qw0, label):
    """Time one data-dependent fori_loop iteration of make_step."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(qw):
        def body(i, carry):
            # Data dependence XLA cannot fold away: the predicate value is
            # unknown at compile time (a `carry & 0` style dependency gets
            # constant-folded and the body hoisted out of the loop).
            dep = jnp.where(carry == jnp.uint32(0xDEADBEEF), ~qw, qw)
            out = make_step(dep)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.reshape(-1)[0].astype(jnp.uint32)

        return jax.lax.fori_loop(0, N_ITER, body, jnp.uint32(0))

    r = run(qw0)
    np.asarray(r)  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(qw0))
    dt = (time.perf_counter() - t0) / N_ITER
    q = qw0.shape[0]
    print(f"{label:28s} {dt*1e3:8.2f} ms  ({q/dt:,.0f} qps)")
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=131072)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--group", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lshrs_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from functools import partial

    from lshrs_tpu.hash.hasher import LSHHasher
    from lshrs_tpu.ops.pallas_scan import group_max_keys, key_scale
    from lshrs_tpu.ops.scan import (
        collision_topk_grouped_core,
        compute_global_tie,
    )

    B, R, D = 16, 16, 768
    C, Q, K, GROUP = args.cap, args.q, args.k, args.group
    CHUNK, QT = max(4096, GROUP * 128), min(128, Q)
    scale = key_scale(C)

    h = LSHHasher(num_bands=B, rows_per_band=R, dim=D, seed=42)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((C, D)).astype(np.float32)
    words = jnp.asarray(h.hash_batch_words(X))
    sig_t = jnp.asarray(words.T)
    ids = jnp.arange(C, dtype=jnp.int32)
    tie = compute_global_tie(ids)
    qw0 = jnp.asarray(h.hash_batch_words(X[:Q]))

    kern = partial(
        group_max_keys, sig_t, tie,
        num_bands=B, words=1, group=GROUP, chunk=CHUNK, q_tile=QT, scale=scale,
    )

    device_time(lambda qw: kern(qw), qw0, "gmax kernel only")

    device_time(
        lambda qw: collision_topk_grouped_core(
            sig_t, ids, tie, qw,
            num_bands=B, k=K, group=GROUP, pallas_chunk=CHUNK, q_tile=QT,
            use_pallas=True,
        ),
        qw0,
        "kernel+select+refine",
    )

    refine_rows = jnp.concatenate(
        [
            words,
            jax.lax.bitcast_convert_type(tie, jnp.uint32)[:, None],
            jax.lax.bitcast_convert_type(ids, jnp.uint32)[:, None],
        ],
        axis=1,
    )
    device_time(
        lambda qw: collision_topk_grouped_core(
            sig_t, ids, tie, qw,
            num_bands=B, k=K, group=GROUP, pallas_chunk=CHUNK, q_tile=QT,
            use_pallas=True, sig_rows=refine_rows,
        ),
        qw0,
        "kernel+select+row-refine",
    )

    device_time(lambda qw: jax.lax.top_k(kern(qw), K), qw0, "kernel+lax.top_k")

    def approx(qw):
        gf = jax.lax.bitcast_convert_type(kern(qw), jnp.float32)
        return jax.lax.approx_max_k(gf, K, recall_target=1.0)

    device_time(approx, qw0, "kernel+approx_max_k")

    # hash cost (takes float input; chain via uint->float cast of dep)
    Xq = jnp.asarray(X[:Q])

    def hash_step(qw):
        dep = qw[0, 0].astype(jnp.float32) * 0
        return h.hash_batch_words(Xq + dep)

    device_time(hash_step, qw0, f"device hash Q={Q}")


if __name__ == "__main__":
    main()
