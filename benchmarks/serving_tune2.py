"""E2E serving pipeline v2: dense uploads, sliced dispatch, batched reads."""

from __future__ import annotations

import argparse
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--cap", type=int, default=1 << 17)
    ap.add_argument("--super", type=int, default=16384, dest="super_")
    ap.add_argument("--dev-batch", type=int, default=8192)
    ap.add_argument("--read-every", type=int, default=2)
    ap.add_argument("--nsuper", type=int, default=8)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--hash-threads", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lshrs_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lshrs_tpu.hash.hasher import LSHHasher
    from lshrs_tpu.ops.bitpack import dense_to_words
    from lshrs_tpu.storage.device import DeviceStore

    B, R, D = 16, 16, 768
    h = LSHHasher(num_bands=B, rows_per_band=R, dim=D, seed=42)
    store = DeviceStore(
        num_bands=B, rows_per_band=R, dim=D, chunk_size=2048,
        initial_capacity=args.cap, dedupe=False,
    )
    rng = np.random.default_rng(0)
    X = rng.standard_normal((args.n, D)).astype(np.float32)
    store.add_signature_batch(np.arange(args.n), h.hash_batch_words(X))

    raw = [
        rng.standard_normal((args.super_, D)).astype(np.float32)
        for _ in range(args.nsuper)
    ]
    device_query = store.snapshot_query_fn(
        10, wire="dense",
        dev_batch=args.dev_batch if args.dev_batch < args.super_ else None,
    )

    # warm compile
    _ = np.asarray(device_query(h.hash_batch_dense_host(raw[0])))

    def trial() -> float:
        hash_pool = ThreadPoolExecutor(max_workers=args.hash_threads)
        read_pool = ThreadPoolExecutor(max_workers=1)
        t0 = time.perf_counter()
        hashed = [hash_pool.submit(h.hash_batch_dense_host, q) for q in raw]
        pending_out = []  # device outputs awaiting grouped readback
        reads: deque = deque()
        done = 0
        for fut in hashed:
            pending_out.append(device_query(fut.result()))
            if len(pending_out) >= args.read_every:
                grouped = (
                    jnp.concatenate(pending_out)
                    if len(pending_out) > 1
                    else pending_out[0]
                )
                pending_out = []
                reads.append(read_pool.submit(np.asarray, grouped))
            while len(reads) > args.depth:
                done += reads.popleft().result().shape[0]
        if pending_out:
            grouped = (
                jnp.concatenate(pending_out) if len(pending_out) > 1 else pending_out[0]
            )
            reads.append(read_pool.submit(np.asarray, grouped))
        while reads:
            done += reads.popleft().result().shape[0]
        dt = time.perf_counter() - t0
        hash_pool.shutdown(); read_pool.shutdown()
        assert done == args.nsuper * args.super_
        return dt

    times = [trial() for _ in range(3)]
    n_q = args.nsuper * args.super_
    print(
        f"super={args.super_} dev_batch={args.dev_batch} read_every={args.read_every} "
        f"depth={args.depth}: best {n_q/min(times):,.0f} qps "
        f"({[round(n_q/t) for t in times]})"
    )


if __name__ == "__main__":
    main()
