"""Tune the e2e serving pipeline over the tunnel (scratch harness).

Compares pipeline structures for the flagship bench: batch size, host-hash
thread count, and threaded readback.
"""

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
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--nbatches", type=int, default=12)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--hash-threads", type=int, default=2)
    ap.add_argument("--read-thread", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lshrs_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lshrs_tpu.hash.hasher import LSHHasher
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
    print("store:", store.stats()["pallas"], store.stats()["fast_path"], "group:", store.group)

    raw = [
        rng.standard_normal((args.batch, D)).astype(np.float32)
        for _ in range(args.nbatches)
    ]

    # warm compile
    _ = np.asarray(store.query_topk_ids(h.hash_batch_words_host(raw[0]), 10))

    def trial() -> float:
        hash_pool = ThreadPoolExecutor(max_workers=args.hash_threads)
        read_pool = ThreadPoolExecutor(max_workers=1) if args.read_thread else None
        t0 = time.perf_counter()
        hashed = [hash_pool.submit(h.hash_batch_words_host, q) for q in raw]
        inflight: deque = deque()
        done = []
        for fut in hashed:
            qw = fut.result()
            dev = store.query_topk_ids(qw, 10)
            if read_pool is not None:
                inflight.append(read_pool.submit(np.asarray, dev))
            else:
                inflight.append(dev)
            if len(inflight) >= args.depth:
                r = inflight.popleft()
                done.append(r.result() if read_pool else np.asarray(r))
        while inflight:
            r = inflight.popleft()
            done.append(r.result() if read_pool else np.asarray(r))
        dt = time.perf_counter() - t0
        hash_pool.shutdown()
        if read_pool:
            read_pool.shutdown()
        assert len(done) == args.nbatches
        return dt

    times = [trial() for _ in range(3)]
    n_q = args.nbatches * args.batch
    best = min(times)
    print(
        f"batch={args.batch} depth={args.depth} hash_threads={args.hash_threads} "
        f"read_thread={args.read_thread}: best {n_q/best:,.0f} qps "
        f"({[round(n_q/t) for t in times]})"
    )


if __name__ == "__main__":
    main()
