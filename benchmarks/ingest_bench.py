"""Store-level ingest benchmark: dense-wire signature append rate at 1M.

Measures the pure store path (`DeviceStore.add_signature_batch` with
pre-hashed dense wire batches, dedupe off) — the number the ">= 1M
vectors/s ingest" north star targets. Host hashing is benchmarked
separately (`scale_bench.py` covers the full orchestrator).

Usage: python benchmarks/ingest_bench.py [--n 1048576] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--num-perm", type=int, default=256)
    ap.add_argument("--batch", type=int, default=131_072)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lshrs_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from lshrs_tpu.hash.hasher import LSHHasher
    from lshrs_tpu.storage.device import DeviceStore

    rng = np.random.default_rng(0)
    h = LSHHasher(
        num_bands=16, rows_per_band=args.num_perm // 16, dim=args.dim, seed=42
    )
    # Pre-hash outside the timed region: this bench isolates the store.
    batches = []
    for start in range(0, args.n, args.batch):
        m = min(args.batch, args.n - start)
        X = rng.standard_normal((m, args.dim)).astype(np.float32)
        batches.append(
            (
                np.arange(start, start + m, dtype=np.int64),
                h.hash_batch_dense_host(X),
            )
        )

    def trial() -> float:
        store = DeviceStore(
            num_bands=16,
            rows_per_band=args.num_perm // 16,
            initial_capacity=args.n,
            dedupe=False,
        )
        t0 = time.perf_counter()
        for ids_b, dense in batches:
            store.add_signature_batch(ids_b, dense)
        _ = np.asarray(store._ids[:8])  # ordered completion barrier
        dt = time.perf_counter() - t0
        store.close()
        return dt

    trial()  # warm compile
    best = min(trial() for _ in range(args.trials))
    print(
        json.dumps(
            {
                "metric": "store_ingest_vectors_per_s",
                "n": args.n,
                "num_perm": args.num_perm,
                "batch": args.batch,
                "build_s": round(best, 3),
                "vectors_per_s": round(args.n / best, 1),
                "wire_bytes_per_vector": args.num_perm // 8,
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
