"""In-place retune benchmark: `DeviceStore.rehash` vs a full rebuild.

Measures the device-side cost of rebuilding every stored signature from
the resident payload under a new banding/seed (the operation the
reference can only perform by re-streaming the entire dataset from its
primary datastore through `create_signatures`).

Usage:
    python benchmarks/rehash_bench.py [--n 1048576] [--dim 256]
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
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--payload-dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"])
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lshrs_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from lshrs_tpu.hash.hasher import LSHHasher
    from lshrs_tpu.storage.device import DeviceStore

    nb, r = 16, args.num_perm // 16
    rng = np.random.default_rng(0)
    X = rng.standard_normal((args.n, args.dim)).astype(np.float32)
    X_dev = jnp.asarray(X)

    h_old = LSHHasher(num_bands=nb, rows_per_band=r, dim=args.dim, seed=1)
    h_new = LSHHasher(num_bands=nb * 2, rows_per_band=r // 2, dim=args.dim,
                      seed=2)
    store = DeviceStore(
        num_bands=nb, rows_per_band=r, dim=args.dim, store_vectors=True,
        payload_dtype=args.payload_dtype, dedupe=False,
        initial_capacity=1 << (args.n - 1).bit_length(), chunk_size=2048,
    )
    t0 = time.perf_counter()
    store.add_vectors_batch(np.arange(args.n), X_dev, h_old.device_projection())
    _ = np.asarray(store._ids[:4])
    build_s = time.perf_counter() - t0

    hashers = [h_old, h_new]
    trials = []
    for t in range(args.trials):
        h = hashers[(t + 1) % 2]
        t0 = time.perf_counter()
        store.rehash(h.device_projection(), num_bands=h.num_bands,
                     rows_per_band=h.rows_per_band)
        _ = np.asarray(store._sig_rows[:4])  # completion barrier
        trials.append(time.perf_counter() - t0)
    trials.sort()

    # correctness probe: self-queries under the final hasher
    h = hashers[args.trials % 2]
    qw = h.hash_batch_words(X_dev[:1024])
    _, ids = store.query_topk(qw, 1)
    self_match = float((np.asarray(ids)[:, 0] == np.arange(1024)).mean())

    print(json.dumps({
        "n": args.n,
        "dim": args.dim,
        "payload_dtype": args.payload_dtype,
        "initial_build_s": round(build_s, 3),
        "rehash_s_best": round(trials[0], 3),
        "rehash_s_median": round(trials[len(trials) // 2], 3),
        "rehash_rows_per_s": round(args.n / trials[0], 1),
        "self_match": self_match,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
