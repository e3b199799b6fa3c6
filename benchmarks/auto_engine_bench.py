"""Default-construction 1M-slot serving bench (VERDICT r2 #4).

Builds a 1M x 768d index through the public orchestrator with DEFAULT
engine selection (`engine="auto"`) and measures the pipelined serving
throughput of `serving_fn()` with no mode override. Past
`LSHRS._AUTO_HAMMING_CAPACITY` the auto engine ranks by packed Hamming
(zero extra HBM vs collision), which is what keeps the default
configuration above the 100k QPS/chip north star at this scale — the
collision engine measured 57k QPS at 1M in round 2.

hash_mode="host" ships the 32-byte dense query wire; on this bench
host's ~47 MB/s tunnel the device-hash default would be transport-bound
at ~2k QPS for reasons that have nothing to do with the engine (see
PERFORMANCE.md "transport reconciliation").

Usage: python benchmarks/auto_engine_bench.py [--n 1048576]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--num-perm", type=int, default=256)
    ap.add_argument("--query-batch", type=int, default=8192)
    ap.add_argument("--n-batches", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "collision", "hamming"])
    ap.add_argument("--hash-family", default="gaussian",
                    choices=["gaussian", "structured"],
                    help="LSH projection family (structured = FWHT "
                    "rotations; ~1.4x the host hash rate on 1 core)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lshrs_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from lshrs_tpu import LSHRS

    rng = np.random.default_rng(0)
    lsh = LSHRS(
        dim=args.dim,
        num_perm=args.num_perm,
        num_bands=16,
        rows_per_band=args.num_perm // 16,
        engine=args.engine,
        hash_mode="host",  # 32-byte wire; see module docstring
        hash_family=args.hash_family,
        initial_capacity=args.n,
        dedupe=False,
        buffer_size=1 << 30,  # bulk build: flush per index() call only
    )

    t0 = time.perf_counter()
    step = 1 << 17
    X_keep = None
    for off in range(0, args.n, step):
        m = min(step, args.n - off)
        xb = rng.standard_normal((m, args.dim)).astype(np.float32)
        if off == 0:
            X_keep = xb[: args.query_batch].copy()
        lsh.index(np.arange(off, off + m), xb)
    build_s = time.perf_counter() - t0
    stats = lsh.stats()
    assert stats["index"]["alive"] == args.n

    serve = lsh.serving_fn(top_k=10)  # mode resolved by the engine
    ranking = lsh.stats()["ranking"]

    raw = [
        rng.standard_normal((args.query_batch, args.dim)).astype(np.float32)
        for _ in range(args.n_batches)
    ]
    _ = serve(raw[0])  # compile

    # self-match: indexed vectors must return themselves first
    probe = serve(X_keep)
    self_match = float((probe[:, 0] == np.arange(args.query_batch)).mean())

    def trial() -> float:
        # 3 workers ~= the flagship bench's hash/dispatch/reader pipeline:
        # batch i+1's host hash overlaps batch i's device compute and
        # readback (dispatches serialize on the store lock, readbacks run
        # outside it).
        pool = ThreadPoolExecutor(max_workers=3)
        t0 = time.perf_counter()
        futs = [pool.submit(serve, q) for q in raw]
        out = [f.result() for f in futs]
        dt = time.perf_counter() - t0
        pool.shutdown()
        assert len(out) == args.n_batches
        return dt

    trials = sorted(trial() for _ in range(args.trials))
    n_q = args.n_batches * args.query_batch
    print(json.dumps({
        "metric": "default_construction_qps_1M",
        "engine": args.engine,
        "ranking": ranking,
        "n": args.n,
        "dim": args.dim,
        "num_perm": args.num_perm,
        "qps": round(n_q / trials[0], 1),
        "qps_median": round(n_q / trials[len(trials) // 2], 1),
        "build_s": round(build_s, 1),
        "build_vectors_per_s": round(args.n / build_s, 1),
        "self_match_rate": self_match,
        "hamming_extra_bytes": lsh.stats()["index"]["hamming_plane_bytes"],
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
