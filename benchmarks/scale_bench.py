"""Scale benchmark: 1M-vector index build + query throughput (config #3).

Builds a GloVe-1M-scale index (default 1,048,576 x 256d) by streaming
batches through the full orchestrator path (hash -> buffer -> device
append), optionally via a Parquet file to exercise `create_signatures`,
then measures pipelined query throughput.

Usage:
    python benchmarks/scale_bench.py [--n 1048576] [--dim 256] [--parquet]
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
    ap.add_argument("--query-batch", type=int, default=8192)
    ap.add_argument("--bucket-cap", type=int, default=128)
    ap.add_argument("--mode", choices=["scan", "bucket", "hamming"], default="scan",
                    help="query engine: full scan or sorted-bucket search")
    ap.add_argument("--parquet", action="store_true",
                    help="stream via a Parquet file (exercises create_signatures)")
    args = ap.parse_args()

    import jax

    from lshrs_tpu import LSHRS

    rng = np.random.default_rng(0)
    from lshrs_tpu.storage.device import DeviceStore

    store0 = DeviceStore(
        num_bands=16,
        rows_per_band=args.num_perm // 16,
        dim=args.dim,
        initial_capacity=args.n,
        query_mode=args.mode if args.mode != "hamming" else "scan",
        bucket_cap=args.bucket_cap,
        enable_hamming=args.mode == "hamming",
    )
    lsh = LSHRS(
        dim=args.dim,
        num_perm=args.num_perm,
        num_bands=16,
        rows_per_band=args.num_perm // 16,
        storage=store0,
        buffer_size=args.batch * 16,
    )
    # direct store handle for the serving fast path
    store = lsh._storage
    hasher = lsh._hasher

    # ---- build ------------------------------------------------------------
    if args.parquet:
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = Path("/tmp/scale_bench.parquet")
        if not path.exists():
            print("writing parquet ...", file=sys.stderr)
            writer = None
            for start in range(0, args.n, args.batch):
                m = min(args.batch, args.n - start)
                vecs = rng.standard_normal((m, args.dim)).astype(np.float32)
                tbl = pa.table({
                    "index": pa.array(range(start, start + m), type=pa.int64()),
                    "vector": pa.FixedSizeListArray.from_arrays(
                        pa.array(vecs.reshape(-1)), args.dim
                    ),
                })
                if writer is None:
                    writer = pq.ParquetWriter(path, tbl.schema)
                writer.write_table(tbl)
            writer.close()
        t0 = time.perf_counter()
        lsh.create_signatures(format="parquet", source=path, batch_size=args.batch)
        build_s = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        for start in range(0, args.n, args.batch):
            m = min(args.batch, args.n - start)
            vecs = rng.standard_normal((m, args.dim)).astype(np.float32)
            lsh.index(list(range(start, start + m)), vecs)
        build_s = time.perf_counter() - t0
    alive = lsh.stats()["index"]["alive"]
    build_rate = alive / build_s

    # ---- query ------------------------------------------------------------
    n_batches = 8
    raw = [
        rng.standard_normal((args.query_batch, args.dim)).astype(np.float32)
        for _ in range(n_batches + 1)
    ]

    if args.mode == "hamming":
        def submit(qnp):
            return store.query_hamming_ids(hasher.hash_batch_words_host(qnp), 10)
    else:
        def submit(qnp):
            return store.query_topk_ids(hasher.hash_batch_words_host(qnp), 10)

    _ = np.asarray(submit(raw[0]))
    t0 = time.perf_counter()
    inflight = []
    for qnp in raw[1:]:
        inflight.append(submit(qnp))
        if len(inflight) >= 3:
            _ = np.asarray(inflight.pop(0))
    while inflight:
        _ = np.asarray(inflight.pop(0))
    elapsed = time.perf_counter() - t0
    qps = n_batches * args.query_batch / elapsed

    stats = lsh.stats()["index"]
    print(json.dumps({
        "n_indexed": alive,
        "dim": args.dim,
        "via": "parquet" if args.parquet else "arrays",
        "mode": args.mode,
        "build_s": round(build_s, 2),
        "build_vectors_per_s": round(build_rate, 1),
        "query_qps": round(qps, 1),
        "platform": jax.devices()[0].platform,
        "capacity": stats["capacity"],
        "pallas": stats["pallas"],
        "signature_mb": round(stats["signature_bytes"] / 2**20, 1),
    }))


if __name__ == "__main__":
    main()
