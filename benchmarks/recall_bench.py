"""Recall benchmark: LSH retrieval quality vs exact cosine ground truth.

Measures recall@k of the collision-count query and of the cosine-reranked
pipeline against brute-force exact search, on synthetic GloVe-like data
(normalised Gaussian mixture — clustered, like real embedding spaces).

Because this framework reproduces the reference's signature scheme
bit-for-bit (same projections, same banding, same candidate semantics),
these curves are the reference's recall curves; they quantify the
band/row auto-tuner's operating points.

Usage:
    python benchmarks/recall_bench.py [--n 100000] [--dim 256] [--queries 500]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_clustered(n: int, dim: int, n_clusters: int, rng) -> np.ndarray:
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    x = centers[assign] + 0.35 * rng.standard_normal((n, dim)).astype(np.float32)
    return x.astype(np.float32)


def exact_topk(base: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = qn @ bn.T
    return np.argsort(-sims, axis=1)[:, :k]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--queries", type=int, default=500)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--num-perm", type=int, default=256)
    ap.add_argument("--threshold", type=float, default=0.8)
    args = ap.parse_args()

    from lshrs_tpu import LSHRS

    rng = np.random.default_rng(7)
    base = make_clustered(args.n, args.dim, n_clusters=1000, rng=rng)
    q_idx = rng.permutation(args.n)[: args.queries]
    queries = base[q_idx] + 0.05 * rng.standard_normal(
        (args.queries, args.dim)
    ).astype(np.float32)

    gt = exact_topk(base, queries, args.k)

    lsh = LSHRS(
        dim=args.dim,
        num_perm=args.num_perm,
        similarity_threshold=args.threshold,
        store_vectors=True,
        enable_hamming=True,
        initial_capacity=1 << max(14, (args.n - 1).bit_length()),
    )
    t0 = time.perf_counter()
    lsh.index(list(range(args.n)), base)
    build_s = time.perf_counter() - t0

    stats = lsh.stats()
    # collision-count top-k recall
    t0 = time.perf_counter()
    got = lsh.query_batch(queries, top_k=args.k)
    query_s = time.perf_counter() - t0
    recall_topk = float(
        np.mean([len(set(g) & set(t.tolist())) / args.k for g, t in zip(got, gt)])
    )

    # hamming (full-signature) recall — batched through the store. Hash
    # with the same (device) path used at index time: the host matmul can
    # round differently and flip near-zero projection signs.
    qwords = lsh._hasher.hash_batch_words(queries)
    _, ham_ids = lsh._storage.query_hamming(qwords, args.k)
    recall_hamming = float(
        np.mean([
            len(set(ham_ids[qi].tolist()) & set(gt[qi].tolist())) / args.k
            for qi in range(args.queries)
        ])
    )

    # cosine-reranked recall (top-p pipeline, resident payload)
    n_rerank = min(args.queries, 100)  # sequential queries are RTT-bound
    hits = 0
    for qi in range(n_rerank):
        scored = lsh.query(queries[qi], top_k=args.k, top_p=1.0)
        ids = [i for i, _ in scored]
        hits += len(set(ids) & set(gt[qi].tolist()))
    recall_rerank = hits / (n_rerank * args.k)

    print(
        json.dumps(
            {
                "n": args.n,
                "dim": args.dim,
                "num_perm": args.num_perm,
                "bands": f"{stats['num_bands']}x{stats['rows_per_band']}",
                "threshold": args.threshold,
                f"recall@{args.k}_collision": round(recall_topk, 4),
                f"recall@{args.k}_hamming": round(recall_hamming, 4),
                f"recall@{args.k}_reranked": round(recall_rerank, 4),
                "build_s": round(build_s, 2),
                "query_batch_s": round(query_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
