"""Flagship benchmark: batched top-k collision queries on the device store.

Configuration #1 from BASELINE.json: dim=768, num_perm=256 banded
random-projection LSH, get_top_k collision query over 100k indexed vectors.
Measures end-to-end serving throughput: raw float32 query batches are
hashed on the host with the structured (FWHT) hash family — ~13x fewer
flops than the dense sgemm, served by the native C kernel
(`lshrs_tpu/native/fwht.c`); measured +10% median / +17% best e2e QPS
over the gaussian family in an interleaved A/B on this 1-core host, with
equal-or-better recall at every measured operating point — then dense
bitpacked (the 32-byte minimal wire signature; 16384-query batches
amortize the tunnel's per-dispatch RTT, measured +8% over 8192),
shipped to the device, scanned by the fused
Pallas collision/group-max kernel with exact (count, id) top-10 selection
in ONE device dispatch per batch (`DeviceStore.snapshot_query_fn`), and
the (Q, 10) id results are read back. A three-stage host pipeline (hasher
thread -> dispatch -> reader thread) overlaps CPU hashing, transport and
device compute the way a real serving loop does. Index-build throughput is
reported two ways (see the build section + PERFORMANCE.md): the fused
device-resident build (hash + append in one program — the TPU-native
number) and the host-streamed dense-wire build (end-to-end over this
tunnel's ~47 MB/s transport).

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
QUERY_BATCH = 16384
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

    # Serving + host-streamed-build hasher: the structured (FWHT) family.
    # The device-resident fused build below keeps the gaussian family —
    # on the MXU one dense matmul beats the FWHT butterfly passes ~3x
    # (measured 1.8M vs 0.54M vec/s), while on the host the FWHT C path
    # beats the sgemm ~1.4x. Each store uses ONE family end-to-end.
    hasher = LSHHasher(
        num_bands=NUM_BANDS, rows_per_band=ROWS_PER_BAND, dim=DIM, seed=42,
        hash_family="structured",
    )
    dev_hasher = LSHHasher(
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
    # Two honest build measurements (PERFORMANCE.md reconciles them):
    #
    # 1. DEVICE-RESIDENT build (the TPU-native headline): vectors already
    #    in HBM — the production shape, where embeddings are produced on
    #    the same chip — hashed AND appended by ONE fused device program
    #    (`DeviceStore.add_vectors_batch`). Self-match is verified on this
    #    store with device-hashed queries (same program, bit-exact).
    # 2. HOST-STREAMED build: host sgemm + 32-byte dense wire, end-to-end
    #    over the transport. On this 1-core host the sgemm itself caps at
    #    ~250k vec/s, and the ~47 MB/s tunnel caps any raw-vector
    #    streaming at ~34k vec/s — no ingest design can beat physics here;
    #    a PCIe-attached chip (~16 GB/s) lifts both by ~300x.
    #
    # The serving (QPS) store uses the host hash path end-to-end so the
    # 32-byte query wire self-matches bit-for-bit.
    X = rng.standard_normal((N_VECTORS, DIM)).astype(np.float32)
    ids = np.arange(N_VECTORS)

    import jax.numpy as jnp

    dev_store = DeviceStore(
        num_bands=NUM_BANDS,
        rows_per_band=ROWS_PER_BAND,
        dim=DIM,
        chunk_size=2048,
        initial_capacity=1 << 17,
        dedupe=False,
    )
    X_dev = jnp.asarray(X)  # one-time upload, untimed (production: born here)
    proj = dev_hasher.device_projection()
    dev_store.add_vectors_batch(ids, X_dev, proj)  # warm the fused jit

    def timed_device_build() -> float:
        dev_store.clear()
        t0 = time.perf_counter()
        dev_store.add_vectors_batch(ids, X_dev, proj)  # ONE device program
        _ = np.asarray(dev_store._ids[:8])  # ordered completion barrier
        return time.perf_counter() - t0

    dev_trials = sorted(timed_device_build() for _ in range(5))
    dev_build_rate = N_VECTORS / dev_trials[0]
    dev_build_median = N_VECTORS / dev_trials[len(dev_trials) // 2]
    # fused-built rows must self-match device-hashed queries bit-for-bit
    dq = dev_hasher.hash_batch_words(X_dev[:2048])
    _, dev_ids = dev_store.query_topk(dq, 1)
    dev_self_match = float((dev_ids[:, 0] == ids[:2048]).mean())

    # warm up the host hash/append jits on an equally-sized batch first
    store.add_signature_batch(ids, hasher.hash_batch_dense_host(X))
    store.clear()

    def timed_stream_build() -> float:
        store.clear()
        t0 = time.perf_counter()
        dense = hasher.hash_batch_dense_host(X)  # host sgemm + dense bitpack
        store.add_signature_batch(ids, dense)  # 32 B/vector wire, device decode
        _ = np.asarray(store._ids[:8])  # ordered completion barrier
        return time.perf_counter() - t0

    # best + median of three: the tunnel occasionally stalls for tens of s
    stream_trials = sorted(timed_stream_build() for _ in range(3))
    stream_build_rate = N_VECTORS / stream_trials[0]
    stream_build_median = N_VECTORS / stream_trials[len(stream_trials) // 2]

    # ---- query ------------------------------------------------------------
    # Serving architecture: clients (here, a hasher thread) hash raw query
    # vectors to the 32-byte dense wire signature (one ~27 ms sgemm +
    # packbits per 8192-query batch); the main thread ships signatures and
    # dispatches ONE fused device program per batch (wire decode + Pallas
    # collision/group-max scan + exact (count, id) top-10 + id select); a
    # reader thread drains the (Q, 10) id results. All three stages overlap.
    n_batches = 6 if platform != "cpu" else 2
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
    # best of five steady-state trials (transport floor) plus the median so
    # round-over-round deltas are distinguishable from variance.
    trials = sorted(timed_trial() for _ in range(N_TRIALS))
    elapsed = trials[0]
    n_queries = n_batches * QUERY_BATCH
    qps = n_queries / elapsed
    qps_median = n_queries / trials[len(trials) // 2]

    # sanity: self-queries must find themselves (exact self-match, 16 bands)
    probe = np.asarray(serve(hasher.hash_batch_dense_host(X[:QUERY_BATCH])))
    self_match = float((probe[:, 0] == np.arange(QUERY_BATCH)).mean())

    # ---- 1M default construction (north-star scale, machine-recorded) ----
    # GloVe-1M-scale bar: LSHRS(dim=768, num_perm=256, engine="auto") with
    # 1,048,576 vectors served through serving_fn() — the auto engine ranks
    # by Hamming past 512k slots, which is what clears 100k QPS/chip here.
    # hash_mode="host" ships the 32-byte query wire (see PERFORMANCE.md
    # transport reconciliation). Kept lean: 3 trials x 4 batches of 8192.
    #
    # Build protocol (round 5, reconciling the 44x artifact-vs-claim gap
    # VERDICT r4 called out): data is synthesized OFF the timed loop in
    # float32 (the r4 bench drew 0.8 GB of float64 randn per step INSIDE
    # it — 86% of the recorded "build" time on this 1-core host), the
    # chunk is 65,536 (the measured-optimal async step from
    # benchmarks/ingest_profile.py; 131,072 loses ~37%), and the loop is
    # plain `lsh.index()` calls — JAX async dispatch overlaps chunk i's
    # device decode+append with chunk i+1's host hash, no threads needed.
    # The final device-queue drain is a tiny readback barrier.
    from lshrs_tpu import LSHRS

    n_1m = 1 << 20
    one_m = {}
    try:
        lsh = LSHRS(
            dim=DIM,
            num_perm=NUM_BANDS * ROWS_PER_BAND,
            num_bands=NUM_BANDS,
            rows_per_band=ROWS_PER_BAND,
            hash_mode="host",
            hash_family="structured",
            initial_capacity=n_1m,
            dedupe=False,
            buffer_size=1 << 30,
        )
        step, q_1m = 1 << 16, 8192
        # Clustered base data (Gaussian-mixture, like real embedding
        # spaces): on UNIFORM Gaussian data at 768d every non-planted
        # "true neighbour" of a probe sits at noise-level cosine (~0.19)
        # below any 256-bit estimator's distance resolution, so recall@10
        # there measures tie ordering, not retrieval (the first r5
        # rehearsal recorded 0.10 with planted recall 1.0). Engine cost
        # is data-independent (fixed-shape scans), so QPS is unaffected.
        centers_1m = rng.standard_normal((4096, DIM)).astype(np.float32)
        chunks_1m = [
            centers_1m[rng.integers(0, 4096, step)]
            + 0.35 * rng.standard_normal((step, DIM), dtype=np.float32)
            for _ in range(n_1m // step)
        ]
        ids_1m = [
            np.arange(off, off + step) for off in range(0, n_1m, step)
        ]
        X_keep = chunks_1m[0][:q_1m].copy()
        lsh.index(ids_1m[0], chunks_1m[0])  # warm the per-chunk jit shapes
        lsh.clear()
        t0 = time.perf_counter()
        for idb, xb in zip(ids_1m, chunks_1m):
            lsh.index(idb, xb)
        _ = np.asarray(lsh._storage._ids[:8])  # drain the dispatch queue
        build_1m_s = time.perf_counter() - t0
        assert lsh.stats()["index"]["alive"] == n_1m

        serve_1m = lsh.serving_fn(top_k=TOP_K)
        probe_1m = np.asarray(serve_1m(X_keep))  # compile + self-match
        self_match_1m = float((probe_1m[:, 0] == np.arange(q_1m)).mean())

        # Recall@10 of the exact configuration served here (auto->Hamming,
        # structured family, host hash), VERDICT r4 #7: 512 planted-near-
        # neighbor queries (~0.8 cosine to a stored vector — uniformly
        # random probes at 768d have noise-tied top-10s that measure tie
        # ordering, not retrieval), ground truth = exact cosine top-10
        # over all 1M rows (host BLAS, untimed).
        n_probe = 512
        px = chunks_1m[0][:n_probe]
        noise = np.random.default_rng(999).standard_normal(
            px.shape, dtype=np.float32
        )
        probe_q = 0.8 * px / np.linalg.norm(px, axis=1, keepdims=True)
        probe_q += 0.6 * noise / np.linalg.norm(noise, axis=1, keepdims=True)
        probe_q = probe_q.astype(np.float32)
        qn = probe_q / np.linalg.norm(probe_q, axis=1, keepdims=True)
        best_s = np.full((n_probe, 0), 0.0, np.float32)
        best_i = np.full((n_probe, 0), -1, np.int64)
        for idb, xb in zip(ids_1m, chunks_1m):
            s = (qn @ xb.T) / np.linalg.norm(xb, axis=1)[None, :]
            part = np.argpartition(-s, TOP_K - 1, axis=1)[:, :TOP_K]
            best_s = np.concatenate(
                [best_s, np.take_along_axis(s, part, axis=1)], axis=1
            )
            best_i = np.concatenate([best_i, idb[part]], axis=1)
            keep = np.argpartition(-best_s, TOP_K - 1, axis=1)[:, :TOP_K]
            best_s = np.take_along_axis(best_s, keep, axis=1)
            best_i = np.take_along_axis(best_i, keep, axis=1)
        got_1m = np.asarray(serve_1m(probe_q))[:, :TOP_K]
        recall10_1m = float(np.mean([
            len(set(best_i[i].tolist()) & set(got_1m[i].tolist())) / TOP_K
            for i in range(n_probe)
        ]))
        planted_1m = float(
            (got_1m == np.arange(n_probe)[:, None]).any(axis=1).mean()
        )
        raw_1m = [
            rng.standard_normal((q_1m, DIM)).astype(np.float32)
            for _ in range(4)
        ]

        def timed_1m_trial() -> float:
            pool = ThreadPoolExecutor(max_workers=3)
            t0 = time.perf_counter()
            futs = [pool.submit(serve_1m, q) for q in raw_1m]
            out = [np.asarray(f.result()) for f in futs]
            dt = time.perf_counter() - t0
            pool.shutdown()
            assert len(out) == len(raw_1m)
            return dt

        trials_1m = sorted(timed_1m_trial() for _ in range(3))
        n_q_1m = len(raw_1m) * q_1m
        one_m = {
            "qps_1m": round(n_q_1m / trials_1m[0], 1),
            "qps_1m_median": round(n_q_1m / trials_1m[len(trials_1m) // 2], 1),
            "self_match_rate_1m": self_match_1m,
            "recall10_1m": round(recall10_1m, 4),
            "planted_recall_1m": round(planted_1m, 4),
            "ranking_1m": lsh.stats()["ranking"],
            "build_1m_s": round(build_1m_s, 1),
            "build_1m_vectors_per_s": round(n_1m / build_1m_s, 1),
        }
        del lsh, serve_1m, chunks_1m
    except Exception as exc:  # the 100k headline must still be reported
        one_m = {"qps_1m_error": f"{type(exc).__name__}: {exc}"}

    # ---- 4M cascade serving row (the >=4M-slot engine, machine-recorded) --
    # Serving runs the Hamming refinement cascade in its measured-best
    # configuration (hamming_cascade=128: half-width coarse scan + exact
    # full-width refine of 8192 slots/query — planted recall@10 0.997+
    # from 4M through 12.5M; a 64-bit prefix is too coarse, 0.76-0.83).
    # This row pins the >=4M story to the driver artifact; the 8M/12.5M
    # sweep + planted-recall tables are in PERFORMANCE.md
    # (benchmarks/capacity_bench.py). Vectors are
    # synthesized ON DEVICE (the tunnel would gate a host build at this
    # scale) and built by the fused hash+append program; the planted
    # probe perturbs stored vectors to ~0.8 cosine — queries with genuine
    # near neighbours, the regime the engine exists for.
    four_m = {}
    try:
        from lshrs_tpu.storage.device import DeviceStore as _DS

        n_4m, q_4m = 1 << 22, 8192
        cas = _DS(
            num_bands=NUM_BANDS, rows_per_band=ROWS_PER_BAND, dim=DIM,
            enable_hamming=True, hamming_cascade=128,
            hamming_cascade_refine=8192,
            initial_capacity=n_4m, dedupe=False,
        )
        proj_4m = dev_hasher.device_projection()
        key = jax.random.PRNGKey(7)
        synth = 1 << 19
        t0 = time.perf_counter()
        probe_x = None
        for off in range(0, n_4m, synth):
            xdev = jax.random.normal(
                jax.random.fold_in(key, off), (synth, DIM), dtype=np.float32
            )
            if off == 0:
                probe_x = xdev[:1024]
            cas.add_vectors_batch(np.arange(off, off + synth), xdev, proj_4m)
        _ = np.asarray(cas._ids[:8])
        build_4m_s = time.perf_counter() - t0

        serve_4m = cas.snapshot_query_fn(TOP_K, mode="hamming", wire="words")
        self_w = np.asarray(dev_hasher.hash_batch_words(probe_x))
        got = np.asarray(serve_4m(self_w))
        self_match_4m = float((got[:, 0] == np.arange(1024)).mean())
        px = np.asarray(probe_x)
        pn = np.random.default_rng(999).standard_normal(
            px.shape
        ).astype(np.float32)
        pq = 0.8 * px / np.linalg.norm(px, axis=1, keepdims=True) + 0.6 * (
            pn / np.linalg.norm(pn, axis=1, keepdims=True)
        )
        pw = np.asarray(
            dev_hasher.hash_batch_words(pq.astype(np.float32)),
            dtype=np.uint32,
        )
        planted_4m = float(
            (np.asarray(serve_4m(pw)) == np.arange(1024)[:, None])
            .any(axis=1).mean()
        )

        raw_4m = [
            np.asarray(
                dev_hasher.hash_batch_words(
                    rng.standard_normal((q_4m, DIM)).astype(np.float32)
                ),
                dtype=np.uint32,
            )
            for _ in range(4)
        ]
        _ = np.asarray(serve_4m(raw_4m[0]))  # warm the serving shape

        def timed_4m_trial() -> float:
            pool = ThreadPoolExecutor(max_workers=3)
            t0 = time.perf_counter()
            futs = [pool.submit(serve_4m, b) for b in raw_4m]
            got = [np.asarray(f.result()) for f in futs]
            dt = time.perf_counter() - t0
            pool.shutdown()
            assert len(got) == len(raw_4m)
            return dt

        trials_4m = sorted(timed_4m_trial() for _ in range(3))
        n_q_4m = len(raw_4m) * q_4m
        four_m = {
            "qps_4m": round(n_q_4m / trials_4m[0], 1),
            "qps_4m_median": round(n_q_4m / trials_4m[len(trials_4m) // 2], 1),
            "self_match_rate_4m": self_match_4m,
            "planted_recall_4m": planted_4m,
            "cascade_4m": "cascade128:8192",
            "build_4m_s": round(build_4m_s, 1),
        }
        del cas, serve_4m
    except Exception as exc:
        four_m = {"qps_4m_error": f"{type(exc).__name__}: {exc}"}

    result = {
        "metric": "query_qps_100k_d768_p256_top10",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 4),
        "extras": {
            "platform": platform,
            "fast_path": store.stats()["fast_path"],
            "pallas": store.stats()["pallas"],
            # device-resident fused build (hash+append, one program)
            "build_vectors_per_s": round(dev_build_rate, 1),
            "build_vectors_per_s_median": round(dev_build_median, 1),
            "build_self_match_rate": dev_self_match,
            # host-streamed build (sgemm + 32B dense wire, end-to-end)
            "build_stream_vectors_per_s": round(stream_build_rate, 1),
            "build_stream_vectors_per_s_median": round(stream_build_median, 1),
            "qps_median": round(qps_median, 1),
            "query_batch": QUERY_BATCH,
            "serving_hash_family": "structured",
            "pipeline": "hash-thread/dispatch/reader-thread",
            "latency_ms_per_batch": round(
                1000 * elapsed / (n_queries / QUERY_BATCH), 3
            ),
            "self_match_rate": self_match,
            "n_vectors": N_VECTORS,
            **one_m,
            **four_m,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
