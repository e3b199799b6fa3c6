"""Thread-safety of buffered ingestion and concurrent flushes."""

from __future__ import annotations

import threading

import numpy as np

from lshrs_tpu import LSHRS


def test_concurrent_ingest_exact_counts(mock_storage, make_lsh):
    lsh = make_lsh(dim=8, num_bands=2, rows_per_band=2, num_perm=4, buffer_size=10_000)
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((10, 10, 8)).astype(np.float32)

    def worker(tid: int) -> None:
        for j in range(10):
            lsh.ingest(tid * 10 + j, vectors[tid, j])

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    lsh.flush()

    assert mock_storage.total_operations == 10 * 10 * 2
    assert mock_storage.unique_indices == set(range(100))


def test_concurrent_flushes_no_duplicates(mock_storage, make_lsh):
    lsh = make_lsh(dim=8, num_bands=2, rows_per_band=2, num_perm=4, buffer_size=10_000)
    rng = np.random.default_rng(1)
    for i in range(50):
        lsh.ingest(i, rng.standard_normal(8).astype(np.float32))

    threads = [threading.Thread(target=lsh.flush) for _ in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert mock_storage.total_operations == 100  # no losses, no duplicates
    assert mock_storage.unique_indices == set(range(50))


def test_concurrent_ingest_device_store():
    lsh = LSHRS(
        dim=8,
        num_perm=4,
        num_bands=2,
        rows_per_band=2,
        backend="device",
        chunk_size=128,
        initial_capacity=128,
        buffer_size=10_000,
    )
    rng = np.random.default_rng(2)
    vectors = rng.standard_normal((8, 25, 8)).astype(np.float32)

    def worker(tid: int) -> None:
        for j in range(25):
            lsh.ingest(tid * 25 + j, vectors[tid, j])

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    lsh.flush()
    assert lsh.stats()["index"]["alive"] == 200
