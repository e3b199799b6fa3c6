"""Thread-safety of buffered ingestion and concurrent flushes."""

from __future__ import annotations

import threading

import numpy as np

from lshrs_tpu import LSHRS
from lshrs_tpu.hash.hasher import LSHHasher
from lshrs_tpu.storage.device import DeviceStore


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


def test_device_store_threaded_appends_and_queries():
    """Hammer DeviceStore.add_signature_batch / query_topk from threads.

    The serving story is multi-threaded hosts over one store; mutation is
    lock-serialised, queries are read-only over immutable arrays. Every
    indexed id must be findable afterwards, with no lost updates.
    """
    h = LSHHasher(num_bands=2, rows_per_band=8, dim=16, seed=0)
    store = DeviceStore(
        num_bands=2, rows_per_band=8, chunk_size=128, initial_capacity=128
    )
    rng = np.random.default_rng(3)
    X = rng.standard_normal((16, 20, 16)).astype(np.float32)
    words = [h.hash_batch_words_host(X[t]) for t in range(16)]
    errors: list[Exception] = []

    def writer(tid: int) -> None:
        try:
            ids = np.arange(tid * 20, tid * 20 + 20)
            for j in range(0, 20, 5):
                store.add_signature_batch(ids[j : j + 5], words[tid][j : j + 5])
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    def reader(tid: int) -> None:
        try:
            for _ in range(10):
                store.query_topk(words[tid][:4], 5)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(8)]
    threads += [threading.Thread(target=reader, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    assert len(store) == 160
    for tid in range(8):
        _, ids = store.query_topk(words[tid][:1], 1)
        assert ids[0][0] == tid * 20


def test_device_store_compact_holds_lock_against_writers():
    """compact() must not erase appends that land mid-compaction."""
    h = LSHHasher(num_bands=2, rows_per_band=8, dim=16, seed=1)
    store = DeviceStore(
        num_bands=2, rows_per_band=8, chunk_size=128, initial_capacity=128
    )
    rng = np.random.default_rng(4)
    X = rng.standard_normal((120, 16)).astype(np.float32)
    words = h.hash_batch_words_host(X)
    store.add_signature_batch(np.arange(100), words[:100])
    store.remove_indices(list(range(0, 100, 2)))  # 50 tombstones

    stop = threading.Event()

    def compactor() -> None:
        while not stop.is_set():
            store.compact()

    t = threading.Thread(target=compactor)
    t.start()
    try:
        for j in range(100, 120):
            store.add_signature_batch([j], words[j : j + 1])
    finally:
        stop.set()
        t.join()
    store.compact()
    assert len(store) == 70  # 50 survivors + 20 concurrent appends
    for j in (100, 110, 119):
        _, ids = store.query_topk(words[j : j + 1], 1)
        assert ids[0][0] == j


def test_snapshot_closure_race_with_append(rng):
    """A snapshot taken concurrently with appends must either serve the
    pre-mutation state or raise the stale RuntimeError — never dispatch
    on donated buffers (regression: the generation used to be read
    outside the lock that captures the state arrays)."""
    import threading

    from lshrs_tpu.hash.hasher import LSHHasher
    from lshrs_tpu.storage.device import DeviceStore

    h = LSHHasher(num_bands=4, rows_per_band=8, dim=16, seed=0)
    X = rng.standard_normal((600, 16)).astype(np.float32)
    words = h.hash_batch_words_host(X)
    store = DeviceStore(
        num_bands=4, rows_per_band=8, dim=16, store_vectors=True,
        chunk_size=128, initial_capacity=2048,
    )
    store.add_signature_batch(np.arange(200), words[:200], X[:200])

    stop = threading.Event()
    errs: list[Exception] = []

    def writer():
        i = 200
        while not stop.is_set() and i < 600:
            store.add_signature_batch(
                np.arange(i, i + 10), words[i : i + 10], X[i : i + 10]
            )
            i += 10

    def snapshotter():
        qw = words[:8]
        for _ in range(30):
            try:
                serve = store.snapshot_query_fn(3)
                np.asarray(serve(qw))
            except RuntimeError as e:
                if "stale" not in str(e):
                    errs.append(e)
            except Exception as e:  # deleted-buffer crashes land here
                errs.append(e)

    t1 = threading.Thread(target=writer)
    t2 = threading.Thread(target=snapshotter)
    t1.start(); t2.start()
    t2.join(); stop.set(); t1.join()
    assert not errs, errs
