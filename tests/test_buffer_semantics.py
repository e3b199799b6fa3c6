"""Buffer management: flush timing, auto-flush at capacity, close behaviour."""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_tpu.storage.memory import MemoryStorage


def test_single_ingest_not_immediately_queryable(mock_storage, make_lsh):
    lsh = make_lsh(dim=4, num_bands=2, rows_per_band=2, num_perm=4, buffer_size=100)
    vec = np.array([1.0, 0.0, 0.0, 0.0], np.float32)

    lsh.ingest(0, vec)
    assert len(mock_storage.batches) == 0
    assert lsh.query(vec, top_k=1) == []

    lsh.flush()
    assert len(mock_storage.batches) == 1
    assert lsh.query(vec, top_k=1) == [0]


def test_batch_index_auto_flushes(mock_storage, make_lsh):
    lsh = make_lsh(dim=4, num_bands=2, rows_per_band=2, num_perm=4, buffer_size=100)
    vecs = np.eye(4, dtype=np.float32)
    lsh.index([0, 1, 2, 3], vecs)

    assert len(mock_storage.batches) >= 1
    assert sum(len(b) for b in mock_storage.batches) == 8  # 4 vectors * 2 bands
    assert lsh.query(vecs[0], top_k=1) == [0]


def test_buffer_flush_on_full(mock_storage, make_lsh):
    # buffer_size=4 ops; each vector contributes 2 ops -> flush on 2nd ingest
    lsh = make_lsh(dim=4, num_bands=2, rows_per_band=2, num_perm=4, buffer_size=4)
    vec = np.array([1.0, 0.0, 0.0, 0.0], np.float32)

    lsh.ingest(0, vec)
    assert len(mock_storage.batches) == 0
    lsh.ingest(1, vec)
    assert len(mock_storage.batches) == 1
    assert len(mock_storage.batches[0]) == 4


def test_buffer_flush_on_full_device(make_device_lsh):
    # Device records count num_bands operations each, same threshold unit.
    lsh = make_device_lsh(dim=4, num_bands=2, rows_per_band=2, num_perm=4, buffer_size=4)
    vec = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    lsh.ingest(0, vec)
    assert lsh.query(vec, top_k=1) == []  # still buffered
    lsh.ingest(1, vec)
    assert lsh.query(vec, top_k=2) == [0, 1]  # auto-flushed at capacity


def test_close_flushes_buffer(mock_storage, make_lsh):
    lsh = make_lsh(dim=4, num_bands=2, rows_per_band=2, num_perm=4, buffer_size=100)
    lsh.ingest(0, np.ones(4, np.float32))
    assert len(mock_storage.batches) == 0
    lsh.close()
    assert len(mock_storage.batches) == 1
    assert mock_storage.close_called


def test_context_manager_flushes_on_exit(make_lsh, mock_storage):
    with make_lsh(dim=4, num_bands=2, rows_per_band=2, num_perm=4) as lsh:
        lsh.ingest(3, np.ones(4, np.float32))
    assert mock_storage.close_called
    assert mock_storage.total_operations == 2


def test_flush_empty_buffer_is_noop(mock_storage, make_lsh):
    lsh = make_lsh(dim=4, num_bands=2, rows_per_band=2, num_perm=4)
    lsh.flush()
    assert mock_storage.batch_add_call_count == 0


def test_flush_failure_keeps_order(make_lsh):
    failing = MemoryStorage(fail_on_flush=True)
    lsh = make_lsh(dim=4, num_bands=2, rows_per_band=2, num_perm=4, storage=failing)
    lsh.ingest(0, np.array([1, 0, 0, 0], np.float32))
    lsh.ingest(1, np.array([0, 1, 0, 0], np.float32))
    with pytest.raises(ConnectionError):
        lsh.flush()
    failing._fail_on_flush = False
    lsh.flush()
    # order preserved: band ops of index 0 come before index 1
    indices = [op[2] for op in failing.all_operations]
    assert indices == [0, 0, 1, 1]
