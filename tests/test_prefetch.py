"""Prefetching batch pipeline: ordering, laziness, error propagation."""

from __future__ import annotations

import threading
import time

import numpy as np
import pytest

from lshrs_tpu.io.prefetch import prefetch_batches


def test_preserves_order_and_content():
    src = [([i], np.full((1, 4), i, np.float32)) for i in range(20)]
    out = list(prefetch_batches(iter(src), depth=3))
    assert [o[0] for o in out] == [[i] for i in range(20)]


def test_error_propagates_at_failing_batch():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    it = prefetch_batches(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_depth_validation():
    with pytest.raises(ValueError):
        list(prefetch_batches([1], depth=0))


def test_producer_runs_ahead():
    produced = []
    gate = threading.Event()

    def gen():
        for i in range(5):
            produced.append(i)
            yield i
        gate.set()

    it = prefetch_batches(gen(), depth=10)
    first = next(it)
    assert first == 0
    # with a deep queue the producer drains the source without the consumer
    assert gate.wait(timeout=2.0)
    assert produced == list(range(5))
    assert list(it) == [1, 2, 3, 4]


def test_create_signatures_with_prefetch(make_device_lsh, rng):
    X = rng.standard_normal((40, 32)).astype(np.float32)
    lsh = make_device_lsh()
    lsh.create_signatures(
        format="numpy", vectors=X, batch_size=8, prefetch=2
    )
    assert lsh.stats()["index"]["alive"] == 40
    assert lsh.get_top_k(X[17], topk=1) == [17]


def test_create_signatures_prefetch_disabled(make_device_lsh, rng):
    X = rng.standard_normal((10, 32)).astype(np.float32)
    lsh = make_device_lsh()
    lsh.create_signatures(format="numpy", vectors=X, batch_size=4, prefetch=0)
    assert lsh.stats()["index"]["alive"] == 10


def test_create_signatures_pipelined_multicore(make_device_lsh, rng, monkeypatch):
    """With >= 2 host cores create_signatures runs the two-stage
    hash/commit pipeline; results and counters must match the sequential
    path exactly (stream order, one flush per batch)."""
    import os

    monkeypatch.setattr(os, "sched_getaffinity", lambda pid: {0, 1, 2, 3})
    X = rng.standard_normal((40, 32)).astype(np.float32)
    lsh = make_device_lsh()
    lsh.create_signatures(format="numpy", vectors=X, batch_size=8, prefetch=0)
    assert lsh.stats()["index"]["alive"] == 40
    assert lsh.stats()["counters"]["flushes"] == 5  # one per batch
    assert lsh.get_top_k(X[17], topk=1) == [17]


def test_create_signatures_pipelined_validation_error(make_device_lsh, rng, monkeypatch):
    """A bad batch mid-stream surfaces its error; earlier batches stay
    committed (same as the sequential path)."""
    import os

    import pytest

    monkeypatch.setattr(os, "sched_getaffinity", lambda pid: {0, 1, 2, 3})
    X = rng.standard_normal((16, 32)).astype(np.float32)
    X[12] = 0.0  # zero vector in the SECOND batch
    lsh = make_device_lsh()
    with pytest.raises(ValueError, match="zero vector"):
        lsh.create_signatures(format="numpy", vectors=X, batch_size=8, prefetch=0)
    assert lsh.stats()["index"]["alive"] == 8  # first batch committed
