"""Device-fused top-p rerank: agreement with the host rerank contract."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lshrs_tpu import LSHRS


@pytest.fixture
def populated(rng):
    X = rng.standard_normal((60, 32)).astype(np.float32)
    lsh = LSHRS(
        dim=32, num_perm=32, num_bands=8, rows_per_band=4,
        backend="device", store_vectors=True,
        chunk_size=128, initial_capacity=128,
    )
    lsh.index(list(range(60)), X)
    return lsh, X


def test_fused_topp_matches_host_path(populated, rng):
    lsh, X = populated
    # Same data through the host path (explicit fetch_fn disables fusion).
    host = LSHRS(
        dim=32, num_perm=32, num_bands=8, rows_per_band=4,
        backend="device", chunk_size=128, initial_capacity=128,
        vector_fetch_fn=lambda ids: X[np.asarray(ids)],
    )
    host.index(list(range(60)), X)

    for qi in (0, 7, 33):
        fused = lsh.get_above_p(X[qi], p=0.4)
        ref = host.get_above_p(X[qi], p=0.4)
        assert len(fused) == len(ref)
        assert fused[0][0] == ref[0][0] == qi
        for (fi, fs), (ri, rs) in zip(fused, ref):
            assert abs(fs - rs) < 1e-4
        # same id set (ordering may differ only on exact float ties)
        assert {i for i, _ in fused} == {i for i, _ in ref}


def test_fused_topp_cutoff_math(populated):
    lsh, X = populated
    all_cands = lsh.query(X[5], top_k=None)
    n = len(all_cands)
    out = lsh.get_above_p(X[5], p=0.25)
    assert len(out) == max(1, math.ceil(n * 0.25))
    capped = lsh.query(X[5], top_p=1.0, top_k=3)
    assert len(capped) == min(3, n)


def test_fused_topp_validation(populated):
    lsh, X = populated
    with pytest.raises(ValueError, match="top_p"):
        lsh.query(X[0], top_p=1.5)
    with pytest.raises(ValueError, match="top_k"):
        lsh.query(X[0], top_p=0.5, top_k=0)


def test_fused_topp_scores_descending_and_exact(populated):
    lsh, X = populated
    out = lsh.get_above_p(X[11], p=1.0)
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)
    # top score is the self-match cosine ~ 1.0
    assert abs(out[0][1] - 1.0) < 1e-5
    # verify one score against NumPy cosine
    some_id, some_score = out[min(2, len(out) - 1)]
    a, b = X[11], X[some_id]
    expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(some_score - expected) < 1e-4


def test_fused_topp_empty_index():
    lsh = LSHRS(
        dim=16, num_perm=16, num_bands=4, rows_per_band=4,
        backend="device", store_vectors=True,
        chunk_size=128, initial_capacity=128,
    )
    assert lsh.query(np.ones(16, np.float32), top_p=0.5) == []
