"""Math utility contracts: norm, cosine, top-k, band/row tuner."""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_tpu.utils.br import (
    PRECOMPUTED_CONFIGS,
    compute_collision_probability,
    compute_false_rates,
    compute_lsh_threshold,
    find_optimal_br,
    get_optimal_config,
)
from lshrs_tpu.utils.norm import l2_norm
from lshrs_tpu.utils.similarity import cosine_similarity, top_k_cosine


def test_l2_norm_unit_length():
    vec = np.array([3.0, 4.0])
    out = l2_norm(vec)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, [0.6, 0.8], rtol=1e-6)
    assert abs(np.linalg.norm(out) - 1.0) < 1e-6


def test_l2_norm_zero_vector_raises():
    with pytest.raises(ValueError, match="zero vector"):
        l2_norm(np.zeros(8))


def test_cosine_similarity_exact_values():
    query = np.array([1.0, 0.0, 0.0])
    candidates = [
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [-1.0, 0.0, 0.0],
        [1.0, 1.0, 0.0],
    ]
    sims = cosine_similarity(query, candidates)
    np.testing.assert_allclose(sims, [1.0, 0.0, -1.0, 0.70710677], atol=1e-6)


def test_cosine_similarity_zero_candidate_raises():
    with pytest.raises(ValueError):
        cosine_similarity(np.ones(3), [[1.0, 0, 0], [0, 0, 0]])


def test_top_k_cosine_ordering():
    query = np.array([1.0, 0.0])
    candidates = [
        [1.0, 0.1],
        [0.0, 1.0],
        [1.0, 0.0],
        [-1.0, 0.0],
        [0.9, 0.2],
    ]
    results = top_k_cosine(query, candidates, k=3)
    assert [idx for idx, _ in results] == [2, 0, 4]
    scores = [score for _, score in results]
    assert scores == sorted(scores, reverse=True)
    assert abs(results[0][1] - 1.0) < 1e-6


def test_top_k_cosine_k_validation_and_empty():
    with pytest.raises(ValueError):
        top_k_cosine(np.ones(2), [[1.0, 0.0]], k=0)
    assert top_k_cosine(np.ones(2), np.empty((0, 2)), k=3) == []


def test_top_k_cosine_k_larger_than_candidates():
    out = top_k_cosine(np.array([1.0, 0.0]), [[1.0, 0.0], [0.0, 1.0]], k=10)
    assert len(out) == 2


def test_threshold_closed_form():
    assert abs(compute_lsh_threshold(16, 8) - (1 / 16) ** (1 / 8)) < 1e-12
    assert abs(compute_lsh_threshold(1, 1) - 1.0) < 1e-12


def test_s_curve_monotone_in_similarity():
    probs = [compute_collision_probability(s, 32, 8) for s in np.linspace(0, 1, 21)]
    assert all(b >= a - 1e-12 for a, b in zip(probs, probs[1:]))
    assert probs[0] == 0.0
    assert abs(probs[-1] - 1.0) < 1e-9


def test_false_rates_bounded():
    fp, fn = compute_false_rates(100, 5, 0.8)
    assert 0.0 <= fp <= 1.0
    assert 0.0 <= fn <= 1.0


def test_precomputed_config_4096_09():
    # The optimizer must land on the same optimum the reference recorded
    # for its hand-tuned table (/root/reference/lshrs/utils/br.py:42).
    assert get_optimal_config(4096, 0.9) == (64, 64)
    assert 4096 in PRECOMPUTED_CONFIGS
    row = PRECOMPUTED_CONFIGS[4096]
    assert row[0.9] == (64, 64)


def test_precomputed_matches_reference_recorded_optima():
    assert get_optimal_config(16384, 0.8) == (512, 32)
    assert get_optimal_config(32768, 0.9) == (512, 64)
    assert get_optimal_config(65536, 0.95) == (512, 128)


def test_get_optimal_config_product_invariant():
    for num_perm in (128, 256, 100, 4096):
        for t in (0.3, 0.5, 0.8, 0.95):
            b, r = get_optimal_config(num_perm, t)
            assert b * r == num_perm


def test_find_optimal_br_none_when_impossible():
    # A prime hash budget only factors as 1*p / p*1, whose thresholds sit
    # at the extremes; a mid-range target has no config within tolerance.
    assert find_optimal_br(127, 0.5) is None
