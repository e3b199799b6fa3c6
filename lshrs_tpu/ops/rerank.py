"""Device-fused cosine rerank over the HBM-resident payload matrix.

The reference's top-p mode round-trips every candidate through a
user-supplied ``vector_fetch_fn`` and reranks on host
(`/root/reference/lshrs/core/main.py:632-647`). With ``store_vectors=True``
the payload lives in HBM, so rerank is one MXU matvec over the whole store
plus a masked two-key sort — only the top ``max_out`` (id, score) pairs and
the candidate count ever reach the host.

Ordering: (cosine desc, id asc) — deterministic where the reference's
argpartition-based tie handling is not; identical whenever scores are
distinct.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rerank_topp_core",
    "rerank_topp",
    "rerank_topp_batch_core",
    "rerank_topp_batch",
]

# Host-side constant: module import must not touch the device backend.
_INT32_MAX = np.int32(2**31 - 1)


def rerank_topp_core(
    payload: jax.Array,
    pnorm: jax.Array,
    ids: jax.Array,
    counts_row: jax.Array,
    qvec: jax.Array,
    *,
    max_out: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Rank colliding candidates by cosine similarity, on device.

    Args:
        payload: ``(C, dim)`` float32 raw vectors (dead slots arbitrary).
        pnorm: ``(C,)`` float32 precomputed L2 norms of payload rows.
        ids: ``(C,)`` int32, -1 dead.
        counts_row: ``(C,)`` int32 band-collision counts for this query.
        qvec: ``(dim,)`` float32 query.
        max_out: ranked prefix length to return.

    Returns:
        ``(ids (max_out,), sims (max_out,), n_candidates ())`` — candidates
        ordered by (cosine desc, id asc); entries past ``n_candidates``
        carry id -1.
    """
    # HIGHEST precision: TPU matmuls default to bf16 passes (~1e-3
    # relative error) — the reference computes cosines in host float32,
    # and ~1e-3 noise visibly reorders near-ties. A bfloat16 payload is
    # already rounded, so it keeps the fast native path.
    bf16_payload = payload.dtype == jnp.bfloat16
    dots = jnp.dot(
        payload,
        qvec.astype(payload.dtype) if bf16_payload else qvec,
        preferred_element_type=jnp.float32,
        precision=None if bf16_payload else jax.lax.Precision.HIGHEST,
    )  # (C,) — MXU matvec
    qn = jnp.sqrt(jnp.sum(qvec * qvec))
    denom = jnp.maximum(pnorm * qn, 1e-30)
    sims = dots / denom
    mask = (counts_row > 0) & (ids >= 0)
    n = mask.sum()
    neg = jnp.where(mask, -sims, jnp.inf)
    tie = jnp.where(mask, ids, _INT32_MAX)
    _, _, sorted_sims, sorted_ids = jax.lax.sort((neg, tie, sims, ids), num_keys=2)
    out = min(max_out, sorted_ids.shape[0])
    out_ids = jnp.where(
        jnp.arange(out) < n, sorted_ids[:out], -1
    )
    return out_ids, sorted_sims[:out], n


rerank_topp = partial(jax.jit, static_argnames=("max_out",))(rerank_topp_core)


def rerank_topp_batch_core(
    payload: jax.Array,
    pnorm: jax.Array,
    ids: jax.Array,
    counts: jax.Array,
    qvecs: jax.Array,
    *,
    max_out: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched :func:`rerank_topp_core`: one MXU matmul for all queries.

    Args:
        counts: ``(Q, C)`` int32 per-query collision counts.
        qvecs: ``(Q, dim)`` float32 queries.

    Returns:
        ``(ids (Q, max_out), sims (Q, max_out), n (Q,))`` per query,
        ordered by (cosine desc, id asc).

    Precision: float32 queries against a float32 payload get a
    HIGHEST-precision matmul (TPU matmuls otherwise run bf16 passes with
    ~1e-3 relative error — enough to reorder near-ties vs the
    reference's host-f32 cosines). Inputs that *arrive* rounded — a
    bfloat16 query wire or a bfloat16 resident payload — keep the fast
    native-precision path.
    """
    exact = qvecs.dtype == jnp.float32 and payload.dtype == jnp.float32
    bf16_payload = payload.dtype == jnp.bfloat16
    qd = qvecs.astype(payload.dtype) if bf16_payload else qvecs.astype(jnp.float32)
    qvecs = qvecs.astype(jnp.float32)
    dots = jnp.dot(
        qd,
        payload.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else None,
    )  # (Q, C)
    qn = jnp.sqrt(jnp.sum(qvecs * qvecs, axis=1, keepdims=True))
    denom = jnp.maximum(pnorm[None, :] * qn, 1e-30)
    sims = dots / denom
    mask = (counts > 0) & (ids >= 0)[None, :]
    n = mask.sum(axis=1)
    q, c = sims.shape
    out = min(max_out, c)
    if out <= 1024 < c:
        # Fast path: value-exact top_k on masked sims, then an exact
        # (cosine desc, id asc) sort of the small selected set. Ordering
        # among *exactly equal* cosines straddling the cut is unspecified
        # (the reference's argpartition has the same property); everywhere
        # else this is identical to the full sort.
        msims = jnp.where(mask, sims, -jnp.inf)
        top_sims, top_pos = jax.lax.top_k(msims, out)
        sel_ids = jnp.take(ids, top_pos)
        sel_mask = jnp.take_along_axis(mask, top_pos, axis=1)
        neg = jnp.where(sel_mask, -top_sims, jnp.inf)
        tie = jnp.where(sel_mask, sel_ids, _INT32_MAX)
        _, _, sorted_sims, sorted_ids = jax.lax.sort(
            (neg, tie, top_sims, sel_ids), num_keys=2
        )
    else:
        neg = jnp.where(mask, -sims, jnp.inf)
        ids_b = jnp.broadcast_to(ids[None, :], mask.shape)
        tie = jnp.where(mask, ids_b, _INT32_MAX)
        _, _, sorted_sims, sorted_ids = jax.lax.sort(
            (neg, tie, sims, ids_b), num_keys=2
        )
    out_ids = jnp.where(
        jnp.arange(out)[None, :] < n[:, None], sorted_ids[:, :out], -1
    )
    return out_ids, sorted_sims[:, :out], n


rerank_topp_batch = partial(jax.jit, static_argnames=("max_out",))(
    rerank_topp_batch_core
)
