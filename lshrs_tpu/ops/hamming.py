"""Hamming-distance ranking over full signatures — the MXU query mode.

Band-collision counting (the reference's only ranking signal) quantises
each band to hit/miss and discards near-miss information. This mode ranks
candidates by the Hamming distance between *entire* ``num_perm``-bit
signatures — the classic SimHash angular estimator
(``theta ~ pi * hamming / num_perm``) — which uses every bit of the hash
budget and maps perfectly onto the MXU:

    signatures as +-1 int8 bitplanes:  (C, num_perm)
    dots = qbits @ planes.T            one int8 matmul, dot = P - 2*hamming
    rank by (dot desc, id asc)         same packed-key selection as the scan

This is an extension beyond reference parity (`query_hamming` on `LSHRS`):
it typically *dominates* collision counting for recall at equal memory
while running at matmul throughput instead of VPU compare throughput.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lshrs_tpu.ops.scan import merge_topk_pools

__all__ = ["unpack_bitplanes", "hamming_topk"]


@partial(jax.jit, static_argnames=("num_bands", "rows_per_band"))
def unpack_bitplanes(
    words: jax.Array, *, num_bands: int, rows_per_band: int
) -> jax.Array:
    """Packed uint32 signature words -> +-1 int8 bitplanes.

    Args:
        words: ``(n, num_bands * W)`` uint32 (see `lshrs_tpu.ops.bitpack`).
    Returns:
        ``(n, num_bands * rows_per_band)`` int8 in {-1, +1}, bit order
        matching the packing (band-major, row-minor).
    """
    n = words.shape[0]
    w = words.shape[1] // num_bands
    banded = words.reshape(n, num_bands, w)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (banded[..., None] >> shifts) & jnp.uint32(1)  # (n, B, W, 32)
    bits = bits.reshape(n, num_bands, w * 32)[:, :, :rows_per_band]
    return (2 * bits.astype(jnp.int8) - 1).reshape(n, num_bands * rows_per_band)


@partial(jax.jit, static_argnames=("k", "chunk"))
def hamming_topk(
    planes: jax.Array,
    ids: jax.Array,
    ranks: jax.Array,
    qbits: jax.Array,
    *,
    k: int,
    chunk: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k by (hamming asc, id asc) over +-1 bitplanes.

    Args:
        planes: ``(C, P)`` int8 store bitplanes (dead slots arbitrary).
        ids / ranks: slot ids (-1 dead) and per-chunk id-ranks.
        qbits: ``(Q, P)`` int8 query bitplanes.

    Returns:
        ``(hamming (Q, k), out_ids (Q, k))``; empty tail entries carry
        id -1 and hamming P+1.
    """
    c, p = planes.shape
    q = qbits.shape[0]
    nchunks = c // chunk
    k_chunk = min(k, chunk)

    planes_c = planes.reshape(nchunks, chunk, p)
    ids_c = ids.reshape(nchunks, chunk)
    ranks_c = ranks.reshape(nchunks, chunk)

    def body(carry, xs):
        chunk_planes, chunk_ids, chunk_ranks = xs
        dots = jax.lax.dot_general(
            qbits,
            chunk_planes,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (Q, chunk) — MXU int8 matmul
        # scaled similarity in [1, P+1] for alive slots, 0 for dead; the
        # +1 shift keeps even the worst alive slot above every dead slot.
        scaled = jnp.where(
            chunk_ids[None, :] >= 0, (dots + p) // 2 + 1, 0
        )
        key = scaled * chunk + (chunk - 1 - chunk_ranks)[None, :]
        top_key, top_pos = jax.lax.top_k(key, k_chunk)
        sel_scaled = top_key // chunk
        sel_ids = jnp.take_along_axis(
            jnp.broadcast_to(chunk_ids[None, :], (q, chunk)), top_pos, axis=1
        )
        return carry, (sel_scaled, sel_ids)

    _, (pool_scaled, pool_ids) = jax.lax.scan(body, 0, (planes_c, ids_c, ranks_c))
    pool_scaled = jnp.moveaxis(pool_scaled, 0, 1).reshape(q, -1)
    pool_ids = jnp.moveaxis(pool_ids, 0, 1).reshape(q, -1)
    scaled_out, ids_out = merge_topk_pools(pool_scaled, pool_ids, k=k)
    # scaled = (dot + P)/2 + 1 and hamming = (P - dot)/2  =>  h = P+1-scaled
    hamming = jnp.where(ids_out >= 0, p + 1 - scaled_out, p + 1)
    return hamming, ids_out
