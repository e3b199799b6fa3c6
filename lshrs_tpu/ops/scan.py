"""Device collision-counting scan and exact top-k selection.

This replaces the reference's query hot loop — one Redis SMEMBERS round-trip
per band plus a Python dict accumulate
(`/root/reference/lshrs/core/main.py:1088-1111`) — with a fused on-device
scan over the HBM-resident signature store:

  for each chunk of the store (static-shape `lax.scan`):
      band_match[q, c, b] = all W signature words of band b equal   (VPU)
      counts[q, c]        = number of matching bands
      chunk top-k         = `lax.top_k` on a packed (count, id-rank) key
  final merge             = lexicographic `lax.sort` by (-count, id)

Exactness: the reference orders candidates by ``(-collision_count, index)``
(`/root/reference/lshrs/core/main.py:614`). `lax.top_k` alone breaks count
ties by *position*, which is not id order, so each chunk carries a
precomputed ``rank`` array — the rank of every slot's id within its chunk
(order-isomorphic to id). The per-chunk selection key
``count * chunk + (chunk - 1 - rank)`` therefore yields exact
(count desc, id asc) order inside a chunk, and the final cross-chunk merge
sorts the small pooled candidate set with a two-key lexicographic
`lax.sort`. Results are bit-identical to the reference ordering.

All shapes are static: dead/empty slots carry id -1 and are masked to
count 0; the host filters zeros. ``capacity`` is always a multiple of
``chunk``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "collision_topk",
    "collision_topk_core",
    "collision_counts",
    "collision_counts_core",
    "merge_topk_pools",
    "compute_chunk_ranks",
]

_INT32_MAX = jnp.int32(2**31 - 1)


def _band_counts(chunk_sig: jax.Array, qwords: jax.Array, num_bands: int) -> jax.Array:
    """Collision counts of one store chunk against a query batch.

    Args:
        chunk_sig: ``(chunk, BW)`` uint32 packed signatures.
        qwords: ``(Q, BW)`` uint32 query signatures.
    Returns:
        ``(Q, chunk)`` int32 — number of bands whose full signature matches.
    """
    q, bw = qwords.shape
    chunk = chunk_sig.shape[0]
    w = bw // num_bands
    eq = chunk_sig[None, :, :] == qwords[:, None, :]  # (Q, chunk, BW)
    if w > 1:
        band_match = eq.reshape(q, chunk, num_bands, w).all(axis=-1)
    else:
        band_match = eq
    return band_match.sum(axis=-1).astype(jnp.int32)


def collision_topk_core(
    sig: jax.Array,
    ids: jax.Array,
    ranks: jax.Array,
    qwords: jax.Array,
    *,
    num_bands: int,
    k: int,
    chunk: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k candidates by (collision count desc, id asc).

    Args:
        sig: ``(C, BW)`` uint32 store signatures, C a multiple of ``chunk``.
        ids: ``(C,)`` int32 slot ids, -1 for dead/empty slots.
        ranks: ``(C,)`` int32 rank of each slot's id within its chunk
            (see :func:`compute_chunk_ranks`).
        qwords: ``(Q, BW)`` uint32 query signatures.
        k: candidates to return per query (``k <= C``).

    Returns:
        ``(counts, out_ids)``, each ``(Q, k)``: collision counts (0 padding
        at the tail) and candidate ids (-1 where count is 0), in exact
        (count desc, id asc) order.
    """
    c_total, bw = sig.shape
    nchunks = c_total // chunk
    q = qwords.shape[0]
    k_chunk = min(k, chunk)

    sig_c = sig.reshape(nchunks, chunk, bw)
    ids_c = ids.reshape(nchunks, chunk)
    ranks_c = ranks.reshape(nchunks, chunk)

    def body(carry, xs):
        chunk_sig, chunk_ids, chunk_ranks = xs
        counts = _band_counts(chunk_sig, qwords, num_bands)  # (Q, chunk)
        counts = jnp.where(chunk_ids[None, :] >= 0, counts, 0)
        # Packed selection key: count-major, then id-rank ascending. Fits
        # int32: count <= num_bands <= 2^16, chunk <= 2^14.
        key = counts * chunk + (chunk - 1 - chunk_ranks)[None, :]
        top_key, top_pos = jax.lax.top_k(key, k_chunk)  # (Q, k_chunk)
        sel_counts = top_key // chunk
        sel_ids = jnp.take_along_axis(
            jnp.broadcast_to(chunk_ids[None, :], (q, chunk)), top_pos, axis=1
        )
        return carry, (sel_counts, sel_ids)

    _, (pool_counts, pool_ids) = jax.lax.scan(body, 0, (sig_c, ids_c, ranks_c))
    # (nchunks, Q, k_chunk) -> (Q, nchunks * k_chunk)
    pool_counts = jnp.moveaxis(pool_counts, 0, 1).reshape(q, -1)
    pool_ids = jnp.moveaxis(pool_ids, 0, 1).reshape(q, -1)
    return merge_topk_pools(pool_counts, pool_ids, k=k)


def merge_topk_pools(
    pool_counts: jax.Array, pool_ids: jax.Array, *, k: int
) -> tuple[jax.Array, jax.Array]:
    """Merge pooled (count, id) candidates to the exact global top-k.

    Ascending lexicographic sort by (-count, id); empty entries (count 0)
    are forced to the end via id = INT32_MAX. Used for both the cross-chunk
    merge on one device and the cross-shard merge after an all-gather.
    """
    q = pool_counts.shape[0]
    neg_counts = -pool_counts
    tie_ids = jnp.where(pool_counts > 0, pool_ids, _INT32_MAX)
    _, _, sorted_counts, sorted_ids = jax.lax.sort(
        (neg_counts, tie_ids, pool_counts, pool_ids), num_keys=2
    )
    out_k = min(k, sorted_counts.shape[1])
    counts_out = sorted_counts[:, :out_k]
    ids_out = jnp.where(counts_out > 0, sorted_ids[:, :out_k], -1)
    if out_k < k:  # pool smaller than k: pad
        pad = k - out_k
        counts_out = jnp.pad(counts_out, ((0, 0), (0, pad)))
        ids_out = jnp.pad(ids_out, ((0, 0), (0, pad)), constant_values=-1)
    return counts_out, ids_out


collision_topk = partial(jax.jit, static_argnames=("num_bands", "k", "chunk"))(
    collision_topk_core
)


def collision_counts_core(
    sig: jax.Array,
    ids: jax.Array,
    qwords: jax.Array,
    *,
    num_bands: int,
    chunk: int,
) -> jax.Array:
    """Full per-slot collision counts, ``(Q, C)`` int32 (0 at dead slots).

    Used by the unbounded-candidate paths (``top_k=None`` and top-p rerank),
    where the caller needs every colliding candidate, exactly like the
    reference's candidate dict — but computed in one device pass.
    """
    c_total, bw = sig.shape
    nchunks = c_total // chunk
    q = qwords.shape[0]
    sig_c = sig.reshape(nchunks, chunk, bw)
    ids_c = ids.reshape(nchunks, chunk)

    def body(carry, xs):
        chunk_sig, chunk_ids = xs
        counts = _band_counts(chunk_sig, qwords, num_bands)
        counts = jnp.where(chunk_ids[None, :] >= 0, counts, 0)
        return carry, counts

    _, all_counts = jax.lax.scan(body, 0, (sig_c, ids_c))  # (nchunks, Q, chunk)
    return jnp.moveaxis(all_counts, 0, 1).reshape(q, c_total)


collision_counts = partial(jax.jit, static_argnames=("num_bands", "chunk"))(
    collision_counts_core
)


@partial(jax.jit, static_argnames=("chunk",))
def compute_chunk_ranks(ids: jax.Array, *, chunk: int) -> jax.Array:
    """Rank of each slot's id within its chunk (dead slots included).

    ``rank[i]`` is order-isomorphic to ``ids[i]`` among the slots of the
    same chunk, which is all :func:`collision_topk` needs for exact id
    tie-breaking. Recomputed after appends (cheap: two sorts per chunk);
    deletions don't disturb the relative order of surviving slots.
    """
    c_total = ids.shape[0]
    ids2 = ids.reshape(c_total // chunk, chunk)
    order = jnp.argsort(ids2, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    return ranks.reshape(c_total).astype(jnp.int32)
