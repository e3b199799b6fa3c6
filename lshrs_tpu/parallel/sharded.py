"""Mesh-sharded device signature store.

Scale-out design (absent from the single-process reference; see
`/root/repo/SURVEY.md` section 2's parallelism checklist): the slot axis of
the signature store shards across a 1-D `jax.sharding.Mesh`, each device
scanning only its rows. A query executes SPMD under `shard_map`:

    replicate query words  ->  shard-local chunked scan + exact local top-k
                           ->  `all_gather` of (count, id) k-lists over ICI
                           ->  identical exact merge on every device

The merge key is (count desc, id asc) — the same total order the
single-device engine and the reference use — so sharded results are
bit-identical to unsharded ones regardless of which shard holds which row.

Appends keep the base class's tail-append logic but pin array placement
with `NamedSharding`; because the scan is capacity-wide and uniform, row
placement does not affect query latency, only memory balance, and tail
growth distributes rows round-robin across shards at `rows_per_shard`
granularity through the block-cyclic layout below.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lshrs_tpu.ops.scan import (
    collision_counts_core,
    collision_topk_core,
    compute_chunk_ranks,
    merge_topk_pools,
)
from lshrs_tpu.storage.device import DeviceStore

__all__ = ["ShardedDeviceStore"]


class ShardedDeviceStore(DeviceStore):
    """`DeviceStore` with slot-axis sharding and ICI top-k merge.

    Args:
        mesh: 1-D device mesh; its single axis shards the slot dimension.
        Everything else as `DeviceStore`. Capacity is kept a multiple of
        ``n_shards * chunk_size`` so every shard scans whole chunks.
    """

    def __init__(self, *, mesh: Mesh, **kwargs) -> None:
        if len(mesh.axis_names) != 1:
            raise ValueError("ShardedDeviceStore expects a 1-D mesh")
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_shards = mesh.devices.size
        super().__init__(**kwargs)
        # Re-align capacity to shard x chunk granularity and (re)place.
        if self._capacity % (self.n_shards * self.chunk):
            self._grow(self._capacity)
        else:
            self._reshard()

    # -- placement ---------------------------------------------------------

    def _row_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis))

    def _reshard(self) -> None:
        shd = self._row_sharding()
        self._sig = jax.device_put(self._sig, shd)
        self._ids = jax.device_put(self._ids, shd)
        self._ranks = jax.device_put(self._ranks, shd)
        if self._payload is not None:
            self._payload = jax.device_put(self._payload, shd)

    def _grow(self, new_cap: int) -> None:
        granularity = self.n_shards * self.chunk
        new_cap = -(-new_cap // granularity) * granularity
        super()._grow(new_cap)
        self._reshard()

    def _append(self, ids32, words_np, vectors) -> None:
        super()._append(ids32, words_np, vectors)
        self._reshard()

    def _overwrite(self, slots, words_np, vectors) -> None:
        super()._overwrite(slots, words_np, vectors)
        self._reshard()

    # -- sharded queries -----------------------------------------------------

    def _local_rows(self) -> int:
        return self._capacity // self.n_shards

    def query_topk(self, qwords, k: int) -> tuple[np.ndarray, np.ndarray]:
        qw = jnp.asarray(qwords, dtype=jnp.uint32)
        if self._size == 0:
            q = qw.shape[0]
            return (np.zeros((q, k), np.int32), np.full((q, k), -1, np.int32))
        k_eff = max(1, min(k, self._local_rows()))
        counts, ids = _sharded_topk(
            self.mesh,
            self.axis,
            self._sig,
            self._ids,
            self._ranks,
            qw,
            num_bands=self.num_bands,
            k=k_eff,
            chunk=self.chunk,
        )
        counts, ids = np.asarray(counts), np.asarray(ids)
        if k_eff < k:
            q = counts.shape[0]
            counts = np.pad(counts, ((0, 0), (0, k - k_eff)))
            ids = np.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return counts, ids

    def query_counts(self, qwords) -> tuple[np.ndarray, np.ndarray]:
        qw = jnp.asarray(qwords, dtype=jnp.uint32)
        if self._size == 0:
            return (
                np.zeros((qw.shape[0], self._capacity), np.int32),
                np.full((self._capacity,), -1, np.int32),
            )
        counts = _sharded_counts(
            self.mesh,
            self.axis,
            self._sig,
            self._ids,
            qw,
            num_bands=self.num_bands,
            chunk=self.chunk,
        )
        return np.asarray(counts), np.asarray(self._ids)

    def stats(self) -> dict:
        out = super().stats()
        out["backend"] = "device-sharded"
        out["n_shards"] = self.n_shards
        out["rows_per_shard"] = self._local_rows()
        return out


# ---------------------------------------------------------------------------
# SPMD kernels
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("mesh", "axis", "num_bands", "k", "chunk"),
)
def _sharded_topk(mesh, axis, sig, ids, ranks, qwords, *, num_bands, k, chunk):
    def local(sig_l, ids_l, ranks_l, qw):
        counts, out_ids = collision_topk_core(
            sig_l, ids_l, ranks_l, qw, num_bands=num_bands, k=k, chunk=chunk
        )
        # (n_shards, Q, k) on every device after one ICI all-gather.
        counts_g = jax.lax.all_gather(counts, axis)
        ids_g = jax.lax.all_gather(out_ids, axis)
        q = qw.shape[0]
        pool_counts = jnp.moveaxis(counts_g, 0, 1).reshape(q, -1)
        pool_ids = jnp.moveaxis(ids_g, 0, 1).reshape(q, -1)
        return merge_topk_pools(pool_counts, pool_ids, k=k)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(sig, ids, ranks, qwords)


@partial(jax.jit, static_argnames=("mesh", "axis", "num_bands", "chunk"))
def _sharded_counts(mesh, axis, sig, ids, qwords, *, num_bands, chunk):
    def local(sig_l, ids_l, qw):
        return collision_counts_core(
            sig_l, ids_l, qw, num_bands=num_bands, chunk=chunk
        )

    # Counts come back sharded along the slot axis (global layout preserved).
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )(sig, ids, qwords)
