"""Hash-range-sharded minimizer index.

For genomes whose index exceeds one chip's HBM, the flat sorted key table
is split into contiguous equal-count ranges — one per device along the
mesh's "ix" axis. Because every key lives in exactly one shard's sorted
slice, a local lookup either finds it or misses; no boundary bookkeeping
is needed. The reference has no analog (its index always fits RAM as 2^b
in-memory buckets, /root/reference/src/index.rs:47-50); this is the
SURVEY.md scale-out design ("hash-range shard minimizer table across
chips").

Each shard uses the same two-gather bucket-row layout as DeviceIndex
(ops/index_ops.py): an interleaved (U_loc + S, 4) row table plus a
per-shard prefix table, with uniform static (prefix_shift, bucket_slots)
across shards so one compiled program serves every device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.index_ops import _MAX_PREFIX_BITS, DeviceIndex

I32 = jnp.int32


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedDeviceIndex:
    """Stacked per-shard index tables with a leading shard axis (D, ...).

    Under shard_map with in_specs P("ix") each device sees its own
    (1, ...) slice; `local()` strips the leading axis."""

    kv: jnp.ndarray      # (D, U_loc + S, 4) uint32 [key_hi, key_lo, start, count]
    pos: jnp.ndarray     # (D, 2, P_loc) uint32 planes [rid], [pos<<1|strand]
    prefix: jnp.ndarray  # (D, 2^bits + 1) int32 per-shard prefix lower bounds
    dm: jnp.ndarray = None  # (D, 2^dm_bits, entry*S) per-shard direct tables
    dm_start: jnp.ndarray = None  # (D, 2^dm_bits * S) compact start planes
    prefix_shift: int = 0
    bucket_slots: int = 8
    n_keys_local: int = 0  # static: unpadded rows per shard (upper bound)
    dm_bits: int = 0
    dm_slots: int = 0
    dm_entry: int = 4
    dm_fp_bits: int = 0

    def tree_flatten(self):
        return (
            (self.kv, self.pos, self.prefix, self.dm, self.dm_start),
            (self.prefix_shift, self.bucket_slots, self.n_keys_local,
             self.dm_bits, self.dm_slots, self.dm_entry, self.dm_fp_bits),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, prefix_shift=aux[0], bucket_slots=aux[1],
                   n_keys_local=aux[2], dm_bits=aux[3], dm_slots=aux[4],
                   dm_entry=aux[5], dm_fp_bits=aux[6])

    @property
    def n_shards(self) -> int:
        return self.kv.shape[0]

    # ---- compatibility views (padding rows carry U64-max keys) ---------
    @property
    def keys_hi(self) -> jnp.ndarray:
        return self.kv[:, :, 0]

    @property
    def keys_lo(self) -> jnp.ndarray:
        return self.kv[:, :, 1]

    @property
    def starts(self) -> jnp.ndarray:
        return jax.lax.bitcast_convert_type(self.kv[:, :, 2], I32)

    @property
    def counts(self) -> jnp.ndarray:
        return jax.lax.bitcast_convert_type(self.kv[:, :, 3], I32)

    @property
    def pos_hi(self) -> jnp.ndarray:
        return self.pos[:, 0]

    @property
    def pos_lo(self) -> jnp.ndarray:
        return self.pos[:, 1]

    def local(self) -> DeviceIndex:
        """Inside shard_map: this shard's slice as a plain DeviceIndex."""
        return DeviceIndex(
            kv=self.kv[0], pos=self.pos[0], prefix=self.prefix[0],
            dm=self.dm[0] if self.dm is not None and self.dm_slots else None,
            dm_start=(self.dm_start[0]
                      if self.dm_start is not None and self.dm_slots else None),
            prefix_shift=self.prefix_shift, bucket_slots=self.bucket_slots,
            n_keys=self.n_keys_local, dm_bits=self.dm_bits,
            dm_slots=self.dm_slots, dm_entry=self.dm_entry,
            dm_fp_bits=self.dm_fp_bits,
        )

    @staticmethod
    def from_host(
        keys: np.ndarray, starts: np.ndarray, counts: np.ndarray,
        positions: np.ndarray, n_shards: int, key_bits: int = 56,
    ) -> "ShardedDeviceIndex":
        """Split flat host arrays into n_shards contiguous key ranges,
        padded to uniform per-shard sizes (padding keys are U64-max so
        every lookup misses them)."""
        U = keys.shape[0]
        bounds = [round(s * U / n_shards) for s in range(n_shards + 1)]
        u_loc = max(
            (bounds[s + 1] - bounds[s] for s in range(n_shards)), default=0
        )
        u_loc = max(u_loc, 1)
        p_loc = 1
        slices = []
        for s in range(n_shards):
            lo_k, hi_k = bounds[s], bounds[s + 1]
            if hi_k > lo_k:
                p_lo = int(starts[lo_k])
                p_hi = int(starts[hi_k - 1] + counts[hi_k - 1])
            else:
                p_lo = p_hi = 0
            slices.append((lo_k, hi_k, p_lo, p_hi))
            p_loc = max(p_loc, p_hi - p_lo)

        prefix_bits = max(12, int(np.ceil(np.log2(u_loc + 1))) + 4)
        prefix_bits = min(prefix_bits, _MAX_PREFIX_BITS, key_bits)
        shift = max(0, key_bits - prefix_bits)
        T = (1 << prefix_bits) + 1
        ptab = np.zeros((n_shards, T), dtype=np.int32)
        maxb = 1
        for s, (lo_k, hi_k, _p_lo, _p_hi) in enumerate(slices):
            kslice = (keys[lo_k:hi_k] >> np.uint64(shift)).astype(np.int64)
            hist = np.bincount(kslice, minlength=T - 1)
            np.cumsum(hist, out=ptab[s, 1:])
            if hi_k > lo_k:
                maxb = max(maxb, int(hist.max()))
        S = 4
        while S < maxb:
            S *= 2

        kv = np.full((n_shards, u_loc + S, 4), 0xFFFFFFFF, dtype=np.uint32)
        kv[:, :, 3] = 0
        pos = np.zeros((n_shards, 2, p_loc), dtype=np.uint32)
        for s, (lo_k, hi_k, p_lo, p_hi) in enumerate(slices):
            n = hi_k - lo_k
            if n == 0:
                continue
            kslice = keys[lo_k:hi_k]
            kv[s, :n, 0] = (kslice >> np.uint64(32)).astype(np.uint32)
            kv[s, :n, 1] = (kslice & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            kv[s, :n, 2] = (starts[lo_k:hi_k] - p_lo).astype(np.uint32)
            kv[s, :n, 3] = counts[lo_k:hi_k].astype(np.uint32)
            m = p_hi - p_lo
            pos[s, 0, :m] = (positions[p_lo:p_hi] >> np.uint64(32)).astype(np.uint32)
            pos[s, 1, :m] = (positions[p_lo:p_hi] & np.uint64(0xFFFFFFFF)).astype(np.uint32)

        # one uniform direct-mapped layout across shards (one compiled
        # program serves every device); S covers the worst shard, and the
        # byte cap bounds ONE table — each device holds exactly one
        from ..ops.index_ops import choose_direct_layout, fill_direct_table

        layout = choose_direct_layout(
            [keys[lo_k:hi_k] for (lo_k, hi_k, _pl, _ph) in slices],
            key_bits, int(counts.max()) if U else 0,
        )
        if layout is not None:
            dm_p, dm_S, dm_entry = layout
            built = [
                fill_direct_table(
                    keys[lo_k:hi_k], starts[lo_k:hi_k] - p_lo,
                    counts[lo_k:hi_k], key_bits, dm_p, dm_S, dm_entry,
                )
                for (lo_k, hi_k, p_lo, _ph) in slices
            ]
            dm = np.stack([b[0] for b in built])
            dm_start = (np.stack([b[1] for b in built])
                        if dm_entry == 2 else None)
        else:
            dm_p = dm_S = 0
            dm_entry = 4
            dm = np.zeros((n_shards, 0, 4), dtype=np.uint32)
            dm_start = None
        return ShardedDeviceIndex(
            kv=jnp.asarray(kv), pos=jnp.asarray(pos), prefix=jnp.asarray(ptab),
            dm=jnp.asarray(dm),
            dm_start=jnp.asarray(dm_start) if dm_start is not None else None,
            prefix_shift=shift, bucket_slots=S, n_keys_local=u_loc,
            dm_bits=dm_p, dm_slots=dm_S, dm_entry=dm_entry,
            dm_fp_bits=max(0, key_bits - dm_p),
        )
