"""Hash-range-sharded minimizer index.

For genomes whose index exceeds one chip's HBM, the flat sorted key array
is split into contiguous equal-count ranges — one per device along the
mesh's "ix" axis. Because every key lives in exactly one shard's sorted
slice, a local binary search either finds it or misses; no boundary
bookkeeping is needed. The reference has no analog (its index always fits
RAM as 2^b in-memory buckets, /root/reference/src/index.rs:47-50); this is
the SURVEY.md scale-out design ("hash-range shard minimizer table across
chips").
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.index_ops import DeviceIndex


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedDeviceIndex:
    """Stacked per-shard index arrays with a leading shard axis (D, ...).

    Under shard_map with in_specs P("ix") each device sees its own
    (1, U_loc)/(1, P_loc) slice; `local()` strips the leading axis."""

    keys_hi: jnp.ndarray  # (D, U_loc)
    keys_lo: jnp.ndarray
    starts: jnp.ndarray   # (D, U_loc) — local offsets into the shard's positions
    counts: jnp.ndarray
    pos_hi: jnp.ndarray   # (D, P_loc)
    pos_lo: jnp.ndarray
    prefix: jnp.ndarray   # (D, 2^20 + 1) per-shard prefix lower bounds
    prefix_shift: int = 0
    lb_steps: int = 32

    def tree_flatten(self):
        return (
            (self.keys_hi, self.keys_lo, self.starts, self.counts,
             self.pos_hi, self.pos_lo, self.prefix),
            (self.prefix_shift, self.lb_steps),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, prefix_shift=aux[0], lb_steps=aux[1])

    @property
    def n_shards(self) -> int:
        return self.keys_hi.shape[0]

    def local(self) -> DeviceIndex:
        """Inside shard_map: this shard's slice as a plain DeviceIndex."""
        return DeviceIndex(
            keys_hi=self.keys_hi[0], keys_lo=self.keys_lo[0],
            starts=self.starts[0], counts=self.counts[0],
            pos_hi=self.pos_hi[0], pos_lo=self.pos_lo[0],
            prefix=self.prefix[0],
            prefix_shift=self.prefix_shift, lb_steps=self.lb_steps,
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
        kh = np.full((n_shards, u_loc), 0xFFFFFFFF, dtype=np.uint32)
        kl = np.full((n_shards, u_loc), 0xFFFFFFFF, dtype=np.uint32)
        st = np.zeros((n_shards, u_loc), dtype=np.int32)
        ct = np.zeros((n_shards, u_loc), dtype=np.int32)
        ph = np.zeros((n_shards, p_loc), dtype=np.uint32)
        plo = np.zeros((n_shards, p_loc), dtype=np.uint32)
        shift = max(0, key_bits - 20)
        ptab = np.zeros((n_shards, (1 << 20) + 1), dtype=np.int32)
        lb_steps = 1
        for s, (lo_k, hi_k, p_lo, p_hi) in enumerate(slices):
            n = hi_k - lo_k
            kslice = keys[lo_k:hi_k]
            ptab[s] = np.searchsorted(
                (kslice >> np.uint64(shift)).astype(np.int64),
                np.arange((1 << 20) + 1), side="left",
            ).astype(np.int32)
            if n:
                bmax = int(np.diff(ptab[s]).max())
                lb_steps = max(lb_steps, int(np.ceil(np.log2(bmax + 1))) + 1)
            if n == 0:
                continue
            kh[s, :n] = (kslice >> np.uint64(32)).astype(np.uint32)
            kl[s, :n] = (kslice & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            st[s, :n] = (starts[lo_k:hi_k] - p_lo).astype(np.int32)
            ct[s, :n] = counts[lo_k:hi_k].astype(np.int32)
            m = p_hi - p_lo
            ph[s, :m] = (positions[p_lo:p_hi] >> np.uint64(32)).astype(np.uint32)
            plo[s, :m] = (positions[p_lo:p_hi] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        return ShardedDeviceIndex(
            keys_hi=jnp.asarray(kh), keys_lo=jnp.asarray(kl),
            starts=jnp.asarray(st), counts=jnp.asarray(ct),
            pos_hi=jnp.asarray(ph), pos_lo=jnp.asarray(plo),
            prefix=jnp.asarray(ptab), prefix_shift=shift, lb_steps=lb_steps,
        )
