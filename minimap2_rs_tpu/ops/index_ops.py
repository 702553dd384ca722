"""Device-resident minimizer index and vectorized lookup.

The flat sorted-array layout (oracle/index.py) maps directly to HBM:
keys as uint32 (hi, lo) pairs plus starts/counts/positions. Lookup is a
vectorized lower-bound binary search (fori_loop over ~log2(U) gather+
compare steps) — replacing the reference's per-bucket HashMap probe
(/root/reference/src/index.rs:143-154) with a branch-free form the
TPU executes for thousands of queries at once.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import u64
from .u64 import U64Pair

I32 = jnp.int32
U32 = jnp.uint32


_PREFIX_BITS = 20


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceIndex:
    """HBM-resident index arrays. Metadata (w/k/seq table) stays host-side
    in the companion OracleIndex.

    The prefix table narrows every lookup to one 2^20-bucket of the
    sorted key array (the device analog of the reference's 2^b bucket
    dispatch, index.rs:143-147), so the binary search needs only
    ~log2(max bucket size) gather steps instead of log2(U)."""

    keys_hi: jnp.ndarray   # (U,) uint32
    keys_lo: jnp.ndarray   # (U,) uint32
    starts: jnp.ndarray    # (U,) int32
    counts: jnp.ndarray    # (U,) int32
    pos_hi: jnp.ndarray    # (P,) uint32 — rid
    pos_lo: jnp.ndarray    # (P,) uint32 — pos<<1|strand
    prefix: jnp.ndarray    # (2^16 + 1,) int32 lower bounds by key prefix
    prefix_shift: int = 0  # static: key >> shift yields the prefix
    lb_steps: int = 32     # static: binary search steps within a bucket

    def tree_flatten(self):
        return (
            (self.keys_hi, self.keys_lo, self.starts, self.counts,
             self.pos_hi, self.pos_lo, self.prefix),
            (self.prefix_shift, self.lb_steps),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, prefix_shift=aux[0], lb_steps=aux[1])

    @staticmethod
    def from_host(keys: np.ndarray, starts: np.ndarray, counts: np.ndarray,
                  positions: np.ndarray, key_bits: int = 56) -> "DeviceIndex":
        """Split host uint64 arrays into device uint32 pairs and build the
        prefix table. key_bits bounds the hashed key width (2k)."""
        shift = max(0, key_bits - _PREFIX_BITS)
        prefixes = (keys >> np.uint64(shift)).astype(np.int64)
        table = np.searchsorted(
            prefixes, np.arange((1 << _PREFIX_BITS) + 1), side="left"
        ).astype(np.int32)
        bucket_sizes = np.diff(table)
        max_bucket = int(bucket_sizes.max()) if bucket_sizes.size else 1
        lb_steps = max(1, int(np.ceil(np.log2(max_bucket + 1))) + 1)
        return DeviceIndex(
            keys_hi=jnp.asarray((keys >> np.uint64(32)).astype(np.uint32)),
            keys_lo=jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            starts=jnp.asarray(starts.astype(np.int32)),
            counts=jnp.asarray(counts.astype(np.int32)),
            pos_hi=jnp.asarray((positions >> np.uint64(32)).astype(np.uint32)),
            pos_lo=jnp.asarray((positions & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            prefix=jnp.asarray(table),
            prefix_shift=shift,
            lb_steps=lb_steps,
        )


def lower_bound_u64pair(
    keys: U64Pair, q: U64Pair, n_keys: int | None = None
) -> jnp.ndarray:
    """Vectorized lower_bound of q (any shape) in sorted `keys` (1-D)."""
    n = keys.hi.shape[0] if n_keys is None else n_keys
    lo = jnp.zeros(q.hi.shape, dtype=I32)
    hi = jnp.full(q.hi.shape, n, dtype=I32)
    steps = max(1, int(np.ceil(np.log2(n + 1))) + 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        kmid = U64Pair(keys.hi[mid], keys.lo[mid])
        go_right = u64.lt(kmid, q)
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


@functools.partial(jax.jit)
def index_lookup(idx: DeviceIndex, q: U64Pair):
    """For each query key: (start, count) of its occurrence block, count 0
    when absent (Index::get, index.rs:143-154). Prefix-table dispatch +
    short in-bucket binary search."""
    keys = U64Pair(idx.keys_hi, idx.keys_lo)
    p = u64.shr(q, idx.prefix_shift).lo.astype(jnp.int32)
    p = jnp.clip(p, 0, idx.prefix.shape[0] - 2)
    lo = idx.prefix[p]
    hi = idx.prefix[p + 1]

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        kmid = U64Pair(idx.keys_hi[mid], idx.keys_lo[mid])
        go_right = u64.lt(kmid, q) & (lo < hi)
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, idx.lb_steps, body, (lo, hi))
    pos = lo
    n = idx.keys_hi.shape[0]
    safe = jnp.minimum(pos, n - 1)
    found = (pos < n) & u64.eq(U64Pair(idx.keys_hi[safe], idx.keys_lo[safe]), q)
    start = jnp.where(found, idx.starts[safe], 0)
    count = jnp.where(found, idx.counts[safe], 0)
    return start, count
