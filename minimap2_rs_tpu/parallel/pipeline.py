"""Distributed mapping over a device mesh (shard_map + XLA collectives).

Two execution modes (SURVEY.md section 2 parallelism table):

1. map_batch_dp — replicated index, reads data-parallel over "dp". No
   communication in the hot path (the rayon par_iter analog,
   /root/reference/src/index.rs:442-452, scaled across chips).

2. map_batch_sharded — index hash-range-sharded over "ix", reads
   data-parallel over "dp". Within a dp row every ix device holds the
   same reads and a different index range: each looks up its range and
   expands partial anchors, an all_to_all routes each read's anchors from
   all shards to its chaining home, chaining runs on 1/ix of the row's
   reads per device, and an all_gather reassembles the row. Collectives
   ride ICI; nothing touches the host between sketch and chain scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.chain_ops import ChainScalars, chain_dp_batch
from ..ops.index_ops import DeviceIndex
from ..ops.seeds_ops import build_anchors_device, query_occ_filter, sort_minimizers_by_key
from ..ops.sketch import compact_minimizers, sketch_positions
from .sharded_index import ShardedDeviceIndex

I32 = jnp.int32
U32 = jnp.uint32


def _local_map_core(dev_idx: DeviceIndex, codes, lengths, scalars, mid_occ,
                    *, w, k, hpc, q_occ_max, q_occ_frac, M, A):
    """Sketch -> anchors on one device (no chaining)."""
    ks, ps, emitted = sketch_positions(codes, lengths, w, k, hpc)
    cks, cps, n_mini, mini_ovf = compact_minimizers(ks, ps, emitted, M)
    sks, sps = sort_minimizers_by_key(cks, cps)
    keep = query_occ_filter(sks, n_mini, q_occ_max, q_occ_frac)
    x_hi, x_lo, y_hi, y_lo, n_anchors, anc_ovf = build_anchors_device(
        dev_idx, sks, sps, keep, lengths, mid_occ, A
    )
    return dict(
        cks=cks, cps=cps, n_mini=n_mini, mini_ovf=mini_ovf,
        x_hi=x_hi, x_lo=x_lo, y_hi=y_hi, y_lo=y_lo,
        n_anchors=n_anchors, anc_ovf=anc_ovf,
    )


def _chain(out, scalars, window):
    f, prev = chain_dp_batch(
        out["x_hi"], out["x_lo"].astype(I32), out["y_lo"].astype(I32),
        (out["y_hi"] & U32(0xFF)).astype(I32), scalars, window,
    )
    out.update(f=f, prev=prev)
    return out


def make_map_batch_dp(mesh: Mesh, statics: dict):
    """Data-parallel mapping step: reads sharded over 'dp', index
    replicated. Returns a jitted fn(dev_idx, codes, lengths, scalars,
    mid_occ) -> dict of sharded outputs."""

    def body(dev_idx, codes, lengths, scalars, mid_occ):
        out = _local_map_core(dev_idx, codes, lengths, scalars, mid_occ, **{
            kk: statics[kk] for kk in ("w", "k", "hpc", "q_occ_max", "q_occ_frac", "M", "A")
        })
        return _chain(out, scalars, statics["window"])

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("dp", None), P("dp"), P(), P()),
        out_specs=P("dp"),
        check_rep=False,
    )
    return jax.jit(fn)


def make_map_batch_sharded(mesh: Mesh, statics: dict):
    """Sharded-index mapping step over mesh axes ('dp', 'ix').

    codes are sharded over 'dp' and replicated over 'ix'; the index over
    'ix'. The per-read batch within a dp row must be divisible by the ix
    axis size."""
    n_ix = mesh.shape["ix"]

    def body(sidx: ShardedDeviceIndex, codes, lengths, scalars, mid_occ):
        local_idx = sidx.local()
        out = _local_map_core(local_idx, codes, lengths, scalars, mid_occ, **{
            kk: statics[kk] for kk in ("w", "k", "hpc", "q_occ_max", "q_occ_frac", "M", "A")
        })
        if n_ix > 1:
            # route each read's partial anchors to its chaining home:
            # (B_loc, A_shard) --all_to_all--> (B_loc/n_ix, A_shard*n_ix)
            def exchange(x):
                return jax.lax.all_to_all(x, "ix", split_axis=0, concat_axis=1, tiled=True)

            for kk in ("x_hi", "x_lo", "y_hi", "y_lo"):
                out[kk] = exchange(out[kk])
            n_anc = jax.lax.all_to_all(
                out["n_anchors"][:, None], "ix", split_axis=0, concat_axis=1, tiled=True
            )
            out["n_anchors"] = n_anc.sum(axis=1)
            out["anc_ovf"] = jax.lax.all_to_all(
                out["anc_ovf"][:, None], "ix", split_axis=0, concat_axis=1, tiled=True
            ).any(axis=1)
            # re-sort the concatenated shard slots (padding goes last)
            out["x_hi"], out["x_lo"], out["y_hi"], out["y_lo"] = jax.lax.sort(
                (out["x_hi"], out["x_lo"], out["y_hi"], out["y_lo"]),
                dimension=-1, num_keys=4,
            )
        out = _chain(out, scalars, statics["window"])
        if n_ix > 1:
            # reassemble the dp row: every ix device contributes its
            # 1/n_ix of the reads
            out = {
                kk: jax.lax.all_gather(val, "ix", axis=0, tiled=True)
                for kk, val in out.items()
            }
        return out

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("ix"), P("dp", None), P("dp"), P(), P()),
        out_specs=P("dp"),
        check_rep=False,
    )
    return jax.jit(fn)


def index_stats_psum(mesh: Mesh, sidx: ShardedDeviceIndex):
    """Global (n_keys, n_positions) via psum over the index shards — the
    collectives analog of the reference's stats/mid-occ reductions
    (index.rs:111-141)."""

    def body(sidx):
        local = sidx.local()
        n_keys = jnp.sum(local.counts > 0).astype(I32)
        n_pos = jnp.sum(local.counts).astype(I32)
        n_keys = jax.lax.psum(n_keys, "ix")
        n_pos = jax.lax.psum(n_pos, "ix")
        return n_keys[None], n_pos[None]

    fn = shard_map(
        body, mesh=mesh, in_specs=(P("ix"),), out_specs=P("ix"), check_rep=False
    )
    nk, npos = jax.jit(fn)(sidx)
    return int(nk[0]), int(npos[0])
