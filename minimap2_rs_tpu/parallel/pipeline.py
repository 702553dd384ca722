"""Distributed mapping over a device mesh (jax.shard_map + XLA collectives).

Two execution modes (SURVEY.md section 2 parallelism table):

1. *_dp — replicated index, reads data-parallel over "dp". No
   communication in the hot path (the rayon par_iter analog,
   /root/reference/src/index.rs:442-452, scaled across chips).

2. *_sharded — index hash-range-sharded over "ix", reads data-parallel
   over "dp". Within a dp row every ix device holds the same reads and a
   different index range: each looks up its range and expands partial
   anchors, an all_to_all routes each read's anchors from all shards to
   its chaining home, chaining runs on 1/ix of the row's reads per
   device, and an all_gather reassembles the row. Collectives ride ICI;
   nothing touches the host between sketch and the finalized PAF fields.

The `*_lite` makers run the FULL pipeline — sketch to finalized (B, 18)
PAF field rows (ops/finalize_ops.FIELDS) — on the mesh; the host only
formats lines (models/mesh_mapper.py). The plain makers stop at chain
(f, prev) for the general host-backtrack path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.stages import (
    chain_finalize_lite,
    lookup_expand,
    sketch_compact_filter,
    sketch_to_anchors,
    unpack_codes4,
)
from ..ops.chain_ops import chain_dp_batch
from ..ops.index_ops import DeviceIndex
from .sharded_index import ShardedDeviceIndex

I32 = jnp.int32
U32 = jnp.uint32

_CORE_KEYS = ("w", "k", "hpc", "q_occ_max", "q_occ_frac", "M", "A")


def _shmap(body, mesh, in_specs, out_specs):
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )


def _core(statics: dict) -> dict:
    return {kk: statics[kk] for kk in _CORE_KEYS}


def _codes(statics: dict, codes):
    return unpack_codes4(codes) if statics.get("packed") else codes


def _chain(out, scalars, window):
    f, prev = chain_dp_batch(
        out["x_hi"], out["x_lo"].astype(I32), out["y_lo"].astype(I32),
        (out["y_hi"] & U32(0xFF)).astype(I32), scalars, window,
    )
    out = dict(out)
    out.pop("mini_span", None)  # None leaf confuses shard_map out_specs
    out.update(f=f, prev=prev)
    return out


def _exchange_anchors(anc: dict, n_ix: int) -> dict:
    """Route each read's partial anchors from all index shards to its
    chaining home: (B_row, A) --all_to_all--> (B_row/n_ix, A*n_ix),
    then re-sort the concatenated slots (padding x_hi=U32-max goes last,
    preserving the reference's (x, y) anchor order, seeds.rs:58).
    Read block i of the dp row lands on ix device i — which is exactly
    the device that sketched it (codes are sharded over ('dp', 'ix')),
    so every per-read payload is already local."""
    anc = dict(anc)

    def ex(x):
        return jax.lax.all_to_all(x, "ix", split_axis=0, concat_axis=1, tiled=True)

    for kk in ("x_hi", "x_lo", "y_hi", "y_lo"):
        anc[kk] = ex(anc[kk])
    anc["n_anchors"] = ex(anc["n_anchors"][:, None]).sum(axis=1)
    anc["anc_ovf"] = ex(anc["anc_ovf"][:, None]).any(axis=1)
    anc["x_hi"], anc["x_lo"], anc["y_hi"], anc["y_lo"] = jax.lax.sort(
        (anc["x_hi"], anc["x_lo"], anc["y_hi"], anc["y_lo"]),
        dimension=-1, num_keys=4,
    )
    return anc


def _sharded_anchors(sidx, codes, lengths, mid_occ, statics, n_ix):
    """The sharded-mode front half: sketch/compact/filter each read ONCE
    on its home device (reads sharded over BOTH mesh axes), all_gather
    the compact (B, M) minimizer payloads across the ix shards, look up
    the whole dp row against the LOCAL hash range, and all_to_all the
    partial anchors back to each read's home. Returns the anc dict for
    chain_finalize (payloads local) plus the local lengths.

    Replaces the r2 scheme where every ix device re-sketched the full dp
    row (the duplicated compute that sank program-only scaling): what
    crosses ICI now is ~13 bytes/slot of minimizers + the anchors,
    instead of every shard redoing the sketch, compaction and sorts."""
    core = _core(statics)
    mini = sketch_compact_filter(
        codes, lengths,
        w=core["w"], k=core["k"], hpc=core["hpc"],
        q_occ_max=core["q_occ_max"], q_occ_frac=core["q_occ_frac"],
        M=core["M"],
    )
    if n_ix > 1:
        ag = lambda x: jax.lax.all_gather(x, "ix", axis=0, tiled=True)
        row = {kk: ag(mini[kk]) for kk in ("sks_hi", "sks_lo", "sps", "keep")}
        row_lengths = ag(lengths)
    else:
        row, row_lengths = mini, lengths
    anc = lookup_expand(sidx.local(), row, row_lengths, mid_occ, core["A"])
    if n_ix > 1:
        anc = _exchange_anchors(anc, n_ix)
    anc.update(
        cps=mini["cps"], mini_span=mini["mini_span"],
        n_mini=mini["n_mini"], mini_ovf=mini["mini_ovf"],
    )
    return anc


# ---------------------------------------------------------------------
# chain-score makers (general path: host backtracks from f/prev)
# ---------------------------------------------------------------------

def make_map_batch_dp(mesh: Mesh, statics: dict):
    """Data-parallel mapping step: reads sharded over 'dp', index
    replicated. Returns a jitted fn(dev_idx, codes, lengths, scalars,
    mid_occ) -> dict of sharded outputs."""

    def body(dev_idx, codes, lengths, scalars, mid_occ):
        anc = sketch_to_anchors(
            dev_idx, _codes(statics, codes), lengths, mid_occ, **_core(statics)
        )
        return _chain(anc, scalars, statics["window"])

    fn = _shmap(
        body, mesh,
        in_specs=(P(), P("dp", None), P("dp"), P(), P()),
        out_specs=P("dp"),
    )
    return jax.jit(fn)


def make_map_batch_sharded(mesh: Mesh, statics: dict):
    """Sharded-index mapping step over mesh axes ('dp', 'ix'). codes are
    sharded over BOTH axes (each device sketches only its own reads);
    the index over 'ix'. The batch must be divisible by dp * ix."""
    n_ix = mesh.shape["ix"]

    def body(sidx: ShardedDeviceIndex, codes, lengths, scalars, mid_occ):
        anc = _sharded_anchors(
            sidx, _codes(statics, codes), lengths, mid_occ, statics, n_ix
        )
        return _chain(anc, scalars, statics["window"])

    fn = _shmap(
        body, mesh,
        in_specs=(P("ix"), P(("dp", "ix"), None), P(("dp", "ix")), P(), P()),
        out_specs=P(("dp", "ix")),
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------
# lite makers (full pipeline on the mesh: PAF field rows out)
# ---------------------------------------------------------------------

def _lite_kwargs(statics: dict) -> dict:
    return dict(
        k=statics["k"], hpc=statics["hpc"], window=statics["window"],
        pallas_chain=statics.get("pallas_chain", False),
        flag_window_ovf=statics.get("flag_window_ovf", False),
        max_chain_skip=statics.get("max_chain_skip"),
        wide=statics.get("wide", True),
    )


def make_map_batch_dp_lite(mesh: Mesh, statics: dict):
    """Data-parallel FULL pipeline: (B, 18) finalized PAF field rows,
    reads sharded over 'dp', index replicated."""

    def body(dev_idx, codes, lengths, scalars, scalars_wide, mid_occ,
             tlens, rs, rr):
        anc = sketch_to_anchors(
            dev_idx, _codes(statics, codes), lengths, mid_occ, **_core(statics)
        )
        return chain_finalize_lite(
            anc, lengths, scalars, scalars_wide, tlens, rs, rr,
            **_lite_kwargs(statics),
        )

    fn = _shmap(
        body, mesh,
        in_specs=(P(), P("dp", None), P("dp"), P(), P(), P(), P(), P(), P()),
        out_specs=P("dp"),
    )
    return jax.jit(fn)


def sharded_payload_bytes(statics: dict, B_row: int, n_ix: int) -> dict:
    """Exact per-dp-row ICI payloads of one sharded-mode call (bytes),
    from the traced shapes — the minimizer all_gather ships 4 planes of
    (B_loc, M) (sks_hi/sks_lo/sps u32 + keep pred8), the anchor
    all_to_all moves 4 u32 planes of (B_row, A) with (n_ix-1)/n_ix
    crossing a link. Used to predict the sharded-mode ICI overhead on
    real hardware (SCALING.json): the virtual-CPU mesh can time program
    overhead but not ICI."""
    M, A = statics["M"], statics["A"]
    B_loc = max(B_row // n_ix, 1)
    gather_sent = B_loc * M * (4 + 4 + 4 + 1) * max(n_ix - 1, 0)
    a2a_sent = B_row * A * 4 * 4 * (n_ix - 1) // max(n_ix, 1)
    return {
        "minimizer_all_gather_bytes_per_device": gather_sent,
        "anchor_all_to_all_bytes_per_device": a2a_sent,
        "total_ici_bytes_per_device": gather_sent + a2a_sent,
        "reads_per_row": B_row,
        "ici_bytes_per_read": round((gather_sent + a2a_sent) / max(B_row, 1), 1),
    }


def make_map_batch_sharded_lite(mesh: Mesh, statics: dict):
    """Hash-range-sharded FULL pipeline: sketch once on each read's home
    device, minimizer all_gather to the shards, local lookups, anchor
    all_to_all back home, chaining+finalize local. The (B, 18) field
    rows come out sharded over ('dp', 'ix') in read order — no
    reassembly gather. statics['window'] applies to the post-exchange
    slot count (n_ix * A)."""
    n_ix = mesh.shape["ix"]

    def body(sidx: ShardedDeviceIndex, codes, lengths, scalars,
             scalars_wide, mid_occ, tlens, rs, rr):
        anc = _sharded_anchors(
            sidx, _codes(statics, codes), lengths, mid_occ, statics, n_ix
        )
        return chain_finalize_lite(
            anc, lengths, scalars, scalars_wide, tlens, rs, rr,
            **_lite_kwargs(statics),
        )

    fn = _shmap(
        body, mesh,
        in_specs=(P("ix"), P(("dp", "ix"), None), P(("dp", "ix")),
                  P(), P(), P(), P(), P(), P()),
        out_specs=P(("dp", "ix")),
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------
# collective index statistics (index.rs:111-141 analogs)
# ---------------------------------------------------------------------

def index_stats_psum(mesh: Mesh, sidx: ShardedDeviceIndex):
    """Global (n_keys, n_positions) via psum over the index shards — the
    collectives analog of the reference's stats reduction
    (index.rs:111-122)."""

    def body(sidx):
        local = sidx.local()
        n_keys = jnp.sum(local.counts > 0).astype(I32)
        n_pos = jnp.sum(local.counts).astype(I32)
        n_keys = jax.lax.psum(n_keys, "ix")
        n_pos = jax.lax.psum(n_pos, "ix")
        return n_keys[None], n_pos[None]

    fn = _shmap(body, mesh, in_specs=(P("ix"),), out_specs=P("ix"))
    nk, npos = jax.jit(fn)(sidx)
    return int(nk[0]), int(npos[0])


def calc_mid_occ_psum(mesh: Mesh, sidx: ShardedDeviceIndex, frac: float) -> int:
    """The repetitive-seed cutoff (occurrence-count quantile + 1,
    index.rs:124-141) as a collective: a 31-step value-space binary
    search where each step psums the global rank of the probe — no
    shard ever ships its counts. Matches OracleIndex.calc_mid_occ."""

    def body(sidx):
        local = sidx.local()
        c = local.counts  # padded rows carry count 0; real keys are >= 1
        valid = c > 0
        n = jax.lax.psum(jnp.sum(valid).astype(I32), "ix")
        # rank of the quantile element in the globally sorted counts
        idx = jnp.minimum(
            ((1.0 - jnp.float32(frac)) * n.astype(jnp.float32)).astype(I32),
            n - 1,
        )
        target = idx + 1  # need #(counts <= v) >= target

        def step(_, lohi):
            lo, hi = lohi
            mid = lo + ((hi - lo) >> 1)  # (lo+hi)>>1 overflows int32
            le = jnp.sum(valid & (c <= mid)).astype(I32)
            rank = jax.lax.psum(le, "ix")
            ok = rank >= target
            return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

        lo, hi = jax.lax.fori_loop(
            0, 31, step, (jnp.int32(1), jnp.int32(2**31 - 1))
        )
        out = jnp.where(n > 0, hi + 1, jnp.int32(2**31 - 1))
        return out[None]

    fn = _shmap(body, mesh, in_specs=(P("ix"),), out_specs=P("ix"))
    return int(jax.jit(fn)(sidx)[0])
