"""Pallas TPU kernel for the chaining DP.

Same contract as ops.chain_ops.chain_dp_batch (exact window DP,
lchain.rs:74-91 minus the max_chain_skip heuristic), but the whole batch
lives in VMEM for the duration of the sequential anchor loop: anchors,
f and prev never round-trip to HBM between steps, and each step is a
single fused block of (H, B) int32 VPU ops.

Two layouts:

- sublane (A < 1024): arrays transposed to (A, B) so step i touches row
  blocks — sublane-major access instead of strided column gathers.
  Mosaic requires dynamic row offsets to be multiples of 8, so row i is
  read from its aligned 8-row block with a one-hot reduction and row
  writes are aligned read-modify-writes.
- lane (A >= 1024, long reads): (B, A) with anchors along lanes;
  per-array VMEM is B*A*4 bytes with no padding waste, the window slide
  uses 128-lane-aligned dynamic slices.

Work-skipping (~2-4x on the production shapes, exact by construction):

- BLOCK-TRIANGULAR iteration (full-window case): the DP only reads
  predecessors j < i, but a naive step reads all A rows — half the
  cells are dead. Steps run in 8 static column blocks; block b's steps
  only load rows [0, hi_b), so total cells fall from A^2 to ~0.56 A^2.
- PADDING-TAIL SKIP: rows >= max_n (the block's largest anchor count,
  computed from the grp != -1 sentinel) are padding in EVERY read, so
  whole blocks/steps beyond max_n are skipped (pl.when) and their
  outputs filled analytically in an epilogue: a padding row has no
  admissible predecessor (valid rows differ in grp; padding rows have
  dq == 0), so f = span, prev = -1, cnt = 1, sq/sr = own coords —
  bit-identical to computing them.

The batch dimension provides the vector parallelism; batches larger
than one VMEM-sized block run as a grid over batch blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
F32 = jnp.float32
_NEG_INF = -(2**30)
_INV_LN2 = 1.4426950216293335  # 1/ln(2) rounded through f32


def _comput_sc(j_abs, i, H, grp_w, rpos_w, qpos_w, span_w, f_w,
               grp_i, rpos_i, qpos_i, mdx, mdy, bw, pen_gap, pen_skip):
    """The masked window score (comput_sc, lchain.rs:17-34), shared by
    both kernel layouts."""
    dq = qpos_i - qpos_w
    dr = rpos_i - rpos_w
    dd = jnp.abs(dr - dq)
    dg = jnp.minimum(dr, dq)
    ok = (
        (j_abs < i)
        & (j_abs >= i - H)
        & (grp_w == grp_i)
        & (dq > 0)
        & (dq <= mdx)
        & (dq <= mdy)
        & (dr != 0)
        & (dr <= mdx)
        & (dd <= bw)
    )
    sc = jnp.minimum(span_w, dg)
    lin = pen_gap * dd.astype(F32) + pen_skip * dg.astype(F32)
    logp = jnp.where(dd >= 1, jnp.log((dd + 1).astype(F32)) * F32(_INV_LN2), F32(0.0))
    pen = (lin + F32(0.5) * logp).astype(I32)
    sc = jnp.where((dd != 0) | (dg > span_w), sc - pen, sc)
    return jnp.where(ok, sc + f_w, _NEG_INF)


def _blocks_for(A: int, unit: int):
    """<= 8 static step blocks of a `unit`-aligned size covering A."""
    c8 = (A + 7) // 8                 # ceil(A / 8)
    C = (c8 + unit - 1) // unit * unit  # rounded up to the layout unit
    blocks = []
    lo = 0
    while lo < A:
        hi = min(lo + C, A)
        blocks.append((lo, hi))
        lo = hi
    return blocks


# ---------------------------------------------------------------------
# sublane layout: (A, B), row steps
# ---------------------------------------------------------------------


def _sublane_kernel(aux: bool):
    """Build the sublane-layout kernel body; aux=True accumulates
    per-chain (cnt, start_q, start_r) along the prev path instead of
    materializing prev."""

    def kernel(scal_ref, pen_ref, grp_ref, rpos_ref, qpos_ref, span_ref,
               *out_refs, A: int, H: int):
        B = grp_ref.shape[1]
        full_window = H >= A
        mdx = scal_ref[0]
        mdy = scal_ref[1]
        bw = scal_ref[2]
        pen_gap = pen_ref[0]
        pen_skip = pen_ref[1]
        if aux:
            f_ref, cnt_ref, sq_ref, sr_ref = out_refs
        else:
            f_ref, prev_ref = out_refs

        for ref in out_refs:
            ref[...] = jnp.zeros((A, B), I32)

        # padding tail: rows >= max_n are padding in every read
        row_valid = jnp.any(grp_ref[...] != -1, axis=1)
        max_n = jnp.sum(row_valid.astype(I32))

        row8 = jax.lax.broadcasted_iota(I32, (8, B), 0)

        def read_row(ref, i8, sel):
            blk = ref[pl.ds(i8, 8), :]
            return jnp.sum(jnp.where(sel, blk, 0), axis=0)

        def make_step(lo_rows, n_rows):
            """Step fn whose predecessor window is rows [lo_rows,
            lo_rows+n_rows) — static block-triangular slice in the
            full-window case, the 8-aligned sliding window otherwise."""
            row = jax.lax.broadcasted_iota(I32, (n_rows, B), 0)

            def step(i, off):
                i8 = pl.multiple_of((i >> 3) << 3, 8)
                sel = row8 == (i - i8)
                if lo_rows is not None:  # static window
                    off = lo_rows
                    sl = lambda ref: ref[pl.ds(lo_rows, n_rows), :]
                else:
                    off = jnp.clip(((i - H) >> 3) << 3, 0, A - n_rows)
                    off = pl.multiple_of(off, 8)
                    sl = lambda ref: ref[pl.ds(off, n_rows), :]
                j_abs = row + off

                grp_i = read_row(grp_ref, i8, sel)[None, :]
                rpos_i = read_row(rpos_ref, i8, sel)[None, :]
                qpos_i = read_row(qpos_ref, i8, sel)[None, :]
                span_i = read_row(span_ref, i8, sel)[None, :]

                scores = _comput_sc(
                    j_abs, i, H, sl(grp_ref), sl(rpos_ref), sl(qpos_ref),
                    sl(span_ref), sl(f_ref), grp_i, rpos_i, qpos_i,
                    mdx, mdy, bw, pen_gap, pen_skip,
                )
                # max with largest-j tie-break (the reference scans j
                # descending with strict improvement, lchain.rs:80-84)
                best = jnp.max(scores, axis=0)[None, :]
                is_best = scores == best
                j_best = jnp.max(jnp.where(is_best, j_abs, -1), axis=0)
                win = best[0] > span_i[0]
                f_i = jnp.where(win, best[0], span_i[0])
                if aux:
                    pick = is_best & (j_abs == j_best[None, :])

                    def at_best(ref):
                        return jnp.max(
                            jnp.where(pick, sl(ref), _NEG_INF), axis=0
                        )

                    writes = (
                        (f_ref, f_i),
                        (cnt_ref, jnp.where(win, at_best(cnt_ref) + 1, 1)),
                        (sq_ref, jnp.where(win, at_best(sq_ref), qpos_i[0])),
                        (sr_ref, jnp.where(win, at_best(sr_ref), rpos_i[0])),
                    )
                else:
                    writes = (
                        (f_ref, f_i),
                        (prev_ref, jnp.where(win, j_best, -1)),
                    )
                # aligned read-modify-write of row i's 8-row block
                for ref, val in writes:
                    blk = ref[pl.ds(i8, 8), :]
                    ref[pl.ds(i8, 8), :] = jnp.where(sel, val[None, :], blk)
                return 0

            return step

        if full_window:
            # block-triangular: block [lo, hi) reads rows [0, hi) only
            for lo, hi in _blocks_for(A, 8):
                step = make_step(0, hi)

                @pl.when(lo < max_n)
                def _run(lo=lo, hi=hi, step=step):
                    jax.lax.fori_loop(lo, hi, step, 0, unroll=False)
        else:
            Hpad = H + 8
            step = make_step(None, Hpad)

            def gated(i, c):
                @pl.when(i < max_n)
                def _():
                    step(i, c)
                return 0

            jax.lax.fori_loop(0, A, gated, 0, unroll=False)

        # epilogue: padding rows (i >= max_n) have no admissible
        # predecessor, so their outputs are the no-chain base case
        rowA = jax.lax.broadcasted_iota(I32, (A, B), 0)
        pad = rowA >= max_n
        f_ref[...] = jnp.where(pad, span_ref[...], f_ref[...])
        if aux:
            cnt_ref[...] = jnp.where(pad, 1, cnt_ref[...])
            sq_ref[...] = jnp.where(pad, qpos_ref[...], sq_ref[...])
            sr_ref[...] = jnp.where(pad, rpos_ref[...], sr_ref[...])
        else:
            prev_ref[...] = jnp.where(pad, -1, prev_ref[...])

    return kernel


_chain_kernel = _sublane_kernel(aux=False)
_chain_aux_kernel = _sublane_kernel(aux=True)


# ---------------------------------------------------------------------
# lane layout: (B, A), column steps (long reads)
# ---------------------------------------------------------------------


def _lane_kernel(aux: bool):
    def kernel(scal_ref, pen_ref, grp_ref, rpos_ref, qpos_ref, span_ref,
               *out_refs, A: int, H: int):
        B = grp_ref.shape[0]
        full_window = H >= A
        mdx = scal_ref[0]
        mdy = scal_ref[1]
        bw = scal_ref[2]
        pen_gap = pen_ref[0]
        pen_skip = pen_ref[1]
        if aux:
            f_ref, cnt_ref, sq_ref, sr_ref = out_refs
        else:
            f_ref, prev_ref = out_refs

        for ref in out_refs:
            ref[...] = jnp.zeros((B, A), I32)

        col_valid = jnp.any(grp_ref[...] != -1, axis=0)
        max_n = jnp.sum(col_valid.astype(I32))

        col128 = jax.lax.broadcasted_iota(I32, (B, 128), 1)

        def read_col(ref, i1, sel):
            blk = ref[:, pl.ds(i1, 128)]
            return jnp.sum(jnp.where(sel, blk, 0), axis=1)

        def make_step(lo_cols, n_cols):
            col = jax.lax.broadcasted_iota(I32, (B, n_cols), 1)

            def step(i, _):
                i1 = pl.multiple_of((i >> 7) << 7, 128)
                sel = col128 == (i - i1)
                if lo_cols is not None:
                    off = lo_cols
                    sl = lambda ref: ref[:, pl.ds(lo_cols, n_cols)]
                else:
                    off = jnp.clip(((i - H) >> 7) << 7, 0, A - n_cols)
                    off = pl.multiple_of(off, 128)
                    sl = lambda ref: ref[:, pl.ds(off, n_cols)]
                j_abs = col + off

                grp_i = read_col(grp_ref, i1, sel)[:, None]
                rpos_i = read_col(rpos_ref, i1, sel)[:, None]
                qpos_i = read_col(qpos_ref, i1, sel)[:, None]
                span_i = read_col(span_ref, i1, sel)[:, None]

                scores = _comput_sc(
                    j_abs, i, H, sl(grp_ref), sl(rpos_ref), sl(qpos_ref),
                    sl(span_ref), sl(f_ref), grp_i, rpos_i, qpos_i,
                    mdx, mdy, bw, pen_gap, pen_skip,
                )
                best = jnp.max(scores, axis=1)[:, None]
                is_best = scores == best
                j_best = jnp.max(jnp.where(is_best, j_abs, -1), axis=1)
                win = best[:, 0] > span_i[:, 0]
                f_i = jnp.where(win, best[:, 0], span_i[:, 0])
                if aux:
                    pick = is_best & (j_abs == j_best[:, None])

                    def at_best(ref):
                        return jnp.max(
                            jnp.where(pick, sl(ref), _NEG_INF), axis=1
                        )

                    writes = (
                        (f_ref, f_i),
                        (cnt_ref, jnp.where(win, at_best(cnt_ref) + 1, 1)),
                        (sq_ref, jnp.where(win, at_best(sq_ref), qpos_i[:, 0])),
                        (sr_ref, jnp.where(win, at_best(sr_ref), rpos_i[:, 0])),
                    )
                else:
                    writes = (
                        (f_ref, f_i),
                        (prev_ref, jnp.where(win, j_best, -1)),
                    )
                for ref, val in writes:
                    blk = ref[:, pl.ds(i1, 128)]
                    ref[:, pl.ds(i1, 128)] = jnp.where(sel, val[:, None], blk)
                return 0

            return step

        if full_window:
            for lo, hi in _blocks_for(A, 128):
                step = make_step(0, hi)

                @pl.when(lo < max_n)
                def _run(lo=lo, hi=hi, step=step):
                    jax.lax.fori_loop(lo, hi, step, 0, unroll=False)
        else:
            Hpad = ((H >> 7) + 2) << 7
            step = make_step(None, Hpad)

            def gated(i, c):
                @pl.when(i < max_n)
                def _():
                    step(i, c)
                return 0

            jax.lax.fori_loop(0, A, gated, 0, unroll=False)

        colA = jax.lax.broadcasted_iota(I32, (B, A), 1)
        pad = colA >= max_n
        f_ref[...] = jnp.where(pad, span_ref[...], f_ref[...])
        if aux:
            cnt_ref[...] = jnp.where(pad, 1, cnt_ref[...])
            sq_ref[...] = jnp.where(pad, qpos_ref[...], sq_ref[...])
            sr_ref[...] = jnp.where(pad, rpos_ref[...], sr_ref[...])
        else:
            prev_ref[...] = jnp.where(pad, -1, prev_ref[...])

    return kernel


_chain_kernel_lane = _lane_kernel(aux=False)
_chain_aux_kernel_lane = _lane_kernel(aux=True)


# ---------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------


def _batch_blocks(B: int, A: int, n_arrays: int) -> int:
    """Largest batch-block dividing B whose n_arrays (A, BB) int32
    working set fits a ~4 MB VMEM budget (step temporaries roughly
    double the resident footprint, and the scoped VMEM limit is 16 MB).
    Mosaic only accepts lane-dim blocks that are multiples of 128 (or
    the full dimension), so when the budget implies a sub-128 block the
    caller must keep B itself small (models/mapper.py sizes B by the
    same budget)."""
    budget = 4 * 1024 * 1024
    cap = budget // (n_arrays * A * 4)
    if cap >= B:
        return B
    bb = cap // 128 * 128
    while bb >= 128 and B % bb:
        bb -= 128
    return bb if bb >= 128 else B


def chain_vmem_batch_cap(A: int, n_arrays: int = 10) -> int:
    """Max reads per VMEM block for anchor capacity A (multiple of 8)."""
    budget = 4 * 1024 * 1024
    return max(8, budget // (n_arrays * A * 4) // 8 * 8)


def _batch_blocks_lane(B: int, A: int, n_arrays: int) -> int:
    """Sublane batch-block (multiple of 8 dividing B) for the lane
    layout's VMEM budget."""
    budget = 4 * 1024 * 1024
    cap = budget // (n_arrays * A * 4)
    if cap >= B or B % 8:
        return B
    bb = max(8, cap // 8 * 8)
    while bb > 8 and B % bb:
        bb -= 8
    return bb if B % bb == 0 else B


def _scal_pens(scalars):
    scal = jnp.stack(
        [
            scalars.max_dist_x.astype(I32),
            scalars.max_dist_y.astype(I32),
            scalars.bw.astype(I32),
        ]
    )
    pens = jnp.stack([scalars.chn_pen_gap, scalars.chn_pen_skip]).astype(F32)
    return scal, pens


# Above this anchor capacity the (A, B) sublane-step layout cannot fit
# VMEM (the lane dimension pads to 128, so even B=8 costs A*128*4 bytes
# per array, and a 128-wide batch block exceeds the budget once A > 768);
# the transposed lane-step layout takes over.
_LANE_LAYOUT_MIN_A = 1024


def _call(kernel_fn, n_out, lane: bool, grp, rpos, qpos, span, scalars,
          window: int):
    B, A = grp.shape
    H = min(window, A)
    assert A % 8 == 0, "anchor capacity must be sublane-aligned"
    scal, pens = _scal_pens(scalars)
    interp = jax.default_backend() == "cpu"
    if lane:
        kernel = functools.partial(kernel_fn, A=A, H=H)
        BB = _batch_blocks_lane(B, A, 4 + n_out)
        blk = lambda: pl.BlockSpec((BB, A), lambda b: (b, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            interpret=interp,
            grid=(B // BB,),
            out_shape=tuple(jax.ShapeDtypeStruct((B, A), I32) for _ in range(n_out)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [blk() for _ in range(4)],
            out_specs=tuple(blk() for _ in range(n_out)),
        )(
            scal, pens, jax.lax.bitcast_convert_type(grp, I32),
            rpos.astype(I32), qpos.astype(I32), span.astype(I32),
        )
    kernel = functools.partial(kernel_fn, A=A, H=H)
    BB = _batch_blocks(B, A, 4 + n_out)
    blk = lambda: pl.BlockSpec((A, BB), lambda b: (0, b), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        interpret=interp,
        grid=(B // BB,),
        out_shape=tuple(jax.ShapeDtypeStruct((A, B), I32) for _ in range(n_out)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [blk() for _ in range(4)],
        out_specs=tuple(blk() for _ in range(n_out)),
    )(
        scal, pens, jax.lax.bitcast_convert_type(grp, I32).T,
        rpos.astype(I32).T, qpos.astype(I32).T, span.astype(I32).T,
    )
    return tuple(o.T for o in outs)


@functools.partial(jax.jit, static_argnames=("window",))
def chain_dp_batch_pallas(grp, rpos, qpos, span, scalars, window: int):
    """Drop-in replacement for chain_ops.chain_dp_batch: (f, prev) of
    shape (B, A)."""
    B, A = grp.shape
    if A >= _LANE_LAYOUT_MIN_A:
        return _call(_chain_kernel_lane, 2, True, grp, rpos, qpos, span,
                     scalars, window)
    return _call(_chain_kernel, 2, False, grp, rpos, qpos, span, scalars,
                 window)


@functools.partial(jax.jit, static_argnames=("window",))
def chain_dp_aux_batch_pallas(grp, rpos, qpos, span, scalars, window: int):
    """Drop-in replacement for chain_ops.chain_dp_aux_batch."""
    B, A = grp.shape
    if A >= _LANE_LAYOUT_MIN_A:
        return _call(_chain_aux_kernel_lane, 4, True, grp, rpos, qpos,
                     span, scalars, window)
    return _call(_chain_aux_kernel, 4, False, grp, rpos, qpos, span,
                 scalars, window)
