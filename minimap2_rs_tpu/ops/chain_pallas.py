"""Pallas TPU kernel for the chaining DP.

Same contract as ops.chain_ops.chain_dp_batch (exact window DP,
lchain.rs:74-91 minus the max_chain_skip heuristic), but the whole batch
lives in VMEM for the duration of the sequential anchor loop: anchors,
f and v never round-trip to HBM between steps, and each step is a single
fused block of (H, B) int32 VPU ops.

Layout: arrays are transposed to (A, B) so step i touches row blocks —
sublane-major access instead of strided column gathers. Mosaic requires
dynamic row offsets to be multiples of 8, so:
- anchor row i is read from its aligned 8-row block with a one-hot
  row-select reduction;
- f/v/prev row writes go through an aligned read-modify-write of the
  same 8-row block;
- when the window spans the whole array (the common short-read case,
  window == A) the predecessor block is the full array — no dynamic
  slicing at all; otherwise the window is widened by 8 and re-masked.

The batch dimension provides the vector parallelism (a TPU core runs one
program at a time, so read-per-program grids would serialize); batches
larger than one VMEM-sized block run as a grid over batch blocks, which
amortizes the per-call host sync (measured ~25 ms through the TPU relay)
over many more reads.

VMEM budget: 7 arrays of (A, BB) int32 + the step blocks; for BB=256,
A=512 that is ~3.7 MB of the ~16 MB core VMEM.
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


def _chain_kernel(
    scal_ref,  # SMEM (3,) i32: mdx, mdy, bw
    pen_ref,   # SMEM (2,) f32: chn_pen_gap, chn_pen_skip
    grp_ref, rpos_ref, qpos_ref, span_ref,  # VMEM (A, B) i32
    f_ref, prev_ref,  # VMEM outputs (A, B) i32
    *,
    A: int,
    H: int,
):
    B = grp_ref.shape[1]
    full_window = H >= A
    Hpad = A if full_window else H + 8
    mdx = scal_ref[0]
    mdy = scal_ref[1]
    bw = scal_ref[2]
    pen_gap = pen_ref[0]
    pen_skip = pen_ref[1]

    f_ref[...] = jnp.zeros((A, B), I32)
    prev_ref[...] = jnp.full((A, B), -1, I32)

    row = jax.lax.broadcasted_iota(I32, (Hpad, B), 0)
    row8 = jax.lax.broadcasted_iota(I32, (8, B), 0)

    def read_row(ref, i8, sel):
        """ref[i8 + r, :] where sel is the one-hot (8, B) row mask."""
        blk = ref[pl.ds(i8, 8), :]
        return jnp.sum(jnp.where(sel, blk, 0), axis=0)

    def step(i, _):
        i8 = pl.multiple_of((i >> 3) << 3, 8)
        sel = row8 == (i - i8)
        if full_window:
            off = 0
            grp_w = grp_ref[...]
            rpos_w = rpos_ref[...]
            qpos_w = qpos_ref[...]
            span_w = span_ref[...]
            f_w = f_ref[...]
        else:
            off = jnp.clip(((i - H) >> 3) << 3, 0, A - Hpad)
            off = pl.multiple_of(off, 8)
            grp_w = grp_ref[pl.ds(off, Hpad), :]
            rpos_w = rpos_ref[pl.ds(off, Hpad), :]
            qpos_w = qpos_ref[pl.ds(off, Hpad), :]
            span_w = span_ref[pl.ds(off, Hpad), :]
            f_w = f_ref[pl.ds(off, Hpad), :]
        j_abs = row + off

        grp_i = read_row(grp_ref, i8, sel)[None, :]
        rpos_i = read_row(rpos_ref, i8, sel)[None, :]
        qpos_i = read_row(qpos_ref, i8, sel)[None, :]
        span_i = read_row(span_ref, i8, sel)[None, :]

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
        scores = jnp.where(ok, sc + f_w, _NEG_INF)

        # max with largest-j tie-break (the reference scans j descending
        # with strict improvement, lchain.rs:80-84)
        best = jnp.max(scores, axis=0)[None, :]
        is_best = scores == best
        j_best = jnp.max(jnp.where(is_best, j_abs, -1), axis=0)
        win = best[0] > span_i[0]
        f_i = jnp.where(win, best[0], span_i[0])
        prev_i = jnp.where(win, j_best, -1)

        # aligned read-modify-write of the 8-row block holding row i
        for ref, val in ((f_ref, f_i), (prev_ref, prev_i)):
            blk = ref[pl.ds(i8, 8), :]
            ref[pl.ds(i8, 8), :] = jnp.where(sel, val[None, :], blk)
        return 0

    jax.lax.fori_loop(0, A, step, 0, unroll=False)


def _batch_blocks(B: int, A: int, n_arrays: int) -> int:
    """Largest batch-block dividing B whose n_arrays (A, BB) int32
    working set fits a ~4 MB VMEM budget (step temporaries roughly
    double the resident footprint, and the scoped VMEM limit is 16 MB).
    Mosaic only accepts lane-dim
    blocks that are multiples of 128 (or the full dimension), so when
    the budget implies a sub-128 block the caller must keep B itself
    small (models/mapper.py sizes B by the same budget)."""
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


def _chain_aux_kernel_lane(
    scal_ref, pen_ref,
    grp_ref, rpos_ref, qpos_ref, span_ref,  # VMEM (B, A) i32
    f_ref, cnt_ref, sq_ref, sr_ref,  # VMEM outputs (B, A) i32
    *,
    A: int,
    H: int,
):
    """Long-read layout: batch rows in sublanes, anchors along lanes.
    Per-array VMEM is B*A*4 bytes with no padding waste (B is a multiple
    of 8), so A up to ~16k fits; the window slide uses 128-lane-aligned
    dynamic slices with one-hot column reads/writes."""
    B = grp_ref.shape[0]
    full_window = H >= A
    Hpad = A if full_window else (((H >> 7) + 2) << 7)
    mdx = scal_ref[0]
    mdy = scal_ref[1]
    bw = scal_ref[2]
    pen_gap = pen_ref[0]
    pen_skip = pen_ref[1]

    for ref in (f_ref, cnt_ref, sq_ref, sr_ref):
        ref[...] = jnp.zeros((B, A), I32)

    col = jax.lax.broadcasted_iota(I32, (B, Hpad), 1)
    col128 = jax.lax.broadcasted_iota(I32, (B, 128), 1)

    def read_col(ref, i1, sel):
        blk = ref[:, pl.ds(i1, 128)]
        return jnp.sum(jnp.where(sel, blk, 0), axis=1)

    def step(i, _):
        i1 = pl.multiple_of((i >> 7) << 7, 128)
        sel = col128 == (i - i1)
        if full_window:
            off = 0
            sl = lambda ref: ref[...]
        else:
            off = jnp.clip(((i - H) >> 7) << 7, 0, A - Hpad)
            off = pl.multiple_of(off, 128)
            sl = lambda ref: ref[:, pl.ds(off, Hpad)]
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
        pick = is_best & (j_abs == j_best[:, None])
        win = best[:, 0] > span_i[:, 0]
        f_i = jnp.where(win, best[:, 0], span_i[:, 0])

        def at_best(ref):
            return jnp.max(jnp.where(pick, sl(ref), _NEG_INF), axis=1)

        cnt_i = jnp.where(win, at_best(cnt_ref) + 1, 1)
        sq_i = jnp.where(win, at_best(sq_ref), qpos_i[:, 0])
        sr_i = jnp.where(win, at_best(sr_ref), rpos_i[:, 0])

        for ref, val in (
            (f_ref, f_i), (cnt_ref, cnt_i), (sq_ref, sq_i), (sr_ref, sr_i),
        ):
            blk = ref[:, pl.ds(i1, 128)]
            ref[:, pl.ds(i1, 128)] = jnp.where(sel, val[:, None], blk)
        return 0

    jax.lax.fori_loop(0, A, step, 0, unroll=False)


def _chain_kernel_lane(
    scal_ref, pen_ref,
    grp_ref, rpos_ref, qpos_ref, span_ref,  # VMEM (B, A) i32
    f_ref, prev_ref,  # VMEM outputs (B, A) i32
    *,
    A: int,
    H: int,
):
    """(f, prev) variant of _chain_aux_kernel_lane."""
    B = grp_ref.shape[0]
    full_window = H >= A
    Hpad = A if full_window else (((H >> 7) + 2) << 7)
    mdx = scal_ref[0]
    mdy = scal_ref[1]
    bw = scal_ref[2]
    pen_gap = pen_ref[0]
    pen_skip = pen_ref[1]

    f_ref[...] = jnp.zeros((B, A), I32)
    prev_ref[...] = jnp.full((B, A), -1, I32)

    col = jax.lax.broadcasted_iota(I32, (B, Hpad), 1)
    col128 = jax.lax.broadcasted_iota(I32, (B, 128), 1)

    def read_col(ref, i1, sel):
        blk = ref[:, pl.ds(i1, 128)]
        return jnp.sum(jnp.where(sel, blk, 0), axis=1)

    def step(i, _):
        i1 = pl.multiple_of((i >> 7) << 7, 128)
        sel = col128 == (i - i1)
        if full_window:
            off = 0
            sl = lambda ref: ref[...]
        else:
            off = jnp.clip(((i - H) >> 7) << 7, 0, A - Hpad)
            off = pl.multiple_of(off, 128)
            sl = lambda ref: ref[:, pl.ds(off, Hpad)]
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
        prev_i = jnp.where(win, j_best, -1)

        for ref, val in ((f_ref, f_i), (prev_ref, prev_i)):
            blk = ref[:, pl.ds(i1, 128)]
            ref[:, pl.ds(i1, 128)] = jnp.where(sel, val[:, None], blk)
        return 0

    jax.lax.fori_loop(0, A, step, 0, unroll=False)


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


@functools.partial(jax.jit, static_argnames=("window",))
def chain_dp_batch_pallas(grp, rpos, qpos, span, scalars, window: int):
    """Drop-in replacement for chain_ops.chain_dp_batch: (f, prev) of
    shape (B, A)."""
    B, A = grp.shape
    H = min(window, A)
    assert A % 8 == 0, "anchor capacity must be sublane-aligned"
    scal, pens = _scal_pens(scalars)
    interp = jax.default_backend() == "cpu"
    if A >= _LANE_LAYOUT_MIN_A:
        kernel = functools.partial(_chain_kernel_lane, A=A, H=H)
        BB = _batch_blocks_lane(B, A, 8)
        blk = lambda: pl.BlockSpec((BB, A), lambda b: (b, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            interpret=interp,
            grid=(B // BB,),
            out_shape=tuple(jax.ShapeDtypeStruct((B, A), I32) for _ in range(2)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [blk() for _ in range(4)],
            out_specs=tuple(blk() for _ in range(2)),
        )(
            scal, pens, jax.lax.bitcast_convert_type(grp, I32),
            rpos.astype(I32), qpos.astype(I32), span.astype(I32),
        )
    grp_t = jax.lax.bitcast_convert_type(grp, I32).T
    kernel = functools.partial(_chain_kernel, A=A, H=H)
    BB = _batch_blocks(B, A, 8)
    blk = lambda: pl.BlockSpec((A, BB), lambda b: (0, b), memory_space=pltpu.VMEM)
    f, prev = pl.pallas_call(
        kernel,
        interpret=interp,
        grid=(B // BB,),
        out_shape=(
            jax.ShapeDtypeStruct((A, B), I32),
            jax.ShapeDtypeStruct((A, B), I32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(), blk(), blk(), blk(),
        ],
        out_specs=(blk(), blk()),
    )(scal, pens, grp_t, rpos.astype(I32).T, qpos.astype(I32).T, span.astype(I32).T)
    return f.T, prev.T


def _chain_aux_kernel(
    scal_ref, pen_ref,
    grp_ref, rpos_ref, qpos_ref, span_ref,  # VMEM (A, B) i32
    f_ref, cnt_ref, sq_ref, sr_ref,  # VMEM outputs (A, B) i32
    *,
    A: int,
    H: int,
):
    """chain_dp_aux_batch as a VMEM-resident kernel (see chain_ops)."""
    B = grp_ref.shape[1]
    full_window = H >= A
    Hpad = A if full_window else H + 8
    mdx = scal_ref[0]
    mdy = scal_ref[1]
    bw = scal_ref[2]
    pen_gap = pen_ref[0]
    pen_skip = pen_ref[1]

    for ref in (f_ref, cnt_ref, sq_ref, sr_ref):
        ref[...] = jnp.zeros((A, B), I32)

    row = jax.lax.broadcasted_iota(I32, (Hpad, B), 0)
    row8 = jax.lax.broadcasted_iota(I32, (8, B), 0)

    def read_row(ref, i8, sel):
        blk = ref[pl.ds(i8, 8), :]
        return jnp.sum(jnp.where(sel, blk, 0), axis=0)

    def step(i, _):
        i8 = pl.multiple_of((i >> 3) << 3, 8)
        sel = row8 == (i - i8)
        if full_window:
            off = 0
            sl = lambda ref: ref[...]
        else:
            off = jnp.clip(((i - H) >> 3) << 3, 0, A - Hpad)
            off = pl.multiple_of(off, 8)
            sl = lambda ref: ref[pl.ds(off, Hpad), :]
        grp_w, rpos_w, qpos_w, span_w = sl(grp_ref), sl(rpos_ref), sl(qpos_ref), sl(span_ref)
        f_w = sl(f_ref)
        j_abs = row + off

        grp_i = read_row(grp_ref, i8, sel)[None, :]
        rpos_i = read_row(rpos_ref, i8, sel)[None, :]
        qpos_i = read_row(qpos_ref, i8, sel)[None, :]
        span_i = read_row(span_ref, i8, sel)[None, :]

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
        scores = jnp.where(ok, sc + f_w, _NEG_INF)

        best = jnp.max(scores, axis=0)[None, :]
        is_best = scores == best
        j_best = jnp.max(jnp.where(is_best, j_abs, -1), axis=0)
        pick = is_best & (j_abs == j_best[None, :])
        win = best[0] > span_i[0]
        f_i = jnp.where(win, best[0], span_i[0])

        def at_best(ref):
            return jnp.max(jnp.where(pick, sl(ref), _NEG_INF), axis=0)

        cnt_i = jnp.where(win, at_best(cnt_ref) + 1, 1)
        sq_i = jnp.where(win, at_best(sq_ref), qpos_i[0])
        sr_i = jnp.where(win, at_best(sr_ref), rpos_i[0])

        for ref, val in (
            (f_ref, f_i), (cnt_ref, cnt_i), (sq_ref, sq_i), (sr_ref, sr_i),
        ):
            blk = ref[pl.ds(i8, 8), :]
            ref[pl.ds(i8, 8), :] = jnp.where(sel, val[None, :], blk)
        return 0

    jax.lax.fori_loop(0, A, step, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("window",))
def chain_dp_aux_batch_pallas(grp, rpos, qpos, span, scalars, window: int):
    """Drop-in replacement for chain_ops.chain_dp_aux_batch."""
    B, A = grp.shape
    H = min(window, A)
    assert A % 8 == 0
    scal, pens = _scal_pens(scalars)
    interp = jax.default_backend() == "cpu"
    if A >= _LANE_LAYOUT_MIN_A:
        kernel = functools.partial(_chain_aux_kernel_lane, A=A, H=H)
        BB = _batch_blocks_lane(B, A, 10)
        blk = lambda: pl.BlockSpec((BB, A), lambda b: (b, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            interpret=interp,
            grid=(B // BB,),
            out_shape=tuple(jax.ShapeDtypeStruct((B, A), I32) for _ in range(4)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [blk() for _ in range(4)],
            out_specs=tuple(blk() for _ in range(4)),
        )(
            scal, pens, jax.lax.bitcast_convert_type(grp, I32),
            rpos.astype(I32), qpos.astype(I32), span.astype(I32),
        )
    grp_t = jax.lax.bitcast_convert_type(grp, I32).T
    kernel = functools.partial(_chain_aux_kernel, A=A, H=H)
    BB = _batch_blocks(B, A, 10)
    blk = lambda: pl.BlockSpec((A, BB), lambda b: (0, b), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        interpret=interp,
        grid=(B // BB,),
        out_shape=tuple(jax.ShapeDtypeStruct((A, B), I32) for _ in range(4)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [blk() for _ in range(4)],
        out_specs=tuple(blk() for _ in range(4)),
    )(
        scal, pens, grp_t, rpos.astype(I32).T, qpos.astype(I32).T,
        span.astype(I32).T,
    )
    return tuple(o.T for o in outs)
