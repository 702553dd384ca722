"""Pallas TPU kernels for the chaining DP.

Same contract as ops.chain_ops.chain_dp_batch (exact window DP,
lchain.rs:74-91 minus the max_chain_skip heuristic), but the whole batch
lives in VMEM for the duration of the sequential anchor loop: anchors
and f never round-trip to HBM between steps, and each step is a single
fused block of (W, B) int32 VPU ops.

Three kernel families (aux=True variants additionally accumulate the
per-chain (cnt, start_q, start_r) statistics along the prev path for the
backtrack-free finalization, finalize_ops.py):

- STATIC sublane (A <= 768, full window — the production short-read
  shapes): arrays transposed to (A, B); the i-loop is fully unrolled in
  8-row groups so EVERY memory access has a static offset (no dynamic
  slices, no one-hot row extraction, no read-modify-writes). Each group
  hoists its predecessor-window loads once, runs 8 micro-steps whose
  own-row data are static slices of the hoisted block, keeps the
  group's outputs in vector registers, and writes them once per group.
  The per-pair mask is reduced to 4 compares (unsigned range tricks;
  the j < i window triangle is static) from the 9-compare dynamic form.
- dynamic sublane (A < 1024 with a truncated window — not produced by
  the mapper, kept for API completeness): one-hot row reads + aligned
  8-row read-modify-writes.
- lane (A >= 1024, long reads): (B, A) with anchors along lanes;
  per-array VMEM is B*A*4 bytes with no padding waste, the window slide
  uses 128-lane-aligned dynamic slices.

Work-skipping (exact by construction):

- TRIANGULAR schedule: the static kernel's group [g, g+8) only scores
  predecessors [0, g+8), so total cells are ~0.52 A^2 instead of A^2
  (the dynamic kernels approximate this with 8 static column blocks).
- PADDING-TAIL SKIP: rows >= max_n (the block's largest anchor count,
  computed from the grp != -1 sentinel) are padding in EVERY read, so
  whole groups/steps beyond max_n are skipped (pl.when) and their
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
U32 = jnp.uint32
F32 = jnp.float32
_NEG_INF = -(2**30)
_INV_LN2 = 1.4426950216293335  # 1/ln(2) rounded through f32


def _comput_sc(j_abs, i, H, grp_w, rpos_w, qpos_w, span_w, f_w,
               grp_i, rpos_i, qpos_i, mdx, mdy, bw, pen_gap, pen_skip):
    """The masked window score (comput_sc, lchain.rs:17-34) for the
    dynamic-window kernels."""
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
# static sublane layout: (A, B), fully unrolled 8-row groups
# ---------------------------------------------------------------------


def _sublane_static_kernel(aux: bool):
    """Build the full-window sublane kernel with an entirely static
    schedule.

    The i-loop runs as A/8 Python-unrolled groups; group g hoists the
    predecessor window [0, g) plus its own 8-row block into values, runs
    8 micro-steps against (window + in-registers group state), and
    writes the outputs back once. The masked score is the reduced-op
    form: the reference's 9-term admissibility (lchain.rs:23-28) folds
    to
        grp equal  AND  dq-1 <u min(mdx,mdy)  AND  dr-1 <u mdx
        AND  dd <= bw
    (unsigned range compares; dr < 0 never passes the original mask
    either, because anchors are x-sorted within a grp and cross-grp
    pairs fail the grp term), and the j < i window triangle is static.
    """

    def kernel(scal_ref, pen_ref, grp_ref, rpos_ref, qpos_ref, span_ref,
               *out_refs, A: int):
        B = grp_ref.shape[1]
        mn_u = jnp.minimum(scal_ref[0], scal_ref[1]).astype(U32)
        mdx_u = scal_ref[0].astype(U32)
        bw = scal_ref[2]
        pen_gap = pen_ref[0]
        pen_skip = pen_ref[1]
        if aux:
            f_ref, cnt_ref, sq_ref, sr_ref = out_refs
        else:
            f_ref, prev_ref = out_refs

        row_valid = jnp.any(grp_ref[...] != -1, axis=1)
        max_n = jnp.sum(row_valid.astype(I32))

        row8 = jax.lax.broadcasted_iota(I32, (8, B), 0)

        def scores_of(grp_w, rpos_w, qpos_w, span_w, f_w, tri,
                      grp_i, rpos_i, qpos_i):
            dq = qpos_i - qpos_w
            dr = rpos_i - rpos_w
            dd = jnp.abs(dr - dq)
            dg = jnp.minimum(dr, dq)
            ok = (
                (grp_w == grp_i)
                & ((dq - 1).astype(U32) < mn_u)
                & ((dr - 1).astype(U32) < mdx_u)
                & (dd <= bw)
            )
            if tri is not None:
                ok = ok & tri
            sc = jnp.minimum(span_w, dg)
            ddf = dd.astype(F32)
            lin = pen_gap * ddf + pen_skip * dg.astype(F32)
            # log(ddf+1) == the reference's branch exactly: dd == 0
            # gives log(1) == 0, and in-mask dd <= bw < 2^24 is f32-exact
            logp = jnp.log(ddf + F32(1.0)) * F32(_INV_LN2)
            pen = (lin + F32(0.5) * logp).astype(I32)
            sc = jnp.where((dd != 0) | (dg > span_w), sc - pen, sc)
            return jnp.where(ok, sc + f_w, _NEG_INF)

        for g8 in range(0, A, 8):
            @pl.when(g8 < max_n)
            def _group(g8=g8):
                grp_blk = grp_ref[g8:g8 + 8, :]
                rpos_blk = rpos_ref[g8:g8 + 8, :]
                qpos_blk = qpos_ref[g8:g8 + 8, :]
                span_blk = span_ref[g8:g8 + 8, :]
                if g8:
                    pre = lambda ref: ref[0:g8, :]
                    grp_pre, rpos_pre = pre(grp_ref), pre(rpos_ref)
                    qpos_pre, span_pre = pre(qpos_ref), pre(span_ref)
                    f_pre = pre(f_ref)
                    if aux:
                        cnt_pre, sq_pre, sr_pre = (
                            pre(cnt_ref), pre(sq_ref), pre(sr_ref)
                        )
                    j_pre = jax.lax.broadcasted_iota(I32, (g8, B), 0)
                f_blk = jnp.zeros((8, B), I32)
                if aux:
                    cnt_blk = jnp.zeros((8, B), I32)
                    sq_blk = jnp.zeros((8, B), I32)
                    sr_blk = jnp.zeros((8, B), I32)
                else:
                    prev_blk = jnp.full((8, B), -1, I32)
                for r in range(8):
                    grp_i = grp_blk[r:r + 1, :]
                    rpos_i = rpos_blk[r:r + 1, :]
                    qpos_i = qpos_blk[r:r + 1, :]
                    span_i = span_blk[r:r + 1, :]
                    best = j_best = None
                    if g8:
                        sc_pre = scores_of(
                            grp_pre, rpos_pre, qpos_pre, span_pre, f_pre,
                            None, grp_i, rpos_i, qpos_i,
                        )
                        best = jnp.max(sc_pre, axis=0, keepdims=True)
                        j_best = jnp.max(
                            jnp.where(sc_pre == best, j_pre, -1),
                            axis=0, keepdims=True,
                        )
                        if aux:
                            pick = (sc_pre == best) & (j_pre == j_best)
                            at_pre = lambda arr: jnp.max(
                                jnp.where(pick, arr, _NEG_INF),
                                axis=0, keepdims=True,
                            )
                            cnt_at = at_pre(cnt_pre)
                            sq_at = at_pre(sq_pre)
                            sr_at = at_pre(sr_pre)
                    if r:
                        sc_blk = scores_of(
                            grp_blk, rpos_blk, qpos_blk, span_blk, f_blk,
                            row8 < r, grp_i, rpos_i, qpos_i,
                        )
                        best_b = jnp.max(sc_blk, axis=0, keepdims=True)
                        jb_rel = jnp.max(
                            jnp.where(sc_blk == best_b, row8, -1),
                            axis=0, keepdims=True,
                        )
                        if aux:
                            pick_b = (sc_blk == best_b) & (row8 == jb_rel)
                            at_blk = lambda arr: jnp.max(
                                jnp.where(pick_b, arr, _NEG_INF),
                                axis=0, keepdims=True,
                            )
                        jb_b = jb_rel + g8
                        if best is None:
                            best, j_best = best_b, jb_b
                            if aux:
                                cnt_at = at_blk(cnt_blk)
                                sq_at = at_blk(sq_blk)
                                sr_at = at_blk(sr_blk)
                        else:
                            # equal scores pick the larger j (the
                            # reference scans j descending with strict
                            # improvement, lchain.rs:80-84); block js
                            # are all > prefix js
                            use_b = best_b >= best
                            j_best = jnp.where(use_b, jb_b, j_best)
                            best = jnp.maximum(best_b, best)
                            if aux:
                                cnt_at = jnp.where(use_b, at_blk(cnt_blk), cnt_at)
                                sq_at = jnp.where(use_b, at_blk(sq_blk), sq_at)
                                sr_at = jnp.where(use_b, at_blk(sr_blk), sr_at)
                    sel = row8 == r  # static one-hot
                    if best is None:  # r == 0 in the first group
                        f_blk = jnp.where(sel, span_i, f_blk)
                        if aux:
                            cnt_blk = jnp.where(sel, 1, cnt_blk)
                            sq_blk = jnp.where(sel, qpos_i, sq_blk)
                            sr_blk = jnp.where(sel, rpos_i, sr_blk)
                        continue
                    win = best > span_i
                    f_blk = jnp.where(sel, jnp.where(win, best, span_i), f_blk)
                    if aux:
                        cnt_blk = jnp.where(sel, jnp.where(win, cnt_at + 1, 1), cnt_blk)
                        sq_blk = jnp.where(sel, jnp.where(win, sq_at, qpos_i), sq_blk)
                        sr_blk = jnp.where(sel, jnp.where(win, sr_at, rpos_i), sr_blk)
                    else:
                        prev_blk = jnp.where(sel, jnp.where(win, j_best, -1), prev_blk)
                f_ref[g8:g8 + 8, :] = f_blk
                if aux:
                    cnt_ref[g8:g8 + 8, :] = cnt_blk
                    sq_ref[g8:g8 + 8, :] = sq_blk
                    sr_ref[g8:g8 + 8, :] = sr_blk
                else:
                    prev_ref[g8:g8 + 8, :] = prev_blk

        # epilogue: padding rows (i >= max_n) have no admissible
        # predecessor, so their outputs are the no-chain base case; this
        # also covers the rows of skipped groups
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


_static_kernel = _sublane_static_kernel(aux=False)
_static_aux_kernel = _sublane_static_kernel(aux=True)


# ---------------------------------------------------------------------
# dynamic sublane layout: (A, B), one-hot row steps (truncated windows)
# ---------------------------------------------------------------------


def _sublane_kernel(aux: bool):
    """Build the dynamic sublane-layout kernel body; aux=True accumulates
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


def _call(kernel_fn, n_out, lane: bool, static: bool, grp, rpos, qpos,
          span, scalars, window: int):
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
    if static:
        kernel = functools.partial(kernel_fn, A=A)
    else:
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
        return _call(_chain_kernel_lane, 2, True, False, grp, rpos, qpos,
                     span, scalars, window)
    if min(window, A) >= A:
        return _call(_static_kernel, 2, False, True, grp, rpos, qpos,
                     span, scalars, window)
    return _call(_chain_kernel, 2, False, False, grp, rpos, qpos, span,
                 scalars, window)


@functools.partial(jax.jit, static_argnames=("window",))
def chain_dp_aux_batch_pallas(grp, rpos, qpos, span, scalars, window: int):
    """Drop-in replacement for chain_ops.chain_dp_aux_batch:
    (f, cnt, sq, sr), each (B, A) int32."""
    B, A = grp.shape
    if A >= _LANE_LAYOUT_MIN_A:
        return _call(_chain_aux_kernel_lane, 4, True, False, grp, rpos,
                     qpos, span, scalars, window)
    if min(window, A) >= A:
        return _call(_static_aux_kernel, 4, False, True, grp, rpos, qpos,
                     span, scalars, window)
    return _call(_chain_aux_kernel, 4, False, False, grp, rpos, qpos,
                 span, scalars, window)
