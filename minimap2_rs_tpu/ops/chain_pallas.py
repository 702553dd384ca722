"""Pallas TPU kernel for the chaining DP.

Same contract as ops.chain_ops.chain_dp_batch (exact window DP,
lchain.rs:74-91 minus the max_chain_skip heuristic), but the whole batch
lives in VMEM for the duration of the sequential anchor loop: anchors,
f and v never round-trip to HBM between steps, and each step is a single
fused block of (H, B) int32 VPU ops.

Layout: arrays are transposed to (A, B) so step i reads/writes row i and
the predecessor window is a contiguous (H, B) row block — sublane-major
access instead of strided column gathers. The batch dimension provides
the vector parallelism (a TPU core runs one program at a time, so
read-per-program grids would serialize).

VMEM budget: 7 arrays of (A, B) int32 + the (H, B) step block; for
B=256, A=768 that is ~5.5 MB of the ~16 MB core VMEM.
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
_LN2 = float(__import__("numpy").float32(0.6931472))


def _chain_kernel(
    scal_ref,  # SMEM (3,) i32: mdx, mdy, bw
    pen_ref,   # SMEM (2,) f32: chn_pen_gap, chn_pen_skip
    grp_ref, rpos_ref, qpos_ref, span_ref,  # VMEM (A, B) i32
    f_ref, v_ref, prev_ref,  # VMEM outputs (A, B) i32
    *,
    A: int,
    H: int,
):
    B = grp_ref.shape[1]
    mdx = scal_ref[0]
    mdy = scal_ref[1]
    bw = scal_ref[2]
    pen_gap = pen_ref[0]
    pen_skip = pen_ref[1]

    f_ref[...] = jnp.zeros((A, B), I32)
    v_ref[...] = jnp.zeros((A, B), I32)
    prev_ref[...] = jnp.full((A, B), -1, I32)

    row = jax.lax.broadcasted_iota(I32, (H, B), 0)

    def step(i, _):
        off = jnp.clip(i - H, 0, A - H)
        j_abs = row + off
        grp_w = grp_ref[pl.ds(off, H), :]
        rpos_w = rpos_ref[pl.ds(off, H), :]
        qpos_w = qpos_ref[pl.ds(off, H), :]
        span_w = span_ref[pl.ds(off, H), :]
        f_w = f_ref[pl.ds(off, H), :]
        v_w = v_ref[pl.ds(off, H), :]

        grp_i = grp_ref[i, :][None, :]
        rpos_i = rpos_ref[i, :][None, :]
        qpos_i = qpos_ref[i, :][None, :]
        span_i = span_ref[i, :][None, :]

        dq = qpos_i - qpos_w
        dr = rpos_i - rpos_w
        dd = jnp.abs(dr - dq)
        dg = jnp.minimum(dr, dq)
        ok = (
            (j_abs < i)
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
        logp = jnp.where(dd >= 1, jnp.log((dd + 1).astype(F32)) * F32(1.0 / _LN2), F32(0.0))
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
        v_best = jnp.max(
            jnp.where(is_best & (j_abs == j_best[None, :]), v_w, _NEG_INF), axis=0
        )
        v_i = jnp.where(win & (v_best > f_i), v_best, f_i)

        f_ref[i, :] = f_i
        v_ref[i, :] = v_i
        prev_ref[i, :] = prev_i
        return 0

    jax.lax.fori_loop(0, A, step, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("window",))
def chain_dp_batch_pallas(grp, rpos, qpos, span, scalars, window: int):
    """Drop-in replacement for chain_ops.chain_dp_batch (same outputs,
    shape (B, A))."""
    B, A = grp.shape
    H = min(window, A)
    scal = jnp.stack(
        [
            scalars.max_dist_x.astype(I32),
            scalars.max_dist_y.astype(I32),
            scalars.bw.astype(I32),
        ]
    )
    pens = jnp.stack([scalars.chn_pen_gap, scalars.chn_pen_skip]).astype(F32)
    grp_t = jax.lax.bitcast_convert_type(grp, I32).T
    kernel = functools.partial(_chain_kernel, A=A, H=H)
    f, v, prev = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        out_shape=(
            jax.ShapeDtypeStruct((A, B), I32),
            jax.ShapeDtypeStruct((A, B), I32),
            jax.ShapeDtypeStruct((A, B), I32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(scal, pens, grp_t, rpos.astype(I32).T, qpos.astype(I32).T, span.astype(I32).T)
    return f.T, v.T, prev.T
