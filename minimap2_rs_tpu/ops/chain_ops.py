"""Batched colinear chaining DP on device.

The reference's O(n*h) predecessor scan (/root/reference/src/lchain.rs:74-91)
is sequential in i but parallel in j; here each read runs a lax.scan over
its (padded) anchor array while the <=H predecessor window is scored as one
vectorized block, and reads are vmapped into a (B, A) batch. H equals
max_chain_iter so the window cap is bit-exact; the remaining st-window
constraint (lchain.rs:75) is equivalent to masking dr > max_dist_x because
anchors are rpos-sorted within a (rev,rid) group.

The only reference heuristic not reproduced is the order-dependent
max_chain_skip early-break (lchain.rs:85): it is a pruning that can only
*miss* better predecessors, is dropped by other vectorized chaining
implementations for the same reason, and is quantified against the oracle
in tests (identical results on all test corpora; see
tests/test_device_pipeline.py).

Outputs (f, v, prev) feed the host-side backtracking (oracle/lchain.py) —
pointer chasing over a few hundred elements per read is host work
(SURVEY.md section 7, hard part 5).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

I32 = jnp.int32
F32 = jnp.float32
# python literals, NOT jnp arrays: module-level committed jax
# arrays get lifted as executable inputs and this environment's
# jit cache mis-marshals them on repeat calls
_NEG_INF = -(2**30)
_LN2 = 0.6931472


class ChainScalars(NamedTuple):
    """Traced chaining parameters (so bw changes — e.g. the rescue pass,
    lchain.rs:321-330 — do not recompile)."""

    max_dist_x: jnp.ndarray  # i32 (already max'd with bw, lchain.rs:63-66)
    max_dist_y: jnp.ndarray  # i32
    bw: jnp.ndarray          # i32
    chn_pen_gap: jnp.ndarray  # f32
    chn_pen_skip: jnp.ndarray  # f32


def _window_scores(
    f_w, grp_w, rpos_w, qpos_w, span_w, j_abs, i,
    grp_i, rpos_i, qpos_i, span_i, p: ChainScalars,
):
    """comput_sc (lchain.rs:17-34) over a predecessor window, masked."""
    dq = qpos_i - qpos_w
    dr = rpos_i - rpos_w
    dd = jnp.abs(dr - dq)
    dg = jnp.minimum(dr, dq)
    ok = (
        (j_abs < i)
        & (grp_w == grp_i)
        & (dq > 0)
        & (dq <= p.max_dist_x)
        & (dq <= p.max_dist_y)
        & (dr != 0)
        & (dr <= p.max_dist_x)  # st-window equivalence (lchain.rs:75)
        & (dd <= p.bw)
    )
    sc = jnp.minimum(span_w, dg)
    lin_pen = p.chn_pen_gap * dd.astype(F32) + p.chn_pen_skip * dg.astype(F32)
    log_pen = jnp.where(
        dd >= 1, jnp.log((dd + 1).astype(F32)) / F32(_LN2), F32(0.0)
    )
    pen = (lin_pen + F32(0.5) * log_pen).astype(I32)  # f32 truncation
    sc = jnp.where((dd != 0) | (dg > span_w), sc - pen, sc)
    return jnp.where(ok, sc + f_w, _NEG_INF)


@functools.partial(jax.jit, static_argnames=("window",))
def chain_dp_batch(
    grp: jnp.ndarray,   # (B, A) uint32 rev<<31|rid (padding 0xFFFFFFFF)
    rpos: jnp.ndarray,  # (B, A) int32
    qpos: jnp.ndarray,  # (B, A) int32
    span: jnp.ndarray,  # (B, A) int32
    p: ChainScalars,
    window: int,
):
    """Returns (f, prev) of shape (B, A) int32. (The reference's v array
    is only consumed by the backtrack fallback, where it equals the
    maximum f along the chain — recomputed host-side.)"""
    B, A = grp.shape
    H = min(window, A)

    def one_read(grp_r, rpos_r, qpos_r, span_r):
        def step(carry, i):
            f = carry
            off = jnp.clip(i - H, 0, A - H)
            j_abs = off + jnp.arange(H, dtype=I32)
            f_w = jax.lax.dynamic_slice(f, (off,), (H,))
            grp_w = jax.lax.dynamic_slice(grp_r, (off,), (H,))
            rpos_w = jax.lax.dynamic_slice(rpos_r, (off,), (H,))
            qpos_w = jax.lax.dynamic_slice(qpos_r, (off,), (H,))
            span_w = jax.lax.dynamic_slice(span_r, (off,), (H,))
            scores = _window_scores(
                f_w, grp_w, rpos_w, qpos_w, span_w, j_abs, i,
                grp_r[i], rpos_r[i], qpos_r[i], span_r[i], p,
            )
            # ties pick the largest j (the reference scans j descending and
            # requires strict improvement, lchain.rs:80-84)
            rev_scores = scores[::-1]
            a_rev = jnp.argmax(rev_scores)
            best = rev_scores[a_rev]
            j_best = j_abs[H - 1 - a_rev]
            win = best > span_r[i]
            f_i = jnp.where(win, best, span_r[i])
            prev_i = jnp.where(win, j_best, -1)
            f = f.at[i].set(f_i)
            return f, (f_i, prev_i)

        f0 = jnp.zeros(A, dtype=I32)
        f, (fs, prev) = jax.lax.scan(step, f0, jnp.arange(A, dtype=I32))
        return f, prev

    return jax.vmap(one_read)(
        grp, rpos.astype(I32), qpos.astype(I32), span.astype(I32)
    )


def chain_scalars_from_params(p) -> ChainScalars:
    """Build traced scalars from a config.ChainParams, applying the
    max_dist adjustment (lchain.rs:63-66)."""
    return ChainScalars(
        max_dist_x=jnp.int32(max(p.max_dist_x, p.bw)),
        max_dist_y=jnp.int32(max(p.max_dist_y, p.bw)),
        bw=jnp.int32(p.bw),
        chn_pen_gap=jnp.float32(p.chn_pen_gap),
        chn_pen_skip=jnp.float32(p.chn_pen_skip),
    )


@functools.partial(jax.jit, static_argnames=("window",))
def chain_dp_aux_batch(
    grp: jnp.ndarray,   # (B, A) uint32 rev<<31|rid (padding 0xFFFFFFFF)
    rpos: jnp.ndarray,  # (B, A) int32
    qpos: jnp.ndarray,  # (B, A) int32
    span: jnp.ndarray,  # (B, A) int32
    p: ChainScalars,
    window: int,
):
    """Chain DP that additionally accumulates per-chain statistics along
    the prev path, so the default-parameter fast path never backtracks
    (ops/finalize_ops.py):

      cnt    = chain length (the PAF cm field; also the dv n_match,
               because every chain anchor's query-forward position is a
               member of the minimizer stream by construction and chains
               have strictly increasing query positions)
      sq, sr = chain-start query/target positions

    Returns (f, cnt, sq, sr), each (B, A) int32."""
    B, A = grp.shape
    H = min(window, A)

    def one_read(grp_r, rpos_r, qpos_r, span_r):
        def step(carry, i):
            f, cnt, sq, sr = carry
            off = jnp.clip(i - H, 0, A - H)
            j_abs = off + jnp.arange(H, dtype=I32)
            f_w = jax.lax.dynamic_slice(f, (off,), (H,))
            grp_w = jax.lax.dynamic_slice(grp_r, (off,), (H,))
            rpos_w = jax.lax.dynamic_slice(rpos_r, (off,), (H,))
            qpos_w = jax.lax.dynamic_slice(qpos_r, (off,), (H,))
            span_w = jax.lax.dynamic_slice(span_r, (off,), (H,))
            scores = _window_scores(
                f_w, grp_w, rpos_w, qpos_w, span_w, j_abs, i,
                grp_r[i], rpos_r[i], qpos_r[i], span_r[i], p,
            )
            rev_scores = scores[::-1]
            a_rev = jnp.argmax(rev_scores)
            best = rev_scores[a_rev]
            jb_rel = H - 1 - a_rev
            win = best > span_r[i]
            f_i = jnp.where(win, best, span_r[i])
            cnt_w = jax.lax.dynamic_slice(cnt, (off,), (H,))
            sq_w = jax.lax.dynamic_slice(sq, (off,), (H,))
            sr_w = jax.lax.dynamic_slice(sr, (off,), (H,))
            cnt_i = jnp.where(win, cnt_w[jb_rel] + 1, 1)
            sq_i = jnp.where(win, sq_w[jb_rel], qpos_r[i])
            sr_i = jnp.where(win, sr_w[jb_rel], rpos_r[i])
            f = f.at[i].set(f_i)
            cnt = cnt.at[i].set(cnt_i)
            sq = sq.at[i].set(sq_i)
            sr = sr.at[i].set(sr_i)
            return (f, cnt, sq, sr), None

        z = jnp.zeros(A, dtype=I32)
        (f, cnt, sq, sr), _ = jax.lax.scan(
            step, (z, z, z, z), jnp.arange(A, dtype=I32)
        )
        return f, cnt, sq, sr

    return jax.vmap(one_read)(
        grp, rpos.astype(I32), qpos.astype(I32), span.astype(I32)
    )
