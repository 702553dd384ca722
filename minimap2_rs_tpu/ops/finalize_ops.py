"""On-device chain finalization for the default-parameter fast path.

With the reference's default min_cnt >= 2, its backtracking rejects every
candidate chain (the degenerate mg_chain_bk_end walk makes each candidate
a single anchor, lchain.rs:108-125) and the greedy fallback emits exactly
one chain per read: the prev[] path from the highest-scoring anchor
(lchain.rs:161-173). Chain merge and primary/secondary selection are
no-ops on a single chain, so the whole host postprocess collapses to:

    best = last argmax f     (Rust max_by_key takes the last maximum)
    chain = prev* path from best
    extents / cm / strand / rid over the path
    dv match counting against the query minimizer positions
    rescue decision (lchain.rs:321-326)

All of which vectorizes: the path is extracted with pointer doubling
(log2 A scatter/gather rounds), extents are masked reductions, and the
dv two-pointer loop (paf.rs:185-188) reduces to an ordered set
intersection because chain query positions are strictly monotone (the DP
requires dq > 0) and minimizer positions are strictly increasing — so
n_match is a membership count and (st, en) are binary-search positions.

The result: the device returns ~16 words per read instead of the full
anchor/score tensors, which matters because every device->host transfer
through the TPU relay costs tens of milliseconds.

Reads that need the general path (parameter combinations with
min_cnt <= 1, HPC spans, slot overflow, rescue) are flagged and fall back
to the host pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

I32 = jnp.int32
U32 = jnp.uint32
_NEG_INF = -(2**30)  # python literal (see chain_ops note)

# output field order (finalize_chain_batch)
FIELDS = [
    "score", "qs", "qe", "ts", "te", "cm", "grp", "n_match", "st", "n_tot",
    "dv_found", "rescue", "n_anchors", "n_mini", "mini_ovf", "anc_ovf",
]


def _lower_bound_rows(sorted_rows: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Per-row lower_bound of q (B, A) into sorted_rows (B, M), uint32."""
    import numpy as _np

    B, M = sorted_rows.shape
    lo = jnp.zeros(q.shape, dtype=I32)
    hi = jnp.full(q.shape, M, dtype=I32)
    steps = max(1, int(_np.ceil(_np.log2(M + 1))) + 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        vmid = jnp.take_along_axis(sorted_rows, jnp.minimum(mid, M - 1), axis=1)
        go_right = vmid < q
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def finalize_chain_batch(
    x_hi, x_lo, y_hi, y_lo,   # (B, A) uint32 sorted anchors
    f, prev,                  # (B, A) int32 DP results
    n_anchors,                # (B,) int32
    mini_pos,                 # (B, M) uint32 sorted positions (pad 0xFFFFFFFF)
    n_mini,                   # (B,) int32
    lengths,                  # (B,) int32 query lengths
    tlens,                    # (n_seq,) int32 target lengths
    mini_ovf, anc_ovf,        # (B,) bool
    k: int,                   # static; avg_k == k for non-HPC sketches
    rmq_rescue_size: jnp.ndarray,   # i32
    rmq_rescue_ratio: jnp.ndarray,  # f32
):
    """Returns a packed (B, 16) int32 field array (see FIELDS)."""
    B, A = f.shape
    import numpy as _np

    a_idx = jnp.broadcast_to(jnp.arange(A, dtype=I32), (B, A))
    valid = a_idx < n_anchors[:, None]
    fm = jnp.where(valid, f, _NEG_INF)
    # last argmax (Rust max_by_key tie semantics)
    best_i = (A - 1) - jnp.argmax(fm[:, ::-1], axis=1).astype(I32)
    rows = jnp.arange(B, dtype=I32)
    score = fm[rows, best_i]

    # path extraction by pointer doubling
    own = a_idx
    jump = jnp.where(prev >= 0, prev, own)
    mask = own == best_i[:, None]
    rows2 = jnp.broadcast_to(rows[:, None], (B, A))
    steps = max(1, int(_np.ceil(_np.log2(A))) + 1)
    for _ in range(steps):
        img = jnp.zeros((B, A), bool).at[rows2, jump].max(mask)
        new_mask = mask | img
        jump = jnp.take_along_axis(jump, jump, axis=1)
        mask = new_mask
    mask = mask & valid

    qpos = jax.lax.bitcast_convert_type(y_lo, I32)
    span = jax.lax.bitcast_convert_type(y_hi & U32(0xFF), I32)
    rpos = jax.lax.bitcast_convert_type(x_lo, I32)
    BIG = jnp.int32(2**30)
    qs = jnp.min(jnp.where(mask, qpos - (span - 1), BIG), axis=1)
    qe = jnp.max(jnp.where(mask, qpos + 1, -BIG), axis=1)
    ts = jnp.min(jnp.where(mask, rpos - (span - 1), BIG), axis=1)
    te = jnp.max(jnp.where(mask, rpos + 1, -BIG), axis=1)
    qs = jnp.maximum(qs, 0)
    ts = jnp.maximum(ts, 0)
    cm = jnp.sum(mask, axis=1).astype(I32)
    grp = jax.lax.bitcast_convert_type(x_hi, I32)[rows, best_i]
    rev = (grp >> 31) & 1
    rid = grp & 0x7FFFFFFF
    tlen = tlens[jnp.clip(rid, 0, tlens.shape[0] - 1)]
    qlen = lengths

    # dv match counting (paf.rs:156-199): chain query-forward positions
    # are strictly monotone, minimizer positions strictly increasing
    qfwd = jnp.where(
        rev[:, None] == 1,
        qlen[:, None] - 1 - (qpos + 1 - span),
        qpos,
    )
    first = jnp.min(jnp.where(mask, qfwd, BIG), axis=1)
    qfwd_u = jax.lax.bitcast_convert_type(jnp.where(mask, qfwd, BIG), U32)
    pos = _lower_bound_rows(mini_pos, qfwd_u)
    M = mini_pos.shape[1]
    at = jnp.take_along_axis(mini_pos, jnp.minimum(pos, M - 1), axis=1)
    present = mask & (pos < n_mini[:, None]) & (at == qfwd_u)
    n_match = jnp.sum(present, axis=1).astype(I32)
    # the reference computes dv only when the chain's first forward
    # position is found in the minimizer stream (paf.rs:178-179)
    dv_found = jnp.any(present & (qfwd == first[:, None]), axis=1)
    st = jnp.min(jnp.where(present, pos, BIG), axis=1)
    en = jnp.max(jnp.where(present, pos, -BIG), axis=1)
    n_tot = en - st + 1
    # edge adjustment with printed coordinates (paf.rs:191-195)
    r_qs = jnp.where(rev == 1, qlen - qe, qs)
    r_qe = jnp.where(rev == 1, qlen - qs, qe)
    kk = jnp.int32(k)  # int(avg_k) with all spans == k
    n_tot = n_tot + ((r_qs > kk) & (ts > kk)).astype(I32)
    n_tot = n_tot + (((qlen - r_qe) > kk) & ((tlen - te) > kk)).astype(I32)

    # rescue decision (lchain.rs:321-326)
    cov = jnp.maximum(qe - qs, 0)
    uncovered = jnp.maximum(qlen - cov, 0)
    rescue = (uncovered > rmq_rescue_size) | (
        cov.astype(jnp.float32)
        < qlen.astype(jnp.float32) * (jnp.float32(1.0) - rmq_rescue_ratio)
    )

    out = jnp.stack(
        [
            score, qs, qe, ts, te, cm, grp, n_match, st, n_tot,
            dv_found.astype(I32), rescue.astype(I32), n_anchors, n_mini,
            mini_ovf.astype(I32), anc_ovf.astype(I32),
        ],
        axis=1,
    )
    return out
