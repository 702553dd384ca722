"""Query seeding and anchor generation oracle
(/root/reference/src/seeds.rs).

Anchor encoding (seeds.rs:63-78):
  x = rev << 63 | rid << 32 | rpos          (target axis)
  y = qspan << 32 | qpos'                   (query axis)
where qpos' is the raw query position for forward-matching anchors and the
reverse-complement-flipped position qlen - (qpos+1-qspan) - 1 otherwise.
"""

from __future__ import annotations

import numpy as np

from .index import OracleIndex
from .sketch import sketch_sequence, sketch_sequence_fast


def collect_query_minimizers(seq: bytes, w: int, k: int) -> list[tuple[int, int]]:
    """Query sketch in the exact scan's emission order (seeds.rs:7-11) —
    the order matters for the dv estimate (paf.rs:156-199). Dispatches to
    the native runtime when available (bit- and order-exact; fuzz-verified
    in tests/test_native_runtime.py)."""
    import os

    if len(seq) and not os.environ.get("MM2T_NO_NATIVE"):
        from ..runtime.host import native_sketch

        out = native_sketch(seq, w, k, rid=0, is_hpc=False)
        if out is not None:
            return out
    return sketch_sequence(seq, w, k, rid=0, is_hpc=False)


def collect_query_minimizers_fast(seq: bytes, w: int, k: int) -> np.ndarray:
    """Position-sorted query minimizer set (vectorized)."""
    return sketch_sequence_fast(seq, w, k, rid=0, is_hpc=False)


def filter_query_minimizers(
    mv: list[tuple[int, int]], q_occ_max: int, q_occ_frac: float
) -> list[tuple[int, int]]:
    """Drop over-represented query minimizer keys (seeds.rs:13-36): a key
    is dropped when its count exceeds both q_occ_max and
    floor(len * q_occ_frac); no-op when len <= q_occ_max."""
    if not mv or q_occ_frac <= 0.0 or q_occ_max <= 0:
        return mv
    if len(mv) <= q_occ_max:
        return mv
    keys = np.array([m[0] >> 8 for m in mv], dtype=np.uint64)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    cutoff = int(len(mv) * q_occ_frac)
    keep = np.ones(len(mv), dtype=bool)
    st = 0
    n = len(sk)
    for i in range(1, n + 1):
        if i == n or sk[i] != sk[st]:
            cnt = i - st
            if cnt > q_occ_max and cnt > cutoff:
                keep[order[st:i]] = False
            st = i
    return [m for m, kp in zip(mv, keep) if kp]


def build_anchors(
    idx: OracleIndex,
    mv: list[tuple[int, int]] | np.ndarray,
    qlen: int,
    mid_occ: int = np.iinfo(np.int32).max,
) -> np.ndarray:
    """Anchors for a query's minimizers (build_anchors_filtered,
    seeds.rs:42-60). Keys with occurrence count > mid_occ are skipped
    unless they are singletons (the reference always keeps singletons,
    seeds.rs:48-50). Returns an (n, 2) uint64 array sorted by (x, y)."""
    if isinstance(mv, np.ndarray):
        pairs = mv
    else:
        pairs = np.array(mv, dtype=np.uint64).reshape(-1, 2)
    if pairs.shape[0] == 0:
        return np.zeros((0, 2), dtype=np.uint64)
    xs: list[np.ndarray] = []
    ys: list[np.ndarray] = []
    for key_span, qrps in pairs:
        minier = int(key_span) >> 8
        occs = idx.get(minier)
        if occs is None:
            continue
        if occs.shape[0] > 1 and occs.shape[0] > mid_occ:
            continue
        x, y = _encode_anchors(occs, int(key_span), int(qrps), qlen)
        xs.append(x)
        ys.append(y)
    if not xs:
        return np.zeros((0, 2), dtype=np.uint64)
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    order = np.lexsort((y, x))
    return np.stack([x[order], y[order]], axis=1)


def _encode_anchors(r: np.ndarray, key_span: int, qrps: int, qlen: int):
    """Vectorized push_anchor (seeds.rs:63-78) over one key's occurrence
    block.

    NOTE: the reference extracts rpos as (r >> 1) & 0xffffffff
    (seeds.rs:65), which leaks rid's low bit into rpos bit 31 for
    odd-numbered target sequences and corrupts their coordinates (it was
    only ever exercised on a single-sequence reference, README.md:8-27).
    We extract the position correctly: low 32 bits first, then shift."""
    rid = (r >> np.uint64(32)) & np.uint64(0xFFFFFFFF)
    rpos = (r & np.uint64(0xFFFFFFFF)) >> np.uint64(1)
    rstrand = r & np.uint64(1)
    qpos = (qrps >> 1) & 0xFFFFFFFF
    qstrand = qrps & 1
    qspan = key_span & 0xFF
    forward = rstrand == np.uint64(qstrand)
    x = (rid << np.uint64(32)) | rpos
    x = np.where(forward, x, x | np.uint64(1 << 63))
    qp_fwd = np.uint64((qspan << 32) | qpos)
    qp_rev = np.uint64((qspan << 32) | ((qlen - (qpos + 1 - qspan) - 1) & 0xFFFFFFFF))
    y = np.where(forward, qp_fwd, qp_rev)
    return x, y
