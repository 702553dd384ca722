"""Sketch oracle tests: the exact scan against hand-derived contracts, and
the vectorized fast path fuzzed against the exact scan (SURVEY.md section 4
item 2)."""

import numpy as np
import pytest

from minimap2_rs_tpu.oracle.sketch import (
    hash64,
    hash64_np,
    sketch_sequence,
    sketch_sequence_fast,
)


def _repeat_seq(rng, n):
    """Sequence with homopolymers, tandem repeats, random stretches, N's —
    the adversarial tie-heavy profile of real genomes."""
    parts, ln = [], 0
    while ln < n:
        kind = rng.integers(0, 4)
        if kind == 0:
            b = rng.choice(list(b"ACGT"))
            parts.append(bytes([b]) * int(rng.integers(5, 40)))
        elif kind == 1:
            unit = bytes(rng.choice(list(b"ACGT"), size=int(rng.integers(1, 6))).astype(np.uint8))
            parts.append(unit * int(rng.integers(3, 20)))
        elif kind == 2:
            parts.append(bytes(rng.choice(list(b"ACGT"), size=int(rng.integers(5, 50))).astype(np.uint8)))
        else:
            parts.append(b"N" * int(rng.integers(1, 5)))
        ln = sum(map(len, parts))
    return b"".join(parts)[:n]


def test_hash64_invertible_and_vectorized():
    mask = (1 << 30) - 1
    vals = [0, 1, 12345, mask]
    hs = [hash64(v, mask) for v in vals]
    assert len(set(hs)) == len(vals)
    np.testing.assert_array_equal(
        hash64_np(np.array(vals, dtype=np.uint64), mask),
        np.array(hs, dtype=np.uint64),
    )


def test_sketch_known_small():
    # Single valid k-mer: emitted once at sequence end (sketch.rs:99).
    out = sketch_sequence(b"ACGTA", w=3, k=5)
    assert len(out) == 1
    key_span, rps = out[0]
    assert key_span & 0xFF == 5  # span == k
    assert rps >> 1 == 4  # position of the k-mer's last base
    # all-N sequence: nothing.
    assert sketch_sequence(b"NNNNNNNN", w=2, k=3) == []


def test_sketch_rid_encoding():
    out = sketch_sequence(b"ACGTACGTACGTACGTACAT", w=2, k=5, rid=7)
    assert out
    for _, rps in out:
        assert rps >> 32 == 7


@pytest.mark.parametrize("hpc", [False, True])
def test_fast_matches_exact_fuzz(hpc):
    rng = np.random.default_rng(1234 + int(hpc))
    for _ in range(120):
        n = int(rng.integers(1, 500))
        w = int(rng.integers(1, 20))
        k = int(rng.choice([3, 5, 7, 9, 11, 13, 15, 19, 21, 27]))
        seq = bytes(
            rng.choice(list(b"ACGTN"), size=n, p=[0.24, 0.24, 0.24, 0.24, 0.04]).astype(np.uint8)
        )
        exact = set(sketch_sequence(seq, w, k, is_hpc=hpc))
        fast = set(map(tuple, sketch_sequence_fast(seq, w, k, is_hpc=hpc).tolist()))
        assert exact == fast, (n, w, k, seq)


@pytest.mark.parametrize("hpc", [False, True])
def test_fast_matches_exact_repeat_heavy(hpc):
    rng = np.random.default_rng(77 + int(hpc))
    for _ in range(80):
        n = int(rng.integers(50, 700))
        w = int(rng.integers(1, 20))
        k = int(rng.choice([11, 13, 15, 19, 21]))
        seq = _repeat_seq(rng, n)
        exact = set(sketch_sequence(seq, w, k, is_hpc=hpc))
        fast = set(map(tuple, sketch_sequence_fast(seq, w, k, is_hpc=hpc).tolist()))
        assert exact == fast, (n, w, k, seq)


def test_fast_matches_exact_long_read():
    rng = np.random.default_rng(5)
    seq = _repeat_seq(rng, 30000)
    exact = set(sketch_sequence(seq, 10, 15))
    fast = set(map(tuple, sketch_sequence_fast(seq, 10, 15).tolist()))
    assert exact == fast
    assert len(exact) > 1000  # sane density: ~2/(w+1) per base

@pytest.mark.parametrize("hpc", [False, True])
def test_fast_matches_exact_even_k(hpc):
    """Even k admits strand-symmetric k-mers (sketch.rs:67): the l counter
    pauses, so the fast path delegates to the exact scan. N-rich input
    exercises the cross-reset register carry-over (VERDICT r1 item 7)."""
    rng = np.random.default_rng(4242 + int(hpc))
    for _ in range(120):
        n = int(rng.integers(10, 400))
        w = int(rng.integers(1, 16))
        k = int(rng.choice([2, 4, 6, 8, 10, 12, 14, 16, 20]))
        seq = bytes(
            rng.choice(list(b"ACGTN"), size=n, p=[0.22, 0.22, 0.22, 0.22, 0.12]).astype(np.uint8)
        )
        exact = set(sketch_sequence(seq, w, k, is_hpc=hpc))
        fast = set(map(tuple, sketch_sequence_fast(seq, w, k, is_hpc=hpc).tolist()))
        assert exact == fast, (n, w, k, seq)


def test_fast_even_k_positions_sorted():
    """The fast path's contract is a position-sorted set; the even-k
    delegation must normalize the scan's emission order."""
    rng = np.random.default_rng(9)
    seq = bytes(rng.choice(list(b"ACGTN"), size=3000, p=[0.24, 0.24, 0.24, 0.24, 0.04]).astype(np.uint8))
    out = sketch_sequence_fast(seq, 6, 14, rid=3)
    assert out.shape[0] > 50
    pos = (out[:, 1].astype(np.uint64) >> np.uint64(1)) & np.uint64(0x7FFFFFFF)
    assert np.all(np.diff(pos.astype(np.int64)) > 0)
    assert np.all(out[:, 1] >> np.uint64(32) == 3)
