"""Banded extension kernel tests: the Levenshtein variant against the
reference-contract oracle (paf.rs:35-79), the affine variant against a
scalar DP oracle."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp

from minimap2_rs_tpu.oracle.paf import banded_edit_distance
from minimap2_rs_tpu.ops.extend_ops import banded_affine_extend, banded_edit_batch
from minimap2_rs_tpu.utils.packing import nt4_encode

NEG = -(10**9)


def _affine_oracle(q, r, band, ma=2, mi=4, go=4, ge=2):
    n, m = len(q), len(r)
    H, F = {(0, 0): 0}, {}
    best = (0, 0, 0)
    for j in range(1, min(m, band) + 1):
        H[(0, j)] = -(go + ge * j)
    for i in range(1, n + 1):
        lo = max(0, i - band)
        for j in range(max(1, lo), min(m, i + band) + 1):
            sub = ma if q[i - 1] == r[j - 1] else -mi
            h = H.get((i - 1, j - 1), NEG) + sub
            f = max(F.get((i - 1, j), NEG), H.get((i - 1, j), NEG) - go) - ge
            F[(i, j)] = f
            H[(i, j)] = max(h, f)
        for j in range(max(1, lo), min(m, i + band) + 1):
            if j > lo:
                e = max(H.get((i, jj), NEG) - go - (j - jj) * ge for jj in range(lo, j))
                H[(i, j)] = max(H[(i, j)], e)
        for j in range(max(1, lo), min(m, i + band) + 1):
            if H[(i, j)] > best[0]:
                best = (H[(i, j)], i, j)
    return best


def _mutate(rng, s, rate):
    res = bytearray()
    for ch in s:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            res.append(rng.choice(list(b"ACGT")))
            res.append(ch)
        elif r < rate:
            res.append(rng.choice(list(b"ACGT")))
        else:
            res.append(ch)
    return bytes(res)


def _pack(pairs):
    B = len(pairs)
    N = max(len(a) for a, _ in pairs)
    Nr = max(len(b) for _, b in pairs)
    qa = np.full((B, N), 4, np.int32)
    ra = np.full((B, Nr), 4, np.int32)
    ql = np.zeros(B, np.int32)
    rl = np.zeros(B, np.int32)
    for i, (a, b) in enumerate(pairs):
        qa[i, : len(a)] = nt4_encode(a)
        ra[i, : len(b)] = nt4_encode(b)
        ql[i], rl[i] = len(a), len(b)
    return map(jnp.asarray, (qa, ql, ra, rl))


@pytest.fixture(scope="module")
def pairs():
    rng = np.random.default_rng(7)
    out = []
    for _ in range(12):
        n = int(rng.integers(15, 120))
        s = bytes(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))
        out.append((s, _mutate(rng, s, 0.12)))
    # identical, disjoint, and length-skewed pairs
    out.append((b"ACGTACGTACGT", b"ACGTACGTACGT"))
    out.append((b"AAAAAAAAAAAA", b"CCCCCCCCCCCC"))
    out.append((b"ACGTACGT", b"ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"))
    return out


def test_banded_edit_matches_reference_contract(pairs):
    band = 16
    qa, ql, ra, rl = _pack(pairs)
    got = np.asarray(banded_edit_batch(qa, ql, ra, rl, band))
    exp = np.array([banded_edit_distance(a, b, band)[0] for a, b in pairs])
    np.testing.assert_array_equal(got, exp)


def test_banded_affine_matches_scalar_oracle(pairs):
    band = 16
    qa, ql, ra, rl = _pack(pairs)
    sc, bi, bj = (np.asarray(x) for x in banded_affine_extend(qa, ql, ra, rl, band))
    for i, (a, b) in enumerate(pairs):
        assert (int(sc[i]), int(bi[i]), int(bj[i])) == _affine_oracle(a, b, band)
    # perfect match scores 2 * len
    idx = len(pairs) - 3
    assert sc[idx] == 2 * len(pairs[idx][0])
