"""Native one-call index build (mm2t_build_index): parity vs the host
build, the flat-table outputs, and the duplicate-freedom fuzz that
justifies keeping reference keep-all semantics (the exact scan never
emits a (key, position) record twice for odd k, so the keep-all native
build and the set-exact host/device builds coincide — see the fixup
comment in runtime/native/mm2t_host.cpp)."""

from __future__ import annotations

import numpy as np
import pytest

from minimap2_rs_tpu.config import IndexParams
from minimap2_rs_tpu.models.index_builder import build_index_native
from minimap2_rs_tpu.oracle.index import build_index
from minimap2_rs_tpu.runtime.host import native_available, native_sketch_array
from minimap2_rs_tpu.utils.seqsim import random_genome

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime not built"
)


def _with_ns(seq: bytes, rng, every: int = 997) -> bytes:
    b = bytearray(seq)
    for j in rng.integers(0, len(b), size=max(len(b) // every, 1)):
        b[j] = ord("N")
    return bytes(b)


@pytest.mark.parametrize(
    "w,k,flag,nseq",
    [
        (10, 15, 0, 1),
        (10, 15, 0, 3),   # multi-sequence: rid + offset bookkeeping
        (5, 11, 0, 2),
        (10, 19, 0, 1),   # 38-bit keys: 3 radix passes
        (10, 28, 0, 1),   # 56-bit keys: 4 radix passes
        (10, 15, 1, 1),   # HPC: no intra-sequence chunking
        (10, 14, 0, 2),   # even k: whole-sequence pieces
    ],
)
def test_native_build_matches_host(w, k, flag, nseq):
    rng = np.random.default_rng(42)
    recs = []
    for i in range(nseq):
        g = _with_ns(random_genome(60_000 + 13 * i, seed=100 + i), rng)
        recs.append((f"s{i}", g))
    p = IndexParams(w=w, k=k, flag=flag)
    a = build_index_native(recs, p)
    b = build_index(recs, p, use_fast_sketch=(k % 2 == 1))
    for fld in ("keys", "starts", "counts", "positions", "S"):
        assert np.array_equal(getattr(a, fld), getattr(b, fld)), fld


def test_native_build_lowercase_and_empty():
    g = random_genome(20_000, seed=5)
    lower = g.lower()
    p = IndexParams()
    a = build_index_native([("s", g), ("e", b""), ("t", lower)], p)
    b = build_index([("s", g), ("e", b""), ("t", lower)], p)
    assert np.array_equal(a.keys, b.keys)
    assert np.array_equal(a.positions, b.positions)
    assert a.seq[1].length == 0


def test_exact_scan_never_duplicates_odd_k():
    """ADVICE r2: prove the exact scan is duplicate-free for odd k, so
    the native build's keep-all semantics equals the set-exact host and
    device builds. Adversarial inputs: tiny alphabets (tie-heavy),
    homopolymers, tandem repeats, N-broken windows."""
    rng = np.random.default_rng(7)
    cases = []
    for seed in range(6):
        cases.append(random_genome(4096, seed=seed))
    for alpha in (b"AC", b"ACG"):  # low-entropy: many window-min ties
        for seed in range(4):
            r = np.random.default_rng(seed)
            cases.append(bytes(r.choice(list(alpha), size=2048).tolist()))
    cases.append(b"A" * 500 + b"C" * 500 + b"A" * 500)
    cases.append(b"ACGTACGTAC" * 300)  # tandem repeat
    cases.append(_with_ns(random_genome(4096, seed=99), rng, every=50))
    for w, k in [(10, 15), (5, 11), (1, 15), (10, 5), (19, 19), (3, 3)]:
        for seq in cases:
            recs = native_sketch_array(seq, w, k)
            if recs is None or recs.shape[0] == 0:
                continue
            pairs = recs.copy()
            pairs[:, 0] >>= np.uint64(8)  # key without span byte
            uniq = np.unique(pairs, axis=0)
            assert uniq.shape[0] == pairs.shape[0], (
                f"duplicate (key,rps) emission at w={w} k={k}"
            )
