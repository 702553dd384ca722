"""Index oracle tests: flat-array construction vs the exact scan, stats,
mid_occ quantile, and byte-format round trips (SURVEY.md section 4)."""

import collections

import numpy as np
import pytest

from minimap2_rs_tpu.config import IndexParams
from minimap2_rs_tpu.oracle.index import OracleIndex, build_index
from minimap2_rs_tpu.oracle.sketch import sketch_sequence
from minimap2_rs_tpu.utils.seqsim import random_genome


@pytest.fixture(scope="module")
def small_index():
    g1 = random_genome(30000, seed=3)
    g2 = random_genome(20000, seed=4)
    idx = build_index([("chr1", g1), ("chr2", g2)], IndexParams(bucket_bits=10))
    return idx, [g1, g2]


def test_index_matches_exact_scan(small_index):
    idx, genomes = small_index
    pairs = []
    for rid, g in enumerate(genomes):
        pairs += [(ks >> 8, r) for ks, r in sketch_sequence(g, 10, 15, rid=rid)]
    keys = np.array([p[0] for p in pairs], dtype=np.uint64)
    np.testing.assert_array_equal(np.sort(np.unique(keys)), idx.keys)
    cnt = collections.Counter(int(p[0]) for p in pairs)
    for k, c in zip(idx.keys.tolist(), idx.counts.tolist()):
        assert cnt[int(k)] == c
    # per-key occurrence blocks are value-sorted (index.rs:98)
    for u in np.argsort(idx.counts)[-5:]:
        s, c = int(idx.starts[u]), int(idx.counts[u])
        block = idx.positions[s : s + c]
        assert np.all(block[:-1] <= block[1:])


def test_get_and_missing(small_index):
    idx, _ = small_index
    probe = int(idx.keys[len(idx.keys) // 2])
    occ = idx.get(probe)
    assert occ is not None and occ.shape[0] >= 1
    # a key not in the index (keys are hashed; probe just above an existing
    # key that is not itself present)
    missing = probe + 1
    if missing not in idx.keys:
        assert idx.get(missing) is None


def test_stats_and_mid_occ(small_index):
    idx, genomes = small_index
    n_keys, avg_occ, avg_spacing, total_len = idx.stats()
    assert n_keys == idx.keys.shape[0]
    assert total_len == sum(len(g) for g in genomes)
    assert 1.0 <= avg_occ < 3.0
    assert 4.0 < avg_spacing < 7.0  # ~ (w+1)/2 for w=10
    # quantile contract (index.rs:124-141)
    srt = np.sort(idx.counts)
    n = srt.shape[0]
    frac = 2e-4
    expect = int(srt[min(int((1.0 - frac) * n), n - 1)]) + 1
    assert idx.calc_mid_occ(frac) == expect


def test_mmi_roundtrip(tmp_path, small_index):
    idx, _ = small_index
    p = str(tmp_path / "x.mmi")
    idx.save_to_mmi(p)
    idx2 = OracleIndex.load_from_mmi(p)
    np.testing.assert_array_equal(idx.keys, idx2.keys)
    np.testing.assert_array_equal(idx.counts, idx2.counts)
    np.testing.assert_array_equal(idx.positions, idx2.positions)
    assert [(s.name, s.offset, s.length) for s in idx.seq] == [
        (s.name, s.offset, s.length) for s in idx2.seq
    ]
    words = sum(s.length for s in idx.seq)
    words = (words + 7) // 8
    np.testing.assert_array_equal(idx.S[:words], idx2.S[:words])
    assert (idx2.w, idx2.k, idx2.b, idx2.flag) == (idx.w, idx.k, idx.b, idx.flag)


def test_mmi_header_layout(tmp_path, small_index):
    """Byte-level header contract of the C-compatible format
    (index.rs:237-254)."""
    idx, _ = small_index
    p = str(tmp_path / "h.mmi")
    idx.save_to_mmi(p)
    raw = open(p, "rb").read()
    assert raw[:4] == b"MMI\x02"
    w, k, b, n_seq, flag = np.frombuffer(raw, dtype="<u4", count=5, offset=4)
    assert (w, k, b, n_seq, flag) == (10, 15, 10, 2, 0)
    off = 24
    assert raw[off] == len("chr1")
    assert raw[off + 1 : off + 5] == b"chr1"


def test_native_roundtrip(tmp_path, small_index):
    idx, _ = small_index
    p = str(tmp_path / "x.idx")
    idx.save_to_file(p)
    idx3 = OracleIndex.load_from_file(p)
    np.testing.assert_array_equal(idx.keys, idx3.keys)
    np.testing.assert_array_equal(idx.positions, idx3.positions)
    assert raw_magic(p) == b"MM2RSIDX\0"


def raw_magic(p):
    with open(p, "rb") as f:
        return f.read(9)


def test_get_ref_subseq(small_index):
    idx, genomes = small_index
    assert idx.get_ref_subseq(0, 100, 164) == genomes[0][100:164]
    assert idx.get_ref_subseq(1, 0, 50) == genomes[1][:50]
    # clamping (index.rs:57-59)
    assert idx.get_ref_subseq(0, -5, 3) == genomes[0][:3]
    assert idx.get_ref_subseq(0, len(genomes[0]) - 2, 10**9) == genomes[0][-2:]
    assert idx.get_ref_subseq(5, 0, 10) == b""
