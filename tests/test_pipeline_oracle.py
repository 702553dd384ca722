"""End-to-end host pipeline tests: seeding, chaining, selection, PAF — and
mapping accuracy against simulation truth (SURVEY.md section 4)."""

import numpy as np
import pytest

from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
from minimap2_rs_tpu.oracle.index import build_index
from minimap2_rs_tpu.oracle.lchain import (
    chain_dp_all,
    chain_qrange,
    chain_trange,
    comput_sc,
    merge_adjacent_chains_with_gap,
    select_and_filter_chains,
)
from minimap2_rs_tpu.oracle.paf import write_paf, PafRecord
from minimap2_rs_tpu.oracle.pipeline import map_reads
from minimap2_rs_tpu.oracle.seeds import (
    build_anchors,
    collect_query_minimizers,
    filter_query_minimizers,
)
from minimap2_rs_tpu.utils.seqsim import random_genome, revcomp, simulate_reads


@pytest.fixture(scope="module")
def mapping_setup():
    genome = random_genome(150_000, seed=0)
    idx = build_index([("ref1", genome)], IndexParams())
    return genome, idx


def test_comput_sc_contract():
    # anchors: (x, y) with rpos/qpos/qspan packed. Colinear pair 100 apart.
    def mk(rpos, qpos, qspan=15):
        return (rpos, (qspan << 32) | qpos)

    xi, yi = mk(200, 150)
    xj, yj = mk(100, 50)
    sc = comput_sc(xi, yi, xj, yj, 5000, 5000, 500, 0.12, 0.0)
    assert sc == 15  # dd=0, dg=100 > qspan -> penalty 0 (dd=0, log 0)... gap pen only on dd
    # dq <= 0 rejected (lchain.rs:19)
    assert comput_sc(xj, yj, xi, yi, 5000, 5000, 500, 0.12, 0.0) is None
    # dr == 0 rejected (lchain.rs:22)
    assert comput_sc(mk(100, 150)[0], mk(100, 150)[1], xj, yj, 5000, 5000, 500, 0.12, 0.0) is None
    # band: dd > bw rejected (lchain.rs:24)
    assert comput_sc(mk(2000, 150)[0], mk(2000, 150)[1], xj, yj, 5000, 5000, 500, 0.12, 0.0) is None
    # gap penalty truncates f32 (lchain.rs:28-31): dd=10 -> pen = 1.2 + 0.5*log2(11)
    sc = comput_sc(mk(210, 150)[0], mk(210, 150)[1], xj, yj, 5000, 5000, 500, 0.12, 0.0)
    expect = 15 - int(np.float32(0.12) * 10 + np.float32(0.5) * (np.float32(np.log(np.float32(11))) / np.float32(0.6931472)))
    assert sc == expect


def test_anchor_strand_encoding(mapping_setup):
    genome, idx = mapping_setup
    frag = genome[5000:5600]
    mv = collect_query_minimizers(frag, idx.w, idx.k)
    a_fwd = build_anchors(idx, mv, len(frag))
    mv_rc = collect_query_minimizers(revcomp(frag), idx.w, idx.k)
    a_rev = build_anchors(idx, mv_rc, len(frag))
    assert a_fwd.shape[0] > 0 and a_rev.shape[0] > 0
    # forward read -> mostly bit63=0 anchors; reverse -> bit63=1
    fwd_frac = np.mean((a_fwd[:, 0] >> np.uint64(63)) == 0)
    rev_frac = np.mean((a_rev[:, 0] >> np.uint64(63)) == 1)
    assert fwd_frac > 0.9 and rev_frac > 0.9
    # sorted by (x, y)
    x, y = a_fwd[:, 0], a_fwd[:, 1]
    key = [(int(a), int(b)) for a, b in zip(x, y)]
    assert key == sorted(key)


def test_filter_query_minimizers_contract():
    # 30 minimizers, one key repeated 20x -> dropped (20 > max(10, 0.3))
    mv = [((5 << 8) | 15, i << 1) for i in range(20)]
    mv += [(((100 + i) << 8) | 15, (50 + i) << 1) for i in range(10)]
    out = filter_query_minimizers(list(mv), 10, 0.01)
    assert len(out) == 10
    assert all(ks >> 8 != 5 for ks, _ in out)
    # no-op when len <= q_occ_max (seeds.rs:15)
    short = mv[:5]
    assert filter_query_minimizers(list(short), 10, 0.01) == short


def test_chain_and_select(mapping_setup):
    genome, idx = mapping_setup
    frag = genome[40000:41000]
    mv = collect_query_minimizers(frag, idx.w, idx.k)
    anchors = build_anchors(idx, mv, len(frag), mid_occ=50)
    cp = ChainParams.defaults_for_k(15)
    chains, scores = chain_dp_all(anchors, cp)
    assert chains and scores[0] > 100
    qs, qe = chain_qrange(anchors, chains[0])
    ts, te = chain_trange(anchors, chains[0])
    assert 0 <= qs < qe <= len(frag)
    assert abs(ts - 40000) < 50 and abs(te - 41000) < 50
    out_chains, out_scores, out_pri, s1, s2 = select_and_filter_chains(
        anchors, chains, scores, 0.5, 0.8, 5
    )
    assert out_pri[0] is True and s1 == scores[0]
    merged = merge_adjacent_chains_with_gap(anchors, chains, 5000, 5000)
    assert sum(len(c) for c in merged) == sum(len(c) for c in chains)


def test_map_reads_accuracy(mapping_setup):
    genome, idx = mapping_setup
    reads = simulate_reads(genome, 12, read_len=(500, 900), seed=2)
    lines = map_reads(
        idx, [(n, s) for n, s, *_ in reads], ChainParams.defaults_for_k(15), MapParams()
    )
    truth = {n: (st, en, strand) for n, s, st, en, strand in reads}
    placed = 0
    for line in lines:
        f = line.split("\t")
        assert len(f) == 18  # 12 cols + 6 tags
        assert f[11] == "60"  # mapq hard-coded (paf.rs:213)
        assert f[12].startswith("tp:A:")
        st, en, strand = truth[f[0]]
        if f[4] == strand and abs(int(f[7]) - st) < 120 and abs(int(f[8]) - en) < 120:
            placed += 1
    assert placed >= len(reads) - 1


def test_paf_minus_strand_flip():
    rec = PafRecord(
        qname="q", qlen=100, qstart=10, qend=90, strand="-", tname="t",
        tlen=1000, tstart=5, tend=85, nm=80, blen=80, mapq=60, tp="P",
        cm=9, s1=50, s2=0, dv=0.00123, rl=0,
    )
    line = write_paf(rec)
    f = line.split("\t")
    # '-' strand flips query coords at write time (paf.rs:225-227)
    assert (f[2], f[3]) == ("10", "90")  # qlen-qend, qlen-qstart
    assert f[16] == "dv:f:0.0012"
