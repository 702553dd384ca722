"""max_chain_skip pruning (lchain.rs:79-88): quantification + exact device
replication (VERDICT r1 item 6).

The device chain kernels score the predecessor window exactly by default,
which can only FIND MORE than the reference's order-dependent early-break.
These tests (a) build an adversarial dense-decoy corpus where the pruning
provably changes results, (b) verify chain_dp_batch(max_chain_skip=...)
replicates the reference scan bit-for-bit there and on random corpora, and
(c) bound the s1 drift of the default exact-window mode.

Corpus construction: each block is [backbone anchor G, ~30 "decoy" anchors,
next backbone anchor i]. Decoys sit on a +450 diagonal (inside bw=500 but
heavily gap-penalized: sc0 ~ -43) at unit spacing so they chain to each
other — every decoy is the DP predecessor of the next, so the reference
scan marks them (t[prev[j]] = i) and counts a skip for each. With > 26
decoys between i and G, the scan breaks before reaching G, losing the
f_G + 15 continuation the exact window finds.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from minimap2_rs_tpu.config import ChainParams
from minimap2_rs_tpu.ops.chain_ops import (
    chain_dp_aux_batch,
    chain_dp_batch,
    chain_scalars_from_params,
)
from minimap2_rs_tpu.oracle.lchain import backtrack, chain_dp_scores


def _pack(grp, rpos, qpos, span):
    x = (grp.astype(np.uint64) << np.uint64(32)) | rpos.astype(np.uint64)
    y = (span.astype(np.uint64) << np.uint64(32)) | qpos.astype(np.uint64)
    return np.stack([x, y], axis=1)


def _adversarial(B, n_blocks, seed, boosters=False):
    """Rows of [G, decoys, G, decoys, ...] blocks (see module docstring).
    boosters=True plants an on-diagonal beat mid-cluster, exercising the
    skip counter's saturating decrement."""
    rng = np.random.default_rng(seed)
    rows = []
    for b in range(B):
        rp, qp = [], []
        r0 = 1000
        for t in range(n_blocks):
            n_decoy = int(rng.integers(28, 40))
            rp.append(r0)
            qp.append(r0)  # backbone on the 0 diagonal
            diag = int(rng.integers(420, 480))  # < bw=500, pen >> span
            for u in range(n_decoy):
                rp.append(r0 + 10 + u)
                qp.append(r0 + 10 + u + diag)
            if boosters and t % 2 == 0:
                # on-diagonal beat in the middle of the cluster
                mid = r0 + 10 + n_decoy // 2
                rp.append(mid)
                qp.append(mid)
            r0 += 10 + n_decoy + int(rng.integers(450, 520))
        order = np.argsort(np.array(rp), kind="stable")
        rows.append((np.array(rp)[order], np.array(qp)[order]))
    A = max(len(r) for r, _ in rows)
    grp = np.full((B, A), 0xFFFFFFFF, dtype=np.uint32)
    rpos = np.zeros((B, A), np.int32)
    qpos = np.zeros((B, A), np.int32)
    span = np.zeros((B, A), np.int32)
    for b, (rp, qp) in enumerate(rows):
        n = len(rp)
        grp[b, :n] = 0
        rpos[b, :n] = rp
        qpos[b, :n] = qp
        span[b, :n] = 15
    return grp, rpos, qpos, span


CP = ChainParams.defaults_for_k(15)


def _run(grp, rpos, qpos, span, max_chain_skip=None):
    scal = chain_scalars_from_params(CP)
    args = (jnp.asarray(grp), jnp.asarray(rpos), jnp.asarray(qpos), jnp.asarray(span))
    f, p = chain_dp_batch(*args, scal, grp.shape[1], max_chain_skip=max_chain_skip)
    return np.asarray(f), np.asarray(p)


def test_pruning_binds_on_adversarial_corpus():
    grp, rpos, qpos, span = _adversarial(4, 6, seed=2)
    f_ex, _ = _run(grp, rpos, qpos, span)
    f_pr, _ = _run(grp, rpos, qpos, span, max_chain_skip=CP.max_chain_skip)
    assert (f_ex != f_pr).any(), "corpus must make the pruning bind"
    # exact-window can only find better predecessors
    assert (f_ex >= f_pr).all()


@pytest.mark.parametrize("boosters", [False, True])
def test_pruned_kernel_matches_oracle_adversarial(boosters):
    grp, rpos, qpos, span = _adversarial(6, 5, seed=3, boosters=boosters)
    f_pr, p_pr = _run(grp, rpos, qpos, span, max_chain_skip=CP.max_chain_skip)
    for b in range(grp.shape[0]):
        n = int((grp[b] != 0xFFFFFFFF).sum())
        anchors = _pack(grp[b, :n], rpos[b, :n], qpos[b, :n], span[b, :n])
        fo, vo, po = chain_dp_scores(anchors, CP)
        np.testing.assert_array_equal(f_pr[b, :n], fo)
        np.testing.assert_array_equal(p_pr[b, :n], po)


def test_pruned_kernel_matches_oracle_random():
    rng = np.random.default_rng(4)
    B, A = 6, 256
    grp = np.zeros((B, A), np.uint32)
    rpos = np.zeros((B, A), np.int32)
    qpos = np.zeros((B, A), np.int32)
    span = np.full((B, A), 15, np.int32)
    for b in range(B):
        rp = np.sort(rng.integers(0, 40_000, size=A))
        qp = rp + rng.integers(-1500, 1500, size=A)
        rpos[b] = rp
        qpos[b] = np.maximum(qp, 1)
    f_pr, p_pr = _run(grp, rpos, qpos, span, max_chain_skip=CP.max_chain_skip)
    for b in range(B):
        anchors = _pack(grp[b], rpos[b], qpos[b], span[b])
        fo, vo, po = chain_dp_scores(anchors, CP)
        np.testing.assert_array_equal(f_pr[b], fo)
        np.testing.assert_array_equal(p_pr[b], po)


def test_aux_kernel_pruned_matches_batch():
    grp, rpos, qpos, span = _adversarial(4, 5, seed=5, boosters=True)
    scal = chain_scalars_from_params(CP)
    args = (jnp.asarray(grp), jnp.asarray(rpos), jnp.asarray(qpos), jnp.asarray(span))
    A = grp.shape[1]
    f1, p1 = chain_dp_batch(*args, scal, A, max_chain_skip=CP.max_chain_skip)
    f2, cnt, sq, sr = chain_dp_aux_batch(*args, scal, A, max_chain_skip=CP.max_chain_skip)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    # cnt/sq/sr must agree with walking the batch kernel's prev pointers
    p1 = np.asarray(p1)
    cnt, sq, sr = map(np.asarray, (cnt, sq, sr))
    for b in range(grp.shape[0]):
        for i in range(A):
            n, j = 0, i
            while j >= 0:
                n += 1
                last = j
                j = p1[b, j]
            assert cnt[b, i] == n
            assert sq[b, i] == qpos[b, last]
            assert sr[b, i] == rpos[b, last]


def test_exact_window_s1_drift_bounded_realistic():
    """On a realistic dense-tandem-repeat corpus (not the engineered decoy
    ladder), the default exact-window mode's best chain score may only
    match or exceed the pruned reference score, by a bounded margin."""
    rng = np.random.default_rng(6)
    B = 8
    rows = []
    for b in range(B):
        # tandem repeat: every query position matches ~8 target copies at
        # period ~120 -> dense in-band predecessor sets with real marks
        n_q = 60
        copies = 8
        rp, qp = [], []
        for t in range(n_q):
            q = 50 + 9 * t
            for c in range(copies):
                rp.append(300 + 9 * t + 120 * c + int(rng.integers(0, 3)))
                qp.append(q)
        order = np.lexsort((qp, rp))
        rows.append((np.array(rp)[order], np.array(qp)[order]))
    A = max(len(r) for r, _ in rows)
    grp = np.full((B, A), 0xFFFFFFFF, dtype=np.uint32)
    rpos = np.zeros((B, A), np.int32)
    qpos = np.zeros((B, A), np.int32)
    span = np.zeros((B, A), np.int32)
    for b, (rp, qp) in enumerate(rows):
        grp[b, : len(rp)] = 0
        rpos[b, : len(rp)] = rp
        qpos[b, : len(rp)] = qp
        span[b, : len(rp)] = 15
    f_ex, p_ex = _run(grp, rpos, qpos, span)
    f_pr, p_pr = _run(grp, rpos, qpos, span, max_chain_skip=CP.max_chain_skip)
    for b in range(B):
        n = int((grp[b] != 0xFFFFFFFF).sum())
        anchors = _pack(grp[b, :n], rpos[b, :n], qpos[b, :n], span[b, :n])
        _, s_ex = backtrack(anchors, f_ex[b, :n], None, p_ex[b, :n], CP)
        _, s_pr = backtrack(anchors, f_pr[b, :n], None, p_pr[b, :n], CP)
        s1_ex = max(s_ex) if s_ex else 0
        s1_pr = max(s_pr) if s_pr else 0
        assert s1_ex >= s1_pr
        # drift bound: a few points, per README's claim
        assert s1_ex - s1_pr <= max(5, int(0.02 * s1_pr)), (b, s1_ex, s1_pr)


def test_mapper_skip_prune_env_end_to_end(monkeypatch):
    """MM2T_SKIP_PRUNE=1: the device Mapper replicates the reference's
    pruning, so PAF output is byte-identical to the (always-pruning) host
    oracle even on a repeat-dense genome."""
    from minimap2_rs_tpu.config import IndexParams, MapParams
    from minimap2_rs_tpu.models.mapper import Mapper
    from minimap2_rs_tpu.oracle.index import build_index
    from minimap2_rs_tpu.oracle.pipeline import map_reads
    from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

    rng = np.random.default_rng(11)
    base = np.frombuffer(random_genome(4000, seed=12), dtype=np.uint8)
    unit = np.frombuffer(random_genome(160, seed=13), dtype=np.uint8)
    parts = [base]
    for _ in range(6):
        parts += [np.tile(unit, 8), np.frombuffer(
            random_genome(1500, seed=int(rng.integers(1 << 30))), dtype=np.uint8
        )]
    genome = b"".join(p.tobytes() for p in parts)
    idx = build_index([("chrR", genome)], IndexParams(w=5, k=15))
    cp = ChainParams.defaults_for_k(15)
    mp = MapParams()

    monkeypatch.setenv("MM2T_SKIP_PRUNE", "1")
    mapper = Mapper.from_oracle_index(
        idx, cp, mp, buckets=(512, 1024), batch_size=8,
        mini_frac=0.6, anchor_frac=2.0,
    )
    reads = simulate_reads(genome, 16, read_len=(300, 900), seed=14)
    rl = [(n, s) for n, s, *_ in reads]
    host = map_reads(idx, rl, cp, mp)
    dev = mapper.map_reads(rl)
    assert dev == host
    assert any(host)


def test_mesh_mapper_skip_prune_env(monkeypatch):
    """MM2T_SKIP_PRUNE threads through the mesh-lite programs too:
    MeshMapper output stays byte-identical to the host oracle."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device mesh")
    from minimap2_rs_tpu.config import IndexParams, MapParams
    from minimap2_rs_tpu.models.mesh_mapper import make_mesh_mapper
    from minimap2_rs_tpu.oracle.index import build_index
    from minimap2_rs_tpu.oracle.pipeline import map_reads
    from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

    genome = random_genome(40_000, seed=41)
    idx = build_index([("chrM", genome)], IndexParams(w=5, k=15))
    cp = ChainParams.defaults_for_k(15)
    mp = MapParams()
    monkeypatch.setenv("MM2T_SKIP_PRUNE", "1")
    mm = make_mesh_mapper(
        idx, cp, mp, dp=4, buckets=(512,), batch_size=8,
        mini_frac=0.6, anchor_frac=1.0,
    )
    reads = simulate_reads(genome, 8, read_len=(200, 450), seed=42)
    rl = [(n, s) for n, s, *_ in reads]
    host = map_reads(idx, rl, cp, mp)
    assert mm.map_reads(rl) == host
    assert any(host)
