"""The exact-scan device sketch (ops/sketch_scan.py): fuzz parity vs the
reference-order oracle scan for even k (the l-counter-pause cases the
window-min characterization cannot model, sketch.rs:67-69), plus the
end-to-end even-k device mapping path that replaced the r2 host
fallback."""

from __future__ import annotations

import numpy as np
import pytest

from minimap2_rs_tpu.oracle.sketch import sketch_sequence
from minimap2_rs_tpu.utils.packing import nt4_encode
from minimap2_rs_tpu.utils.seqsim import random_genome


def _device_sets(seq_list, w, k, hpc=False):
    import jax.numpy as jnp

    from minimap2_rs_tpu.ops.sketch_scan import sketch_positions_exact

    B = len(seq_list)
    L = -(-max(len(s) for s in seq_list) // 8) * 8
    codes = np.full((B, L), 4, np.int32)
    lengths = np.zeros(B, np.int32)
    for i, s in enumerate(seq_list):
        codes[i, : len(s)] = nt4_encode(s)
        lengths[i] = len(s)
    ks, ps, em = sketch_positions_exact(
        jnp.asarray(codes), jnp.asarray(lengths), w, k, hpc
    )
    kh, kl, p, e = map(np.asarray, (ks.hi, ks.lo, ps, em))
    out = []
    for b in range(B):
        sel = np.nonzero(e[b])[0]
        ks64 = (kh[b, sel].astype(np.uint64) << np.uint64(32)) | kl[b, sel]
        out.append(set(zip(ks64.tolist(), p[b, sel].tolist())))
    return out


def _oracle_set(seq, w, k, hpc=False):
    return {
        (ks, rps & 0xFFFFFFFF)
        for ks, rps in sketch_sequence(seq, w, k, is_hpc=hpc)
    }


def _cases():
    cases = [random_genome(900, seed=s) for s in range(3)]
    for alpha in (b"AC", b"AT"):  # tie-heavy, symmetric-k-mer-rich
        r = np.random.default_rng(len(alpha))
        cases.append(bytes(r.choice(list(alpha), size=600).tolist()))
    cases.append(b"ACGT" * 150)       # strand-symmetric every even k
    cases.append(b"ATATATAT" * 60)
    cases.append(b"A" * 200 + b"N" + b"CGCG" * 60)  # stale-register reset
    return cases


@pytest.mark.parametrize(
    "w,k,hpc",
    [
        (10, 14, False),
        (5, 10, False),
        (10, 16, False),
        (3, 2, False),
        (1, 14, False),   # w=1: every window completes
        (10, 14, True),   # HPC spans + even k
        (10, 15, False),  # odd-k cross-check of the same recurrence
    ],
)
def test_exact_scan_matches_oracle(w, k, hpc):
    cases = _cases()
    dev = _device_sets(cases, w, k, hpc)
    for b, seq in enumerate(cases):
        assert dev[b] == _oracle_set(seq, w, k, hpc), (w, k, hpc, b)


def test_even_k_device_mapping_parity():
    """The r2 whole-read host fallback (models/mapper.py) is gone: even-k
    mapping runs the device pipeline end-to-end, byte-identical to the
    host oracle."""
    from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
    from minimap2_rs_tpu.models.index_builder import build_index_native
    from minimap2_rs_tpu.models.mapper import Mapper
    from minimap2_rs_tpu.oracle.pipeline import map_reads as oracle_map
    from minimap2_rs_tpu.utils.seqsim import simulate_reads

    genome = random_genome(200_000, seed=4)
    idx = build_index_native([("chrE", genome)], IndexParams(w=10, k=14))
    cp = ChainParams.defaults_for_k(14)
    mp = MapParams()
    rl = [
        (n, s)
        for n, s, *_ in simulate_reads(genome, 32, read_len=(500, 900), seed=5)
    ]
    m = Mapper.from_oracle_index(idx, cp, mp, batch_size=32)
    assert m.map_reads(rl) == oracle_map(idx, rl, cp, mp)
