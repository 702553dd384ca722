"""Native C++ host runtime parity tests: the .so must be bit- and
order-exact against the Python oracles (it replaces them on hot paths)."""

import numpy as np
import pytest

from minimap2_rs_tpu.runtime.host import (
    native_available,
    native_backtrack,
    native_chain_dp,
    native_sketch,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime not built"
)


def test_native_sketch_order_exact():
    from minimap2_rs_tpu.oracle.sketch import sketch_sequence

    rng = np.random.default_rng(42)
    for _ in range(50):
        n = int(rng.integers(20, 600))
        w = int(rng.integers(1, 16))
        k = int(rng.integers(2, 29))  # even k too: the scan is exact
        hpc = bool(rng.integers(0, 2))
        seq = bytes(
            rng.choice(list(b"ACGTN"), size=n, p=[0.24, 0.24, 0.24, 0.24, 0.04]).astype(np.uint8)
        )
        assert native_sketch(seq, w, k, rid=5, is_hpc=hpc) == sketch_sequence(
            seq, w, k, rid=5, is_hpc=hpc
        )


def test_native_chain_matches_oracle():
    from minimap2_rs_tpu.config import ChainParams, IndexParams
    from minimap2_rs_tpu.oracle.index import build_index
    from minimap2_rs_tpu.oracle.lchain import backtrack, chain_dp_scores
    from minimap2_rs_tpu.oracle.seeds import (
        build_anchors,
        collect_query_minimizers,
        filter_query_minimizers,
    )
    from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

    genome = random_genome(60_000, seed=11)
    idx = build_index([("g", genome)], IndexParams())
    cp = ChainParams.defaults_for_k(15)
    for name, s, *_ in simulate_reads(genome, 8, read_len=(300, 800), seed=12):
        mv = filter_query_minimizers(collect_query_minimizers(s, 10, 15), 10, 0.01)
        anchors = build_anchors(idx, mv, len(s), 50)
        fo, vo, po = chain_dp_scores(anchors, cp)
        fn, vn, pn = native_chain_dp(anchors, cp)
        np.testing.assert_array_equal(fo, fn)
        np.testing.assert_array_equal(vo, vn)
        np.testing.assert_array_equal(po, pn)
        co, so = backtrack(anchors, fo, vo, po, cp)
        cn, sn = native_backtrack(anchors, fo, vo, po, cp)
        assert co == cn and so == sn


def test_pure_python_paths_still_work(monkeypatch):
    """MM2T_NO_NATIVE must force the Python fallbacks end-to-end."""
    monkeypatch.setenv("MM2T_NO_NATIVE", "1")
    from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
    from minimap2_rs_tpu.oracle.index import build_index
    from minimap2_rs_tpu.oracle.pipeline import map_reads
    from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

    genome = random_genome(30_000, seed=13)
    idx = build_index([("g", genome)], IndexParams())
    reads = simulate_reads(genome, 3, read_len=(300, 500), seed=14)
    lines = map_reads(
        idx, [(n, s) for n, s, *_ in reads], ChainParams.defaults_for_k(15), MapParams()
    )
    assert len(lines) >= 2


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_native_build_pairs_matches_oracle_build():
    """The threaded C++ build (mm2t_build_pairs) must produce the exact
    flat index arrays of the host build: multi-sequence (incl. empty and
    N-rich rows), HPC, and multiple (w, k)."""
    import numpy as np

    from minimap2_rs_tpu.config import IndexParams
    from minimap2_rs_tpu.models.index_builder import build_index_native
    from minimap2_rs_tpu.oracle.index import build_index
    from minimap2_rs_tpu.utils.seqsim import random_genome

    recs = [
        ("a", random_genome(120_000, seed=1)),
        ("b", random_genome(40_000, seed=2)),
        ("empty", b""),
        ("n", b"ACGT" * 50 + b"N" * 30 + b"ACGTTGCA" * 1500),
    ]
    for flag, k, w in ((0, 15, 7), (1, 15, 7), (0, 13, 10), (0, 19, 5)):
        p = IndexParams(w=w, k=k, flag=flag)
        ref = build_index(recs, p)
        nat = build_index_native(recs, p)
        for a in ("keys", "starts", "counts", "positions", "S"):
            np.testing.assert_array_equal(
                getattr(ref, a), getattr(nat, a), err_msg=f"{a} flag={flag} k={k} w={w}"
            )


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_native_build_pairs_chunked_halo_exact():
    """Intra-sequence chunking with (w+k) halos must reproduce the
    whole-sequence scan's set (the device build's halo math)."""
    import numpy as np

    from minimap2_rs_tpu.oracle.index import _flatten, build_index
    from minimap2_rs_tpu.config import IndexParams
    from minimap2_rs_tpu.runtime.host import native_build_pairs
    from minimap2_rs_tpu.utils.packing import nt4_encode
    from minimap2_rs_tpu.utils.seqsim import random_genome

    g = random_genome(400_000, seed=3)
    ref = build_index([("c", g)], IndexParams())
    out = native_build_pairs(
        nt4_encode(g), np.array([0, len(g)], np.int64), 10, 15, False,
        chunk=1 << 15,  # force many chunks
    )
    assert out is not None
    fk, st, ct, pos = _flatten(out[0], out[1], presorted=True)
    np.testing.assert_array_equal(fk, ref.keys)
    np.testing.assert_array_equal(ct, ref.counts)
    np.testing.assert_array_equal(pos, ref.positions)


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_build_stage_times_recorded():
    """mm2t_build_index records per-stage seconds readable afterward
    (the large-bench outlier-attribution instrumentation)."""
    from minimap2_rs_tpu.config import IndexParams
    from minimap2_rs_tpu.models.index_builder import build_index_native
    from minimap2_rs_tpu.runtime.host import last_build_stage_s
    from minimap2_rs_tpu.utils.seqsim import random_genome

    g = random_genome(300_000, seed=11)
    build_index_native([("c", g)], IndexParams())
    st = last_build_stage_s()
    assert st is not None
    assert set(st) == {"scan", "pack", "sort", "flatten"}
    # scan + sort always run and take measurable time at 300 kb
    assert st["scan"] >= 0.0 and st["sort"] >= 0.0
    assert sum(st.values()) > 0.0
