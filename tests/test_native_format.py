"""A/B parity: the native batch formatter + encoder (mm2t_format_lite,
mm2t_encode_pack4) must be byte-identical to the pure-Python paths."""

import os

import numpy as np
import pytest

from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
from minimap2_rs_tpu.models.mapper import Mapper
from minimap2_rs_tpu.oracle.index import build_index
from minimap2_rs_tpu.runtime.host import native_available, native_encode_pack4
from minimap2_rs_tpu.utils.packing import nt4_encode
from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_native_encode_pack4_matches_numpy():
    rng = np.random.default_rng(5)
    seqs = []
    for _ in range(17):
        n = int(rng.integers(0, 200))
        s = rng.choice(list(b"ACGTNacgtnxX"), size=n)
        seqs.append(bytes(s.astype(np.uint8)))
    Lp = 128
    out = native_encode_pack4(seqs, Lp)
    assert out is not None and out.shape == (len(seqs), Lp)
    for i, s in enumerate(seqs):
        codes = np.full(2 * Lp, 4, dtype=np.uint8)
        codes[: len(s)] = nt4_encode(s)
        expect = codes[0::2] | (codes[1::2] << 4)
        np.testing.assert_array_equal(out[i], expect)


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_native_format_lite_byte_identical():
    genome = random_genome(250_000, seed=11)
    idx = build_index(
        [("chrA", genome), ("b" * 40, genome[:90_000])], IndexParams()
    )
    reads = simulate_reads(genome, 192, read_len=(200, 900), seed=12)
    rl = [(n, s) for n, s, *_ in reads] + [("empty", b""), ("tiny", b"ACG")]
    # non-ASCII name: byte offsets from the C formatter must slice bytes,
    # not a latin-1-decoded string
    rl[0] = ("señal-α", rl[0][1])
    cp = ChainParams.defaults_for_k(15)
    mp = MapParams()

    m1 = Mapper.from_oracle_index(idx, cp, mp, batch_size=128)
    lines_native = m1.map_reads(rl)

    os.environ["MM2T_NO_NATIVE"] = "1"
    try:
        m2 = Mapper.from_oracle_index(idx, cp, mp, batch_size=128)
        lines_python = m2.map_reads(rl)
    finally:
        del os.environ["MM2T_NO_NATIVE"]

    assert lines_native == lines_python
    assert len(lines_native) >= 150  # most simulated reads map
