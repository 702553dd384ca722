"""Cross-implementation validation of the MMI/PAF parity claims
(VERDICT r1 item 4).

No Rust toolchain or network exists in this environment, so the reference
binary cannot be built; the strongest available gate is two INDEPENDENT
transcriptions agreeing:

  * the Python MMI writer (oracle/index.py, from index.rs:233-307) is
    parsed by a separate C++ transcription of the loader
    (mm2t_mmi_selfcheck, from index.rs:361-424), which re-sketches the
    embedded packed sequences with the independent C++ exact scan and
    compares minimizer sets — a transcription error in either language
    fails the check unless the same mistake was made twice;
  * committed golden fixtures (tests/golden/) pin the exact bytes of a
    known-good .mmi and the PAF output of a fixed corpus, so any future
    regression in serialization, sketching, chaining or formatting is a
    byte diff.
"""

import os

import numpy as np
import pytest

from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
from minimap2_rs_tpu.io.fasta import read_fasta
from minimap2_rs_tpu.oracle.index import OracleIndex, build_index
from minimap2_rs_tpu.oracle.pipeline import map_reads
from minimap2_rs_tpu.runtime.host import native_available, native_mmi_selfcheck
from minimap2_rs_tpu.utils.seqsim import random_genome

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def _gold(name):
    return os.path.join(GOLD, name)


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
@pytest.mark.parametrize("k,w,flag", [(15, 10, 0), (13, 5, 1), (14, 6, 0), (11, 1, 0)])
def test_native_selfcheck_accepts_oracle_mmi(tmp_path, k, w, flag):
    recs = [
        ("chr1", random_genome(25_000, seed=31)),
        ("c2", random_genome(9_000, seed=32)),
        ("empty", b""),
    ]
    idx = build_index(recs, IndexParams(w=w, k=k, flag=flag))
    p = tmp_path / "x.mmi"
    idx.save_to_mmi(str(p))
    assert native_mmi_selfcheck(str(p)) == 0


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_native_selfcheck_rejects_corruption(tmp_path):
    idx = build_index([("c", random_genome(20_000, seed=33))], IndexParams(w=5, k=15))
    p = tmp_path / "x.mmi"
    idx.save_to_mmi(str(p))
    data = bytearray(p.read_bytes())
    # flip one bit in each section: header, hash table, packed tail
    for off in (9, len(data) // 2, len(data) - 3):
        d = bytearray(data)
        d[off] ^= 0x10
        assert native_mmi_selfcheck(bytes(d)) != 0, off


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_native_selfcheck_accepts_device_built_index(tmp_path):
    jax = pytest.importorskip("jax")
    from minimap2_rs_tpu.models.index_builder import build_index_device

    recs = [("chrD", random_genome(40_000, seed=34))]
    idx = build_index_device(recs, IndexParams(w=10, k=15))
    p = tmp_path / "d.mmi"
    idx.save_to_mmi(str(p))
    assert native_mmi_selfcheck(str(p)) == 0


def test_golden_mmi_bytes_stable(tmp_path):
    """Rebuilding the index from the committed reference FASTA must
    reproduce the committed .mmi byte-for-byte."""
    recs = read_fasta(_gold("golden_refs.fa"))
    idx = build_index(recs, IndexParams(w=10, k=15))
    p = tmp_path / "re.mmi"
    idx.save_to_mmi(str(p))
    assert p.read_bytes() == open(_gold("golden_w10k15.mmi"), "rb").read()


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_golden_mmi_passes_native_selfcheck():
    assert native_mmi_selfcheck(_gold("golden_w10k15.mmi")) == 0


def test_golden_mmi_roundtrip_and_paf_stable():
    """Loading the committed .mmi and mapping the committed reads must
    reproduce the committed PAF byte-for-byte (oracle pipeline)."""
    idx = OracleIndex.load_from_mmi(_gold("golden_w10k15.mmi"))
    reads = read_fasta(_gold("golden_reads.fa"))
    rl = [(n, s) for n, s in reads]
    lines = map_reads(idx, rl, ChainParams.defaults_for_k(15), MapParams())
    want = open(_gold("golden_w10k15.paf")).read().splitlines()
    assert lines == want
