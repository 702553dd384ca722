"""Wire-format parity: the 2-bit H2D codes wire (with N exceptions and
the per-batch 4-bit fallback) and the 10-word D2H field wire must be
bit-transparent — same PAF bytes as the 4-bit wire and the host oracle."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
from minimap2_rs_tpu.models.index_builder import build_index_native
from minimap2_rs_tpu.models.mapper import Mapper
from minimap2_rs_tpu.oracle.pipeline import map_reads as oracle_map
from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads


def _reads_with_ns(genome, n, seed):
    """Simulated reads, every third one carrying an N run (ambiguous
    bases exercise the 2-bit wire's exception scatter)."""
    rng = np.random.default_rng(seed)
    reads = simulate_reads(genome, n, read_len=(300, 600), seed=seed)
    out = []
    for i, (name, s, *_r) in enumerate(reads):
        s = bytearray(s)
        if i % 3 == 0:
            p = int(rng.integers(10, max(11, len(s) - 20)))
            s[p : p + 5] = b"NNNNN"
        out.append((name, bytes(s)))
    return out


def test_wire2_matches_wire4_and_oracle():
    genome = random_genome(120_000, seed=3)
    idx = build_index_native([("chrW", genome)], IndexParams())
    cp = ChainParams.defaults_for_k(15)
    mp = MapParams()
    rl = _reads_with_ns(genome, 48, seed=5)
    m2 = Mapper.from_oracle_index(idx, cp, mp)
    m4 = Mapper.from_oracle_index(idx, cp, mp, wire2=False)
    out2 = m2.map_reads(rl)
    assert out2 == m4.map_reads(rl)
    assert out2 == oracle_map(idx, rl, cp, mp)


def test_wire2_exception_overflow_falls_back(monkeypatch):
    """A batch with more ambiguous bases than the exception capacity
    must fall back to the 4-bit wire, not truncate."""
    import minimap2_rs_tpu.models.mapper as mod

    monkeypatch.setattr(mod, "_NEX_CAP", 2)
    genome = random_genome(60_000, seed=7)
    idx = build_index_native([("chrX", genome)], IndexParams())
    cp = ChainParams.defaults_for_k(15)
    rl = _reads_with_ns(genome, 16, seed=9)
    m = Mapper.from_oracle_index(idx, cp, MapParams())
    assert m.map_reads(rl) == oracle_map(idx, rl, cp, MapParams())


def test_fields_wire_roundtrip():
    """pack_fields_wire/unpack_fields_wire over the full documented
    field ranges (n_match rides as a copy of cm)."""
    from minimap2_rs_tpu.ops.finalize_ops import (
        FIELDS,
        WIRE_WORDS,
        pack_fields_wire,
        unpack_fields_wire,
        wire_packable,
    )

    assert wire_packable(47232, 57728)
    assert not wire_packable(1 << 16, 128)
    rng = np.random.default_rng(1)
    B = 256
    f = np.zeros((B, len(FIELDS)), np.int32)
    col = {n: i for i, n in enumerate(FIELDS)}
    f[:, col["score"]] = rng.integers(-(2**30), 2**17, B)
    for n in ("qs", "qe"):
        f[:, col[n]] = rng.integers(0, 65537, B)
    for n in ("ts", "te"):
        f[:, col[n]] = rng.integers(0, 2**31 - 1, B)
    f[:, col["grp"]] = rng.integers(-(2**31), 2**31 - 1, B)
    for n in ("cm", "n_anchors", "n_mini", "st", "n_tot"):
        f[:, col[n]] = rng.integers(0, 2**16, B)
    f[:, col["n_match"]] = f[:, col["cm"]]
    for n in ("dv_found", "rescue", "mini_ovf", "anc_ovf", "win_ovf"):
        f[:, col[n]] = rng.integers(0, 2, B)
    f[:, col["sum_span"]] = rng.integers(0, 2**24, B)
    w = np.asarray(pack_fields_wire(jnp.asarray(f)))
    assert w.shape == (B, WIRE_WORDS)
    np.testing.assert_array_equal(unpack_fields_wire(w), f)
