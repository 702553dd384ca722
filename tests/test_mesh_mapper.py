"""End-to-end multi-device mapping parity: MeshMapper's PAF output over
the virtual 8-device CPU mesh must be byte-identical to the host oracle
and to the single-device Mapper, in BOTH mesh modes (replicated-index
data-parallel, and hash-range-sharded index with all_to_all anchor
exchange). SURVEY.md section 2 parallelism table; the BASELINE scaling
configs' correctness leg."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax

from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
from minimap2_rs_tpu.models.mapper import Mapper
from minimap2_rs_tpu.models.mesh_mapper import MeshMapper
from minimap2_rs_tpu.oracle.index import build_index
from minimap2_rs_tpu.oracle.pipeline import map_reads
from minimap2_rs_tpu.parallel.mesh import make_mesh
from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

W, K = 5, 11

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device CPU mesh"
)


@pytest.fixture(scope="module")
def setup():
    genome = random_genome(60_000, seed=11)
    idx = build_index([("chrM", genome)], IndexParams(w=W, k=K))
    cp = ChainParams.defaults_for_k(K)
    mp = MapParams()
    reads = simulate_reads(genome, 21, read_len=(150, 450), seed=13)
    rl = [(n, s) for n, s, *_ in reads]
    # stress every host branch: junk, empty, reverse strand
    rng = np.random.default_rng(5)
    rl.append(("junk", bytes(rng.choice(list(b"ACGT"), size=300).astype(np.uint8))))
    rl.append(("empty", b""))
    from minimap2_rs_tpu.utils.seqsim import revcomp

    rl.append(("rc", revcomp(genome[7000:7400])))
    host = map_reads(idx, rl, cp, mp)
    return genome, idx, cp, mp, rl, host


MKW = dict(buckets=(256, 512), batch_size=8, mini_frac=0.6, anchor_frac=1.0)


def test_mesh_dp_replicated_parity(setup):
    genome, idx, cp, mp, rl, host = setup
    mesh = make_mesh(dp=8, ix=1)
    mm = MeshMapper.from_oracle_index(idx, cp, mp, mesh=mesh, **MKW)
    assert mm.map_reads(rl) == host


def test_mesh_sharded_index_parity(setup):
    genome, idx, cp, mp, rl, host = setup
    mesh = make_mesh(dp=2, ix=4)
    mm = MeshMapper.from_oracle_index(
        idx, cp, mp, mesh=mesh, index_sharded=True, **MKW
    )
    assert mm.map_reads(rl) == host


def test_mesh_matches_single_device(setup):
    """dp=1 mesh output == plain single-device Mapper output, byte for
    byte (same programs modulo shard_map)."""
    genome, idx, cp, mp, rl, host = setup
    single = Mapper.from_oracle_index(idx, cp, mp, **MKW)
    mesh = make_mesh(dp=1, ix=1)
    mm = MeshMapper.from_oracle_index(idx, cp, mp, mesh=mesh, **MKW)
    assert mm.map_reads(rl) == single.map_reads(rl) == host


def test_mesh_sharded_collective_stats(setup):
    """calc_mid_occ as a psum binary search must equal the host quantile
    (index.rs:124-141)."""
    genome, idx, cp, mp, rl, host = setup
    from minimap2_rs_tpu.parallel.pipeline import calc_mid_occ_psum, index_stats_psum
    from minimap2_rs_tpu.parallel.sharded_index import ShardedDeviceIndex

    mesh = make_mesh(dp=2, ix=4)
    sidx = ShardedDeviceIndex.from_host(
        idx.keys, idx.starts, idx.counts, idx.positions, n_shards=4,
        key_bits=2 * K,
    )
    nk, npos = index_stats_psum(mesh, sidx)
    assert nk == int(idx.keys.shape[0])
    assert npos == int(idx.positions.shape[0])
    for frac in (2e-4, 0.01, 0.5):
        assert calc_mid_occ_psum(mesh, sidx, frac) == idx.calc_mid_occ(frac)


def test_mesh_longer_reads_sharded(setup):
    """Bucket crossing + rescue-band switching through the sharded mesh."""
    genome, idx, cp, mp, _, _ = setup
    mesh = make_mesh(dp=2, ix=2)
    mm = MeshMapper.from_oracle_index(
        idx, cp, mp, mesh=mesh, index_sharded=True,
        buckets=(512, 2048), batch_size=8, mini_frac=0.6, anchor_frac=1.0,
    )
    reads = simulate_reads(genome, 8, read_len=(900, 2000), seed=29)
    rl = [(n, s) for n, s, *_ in reads]
    host = map_reads(idx, rl, cp, mp)
    dev = mm.map_reads(rl)
    # same tolerance as the single-device long-read gate: the reference's
    # max_chain_skip pruning can concede a few s1 points to the exact DP
    assert len(dev) == len(host)
    for d, h in zip(dev, host):
        df, hf = d.split("\t"), h.split("\t")
        assert df[:12] == hf[:12] and df[13] == hf[13]
        ds1 = int(df[14].split(":")[-1]); hs1 = int(hf[14].split(":")[-1])
        assert hs1 <= ds1 <= hs1 + 16
