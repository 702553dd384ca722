"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md section 4.3):
data-parallel mapping, the hash-range-sharded index with all_to_all anchor
exchange, and the psum stats reduction."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_eight_virtual_devices():
    assert len(jax.devices()) >= 8
    assert jax.devices()[0].platform == "cpu"


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g
    from minimap2_rs_tpu.models.mapper import _unpack_map_stage

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    unpacked = _unpack_map_stage(np.asarray(out), M=64, A=128)
    assert int(unpacked["n_anchors"].sum()) > 0


def test_sharded_index_roundtrip():
    from minimap2_rs_tpu.config import IndexParams
    from minimap2_rs_tpu.oracle.index import build_index
    from minimap2_rs_tpu.parallel.sharded_index import ShardedDeviceIndex
    from minimap2_rs_tpu.utils.seqsim import random_genome

    idx = build_index([("g", random_genome(20_000, seed=2))], IndexParams(w=5, k=11))
    sidx = ShardedDeviceIndex.from_host(
        idx.keys, idx.starts, idx.counts, idx.positions, n_shards=4
    )
    # every key appears in exactly one shard; totals match
    kh = np.asarray(sidx.keys_hi)
    kl = np.asarray(sidx.keys_lo)
    ct = np.asarray(sidx.counts)
    valid = (kh != 0xFFFFFFFF) | (kl != 0xFFFFFFFF)
    assert valid.sum() == idx.keys.shape[0]
    assert ct[valid].sum() == idx.positions.shape[0]
    recon = np.sort(
        (kh[valid].astype(np.uint64) << np.uint64(32)) | kl[valid].astype(np.uint64)
    )
    np.testing.assert_array_equal(recon, idx.keys)
    # per-shard keys sorted and ranges disjoint and increasing
    prev_max = -1
    for s in range(4):
        v = valid[s]
        if not v.any():
            continue
        ks = (kh[s, v].astype(np.uint64) << np.uint64(32)) | kl[s, v].astype(np.uint64)
        assert np.all(np.diff(ks.astype(np.int64)) > 0) or ks.shape[0] == 1
        assert int(ks[0]) > prev_max
        prev_max = int(ks[-1])
