"""Direct-mapped-table planner regimes (VERDICT r1 weak item 5): the
large-genome behaviors — byte-cap fallback to two-gather lookups, compact
vs wide entries, layout feasibility at realistic distinct-key scales —
exercised without building multi-GB tables (the cap is shrunk instead)."""

import functools

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from minimap2_rs_tpu.ops import index_ops
from minimap2_rs_tpu.ops import u64
from minimap2_rs_tpu.ops.index_ops import (
    DeviceIndex,
    choose_direct_layout,
    fill_direct_table,
    index_lookup,
)

KEY_BITS = 30  # 2k for k=15


def _synth_index(n_keys, seed, key_bits=KEY_BITS):
    rng = np.random.default_rng(seed)
    keys = np.unique(
        rng.integers(0, 1 << key_bits, size=n_keys, dtype=np.uint64)
    )
    counts = rng.integers(1, 4, size=keys.shape[0]).astype(np.int64)
    starts = np.zeros_like(counts)
    np.cumsum(counts[:-1], out=starts[1:])
    positions = rng.integers(0, 1 << 40, size=int(counts.sum()), dtype=np.uint64)
    return keys, starts, counts, positions


def _check_lookups(dev, keys, starts, counts, positions, seed):
    rng = np.random.default_rng(seed)
    present = keys[rng.integers(0, len(keys), size=64)]
    absent = np.setdiff1d(
        rng.integers(0, 1 << KEY_BITS, size=64, dtype=np.uint64), keys
    )
    q = np.concatenate([present, absent])
    qp = u64.U64Pair(
        jnp.asarray((q >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((q & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )
    start, count = map(np.asarray, index_lookup(dev, qp))
    # compare the position CONTENT the (start, count) block addresses in
    # the device's resident planes — the fused dm layout stores the
    # positions bucket-grouped, so raw starts differ from the host's
    # key-sorted layout by a permutation while the addressed block must
    # hold exactly the same values in the same order
    dev_pos = (
        np.asarray(dev.pos[0]).astype(np.uint64) << np.uint64(32)
    ) | np.asarray(dev.pos[1]).astype(np.uint64)
    pos_map = {int(k): (int(s), int(c)) for k, s, c in zip(keys, starts, counts)}
    for i, key in enumerate(q):
        want = pos_map.get(int(key))
        if want is None:
            assert count[i] == 0, (i, key)
        else:
            s0, c0 = want
            assert count[i] == c0, (i, key)
            np.testing.assert_array_equal(
                dev_pos[start[i] : start[i] + c0],
                positions[s0 : s0 + c0],
                err_msg=f"query {i} key {key}",
            )


def test_byte_cap_fallback_two_gather(monkeypatch):
    """Over-cap genomes must fall back to the kv+prefix two-gather path
    with identical lookup results (index_ops.py:186 regime)."""
    keys, starts, counts, positions = _synth_index(50_000, seed=1)
    monkeypatch.setattr(
        index_ops, "plan_direct_layout",
        functools.partial(index_ops.plan_direct_layout, byte_cap=1 << 12),
    )
    dev = DeviceIndex.from_host(keys, starts, counts, positions, key_bits=KEY_BITS)
    assert dev.dm_slots == 0  # planner refused: fallback tables resident
    assert dev.kv.shape[0] > 1
    _check_lookups(dev, keys, starts, counts, positions, seed=2)


def test_exact_cap_layout_returns_none():
    """A candidate landing EXACTLY on byte_cap is infeasible (the cap is
    strict); the planner must return None — not raise — when no layout
    sits strictly below it (ADVICE r4: the feasibility accumulator used
    <= while the final filter used <, so min() crashed on empty feas)."""
    keys = np.arange(1 << 15, dtype=np.uint64)
    # every candidate table is a power-of-two byte size, so a
    # power-of-two cap is exactly reachable
    assert choose_direct_layout([keys], 28, 1, byte_cap=1 << 20) is None


def test_direct_layouts_across_scales():
    """Layouts stay feasible and correct from small to large-genome
    distinct-key counts (512k keys ~ a 3 Mbp-distinct regime; the table
    construction is identical at 28M keys, only p grows)."""
    for n, seed in ((1_000, 3), (60_000, 4), (512_000, 5)):
        keys, starts, counts, positions = _synth_index(n, seed)
        layout = choose_direct_layout([keys], KEY_BITS, int(counts.max()))
        assert layout is not None
        p, S, entry = layout
        assert entry in (2, 4)
        assert (1 << p) * S * entry * 4 <= index_ops._DM_BYTE_CAP
        dev = DeviceIndex.from_host(
            keys, starts, counts, positions, key_bits=KEY_BITS
        )
        # from_host upgrades compact 2-word layouts to the fused
        # single-gather layout (entry sentinel 3)
        assert dev.dm_slots == S and dev.dm_bits == p
        assert dev.dm_entry == (3 if entry == 2 else entry)
        _check_lookups(dev, keys, starts, counts, positions, seed=seed + 10)


def test_wide_entry_regime():
    """When a count cannot share a u32 with the key fingerprint the
    planner must pick 4-word entries (the repetitive-genome regime)."""
    keys, starts, counts, positions = _synth_index(5_000, seed=6)
    big = int(counts.sum())  # force one huge occurrence count
    counts = counts.copy()
    counts[0] = 1 << 24
    layout = choose_direct_layout([keys], KEY_BITS, int(counts.max()))
    assert layout is not None
    p, S, entry = layout
    fp_bits = KEY_BITS - p
    if fp_bits > 0:
        assert entry == 4 or counts.max() < (1 << (32 - fp_bits))


def test_sharded_cap_fallback(monkeypatch):
    """The hash-range-sharded builder under an over-cap layout keeps the
    per-shard two-gather fallback working."""
    from minimap2_rs_tpu.parallel.sharded_index import ShardedDeviceIndex

    keys, starts, counts, positions = _synth_index(40_000, seed=7)
    monkeypatch.setattr(
        index_ops, "choose_direct_layout",
        functools.partial(choose_direct_layout, byte_cap=1 << 12),
    )
    sidx = ShardedDeviceIndex.from_host(
        keys, starts, counts, positions, n_shards=2, key_bits=KEY_BITS
    )
    assert sidx.dm_slots == 0
    # each shard's local() view must still answer lookups correctly
    bounds = [0, round(len(keys) / 2), len(keys)]
    for s in range(2):
        ks = keys[bounds[s]:bounds[s + 1]]
        st = starts[bounds[s]:bounds[s + 1]]
        ct = counts[bounds[s]:bounds[s + 1]]
        p_lo = int(st[0]) if len(st) else 0
        local = DeviceIndex(
            kv=sidx.kv[s], pos=sidx.pos[s], prefix=sidx.prefix[s],
            dm=None, prefix_shift=sidx.prefix_shift,
            bucket_slots=sidx.bucket_slots, n_keys=sidx.n_keys_local,
        )
        qp = u64.U64Pair(
            jnp.asarray((ks[:64] >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((ks[:64] & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        )
        start, count = map(np.asarray, index_lookup(local, qp))
        np.testing.assert_array_equal(count, ct[:64])
        np.testing.assert_array_equal(start, st[:64] - p_lo)
