"""Fuzz the monotone routing networks (ops/route.py) against numpy
oracles: stable compaction and monotone spread."""

import numpy as np
import jax.numpy as jnp

from minimap2_rs_tpu.ops.route import compact_left, spread_right


def test_compact_left_fuzz():
    rng = np.random.default_rng(0)
    for _ in range(40):
        B = int(rng.integers(1, 5))
        L = int(rng.integers(1, 130))
        mask = rng.random((B, L)) < rng.random()
        vals = rng.integers(0, 2**32, size=(B, L), dtype=np.uint64).astype(np.uint32)
        vals2 = rng.integers(-(2**31), 2**31, size=(B, L)).astype(np.int32)
        (o1, o2), live = compact_left(
            (jnp.asarray(vals), jnp.asarray(vals2)), jnp.asarray(mask)
        )
        o1, o2, live = np.asarray(o1), np.asarray(o2), np.asarray(live)
        for b in range(B):
            k = int(mask[b].sum())
            np.testing.assert_array_equal(o1[b, :k], vals[b, mask[b]])
            np.testing.assert_array_equal(o2[b, :k], vals2[b, mask[b]])
            assert live[b, :k].all() and not live[b, k:].any()
            # fills past the prefix
            assert (o1[b, k:] == 0xFFFFFFFF).all()
            assert (o2[b, k:] == -1).all()


def test_spread_right_fuzz():
    rng = np.random.default_rng(1)
    for _ in range(40):
        B = int(rng.integers(1, 5))
        L = int(rng.integers(2, 130))
        nsrc = int(rng.integers(0, L))
        # sources at the first nsrc slots with strictly increasing
        # destinations (the anchor-expansion shape), some past the end
        dests = np.sort(rng.choice(int(L * 1.3), size=nsrc, replace=False))
        dests = np.maximum(dests, np.arange(nsrc))  # dest >= slot
        live = np.zeros((B, L), bool)
        delta = np.zeros((B, L), np.int32)
        vals = np.zeros((B, L), np.uint32)
        for b in range(B):
            live[b, :nsrc] = True
            delta[b, :nsrc] = dests - np.arange(nsrc)
            vals[b, :nsrc] = rng.integers(0, 2**32, size=nsrc, dtype=np.uint64)
        (ov,), olive = spread_right(
            (jnp.asarray(vals),), jnp.asarray(live), jnp.asarray(delta),
            max_delta=int(L * 1.3) + 1,
        )
        ov, olive = np.asarray(ov), np.asarray(olive)
        for b in range(B):
            expect_live = np.zeros(L, bool)
            expect_vals = np.full(L, 0xFFFFFFFF, np.uint32)
            for k in range(nsrc):
                if dests[k] < L:
                    expect_live[dests[k]] = True
                    expect_vals[dests[k]] = vals[b, k]
            np.testing.assert_array_equal(olive[b], expect_live)
            np.testing.assert_array_equal(
                ov[b][expect_live], expect_vals[expect_live]
            )
