"""Per-stage device timing at the HEADLINE shape (bucket 1024, B=8192,
M=256, A=192): cumulative chained-jit programs; stage cost = successive
difference. Answers VERDICT r4 weak item 2: where do the ~0.3 s of
unattributed device time per pass go?
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mm2t_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
from minimap2_rs_tpu.models.index_builder import build_index_native
from minimap2_rs_tpu.models.mapper import Mapper
from minimap2_rs_tpu.ops.chain_ops import chain_scalars_from_params
from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

I32 = jnp.int32
U32 = jnp.uint32


def median5(fn):
    ts = []
    for _ in range(5):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[2]


def main():
    genome = random_genome(5_000_000, seed=0)
    idx = build_index_native([("chrB", genome)], IndexParams())
    cp = ChainParams.defaults_for_k(15)
    mp = MapParams()
    mapper = Mapper.from_oracle_index(idx, cp, mp, batch_size=8192)
    dev_idx = mapper.dev_idx
    scal = chain_scalars_from_params(cp)

    reads = simulate_reads(genome, 8192, read_len=(500, 1000), seed=1)
    rl = [(n, s) for n, s, *_ in reads]
    bucket = 1024
    M, A, window, B = mapper._shapes_for(bucket, 1)
    print(f"shape: bucket={bucket} M={M} A={A} window={window} B={B}")

    from minimap2_rs_tpu.utils.packing import nt4_encode
    codes = np.full((B, bucket), 4, dtype=np.int32)
    lengths = np.zeros(B, dtype=np.int32)
    for i, (_, s) in enumerate(rl[:B]):
        codes[i, : len(s)] = nt4_encode(s)
        lengths[i] = len(s)
    d_codes = jnp.asarray(codes)
    d_len = jnp.asarray(lengths)

    from minimap2_rs_tpu.models.stages import sketch_to_anchors
    from minimap2_rs_tpu.ops.seeds_ops import (
        build_anchors_device, query_occ_filter, sort_minimizers_by_key,
    )
    from minimap2_rs_tpu.ops.sketch import compact_minimizers, sketch_positions
    from minimap2_rs_tpu.ops.index_ops import index_lookup
    from minimap2_rs_tpu.ops import u64
    from minimap2_rs_tpu.ops.u64 import U64Pair

    kw = dict(w=idx.w, k=idx.k, hpc=False)
    K = 2
    mid_occ = jnp.int32(mapper.mid_occ)

    def chain_calls(body):
        @jax.jit
        def fn(codes, lengths):
            acc = jnp.int32(0)
            c = codes
            for _ in range(K):
                r = body(c, lengths)
                acc = acc + r
                c = c + (r & 1)
            return acc
        return fn

    def b_sketch(c, l):
        ks, ps, emitted = sketch_positions(c, l, idx.w, idx.k, False)
        return jnp.sum(ks.lo.astype(I32)) + jnp.sum(emitted.astype(I32))

    def b_compact(c, l):
        ks, ps, emitted = sketch_positions(c, l, idx.w, idx.k, False)
        cks, cps, n_mini, ovf = compact_minimizers(ks, ps, emitted, M)
        return jnp.sum(cks.lo.astype(I32)) + jnp.sum(n_mini)

    def b_sort(c, l):
        ks, ps, emitted = sketch_positions(c, l, idx.w, idx.k, False)
        cks, cps, n_mini, ovf = compact_minimizers(ks, ps, emitted, M)
        sks, sps = sort_minimizers_by_key(cks, cps)
        return jnp.sum(sks.lo.astype(I32)) + jnp.sum(sps.astype(I32))

    def b_filter_lookup(c, l):
        ks, ps, emitted = sketch_positions(c, l, idx.w, idx.k, False)
        cks, cps, n_mini, ovf = compact_minimizers(ks, ps, emitted, M)
        sks, sps = sort_minimizers_by_key(cks, cps)
        keep = query_occ_filter(sks, n_mini, mp.q_occ_max, mp.q_occ_frac)
        keys = u64.shr(sks, 8)
        keys = u64.where(keep, keys, U64Pair(
            jnp.zeros_like(keys.hi), jnp.zeros_like(keys.lo)))
        start, count = index_lookup(dev_idx, keys)
        return jnp.sum(start.astype(I32)) + jnp.sum(count.astype(I32))

    def b_full(c, l):
        anc = sketch_to_anchors(
            dev_idx, c, l, mid_occ, M=M, A=A,
            q_occ_max=mp.q_occ_max, q_occ_frac=mp.q_occ_frac, **kw)
        return jnp.sum(anc["x_lo"].astype(I32)) + jnp.sum(anc["n_anchors"])

    @jax.jit
    def floor_fn(x):
        return jnp.sum(x)

    int(floor_fn(d_len))
    t_floor = median5(lambda: int(floor_fn(d_len)))
    print(f"sync floor: {t_floor*1e3:.1f} ms")

    results = {}
    for name, body in [("sketch", b_sketch), ("compact", b_compact),
                       ("minisort", b_sort), ("lookup", b_filter_lookup),
                       ("anchors_full", b_full)]:
        fn = chain_calls(body)
        int(fn(d_codes, d_len))
        t = (median5(lambda: int(fn(d_codes, d_len))) - t_floor) / K
        results[name] = t
        print(f"  cumulative {name:14s}: {t*1e3:7.1f} ms")

    # chain kernel at this shape, isolated (2 bands in the real pass)
    anc = jax.jit(lambda c, l: sketch_to_anchors(
        dev_idx, c, l, mid_occ, M=M, A=A,
        q_occ_max=mp.q_occ_max, q_occ_frac=mp.q_occ_frac, **kw))(
            d_codes, d_len)
    grp = jnp.asarray(np.asarray(anc["x_hi"]))
    rpos = jnp.asarray(np.asarray(anc["x_lo"]).astype(np.int32))
    qpos = jnp.asarray(np.asarray(anc["y_lo"]).astype(np.int32))
    span = jnp.asarray((np.asarray(anc["y_hi"]) & 0xFF).astype(np.int32))

    from minimap2_rs_tpu.ops.chain_pallas import chain_dp_aux_batch_pallas

    @jax.jit
    def chained_chain(grp, rpos, qpos, span):
        acc = jnp.int32(0)
        q = qpos
        for _ in range(K):
            f, cnt, sq, sr = chain_dp_aux_batch_pallas(
                grp, rpos, q, span, scal, window)
            acc = acc + jnp.sum(f)
            q = q + (f[:, :1] & 1)
        return acc

    int(chained_chain(grp, rpos, qpos, span))
    t_ch = (median5(lambda: int(chained_chain(grp, rpos, qpos, span)))
            - t_floor) / K
    print(f"  chain (1 band)       : {t_ch*1e3:7.1f} ms")

    # isolated sorts at the exact shapes for cross-check
    mk_hi = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 30, (B, M), dtype=np.uint32))
    mk_lo = jnp.asarray(np.random.default_rng(1).integers(
        0, 1 << 32, (B, M), dtype=np.uint32).astype(np.uint32))
    av = [jnp.asarray(np.random.default_rng(i).integers(
        0, 1 << 32, (B, A), dtype=np.uint32).astype(np.uint32))
        for i in range(3)]

    @jax.jit
    def sort2(hi, lo):
        acc = jnp.int32(0)
        h = hi
        for _ in range(K):
            a, b, c = jax.lax.sort((h, lo, lo), dimension=-1, num_keys=2)
            acc = acc + jnp.sum(a.astype(I32)) + jnp.sum(c.astype(I32))
            h = h + (a[:, :1] & 1)
        return acc

    @jax.jit
    def sort3(x, y, z):
        acc = jnp.int32(0)
        xx = x
        for _ in range(K):
            a, b, c = jax.lax.sort((xx, y, z), dimension=-1, num_keys=3)
            acc = acc + jnp.sum(a.astype(I32)) + jnp.sum(c.astype(I32))
            xx = xx + (a[:, :1] & 1)
        return acc

    int(sort2(mk_hi, mk_lo))
    t_s2 = (median5(lambda: int(sort2(mk_hi, mk_lo))) - t_floor) / K
    print(f"  isolated 2-key sort (B,M)=({B},{M}): {t_s2*1e3:7.1f} ms")
    int(sort3(*av))
    t_s3 = (median5(lambda: int(sort3(*av))) - t_floor) / K
    print(f"  isolated 3-key sort (B,A)=({B},{A}): {t_s3*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
