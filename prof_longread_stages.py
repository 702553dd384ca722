"""Split-jit stage timing at long-read shapes: sketch+sort+lookup vs
chain DP, at the current padded B vs a population-capped B.

Methodology (prof_sync.py / bench.py section 6): K data-dependent calls
inside one jit, one sync; per-call = (t_chained - t_floor) / K.
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
from minimap2_rs_tpu.models.mapper import Mapper, _NEX_CAP
from minimap2_rs_tpu.ops.chain_ops import chain_scalars_from_params
from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

I32 = jnp.int32


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

    @jax.jit
    def floor_fn(x):
        return jnp.sum(x)

    zero = jnp.zeros((8, 128), I32)
    int(floor_fn(zero))
    t_floor = median5(lambda: int(floor_fn(zero)))
    print(f"sync floor: {t_floor*1e3:.1f} ms")

    lreads = simulate_reads(genome, 512, read_len=(5000, 20000), seed=3)
    lrl = [(nm, s) for nm, s, *_ in lreads]
    groups: dict[int, list[bytes]] = {}
    for _, s in lrl:
        b = next(b for b in mapper.buckets if len(s) <= b)
        groups.setdefault(b, []).append(s)

    K = 2
    from minimap2_rs_tpu.models.stages import (
        sketch_compact_filter, lookup_expand, sketch_to_anchors,
    )
    from minimap2_rs_tpu.ops.chain_pallas import chain_dp_aux_batch_pallas

    for bucket in (8192, 24576):
        seqs = groups[bucket]
        M, A, window, B_full = mapper._shapes_for(bucket, 1)
        window = min(window, mapper.lite_window_cap)
        B_cap = max(128, -(-len(seqs) // 128) * 128)
        print(f"\nbucket {bucket}: {len(seqs)} reads, M={M} A={A} "
              f"window={window} B_full={B_full} B_cap={B_cap}")
        for B in (B_full, B_cap):
            codes = np.full((B, bucket), 4, dtype=np.int32)
            lengths = np.zeros(B, dtype=np.int32)
            from minimap2_rs_tpu.utils.packing import nt4_encode
            for i, s in enumerate(seqs):
                codes[i, : len(s)] = nt4_encode(s)
                lengths[i] = len(s)
            d_codes = jnp.asarray(codes)
            d_len = jnp.asarray(lengths)

            kw = dict(w=idx.w, k=idx.k, hpc=False, q_occ_max=mp.q_occ_max,
                      q_occ_frac=mp.q_occ_frac, M=M)

            @jax.jit
            def chained_sketch(codes, lengths):
                acc = jnp.int32(0)
                c = codes
                for _ in range(K):
                    mini = sketch_compact_filter(c, lengths, **kw)
                    acc = acc + jnp.sum(mini["sks_lo"].astype(I32))
                    c = c + (mini["n_mini"][:, None] & 1)
                return acc

            @jax.jit
            def chained_full(codes, lengths):
                acc = jnp.int32(0)
                c = codes
                for _ in range(K):
                    anc = sketch_to_anchors(
                        dev_idx, c, lengths, jnp.int32(mapper.mid_occ),
                        A=A, **kw)
                    acc = acc + jnp.sum(anc["x_lo"].astype(I32))
                    c = c + (anc["n_anchors"][:, None] & 1)
                return acc

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

            # real anchors for the chain timing
            anc = jax.jit(
                lambda c, l: sketch_to_anchors(
                    dev_idx, c, l, jnp.int32(mapper.mid_occ), A=A, **kw)
            )(d_codes, d_len)
            grp = jnp.asarray(np.asarray(anc["x_hi"]))
            rpos = jnp.asarray(np.asarray(anc["x_lo"]).astype(np.int32))
            qpos = jnp.asarray(np.asarray(anc["y_lo"]).astype(np.int32))
            span = jnp.asarray(
                (np.asarray(anc["y_hi"]) & 0xFF).astype(np.int32))

            int(chained_sketch(d_codes, d_len))
            t_sk = (median5(lambda: int(chained_sketch(d_codes, d_len)))
                    - t_floor) / K
            int(chained_full(d_codes, d_len))
            t_fl = (median5(lambda: int(chained_full(d_codes, d_len)))
                    - t_floor) / K
            int(chained_chain(grp, rpos, qpos, span))
            t_ch = (median5(lambda: int(chained_chain(grp, rpos, qpos, span)))
                    - t_floor) / K
            print(f"  B={B}: sketch+sort+filter {t_sk*1e3:7.1f} ms | "
                  f"+lookup+expand+ancsort {t_fl*1e3:7.1f} ms | "
                  f"chain(1 band) {t_ch*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
