"""Diagnose the long-read path: per-stage breakdown + per-bucket counts.

Reproduces bench.py section 4 (512 reads of 5-20 kb vs the 5 Mbp
genome) and prints the Mapper stats, queue populations, and wall time
so the 20.4 -> 9.09 M bp/s r4 regression is attributable.
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mm2t_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
from minimap2_rs_tpu.models.index_builder import build_index_native
from minimap2_rs_tpu.models.mapper import Mapper
from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    glen = 5_000_000
    genome = random_genome(glen, seed=0)
    idx = build_index_native([("chrB", genome)], IndexParams())
    cp = ChainParams.defaults_for_k(15)
    mp = MapParams()
    mapper = Mapper.from_oracle_index(idx, cp, mp, batch_size=8192)

    lreads = simulate_reads(genome, n, read_len=(5000, 20000), seed=3)
    lrl = [(nm, s) for nm, s, *_ in lreads]
    total_bp = sum(len(s) for _, s in lrl)

    # bucket populations + shapes
    from collections import Counter
    buckets = Counter()
    for _, s in lrl:
        b = next(b for b in mapper.buckets if len(s) <= b)
        buckets[b] += 1
    print("bucket populations:", dict(sorted(buckets.items())))
    for b in sorted(buckets):
        M, A, window, B = mapper._shapes_for(b, 1)
        w_eff = min(window, mapper.lite_window_cap)
        print(f"  bucket {b}: M={M} A={A} window={window} "
              f"(lite cap -> {w_eff}) B={B} dual_band={mapper._dual_band(A)}")

    t0 = time.time()
    mapper.map_reads(lrl)  # warmup
    print(f"warmup: {time.time()-t0:.1f}s")

    for p in range(3):
        mapper.stats = {}
        t0 = time.time()
        lines = mapper.map_reads(lrl)
        dt = time.time() - t0
        lnames = {l.split("\t", 1)[0] for l in lines}
        l_bp = sum(len(s) for nm, s in lrl if nm in lnames)
        print(f"pass {p}: {dt:.3f}s  {l_bp/dt/1e6:.2f} Mbp/s  "
              f"({len(lines)} lines, {l_bp}/{total_bp} bp mapped)")
        print("  stats:", {k: (round(v, 4) if isinstance(v, float) else v)
                           for k, v in sorted(mapper.stats.items())})


if __name__ == "__main__":
    main()
