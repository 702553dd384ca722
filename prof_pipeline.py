"""Headline-pass pipelining experiment: pass wall time vs reads-per-call.

The r4 design note says "big calls amortize the relay sync" (2 calls per
16k-read pass). But dispatches are async: while the drain blocks on
batch i's result, batches i+1.. keep computing — so MORE, SMALLER calls
could hide sync+D2H latency behind compute, IF the relay pipelines
concurrent work. This measures the real curve.
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mm2t_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
from minimap2_rs_tpu.models.index_builder import build_index_native
from minimap2_rs_tpu.models.mapper import Mapper
from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8192, 4096, 2048, 1024]
    genome = random_genome(5_000_000, seed=0)
    idx = build_index_native([("chrB", genome)], IndexParams())
    reads = simulate_reads(genome, 16384, read_len=(500, 1000), seed=1)
    rl = [(n, s) for n, s, *_ in reads]
    total_bp = sum(len(s) for _, s in rl)
    cp = ChainParams.defaults_for_k(15)
    mp = MapParams()

    for bs in sizes:
        mapper = Mapper.from_oracle_index(idx, cp, mp, batch_size=bs)
        mapper.map_reads_paf(rl)  # compile + warm
        times = []
        for _ in range(5):
            mapper.stats = {}
            t0 = time.time()
            mapper.map_reads_paf(rl)
            times.append(time.time() - t0)
        times.sort()
        med = times[2]
        st = {k: round(v, 3) for k, v in mapper.stats.items()
              if isinstance(v, float)}
        print(f"batch={bs:5d}: median {med*1e3:6.1f} ms "
              f"({total_bp/med/1e6:5.1f} M bp/s)  passes "
              f"{[round(t*1e3) for t in times]}  stats {st}", flush=True)


if __name__ == "__main__":
    main()
