"""Benchmark: batched short-read mapping throughput on one chip.

BASELINE.json config 3: simulated 500bp-1kb reads vs a reference genome,
replicated index, single chip. Headline metric: aligned read-bp/s/chip
(target >= 10M, BASELINE.md). Prints exactly one JSON line.

Usage: python bench.py [--reads N] [--genome-mb MB] [--no-jit-cache]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=16384)
    ap.add_argument("--genome-mb", type=float, default=5.0)
    ap.add_argument("--batch-size", type=int, default=4096)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mm2t_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import numpy as np

    from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
    from minimap2_rs_tpu.models.mapper import Mapper
    from minimap2_rs_tpu.oracle.index import build_index
    from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

    def log(*a):
        if args.verbose:
            print(*a, file=sys.stderr, flush=True)

    glen = int(args.genome_mb * 1e6)
    t0 = time.time()
    genome = random_genome(glen, seed=0)
    idx = build_index([("chrB", genome)], IndexParams())
    log(f"index build (host): {time.time()-t0:.1f}s, {idx.keys.shape[0]} keys")

    reads = simulate_reads(genome, args.reads, read_len=(500, 1000), seed=1)
    rl = [(n, s) for n, s, *_ in reads]
    total_bp = sum(len(s) for _, s in rl)

    cp = ChainParams.defaults_for_k(15)
    mp = MapParams()
    mapper = Mapper.from_oracle_index(idx, cp, mp, batch_size=args.batch_size)

    # warmup: compile + cache every shape the measured run will use
    # (tier-2 overflow shapes included), then measure steady-state
    t0 = time.time()
    mapper.map_reads(rl)
    log(f"warmup (compile): {time.time()-t0:.1f}s")

    # median of 3 measured passes as the headline (a single pass is ~15%
    # noisy through the shared TPU relay; min would systematically report
    # the luckiest pass)
    times = []
    for _ in range(3):
        t0 = time.time()
        lines = mapper.map_reads(rl)
        times.append(time.time() - t0)
    dt = sorted(times)[1]
    log(f"mapped {len(rl)} reads ({total_bp} bp) in {dt:.2f}s "
        f"(passes: {[round(t, 2) for t in times]}) -> {len(lines)} records")

    # only count reads that produced a mapping as "aligned"
    mapped_names = {l.split("\t", 1)[0] for l in lines}
    aligned_bp = sum(len(s) for n, s in rl if n in mapped_names)
    value = aligned_bp / dt
    target = 1e7  # BASELINE.md: >= 10M aligned read-bp/s/chip
    print(json.dumps({
        "metric": "aligned_read_bp_per_s_per_chip",
        "value": round(value, 1),
        "unit": "bp/s",
        "vs_baseline": round(value / target, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
