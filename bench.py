"""Benchmark + hardware parity gate: batched mapping throughput on one chip.

Sections (all emitted in ONE JSON line):
  1. headline — BASELINE.json config 3: simulated 500bp-1kb reads vs a
     reference genome, replicated index, single chip. Metric:
     aligned read-bp/s/chip (target >= 10M, BASELINE.md).
  2. parity — a read subsample is ALSO mapped by the reference-faithful
     host oracle and every PAF byte compared. On real TPU this is the
     only place the Mosaic-compiled Pallas chain kernels run, so the
     bench FAILS (nonzero exit) on any divergence.
  3. index_build — device index-build throughput in bp/s; vs_baseline
     anchors to C minimap2's 278 Mbp / 7.87 s (BASELINE.md row 2).
  4. longread — ONT-style 5-20 kb reads, aligned bp/s.
  5. large — (unless --skip-large) 100 Mbp genome: device index build +
     a mapping sample, exercising the direct-mapped table's large-genome
     planner regimes.

Usage: python bench.py [--reads N] [--genome-mb MB] [--skip-large] ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _median3(fn):
    times = []
    out = None
    for _ in range(3):
        t0 = time.time()
        out = fn()
        times.append(time.time() - t0)
    return sorted(times)[1], out, times


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=16384)
    ap.add_argument("--genome-mb", type=float, default=5.0)
    ap.add_argument("--batch-size", type=int, default=4096)
    ap.add_argument("--parity-stride", type=int, default=64)
    ap.add_argument("--longread-n", type=int, default=512)
    ap.add_argument("--large-mb", type=float, default=100.0)
    ap.add_argument("--skip-large", action="store_true")
    ap.add_argument("--skip-longread", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mm2t_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import numpy as np

    from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
    from minimap2_rs_tpu.models.index_builder import build_index_device
    from minimap2_rs_tpu.models.mapper import Mapper
    from minimap2_rs_tpu.oracle.index import build_index
    from minimap2_rs_tpu.oracle.pipeline import map_reads as oracle_map
    from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

    def log(*a):
        if args.verbose:
            print(*a, file=sys.stderr, flush=True)

    extra: dict = {}

    # ---- 1. headline mapping throughput -----------------------------
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

    t0 = time.time()
    mapper.map_reads(rl)  # warmup: compile + cache every shape
    log(f"warmup (compile): {time.time()-t0:.1f}s")

    # median of 3 measured passes (a single pass is ~15% noisy through
    # the shared TPU relay; min would report the luckiest pass)
    dt, lines, times = _median3(lambda: mapper.map_reads(rl))
    log(f"mapped {len(rl)} reads ({total_bp} bp) in {dt:.2f}s "
        f"(passes: {[round(t, 2) for t in times]}) -> {len(lines)} records")

    mapped_names = {l.split("\t", 1)[0] for l in lines}
    aligned_bp = sum(len(s) for n, s in rl if n in mapped_names)
    value = aligned_bp / dt
    target = 1e7  # BASELINE.md: >= 10M aligned read-bp/s/chip
    # best pass as a secondary figure: the shared TPU relay adds ~15%
    # run-to-run noise, so the median headline undersells quiet runs
    extra["best_pass_bp_per_s"] = round(aligned_bp / min(times), 1)

    # ---- 2. hardware parity gate -------------------------------------
    # the device pipeline (Pallas chain kernels compiled by Mosaic when a
    # real TPU is attached) must produce byte-identical PAF to the host
    # oracle on a subsample; divergence fails the whole bench
    sub = rl[:: args.parity_stride]
    t0 = time.time()
    host_lines = oracle_map(idx, sub, cp, mp)
    sub_names = {n for n, _ in sub}
    dev_lines = [l for l in lines if l.split("\t", 1)[0] in sub_names]
    assert dev_lines == host_lines, (
        f"PARITY FAILURE: device vs host oracle differ on the subsample "
        f"({len(dev_lines)} vs {len(host_lines)} lines); first diff: "
        + next(
            (f"{d!r} != {h!r}" for d, h in zip(dev_lines, host_lines) if d != h),
            "line-count mismatch",
        )
    )
    extra["parity_reads"] = len(sub)
    log(f"parity OK on {len(sub)} reads ({time.time()-t0:.1f}s)")

    # ---- 3. index-build throughput ------------------------------------
    # primary = the threaded native engine (the production default: the
    # device build's result transfer is bounded by the host<->TPU link);
    # the device engine is reported alongside.
    from minimap2_rs_tpu.models.index_builder import build_index_native

    recs = [("chrB", genome)]
    build_index_native(recs, IndexParams())  # warm allocators
    tn, idx_nat, _ = _median3(lambda: build_index_native(recs, IndexParams()))
    assert idx_nat.keys.shape[0] == idx.keys.shape[0]
    c_mm2_bps = 278_413_945 / 7.87  # BASELINE.md row 2 (C minimap2)
    extra["index_build_bp_per_s"] = round(glen / tn, 1)
    extra["index_build_vs_c_minimap2"] = round(glen / tn / c_mm2_bps, 4)
    log(f"native index build: {tn:.2f}s ({glen/tn/1e6:.1f} Mbp/s)")
    build_index_device(recs, IndexParams())  # warmup compile
    tb, idx_dev, _ = _median3(lambda: build_index_device(recs, IndexParams()))
    assert idx_dev.keys.shape[0] == idx.keys.shape[0]
    extra["index_build_device_bp_per_s"] = round(glen / tb, 1)
    log(f"device index build: {tb:.2f}s ({glen/tb/1e6:.1f} Mbp/s)")

    # ---- 4. long-read config -----------------------------------------
    if not args.skip_longread:
        lreads = simulate_reads(
            genome, args.longread_n, read_len=(5000, 20000), seed=3
        )
        lrl = [(n, s) for n, s, *_ in lreads]
        mapper.map_reads(lrl)  # warmup long buckets
        tl, llines, _ = _median3(lambda: mapper.map_reads(lrl))
        lnames = {l.split("\t", 1)[0] for l in llines}
        l_bp = sum(len(s) for n, s in lrl if n in lnames)
        extra["longread_bp_per_s"] = round(l_bp / tl, 1)
        extra["longread_vs_target"] = round(l_bp / tl / target, 4)
        log(f"longread: {l_bp/tl/1e6:.1f} Mbp/s over {len(lrl)} reads")

    # ---- 5. large genome ----------------------------------------------
    if not args.skip_large:
        try:
            gl = int(args.large_mb * 1e6)
            t0 = time.time()
            big = random_genome(gl, seed=7)
            log(f"large genome gen: {time.time()-t0:.1f}s")
            t0 = time.time()
            idx_big = build_index_native([("chrL", big)], IndexParams())
            t_big = time.time() - t0
            extra["large_index_build_bp_per_s"] = round(gl / t_big, 1)
            extra["large_index_build_vs_c_minimap2"] = round(
                gl / t_big / c_mm2_bps, 4
            )
            log(f"large index build: {t_big:.1f}s ({gl/t_big/1e6:.1f} Mbp/s), "
                f"{idx_big.keys.shape[0]} keys")
            breads = simulate_reads(big, 4096, read_len=(500, 1000), seed=9)
            brl = [(n, s) for n, s, *_ in breads]
            bmapper = Mapper.from_oracle_index(
                idx_big, cp, mp, batch_size=args.batch_size
            )
            bmapper.map_reads(brl)  # warmup
            tbm, blines, _ = _median3(lambda: bmapper.map_reads(brl))
            bnames = {l.split("\t", 1)[0] for l in blines}
            b_bp = sum(len(s) for n, s in brl if n in bnames)
            extra["large_map_bp_per_s"] = round(b_bp / tbm, 1)
            # parity on the large genome too (host oracle, small sample)
            bsub = brl[::256]
            bhost = oracle_map(idx_big, bsub, cp, mp)
            bsubn = {n for n, _ in bsub}
            bdev = [l for l in blines if l.split("\t", 1)[0] in bsubn]
            assert bdev == bhost, "PARITY FAILURE on the large genome sample"
            extra["large_parity_reads"] = len(bsub)
            log(f"large map: {b_bp/tbm/1e6:.1f} Mbp/s, parity OK on {len(bsub)}")
        except Exception as e:  # keep the headline recordable
            extra["large_error"] = f"{type(e).__name__}: {e}"[:200]
            log(f"large section failed: {e}")

    print(json.dumps({
        "metric": "aligned_read_bp_per_s_per_chip",
        "value": round(value, 1),
        "unit": "bp/s",
        "vs_baseline": round(value / target, 4),
        **extra,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
