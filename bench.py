"""Benchmark + hardware parity gate: batched mapping throughput on one chip.

Sections (all emitted in ONE JSON line):
  1. headline — BASELINE.json config 3: simulated 500bp-1kb reads vs a
     reference genome, replicated index, single chip. Metric:
     aligned read-bp/s/chip (target >= 10M, BASELINE.md). All three pass
     times and the Mapper's per-stage breakdown (submit / d2h+wait /
     post / wide / tier2) are recorded so a regression is diagnosable
     from the artifacts alone.
  2. parity — FOUR configurations are mapped on device AND by the
     reference-faithful host oracle with every PAF byte compared:
     default (k=15/w=10, 2% error), map-hifi (k=19/w=10 — the u32-pair
     sketch path), an HPC index, and an ONT-like 10%-error corpus.
     On real TPU this is the only place the Mosaic-compiled Pallas chain
     kernels run, so ANY divergence fails the bench (nonzero exit).
  3. index_build — native + device index-build throughput in bp/s;
     vs_baseline anchors to C minimap2's 278 Mbp / 7.87 s (BASELINE.md).
  4. longread — ONT-style 5-20 kb reads, aligned bp/s.
  5. large — (unless --skip-large) 100 Mbp genome: warmed median-of-3
     device index build + a 16384-read mapping sample with a >= 256-read
     parity gate. This section is HARD: any failure exits nonzero.
  6. chain_vpu_util — the flagship Pallas chain kernel's achieved
     DP-cell rate vs the v5e VPU int32 roofline.

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


def _median5(fn):
    """min/median/spread over 5 passes: the relay-attached TPU is ~15%
    noisy pass-to-pass, so a 3-pass median was too weak a number to
    steer perf rounds by (VERDICT r3)."""
    times = []
    out = None
    for _ in range(5):
        t0 = time.time()
        out = fn()
        times.append(time.time() - t0)
    s = sorted(times)
    return s[2], out, times


def _measure_stage_floor(mapper, rl, batch_size: int) -> dict:
    """Measured per-call device time of every stage of the headline
    program (bucket 1024), as successive differences of cumulative
    chained-jit prefixes minus the relay sync floor. `full_call` is the
    ACTUAL production executable (2-bit wire in, packed field rows out,
    dual chain band) — the irreducible device term of the floor model.
    Returns milliseconds per device call, keys in pipeline order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minimap2_rs_tpu.models.mapper import (
        _NEX_CAP,
        _fused_map_stage_lite,
        _use_pallas_chain,
    )
    from minimap2_rs_tpu.models.stages import sketch_to_anchors, unpack_codes2
    from minimap2_rs_tpu.ops import u64
    from minimap2_rs_tpu.ops.index_ops import index_lookup
    from minimap2_rs_tpu.ops.seeds_ops import (
        query_occ_filter,
        sort_minimizers_by_key,
    )
    from minimap2_rs_tpu.ops.sketch import compact_minimizers, sketch_positions
    from minimap2_rs_tpu.ops.u64 import U64Pair
    from minimap2_rs_tpu.runtime.host import native_encode_pack2

    I32 = jnp.int32
    bucket = 1024
    M, A, window, B = mapper._shapes_for(bucket, 1)
    window = min(window, mapper.lite_window_cap)
    idx = mapper.idx
    mp = mapper.mp
    dev_idx = mapper.dev_idx
    mid_occ = jnp.int32(mapper.mid_occ)
    mapper._ensure_meta()
    from minimap2_rs_tpu.ops.chain_ops import chain_scalars_from_params

    scalars = chain_scalars_from_params(mapper.cp)
    if not hasattr(mapper, "_tlens_dev"):  # set by any prior device call
        import dataclasses

        mapper._tlens_dev = jnp.asarray(mapper._tlens)
        mapper._scalars_wide = chain_scalars_from_params(
            dataclasses.replace(mapper.cp, bw=mapper.cp.bw_long)
        )

    seqs = [s for _, s in rl if len(s) <= bucket][:B]
    seqs += [b""] * (B - len(seqs))
    packed2, nex = native_encode_pack2(seqs, bucket // 4, _NEX_CAP)
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    d_p2 = jnp.asarray(packed2)
    d_len = jnp.asarray(lengths)
    d_nex = jnp.asarray(nex)

    kw = dict(w=idx.w, k=idx.k, hpc=False)
    # 4 chained calls: at the pipelined 1024-read call shape one device
    # call is ~10-15 ms, well under the ~27 ms sync floor, so more
    # in-jit repetitions keep the subtraction well-conditioned
    K = 4

    def chained(body):
        @jax.jit
        def fn(p2, lens, nx):
            acc = jnp.int32(0)
            l = lens
            for _ in range(K):
                r = body(p2, l, nx)
                acc = acc + r
                l = l - (r & 1)  # serialize the calls
            return acc
        return fn

    def b_unpack(p2, l, nx):
        c = unpack_codes2(p2, l, nx)
        return jnp.sum(c.astype(I32))

    def b_sketch(p2, l, nx):
        c = unpack_codes2(p2, l, nx)
        ks, ps, emitted = sketch_positions(c, l, idx.w, idx.k, False)
        return jnp.sum(ks.lo.astype(I32)) + jnp.sum(emitted.astype(I32))

    def b_compact(p2, l, nx):
        c = unpack_codes2(p2, l, nx)
        ks, ps, emitted = sketch_positions(c, l, idx.w, idx.k, False)
        cks, cps, n_mini, ovf = compact_minimizers(ks, ps, emitted, M)
        return jnp.sum(cks.lo.astype(I32)) + jnp.sum(n_mini)

    def b_minisort(p2, l, nx):
        c = unpack_codes2(p2, l, nx)
        ks, ps, emitted = sketch_positions(c, l, idx.w, idx.k, False)
        cks, cps, n_mini, ovf = compact_minimizers(ks, ps, emitted, M)
        sks, sps = sort_minimizers_by_key(cks, cps)
        return jnp.sum(sks.lo.astype(I32)) + jnp.sum(sps.astype(I32))

    def b_lookup(p2, l, nx):
        c = unpack_codes2(p2, l, nx)
        ks, ps, emitted = sketch_positions(c, l, idx.w, idx.k, False)
        cks, cps, n_mini, ovf = compact_minimizers(ks, ps, emitted, M)
        sks, sps = sort_minimizers_by_key(cks, cps)
        keep = query_occ_filter(sks, n_mini, mp.q_occ_max, mp.q_occ_frac)
        keys = u64.shr(sks, 8)
        keys = u64.where(keep, keys, U64Pair(
            jnp.zeros_like(keys.hi), jnp.zeros_like(keys.lo)))
        start, count = index_lookup(dev_idx, keys)
        return jnp.sum(start.astype(I32)) + jnp.sum(count.astype(I32))

    def b_anchors(p2, l, nx):
        c = unpack_codes2(p2, l, nx)
        anc = sketch_to_anchors(
            dev_idx, c, l, mid_occ, M=M, A=A,
            q_occ_max=mp.q_occ_max, q_occ_frac=mp.q_occ_frac, **kw)
        return jnp.sum(anc["x_lo"].astype(I32)) + jnp.sum(anc["n_anchors"])

    def b_full(p2, l, nx):
        out = _fused_map_stage_lite(
            dev_idx, p2, l, nx, scalars, mapper._scalars_wide, mid_occ,
            mapper._tlens_dev, jnp.int32(mapper.cp.rmq_rescue_size),
            jnp.float32(mapper.cp.rmq_rescue_ratio),
            q_occ_max=mp.q_occ_max, q_occ_frac=mp.q_occ_frac,
            M=M, A=A, window=window, pallas_chain=_use_pallas_chain(),
            flag_window_ovf=window < min(mapper.cp.max_chain_iter, A),
            wire="2bit", max_chain_skip=None, wide=True, **kw)
        return jnp.sum(jax.lax.bitcast_convert_type(out, I32))

    @jax.jit
    def floor_fn(x):
        return jnp.sum(x)

    # MIN of 5 for both the floor and every chained program: relay
    # noise only ever ADDS time, so min is the consistent low-bias
    # estimator — medians under a noise burst produced stage deltas
    # clamping to 0 while inflating others
    def _min5(fn):
        ts = []
        for _ in range(5):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return min(ts)

    int(floor_fn(d_len))
    t_floor = _min5(lambda: int(floor_fn(d_len)))

    out_ms = {}
    cum = []
    for name, body in [
        ("unpack_wire", b_unpack), ("sketch", b_sketch),
        ("compact", b_compact), ("minisort", b_minisort),
        ("lookup", b_lookup), ("expand_sort", b_anchors),
        ("chain_finalize", b_full),
    ]:
        fn = chained(body)
        int(fn(d_p2, d_len, d_nex))  # compile
        t = max((_min5(lambda: int(fn(d_p2, d_len, d_nex))) - t_floor) / K,
                0.0)
        prev = cum[-1] if cum else 0.0
        cum.append(max(t, prev))
        out_ms[name] = round(max(t - prev, 0.0) * 1e3, 2)
    out_ms["full_call"] = round(cum[-1] * 1e3, 2)
    return out_ms


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=16384)
    ap.add_argument("--genome-mb", type=float, default=5.0)
    # 1024-read calls pipeline the pass (async dispatch: sync + submit +
    # post hide behind device compute of later batches; prof_pipeline.py)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--parity-stride", type=int, default=16)
    ap.add_argument("--longread-n", type=int, default=512)
    ap.add_argument("--large-mb", type=float, default=100.0)
    ap.add_argument("--large-reads", type=int, default=16384)
    ap.add_argument("--skip-large", action="store_true")
    ap.add_argument("--skip-longread", action="store_true")
    ap.add_argument("--skip-extra-parity", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mm2t_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import numpy as np

    from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
    from minimap2_rs_tpu.models.index_builder import (
        build_index_device,
        build_index_native,
    )
    from minimap2_rs_tpu.models.mapper import Mapper
    from minimap2_rs_tpu.oracle.pipeline import map_reads as oracle_map
    from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

    def log(*a):
        if args.verbose:
            print(*a, file=sys.stderr, flush=True)

    extra: dict = {}

    def parity_check(tag: str, mapper, idx, rl, lines, cp, mp):
        """Byte-compare device PAF vs the host oracle; hard assert."""
        t0 = time.time()
        host_lines = oracle_map(idx, rl, cp, mp)
        names = {n for n, _ in rl}
        dev_lines = [l for l in lines if l.split("\t", 1)[0] in names]
        assert dev_lines == host_lines, (
            f"PARITY FAILURE [{tag}]: device vs host oracle differ "
            f"({len(dev_lines)} vs {len(host_lines)} lines); first diff: "
            + next(
                (f"{d!r} != {h!r}"
                 for d, h in zip(dev_lines, host_lines) if d != h),
                "line-count mismatch",
            )
        )
        extra[f"parity_{tag}"] = len(rl)
        log(f"parity[{tag}] OK on {len(rl)} reads ({time.time()-t0:.1f}s)")
        return len(rl)

    # ---- 1. headline mapping throughput -----------------------------
    glen = int(args.genome_mb * 1e6)
    t0 = time.time()
    genome = random_genome(glen, seed=0)
    idx = build_index_native([("chrB", genome)], IndexParams())
    log(f"index build (native): {time.time()-t0:.1f}s, {idx.keys.shape[0]} keys")

    reads = simulate_reads(genome, args.reads, read_len=(500, 1000), seed=1)
    rl = [(n, s) for n, s, *_ in reads]
    total_bp = sum(len(s) for _, s in rl)

    cp = ChainParams.defaults_for_k(15)
    mp = MapParams()
    mapper = Mapper.from_oracle_index(idx, cp, mp, batch_size=args.batch_size)

    t0 = time.time()
    mapper.map_reads_paf(rl)  # warmup: compile + cache every shape
    log(f"warmup (compile): {time.time()-t0:.1f}s")

    # median of 5 measured passes (a single pass is ~15% noisy through
    # the shared TPU relay; min would report the luckiest pass); the
    # per-stage Mapper stats of the LAST pass ship in the JSON so a
    # throughput change is attributable to a stage. The timed unit is
    # map_reads_paf — bytes in, one PAF bytes blob out (the production
    # output path).
    def _one_pass():
        mapper.stats = {}
        return mapper.map_reads_paf(rl)

    # relay sync-floor probes interleaved between passes: if a slow pass
    # coincides with a high adjacent floor sample, the spread is shared-
    # relay noise, not a stall in our pass (VERDICT r4 weak item 6)
    import jax as _jax
    import jax.numpy as _jnp

    _probe_x = _jnp.zeros((8, 128), _jnp.int32)
    _probe = _jax.jit(lambda x: _jnp.sum(x))
    int(_probe(_probe_x))  # compile

    def _floor_sample():
        s = []
        for _ in range(3):
            t0 = time.time()
            int(_probe(_probe_x))
            s.append(time.time() - t0)
        return sorted(s)[1]

    # 7 passes (~0.3 s each): the shared relay's noise comes in multi-
    # second bursts that can swallow 2 of 5 passes; a 7-pass median is
    # robust to one burst while costing under a second extra
    times = []
    floors = [round(_floor_sample() * 1e3, 1)]
    blob = None
    for _ in range(7):
        t0 = time.time()
        blob = _one_pass()
        times.append(time.time() - t0)
        floors.append(round(_floor_sample() * 1e3, 1))
    dt = sorted(times)[3]
    extra["pass_floor_samples_ms"] = floors
    lines = blob.decode().split("\n")[:-1] if blob else []
    log(f"mapped {len(rl)} reads ({total_bp} bp) in {dt:.2f}s "
        f"(passes: {[round(t, 2) for t in times]}) -> {len(lines)} records")

    mapped_names = {l.split("\t", 1)[0] for l in lines}
    aligned_bp = sum(len(s) for n, s in rl if n in mapped_names)
    value = aligned_bp / dt
    target = 1e7  # BASELINE.md: >= 10M aligned read-bp/s/chip
    extra["pass_times_s"] = [round(t, 3) for t in times]
    extra["best_pass_bp_per_s"] = round(aligned_bp / min(times), 1)
    extra["pass_spread"] = round(max(times) / min(times), 3)
    extra["stage_breakdown_s"] = {
        k: round(v, 4) for k, v in mapper.stats.items()
    }
    headline_stats = dict(mapper.stats)  # later sections reuse `mapper`

    # ---- 2. hardware parity gates ------------------------------------
    n_parity = parity_check(
        "default", mapper, idx, rl[:: args.parity_stride], lines, cp, mp
    )

    if not args.skip_extra_parity:
        # map-hifi: k=19 exercises the u32-pair sketch path (keys > 32
        # bits) that k=15 never touches
        g2 = random_genome(2_000_000, seed=11)
        idx19 = build_index_native([("chrH", g2)], IndexParams(w=10, k=19))
        cp19 = ChainParams.defaults_for_k(19)
        r19 = simulate_reads(g2, 128, read_len=(2000, 4000),
                             error_rate=0.01, seed=13)
        rl19 = [(n, s) for n, s, *_ in r19]
        m19 = Mapper.from_oracle_index(idx19, cp19, mp,
                                       batch_size=args.batch_size)
        m19.map_reads(rl19)
        n_parity += parity_check(
            "hifi_k19", m19, idx19, rl19, m19.map_reads(rl19), cp19, mp
        )

        # HPC index (flag bit 0): homopolymer-compressed reference
        # sketching; queries stay non-HPC (seeds.rs:7-11)
        idx_hpc = build_index_native(
            [("chrP", g2)], IndexParams(w=10, k=15, flag=1)
        )
        r_hpc = simulate_reads(g2, 128, read_len=(500, 1000), seed=17)
        rl_hpc = [(n, s) for n, s, *_ in r_hpc]
        m_hpc = Mapper.from_oracle_index(idx_hpc, cp, mp,
                                         batch_size=args.batch_size)
        m_hpc.map_reads(rl_hpc)
        n_parity += parity_check(
            "hpc", m_hpc, idx_hpc, rl_hpc, m_hpc.map_reads(rl_hpc), cp, mp
        )

        # ONT-like: 10% error, 1-2 kb — stresses banding and rescue
        r_ont = simulate_reads(genome, 256, read_len=(1000, 2000),
                               error_rate=0.10, seed=19)
        rl_ont = [(n, s) for n, s, *_ in r_ont]
        mapper.map_reads(rl_ont)
        n_parity += parity_check(
            "ont_10pct", mapper, idx, rl_ont, mapper.map_reads(rl_ont),
            cp, mp,
        )

        # even k (k=14): the exact-scan device sketch (ops/sketch_scan.py)
        # — legal reference input that r2 still routed to the host
        idx14 = build_index_native([("chrE", g2)], IndexParams(w=10, k=14))
        cp14 = ChainParams.defaults_for_k(14)
        r14 = simulate_reads(g2, 128, read_len=(500, 1000), seed=23)
        rl14 = [(n, s) for n, s, *_ in r14]
        m14 = Mapper.from_oracle_index(idx14, cp14, mp,
                                       batch_size=args.batch_size)
        m14.map_reads(rl14)
        n_parity += parity_check(
            "even_k14", m14, idx14, rl14, m14.map_reads(rl14), cp14, mp
        )
    extra["parity_reads"] = n_parity

    # ---- 3. index-build throughput ------------------------------------
    # primary = the threaded native engine (the production default: the
    # device build's result transfer is bounded by the host<->TPU link);
    # the device engine is reported alongside.
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
    # why the device engine loses HERE (and `auto` dispatches native):
    # it must return 16 B/minimizer of (key, rps) pairs over the relay's
    # ~16 MB/s D2H link — a hard floor independent of device speed. On
    # directly-attached hardware (PCIe) this term vanishes. See README.
    d2h_b = 16 * int(idx_dev.positions.shape[0])
    extra["index_build_device_d2h_bytes"] = d2h_b
    extra["index_build_device_d2h_floor_s"] = round(d2h_b / 16e6, 2)
    log(f"device index build: {tb:.2f}s ({glen/tb/1e6:.1f} Mbp/s; "
        f"relay D2H floor ~{d2h_b/16e6:.1f}s)")

    # ---- 4. long-read config -----------------------------------------
    if not args.skip_longread:
        lreads = simulate_reads(
            genome, args.longread_n, read_len=(5000, 20000), seed=3
        )
        lrl = [(n, s) for n, s, *_ in lreads]
        mapper.map_reads(lrl)  # warmup long buckets

        def _one_lpass():
            mapper.stats = {}
            return mapper.map_reads(lrl)

        tl, llines, _ = _median3(_one_lpass)
        lnames = {l.split("\t", 1)[0] for l in llines}
        l_bp = sum(len(s) for n, s in lrl if n in lnames)
        extra["longread_bp_per_s"] = round(l_bp / tl, 1)
        extra["longread_vs_target"] = round(l_bp / tl / target, 4)
        # per-stage breakdown of the LAST pass: the r4 regression (20.4
        # -> 9.09 M bp/s) shipped as a single opaque number; this makes
        # any future one attributable from the artifact alone
        extra["longread_stage_breakdown_s"] = {
            k: round(v, 4) for k, v in mapper.stats.items()
        }
        log(f"longread: {l_bp/tl/1e6:.1f} Mbp/s over {len(lrl)} reads")
        # HARDWARE parity at lane-kernel shapes: reads of 5-20 kb land at
        # A >= 1024, so this gate is the only place the lane Pallas chain
        # kernels, the lazy-wide phase-2.2 re-run, and the per-band
        # win_ovf logic are Mosaic-compiled and byte-compared on real
        # TPU (every other parity config stays <= 4 kb -> sublane
        # kernels; the r4 probe-layout episode proved TPU-only
        # miscompiles are real, ops/index_ops.py:237-247)
        parity_check("longread", mapper, idx, lrl[::6], llines, cp, mp)
        extra["parity_reads"] += extra["parity_longread"]

    # ---- 5. large genome (HARD: failures exit nonzero) ----------------
    if not args.skip_large:
        gl = int(args.large_mb * 1e6)
        t0 = time.time()
        big = random_genome(gl, seed=7)
        log(f"large genome gen: {time.time()-t0:.1f}s")
        brecs = [("chrL", big)]
        # two warm passes: the brk-heap reuse (runtime/host.py
        # _enable_heap_reuse) reaches its fault-free steady state after
        # two generations of build buffers
        build_index_native(brecs, IndexParams())
        build_index_native(brecs, IndexParams())
        # manual 5-pass loop with the native engine's per-stage seconds
        # captured per pass (runtime/host.last_build_stage_s), so an
        # outlier pass is attributable to a stage (scan/pack/sort/
        # flatten) from this artifact alone — the r4 5.05 s outlier
        # shipped as one opaque number
        from minimap2_rs_tpu.runtime.host import last_build_stage_s

        big_times, big_stages = [], []
        idx_big = None
        for _ in range(5):
            t0 = time.time()
            idx_big = build_index_native(brecs, IndexParams())
            big_times.append(time.time() - t0)
            big_stages.append(last_build_stage_s())
        t_big = sorted(big_times)[2]
        extra["large_index_build_bp_per_s"] = round(gl / t_big, 1)
        extra["large_index_build_vs_c_minimap2"] = round(
            gl / t_big / c_mm2_bps, 4
        )
        extra["large_index_build_pass_times_s"] = [
            round(t, 2) for t in big_times
        ]
        extra["large_index_build_spread"] = round(
            max(big_times) / min(big_times), 3
        )
        if big_stages[0] is not None:
            extra["large_index_build_pass_stages_s"] = big_stages
        log(f"large index build: {t_big:.1f}s ({gl/t_big/1e6:.1f} Mbp/s), "
            f"{idx_big.keys.shape[0]} keys")
        breads = simulate_reads(big, args.large_reads,
                                read_len=(500, 1000), seed=9)
        brl = [(n, s) for n, s, *_ in breads]
        bmapper = Mapper.from_oracle_index(
            idx_big, cp, mp, batch_size=args.batch_size
        )
        bmapper.map_reads(brl)  # warmup
        tbm, blines, btimes = _median3(lambda: bmapper.map_reads(brl))
        bnames = {l.split("\t", 1)[0] for l in blines}
        b_bp = sum(len(s) for n, s in brl if n in bnames)
        extra["large_map_bp_per_s"] = round(b_bp / tbm, 1)
        extra["large_map_pass_times_s"] = [round(t, 3) for t in btimes]
        log(f"large map: {b_bp/tbm/1e6:.1f} Mbp/s over {len(brl)} reads")
        # parity on the large genome too (>= 256 reads)
        parity_check("large", bmapper, idx_big, brl[::64], blines, cp, mp)
        extra["parity_reads"] += extra["parity_large"]

    # ---- 6. chain-kernel VPU utilization + relay sync floor -----------
    # The flagship kernel is asked for B*A*A DP cells per call (full
    # window); its static triangular schedule computes ~0.52 of them and
    # fills the rest analytically, at ~45 actual int32/f32 VPU ops per
    # computed cell (deltas, 4-compare mask, min, log2 penalty, selects,
    # reductions). chain_cells_per_s counts the FULL B*A*A (the
    # algorithmic rate callers see); chain_vpu_util counts only computed
    # cells x 45 ops against the v5e VPU roofline (8x128 lanes x 4 ALUs
    # x ~0.94 GHz ~ 3.85e12 ops/s).
    #
    # Methodology (r4): one host-synced call through this TPU relay pays
    # a ~27-35 ms round-trip REGARDLESS of kernel time — r1-r3 measured
    # sync latency, not the kernel (hence the bogus 6.6% figure). Here K
    # data-dependent kernel calls run inside ONE jit with one sync;
    # per-call time = (t_chained - t_sync_floor) / K, both medians of 5.
    try:
        import jax
        import jax.numpy as jnp

        from minimap2_rs_tpu.ops.chain_ops import chain_scalars_from_params
        from minimap2_rs_tpu.ops.chain_pallas import chain_dp_aux_batch_pallas

        B_u, A_u, K_u = 4096, 256, 16
        rng = np.random.default_rng(5)
        grp = jnp.zeros((B_u, A_u), jnp.uint32)
        rpos = jnp.asarray(
            np.sort(rng.integers(0, 1 << 20, (B_u, A_u)), axis=1), jnp.int32
        )
        qpos = jnp.asarray(rng.integers(0, 1000, (B_u, A_u)), jnp.int32)
        span = jnp.full((B_u, A_u), 15, jnp.int32)
        scal = chain_scalars_from_params(cp)

        @jax.jit
        def _floor_fn(x):
            return jnp.sum(x)

        @jax.jit
        def _chained(grp, rpos, qpos, span, scal):
            acc = jnp.int32(0)
            q = qpos
            for _ in range(K_u):
                f, cnt, sq, sr = chain_dp_aux_batch_pallas(
                    grp, rpos, q, span, scal, A_u
                )
                acc = acc + jnp.sum(f) + jnp.sum(cnt) + jnp.sum(sq) + jnp.sum(sr)
                q = q + (f[:, :1] & 1)  # data dependency: serialize calls
            return acc

        int(_floor_fn(qpos))
        int(_chained(grp, rpos, qpos, span, scal))  # compile
        t_f, _, _ = _median5(lambda: int(_floor_fn(qpos)))
        t_c, _, _ = _median5(lambda: int(_chained(grp, rpos, qpos, span, scal)))
        t_k = max((t_c - t_f) / K_u, 1e-9)
        cells = B_u * A_u * A_u
        ops = int(cells * 0.52) * 45  # computed cells x actual ops
        extra["relay_sync_ms"] = round(t_f * 1e3, 2)
        extra["chain_ms_per_call"] = round(t_k * 1e3, 3)
        extra["chain_cells_per_s"] = round(cells / t_k, 1)
        extra["chain_vpu_util"] = round(min(ops / t_k / 3.85e12, 1.0), 4)
        log(f"chain kernel: {cells/t_k/1e9:.1f} Gcells/s "
            f"({t_k*1e3:.2f} ms/call, sync floor {t_f*1e3:.1f} ms), "
            f"~{100*min(ops/t_k/3.85e12, 1.0):.1f}% of VPU roofline")
    except Exception as e:  # utilization is informative, not a gate
        extra["chain_util_error"] = f"{type(e).__name__}: {e}"[:200]

    # ---- 7. skip-prune mode parity ON TPU -----------------------------
    # MM2T_SKIP_PRUNE=1 replicates the reference's order-dependent
    # max_chain_skip pruning bit-for-bit (lchain.rs:79-88) in the
    # lax.scan kernel; this gate runs that mode on the hardware (it was
    # CPU-parity-tested only through r3).
    os.environ["MM2T_SKIP_PRUNE"] = "1"
    try:
        rl_sp = rl[:128]
        # small batch: this mode runs the lax.scan kernel (the pruning
        # is order-dependent), so keep the compiled shape small
        m_sp = Mapper.from_oracle_index(idx, cp, mp, batch_size=128)
        m_sp.map_reads(rl_sp)
        parity_check("skipprune", m_sp, idx, rl_sp, m_sp.map_reads(rl_sp),
                     cp, mp)
        # the mode's cost at a production shape (VERDICT r4 item 8):
        # users who need bit-exact max_chain_skip replication pay the
        # serial lax.scan kernel — one timed pass documents the price
        rl_spt = rl[:2048]
        m_spt = Mapper.from_oracle_index(idx, cp, mp, batch_size=2048)
        m_spt.map_reads_paf(rl_spt)  # warmup/compile
        t0 = time.time()
        spb = m_spt.map_reads_paf(rl_spt)
        t_sp = time.time() - t0
        sp_names = {
            l.split("\t", 1)[0]
            for l in (spb.decode().split("\n")[:-1] if spb else [])
        }
        sp_bp = sum(len(s) for n, s in rl_spt if n in sp_names)
        extra["skipprune_bp_per_s"] = round(sp_bp / t_sp, 1)
        log(f"skip-prune mode: {sp_bp/t_sp/1e6:.1f} Mbp/s "
            f"({len(rl_spt)} reads, one pass)")
    finally:
        del os.environ["MM2T_SKIP_PRUNE"]

    # ---- 8. end-to-end per-stage achieved-vs-peak roofline ------------
    # Every device stage of the headline program is MEASURED (VERDICT r4
    # weak item 2: the old model counted only syncs + chain + post and
    # left 0.3 s unattributed): cumulative prefixes of the production
    # pipeline run as chained data-dependent calls inside one jit
    # (the prof_sync.py methodology); stage cost = successive
    # difference after subtracting the relay sync floor. The floor
    # model reflects the PIPELINED drain (threaded submit + async
    # dispatch: submit, host post, and per-call syncs all hide behind
    # later batches' device compute — prof_pipeline.py measured
    # d2h+wait ~ 0 at 1024-read calls), so what remains is device time,
    # the tail sync, and the post-pass requeue phases (tier2 overflow /
    # lazy-wide / rescue re-runs, measured on the pass itself):
    #   sol = n_calls * full_device_call + sync_floor
    #         + tier2 + wide + rescue
    # submit/post are reported alongside; if host work ever exceeded
    # device time it would bound the pass instead and show up as
    # headline_vs_floor > 1.
    try:
        st = headline_stats
        n_calls = max(1, -(-len(rl) // args.batch_size))
        h2d = st.get("h2d_bytes", 0)
        d2h = st.get("d2h_bytes", 0)
        sub = max(st.get("submit", 0.0), 1e-9)
        dw = max(st.get("d2h+wait", 0.0), 1e-9)
        stage_ms = _measure_stage_floor(mapper, rl, args.batch_size)
        roof = {
            "h2d_bytes": int(h2d),
            "d2h_bytes": int(d2h),
            "h2d_MBps_achieved": round(h2d / sub / 1e6, 1),
            "d2h_MBps_over_wait": round(d2h / dw / 1e6, 1),
            "syncs_per_pass": n_calls,
            "sync_floor_s": round(extra.get("relay_sync_ms", 27.0) / 1e3, 4),
            "stage_ms_per_call": stage_ms,
            "host_post_s": round(st.get("post", 0.0), 4),
            "host_submit_s": round(st.get("submit", 0.0), 4),
        }
        roof["requeue_s"] = round(
            st.get("tier2", 0.0) + st.get("wide", 0.0)
            + st.get("rescue", 0.0), 4
        )
        sol = (
            n_calls * stage_ms["full_call"] / 1e3
            + roof["sync_floor_s"] + roof["requeue_s"]
        )
        roof["pass_floor_model_s"] = round(sol, 4)
        roof["headline_vs_floor"] = round(dt / max(sol, 1e-9), 3)
        extra["roofline"] = roof
        log(f"roofline: pass {dt:.3f}s vs floor model {sol:.3f}s "
            f"({dt/max(sol,1e-9):.2f}x); stages/call {stage_ms}")
    except Exception as e:
        extra["roofline_error"] = f"{type(e).__name__}: {e}"[:200]

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
