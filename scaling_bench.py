"""Relative scaling of the mesh mapping path on the virtual CPU mesh.

Multi-chip TPU hardware is not reachable from this environment, so this
measures the best available proxy for the BASELINE scaling target
(>= 80% reads/s efficiency): the SAME shard_map programs that would run
over ICI, on an 8-device virtual CPU mesh, dp=1 vs dp=N, steady state
(compile excluded via warmup). Virtual devices share one host's cores,
so absolute efficiency here reflects host parallelism limits, not ICI —
the numbers bound program overhead (collectives, resharding), not
hardware scaling.

Usage: python scaling_bench.py [--reads N] [--genome-kb KB] [--dp 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=2048)
    ap.add_argument("--genome-kb", type=int, default=500)
    ap.add_argument("--dp", type=int, default=8)
    ap.add_argument("--sharded", action="store_true",
                    help="also time the dp x ix sharded-index mode")
    ap.add_argument("--pin-threads", action="store_true",
                    help="single-thread each virtual device so dp maps "
                    "to physical cores (meaningful only when the host "
                    "has >= dp cores); without this, XLA CPU's shared "
                    "thread pool lets ONE device use every core and "
                    "dp>1 only measures program overhead")
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.dp}"
    )
    if args.pin_threads:
        flags += " --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
    os.environ["XLA_FLAGS"] = flags.strip()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mm2t_jax_cache")

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= args.dp

    from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
    from minimap2_rs_tpu.models.mesh_mapper import MeshMapper
    from minimap2_rs_tpu.oracle.index import build_index
    from minimap2_rs_tpu.parallel.mesh import make_mesh
    from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

    genome = random_genome(args.genome_kb * 1000, seed=0)
    idx = build_index([("chrS", genome)], IndexParams())
    cp = ChainParams.defaults_for_k(15)
    mp = MapParams()
    reads = simulate_reads(genome, args.reads, read_len=(500, 1000), seed=1)
    rl = [(n, s) for n, s, *_ in reads]

    def run(dp: int, ix: int = 1, sharded: bool = False):
        """(median end-to-end map_reads seconds, median device-program
        seconds). The program-only number isolates the shard_map program
        (what would scale over ICI) from the serial host work around it."""
        mm = MeshMapper.from_oracle_index(
            idx, cp, mp, mesh=make_mesh(dp=dp, ix=ix), index_sharded=sharded,
            batch_size=1024,
        )
        mm.map_reads(rl)  # warmup: compile every shape
        times = []
        for _ in range(3):
            t0 = time.time()
            out = mm.map_reads(rl)
            times.append(time.time() - t0)
        assert out, "no mappings produced"
        # program-only: re-invoke every compiled executable on held inputs
        runs = []
        held = getattr(mm, "_held_args", None)
        if held is None:
            # capture one batch per compiled shape by re-submitting
            held = []
            orig = mm._mesh_exec

            class Catch(dict):
                def __getitem__(self, k):
                    exe = orig[k]

                    def call(*a):
                        held.append((exe, a))
                        return exe(*a)

                    return call

                def __contains__(self, k):
                    return k in orig

            mm._mesh_exec = Catch()
            mm.map_reads(rl)
            mm._mesh_exec = orig
        import numpy as np

        for _ in range(3):
            t0 = time.time()
            outs = [exe(*a) for exe, a in held]
            # force to HOST: this environment's CPU backend dispatches
            # asynchronously and jax.block_until_ready does NOT wait for
            # execution (verified with a 4M-row sort timed at 0.0 s), so
            # only the D2H copy proves the program ran
            for o in outs:
                jax.tree_util.tree_map(np.asarray, o)
            runs.append(time.time() - t0)
        return sorted(times)[1], sorted(runs)[1], mm

    t1, p1, _ = run(1)
    tn, pn, _ = run(args.dp)
    eff = (t1 / tn) / args.dp
    peff = (p1 / pn) / args.dp
    extra = {"program_only_dp1_s": round(p1, 3),
             f"program_only_dp{args.dp}_s": round(pn, 3),
             "program_only_efficiency": round(peff, 4),
             # the host has ~2 cores which the dp=1 baseline already
             # saturates (XLA CPU shares one compute pool across virtual
             # devices), so wall-clock can never show a >~2x speedup
             # here no matter how clean the program is. What IS
             # measurable: total-work conservation — the same total
             # reads at dp=N should take no longer than at dp=1.
             # >= 1.0 means the dp partitioning (specs, per-device
             # dispatch, any collectives) adds no net overhead.
             "work_conservation_t1_over_tN": round(t1 / tn, 4),
             "program_work_conservation": round(p1 / pn, 4)}
    if args.sharded:
        ts, ps, mm_sh = run(args.dp // 2, ix=2, sharded=True)
        extra["sharded_dp_ix_s"] = round(ts, 3)
        extra["sharded_program_only_s"] = round(ps, 3)
        # exact ICI payload of the compiled sharded programs + a
        # real-hardware overhead prediction: payload bytes per read at a
        # conservative 4.5e10 B/s usable per v5e ICI link vs the
        # measured per-read wall time — the virtual mesh cannot time
        # ICI, but it fixes the numerator exactly
        pay = mm_sh.stats.get("ici_payload", {})
        extra["ici_payload_per_call"] = pay
        if pay:
            bpr = max(v["ici_bytes_per_read"] for v in pay.values())
            reads_s = len(rl) / tn
            extra["ici_bytes_per_read"] = bpr
            extra["predicted_ici_overhead_frac"] = round(
                (bpr * reads_s) / 4.5e10, 6
            )
    print(json.dumps({
        "metric": "mesh_scaling_efficiency_virtual_cpu",
        "value": round(eff, 4),
        "unit": f"(t_dp1/t_dp{args.dp})/{args.dp}",
        "t_dp1_s": round(t1, 3),
        f"t_dp{args.dp}_s": round(tn, 3),
        "reads_per_s_dp1": round(len(rl) / t1, 1),
        f"reads_per_s_dp{args.dp}": round(len(rl) / tn, 1),
        **extra,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
