"""Large-index-build spread probe (VERDICT r4 item 4): N timed 100 Mbp
builds with the native engine's per-stage MM2T_TIMING marks, so an
outlier pass is attributable to a stage (scan / pack / sort / flatten)
or to the Python-side buffer allocation around them.
"""
from __future__ import annotations

import os
import sys
import time

os.environ["MM2T_TIMING"] = "1"

from minimap2_rs_tpu.config import IndexParams
from minimap2_rs_tpu.models.index_builder import build_index_native
from minimap2_rs_tpu.utils.seqsim import random_genome


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    gl = 100_000_000
    big = random_genome(gl, seed=7)
    recs = [("chrL", big)]
    build_index_native(recs, IndexParams())
    build_index_native(recs, IndexParams())  # heap-reuse steady state
    times = []
    for i in range(n):
        t0 = time.time()
        build_index_native(recs, IndexParams())
        dt = time.time() - t0
        times.append(dt)
        print(f"pass {i}: {dt:.2f}s ({gl/dt/1e6:.1f} Mbp/s)", flush=True)
    times.sort()
    print(f"median {times[n//2]:.2f}s  spread {times[-1]/times[0]:.2f}x")


if __name__ == "__main__":
    main()
