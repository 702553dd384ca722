"""Profile the native index build at scale with per-stage timing."""
import os, sys, time
import numpy as np
from minimap2_rs_tpu.config import IndexParams
from minimap2_rs_tpu.models.index_builder import build_index_native
from minimap2_rs_tpu.utils.seqsim import random_genome

mb = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
gl = int(mb * 1e6)
t0 = time.time()
big = random_genome(gl, seed=7)
print(f"genome gen: {time.time()-t0:.1f}s, cpus={os.cpu_count()}", file=sys.stderr)
recs = [("chrL", big)]
for i in range(passes):
    t0 = time.time()
    idx = build_index_native(recs, IndexParams())
    dt = time.time() - t0
    print(f"pass {i}: {dt:.2f}s ({gl/dt/1e6:.1f} Mbp/s)", file=sys.stderr)
