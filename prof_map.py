import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mm2t_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
from minimap2_rs_tpu.models.index_builder import build_index_native
from minimap2_rs_tpu.models.mapper import Mapper
from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads

mb = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
nreads = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
glen = int(mb * 1e6)
genome = random_genome(glen, seed=0 if mb <= 5 else 7)
idx = build_index_native([("chrB", genome)], IndexParams())
reads = simulate_reads(genome, nreads, read_len=(500, 1000), seed=1 if mb <= 5 else 9)
rl = [(n, s) for n, s, *_ in reads]
total_bp = sum(len(s) for _, s in rl)
cp = ChainParams.defaults_for_k(15)
mp = MapParams()
mapper = Mapper.from_oracle_index(idx, cp, mp, batch_size=4096)
t0 = time.time(); mapper.map_reads(rl); print(f"warmup {time.time()-t0:.1f}s", flush=True)
for i in range(3):
    mapper.stats = {}
    t0 = time.time(); lines = mapper.map_reads(rl); dt = time.time()-t0
    print(f"pass {i}: {dt:.3f}s  {total_bp/dt/1e6:.1f} Mbp/s  stats={ {k: round(v,3) for k,v in mapper.stats.items()} }", flush=True)
print("dm table:", mapper.dev_idx.dm.shape, mapper.dev_idx.dm_bits, mapper.dev_idx.dm_slots, mapper.dev_idx.dm_entry, f"{mapper.dev_idx.dm.size*4/1e6:.0f} MB")
