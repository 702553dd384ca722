"""Calibrate relay sync overhead vs true kernel compute time.

- floor: trivial scalar jit, synced per call.
- chained: K dependent kernel calls inside ONE jit, one sync at the end
  -> per-call compute = (t_chained - floor) / K.
"""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mm2t_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
import jax
import jax.numpy as jnp
from minimap2_rs_tpu.config import ChainParams
from minimap2_rs_tpu.ops.chain_ops import chain_scalars_from_params
from minimap2_rs_tpu.ops.chain_pallas import chain_dp_batch_pallas, chain_dp_aux_batch_pallas

B_u, A_u, K = 4096, 256, 8
cp = ChainParams.defaults_for_k(15)
rng = np.random.default_rng(5)
grp = jnp.zeros((B_u, A_u), jnp.uint32)
rpos = jnp.asarray(np.sort(rng.integers(0, 1 << 20, (B_u, A_u)), axis=1), jnp.int32)
qpos = jnp.asarray(rng.integers(0, 1000, (B_u, A_u)), jnp.int32)
span = jnp.full((B_u, A_u), 15, jnp.int32)
scal = chain_scalars_from_params(cp)


@jax.jit
def triv(x):
    return jnp.sum(x) * 2


@jax.jit
def chained_dp(grp, rpos, qpos, span, scal):
    acc = jnp.int32(0)
    q = qpos
    for _ in range(K):
        f, prev = chain_dp_batch_pallas(grp, rpos, q, span, scal, A_u)
        acc = acc + jnp.sum(f) + jnp.sum(prev)
        q = q + (f[:, :1] & 1)  # data dependency: serialize the calls
    return acc


@jax.jit
def chained_aux(grp, rpos, qpos, span, scal):
    acc = jnp.int32(0)
    q = qpos
    for _ in range(K):
        f, cnt, sq, sr = chain_dp_aux_batch_pallas(grp, rpos, q, span, scal, A_u)
        acc = acc + jnp.sum(f) + jnp.sum(cnt) + jnp.sum(sq) + jnp.sum(sr)
        q = q + (f[:, :1] & 1)
    return acc


def timed(fn, reps=10):
    fn()
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            fn()
        ts.append((time.time() - t0) / reps)
    return sorted(ts)[1]


floor = timed(lambda: int(triv(qpos)))
print(f"sync floor: {floor*1e3:.2f}ms")
t_dp = timed(lambda: int(chained_dp(grp, rpos, qpos, span, scal)), reps=3)
per_dp = (t_dp - floor) / K
cells = B_u * A_u * A_u
print(f"dp: chained {t_dp*1e3:.1f}ms -> per-call {per_dp*1e3:.2f}ms "
      f"{cells/per_dp/1e9:.1f} Gcells/s util {cells*30/per_dp/3.85e12*100:.1f}%")
t_aux = timed(lambda: int(chained_aux(grp, rpos, qpos, span, scal)), reps=3)
per_aux = (t_aux - floor) / K
print(f"aux: chained {t_aux*1e3:.1f}ms -> per-call {per_aux*1e3:.2f}ms "
      f"{cells/per_aux/1e9:.1f} Gcells/s util {cells*30/per_aux/3.85e12*100:.1f}%")
