"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharded
paths are exercised without TPU hardware (SURVEY.md section 4.3)."""

import os

# force CPU: the environment may pre-set JAX_PLATFORMS=axon (TPU) and
# pre-import jax from sitecustomize, so the env var alone is not enough —
# jax.config.update below is what actually takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mm2t_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
