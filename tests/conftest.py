"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding tests use a virtual
8-device CPU mesh as SURVEY.md section 4 prescribes.

The ambient environment pins JAX_PLATFORMS to the tunneled TPU ("axon"),
which is reserved for bench.py. Some installed pytest plugins import jax
before this conftest runs, so setting the env var alone is not enough —
we also set the config directly, which works as long as no backend has
been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("HG_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/hg_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
