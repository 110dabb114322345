import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled; real-TPU
# execution is exercised by bench.py / __graft_entry__.py.
#
# NOTE: this environment force-registers an "axon" TPU backend through
# sitecustomize and overrides JAX_PLATFORMS, so the env var alone is not
# enough — the config must be set programmatically before first backend use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
