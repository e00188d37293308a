"""Test configuration: run everything on a virtual 8-device CPU mesh.

Env vars alone are not reliable here: a pytest plugin may import jax before
this conftest runs, after which JAX_PLATFORMS/XLA_FLAGS are ignored.  Setting
the config programmatically works as long as no backend has been initialized
yet, which is guaranteed at collection time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# persistent compilation cache makes repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_etch_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_etch_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert not jax._src.xla_bridge.backends_are_initialized(), (
    "a jax backend was initialized before conftest could select CPU"
)


# Bundled data assets (markersets, sample scan + GT): vendored under
# <repo>/datafolder so the test suite stands alone (no /root/reference).
DATAROOT = os.path.join(os.path.dirname(__file__), "..", "datafolder")
