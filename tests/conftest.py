"""Test configuration: force an 8-device virtual CPU mesh and float64.

Tests validate numerics against the reference's float64 golden values and
sharding against a virtual mesh (SURVEY.md §4); the real-TPU path is
exercised by bench.py / __graft_entry__.py.

Note: this image's sitecustomize imports jax and registers the remote-TPU
("axon") PJRT plugin at interpreter startup, so JAX_PLATFORMS set here via
os.environ is too late — we must override through jax.config and drop any
already-initialized backends.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # tear down any backend sitecustomize already initialized
    from jax._src import xla_bridge

    xla_bridge._clear_backends()
except Exception:
    pass

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", (
    f"tests must run on CPU, got {jax.devices()}"
)
assert len(jax.devices()) == 8, f"expected 8 virtual devices, got {jax.devices()}"
