"""Runtime/platform helpers.

Some images pre-import jax at interpreter start (a sitecustomize registers a
remote-TPU PJRT plugin and exports JAX_PLATFORMS), so environment variables
set by user code are too late. force_platform() switches backends through
jax.config and tears down any client that was already initialized.
"""

from __future__ import annotations

import os


def force_platform(platform: str, host_device_count: int | None = None) -> None:
    """Select the JAX backend at runtime ('cpu', 'tpu', 'axon', ...).

    host_device_count: for 'cpu', optionally fake this many host devices
    (only effective if no CPU client exists yet in this process).
    """
    os.environ["JAX_PLATFORMS"] = platform
    if platform == "cpu" and host_device_count:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={host_device_count}"
            )
    import jax

    jax.config.update("jax_platforms", platform)
    try:
        from jax._src import xla_bridge

        xla_bridge._clear_backends()
    except Exception:
        pass


def enable_compile_cache(path: str = "/tmp/jax_cache") -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
