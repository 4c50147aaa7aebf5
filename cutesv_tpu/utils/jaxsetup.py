"""JAX runtime setup shared by the device engine entry points."""
from __future__ import annotations

import os

_done = False


def setup_jax():
    """Enable the persistent compilation cache so separate CLI processes
    reuse compiled kernels (first TPU compile can take tens of seconds
    through a remote-compile tunnel)."""
    global _done
    if _done:
        return
    _done = True
    import jax

    cache_dir = os.environ.get(
        "CUTESV_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/cutesv_tpu_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization; never fail the pipeline over it
    # the pinned platform (e.g. a TPU plugin) can fail to register or die
    # at first dispatch; probe with a real computation so a broken backend
    # falls back here instead of crashing mid-pipeline
    def probe():
        import jax.numpy as jnp
        jax.devices()
        float(jnp.zeros((), jnp.float32) + 1.0)

    try:
        probe()
    except RuntimeError:
        try:
            jax.config.update("jax_platforms", "")
            probe()
        except Exception:
            jax.config.update("jax_platforms", "cpu")
