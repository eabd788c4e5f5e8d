"""Persistent XLA compilation cache.

UNet-in-loop graphs take tens of seconds to compile on TPU; enabling
the JAX persistent cache makes repeated runs (and bench reruns) start
instantly. Opt-in helper -- call once before the first jit executes.
"""

import os


def enable_compilation_cache(cache_dir=None):
    """Point JAX's persistent compilation cache at ``cache_dir``."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "EXASPIM_TPU_CACHE",
        os.path.expanduser("~/.cache/exaspim_tpu_xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
