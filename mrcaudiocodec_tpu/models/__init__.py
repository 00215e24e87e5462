"""JAX/TPU engine package.

Importing this package enables the persistent XLA compilation cache: on the
sandbox's axon-tunnelled TPU the FIRST compile of a new executable takes
50-155 s (SURVEY.md §2b), so caching compiled programs across processes is
essential for usable CLI/test latency.
"""
import os

import jax

_cache_dir = os.environ.get("MRC_JAX_CACHE",
                            os.path.join(os.path.dirname(__file__), "..", "..",
                                         ".jax_cache"))
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:   # pragma: no cover - older jax without these options
    pass
