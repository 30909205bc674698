"""Persistent XLA compilation cache.

The axon TPU path compiles remotely (~7 min for a full codec); the
persistent cache turns repeat runs into second-scale loads.  The env var
alone is not reliably honored under the axon plugin, so entry points call
this explicitly after importing jax."""

import os

import jax

_DEFAULT = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def enable_compile_cache(cache_dir: str | None = None) -> None:
    jax.config.update("jax_compilation_cache_dir", cache_dir or _DEFAULT)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
