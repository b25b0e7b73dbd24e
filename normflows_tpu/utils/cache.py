"""Persistent XLA compilation cache helper.

Deep unrolled flow stacks can take minutes to compile cold; the persistent
cache makes every later process start instant.  Opt-in:

    from normflows_tpu.utils import enable_compilation_cache
    enable_compilation_cache()            # defaults to ~/.cache/normflows_tpu
"""

from __future__ import annotations

import os

import jax


def enable_compilation_cache(directory: str | None = None):
    if directory is None:
        directory = os.path.join(
            os.path.expanduser("~"), ".cache", "normflows_tpu", "xla"
        )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return directory
