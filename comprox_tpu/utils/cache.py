"""Persistent XLA compilation cache setup.

The TPU (Mosaic) compile of the codec scans costs minutes per geometry; a
persistent cache makes that a one-time cost per machine.  Called from the
CLI, bench, and graft entry points before the first jit use.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "CPX_CACHE_DIR", "/tmp/comprox_tpu_xla_cache"
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1
        )
    except Exception:
        pass  # older jax: cache flags unavailable; compile cost stands
