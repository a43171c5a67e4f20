"""Persistent XLA compilation cache.

First use of any pipeline shape pays the XLA compile (tens of seconds on
remote-compiled TPU backends); enabling the on-disk cache makes every
later process start instantly for known shapes. Called by the Explorer,
the worker, the CLI and ``bench.py``; override the location with
``THZ_XLA_CACHE`` (set to ``off`` to disable).
"""

from __future__ import annotations

import os

_done = False


def enable_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    path = os.environ.get("THZ_XLA_CACHE")
    if path == "off":
        return
    if not path:
        path = os.path.expanduser("~/.cache/thz_image_explorer_tpu/xla")
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Persist small programs too: at the default 0.5 s floor, six
        # helper programs (device_zeros, load kernel, window plot, ...)
        # recompiled in EVERY fresh process, adding ~2.3 s to every warm
        # open (scripts/diag_firstopen.py, 2026-08-19). 0.05 s still
        # excludes trivial scalar dispatches from the cache dir.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
    except Exception:  # cache is an optimization, never a failure
        pass
