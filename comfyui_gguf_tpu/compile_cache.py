"""Persistent XLA compilation cache for serving boots.

The full-depth flux denoise compiles in ~460-520 s on the TPU backend
(docs/NOTES_ROUND2.md) — paid once per *process*. A serving restart with
identical code, shapes, and flags recompiles from scratch. JAX ships a
persistent on-disk compilation cache that keys on the HLO + compile
options + backend fingerprint; enabling it turns a warm reboot's compile
into a disk read (seconds).

Opt-in via the environment::

    GGUF_TPU_COMPILE_CACHE=/path/to/cache  python serve_flux.py ...

or programmatically with :func:`enable` before the first ``jit``
execution. Entries are written only for compiles slower than
``min_compile_time_secs`` (default 1.0 — the tiny test jits stay out of
the cache, the 8-minute model compile goes in).

The reference has no counterpart (torch eager pays no compile); this is
TPU-native serving infrastructure, same spirit as ComfyUI keeping models
resident across prompts.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_ENABLED = False


def enable(cache_dir: str, *, min_compile_time_secs: float = 1.0) -> None:
    """Turn on JAX's persistent compilation cache rooted at ``cache_dir``.

    Idempotent; safe to call from multiple entry points. Must run before
    the first compilation to benefit it (later calls still help later
    compiles).
    """
    global _ENABLED
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    # cache every entry regardless of how often it's been seen (the
    # default of 0 already does this on current jax; pin it explicitly)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without the knob
        pass
    _ENABLED = True
    log.info("persistent compilation cache at %s", cache_dir)


enable_compile_cache = enable  # package-level export name


def enable_from_env() -> bool:
    """Honor ``GGUF_TPU_COMPILE_CACHE`` if set; returns whether enabled."""
    path = os.environ.get("GGUF_TPU_COMPILE_CACHE", "")
    if path:
        enable(path)
    return _ENABLED
