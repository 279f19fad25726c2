"""Persistent compilation cache (compile_cache.py): serving reboots reuse
the full-depth model compile instead of paying it again."""

import os

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu import compile_cache


def test_enable_writes_and_reuses_entries(tmp_path, monkeypatch):
    d = str(tmp_path / "cc")
    compile_cache.enable(d, min_compile_time_secs=0.0)
    try:
        @jax.jit
        def f(x):
            return (x @ x.T).sum() * 3

        f(jnp.ones((32, 32))).block_until_ready()
        entries = os.listdir(d)
        assert entries, "no cache entries written"

        # a fresh trace of the same computation hits the cache (no error,
        # same result) — full reuse is cross-process, asserted by entry
        # presence above
        @jax.jit
        def g(x):
            return (x @ x.T).sum() * 3

        out = g(jnp.ones((32, 32)))
        assert float(out) == float(f(jnp.ones((32, 32))))
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_enable_from_env(tmp_path, monkeypatch):
    d = str(tmp_path / "envcc")
    monkeypatch.setenv("GGUF_TPU_COMPILE_CACHE", d)
    try:
        assert compile_cache.enable_from_env()
        assert os.path.isdir(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
