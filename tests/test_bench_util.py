"""bench_util timing-harness guards: the three tunnel measurement traps
(value memoization, early block_until_ready on small outputs, integer
perturbation casting to +0) each produced silently-wrong rows before
their fix — these tests pin the guard behaviors."""

import numpy as np

import jax
import jax.numpy as jnp

import bench_util


def test_integer_inputs_perturb_by_roll():
    """Token-id inputs must CHANGE between reps (a 1e-3 nudge casts to
    +0 on int32 — the tunnel then memoizes the dispatch)."""
    ids = jnp.asarray(np.arange(12, dtype=np.int32).reshape(1, 12))
    seen = []

    def fn(x):
        seen.append(np.asarray(x).tolist())
        return x.astype(jnp.float32) * 2

    bench_util.timed_reps(fn, ids, reps=2, steps=1, tag="t",
                          log=lambda m: None)
    assert len(seen) == 3  # first run + 2 reps
    assert seen[1] != seen[0] and seen[2] != seen[1]
    # same multiset of values (still valid vocabulary ids)
    assert sorted(seen[1][0]) == sorted(seen[0][0])


def test_float_inputs_keep_dtype():
    """The perturbation must not promote bf16 (a f32 nudge retraced the
    jit inside the timed region and broke scan carry dtypes)."""
    x = jnp.ones((4, 4), jnp.bfloat16)
    dtypes = []

    def fn(x):
        dtypes.append(x.dtype)
        return x * 2

    bench_util.timed_reps(fn, x, reps=2, steps=1, tag="t",
                          log=lambda m: None)
    assert all(d == jnp.bfloat16 for d in dtypes)


def test_sync_small_outputs_device_gets(monkeypatch):
    """Sub-256-KB outputs must sync via device_get (block_until_ready
    returns early through the tunnel for them — observed 0.2 ms/step
    'full-depth SDXL' rows); larger outputs keep block_until_ready so
    D2H doesn't pollute the timing."""
    calls = []
    monkeypatch.setattr(jax, "device_get",
                        lambda o: calls.append("get") or o)
    monkeypatch.setattr(jax, "block_until_ready",
                        lambda o: calls.append("block") or o)
    bench_util._sync(jnp.zeros((4, 4), jnp.float32))  # 64 B
    bench_util._sync(jnp.zeros((512, 512), jnp.float32))  # 1 MB
    assert calls == ["get", "block"]
