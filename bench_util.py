"""Shared timing harness for the full-depth bench drivers.

One definition of the timed-repetition loop so every driver gets the
same two guards:

* **dtype-preserving input perturbation** — the remote-chip tunnel
  value-memoizes repeated (program, inputs) dispatches (observed:
  0.000 s repeats), so each rep nudges the input by a tiny constant.
  The nudge is cast to the input's dtype: ``x + jnp.float32(eps)``
  silently promotes a bf16 latent to f32, which retraces the jit inside
  the timed region AND (under lax.scan denoises) fails the carry-dtype
  check — both observed before this helper existed.
* compile+first-run timed separately from the reps; median reported.
"""

from __future__ import annotations

import statistics
import time


def _sync(out):
    """Wait for ``out`` for real. block_until_ready can return EARLY
    through the remote tunnel for small-output programs (observed: a
    full-depth 20-step SDXL denoise "completing" in 0.2 ms — its
    (1,128,128,4) bf16 latent is only 131 KB); device_get must produce
    the bytes, which forces execution. Only used for sub-256-KB outputs:
    the 512 KB flux latent has always synced correctly (its rows match
    independently-derived numbers), while SDXL's 131 KB did not — and
    device_get's D2H would pollute timings that don't need it."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    nbytes = sum(getattr(l, "nbytes", 0) for l in leaves)
    if nbytes < 256 << 10:
        jax.device_get(out)
    else:
        jax.block_until_ready(out)


def timed_reps(fn, x, *, reps, steps, tag, log):
    """Time ``fn(x)``: one compile+first-run, then ``reps`` perturbed
    calls. Returns (median_seconds, first_run_output)."""
    import jax
    import jax.numpy as jnp

    tc = time.perf_counter()
    out = fn(x)
    _sync(out)
    log(f"{tag} compile+first-run {time.perf_counter() - tc:.1f}s")
    times = []
    for r in range(reps):
        if jnp.issubdtype(x.dtype, jnp.integer):
            # token-id inputs: a 1e-3 nudge casts to +0 (observed: the
            # tunnel memoized t5-encode reps at 0.000 s). Roll instead —
            # same values, different arrangement, still valid ids.
            xr = jnp.roll(x, r + 1, axis=-1)
        else:
            xr = x + jnp.asarray((r + 1) * 1e-3, x.dtype)
        jax.block_until_ready(xr)
        tr = time.perf_counter()
        _sync(fn(xr))
        times.append(time.perf_counter() - tr)
    med = statistics.median(times)
    log(f"{tag} {steps}-step: {med:.3f}s ({med / steps * 1e3:.1f} ms/step; "
        f"runs {[round(t, 3) for t in times]})")
    return med, out
