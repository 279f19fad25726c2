"""Rectified-flow (flow-matching) samplers and sigma schedules.

The denoising loop is host-owned in the reference (ComfyUI's
samplers/schedulers); this framework implements it natively and
TPU-idiomatically: the whole multi-step loop is a single ``lax.scan`` under
jit, so XLA pipelines weight streaming across steps.

Schedules follow the public Flux/SD3 rectified-flow conventions:
sigma == t ∈ (0, 1], x_t = (1-σ)·x₀ + σ·noise, model predicts velocity
v = dx/dσ, Euler step x ← x + (σ_next − σ)·v.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def linear_schedule(num_steps: int) -> np.ndarray:
    """σ from 1 → 0 inclusive, num_steps+1 points (flux-schnell)."""
    return np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float32)


def shift_sigmas(sigmas: np.ndarray, shift: float) -> np.ndarray:
    """Constant time-shift: σ' = s·σ / (1 + (s−1)·σ) (SD3: s=3.0)."""
    return (shift * sigmas / (1.0 + (shift - 1.0) * sigmas)).astype(np.float32)


def flux_schedule(num_steps: int, image_seq_len: int,
                  base_shift: float = 0.5, max_shift: float = 1.15,
                  shift: bool = True) -> np.ndarray:
    """Flux-dev resolution-dependent schedule: μ interpolated in seq-len."""
    sigmas = linear_schedule(num_steps)
    if not shift:
        return sigmas
    # linear μ(seq_len) through (256, base_shift) and (4096, max_shift)
    m = (max_shift - base_shift) / (4096 - 256)
    mu = m * image_seq_len + (base_shift - m * 256)
    return shift_sigmas(sigmas, math.exp(mu))


def euler_sample(model_fn, x: jax.Array, sigmas) -> jax.Array:
    """Euler integration of the probability-flow ODE under one jit.

    model_fn(x, sigma) → velocity. sigmas: (steps+1,) descending to 0.
    """
    sigmas = jnp.asarray(sigmas, dtype=jnp.float32)

    def step(x, i):
        s_cur = sigmas[i]
        s_next = sigmas[i + 1]
        v = model_fn(x, s_cur)
        step = (s_next - s_cur) * v.astype(jnp.float32)
        return (x.astype(jnp.float32) + step).astype(x.dtype), None

    x, _ = jax.lax.scan(step, x, jnp.arange(sigmas.shape[0] - 1))
    return x


def euler_sample_inpaint(model_fn, x: jax.Array, sigmas, z0: jax.Array,
                         mask: jax.Array, key) -> jax.Array:
    """Masked Euler integration for inpainting.

    mask: 1 where the model generates, 0 where ``z0`` (the encoded source
    latent) is kept. After every step the kept region is projected onto the
    forward-noised source at the new sigma, so boundaries stay consistent
    with the noise level the model sees.
    """
    import jax as _jax

    sigmas = jnp.asarray(sigmas, dtype=jnp.float32)
    mask = mask.astype(jnp.float32)
    z0f = z0.astype(jnp.float32)

    def step(x, i):
        s_cur = sigmas[i]
        s_next = sigmas[i + 1]
        v = model_fn(x, s_cur)
        xf = x.astype(jnp.float32) + (s_next - s_cur) * v.astype(jnp.float32)
        noise = _jax.random.normal(_jax.random.fold_in(key, i), z0f.shape)
        x_keep = (1.0 - s_next) * z0f + s_next * noise
        xf = mask * xf + (1.0 - mask) * x_keep
        return xf.astype(x.dtype), None

    x, _ = jax.lax.scan(step, x, jnp.arange(sigmas.shape[0] - 1))
    return x


def cfg_wrap(model_fn, cond, uncond, scale: float):
    """Classifier-free guidance: batch cond/uncond through one forward."""
    def fn(x, sigma):
        v_c = model_fn(x, sigma, cond)
        if scale == 1.0 or uncond is None:
            return v_c
        v_u = model_fn(x, sigma, uncond)
        return v_u + scale * (v_c - v_u)
    return fn


def multistep_sample(model_fn, x: jax.Array, sigmas) -> jax.Array:
    """2nd-order Adams-Bashforth multistep for the flow ODE (the
    rectified-flow analogue of DPM-Solver++ 2M): one model call per step,
    velocity linearly extrapolated from the previous step.

    x' = x + h·((1 + 1/(2r))·v − 1/(2r)·v_prev),  r = h_prev / h.
    First step falls back to Euler. Converges ~2× tighter than Euler at
    equal step counts on smooth trajectories.
    """
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def step(carry, i):
        x, v_prev = carry
        s, s_next = sigmas[i], sigmas[i + 1]
        h = s_next - s
        v = model_fn(x, s).astype(jnp.float32)

        def ms(_):
            h_prev = s - sigmas[i - 1]
            r = h_prev / h
            return (1 + 1 / (2 * r)) * v - (1 / (2 * r)) * v_prev

        v_eff = jax.lax.cond(i > 0, ms, lambda _: v, operand=None)
        x = (x.astype(jnp.float32) + h * v_eff).astype(x.dtype)
        return (x, v), None

    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x, jnp.float32)),
                             jnp.arange(sigmas.shape[0] - 1))
    return x


def make_flow_denoiser(model_fn):
    """velocity model → σ-space denoiser: x₀̂ = x − σ·v(x, σ).

    For rectified flow (x_σ = (1−σ)·x₀ + σ·ε, v = dx/dσ) the ODE in
    x₀-prediction form is dx/dσ = (x − x₀̂)/σ — algebraically identical to
    the k-diffusion form, and the exponential-integrator step
    x' = (σ'/σ)·x + (1−σ'/σ)·x₀̂ is EXACT under locally-constant x₀̂
    (the straight-path solution x = x₀ + σ·(ε−x₀) is affine in σ). So
    every sampler in sampling/kdiffusion.py applies to flow DiTs directly
    on the flow sigmas — the same unification the reference's host UI
    uses (CONST model-sampling wraps flow models for its k-diffusion
    samplers)."""
    def denoiser(x, sigma):
        v = model_fn(x, sigma)
        return (x.astype(jnp.float32)
                - jnp.asarray(sigma, jnp.float32) * v.astype(jnp.float32)
                ).astype(x.dtype)

    return denoiser


def _sigma_space(kd_sampler, stochastic: bool = False):
    """Wrap a kdiffusion σ-space sampler as a flow sampler."""
    if stochastic:
        def run(model_fn, x, sigmas, key, **kw):
            return kd_sampler(make_flow_denoiser(model_fn), x, sigmas,
                              key, **kw)
    else:
        def run(model_fn, x, sigmas):
            return kd_sampler(make_flow_denoiser(model_fn), x, sigmas)
    return run


def _flow_kd_samplers():
    from . import kdiffusion as kd

    det = {name: _sigma_space(fn) for name, fn in kd.SAMPLERS.items()
           if name != "euler"}  # flow euler is already exact + 1-call
    return det


FLOW_SAMPLERS = {"euler": euler_sample, "multistep": multistep_sample,
                 **_flow_kd_samplers()}


def _flow_stochastic_samplers():
    from . import kdiffusion as kd

    return {name: _sigma_space(fn, stochastic=True)
            for name, fn in kd.STOCHASTIC_SAMPLERS.items()}


# stochastic flow samplers take (model_fn, x, sigmas, key, **knobs)
FLOW_STOCHASTIC_SAMPLERS = _flow_stochastic_samplers()


# process-wide default for the flow pipelines (euler matches the
# reference host's default behavior; "multistep" = 2nd-order, better at
# low step counts). Per-pipeline override: call FLOW_SAMPLERS[...] direct.
DEFAULT_FLOW_SAMPLER = "euler"


def set_flow_sampler(name: str) -> None:
    global DEFAULT_FLOW_SAMPLER
    if name not in FLOW_SAMPLERS:
        raise ValueError(f"unknown flow sampler {name!r}; "
                         f"have {sorted(FLOW_SAMPLERS)}")
    DEFAULT_FLOW_SAMPLER = name


def sample_flow(model_fn, x, sigmas, sampler: str | None = None):
    """Integrate with ``sampler`` (deterministic FLOW_SAMPLERS name) or
    the process-default flow sampler."""
    name = sampler or DEFAULT_FLOW_SAMPLER
    if name not in FLOW_SAMPLERS:
        raise ValueError(f"unknown flow sampler {name!r}; "
                         f"have {sorted(FLOW_SAMPLERS)}")
    return FLOW_SAMPLERS[name](model_fn, x, sigmas)
