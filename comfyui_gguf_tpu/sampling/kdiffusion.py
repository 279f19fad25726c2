"""k-diffusion-style sampling for eps-prediction UNets (SD1/SDXL).

The flow-matching sampler (flow_match.py) covers rectified-flow DiTs; the
SD UNet family is trained as discrete-time eps prediction over a beta
schedule, sampled here in continuous sigma space with the standard
k-diffusion parameterization (public EDM/k-diffusion math):

    σ_t = sqrt((1 − ᾱ_t)/ᾱ_t)            (discrete table from betas)
    denoised = x − σ·eps(x / sqrt(1+σ²), t(σ))
    Euler:  x ← x + (σ_next − σ)·(x − denoised)/σ
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ddpm_sigmas(beta_start: float = 0.00085, beta_end: float = 0.012,
                n: int = 1000) -> np.ndarray:
    """Discrete sigma table from the SD scaled-linear beta schedule."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, n,
                        dtype=np.float64) ** 2
    alphas_cumprod = np.cumprod(1.0 - betas)
    return np.sqrt((1 - alphas_cumprod) / alphas_cumprod).astype(np.float32)


def karras_schedule(num_steps: int, sigma_min: float, sigma_max: float,
                    rho: float = 7.0) -> np.ndarray:
    """Karras et al. spacing; appends σ=0. (num_steps+1,)."""
    ramp = np.linspace(0, 1, num_steps, dtype=np.float64)
    min_r = sigma_min ** (1 / rho)
    max_r = sigma_max ** (1 / rho)
    sigmas = (max_r + ramp * (min_r - max_r)) ** rho
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def normal_schedule(num_steps: int, sigma_table: np.ndarray) -> np.ndarray:
    """Evenly-spaced indices into the discrete sigma table + σ=0."""
    idx = np.linspace(len(sigma_table) - 1, 0, num_steps).round().astype(int)
    return np.concatenate([sigma_table[idx], [0.0]]).astype(np.float32)


def sigma_to_t(sigma, sigma_table) -> jax.Array:
    """Continuous timestep by log-linear interpolation into the table."""
    log_s = jnp.log(jnp.maximum(sigma, 1e-10))
    log_tab = jnp.log(jnp.asarray(sigma_table))
    # table is increasing in t; searchsorted over the log table
    idx = jnp.clip(jnp.searchsorted(log_tab, log_s), 1, len(sigma_table) - 1)
    lo, hi = log_tab[idx - 1], log_tab[idx]
    w = jnp.clip((log_s - lo) / (hi - lo), 0.0, 1.0)
    return (idx - 1 + w).astype(jnp.float32)


def make_eps_denoiser(eps_fn, sigma_table):
    """eps_fn(x_scaled, t, *cond) → denoiser(x, σ, *cond) → denoised x₀."""
    table = jnp.asarray(sigma_table)

    def denoiser(x, sigma, *cond):
        sigma = jnp.asarray(sigma, jnp.float32)
        c_in = 1.0 / jnp.sqrt(1.0 + sigma ** 2)
        t = sigma_to_t(sigma, table)
        B = x.shape[0]
        eps = eps_fn((x.astype(jnp.float32) * c_in).astype(x.dtype),
                     jnp.broadcast_to(t, (B,)), *cond)
        return (x.astype(jnp.float32)
                - sigma * eps.astype(jnp.float32)).astype(x.dtype)

    return denoiser


def make_v_denoiser(v_fn, sigma_table):
    """v-prediction variant (SD2.x / some SDXL refiners)."""
    table = jnp.asarray(sigma_table)

    def denoiser(x, sigma, *cond):
        sigma = jnp.asarray(sigma, jnp.float32)
        c_in = 1.0 / jnp.sqrt(1.0 + sigma ** 2)
        c_skip = 1.0 / (1.0 + sigma ** 2)
        c_out = -sigma * c_in
        t = sigma_to_t(sigma, table)
        B = x.shape[0]
        v = v_fn((x.astype(jnp.float32) * c_in).astype(x.dtype),
                 jnp.broadcast_to(t, (B,)), *cond)
        return (x.astype(jnp.float32) * c_skip
                + c_out * v.astype(jnp.float32)).astype(x.dtype)

    return denoiser


def euler_sample_sigma(denoiser, x: jax.Array, sigmas) -> jax.Array:
    """Euler in σ space under one jit; x starts as noise · σ_max."""
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def step(x, i):
        s = sigmas[i]
        s_next = sigmas[i + 1]
        denoised = denoiser(x, s)
        d = (x.astype(jnp.float32) - denoised.astype(jnp.float32)) / s
        return (x.astype(jnp.float32) + (s_next - s) * d).astype(x.dtype), None

    x, _ = jax.lax.scan(step, x, jnp.arange(sigmas.shape[0] - 1))
    return x
