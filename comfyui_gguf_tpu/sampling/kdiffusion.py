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


def heun_sample_sigma(denoiser, x: jax.Array, sigmas) -> jax.Array:
    """Heun (2nd-order trapezoid): Euler predictor + averaged corrector;
    2 model calls per step except the final σ→0 step (plain Euler there,
    matching k-diffusion sample_heun)."""
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def step(x, i):
        s, s_next = sigmas[i], sigmas[i + 1]
        xf = x.astype(jnp.float32)
        d = (xf - denoiser(x, s).astype(jnp.float32)) / s
        x_eul = xf + (s_next - s) * d

        def corrected(_):
            d2 = (x_eul - denoiser(x_eul.astype(x.dtype), s_next)
                  .astype(jnp.float32)) / s_next
            return xf + (s_next - s) * 0.5 * (d + d2)

        out = jax.lax.cond(s_next > 0, corrected, lambda _: x_eul,
                           operand=None)
        return out.astype(x.dtype), None

    x, _ = jax.lax.scan(step, x, jnp.arange(sigmas.shape[0] - 1))
    return x


def euler_ancestral_sample_sigma(denoiser, x: jax.Array, sigmas,
                                 key, eta: float = 1.0) -> jax.Array:
    """Euler-ancestral: stochastic σ-down/σ-up split per step
    (k-diffusion get_ancestral_step) with fresh noise each step."""
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def step(carry, i):
        x, key = carry
        s, s_next = sigmas[i], sigmas[i + 1]
        su2 = (eta ** 2 * s_next ** 2 * (s ** 2 - s_next ** 2)
               / jnp.maximum(s ** 2, 1e-12))
        su = jnp.sqrt(jnp.maximum(su2, 0.0))
        sd = jnp.sqrt(jnp.maximum(s_next ** 2 - su ** 2, 0.0))
        xf = x.astype(jnp.float32)
        d = (xf - denoiser(x, s).astype(jnp.float32)) / s
        xf = xf + (sd - s) * d
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, jnp.float32)
        xf = jnp.where(s_next > 0, xf + noise * su, xf)
        return (xf.astype(x.dtype), key), None

    (x, _), _ = jax.lax.scan(step, (x, key),
                             jnp.arange(sigmas.shape[0] - 1))
    return x


def dpmpp_2m_sample_sigma(denoiser, x: jax.Array, sigmas) -> jax.Array:
    """DPM-Solver++ (2M): multistep 2nd order in log-σ time, one model
    call per step (k-diffusion sample_dpmpp_2m). The de-facto default
    quality/speed sampler of the reference's host UI."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    eps = 1e-12

    def t_of(s):
        return -jnp.log(jnp.maximum(s, eps))

    def step(carry, i):
        x, old_denoised = carry
        s, s_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, s).astype(jnp.float32)
        t, t_next = t_of(s), t_of(s_next)
        h = t_next - t
        xf = x.astype(jnp.float32)
        ratio = s_next / s
        expm = jnp.expm1(-h)

        def first_or_last(_):
            return ratio * xf - expm * denoised

        def multistep(_):
            h_last = t - t_of(sigmas[i - 1])
            r = h_last / h
            dd = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            return ratio * xf - expm * dd

        use_ms = jnp.logical_and(i > 0, s_next > 0)
        out = jax.lax.cond(use_ms, multistep, first_or_last, operand=None)
        # final σ=0 step: exact denoised output
        out = jnp.where(s_next > 0, out, denoised)
        return (out.astype(x.dtype), denoised), None

    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x, jnp.float32)),
                             jnp.arange(sigmas.shape[0] - 1))
    return x


SAMPLERS = {
    "euler": euler_sample_sigma,
    "heun": heun_sample_sigma,
    "dpmpp_2m": dpmpp_2m_sample_sigma,
    # euler_ancestral takes (denoiser, x, sigmas, key, eta)
}
