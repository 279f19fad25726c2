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


def simple_schedule(num_steps: int, sigma_table: np.ndarray) -> np.ndarray:
    """Host 'simple' scheduler: even fractional strides through the
    (ascending) discrete table measured from the top — the host UI's
    σ_i = table[-(1 + ⌊(T/steps)·i⌋)] — plus σ=0. (num_steps+1,)."""
    T = len(sigma_table)
    x = T / num_steps
    sig = [float(sigma_table[-(1 + int(x * i))]) for i in range(num_steps)]
    return np.concatenate([sig, [0.0]]).astype(np.float32)


def normal_schedule(num_steps: int, sigma_table: np.ndarray) -> np.ndarray:
    """Evenly-spaced indices into the discrete sigma table + σ=0."""
    idx = np.linspace(len(sigma_table) - 1, 0, num_steps).round().astype(int)
    return np.concatenate([sigma_table[idx], [0.0]]).astype(np.float32)


def exponential_schedule(num_steps: int, sigma_min: float,
                         sigma_max: float) -> np.ndarray:
    """Log-linear sigma spacing (host 'exponential' scheduler) + σ=0."""
    sigmas = np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min),
                                num_steps, dtype=np.float64))
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def sgm_uniform_schedule(num_steps: int,
                         sigma_table: np.ndarray) -> np.ndarray:
    """Uniform timestep spacing EXCLUDING the final table entry before
    appending σ=0 (host 'sgm_uniform' scheduler — the spacing SDXL was
    trained/distilled against; 'normal' includes both endpoints)."""
    idx = np.linspace(len(sigma_table) - 1, 0,
                      num_steps + 1).round().astype(int)[:-1]
    return np.concatenate([sigma_table[idx], [0.0]]).astype(np.float32)


def ddim_uniform_schedule(num_steps: int,
                          sigma_table: np.ndarray) -> np.ndarray:
    """Host 'ddim_uniform' scheduler: stride the discrete table by
    T//steps from the top (the original DDIM timestep subset) + σ=0."""
    T = len(sigma_table)
    stride = max(T // num_steps, 1)
    idx = np.arange(1, num_steps * stride + 1, stride)[::-1]
    idx = np.clip(idx, 0, T - 1)
    return np.concatenate([sigma_table[idx], [0.0]]).astype(np.float32)


def beta_schedule(num_steps: int, sigma_table: np.ndarray,
                  alpha: float = 0.6, beta: float = 0.6) -> np.ndarray:
    """Host 'beta' scheduler (Beta(0.6, 0.6)-distributed timestep
    quantiles over the discrete table) + σ=0."""
    import scipy.stats

    T = len(sigma_table)
    ts = 1.0 - np.linspace(0.0, 1.0, num_steps, endpoint=False)
    ts = np.rint(scipy.stats.beta.ppf(ts, alpha, beta) * (T - 1))
    out, last = [], -1
    for t in ts:
        if t != last:
            out.append(sigma_table[int(t)])
        last = t
    return np.concatenate([out, [0.0]]).astype(np.float32)


def kl_optimal_schedule(num_steps: int, sigma_min: float,
                        sigma_max: float) -> np.ndarray:
    """'kl_optimal' (Align-Your-Steps paper, eq. 33): σ interpolates in
    arctan space + σ=0."""
    t = np.linspace(0.0, 1.0, num_steps, dtype=np.float64)
    sig = np.tan((1.0 - t) * np.arctan(sigma_max)
                 + t * np.arctan(sigma_min))
    return np.concatenate([sig, [0.0]]).astype(np.float32)


def linear_quadratic_schedule(num_steps: int, sigma_max: float = 1.0,
                              threshold_noise: float = 0.025,
                              linear_steps: int | None = None
                              ) -> np.ndarray:
    """Host 'linear_quadratic' scheduler (LTX-Video recipe): linear ramp
    to ``threshold_noise`` over the first half, quadratic tail after,
    scaled to σ_max, descending + σ=0."""
    if num_steps == 1:
        return np.asarray([sigma_max, 0.0], np.float32)
    lin = num_steps // 2 if linear_steps is None else linear_steps
    lin = min(max(lin, 1), num_steps - 1)
    sigma_schedule = [i * threshold_noise / lin for i in range(lin)]
    quad_steps = num_steps - lin
    # quadratic tail solving f(lin)=τ, f(n)=1, f'(lin)=τ/lin (C¹ join
    # with the linear ramp)
    threshold_noise_step_diff = lin - threshold_noise * num_steps
    quadratic_coef = threshold_noise_step_diff / (lin * quad_steps ** 2)
    linear_coef = (threshold_noise / lin
                   - 2 * threshold_noise_step_diff / (quad_steps ** 2))
    const = (threshold_noise - quadratic_coef * lin ** 2
             - linear_coef * lin)
    for i in range(lin, num_steps):
        sigma_schedule.append(quadratic_coef * i ** 2 + linear_coef * i
                              + const)
    sigma_schedule.append(1.0)
    sig = (1.0 - np.asarray(sigma_schedule, np.float64)) * sigma_max
    return np.concatenate([sig[:-1], [0.0]]).astype(np.float32)


# scheduler registry: every entry takes (num_steps, sigma_table) — the
# (σ_min, σ_max)-parameterized schedules read the table's endpoints.
# Dispatch, the error message, and the menu tests all derive from this
# one table (same pattern as SAMPLERS/STOCHASTIC_SAMPLERS below).
SCHEDULES = {
    "simple": simple_schedule,
    "normal": normal_schedule,
    "karras": lambda n, tab: karras_schedule(
        n, float(tab[0]), float(tab[-1])),
    "exponential": lambda n, tab: exponential_schedule(
        n, float(tab[0]), float(tab[-1])),
    "sgm_uniform": sgm_uniform_schedule,
    "ddim_uniform": ddim_uniform_schedule,
    "beta": beta_schedule,
    "kl_optimal": lambda n, tab: kl_optimal_schedule(
        n, float(tab[0]), float(tab[-1])),
    "linear_quadratic": lambda n, tab: linear_quadratic_schedule(
        n, float(tab[-1])),
}


def make_schedule(name: str, num_steps: int,
                  sigma_table: np.ndarray) -> np.ndarray:
    """Scheduler menu (host UI parity): name → (num_steps+1,) descending
    sigmas ending at 0, derived from the model's discrete table."""
    fn = SCHEDULES.get(name)
    if fn is None:
        raise ValueError(f"unknown scheduler {name!r}; have "
                         f"{sorted(SCHEDULES)}")
    return fn(num_steps, sigma_table)


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


def _ancestral_split(s, s_next, eta):
    """(σ_down, σ_up) per k-diffusion get_ancestral_step; σ_up clamped
    to σ_next (matters for eta > 1: without it σ_down collapses to 0 and
    x is discarded entirely)."""
    su2 = (eta ** 2 * s_next ** 2 * (s ** 2 - s_next ** 2)
           / jnp.maximum(s ** 2, 1e-12))
    su = jnp.minimum(jnp.sqrt(jnp.maximum(su2, 0.0)), s_next)
    sd = jnp.sqrt(jnp.maximum(s_next ** 2 - su ** 2, 0.0))
    return sd, su


def euler_ancestral_sample_sigma(denoiser, x: jax.Array, sigmas,
                                 key, eta: float = 1.0) -> jax.Array:
    """Euler-ancestral: stochastic σ-down/σ-up split per step
    (k-diffusion get_ancestral_step) with fresh noise each step."""
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def step(carry, i):
        x, key = carry
        s, s_next = sigmas[i], sigmas[i + 1]
        sd, su = _ancestral_split(s, s_next, eta)
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


def ddim_sample_sigma(denoiser, x: jax.Array, sigmas) -> jax.Array:
    """Deterministic DDIM == DPM-Solver-1: the exponential integrator
    x ← (σ'/σ)·x + (1 − σ'/σ)·denoised, exact under locally-constant
    x₀-prediction (the host UI's 'ddim' sampler at eta=0)."""
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def step(x, i):
        s, s_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, s).astype(jnp.float32)
        ratio = s_next / jnp.maximum(s, 1e-12)
        out = ratio * x.astype(jnp.float32) + (1.0 - ratio) * denoised
        return out.astype(x.dtype), None

    x, _ = jax.lax.scan(step, x, jnp.arange(sigmas.shape[0] - 1))
    return x


def lcm_sample_sigma(denoiser, x: jax.Array, sigmas, key) -> jax.Array:
    """Latent Consistency Model sampling (k-diffusion sample_lcm): each
    step jumps straight to the x₀-prediction, then re-noises to the next
    sigma (except the final σ=0 step)."""
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def step(carry, i):
        x, key = carry
        denoised = denoiser(x, sigmas[i]).astype(jnp.float32)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, jnp.float32)
        s_next = sigmas[i + 1]
        out = jnp.where(s_next > 0, denoised + s_next * noise, denoised)
        return (out.astype(x.dtype), key), None

    (x, _), _ = jax.lax.scan(step, (x, key),
                             jnp.arange(sigmas.shape[0] - 1))
    return x


def dpmpp_2m_sde_sample_sigma(denoiser, x: jax.Array, sigmas, key,
                              eta: float = 1.0, s_noise: float = 1.0,
                              solver: str = "midpoint") -> jax.Array:
    """DPM-Solver++ (2M) SDE (k-diffusion sample_dpmpp_2m_sde): multistep
    second order in log-σ with an SDE noise channel; one model call per
    step. ``solver`` ∈ {"midpoint", "heun"}; eta=0 is deterministic.
    Gaussian noise replaces k-diffusion's BrownianTree (same marginals,
    different fixed-seed trajectories)."""
    if solver not in ("midpoint", "heun"):
        raise ValueError(f"solver must be midpoint|heun, got {solver!r}")
    sigmas = jnp.asarray(sigmas, jnp.float32)
    eps = 1e-12

    def step(carry, i):
        x, old_denoised, key = carry
        s, s_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, s).astype(jnp.float32)
        xf = x.astype(jnp.float32)

        # h = log(σ/σ') > 0 for a descending schedule
        h = jnp.log(jnp.maximum(s, eps)) - jnp.log(jnp.maximum(s_next, eps))
        eta_h = eta * h
        ratio = s_next / jnp.maximum(s, eps)
        decay = -jnp.expm1(-h - eta_h)  # 1 - e^{-(h+ηh)}
        out = ratio * jnp.exp(-eta_h) * xf + decay * denoised

        def multistep(o):
            h_last = (jnp.log(jnp.maximum(sigmas[i - 1], eps))
                      - jnp.log(jnp.maximum(s, eps)))
            r = h / jnp.maximum(h_last, eps)
            diff = denoised - old_denoised
            if solver == "heun":
                corr = (decay / (h + eta_h) - 1.0) * r * diff
                corr = -corr  # (1 - decay/(h+ηh))·r·diff
            else:
                corr = 0.5 * decay * r * diff
            return o + corr

        out = jax.lax.cond(jnp.logical_and(i > 0, s_next > 0),
                           multistep, lambda o: o, out)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, jnp.float32)
        sde_scale = s_next * jnp.sqrt(-jnp.expm1(-2.0 * eta_h)) * s_noise
        out = jnp.where(s_next > 0, out + noise * sde_scale, denoised)
        return (out.astype(x.dtype), denoised, key), None

    (x, _, _), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x, jnp.float32), key),
        jnp.arange(sigmas.shape[0] - 1))
    return x


def dpmpp_sde_sample_sigma(denoiser, x: jax.Array, sigmas, key,
                           eta: float = 1.0, s_noise: float = 1.0,
                           r: float = 0.5) -> jax.Array:
    """DPM-Solver++ (SDE) (k-diffusion sample_dpmpp_sde): single-step
    second order — a midpoint model call at log-σ fraction ``r`` with
    ancestral noise injection at both stages; two model calls per step.
    Gaussian noise replaces k-diffusion's BrownianTree."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    eps = 1e-12

    def t_of(s):
        return -jnp.log(jnp.maximum(s, eps))

    def sig_of(t):
        return jnp.exp(-t)

    def ancestral(s_from, s_to):
        su2 = (eta ** 2 * s_to ** 2 * (s_from ** 2 - s_to ** 2)
               / jnp.maximum(s_from ** 2, eps))
        # clamp sigma_up to sigma_to like k-diffusion get_ancestral_step;
        # sigma_down derives from the UNscaled sigma_up — s_noise scales
        # only the injected noise (k-diffusion applies it at the noise
        # add, not inside the variance split)
        su = jnp.minimum(jnp.sqrt(jnp.maximum(su2, 0.0)), s_to)
        sd = jnp.sqrt(jnp.maximum(s_to ** 2 - su ** 2, 0.0))
        return sd, su * s_noise

    def step(carry, i):
        x, key = carry
        s, s_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, s).astype(jnp.float32)
        xf = x.astype(jnp.float32)

        # final σ=0 step: plain Euler to the denoised output
        euler_out = xf + (s_next - s) * (xf - denoised) / jnp.maximum(s, eps)

        t, t_next = t_of(s), t_of(s_next)
        h = t_next - t
        s_mid = sig_of(t + h * r)
        fac = 1.0 / (2.0 * r)

        # stage 1: ancestral sub-step to the midpoint sigma
        sd1, su1 = ancestral(s, s_mid)
        key, k1 = jax.random.split(key)
        ratio1 = sd1 / jnp.maximum(s, eps)
        x2 = ratio1 * xf + (1.0 - ratio1) * denoised
        x2 = x2 + jax.random.normal(k1, x.shape, jnp.float32) * su1
        denoised2 = denoiser(x2.astype(x.dtype), s_mid).astype(jnp.float32)

        # stage 2: combined-slope ancestral step to σ'
        sd2, su2_ = ancestral(s, s_next)
        key, k2 = jax.random.split(key)
        denoised_d = (1.0 - fac) * denoised + fac * denoised2
        ratio2 = sd2 / jnp.maximum(s, eps)
        out = ratio2 * xf + (1.0 - ratio2) * denoised_d
        out = out + jax.random.normal(k2, x.shape, jnp.float32) * su2_

        out = jnp.where(s_next > 0, out, euler_out)
        return (out.astype(x.dtype), key), None

    (x, _), _ = jax.lax.scan(step, (x, key),
                             jnp.arange(sigmas.shape[0] - 1))
    return x


def uni_pc_sample_sigma(denoiser, x: jax.Array, sigmas,
                        variant: str = "bh2") -> jax.Array:
    """UniPC (order 2, data prediction): unified predictor-corrector in
    λ = −log σ time, ONE model call per step — the corrector reuses the
    model output evaluated at the predicted point, which then seeds the
    next predictor (UniPC paper / the host UI's ``uni_pc`` sampler).

    All updates are the σ-space data-prediction form (α≡1):
        x_t' = (σ_t/σ_s)·x − expm1(−h)·m₀ − B(h)·Σρᵢ·D1ᵢ,  h = log(σ_s/σ_t)
    with B(h) = −h (bh1) or expm1(−h) (bh2) and ρ solved from the
    order-2 Vandermonde system in closed form. The final σ→0 step
    returns the x₀-prediction exactly.
    """
    if variant not in ("bh1", "bh2"):
        raise ValueError(f"variant must be bh1|bh2, got {variant!r}")
    sigmas = jnp.asarray(sigmas, jnp.float32)
    tiny = 1e-12

    def lam(s):
        return -jnp.log(jnp.maximum(s, tiny))

    def bh_coeffs(h):
        """(h_phi_1, B_h, b1, b2) for step size h>0 (hh = −h)."""
        hh = -h
        h_phi_1 = jnp.expm1(hh)
        B_h = hh if variant == "bh1" else jnp.expm1(hh)
        h_phi_k1 = h_phi_1 / hh - 1.0
        b1 = h_phi_k1 / B_h
        h_phi_k2 = h_phi_k1 / hh - 0.5
        b2 = h_phi_k2 * 2.0 / B_h
        return h_phi_1, B_h, b1, b2

    def step(carry, i):
        x_unc, x_prev, m_a, m_b = carry
        s_pp, s_p = sigmas[jnp.maximum(i - 2, 0)], sigmas[jnp.maximum(i - 1, 0)]
        s, s_next = sigmas[i], sigmas[i + 1]
        m_t = denoiser(x_unc, s).astype(jnp.float32)
        xf_unc = x_unc.astype(jnp.float32)

        # ---- corrector for the point σ_i (uses m_t, free NFE) ----
        h_c = lam(s) - lam(s_p)
        h_phi_1c, B_hc, b1c, b2c = bh_coeffs(h_c)
        x_t_c = (s / jnp.maximum(s_p, tiny)) * x_prev - h_phi_1c * m_a
        D1_t = m_t - m_a
        # order-1 corrector (used at i == 1): UniPC hardcodes ρ = 0.5
        # here (this is where bh1/bh2 differ — B(h) does NOT cancel)
        x_c1 = x_t_c - B_hc * (0.5 * D1_t)
        # order-2 corrector (i >= 2): extra point σ_{i-2}
        r1c = (lam(s_pp) - lam(s_p)) / h_c
        D1_0c = (m_b - m_a) / jnp.where(r1c == 0, 1.0, r1c)
        rho0 = (b2c - b1c) / jnp.where(r1c == 1.0, tiny, r1c - 1.0)
        rho1 = b1c - rho0
        x_c2 = x_t_c - B_hc * (rho0 * D1_0c + rho1 * D1_t)
        x_cur = jnp.where(i == 0, xf_unc,
                          jnp.where(i == 1, x_c1, x_c2))

        # ---- predictor σ_i → σ_{i+1} ----
        h = lam(s_next) - lam(s)
        h_phi_1, B_h, b1, _ = bh_coeffs(h)
        ratio = s_next / jnp.maximum(s, tiny)
        x_t_ = ratio * x_cur - h_phi_1 * m_t
        r1 = (lam(s_p) - lam(s)) / h
        D1_0 = (m_a - m_t) / jnp.where(r1 == 0, 1.0, r1)
        # order-2 predictor: UniPC hardcodes ρ = 0.5 (bh-variant-bearing)
        x_p2 = x_t_ - B_h * (0.5 * D1_0)
        x_next = jnp.where(i == 0, x_t_, x_p2)  # first step: order 1
        x_next = jnp.where(s_next > 0, x_next, m_t)

        return (x_next.astype(x.dtype), x_cur.astype(x.dtype),
                m_t, m_a), None

    z = jnp.zeros_like(x, jnp.float32)
    (x_out, _, _, _), _ = jax.lax.scan(
        step, (x, x, z, z), jnp.arange(sigmas.shape[0] - 1))
    return x_out


def dpm_2_sample_sigma(denoiser, x: jax.Array, sigmas) -> jax.Array:
    """DPM-Solver-2 (deterministic midpoint, k-diffusion sample_dpm_2):
    evaluate d at σ, take a half step to the log-cubic midpoint
    σ_mid = ((σ^⅓+σ'^⅓)/2)³, re-evaluate, full step with d_mid. Two
    model calls per step; plain Euler on the final σ→0 step."""
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def step(x, i):
        s, s_next = sigmas[i], sigmas[i + 1]
        xf = x.astype(jnp.float32)
        d = (xf - denoiser(x, s).astype(jnp.float32)) / s

        def midpoint(_):
            s_mid = ((s ** (1 / 3) + s_next ** (1 / 3)) / 2) ** 3
            x2 = xf + (s_mid - s) * d
            d2 = (x2 - denoiser(x2.astype(x.dtype), s_mid)
                  .astype(jnp.float32)) / s_mid
            return xf + (s_next - s) * d2

        out = jax.lax.cond(s_next > 0, midpoint,
                           lambda _: xf + (s_next - s) * d, operand=None)
        return out.astype(x.dtype), None

    x, _ = jax.lax.scan(step, x, jnp.arange(sigmas.shape[0] - 1))
    return x


def dpm_2_ancestral_sample_sigma(denoiser, x: jax.Array, sigmas, key,
                                 eta: float = 1.0) -> jax.Array:
    """DPM-Solver-2 ancestral (k-diffusion sample_dpm_2_ancestral): the
    midpoint step integrates to the ancestral σ_down, fresh noise at
    σ_up re-inflates. eta=0 degrades exactly to dpm_2."""
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def step(carry, i):
        x, key = carry
        s, s_next = sigmas[i], sigmas[i + 1]
        sd, su = _ancestral_split(s, s_next, eta)
        xf = x.astype(jnp.float32)
        d = (xf - denoiser(x, s).astype(jnp.float32)) / s

        def midpoint(_):
            s_mid = ((s ** (1 / 3) + sd ** (1 / 3)) / 2) ** 3
            x2 = xf + (s_mid - s) * d
            d2 = (x2 - denoiser(x2.astype(x.dtype), s_mid)
                  .astype(jnp.float32)) / s_mid
            return xf + (sd - s) * d2

        out = jax.lax.cond(sd > 0, midpoint,
                           lambda _: xf + (sd - s) * d, operand=None)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, jnp.float32)
        out = jnp.where(s_next > 0, out + noise * su, out)
        return (out.astype(x.dtype), key), None

    (x, _), _ = jax.lax.scan(step, (x, key),
                             jnp.arange(sigmas.shape[0] - 1))
    return x


def dpmpp_2s_ancestral_sample_sigma(denoiser, x: jax.Array, sigmas, key,
                                    eta: float = 1.0) -> jax.Array:
    """DPM-Solver++ (2S) ancestral (k-diffusion
    sample_dpmpp_2s_ancestral): a single-step 2nd-order exponential-
    integrator update to the ancestral σ_down (midpoint in log-σ time),
    fresh noise at σ_up. eta=0 is the deterministic 2S solver; the
    σ_down=0 tail degrades to the exact Euler→denoised step."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    eps = 1e-12

    def step(carry, i):
        x, key = carry
        s, s_next = sigmas[i], sigmas[i + 1]
        sd, su = _ancestral_split(s, s_next, eta)
        denoised = denoiser(x, s).astype(jnp.float32)
        xf = x.astype(jnp.float32)

        def euler(_):
            d = (xf - denoised) / s
            return xf + (sd - s) * d

        def two_s(_):
            t = -jnp.log(jnp.maximum(s, eps))
            t_next = -jnp.log(jnp.maximum(sd, eps))
            h = t_next - t
            s_mid = jnp.exp(-(t + 0.5 * h))
            x2 = (s_mid / s) * xf - jnp.expm1(-0.5 * h) * denoised
            den2 = denoiser(x2.astype(x.dtype), s_mid).astype(jnp.float32)
            return (sd / s) * xf - jnp.expm1(-h) * den2

        out = jax.lax.cond(sd > 0, two_s, euler, operand=None)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, jnp.float32)
        out = jnp.where(s_next > 0, out + noise * su, out)
        return (out.astype(x.dtype), key), None

    (x, _), _ = jax.lax.scan(step, (x, key),
                             jnp.arange(sigmas.shape[0] - 1))
    return x


def dpmpp_3m_sde_sample_sigma(denoiser, x: jax.Array, sigmas, key,
                              eta: float = 1.0) -> jax.Array:
    """DPM-Solver++ (3M) SDE (k-diffusion sample_dpmpp_3m_sde): 3rd-
    order multistep in log-σ time with an exponential-decay SDE noise
    channel. Order warms up 1→2→3 over the first steps (the counter
    gates the φ₂/φ₃ correction terms — jnp.where keeps the scan body
    shape-static); eta=0 is the deterministic 3M solver. Both history
    slots live in the scan carry; all branches stay finite so the
    unselected where-arms never poison the selected one."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    eps = 1e-12

    def step(carry, i):
        x, key, den1, den2, h1, h2 = carry
        s, s_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, s).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        t = -jnp.log(jnp.maximum(s, eps))
        t_next = -jnp.log(jnp.maximum(s_next, eps))
        h = t_next - t
        h_eta = h * (eta + 1.0)
        x_base = jnp.exp(-h_eta) * xf - jnp.expm1(-h_eta) * denoised

        phi2 = jnp.expm1(-h_eta) / h_eta + 1.0
        phi3 = phi2 / h_eta - 0.5
        r0 = jnp.maximum(h1 / h, eps)
        r1 = jnp.maximum(h2 / h, eps)
        d1_0 = (denoised - den1) / r0
        d1_1 = (den1 - den2) / r1
        d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
        d2 = (d1_0 - d1_1) / (r0 + r1)
        x3 = x_base + phi2 * d1 - phi3 * d2
        x2_ = x_base + phi2 * d1_0
        out = jnp.where(i >= 2, x3, jnp.where(i == 1, x2_, x_base))

        if eta > 0:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, jnp.float32)
            amp = s_next * jnp.sqrt(
                jnp.maximum(-jnp.expm1(-2.0 * h * eta), 0.0))
            out = out + noise * amp
        # final σ=0 step: exact denoised output
        out = jnp.where(s_next > 0, out, denoised)
        return (out.astype(x.dtype), key, denoised, den1, h, h1), None

    z = jnp.zeros_like(x, jnp.float32)
    one = jnp.ones((), jnp.float32)
    (x, *_), _ = jax.lax.scan(step, (x, key, z, z, one, one),
                              jnp.arange(sigmas.shape[0] - 1))
    return x


def ipndm_sample_sigma(denoiser, x: jax.Array, sigmas) -> jax.Array:
    """iPNDM: 4th-order Adams–Bashforth on d over σ (ComfyUI/k-diffusion
    sampler_ipndm), warming up through orders 1→4 — one model call per
    step, multistep history in the scan carry."""
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def step(carry, i):
        x, d1, d2, d3 = carry
        s, s_next = sigmas[i], sigmas[i + 1]
        xf = x.astype(jnp.float32)
        d = (xf - denoiser(x, s).astype(jnp.float32)) / s
        dt = s_next - s
        o1 = d
        o2 = (3 * d - d1) / 2
        o3 = (23 * d - 16 * d1 + 5 * d2) / 12
        o4 = (55 * d - 59 * d1 + 37 * d2 - 9 * d3) / 24
        upd = jnp.where(i >= 3, o4,
                        jnp.where(i == 2, o3, jnp.where(i == 1, o2, o1)))
        out = xf + dt * upd
        return (out.astype(x.dtype), d, d1, d2), None

    z = jnp.zeros_like(x, jnp.float32)
    (x, _, _, _), _ = jax.lax.scan(step, (x, z, z, z),
                                   jnp.arange(sigmas.shape[0] - 1))
    return x


def _lms_coeffs(sigmas: np.ndarray, order: int = 4) -> np.ndarray:
    """(n_steps, order) exact Lagrange-basis integral coefficients for
    linear multistep over the σ grid: coeff[i, j] = ∫_{σ_i}^{σ_{i+1}}
    Π_{k≠j} (τ−σ_{i−k})/(σ_{i−j}−σ_{i−k}) dτ — computed with exact
    polynomial integration (np.poly1d), not quadrature."""
    n = len(sigmas) - 1
    # always 4 columns so the scan body's fixed 4-term sum stays in
    # bounds for lower orders (extra columns are exact zeros)
    out = np.zeros((n, max(order, 4)), np.float64)
    for i in range(n):
        cur = min(i + 1, order)
        for j in range(cur):
            p = np.poly1d([1.0])
            for k in range(cur):
                if k == j:
                    continue
                p *= np.poly1d(
                    [1.0, -sigmas[i - k]]) / (sigmas[i - j] - sigmas[i - k])
            ip = p.integ()
            out[i, j] = ip(sigmas[i + 1]) - ip(sigmas[i])
    return out.astype(np.float32)


def _lms_coeffs_jnp(sigmas, order: int = 4):
    """Traced-compatible closed-form twin of _lms_coeffs: the Lagrange
    basis of ≤3 roots expands to a cubic whose integral is analytic, so
    the (n_steps, 4) coefficient matrix builds from jnp arithmetic —
    needed because pipelines jit the whole sampler (sigmas arrive as
    tracers, the np.poly1d path cannot run)."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    n = sigmas.shape[0] - 1

    def poly_int(lo, hi, roots):
        # ∫ Π (τ − r) dτ over [lo, hi] for 0..3 roots (padded with None)
        a = [r for r in roots if r is not None]
        e1 = sum(a) if a else 0.0
        e2 = (a[0] * a[1] + (a[0] + a[1]) * a[2] if len(a) == 3 else
              a[0] * a[1] if len(a) == 2 else 0.0)
        e3 = a[0] * a[1] * a[2] if len(a) == 3 else 0.0
        deg = len(a)
        def F(t):
            if deg == 0:
                return t
            if deg == 1:
                return t ** 2 / 2 - e1 * t
            if deg == 2:
                return t ** 3 / 3 - e1 * t ** 2 / 2 + e2 * t
            return (t ** 4 / 4 - e1 * t ** 3 / 3 + e2 * t ** 2 / 2
                    - e3 * t)
        return F(hi) - F(lo)

    def row(i):
        cur = jnp.minimum(i + 1, order)
        s = [sigmas[jnp.maximum(i - k, 0)] for k in range(4)]
        lo, hi = sigmas[i], sigmas[i + 1]
        cols = []
        for j in range(4):
            # coefficient of d_{i-j} at each possible order; select the
            # active order's value (0 when j >= order)
            variants = []
            for o in range(1, 5):
                if j >= o:
                    variants.append(jnp.float32(0))
                    continue
                roots = [s[k] if k != j else None for k in range(o)]
                den = 1.0
                for k in range(o):
                    if k != j:
                        den = den * (s[j] - s[k])
                variants.append(poly_int(lo, hi, roots) / den)
        # jnp.select over the order warmup
            cols.append(jnp.select([cur == o for o in range(1, 5)],
                                   variants))
        return jnp.stack(cols)

    return jax.vmap(row)(jnp.arange(n))


def lms_sample_sigma(denoiser, x: jax.Array, sigmas,
                     order: int = 4) -> jax.Array:
    """Linear multistep (k-diffusion sample_lms, default order 4): the
    per-step coefficients are exact integrals of the Lagrange basis over
    each σ interval — computed host-side in float64 when the schedule is
    concrete (the usual case), or via the closed-form jnp twin when the
    sampler is traced with the rest of a pipeline."""
    sig_in = jnp.asarray(sigmas)
    if isinstance(sig_in, jax.core.Tracer):
        coeffs = _lms_coeffs_jnp(sig_in, order)
    else:
        sig_np = np.asarray(jax.device_get(sig_in), np.float64)
        coeffs = jnp.asarray(_lms_coeffs(sig_np, order))
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def step(carry, i):
        x, d1, d2, d3 = carry
        s = sigmas[i]
        xf = x.astype(jnp.float32)
        d = (xf - denoiser(x, s).astype(jnp.float32)) / s
        c = coeffs[i]
        out = xf + c[0] * d + c[1] * d1 + c[2] * d2 + c[3] * d3
        return (out.astype(x.dtype), d, d1, d2), None

    z = jnp.zeros_like(x, jnp.float32)
    (x, _, _, _), _ = jax.lax.scan(step, (x, z, z, z),
                                   jnp.arange(sigmas.shape[0] - 1))
    return x


SAMPLERS = {
    "euler": euler_sample_sigma,
    "heun": heun_sample_sigma,
    "dpmpp_2m": dpmpp_2m_sample_sigma,
    "ddim": ddim_sample_sigma,
    "uni_pc": uni_pc_sample_sigma,
    "dpm_2": dpm_2_sample_sigma,
    "ipndm": ipndm_sample_sigma,
    "lms": lms_sample_sigma,
}

# stochastic samplers take (denoiser, x, sigmas, key, **knobs)
STOCHASTIC_SAMPLERS = {
    "euler_ancestral": euler_ancestral_sample_sigma,
    "lcm": lcm_sample_sigma,
    "dpmpp_2m_sde": dpmpp_2m_sde_sample_sigma,
    "dpmpp_sde": dpmpp_sde_sample_sigma,
    "dpm_2_ancestral": dpm_2_ancestral_sample_sigma,
    "dpmpp_2s_ancestral": dpmpp_2s_ancestral_sample_sigma,
    "dpmpp_3m_sde": dpmpp_3m_sde_sample_sigma,
}


def euler_sample_sigma_inpaint(denoiser, x: jax.Array, sigmas, z0, mask,
                               key) -> jax.Array:
    """Masked Euler in σ space (eps-model inpainting): after every step
    the kept region (mask == 0) is re-projected onto the forward-noised
    source z0 + σ'·ε at the new sigma, so boundaries stay consistent
    with the noise level the model sees (σ-space analogue of
    flow_match.euler_sample_inpaint)."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    mask = mask.astype(jnp.float32)
    z0f = z0.astype(jnp.float32)

    def step(x, i):
        s, s_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, s).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        d = (xf - denoised) / s
        xf = xf + (s_next - s) * d
        noise = jax.random.normal(jax.random.fold_in(key, i), z0f.shape)
        x_keep = z0f + s_next * noise
        xf = mask * xf + (1.0 - mask) * x_keep
        return xf.astype(x.dtype), None

    x, _ = jax.lax.scan(step, x, jnp.arange(sigmas.shape[0] - 1))
    return x


def run_sampler(name: str, denoiser, x, sigmas, key=None, **knobs):
    """Dispatch by name across both tables; stochastic samplers require
    ``key`` (jittable — key may be a traced value)."""
    if name in SAMPLERS:
        return SAMPLERS[name](denoiser, x, sigmas, **knobs)
    if name in STOCHASTIC_SAMPLERS:
        if key is None:
            raise ValueError(f"sampler {name!r} is stochastic: pass key=")
        return STOCHASTIC_SAMPLERS[name](denoiser, x, sigmas, key, **knobs)
    raise ValueError(f"unknown sampler {name!r}; have "
                     f"{sorted(SAMPLERS) + sorted(STOCHASTIC_SAMPLERS)}")
