"""Sampler correctness on analytically-solvable ODEs (no model needed)."""

import jax
import jax.numpy as jnp
import numpy as np

from comfyui_gguf_tpu.sampling import kdiffusion as kd


def _sched(n, smax=10.0, smin=0.1, end_zero=True):
    s = np.geomspace(smax, smin, n)
    if end_zero:
        s = np.append(s, 0.0)
    return jnp.asarray(s, jnp.float32)


def test_all_samplers_reach_clean_target():
    """Perfect denoiser D(x, σ) = c: every sampler must land exactly on c
    (the final σ→0 step collapses to the denoised output)."""
    c = jnp.full((2, 8), 3.5, jnp.float32)
    den = lambda x, s: c
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8)) * 10,
                     jnp.float32)
    sig = _sched(8)
    for fn in (kd.euler_sample_sigma, kd.heun_sample_sigma,
               kd.dpmpp_2m_sample_sigma):
        out = fn(den, x0, sig)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)
    out = kd.euler_ancestral_sample_sigma(den, x0, sig, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                               rtol=1e-4, atol=1e-4)


def test_second_order_beats_euler_on_power_ode():
    """D(x, σ) = x/2 → exact solution x(σ) = x0·√(σ/σ0). On a coarse
    grid the 2nd-order integrators must be closer to the exact endpoint
    than Euler."""
    den = lambda x, s: 0.5 * x
    x0 = jnp.full((4,), 8.0, jnp.float32)
    sig = _sched(6, smax=10.0, smin=0.5, end_zero=False)
    exact = 8.0 * np.sqrt(float(sig[-1]) / float(sig[0]))

    def err(fn):
        return abs(float(fn(den, x0, sig)[0]) - exact)

    e_eul = err(kd.euler_sample_sigma)
    e_heun = err(kd.heun_sample_sigma)
    e_dpm = err(kd.dpmpp_2m_sample_sigma)
    assert e_heun < e_eul, (e_heun, e_eul)
    assert e_dpm < e_eul, (e_dpm, e_eul)


def test_ancestral_eta0_equals_euler():
    den = lambda x, s: 0.3 * x
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((3, 5)),
                     jnp.float32)
    sig = _sched(7)
    a = kd.euler_ancestral_sample_sigma(den, x0, sig, jax.random.key(1),
                                        eta=0.0)
    b = kd.euler_sample_sigma(den, x0, sig)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_ancestral_is_stochastic():
    den = lambda x, s: 0.0 * x
    x0 = jnp.ones((2, 4), jnp.float32)
    sig = _sched(6, end_zero=False)
    a = kd.euler_ancestral_sample_sigma(den, x0, sig, jax.random.key(2))
    b = kd.euler_ancestral_sample_sigma(den, x0, sig, jax.random.key(3))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3


def test_flow_multistep_beats_euler():
    """Flow ODE dx/ds = -x (model v = -x), integrated DOWN the schedule:
    exact x(s_end) = x0·e^(s0-s_end). The 2nd-order multistep must land
    closer than Euler on a coarse grid."""
    from comfyui_gguf_tpu.sampling import flow_match as fm

    v_fn = lambda x, s: -x
    x0 = jnp.full((4,), 2.0, jnp.float32)
    sig = jnp.asarray(np.linspace(1.0, 0.2, 6), jnp.float32)
    exact = 2.0 * np.exp(float(sig[0]) - float(sig[-1]))
    e_eul = abs(float(fm.euler_sample(v_fn, x0, sig)[0]) - exact)
    e_ms = abs(float(fm.multistep_sample(v_fn, x0, sig)[0]) - exact)
    assert e_ms < e_eul, (e_ms, e_eul)


def test_flow_multistep_linear_exact():
    """Constant velocity integrates exactly for both."""
    from comfyui_gguf_tpu.sampling import flow_match as fm

    v_fn = lambda x, s: jnp.full_like(x, 3.0)
    x0 = jnp.zeros((2,), jnp.float32)
    sig = jnp.asarray([1.0, 0.6, 0.3, 0.0], jnp.float32)
    for fn in (fm.euler_sample, fm.multistep_sample):
        out = float(fn(v_fn, x0, sig)[0])
        np.testing.assert_allclose(out, -3.0, rtol=1e-6)
