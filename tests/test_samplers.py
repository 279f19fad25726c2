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


def test_new_samplers_reach_clean_target():
    """Perfect denoiser D(x, σ) = c: ddim/lcm/dpmpp-sde family all land
    exactly on c."""
    c = jnp.full((2, 8), 3.5, jnp.float32)
    den = lambda x, s: jnp.broadcast_to(c, x.shape)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8)) * 10,
                     jnp.float32)
    sig = _sched(8)
    out = kd.ddim_sample_sigma(den, x0, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                               rtol=1e-4, atol=1e-4)
    for fn in (kd.lcm_sample_sigma, kd.dpmpp_2m_sde_sample_sigma,
               kd.dpmpp_sde_sample_sigma):
        out = fn(den, x0, sig, jax.random.key(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)


def test_ddim_exact_for_constant_denoised_any_grid():
    """DDIM's exponential-integrator step telescopes: for constant
    denoised c it gives (σ_end/σ_0)·x + (1−σ_end/σ_0)·c EXACTLY at any
    step count — including a 2-step coarse grid NOT ending at 0."""
    c = 3.5
    den = lambda x, s: jnp.full_like(x, c)
    x0 = jnp.full((4,), -7.0, jnp.float32)
    for sig in (_sched(2, end_zero=False), _sched(9, end_zero=False)):
        out = kd.ddim_sample_sigma(den, x0, sig)
        ratio = float(sig[-1] / sig[0])
        want = ratio * (-7.0) + (1 - ratio) * c
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5,
                                   atol=1e-5)


def test_dpmpp_2m_sde_eta0_matches_ddim_on_constant():
    """With eta=0 the SDE channel vanishes; on a constant-denoised field
    the multistep correction is 0 so 2M-SDE == DDIM exactly."""
    den = lambda x, s: jnp.full_like(x, 2.0)
    x0 = jnp.full((4,), 9.0, jnp.float32)
    sig = _sched(6, end_zero=False)
    a = kd.dpmpp_2m_sde_sample_sigma(den, x0, sig, jax.random.key(1),
                                     eta=0.0)
    b = kd.ddim_sample_sigma(den, x0, sig)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_dpmpp_sde_eta0_second_order():
    """eta=0 dpmpp_sde is a deterministic 2nd-order method: on
    D(x,σ)=x/2 it beats Euler on a coarse grid."""
    den = lambda x, s: 0.5 * x
    x0 = jnp.full((4,), 8.0, jnp.float32)
    sig = _sched(6, end_zero=False)
    exact = 8.0 * np.sqrt(float(sig[-1]) / float(sig[0]))
    e_euler = abs(float(kd.euler_sample_sigma(den, x0, sig)[0]) - exact)
    e_sde = abs(float(kd.dpmpp_sde_sample_sigma(
        den, x0, sig, jax.random.key(0), eta=0.0)[0]) - exact)
    assert e_sde < e_euler, (e_sde, e_euler)


def test_2m_sde_solvers_agree_smooth_field():
    """midpoint vs heun correction: both 2nd-order, small gap on a
    smooth field, and both stochastic draws differ from eta=0."""
    den = lambda x, s: 0.5 * x
    x0 = jnp.full((4,), 8.0, jnp.float32)
    sig = _sched(12, end_zero=False)
    key = jax.random.key(2)
    m = kd.dpmpp_2m_sde_sample_sigma(den, x0, sig, key, eta=0.0,
                                     solver="midpoint")
    h = kd.dpmpp_2m_sde_sample_sigma(den, x0, sig, key, eta=0.0,
                                     solver="heun")
    np.testing.assert_allclose(np.asarray(m), np.asarray(h), rtol=0.02)
    s = kd.dpmpp_2m_sde_sample_sigma(den, x0, sig, key, eta=1.0)
    assert not np.allclose(np.asarray(s), np.asarray(m))


def test_lcm_final_step_is_denoised():
    """1-step LCM: output IS the x₀-prediction (no re-noise at σ=0)."""
    den = lambda x, s: jnp.full_like(x, 1.25)
    x0 = jnp.full((3,), 50.0, jnp.float32)
    sig = jnp.asarray([10.0, 0.0], jnp.float32)
    out = kd.lcm_sample_sigma(den, x0, sig, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out), 1.25, atol=1e-6)


def test_flow_sigma_space_samplers_exact_constant_x0():
    """Flow adapter: velocity v = (x − c)/σ (constant x₀-prediction c).
    ddim/dpmpp_2m through make_flow_denoiser land exactly on c from any
    start — the exponential integrator is exact for straight-path flow."""
    from comfyui_gguf_tpu.sampling import flow_match as fm

    c = 2.25
    def vel(x, s):
        return (x.astype(jnp.float32) - c) / jnp.maximum(
            jnp.asarray(s, jnp.float32), 1e-12)

    x0 = jnp.full((2, 4), -5.0, jnp.float32)
    sig = jnp.asarray(np.linspace(1.0, 0.0, 4), jnp.float32)
    for name in ("ddim", "dpmpp_2m", "heun"):
        out = fm.FLOW_SAMPLERS[name](vel, x0, sig)
        np.testing.assert_allclose(np.asarray(out), c, rtol=1e-4,
                                   atol=1e-4, err_msg=name)
    out = fm.FLOW_STOCHASTIC_SAMPLERS["dpmpp_2m_sde"](
        vel, x0, sig, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out), c, rtol=1e-4, atol=1e-4)


def test_flow_euler_matches_ddim_converged():
    """On a nonlinear flow field both integrators converge to the same
    endpoint at high step count (probability-flow ODE uniqueness)."""
    from comfyui_gguf_tpu.sampling import flow_match as fm

    def vel(x, s):
        return jnp.tanh(x) * (1.0 + jnp.asarray(s, jnp.float32))

    x0 = jnp.full((2,), 0.7, jnp.float32)
    sig = jnp.asarray(np.linspace(1.0, 0.0, 257), jnp.float32)
    a = fm.FLOW_SAMPLERS["euler"](vel, x0, sig)
    b = fm.FLOW_SAMPLERS["ddim"](vel, x0, sig)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-3)


def test_new_schedules():
    expo = kd.exponential_schedule(10, 0.03, 14.6)
    assert len(expo) == 11 and expo[-1] == 0.0
    assert np.allclose(np.diff(np.log(expo[:-1])),
                       np.diff(np.log(expo[:-1]))[0])
    table = kd.ddpm_sigmas()
    sgm = kd.sgm_uniform_schedule(8, table)
    norm = kd.normal_schedule(8, table)
    assert len(sgm) == 9 and sgm[-1] == 0.0
    # sgm_uniform excludes the σ_min table endpoint; normal includes it
    assert sgm[-2] > norm[-2]
    assert np.all(np.diff(sgm[:-1]) < 0)


def test_uni_pc_reaches_clean_target():
    c = jnp.full((2, 8), 3.5, jnp.float32)
    den = lambda x, s: jnp.broadcast_to(c, x.shape)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8)) * 10,
                     jnp.float32)
    for variant in ("bh1", "bh2"):
        out = kd.uni_pc_sample_sigma(den, x0, _sched(8), variant=variant)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)


def test_uni_pc_exact_constant_denoised_no_zero():
    """Constant x₀-prediction: D1 terms vanish, so UniPC telescopes to
    the exact exponential-integrator endpoint like DDIM."""
    den = lambda x, s: jnp.full_like(x, 2.0)
    x0 = jnp.full((4,), 9.0, jnp.float32)
    sig = _sched(6, end_zero=False)
    a = kd.uni_pc_sample_sigma(den, x0, sig)
    b = kd.ddim_sample_sigma(den, x0, sig)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_uni_pc_second_order():
    """On D(x,σ)=x/2 (exact: x0·√(σ_end/σ_0)) UniPC-bh2 must beat Euler
    decisively at equal NFE and converge at 2nd order (halving h cuts
    the error ≳3×, vs 2× for a 1st-order method)."""
    den = lambda x, s: 0.5 * x
    x0 = jnp.full((4,), 8.0, jnp.float32)

    def err(n):
        sig = _sched(n, end_zero=False)
        exact = 8.0 * np.sqrt(float(sig[-1]) / float(sig[0]))
        return abs(float(kd.uni_pc_sample_sigma(den, x0, sig)[0]) - exact)

    sig6 = _sched(6, end_zero=False)
    exact6 = 8.0 * np.sqrt(float(sig6[-1]) / float(sig6[0]))
    e_euler = abs(float(kd.euler_sample_sigma(den, x0, sig6)[0]) - exact6)
    assert err(6) < e_euler / 3, (err(6), e_euler)
    assert err(11) < err(6) / 3, (err(11), err(6))


def test_uni_pc_through_flow_adapter():
    from comfyui_gguf_tpu.sampling import flow_match as fm

    c = 2.25
    def vel(x, s):
        return (x.astype(jnp.float32) - c) / jnp.maximum(
            jnp.asarray(s, jnp.float32), 1e-12)

    x0 = jnp.full((2, 4), -5.0, jnp.float32)
    sig = jnp.asarray(np.linspace(1.0, 0.0, 5), jnp.float32)
    out = fm.FLOW_SAMPLERS["uni_pc"](vel, x0, sig)
    np.testing.assert_allclose(np.asarray(out), c, rtol=1e-4, atol=1e-4)


def test_ancestral_eta2_clamped_still_converges():
    """eta > 1: sigma_up clamps to sigma_to (k-diffusion), so the
    trajectory retains the deterministic component and a perfect
    denoiser still lands exactly on its target."""
    c = jnp.full((2, 8), 3.5, jnp.float32)
    den = lambda x, s: jnp.broadcast_to(c, x.shape)
    x0 = jnp.full((2, 8), -20.0, jnp.float32)
    sig = _sched(8)
    out = kd.euler_ancestral_sample_sigma(den, x0, sig, jax.random.key(0),
                                          eta=2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(c), rtol=1e-4,
                               atol=1e-4)
    out2 = kd.dpmpp_sde_sample_sigma(den, x0, sig, jax.random.key(0),
                                     eta=2.0)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(c), rtol=1e-4,
                               atol=1e-4)


def test_dpm2_ipndm_lms_reach_or_approach_clean_target():
    """Perfect denoiser: dpm_2 lands exactly (final σ→0 step is Euler
    with d = (x−c)/σ); ipndm/lms approach c tightly (their multistep
    tails don't collapse the last step to pure Euler, matching
    k-diffusion)."""
    c = jnp.full((2, 8), 3.5, jnp.float32)
    den = lambda x, s: c
    x0 = jnp.asarray(np.random.default_rng(3).standard_normal((2, 8)) * 10,
                     jnp.float32)
    sig = _sched(10)
    np.testing.assert_allclose(np.asarray(kd.dpm_2_sample_sigma(
        den, x0, sig)), np.asarray(c), rtol=1e-4, atol=1e-4)
    for fn in (kd.ipndm_sample_sigma, kd.lms_sample_sigma):
        out = np.asarray(fn(den, x0, sig))
        assert np.abs(out - 3.5).max() < 0.2, fn


def test_new_multistep_samplers_beat_euler_on_power_ode():
    den = lambda x, s: 0.5 * x
    x0 = jnp.full((4,), 8.0, jnp.float32)
    sig = _sched(8, smax=10.0, smin=0.5, end_zero=False)
    exact = 8.0 * np.sqrt(float(sig[-1]) / float(sig[0]))

    def err(fn):
        return abs(float(fn(den, x0, sig)[0]) - exact)

    e_eul = err(kd.euler_sample_sigma)
    for fn in (kd.dpm_2_sample_sigma, kd.ipndm_sample_sigma,
               kd.lms_sample_sigma):
        assert err(fn) < e_eul, (fn, err(fn), e_eul)


def test_dpm2_ancestral_eta0_equals_dpm2():
    den = lambda x, s: 0.3 * x
    x0 = jnp.asarray(np.random.default_rng(5).standard_normal((3, 5)),
                     jnp.float32)
    sig = _sched(7)
    a = kd.dpm_2_ancestral_sample_sigma(den, x0, sig, jax.random.key(2),
                                        eta=0.0)
    b = kd.dpm_2_sample_sigma(den, x0, sig)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_lms_coeffs_order1_is_euler():
    """With order=1 the Lagrange integral degenerates to Δσ — LMS must
    equal Euler exactly on any grid."""
    sig = np.asarray(_sched(6), np.float64)
    c = kd._lms_coeffs(sig, order=1)
    np.testing.assert_allclose(c[:, 0], np.diff(sig), rtol=1e-6)
    den = lambda x, s: 0.4 * x
    x0 = jnp.asarray(np.random.default_rng(6).standard_normal((4,)),
                     jnp.float32)
    a = kd.lms_sample_sigma(den, x0, jnp.asarray(sig, jnp.float32),
                            order=1)
    b = kd.euler_sample_sigma(den, x0, jnp.asarray(sig, jnp.float32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_run_sampler_dispatch_new_names():
    den = lambda x, s: jnp.zeros_like(x)
    x0 = jnp.ones((2, 2), jnp.float32)
    sig = _sched(4)
    for name in ("dpm_2", "ipndm", "lms"):
        out = kd.run_sampler(name, den, x0, sig)
        assert np.isfinite(np.asarray(out)).all()
    out = kd.run_sampler("dpm_2_ancestral", den, x0, sig,
                         key=jax.random.key(0))
    assert np.isfinite(np.asarray(out)).all()


def test_lms_jnp_coeffs_match_host_and_traced_pipeline_path():
    """The closed-form traced coefficient path must match the float64
    host integrals, and lms must run under jit with traced sigmas (the
    pipelines jit the whole sampler)."""
    sig = np.asarray(_sched(7), np.float64)
    a = kd._lms_coeffs(sig, order=4)
    b = np.asarray(kd._lms_coeffs_jnp(jnp.asarray(sig, jnp.float32)))
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)

    den = lambda x, s: 0.4 * x
    x0 = jnp.asarray(np.random.default_rng(7).standard_normal((4,)),
                     jnp.float32)
    f = jax.jit(lambda sig: kd.lms_sample_sigma(den, x0, sig))
    got = np.asarray(f(jnp.asarray(sig, jnp.float32)))
    want = np.asarray(kd.lms_sample_sigma(den, x0,
                                          jnp.asarray(sig, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_new_schedulers_shapes_and_monotonicity():
    """ddim_uniform / beta / kl_optimal / linear_quadratic: descending,
    end at exactly 0, start near the table max, registry-dispatched."""
    table = kd.ddpm_sigmas()
    for name in ("normal", "karras", "exponential", "sgm_uniform",
                 "ddim_uniform", "beta", "kl_optimal",
                 "linear_quadratic"):
        sig = kd.make_schedule(name, 12, table)
        assert sig[-1] == 0.0, name
        assert np.all(np.diff(sig) < 0), (name, sig)
        assert sig[0] > 1.0, name  # starts high in the table range
    # linear_quadratic: linear ramp first, ends exactly at 0
    lq = kd.linear_quadratic_schedule(10, sigma_max=14.6)
    d = np.diff(lq[:5])
    np.testing.assert_allclose(d, d[0], rtol=1e-4)  # linear segment
    import pytest

    with pytest.raises(ValueError, match="scheduler"):
        kd.make_schedule("bogus", 10, table)


def test_dpmpp_2s_ancestral_and_3m_sde_reach_clean_target():
    """Perfect denoiser: both new samplers land exactly on c (their
    final σ→0 step collapses to the denoised output); eta=1 noise
    channels vanish at the σ=0 tail."""
    c = jnp.full((2, 8), -2.25, jnp.float32)
    den = lambda x, s: c
    x0 = jnp.asarray(np.random.default_rng(8).standard_normal((2, 8)) * 10,
                     jnp.float32)
    sig = _sched(8)
    for fn in (kd.dpmpp_2s_ancestral_sample_sigma,
               kd.dpmpp_3m_sde_sample_sigma):
        out = fn(den, x0, sig, jax.random.key(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)


def test_dpmpp_2s_3m_eta0_deterministic_and_beat_euler():
    """eta=0: both are deterministic solvers (key-independent) and
    higher-order — closer than Euler to the exact endpoint of the
    power ODE D(x,σ)=x/2 (exact: x0·√(σ_end/σ0))."""
    den = lambda x, s: 0.5 * x
    x0 = jnp.full((4,), 8.0, jnp.float32)
    sig = _sched(8, smax=10.0, smin=0.5, end_zero=False)
    exact = 8.0 * np.sqrt(float(sig[-1]) / float(sig[0]))
    e_eul = abs(float(kd.euler_sample_sigma(den, x0, sig)[0]) - exact)
    for fn in (kd.dpmpp_2s_ancestral_sample_sigma,
               kd.dpmpp_3m_sde_sample_sigma):
        a = fn(den, x0, sig, jax.random.key(4), eta=0.0)
        b = fn(den, x0, sig, jax.random.key(5), eta=0.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
        assert abs(float(a[0]) - exact) < e_eul, (fn, float(a[0]), exact)


def test_run_sampler_dispatch_2s_3m():
    den = lambda x, s: jnp.zeros_like(x)
    x0 = jnp.ones((2, 2), jnp.float32)
    sig = _sched(5)
    for name in ("dpmpp_2s_ancestral", "dpmpp_3m_sde"):
        out = kd.run_sampler(name, den, x0, sig, key=jax.random.key(6))
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_simple_schedule():
    """'simple': even fractional strides from the top of the table,
    descending, σ=0 tail, exact host formula at divisible counts."""
    table = np.linspace(0.03, 14.6, 1000).astype(np.float32)
    sig = kd.make_schedule("simple", 10, table)
    assert sig.shape == (11,) and sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)
    np.testing.assert_allclose(sig[0], table[-1], rtol=1e-6)
    # host formula: σ_i = table[-(1 + int((T/steps)·i))]
    want = [table[-(1 + int(100 * i))] for i in range(10)]
    np.testing.assert_allclose(sig[:-1], want, rtol=1e-6)
