"""Continuous-batch engine over a real (tiny) quantized SD3 model:
pooled requests must match single-request euler integration, stacked and
unstacked params must serve identically."""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu import pipeline
from comfyui_gguf_tpu.models import sd3, testing
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.sampling import euler_sample, linear_schedule

QCFG = QuantConfig(prefer_pallas=False)

H_LAT = W_LAT = 8
CTX_LEN = 8


@pytest.fixture(scope="module")
def model():
    dims = testing.TinySD3Dims(depth=3)
    params = testing.sd3_random_quant_params(dims, seed=9)
    return pipeline.DiffusionModel(arch="sd3", params=params,
                                   config=dims.config(), qcfg=QCFG), dims


def _cond(dims, seed):
    rng = np.random.default_rng(seed)
    return {
        "ctx": rng.standard_normal((CTX_LEN, dims.ctx_dim)).astype(
            np.float32),
        "pooled": rng.standard_normal((dims.pooled,)).astype(np.float32),
    }


def test_sd3_engine_matches_direct_euler(model):
    mdl, dims = model
    eng = pipeline.sd3_engine(mdl, max_batch=4)

    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((H_LAT, W_LAT, dims.in_ch)).astype(np.float32)
    cond = _cond(dims, 2)
    sigmas = linear_schedule(3)

    req = eng.submit(x0, cond, sigmas)
    req2 = eng.submit(
        rng.standard_normal((H_LAT, W_LAT, dims.in_ch)).astype(np.float32),
        _cond(dims, 3), linear_schedule(5))
    eng.run_until_drained()
    assert req.finished and req2.finished

    ctx = jnp.asarray(cond["ctx"])[None].astype(jnp.bfloat16)
    pooled = jnp.asarray(cond["pooled"])[None].astype(jnp.bfloat16)

    def velocity(x, s):
        tt = jnp.full((1,), s, jnp.float32)
        return sd3.forward(mdl.params, mdl.config, x, ctx, pooled, tt,
                           qcfg=QCFG)

    want = euler_sample(velocity,
                        jnp.asarray(x0)[None].astype(jnp.bfloat16), sigmas)
    np.testing.assert_allclose(
        req.result.astype(np.float32), np.asarray(want[0], np.float32),
        rtol=0.05, atol=0.05)
    assert eng.stats.completed == 2


def test_sd3_engine_stacked_serves_same(model):
    mdl, dims = model
    rng = np.random.default_rng(4)
    x0 = rng.standard_normal((H_LAT, W_LAT, dims.in_ch)).astype(np.float32)
    cond = _cond(dims, 5)
    sigmas = linear_schedule(4)

    outs = []
    for m in (mdl, mdl.stack()):
        eng = pipeline.sd3_engine(m, max_batch=2)
        req = eng.submit(x0.copy(), cond, sigmas)
        eng.run_until_drained()
        outs.append(req.result.astype(np.float32))
    np.testing.assert_allclose(outs[1], outs[0], rtol=0.05, atol=0.05)


def test_sd3_engine_dpmpp_2m_matches_direct(model):
    """sampler="dpmpp_2m": pooled requests match per-request jitted
    DPM-Solver++(2M) through the flow x₀-adapter."""
    import jax

    from comfyui_gguf_tpu.sampling import flow_match as fm
    from comfyui_gguf_tpu.sampling import kdiffusion as kd

    mdl, dims = model
    eng = pipeline.sd3_engine(mdl, max_batch=2, sampler="dpmpp_2m")

    def mk(seed, steps):
        rng = np.random.default_rng(seed)
        return (rng.standard_normal((H_LAT, W_LAT, dims.in_ch)).astype(
            np.float32), _cond(dims, seed), linear_schedule(steps))

    x1, c1, s1 = mk(50, 4)
    x2, c2, s2 = mk(51, 3)
    r1 = eng.submit(x1.copy(), c1, s1)
    r2 = eng.submit(x2.copy(), c2, s2)
    eng.run_until_drained()
    assert r1.finished and r2.finished and r1.error is None

    def direct(x0, cond, sigmas):
        ctx = jnp.asarray(cond["ctx"])[None].astype(jnp.bfloat16)
        pooled = jnp.asarray(cond["pooled"])[None].astype(jnp.bfloat16)

        @jax.jit
        def run(params, x):
            def vel(xc, sigma):
                ts = jnp.full((1,), sigma, jnp.float32)
                return sd3.forward(params, mdl.config, xc, ctx, pooled,
                                   ts, qcfg=QCFG)

            den = fm.make_flow_denoiser(vel)
            return kd.dpmpp_2m_sample_sigma(den, x, jnp.asarray(sigmas))

        return np.asarray(run(
            mdl.params, jnp.asarray(x0)[None].astype(jnp.bfloat16))[0],
            np.float32)

    np.testing.assert_allclose(r1.result.astype(np.float32),
                               direct(x1, c1, s1), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(r2.result.astype(np.float32),
                               direct(x2, c2, s2), rtol=0.05, atol=0.05)


def test_sd3_engine_dp_mesh_matches_unsharded(model):
    """dp_mesh: params replicated once, pooled batch GSPMD-sharded along
    lanes — results equal the unsharded engine; buckets snap to dp
    multiples so shards stay shape-static."""
    import jax
    from jax.sharding import Mesh

    mdl, dims = model
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))

    def mk(seed, steps):
        rng = np.random.default_rng(seed)
        return (rng.standard_normal((H_LAT, W_LAT, dims.in_ch)).astype(
            np.float32), _cond(dims, seed), linear_schedule(steps))

    x1, c1, s1 = mk(80, 3)
    x2, c2, s2 = mk(81, 3)

    results = []
    for dp in (None, mesh):
        eng = pipeline.sd3_engine(mdl, max_batch=2, dp_mesh=dp)
        if dp is not None:
            assert eng.batch_sizes == (2,)  # snapped to dp multiples
        r1 = eng.submit(x1.copy(), c1, s1)
        r2 = eng.submit(x2.copy(), c2, s2)
        eng.run_until_drained()
        assert r1.finished and r2.finished and r1.error is None
        results.append((r1.result.astype(np.float32),
                        r2.result.astype(np.float32)))

    (a1, a2), (b1, b2) = results
    np.testing.assert_allclose(b1, a1, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(b2, a2, rtol=2e-2, atol=2e-2)

    with pytest.raises(ValueError, match="divisible"):
        pipeline.sd3_engine(mdl, max_batch=3, dp_mesh=mesh)
    # non-power-of-two max_batch: max_batch itself must stay a bucket so
    # pad never goes negative (6 % 2 == 0, but 6 is not dp*2^k)
    eng6 = pipeline.sd3_engine(mdl, max_batch=6, dp_mesh=mesh)
    assert eng6.batch_sizes[-1] == 6


def test_sd3_engine_dp4_mixed_progress(model):
    """dp=4 with a MIXED-PROGRESS pool: four requests on different-length
    schedules finish at different ticks, so the pooled batch shrinks
    mid-flight and pads back to the dp-snapped bucket — results must
    equal the unsharded engine per request (round-4 verdict item 2)."""
    import jax
    from jax.sharding import Mesh

    mdl, dims = model
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))

    def mk(seed, steps):
        rng = np.random.default_rng(seed)
        return (rng.standard_normal((H_LAT, W_LAT, dims.in_ch)).astype(
            np.float32), _cond(dims, seed), linear_schedule(steps))

    reqs_in = [mk(90 + i, steps) for i, steps in enumerate((2, 3, 4, 5))]

    results = []
    for dp in (None, mesh):
        eng = pipeline.sd3_engine(mdl, max_batch=4, dp_mesh=dp)
        rs = [eng.submit(x.copy(), c, s) for x, c, s in reqs_in]
        eng.run_until_drained()
        assert all(r.finished and r.error is None for r in rs)
        results.append([r.result.astype(np.float32) for r in rs])

    for a, b in zip(*results):
        np.testing.assert_allclose(b, a, rtol=2e-2, atol=2e-2)
