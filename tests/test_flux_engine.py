"""Continuous-batch engine over a real (tiny) quantized flux model:
pooled requests must match single-request euler integration exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu import pipeline
from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.models import flux, testing
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.sampling import euler_sample, linear_schedule

F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                  prefer_pallas=False)

H_LAT = W_LAT = 8
TXT_LEN = 8


@pytest.fixture(scope="module")
def model():
    dims = testing.TinyFluxDims()
    sd = testing.flux_state_dict(dims, seed=0)
    params = testing.quantize_flux_params(sd, qtype=Q.Q8_0)
    return pipeline.DiffusionModel(arch="flux", params=params,
                                   config=dims.config(), qcfg=F32), dims


def _cond(dims, seed):
    rng = np.random.default_rng(seed)
    return {
        "txt": rng.standard_normal((TXT_LEN, dims.ctx)).astype(np.float32),
        "y": rng.standard_normal((dims.vec,)).astype(np.float32),
        "guidance": np.float32(4.0),
    }


def test_engine_matches_direct_euler(model):
    mdl, dims = model
    eng = pipeline.flux_engine(mdl, H_LAT, W_LAT, TXT_LEN, max_batch=4)

    rng = np.random.default_rng(1)
    lat_c = dims.in_ch // 4
    L = (H_LAT // 2) * (W_LAT // 2)
    x0 = rng.standard_normal((L, dims.in_ch)).astype(np.float32)
    cond = _cond(dims, 2)
    sigmas = linear_schedule(3)

    req = eng.submit(x0, cond, sigmas)
    # a second request with a different schedule shares the pool
    req2 = eng.submit(
        rng.standard_normal((L, dims.in_ch)).astype(np.float32),
        _cond(dims, 3), linear_schedule(5))
    eng.run_until_drained()
    assert req.finished and req2.finished

    # direct integration of request 1
    img_ids = jnp.asarray(flux.make_img_ids(H_LAT // 2, W_LAT // 2, 1))
    txt_ids = jnp.zeros((1, TXT_LEN, 3), jnp.int32)
    txt = jnp.asarray(cond["txt"])[None].astype(jnp.bfloat16)
    y = jnp.asarray(cond["y"])[None].astype(jnp.bfloat16)
    g = jnp.asarray([cond["guidance"]], jnp.float32)

    def velocity(x, s):
        tt = jnp.full((1,), s, jnp.float32)
        return flux.forward(mdl.params, mdl.config, x, img_ids, txt,
                            txt_ids, tt, y, g, qcfg=F32)

    want = euler_sample(velocity,
                        jnp.asarray(x0)[None].astype(jnp.bfloat16), sigmas)
    np.testing.assert_allclose(
        req.result.astype(np.float32), np.asarray(want[0], np.float32),
        rtol=0.05, atol=0.05)
    assert eng.stats.completed == 2
    assert eng.stats.mean_batch_occupancy > 0.5


def test_engine_dpmpp_2m_matches_direct(model):
    """sampler="dpmpp_2m": pooled mixed-progress requests each match a
    per-request jitted DPM-Solver++(2M) integration through the flow
    x₀-adapter — per-lane multistep history (aux state) is exact."""
    from comfyui_gguf_tpu.models.flux import make_img_ids, patchify
    from comfyui_gguf_tpu.sampling import flow_match as fm
    from comfyui_gguf_tpu.sampling import kdiffusion as kd

    mdl, dims = model
    L = (H_LAT // 2) * (W_LAT // 2)
    C = dims.in_ch  # token channels (latents pre-patchified in dims)
    eng = pipeline.flux_engine(mdl, H_LAT, W_LAT, TXT_LEN, max_batch=2,
                               sampler="dpmpp_2m")

    def mk(seed, steps):
        rng = np.random.default_rng(seed)
        x0 = rng.standard_normal((L, C)).astype(np.float32)
        return x0, _cond(dims, seed), linear_schedule(steps)

    x1, c1, s1 = mk(40, 4)
    x2, c2, s2 = mk(41, 3)
    r1 = eng.submit(x1.copy(), c1, s1)
    r2 = eng.submit(x2.copy(), c2, s2)
    eng.run_until_drained()
    assert r1.finished and r2.finished and r1.error is None

    img_ids = jnp.asarray(make_img_ids(H_LAT // 2, W_LAT // 2, 1))
    txt_ids = jnp.zeros((1, TXT_LEN, 3), jnp.int32)

    def direct(x0, cond, sigmas):
        txt = jnp.asarray(cond["txt"])[None].astype(jnp.bfloat16)
        y = jnp.asarray(cond["y"])[None].astype(jnp.bfloat16)
        g = jnp.asarray([cond["guidance"]], jnp.float32)

        @jax.jit
        def run(params, x):
            def vel(xc, sigma):
                ts = jnp.full((1,), sigma, jnp.float32)
                return flux.forward(params, mdl.config, xc, img_ids, txt,
                                    txt_ids, ts, y, g, qcfg=F32)

            den = fm.make_flow_denoiser(
                lambda xc, s: vel(xc, s))
            return kd.dpmpp_2m_sample_sigma(den, x, jnp.asarray(sigmas))

        return np.asarray(run(
            mdl.params, jnp.asarray(x0)[None].astype(jnp.bfloat16))[0],
            np.float32)

    np.testing.assert_allclose(r1.result.astype(np.float32),
                               direct(x1, c1, s1), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(r2.result.astype(np.float32),
                               direct(x2, c2, s2), rtol=0.05, atol=0.05)

    with pytest.raises(ValueError, match="euler|dpmpp_2m"):
        pipeline.flux_engine(mdl, H_LAT, W_LAT, TXT_LEN, sampler="bogus")


def test_resident_model_server_two_models_lru():
    """TWO models sharing one device under an HBM budget smaller than
    their sum: LRU eviction must swap them, results must match each
    model's standalone engine, and the evict→re-place cycle must not
    change outputs (params are jit arguments — no retrace)."""
    from comfyui_gguf_tpu import serving
    from comfyui_gguf_tpu.lifecycle import tree_bytes, to_host

    import jax

    def build(seed):
        sd = testing.flux_state_dict(dims, seed=seed)
        params = testing.quantize_flux_params(sd, qtype=Q.Q8_0)
        return pipeline.DiffusionModel(
            arch="flux", params=params, config=dims.config(), qcfg=F32)

    dims = testing.TinyFluxDims()
    seeds = {"m_a": 0, "m_b": 9}
    models = {name: build(seed) for name, seed in seeds.items()}

    per_model = tree_bytes(to_host(models["m_a"].params))
    # budget fits ~one model: serving the other forces an eviction
    srv = serving.ResidentModelServer(hbm_budget=int(per_model * 1.5))
    for name, mdl in models.items():
        srv.register(
            name, mdl.params,
            lambda provider, mdl=mdl: pipeline.flux_engine(
                mdl, H_LAT, W_LAT, TXT_LEN, max_batch=2,
                params_provider=provider))

    # register (free_source default) must DELETE the caller's device
    # buffers — otherwise the still-referenced source trees keep their
    # HBM and the budget is decorative (round-4 advisor finding)
    for mdl in models.values():
        assert all(leaf.is_deleted()
                   for leaf in jax.tree_util.tree_leaves(mdl.params)
                   if isinstance(leaf, jax.Array))

    rng = np.random.default_rng(4)
    L = (H_LAT // 2) * (W_LAT // 2)
    x0 = rng.standard_normal((L, dims.in_ch)).astype(np.float32)
    cond = _cond(dims, 5)
    sigmas = linear_schedule(3)

    reqs = {n: srv.submit(n, x0, cond, sigmas) for n in models}
    srv.run_until_drained()
    assert all(r.finished for r in reqs.values())

    st = srv.stats["models"]
    assert sum(e["resident"] for e in st.values()) == 1, st  # one evicted
    assert not any(e["pinned"] for e in st.values())

    # the two models are different weights — results must differ
    assert not np.allclose(reqs["m_a"].result, reqs["m_b"].result)

    # standalone single-model engines give the same answers (fresh param
    # trees — the registered sources were freed above)
    for name, seed in seeds.items():
        mdl = build(seed)
        eng = pipeline.flux_engine(mdl, H_LAT, W_LAT, TXT_LEN, max_batch=2)
        ref = eng.submit(x0, cond, sigmas)
        eng.run_until_drained()
        np.testing.assert_allclose(reqs[name].result, ref.result,
                                   rtol=1e-5, atol=1e-5)

    # second round through the server: m_a must be re-placed (it was
    # evicted) and still produce identical output — no retrace, same math
    req_a2 = srv.submit("m_a", x0, cond, sigmas)
    srv.run_until_drained()
    np.testing.assert_allclose(req_a2.result, reqs["m_a"].result,
                               rtol=1e-5, atol=1e-5)


def test_bucket_router_over_flux_engines(model):
    """BucketRouter over REAL flux engines: two resolution buckets share
    one model's params, requests route by latent shape, results match
    per-bucket standalone engines."""
    from comfyui_gguf_tpu.serving import BucketRouter

    mdl, dims = model

    def factory(shape):
        L = shape[0]  # (L_img, C) latent tokens
        side = int((L ** 0.5)) * 2  # h_tok == w_tok buckets here
        return pipeline.flux_engine(mdl, side, side, TXT_LEN, max_batch=2)

    router = BucketRouter(factory)
    rng = np.random.default_rng(17)
    x_small = rng.standard_normal((16, dims.in_ch)).astype(np.float32)
    x_big = rng.standard_normal((36, dims.in_ch)).astype(np.float32)
    c1, c2 = _cond(dims, 18), _cond(dims, 19)
    s = linear_schedule(3)

    r1 = router.submit(x_small.copy(), c1, s)
    r2 = router.submit(x_big.copy(), c2, s)
    router.run_until_drained()
    assert r1.finished and r2.finished
    assert set(router.engines) == {(16, dims.in_ch), (36, dims.in_ch)}

    for x, c, r, side in ((x_small, c1, r1, 8), (x_big, c2, r2, 12)):
        eng = pipeline.flux_engine(mdl, side, side, TXT_LEN, max_batch=2)
        ref = eng.submit(x.copy(), c, s)
        eng.run_until_drained()
        np.testing.assert_allclose(np.asarray(r.result),
                                   np.asarray(ref.result), rtol=1e-5,
                                   atol=1e-5)
