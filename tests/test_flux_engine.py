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
