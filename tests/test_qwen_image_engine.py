"""Qwen-Image scanned stacked forward + continuous-batch engine: the
stacked (lax.scan) forward must equal the unrolled one, and engine
serving must match direct euler integration, stacked or not."""

import numpy as np
import pytest

import jax.numpy as jnp

from comfyui_gguf_tpu import pipeline
from comfyui_gguf_tpu.models import qwen_image
from comfyui_gguf_tpu.models.flux import make_img_ids
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.sampling import euler_sample, linear_schedule
from tests.test_cosmos_qwen import _tiny_qwen

QCFG = QuantConfig(prefer_pallas=False)

H_TOK = W_TOK = 4
L_IMG = H_TOK * W_TOK
TXT_LEN = 7


@pytest.fixture(scope="module")
def model():
    rng = np.random.default_rng(21)
    params = {k: jnp.asarray(v) for k, v in _tiny_qwen(rng).items()}
    cfg = qwen_image.QwenImageConfig.from_state_dict(params)
    return pipeline.DiffusionModel(arch="qwen_image", params=params,
                                   config=cfg, qcfg=QCFG)


def test_stacked_forward_matches_unrolled(model):
    cfg = model.config
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((1, L_IMG, cfg.in_channels)),
                      jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, TXT_LEN, cfg.context_dim)),
                      jnp.float32)
    img_ids = jnp.asarray(make_img_ids(H_TOK, W_TOK, 1))
    txt_ids = jnp.zeros((1, TXT_LEN, 3), jnp.int32)
    t = jnp.asarray([0.7], jnp.float32)

    want = qwen_image.forward(model.params, cfg, img, img_ids, txt,
                              txt_ids, t, qcfg=QCFG)
    stacked = model.stack()
    assert "transformer_blocks" in stacked.params
    got = qwen_image.forward_stacked(stacked.params, cfg, img, img_ids,
                                     txt, txt_ids, t, qcfg=QCFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def _cond(cfg, seed):
    rng = np.random.default_rng(seed)
    return {"txt": rng.standard_normal((TXT_LEN, cfg.context_dim)).astype(
        np.float32)}


def test_qwen_image_engine_matches_direct_euler(model):
    cfg = model.config
    eng = pipeline.qwen_image_engine(model, H_TOK, W_TOK, TXT_LEN,
                                     max_batch=4)
    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((L_IMG, cfg.in_channels)).astype(np.float32)
    cond = _cond(cfg, 3)
    sigmas = linear_schedule(3)

    req = eng.submit(x0, cond, sigmas)
    req2 = eng.submit(
        rng.standard_normal((L_IMG, cfg.in_channels)).astype(np.float32),
        _cond(cfg, 4), linear_schedule(5))
    eng.run_until_drained()
    assert req.finished and req2.finished

    txt = jnp.asarray(cond["txt"])[None].astype(jnp.bfloat16)
    img_ids = jnp.asarray(make_img_ids(H_TOK, W_TOK, 1))
    txt_ids = jnp.zeros((1, TXT_LEN, 3), jnp.int32)

    def velocity(x, s):
        tt = jnp.full((1,), s, jnp.float32)
        return qwen_image.forward(model.params, cfg, x, img_ids, txt,
                                  txt_ids, tt, qcfg=QCFG)

    want = euler_sample(velocity,
                        jnp.asarray(x0)[None].astype(jnp.bfloat16), sigmas)
    np.testing.assert_allclose(
        req.result.astype(np.float32), np.asarray(want[0], np.float32),
        rtol=0.05, atol=0.05)
    assert eng.stats.completed == 2


def test_qwen_image_engine_stacked_serves_same(model):
    cfg = model.config
    rng = np.random.default_rng(5)
    x0 = rng.standard_normal((L_IMG, cfg.in_channels)).astype(np.float32)
    cond = _cond(cfg, 6)
    sigmas = linear_schedule(4)

    outs = []
    for m in (model, model.stack()):
        eng = pipeline.qwen_image_engine(m, H_TOK, W_TOK, TXT_LEN,
                                         max_batch=2)
        req = eng.submit(x0.copy(), cond, sigmas)
        eng.run_until_drained()
        outs.append(req.result.astype(np.float32))
    np.testing.assert_allclose(outs[1], outs[0], rtol=0.05, atol=0.05)


def test_qwen_image_engine_tp_mesh_matches_unsharded():
    """qwen_image_engine(mesh=...) serves through the spec-driven TP
    forward; pooled results must match the unsharded engine over the
    SAME quantized values (the qwen_image-20B serving configuration)."""
    import jax
    from jax.sharding import Mesh

    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.parallel import tp_spec

    rng = np.random.default_rng(31)
    sd = _tiny_qwen(rng)
    cfg = qwen_image.QwenImageConfig.from_state_dict(
        {k: jnp.asarray(v) for k, v in sd.items()})
    mesh = Mesh(np.array(jax.devices()[:2]), (tp_spec.AXIS,))

    ref = tp_spec.quantize_unsharded(
        sd, block_groups=[("transformer_blocks", cfg.n_layers)],
        rules=tp_spec.qwen_image_rules(), qtype=Q.Q8_0)
    m_ref = pipeline.DiffusionModel(arch="qwen_image", params=ref,
                                    config=cfg, qcfg=QCFG)

    sharded = tp_spec.place_tp_params(
        tp_spec.shard_qwen_image_params(sd, cfg, 2, Q.Q8_0), mesh,
        ("transformer_blocks",))
    m_tp = pipeline.DiffusionModel(arch="qwen_image", params=sharded,
                                   config=cfg, qcfg=QCFG)

    x1 = rng.standard_normal((L_IMG, cfg.in_channels)).astype(np.float32)
    x2 = rng.standard_normal((L_IMG, cfg.in_channels)).astype(np.float32)
    c1, c2 = _cond(cfg, 32), _cond(cfg, 33)
    s1, s2 = linear_schedule(3), linear_schedule(4)  # mixed progress

    results = []
    for mdl, kw in ((m_ref, {}), (m_tp, {"mesh": mesh})):
        eng = pipeline.qwen_image_engine(mdl, H_TOK, W_TOK, TXT_LEN,
                                         max_batch=2, **kw)
        r1 = eng.submit(x1.copy(), c1, s1)
        r2 = eng.submit(x2.copy(), c2, s2)
        eng.run_until_drained()
        assert r1.finished and r2.finished and r1.error is None
        results.append((np.asarray(r1.result, np.float32),
                        np.asarray(r2.result, np.float32)))

    (a1, a2), (b1, b2) = results
    np.testing.assert_allclose(b1, a1, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(b2, a2, rtol=2e-2, atol=2e-2)
