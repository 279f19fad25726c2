"""Tensor-parallel flux forward == unsharded forward, with the FUSED
Pallas kernel running per shard (interpret mode on the CPU mesh) —
VERDICT r1 item 2: proof the packed kernel composes with TP.

Dims are chosen so per-shard weights stay Pallas-tileable (per-shard
K ≥ 512 for column splits; grouped row splits pad within the 1.25×
budget), i.e. the TP path really exercises pallas_qmm, not the XLA
fallback."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.models import flux, testing
from comfyui_gguf_tpu.nn.layers import QuantConfig
from comfyui_gguf_tpu.parallel import tp_flux
from comfyui_gguf_tpu.quant import codecs
from comfyui_gguf_tpu.quant.planar import planarize

TP = 2

DIMS = testing.TinyFluxDims(
    hidden=512, heads=4, ctx=256, vec=64, in_ch=16,
    depth_double=2, depth_single=2, axes_dim=(32, 48, 48),
)

F32 = QuantConfig(dequant_dtype=jnp.float32, compute_dtype=jnp.float32,
                  prefer_pallas=False)
F32_PALLAS = dataclasses.replace(F32, prefer_pallas=True)  # interpret on CPU


def _mesh():
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:TP]), (tp_flux.AXIS,))


def _ref_params(sd, cfg):
    """Unsharded params quantized with the SAME codec blocks the TP
    sharder uses, so both paths dequantize identical values."""
    plan_keys = set()
    for i in range(cfg.depth_double):
        for s in ("img", "txt"):
            for suf in ("mod.lin", "attn.qkv", "attn.proj", "mlp.0",
                        "mlp.2"):
                plan_keys.add(f"double_blocks.{i}.{s}_{suf}.weight")
    for i in range(cfg.depth_single):
        for suf in ("linear1", "linear2", "modulation.lin"):
            plan_keys.add(f"single_blocks.{i}.{suf}.weight")
    out = {}
    for k, v in sd.items():
        if k in plan_keys:
            blocks = codecs.quantize(np.asarray(v, np.float32), Q.Q8_0)
            out[k] = planarize(blocks, Q.Q8_0, v.shape)
        else:
            out[k] = jnp.asarray(v, jnp.float32)
    return out


@pytest.fixture(scope="module")
def setup():
    sd = testing.flux_state_dict(DIMS, seed=11)
    cfg = DIMS.config()
    inputs = testing.flux_example_inputs(DIMS, batch=1, h_lat=8, w_lat=8,
                                         txt_len=8, dtype=jnp.float32)
    ref = _ref_params(sd, cfg)
    sharded = tp_flux.place_tp_params(
        tp_flux.shard_flux_params(sd, cfg, TP, Q.Q8_0), _mesh())
    return sd, cfg, inputs, ref, sharded


def test_tp_forward_matches_unsharded(setup):
    sd, cfg, inputs, ref, sharded = setup
    img, img_ids, txt, txt_ids, t, y, g = inputs

    want = jax.jit(lambda p, *a: flux.forward(p, cfg, *a, qcfg=F32))(
        ref, img, img_ids, txt, txt_ids, t, y, g)

    mesh = _mesh()
    got = jax.jit(lambda p, *a: tp_flux.tp_forward_stacked(
        p, cfg, *a, mesh=mesh, qcfg=F32_PALLAS))(
        sharded, img, img_ids, txt, txt_ids, t, y, g)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_tp_shards_actually_take_pallas(setup):
    """Guard against silently testing the XLA fallback: the per-shard
    column-split qkv/linear1 weights must be Pallas-tileable."""
    from comfyui_gguf_tpu.ops.qmatmul import pallas_tileable
    from comfyui_gguf_tpu.quant.planar import PlanarQuant

    _, cfg, _, _, sharded = setup
    qkv = sharded["double_blocks"]["img_attn.qkv.weight"]
    lin1 = sharded["single_blocks"]["linear1.weight"]
    lin2 = sharded["single_blocks"]["linear2.weight"]
    for st in (qkv, lin1, lin2):
        assert isinstance(st, PlanarQuant)
        shard0 = jax.tree_util.tree_map(lambda x: np.asarray(x)[0, 0], st)
        shard0 = PlanarQuant(
            qs=jnp.asarray(shard0.qs), scales=jnp.asarray(shard0.scales),
            offsets=None if st.offsets is None else
            jnp.asarray(shard0.offsets),
            qtype=st.qtype, layout=st.layout, group_size=st.group_size,
            zero_point=st.zero_point, shape=st.shape)
        assert pallas_tileable(shard0), st.shape


def test_tp_serving_engine_matches_unsharded(setup):
    """flux_engine(mesh=...) serves through the shard_map TP forward;
    pooled continuous-batch results must match the unsharded engine."""
    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.sampling import linear_schedule

    sd, cfg, inputs, ref, sharded = setup
    h_lat = w_lat = 8
    txt_len = 8
    L = (h_lat // 2) * (w_lat // 2)

    rng = np.random.default_rng(7)
    x0 = rng.standard_normal((L, cfg.in_channels)).astype(np.float32)
    cond = {
        "txt": rng.standard_normal((txt_len, cfg.context_dim)).astype(
            np.float32),
        "y": rng.standard_normal((cfg.vec_dim,)).astype(np.float32),
        "guidance": np.float32(4.0),
    }
    sigmas = linear_schedule(3)

    outs = []
    for model, mesh in (
            (pipeline.DiffusionModel(arch="flux", params=ref, config=cfg,
                                     qcfg=F32), None),
            (pipeline.DiffusionModel(arch="flux", params=sharded,
                                     config=cfg, qcfg=F32_PALLAS),
             _mesh())):
        eng = pipeline.flux_engine(model, h_lat, w_lat, txt_len,
                                   max_batch=2, mesh=mesh)
        req = eng.submit(x0.copy(), cond, sigmas)
        eng.run_until_drained()
        assert req.finished
        outs.append(req.result.astype(np.float32))
    # bf16 request latents are re-rounded every euler step in both
    # engines; kernel-order differences then sit at bf16 ulp scale
    np.testing.assert_allclose(outs[1], outs[0], rtol=0.05, atol=0.05)
