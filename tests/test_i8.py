"""w8a8 integer-MXU path: requantization accuracy, kernel-vs-XLA parity
(interpret mode), layer dispatch, stacked/indexed scan path, checkpoint
round trip, and a tiny end-to-end flux forward vs the bf16 fused path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.nn import layers
from comfyui_gguf_tpu.ops import i8mm
from comfyui_gguf_tpu.quant import codecs, i8, planar


def make_pq(R, K, qtype=Q.Q4_K, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((R, K)).astype(np.float32) * scale
    return planar.planarize(codecs.quantize(x, qtype), qtype, (R, K)), x


# ---------------------------------------------------------------------------
# requantization
# ---------------------------------------------------------------------------

def _assert_req_parity(dev, host, qtype):
    """Bit-identical for offset-free formats; ≤1-ulp scales and ≤1-ls
    sparse code flips for offset formats (XLA FMA vs numpy two-step
    rounding of s·q+o — see quant.i8._req_slice_host)."""
    dq, hq = np.asarray(dev.qs, np.int32), np.asarray(host.qs, np.int32)
    ds, hs = np.asarray(dev.scales), np.asarray(host.scales)
    has_offsets = qtype in (Q.Q4_1, Q.Q5_1, Q.Q8_1, Q.Q4_K, Q.Q5_K)
    if not has_offsets:
        np.testing.assert_array_equal(dq, hq)
        np.testing.assert_array_equal(ds, hs)
        return
    np.testing.assert_allclose(hs, ds, rtol=2e-7, atol=0)
    diff = np.abs(dq - hq)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 1e-3, (diff > 0).mean()  # boundary-only


@pytest.mark.parametrize("qtype", [Q.Q4_K, Q.Q8_0, Q.Q4_1, Q.Q6_K],
                         ids=lambda q: q.name)
def test_host_staged_requantize_matches_device(qtype):
    """requantize_i8_host (the transient-free HiDream conversion path,
    round-4 verdict item 3) must produce the same int8 model as the
    on-device path, for 2-D and depth-stacked leaves, and free the
    planar source device buffers."""
    # 2-D
    pq, _ = make_pq(96, 512, qtype, seed=5)
    _assert_req_parity(i8.requantize_i8(pq), i8.requantize_i8_host(pq),
                       qtype)

    # depth-stacked + free_source
    pqs = [make_pq(96, 512, qtype, seed=10 + i)[0] for i in range(3)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pqs)
    dev = i8.requantize_i8(stacked)
    host = i8.requantize_i8_host(stacked, free_source=True)
    _assert_req_parity(dev, host, qtype)
    assert stacked.qs.is_deleted() and stacked.scales.is_deleted()


def test_convert_tree_host_stage_matches_device():
    """convert_tree_i8(host_stage=True) under a pred equals the
    on-device conversion leaf-for-leaf (within the FMA caveat)."""
    tree_a = {"blk": {"w": make_pq(64, 512, Q.Q4_K, seed=1)[0],
                      "mod.w": make_pq(64, 512, Q.Q4_K, seed=2)[0]}}
    tree_b = jax.tree_util.tree_map(lambda x: x, tree_a)  # same leaves
    pred = lambda k, v: not i8.is_modulation_key(k)
    a = i8.convert_tree_i8(tree_a, pred=pred)
    b = i8.convert_tree_i8(tree_b, pred=pred, host_stage=True)
    assert isinstance(a["blk"]["w"], i8.I8Planar)
    assert isinstance(b["blk"]["w"], i8.I8Planar)
    assert isinstance(b["blk"]["mod.w"], planar.PlanarQuant)  # kept
    _assert_req_parity(a["blk"]["w"], b["blk"]["w"], Q.Q4_K)

@pytest.mark.parametrize("qtype", [Q.Q4_K, Q.Q8_0, Q.Q4_1, Q.Q6_K],
                         ids=lambda q: q.name)
def test_requantize_error_bound(qtype):
    """Per-column int8: every element within half an ls step of the
    source planar dequant (ws = colmax/127)."""
    pq, _ = make_pq(96, 512, qtype)
    ip = i8.requantize_i8(pq)
    w_src = np.asarray(planar.dequantize_kmajor(pq))  # (K, R)
    w_i8 = np.asarray(i8.dequantize_kmajor_i8(ip))
    ws = np.maximum(np.abs(w_src).max(axis=0, keepdims=True), 1e-30) / 127.0
    # 0.5 ls + f32 rounding headroom at the tie boundary
    assert np.all(np.abs(w_i8 - w_src) <= 0.5001 * ws + 1e-9)
    assert ip.qs.dtype == jnp.int8
    assert ip.shape == pq.shape
    # padding preserved from the source
    assert ip.qs.shape == (pq.qs.shape[0] * (2 if pq.layout == "nib4" else 1),
                           pq.padded_out)


def test_requantize_stacked_matches_per_slice():
    pqs = [make_pq(64, 512, Q.Q4_K, seed=s)[0] for s in range(3)]
    stacked = planar.PlanarQuant(
        qs=jnp.stack([p.qs for p in pqs]),
        scales=jnp.stack([p.scales for p in pqs]),
        offsets=(None if pqs[0].offsets is None
                 else jnp.stack([p.offsets for p in pqs])),
        qtype=pqs[0].qtype, layout=pqs[0].layout,
        group_size=pqs[0].group_size, zero_point=pqs[0].zero_point,
        shape=pqs[0].shape)
    ip = i8.requantize_i8(stacked)
    assert ip.qs.shape[0] == 3
    for d, p in enumerate(pqs):
        one = i8.requantize_i8(p)
        np.testing.assert_array_equal(np.asarray(ip.qs[d]),
                                      np.asarray(one.qs))
        np.testing.assert_array_equal(np.asarray(ip.scales[d]),
                                      np.asarray(one.scales))


def test_zero_rows_columns_stay_finite():
    pq, _ = make_pq(64, 512, Q.Q4_K)
    # zero out the scales -> weight column is exactly 0
    pq = planar.PlanarQuant(
        qs=pq.qs, scales=jnp.zeros_like(pq.scales), offsets=None,
        qtype=pq.qtype, layout=pq.layout, group_size=pq.group_size,
        zero_point=pq.zero_point, shape=pq.shape)
    ip = i8.requantize_i8(pq)
    x = jnp.zeros((4, 512), jnp.bfloat16)  # all-zero rows too
    out = i8mm.xla_i8mm(x, ip)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
    np.testing.assert_array_equal(np.asarray(out, np.float32), 0.0)


def test_convert_tree_i8():
    pq, _ = make_pq(64, 512)
    tree = {"a.weight": pq, "b.bias": jnp.ones((64,)),
            "c": {"w": pq}}
    out = i8.convert_tree_i8(tree)
    assert isinstance(out["a.weight"], i8.I8Planar)
    assert isinstance(out["c"]["w"], i8.I8Planar)
    assert isinstance(out["b.bias"], jax.Array)


# ---------------------------------------------------------------------------
# matmul parity
# ---------------------------------------------------------------------------

def test_xla_i8mm_matches_dense_math():
    pq, _ = make_pq(96, 512)
    ip = i8.requantize_i8(pq)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((10, 512)), jnp.float32)
    got = np.asarray(i8mm.xla_i8mm(x, ip), np.float32)
    xq, xs = i8.quantize_rows(x)
    w = np.asarray(ip.qs, np.float32) * np.asarray(ip.scales, np.float32)
    want = (np.asarray(xs) * (np.asarray(xq, np.float32) @ w))[:, :96]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def _flip_tol(x, ip, want, n_flips=2):
    """Tolerance for comparing two independently-compiled w8a8 programs:
    the dynamic activation quantization may round 0.5-tie elements
    differently under different fusion (x/xs vs x*(1/xs)), flipping a
    code by ±1 — worth at most xs[row]*127*ws[col] in the output."""
    xq, xs = i8.quantize_rows(jnp.asarray(x).reshape(-1, x.shape[-1])
                              .astype(jnp.float32))
    ws = np.asarray(ip.scales, np.float32).reshape(1, -1)[:, : want.shape[-1]]
    return (n_flips * 127.0 * np.asarray(xs) * ws
            + 2e-2 * np.abs(want) + 2e-2)


@pytest.mark.parametrize("m", [1, 40, 64])
def test_pallas_interpret_matches_xla(m):
    pq, _ = make_pq(256, 512)
    ip = i8.requantize_i8(pq)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((m, 512)), jnp.bfloat16)
    want = np.asarray(i8mm.xla_i8mm(x, ip), np.float32)
    got = np.asarray(
        i8mm.pallas_i8mm(x, ip, interpret=True), np.float32)
    assert np.all(np.abs(got - want) <= _flip_tol(x, ip, want))


def test_pallas_epilogue_bias_gelu_lora():
    R, K = 1024, 512  # rt=512 -> act_from_col=512 is tile-aligned
    pq, _ = make_pq(R, K)
    ip = i8.requantize_i8(pq)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((32, K)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((R,)), jnp.float32)
    r = 4
    lora_h = jnp.asarray(rng.standard_normal((32, r)) * 0.1, jnp.bfloat16)
    lora_up = jnp.asarray(rng.standard_normal((r, R)) * 0.1, jnp.bfloat16)
    kw = dict(bias=bias, act_from_col=512, lora_h=lora_h, lora_up=lora_up)
    want = np.asarray(i8mm.xla_i8mm(x, ip, **kw), np.float32)
    got = np.asarray(i8mm.pallas_i8mm(x, ip, interpret=True, **kw),
                     np.float32)
    assert np.all(np.abs(got - want) <= _flip_tol(x, ip, want))


def test_indexed_matches_sliced():
    pqs = [make_pq(128, 512, seed=s)[0] for s in range(3)]
    stacked = planar.PlanarQuant(
        qs=jnp.stack([p.qs for p in pqs]),
        scales=jnp.stack([p.scales for p in pqs]),
        offsets=(None if pqs[0].offsets is None
                 else jnp.stack([p.offsets for p in pqs])),
        qtype=pqs[0].qtype, layout=pqs[0].layout,
        group_size=pqs[0].group_size, zero_point=pqs[0].zero_point,
        shape=pqs[0].shape)
    ip = i8.requantize_i8(stacked)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((32, 512)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((3, 128)), jnp.float32)
    for d in range(3):
        one = i8.I8Planar(qs=ip.qs[d], scales=ip.scales[d],
                          qtype=ip.qtype, shape=ip.shape)
        want = np.asarray(
            i8mm.xla_i8mm(x, one, bias=bias[d]), np.float32)
        got = np.asarray(
            i8mm.pallas_i8mm_indexed(x, ip, jnp.int32(d), interpret=True,
                                     bias=bias), np.float32)
        assert np.all(np.abs(got - want) <= _flip_tol(x, one, want))
        # dispatcher fallback path (CPU): slices then runs the XLA form
        got2 = np.asarray(
            i8mm.i8_indexed_matmul(x, ip, jnp.int32(d), bias=bias,
                                   prefer_pallas=False), np.float32)
        np.testing.assert_allclose(got2, want, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# layer dispatch + end-to-end
# ---------------------------------------------------------------------------

def test_linear_dispatch_accuracy():
    """layers.linear on I8Planar approximates the dense linear about as
    well as the source planar path does (w8a8 adds only 8-bit noise)."""
    R, K = 128, 512
    pq, _ = make_pq(R, K, scale=0.05)
    ip = i8.requantize_i8(pq)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((16, K)), jnp.bfloat16)
    ref = np.asarray(layers.linear(x, pq), np.float32)  # planar path
    got = np.asarray(layers.linear(x, ip), np.float32)
    denom = np.linalg.norm(ref) + 1e-9
    rel = np.linalg.norm(got - ref) / denom
    assert rel < 0.02, rel


def test_linear_gelu_dispatch():
    R, K = 256, 512
    pq, _ = make_pq(R, K, scale=0.05)
    ip = i8.requantize_i8(pq)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((R,)) * 0.1, jnp.float32)
    got = np.asarray(layers.linear_gelu(x, ip, bias, tail_from=128),
                     np.float32)
    # unfused composition on the same integer math
    pre = np.asarray(i8mm.xla_i8mm(x, ip, bias=bias), np.float32)
    want = np.concatenate(
        [pre[:, :128],
         np.asarray(jax.nn.gelu(pre[:, 128:], approximate=True))], axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_checkpoint_roundtrip(tmp_path):
    from comfyui_gguf_tpu import checkpoint

    pq, _ = make_pq(64, 512)
    ip = i8.requantize_i8(pq)
    params = {"w": ip, "b": jnp.ones((4,), jnp.float32)}
    p = str(tmp_path / "i8ckpt")
    checkpoint.save_params(p, params)
    back = checkpoint.load_params(p)
    assert isinstance(back["w"], i8.I8Planar)
    np.testing.assert_array_equal(np.asarray(back["w"].qs),
                                  np.asarray(ip.qs))
    np.testing.assert_array_equal(np.asarray(back["w"].scales),
                                  np.asarray(ip.scales))
    assert back["w"].shape == ip.shape


def test_memory_report_counts_i8():
    from comfyui_gguf_tpu.observability import memory_report

    pq, _ = make_pq(64, 512)
    ip = i8.requantize_i8(pq)
    rep = memory_report({"w": ip})
    assert rep["n_packed"] == 1
    assert rep["packed_bytes"] == ip.nbytes_packed


def test_flux_stacked_forward_i8_close_to_planar():
    """Tiny flux end to end: w8a8 scan forward within a few percent of
    the bf16 fused-dequant forward on the same weights."""
    from comfyui_gguf_tpu.models import flux, testing

    dims = testing.TinyFluxDims(depth_double=2, depth_single=2)
    sparams = testing.flux_random_stacked_params(dims, qtype=Q.Q4_K, seed=0)
    cfg = dims.config()
    img, img_ids, txt, txt_ids, t, y, g = testing.flux_example_inputs(
        dims, batch=1, h_lat=8, w_lat=8, txt_len=16)

    ref = np.asarray(flux.forward_stacked(
        sparams, cfg, img, img_ids, txt, txt_ids, t, y, g), np.float32)
    sp8 = i8.convert_tree_i8(sparams)
    got = np.asarray(flux.forward_stacked(
        sp8, cfg, img, img_ids, txt, txt_ids, t, y, g), np.float32)
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05, rel


def test_convert_tree_pred_and_free_source():
    pq1, _ = make_pq(64, 512, seed=0)
    pq2, _ = make_pq(64, 512, seed=1)
    tree = {"blocks": {"qkv.weight": pq1, "img_mod.lin.weight": pq2},
            "bias": jnp.ones((4,))}
    not_mod = lambda k, v: not any(
        seg == "modulation" or seg.endswith("mod") for seg in k.split("."))
    out = i8.convert_tree_i8(tree, free_source=True, pred=not_mod)
    assert isinstance(out["blocks"]["qkv.weight"], i8.I8Planar)
    # predicate kept the modulation weight planar (and alive)
    kept = out["blocks"]["img_mod.lin.weight"]
    assert isinstance(kept, planar.PlanarQuant)
    np.testing.assert_array_equal(np.asarray(kept.qs), np.asarray(pq2.qs))
    # converted source leaf was freed and unlinked from the input dict
    assert tree["blocks"]["qkv.weight"] is None
    assert np.all(np.isfinite(
        np.asarray(i8.dequantize_kmajor_i8(out["blocks"]["qkv.weight"]))))


def test_convert_tree_free_source_rejects_bare_leaf():
    pq, _ = make_pq(64, 512)
    with pytest.raises(TypeError):
        i8.convert_tree_i8(pq, free_source=True)


def test_convert_patched_weight_keeps_patches():
    from comfyui_gguf_tpu import lora as lora_mod

    pq, _ = make_pq(128, 512, scale=0.05)
    rng = np.random.default_rng(7)
    patch = lora_mod.LoRAPatch(
        up=jnp.asarray(rng.standard_normal((128, 4)) * 0.05, jnp.bfloat16),
        down=jnp.asarray(rng.standard_normal((4, 512)) * 0.05, jnp.bfloat16),
        mid=None, diff=None, scale=0.7)
    pw = lora_mod.PatchedWeight(base=pq, patches=(patch,))
    out = i8.convert_tree_i8({"w": pw})
    assert isinstance(out["w"], lora_mod.PatchedWeight)
    assert isinstance(out["w"].base, i8.I8Planar)
    assert out["w"].patches == (patch,)

    x = jnp.asarray(rng.standard_normal((8, 512)), jnp.bfloat16)
    ref = np.asarray(layers.linear(x, pw), np.float32)
    got = np.asarray(layers.linear(x, out["w"]), np.float32)
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.02, rel


def test_diffusion_model_requantize_i8():
    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.models import testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    dims = testing.TinyFluxDims(depth_double=2, depth_single=2)
    sparams = testing.flux_random_stacked_params(dims, qtype=Q.Q4_K, seed=0)
    model = pipeline.DiffusionModel(arch="flux", params=sparams,
                                    config=dims.config(),
                                    qcfg=QuantConfig())
    img, img_ids, txt, txt_ids, t, y, g = testing.flux_example_inputs(
        dims, batch=1, h_lat=8, w_lat=8, txt_len=16)
    ref = np.asarray(model.forward(img, img_ids, txt, txt_ids, t, y, g),
                     np.float32)
    m8 = model.requantize_i8(free_source=False)
    # modulation projections stay planar by default
    db = m8.params["double_blocks"]
    assert isinstance(db["img_mod.lin.weight"], planar.PlanarQuant)
    assert isinstance(db["img_attn.qkv.weight"], i8.I8Planar)
    got = np.asarray(m8.forward(img, img_ids, txt, txt_ids, t, y, g),
                     np.float32)
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05, rel


def test_flux_engine_over_i8_model():
    """Continuous-batching engine drives a w8a8-converted model: same
    request produces a latent close to the planar engine's."""
    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.models import testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig
    from comfyui_gguf_tpu.sampling import linear_schedule

    dims = testing.TinyFluxDims()
    sparams = testing.flux_random_stacked_params(dims, qtype=Q.Q4_K, seed=0)
    mdl = pipeline.DiffusionModel(arch="flux", params=sparams,
                                  config=dims.config(), qcfg=QuantConfig())
    h = w = 8
    txt_len = 8
    rng = np.random.default_rng(1)
    L = (h // 2) * (w // 2)
    x0 = rng.standard_normal((L, dims.in_ch)).astype(np.float32)
    cond = {"txt": rng.standard_normal((txt_len, dims.ctx))
            .astype(np.float32),
            "y": rng.standard_normal((dims.vec,)).astype(np.float32),
            "guidance": np.float32(4.0)}
    sigmas = linear_schedule(3)

    eng = pipeline.flux_engine(mdl, h, w, txt_len, max_batch=2)
    r1 = eng.submit(x0, cond, sigmas)
    eng.run_until_drained()

    m8 = mdl.requantize_i8(free_source=False)
    eng8 = pipeline.flux_engine(m8, h, w, txt_len, max_batch=2)
    r2 = eng8.submit(x0, cond, sigmas)
    eng8.run_until_drained()

    a = np.asarray(r1.result, np.float32)
    b = np.asarray(r2.result, np.float32)
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
    assert rel < 0.05, rel


def test_tp_flux_i8_close_to_unsharded():
    """w8a8 under shard_map TP: convert the TP-sharded tree (4-D leaves,
    per-shard per-column scales) and compare the TP forward against the
    unsharded w8a8 forward — within activation-quant noise (each shard
    quantizes its own K-slice, so the two programs differ by independent
    8-bit rounding, not semantics)."""
    import dataclasses as dc

    from jax.sharding import Mesh
    from comfyui_gguf_tpu.models import flux, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig
    from comfyui_gguf_tpu.parallel import tp_flux

    TP = 2
    dims = testing.TinyFluxDims(
        hidden=512, heads=4, ctx=256, vec=64, in_ch=16,
        depth_double=2, depth_single=2, axes_dim=(32, 48, 48))
    sd = testing.flux_state_dict(dims, seed=11)
    cfg = dims.config()
    img, img_ids, txt, txt_ids, t, y, g = testing.flux_example_inputs(
        dims, batch=1, h_lat=8, w_lat=8, txt_len=8, dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:TP]), (tp_flux.AXIS,))

    qcfg = QuantConfig(dequant_dtype=jnp.float32,
                       compute_dtype=jnp.float32, prefer_pallas=True)
    not_mod = lambda k, v: not i8.is_modulation_key(k)

    sharded = tp_flux.shard_flux_params(sd, cfg, TP, Q.Q8_0)
    sharded8 = i8.convert_tree_i8(sharded, pred=not_mod)
    sharded8 = tp_flux.place_tp_params(sharded8, mesh)
    got = np.asarray(tp_flux.tp_forward_stacked(
        sharded8, cfg, img, img_ids, txt, txt_ids, t, y, g,
        mesh=mesh, qcfg=qcfg), np.float32)

    # unsharded w8a8 reference on the same codec blocks
    params = testing.quantize_flux_params(sd, qtype=Q.Q8_0)
    sp = flux.stack_flux_params(params, cfg)
    sp8 = i8.convert_tree_i8(sp, pred=not_mod)
    ref = np.asarray(flux.forward_stacked(
        sp8, cfg, img, img_ids, txt, txt_ids, t, y, g,
        qcfg=dc.replace(qcfg, prefer_pallas=False)), np.float32)

    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05, rel
    assert np.all(np.isfinite(got))


def test_flux_engine_dp_mesh_over_i8():
    """Data-parallel serving over a w8a8 model: replicated int8 weights +
    GSPMD lane-sharded pool equals the unsharded i8 engine."""
    from jax.sharding import Mesh
    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.models import testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig
    from comfyui_gguf_tpu.sampling import linear_schedule

    dims = testing.TinyFluxDims()
    sparams = testing.flux_random_stacked_params(dims, qtype=Q.Q4_K, seed=0)
    mdl = pipeline.DiffusionModel(arch="flux", params=sparams,
                                  config=dims.config(), qcfg=QuantConfig())
    mdl = mdl.requantize_i8(free_source=False)
    h = w = 8
    txt_len = 8
    rng = np.random.default_rng(2)
    L = (h // 2) * (w // 2)

    def mk(seed):
        r = np.random.default_rng(seed)
        return (r.standard_normal((L, dims.in_ch)).astype(np.float32),
                {"txt": r.standard_normal((txt_len, dims.ctx))
                 .astype(np.float32),
                 "y": r.standard_normal((dims.vec,)).astype(np.float32),
                 "guidance": np.float32(4.0)})

    x1, c1 = mk(10)
    x2, c2 = mk(11)
    sig = linear_schedule(3)
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    results = []
    for dp in (None, mesh):
        eng = pipeline.flux_engine(mdl, h, w, txt_len, max_batch=2,
                                   dp_mesh=dp)
        r1 = eng.submit(x1.copy(), c1, sig)
        r2 = eng.submit(x2.copy(), c2, sig)
        eng.run_until_drained()
        assert r1.error is None and r2.error is None
        # the dp serving stat line (VERDICT r3 item 7): the sharded
        # engine must report real work, full occupancy, both completions
        snap = eng.stats.snapshot()
        print(f"dp={'1' if dp is None else mesh.shape['dp']} w8a8 "
              f"serving stats: {snap}")
        assert snap["completed"] == 2
        assert snap["mean_batch_occupancy"] == 1.0
        assert snap["steps_per_second"] > 0
        results.append((np.asarray(r1.result, np.float32),
                        np.asarray(r2.result, np.float32)))
    (a1, a2), (b1, b2) = results
    np.testing.assert_allclose(b1, a1, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(b2, a2, rtol=2e-2, atol=2e-2)


def test_text_encoder_requantize_i8_method():
    from comfyui_gguf_tpu import pipeline
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    pq, _ = make_pq(64, 512)
    enc = pipeline.TextEncoder(
        "t5", {"q.weight": pq, "ln.weight": jnp.ones((64,))},
        None, None, QuantConfig())
    out = enc.requantize_i8(free_source=False)
    assert out is enc  # mutate-and-return-self contract
    assert isinstance(enc.params["q.weight"], i8.I8Planar)
    assert isinstance(enc.params["ln.weight"], jax.Array)


def test_convert_tree_walk_handles_sequences():
    """The pred/free_source walk converts packed leaves inside lists and
    tuples (the tree_map path always did) instead of silently skipping."""
    pq1, _ = make_pq(64, 512, seed=0)
    pq2, _ = make_pq(64, 512, seed=1)
    tree = {"seq": [pq1, {"w": pq2}], "tup": (jnp.ones((2,)),)}
    out = i8.convert_tree_i8(tree, pred=lambda k, v: True)
    assert isinstance(out["seq"][0], i8.I8Planar)
    assert isinstance(out["seq"][1]["w"], i8.I8Planar)
    assert isinstance(out["tup"], tuple)


def test_convert_tree_budget():
    """max_bytes: greedy partial conversion under a total byte cap —
    experts last, total packed bytes never exceed the budget."""
    pq_a, _ = make_pq(256, 512, seed=0)   # bigger non-expert
    pq_b, _ = make_pq(64, 512, seed=1)    # smaller non-expert
    pq_e, _ = make_pq(256, 512, seed=2)   # expert leaf
    tree = {"attn.weight": pq_a, "mlp.weight": pq_b,
            "experts.w1.weight": pq_e}
    from comfyui_gguf_tpu.quant.i8 import _leaf_bytes

    pb_a, ib_a = _leaf_bytes(pq_a)
    pb_b, ib_b = _leaf_bytes(pq_b)
    pb_e, ib_e = _leaf_bytes(pq_e)
    total_planar = pb_a + pb_b + pb_e

    # budget fits converting both non-experts but not the expert
    budget = total_planar + (ib_a - pb_a) + (ib_b - pb_b)
    out = i8.convert_tree_i8(tree, max_bytes=budget)
    assert isinstance(out["attn.weight"], i8.I8Planar)
    assert isinstance(out["mlp.weight"], i8.I8Planar)
    assert isinstance(out["experts.w1.weight"], planar.PlanarQuant)

    # unlimited budget converts everything
    out2 = i8.convert_tree_i8(tree, max_bytes=1 << 40)
    assert isinstance(out2["experts.w1.weight"], i8.I8Planar)

    # budget below any conversion keeps the whole tree planar
    out3 = i8.convert_tree_i8(tree, max_bytes=total_planar)
    assert all(isinstance(v, planar.PlanarQuant) for v in out3.values())


def test_budget_noop_warns(caplog):
    """A budget at/below the planar footprint converts NOTHING — that
    must be loud (the first HiDream --i8 campaign silently benched the
    planar model against itself)."""
    import logging as _logging

    pq_a, _ = make_pq(256, 512, seed=0)
    tree = {"attn.weight": pq_a}
    from comfyui_gguf_tpu.quant.i8 import _leaf_bytes

    pb, _ib = _leaf_bytes(pq_a)
    with caplog.at_level(_logging.WARNING,
                         logger="comfyui_gguf_tpu.quant.i8"):
        out = i8.convert_tree_i8(tree, max_bytes=pb)
    assert isinstance(out["attn.weight"], planar.PlanarQuant)
    assert any("NOTHING will be converted" in r.message
               for r in caplog.records), caplog.records
