"""Synthetic model builders for tests / compile checks / benches.

Generates random state dicts with the exact key naming + shapes of real
GGUF checkpoints so the whole pipeline (quantize → planarize → model
forward) can be exercised without multi-GB downloads.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..gguf.constants import GGMLQuantizationType as Q
from ..quant import codecs
from ..quant.planar import planarize
from .flux import FluxConfig


@dataclasses.dataclass(frozen=True)
class TinyFluxDims:
    hidden: int = 128
    heads: int = 4
    ctx: int = 64
    vec: int = 32
    in_ch: int = 16
    depth_double: int = 2
    depth_single: int = 2
    axes_dim: tuple[int, ...] = (8, 12, 12)

    @property
    def mlp(self) -> int:
        return 4 * self.hidden

    def config(self) -> FluxConfig:
        return FluxConfig(
            in_channels=self.in_ch, hidden=self.hidden, n_heads=self.heads,
            depth_double=self.depth_double, depth_single=self.depth_single,
            axes_dim=self.axes_dim, context_dim=self.ctx, vec_dim=self.vec,
            guidance_embed=True,
        )


# flux1-dev/schnell real dims (12B params)
FLUX_DEV_DIMS = TinyFluxDims(
    hidden=3072, heads=24, ctx=4096, vec=768, in_ch=64,
    depth_double=19, depth_single=38, axes_dim=(16, 56, 56),
)


def flux_state_dict(dims: TinyFluxDims, seed: int = 0,
                    dtype=np.float32) -> dict[str, np.ndarray]:
    """Random flux state dict with BFL key naming (see models/flux.py)."""
    rng = np.random.default_rng(seed)
    HID, CTX, VEC, INCH, MLP = (dims.hidden, dims.ctx, dims.vec, dims.in_ch,
                                dims.mlp)
    hd = HID // dims.heads

    def t(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(dtype)

    sd = {
        "img_in.weight": t(HID, INCH), "img_in.bias": t(HID),
        "txt_in.weight": t(HID, CTX), "txt_in.bias": t(HID),
        "time_in.in_layer.weight": t(HID, 256),
        "time_in.in_layer.bias": t(HID),
        "time_in.out_layer.weight": t(HID, HID),
        "time_in.out_layer.bias": t(HID),
        "vector_in.in_layer.weight": t(HID, VEC),
        "vector_in.in_layer.bias": t(HID),
        "vector_in.out_layer.weight": t(HID, HID),
        "vector_in.out_layer.bias": t(HID),
        "guidance_in.in_layer.weight": t(HID, 256),
        "guidance_in.in_layer.bias": t(HID),
        "guidance_in.out_layer.weight": t(HID, HID),
        "guidance_in.out_layer.bias": t(HID),
        "final_layer.linear.weight": t(INCH, HID),
        "final_layer.linear.bias": t(INCH),
        "final_layer.adaLN_modulation.1.weight": t(2 * HID, HID),
        "final_layer.adaLN_modulation.1.bias": t(2 * HID),
    }
    for i in range(dims.depth_double):
        p = f"double_blocks.{i}."
        for s in ("img", "txt"):
            sd[p + f"{s}_mod.lin.weight"] = t(6 * HID, HID)
            sd[p + f"{s}_mod.lin.bias"] = t(6 * HID)
            sd[p + f"{s}_attn.qkv.weight"] = t(3 * HID, HID)
            sd[p + f"{s}_attn.qkv.bias"] = t(3 * HID)
            sd[p + f"{s}_attn.norm.query_norm.scale"] = t(hd) + 1
            sd[p + f"{s}_attn.norm.key_norm.scale"] = t(hd) + 1
            sd[p + f"{s}_attn.proj.weight"] = t(HID, HID)
            sd[p + f"{s}_attn.proj.bias"] = t(HID)
            sd[p + f"{s}_mlp.0.weight"] = t(MLP, HID)
            sd[p + f"{s}_mlp.0.bias"] = t(MLP)
            sd[p + f"{s}_mlp.2.weight"] = t(HID, MLP)
            sd[p + f"{s}_mlp.2.bias"] = t(HID)
    for i in range(dims.depth_single):
        p = f"single_blocks.{i}."
        sd[p + "linear1.weight"] = t(3 * HID + MLP, HID)
        sd[p + "linear1.bias"] = t(3 * HID + MLP)
        sd[p + "linear2.weight"] = t(HID, HID + MLP)
        sd[p + "linear2.bias"] = t(HID)
        sd[p + "modulation.lin.weight"] = t(3 * HID, HID)
        sd[p + "modulation.lin.bias"] = t(3 * HID)
        sd[p + "norm.query_norm.scale"] = t(hd) + 1
        sd[p + "norm.key_norm.scale"] = t(hd) + 1
    return sd


def flux_shape_spec(dims: TinyFluxDims, guidance: bool = True):
    """(nonblock, groups) shape spec mirroring flux_state_dict — the
    expected-key source for the checkpoint pre-flight validator
    (tools/validate_checkpoint.py). ``guidance=False`` drops the
    guidance_in embedder (flux-schnell)."""
    HID, CTX, VEC, INCH, MLP = (dims.hidden, dims.ctx, dims.vec,
                                dims.in_ch, dims.mlp)
    hd = HID // dims.heads
    nonblock = {
        "img_in.weight": (HID, INCH), "img_in.bias": (HID,),
        "txt_in.weight": (HID, CTX), "txt_in.bias": (HID,),
        "time_in.in_layer.weight": (HID, 256),
        "time_in.in_layer.bias": (HID,),
        "time_in.out_layer.weight": (HID, HID),
        "time_in.out_layer.bias": (HID,),
        "vector_in.in_layer.weight": (HID, VEC),
        "vector_in.in_layer.bias": (HID,),
        "vector_in.out_layer.weight": (HID, HID),
        "vector_in.out_layer.bias": (HID,),
        "final_layer.linear.weight": (INCH, HID),
        "final_layer.linear.bias": (INCH,),
        "final_layer.adaLN_modulation.1.weight": (2 * HID, HID),
        "final_layer.adaLN_modulation.1.bias": (2 * HID,),
    }
    if guidance:
        nonblock.update({
            "guidance_in.in_layer.weight": (HID, 256),
            "guidance_in.in_layer.bias": (HID,),
            "guidance_in.out_layer.weight": (HID, HID),
            "guidance_in.out_layer.bias": (HID,),
        })
    double = {}
    for s in ("img", "txt"):
        double.update({
            f"{s}_mod.lin.weight": (6 * HID, HID),
            f"{s}_mod.lin.bias": (6 * HID,),
            f"{s}_attn.qkv.weight": (3 * HID, HID),
            f"{s}_attn.qkv.bias": (3 * HID,),
            f"{s}_attn.norm.query_norm.scale": (hd,),
            f"{s}_attn.norm.key_norm.scale": (hd,),
            f"{s}_attn.proj.weight": (HID, HID),
            f"{s}_attn.proj.bias": (HID,),
            f"{s}_mlp.0.weight": (MLP, HID),
            f"{s}_mlp.0.bias": (MLP,),
            f"{s}_mlp.2.weight": (HID, MLP),
            f"{s}_mlp.2.bias": (HID,),
        })
    single = {
        "linear1.weight": (3 * HID + MLP, HID),
        "linear1.bias": (3 * HID + MLP,),
        "linear2.weight": (HID, HID + MLP),
        "linear2.bias": (HID,),
        "modulation.lin.weight": (3 * HID, HID),
        "modulation.lin.bias": (3 * HID,),
        "norm.query_norm.scale": (hd,),
        "norm.key_norm.scale": (hd,),
    }
    return nonblock, {"double_blocks": (dims.depth_double, double),
                      "single_blocks": (dims.depth_single, single)}


def sd3_shape_spec(dims: TinySD3Dims) -> dict:
    """FLAT expected {key: shape} for sd3 (the final block is pre-only,
    so the per-block key sets differ — a flat dict instead of the
    homogeneous (nonblock, groups) format)."""
    shape_of = lambda *s: tuple(s)
    out = dict(_sd3_nonblock(dims, None, shape_of))
    for i in range(dims.depth):
        blk = _sd3_block_leaves(dims, packed=shape_of, dense=shape_of,
                                pre_only=(i == dims.depth - 1))
        out.update({f"joint_blocks.{i}.{k}": v for k, v in blk.items()})
    return out


def quantize_flux_params(sd: dict[str, np.ndarray], qtype=Q.Q8_0,
                         device=None) -> dict:
    """Pack the big 2-D weights into PlanarQuant (mixed-precision policy:
    embedders / final layer / norms stay dense — mirrors the reference
    quantizer's exclusion lists, tools/lcpp.patch:327-425)."""
    import jax.numpy as jnp

    out = {}
    for k, v in sd.items():
        if (v.ndim == 2 and v.shape[1] % 256 == 0 and "norm" not in k
                and not k.startswith(("final_layer.", "img_in", "txt_in",
                                      "time_in", "vector_in", "guidance_in"))):
            blocks = codecs.quantize(v, qtype)
            out[k] = planarize(blocks, qtype, v.shape, device=device)
        else:
            dt = jnp.float32 if v.ndim <= 1 else jnp.bfloat16
            out[k] = jnp.asarray(v, dtype=dt)
    return out


def random_planar(qtype, shape: tuple[int, int], rng: np.random.Generator,
                  device=None, stack: int | None = None):
    """Random PlanarQuant with the exact HBM layout of a real weight —
    contents are noise, which is all a throughput benchmark needs (skips
    the slow host-side encode of billions of parameters).

    ``stack=n`` prepends a depth axis of n to every leaf (the layout
    flux.stack_flux_params produces) without a host-side per-block build.
    """
    import jax
    import jax.numpy as jnp

    from ..quant.planar import LANE, PlanarQuant, _NIB4_TYPES

    R, K = shape
    kp = -(-K // 512) * 512  # planarize pads K to a 512 multiple
    rp = -(-R // LANE) * LANE
    comp = codecs.COMPONENT_EXTRACTORS[qtype](
        codecs.quantize(rng.standard_normal((1, 512), dtype=np.float32)
                        .repeat(1, axis=0), qtype))
    gs = comp.group_size
    has_offsets = comp.offsets is not None
    nib4 = qtype in _NIB4_TYPES
    put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray
    lead = () if stack is None else (stack,)
    if nib4:
        qs = put(rng.integers(0, 256, (*lead, kp // 2, rp), dtype=np.uint8))
        zp = comp.zero_point
        layout = "nib4"
    else:
        qs = put(rng.integers(-127, 128, (*lead, kp, rp)).astype(np.int8))
        zp = 0
        layout = "int8"
    scales = put((rng.standard_normal((*lead, kp // gs, rp)) * 0.01
                  ).astype(np.float32))
    offsets = (put((rng.standard_normal((*lead, kp // gs, rp)) * 0.01
                    ).astype(np.float32)) if has_offsets else None)
    return PlanarQuant(qs=qs, scales=scales, offsets=offsets,
                       qtype=int(qtype), layout=layout, group_size=gs,
                       zero_point=zp, shape=(R, K))


def flux_random_quant_params(dims: TinyFluxDims, qtype=Q.Q4_K, seed: int = 0,
                             device=None) -> dict:
    """Full flux param dict with random packed weights at real layout,
    built tensor-by-tensor (no 48GB host state dict)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    HID, CTX, VEC, INCH, MLP = (dims.hidden, dims.ctx, dims.vec, dims.in_ch,
                                dims.mlp)
    hd = HID // dims.heads

    def dense(*shape):
        dt = jnp.float32 if len(shape) <= 1 else jnp.bfloat16
        return jnp.asarray(
            (rng.standard_normal(shape) * 0.02).astype(np.float32), dtype=dt)

    def packed(r, k):
        return random_planar(qtype, (r, k), rng, device=device)

    params = {
        "img_in.weight": dense(HID, INCH), "img_in.bias": dense(HID),
        "txt_in.weight": dense(HID, CTX), "txt_in.bias": dense(HID),
        "time_in.in_layer.weight": dense(HID, 256),
        "time_in.in_layer.bias": dense(HID),
        "time_in.out_layer.weight": dense(HID, HID),
        "time_in.out_layer.bias": dense(HID),
        "vector_in.in_layer.weight": dense(HID, VEC),
        "vector_in.in_layer.bias": dense(HID),
        "vector_in.out_layer.weight": dense(HID, HID),
        "vector_in.out_layer.bias": dense(HID),
        "guidance_in.in_layer.weight": dense(HID, 256),
        "guidance_in.in_layer.bias": dense(HID),
        "guidance_in.out_layer.weight": dense(HID, HID),
        "guidance_in.out_layer.bias": dense(HID),
        "final_layer.linear.weight": dense(INCH, HID),
        "final_layer.linear.bias": dense(INCH),
        "final_layer.adaLN_modulation.1.weight": dense(2 * HID, HID),
        "final_layer.adaLN_modulation.1.bias": dense(2 * HID),
    }
    for i in range(dims.depth_double):
        p = f"double_blocks.{i}."
        for s in ("img", "txt"):
            params[p + f"{s}_mod.lin.weight"] = packed(6 * HID, HID)
            params[p + f"{s}_mod.lin.bias"] = dense(6 * HID)
            params[p + f"{s}_attn.qkv.weight"] = packed(3 * HID, HID)
            params[p + f"{s}_attn.qkv.bias"] = dense(3 * HID)
            params[p + f"{s}_attn.norm.query_norm.scale"] = dense(hd)
            params[p + f"{s}_attn.norm.key_norm.scale"] = dense(hd)
            params[p + f"{s}_attn.proj.weight"] = packed(HID, HID)
            params[p + f"{s}_attn.proj.bias"] = dense(HID)
            params[p + f"{s}_mlp.0.weight"] = packed(MLP, HID)
            params[p + f"{s}_mlp.0.bias"] = dense(MLP)
            params[p + f"{s}_mlp.2.weight"] = packed(HID, MLP)
            params[p + f"{s}_mlp.2.bias"] = dense(HID)
    for i in range(dims.depth_single):
        p = f"single_blocks.{i}."
        params[p + "linear1.weight"] = packed(3 * HID + MLP, HID)
        params[p + "linear1.bias"] = dense(3 * HID + MLP)
        params[p + "linear2.weight"] = packed(HID, HID + MLP)
        params[p + "linear2.bias"] = dense(HID)
        params[p + "modulation.lin.weight"] = packed(3 * HID, HID)
        params[p + "modulation.lin.bias"] = dense(3 * HID)
        params[p + "norm.query_norm.scale"] = dense(hd)
        params[p + "norm.key_norm.scale"] = dense(hd)
    return params


def flux_random_stacked_params(dims: TinyFluxDims, qtype=Q.Q4_K,
                               seed: int = 0, device=None) -> dict:
    """Full-depth flux params in stack_flux_params layout, with random
    packed weights generated DIRECTLY stacked (no transient 2x HBM from
    stacking per-block copies — at flux-dev dims the stacked tree is
    ~7 GB and the per-block intermediate would not fit beside it)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    HID, CTX, VEC, MLP = dims.hidden, dims.ctx, dims.vec, dims.mlp
    hd = HID // dims.heads
    nd, ns = dims.depth_double, dims.depth_single

    def dense(*shape):
        dt = jnp.float32 if len(shape) <= 1 else jnp.bfloat16
        return jnp.asarray(
            (rng.standard_normal(shape) * 0.02).astype(np.float32), dtype=dt)

    def packed(n, r, k):
        return random_planar(qtype, (r, k), rng, device=device, stack=n)

    params = {k: v for k, v in flux_random_quant_params(
        dataclasses.replace(dims, depth_double=0, depth_single=0),
        qtype=qtype, seed=seed, device=device).items()}

    double = {}
    for s in ("img", "txt"):
        double[f"{s}_mod.lin.weight"] = packed(nd, 6 * HID, HID)
        double[f"{s}_mod.lin.bias"] = dense(nd, 6 * HID)
        double[f"{s}_attn.qkv.weight"] = packed(nd, 3 * HID, HID)
        double[f"{s}_attn.qkv.bias"] = dense(nd, 3 * HID)
        double[f"{s}_attn.norm.query_norm.scale"] = dense(nd, hd)
        double[f"{s}_attn.norm.key_norm.scale"] = dense(nd, hd)
        double[f"{s}_attn.proj.weight"] = packed(nd, HID, HID)
        double[f"{s}_attn.proj.bias"] = dense(nd, HID)
        double[f"{s}_mlp.0.weight"] = packed(nd, MLP, HID)
        double[f"{s}_mlp.0.bias"] = dense(nd, MLP)
        double[f"{s}_mlp.2.weight"] = packed(nd, HID, MLP)
        double[f"{s}_mlp.2.bias"] = dense(nd, HID)
    params["double_blocks"] = double

    single = {
        "linear1.weight": packed(ns, 3 * HID + MLP, HID),
        "linear1.bias": dense(ns, 3 * HID + MLP),
        "linear2.weight": packed(ns, HID, HID + MLP),
        "linear2.bias": dense(ns, HID),
        "modulation.lin.weight": packed(ns, 3 * HID, HID),
        "modulation.lin.bias": dense(ns, 3 * HID),
        "norm.query_norm.scale": dense(ns, hd),
        "norm.key_norm.scale": dense(ns, hd),
    }
    params["single_blocks"] = single
    return params


def flux_example_inputs(dims: TinyFluxDims, batch: int = 1, h_lat: int = 8,
                        w_lat: int = 8, txt_len: int = 16, seed: int = 1,
                        dtype=None):
    """(img, img_ids, txt, txt_ids, t, y, guidance) matching flux.forward."""
    import jax.numpy as jnp
    from .flux import make_img_ids, patchify

    dtype = dtype or jnp.bfloat16
    rng = np.random.default_rng(seed)
    lat_c = dims.in_ch // 4
    latent = jnp.asarray(
        rng.standard_normal((batch, h_lat, w_lat, lat_c)), dtype)
    img = patchify(latent)
    img_ids = jnp.asarray(make_img_ids(h_lat // 2, w_lat // 2, batch))
    txt = jnp.asarray(rng.standard_normal((batch, txt_len, dims.ctx)), dtype)
    txt_ids = jnp.zeros((batch, txt_len, 3), jnp.int32)
    t = jnp.ones((batch,), jnp.float32)
    y = jnp.asarray(rng.standard_normal((batch, dims.vec)), dtype)
    g = jnp.full((batch,), 4.0, jnp.float32)
    return img, img_ids, txt, txt_ids, t, y, g


# ---------------------------------------------------------------------------
# SD3 / SD3.5 (MMDiT)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TinySD3Dims:
    hidden: int = 64
    heads: int = 2
    depth: int = 3
    ctx_dim: int = 32
    pooled: int = 16
    in_ch: int = 16
    pos_max: int = 8
    qk_norm: bool = True
    dual_prefix: int = 0  # sd3.5-medium: first N blocks carry attn2

    def config(self):
        from .sd3 import SD3Config

        return SD3Config(
            hidden=self.hidden, depth=self.depth, n_heads=self.heads,
            in_channels=self.in_ch, context_dim=self.ctx_dim,
            pooled_dim=self.pooled, pos_embed_max=self.pos_max,
            qk_norm=self.qk_norm,
            dual_attn_layers=tuple(range(self.dual_prefix)))


# sd3.5-large real dims (8B params): hidden 2432, 38 heads, 38 joint blocks
SD35_LARGE_DIMS = TinySD3Dims(
    hidden=2432, heads=38, depth=38, ctx_dim=4096, pooled=2048,
    in_ch=16, pos_max=192, qk_norm=True)

# sd3.5-medium real dims (2.5B, MMDiT-X): hidden 1536, 24 heads (hd 64),
# 24 blocks with dual x-stream attention in the first 13, pos grid 384
SD35_MEDIUM_DIMS = TinySD3Dims(
    hidden=1536, heads=24, depth=24, ctx_dim=4096, pooled=2048,
    in_ch=16, pos_max=384, qk_norm=True, dual_prefix=13)


def _sd3_nonblock(dims: TinySD3Dims, rng, dense):
    """Non-block keys (the reference quantizer excludes all of these —
    lcpp.patch sd3 rules — so they stay dense here too)."""
    HID, P, C = dims.hidden, 2, dims.in_ch
    return {
        "x_embedder.proj.weight": dense(HID, C, P, P),
        "x_embedder.proj.bias": dense(HID),
        "pos_embed": dense(1, dims.pos_max * dims.pos_max, HID),
        "t_embedder.mlp.0.weight": dense(HID, 256),
        "t_embedder.mlp.0.bias": dense(HID),
        "t_embedder.mlp.2.weight": dense(HID, HID),
        "t_embedder.mlp.2.bias": dense(HID),
        "y_embedder.mlp.0.weight": dense(HID, dims.pooled),
        "y_embedder.mlp.0.bias": dense(HID),
        "y_embedder.mlp.2.weight": dense(HID, HID),
        "y_embedder.mlp.2.bias": dense(HID),
        "context_embedder.weight": dense(HID, dims.ctx_dim),
        "context_embedder.bias": dense(HID),
        "final_layer.linear.weight": dense(P * P * C, HID),
        "final_layer.linear.bias": dense(P * P * C),
        "final_layer.adaLN_modulation.1.weight": dense(2 * HID, HID),
        "final_layer.adaLN_modulation.1.bias": dense(2 * HID),
    }


def _sd3_block_leaves(dims: TinySD3Dims, packed, dense, pre_only: bool,
                      dual: bool = False):
    """One joint block's relative-keyed leaves (n=None → unstacked).
    ``dual``: sd3.5-medium MMDiT-X x_block with a second self-attention
    (9-chunk adaLN + attn2 projections)."""
    HID = dims.hidden
    hd = HID // dims.heads
    w = {}
    for blk in ("context_block", "x_block"):
        po = pre_only and blk == "context_block"
        du = dual and blk == "x_block"
        w[f"{blk}.attn.qkv.weight"] = packed(3 * HID, HID)
        w[f"{blk}.attn.qkv.bias"] = dense(3 * HID)
        if dims.qk_norm:
            w[f"{blk}.attn.ln_q.weight"] = dense(hd)
            w[f"{blk}.attn.ln_k.weight"] = dense(hd)
        n_mod = 2 if po else (9 if du else 6)
        w[f"{blk}.adaLN_modulation.1.weight"] = packed(n_mod * HID, HID)
        w[f"{blk}.adaLN_modulation.1.bias"] = dense(n_mod * HID)
        if du:
            w[f"{blk}.attn2.qkv.weight"] = packed(3 * HID, HID)
            w[f"{blk}.attn2.qkv.bias"] = dense(3 * HID)
            if dims.qk_norm:
                w[f"{blk}.attn2.ln_q.weight"] = dense(hd)
                w[f"{blk}.attn2.ln_k.weight"] = dense(hd)
            w[f"{blk}.attn2.proj.weight"] = packed(HID, HID)
            w[f"{blk}.attn2.proj.bias"] = dense(HID)
        if not po:
            w[f"{blk}.attn.proj.weight"] = packed(HID, HID)
            w[f"{blk}.attn.proj.bias"] = dense(HID)
            w[f"{blk}.mlp.fc1.weight"] = packed(4 * HID, HID)
            w[f"{blk}.mlp.fc1.bias"] = dense(4 * HID)
            w[f"{blk}.mlp.fc2.weight"] = packed(HID, 4 * HID)
            w[f"{blk}.mlp.fc2.bias"] = dense(HID)
    return w


def sd3_flat_state_dict(dims: TinySD3Dims, seed: int = 0) -> dict:
    """Flat f32 numpy sd3 state dict (pre-only final block, real key
    layout) — the input format the TP sharder / quantize_unsharded
    exactness pairs consume (parallel/tp_spec)."""
    rng = np.random.default_rng(seed)

    def dense(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    sd = dict(_sd3_nonblock(dims, rng, dense))
    for i in range(dims.depth):
        blk = _sd3_block_leaves(dims, packed=dense, dense=dense,
                                pre_only=(i == dims.depth - 1),
                                dual=(i < dims.dual_prefix))
        sd.update({f"joint_blocks.{i}.{k}": v for k, v in blk.items()})
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def sd3_random_quant_params(dims: TinySD3Dims, qtype=Q.Q4_K, seed: int = 0,
                            device=None) -> dict:
    """Flat (joint_blocks.{i}.-keyed) sd3 params with random packed block
    weights at real layout; final block pre-only like real checkpoints."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def dense(*shape):
        dt = jnp.float32 if len(shape) <= 1 else jnp.bfloat16
        return jnp.asarray(
            (rng.standard_normal(shape) * 0.02).astype(np.float32), dtype=dt)

    def packed(r, k):
        return random_planar(qtype, (r, k), rng, device=device)

    params = _sd3_nonblock(dims, rng, dense)
    for i in range(dims.depth):
        blk = _sd3_block_leaves(dims, packed, dense,
                                pre_only=(i == dims.depth - 1),
                                dual=(i < dims.dual_prefix))
        params.update({f"joint_blocks.{i}.{k}": v for k, v in blk.items()})
    return params


def sd3_random_stacked_params(dims: TinySD3Dims, qtype=Q.Q4_K,
                              seed: int = 0, device=None) -> dict:
    """Full-depth sd3 params in stack_sd3_params layout, packed weights
    generated DIRECTLY stacked (no transient 2x HBM; see
    flux_random_stacked_params)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n_dual = dims.dual_prefix
    n = dims.depth - 1 - n_dual

    def dense(*shape):
        dt = jnp.float32 if len(shape) <= 1 else jnp.bfloat16
        return jnp.asarray(
            (rng.standard_normal(shape) * 0.02).astype(np.float32), dtype=dt)

    params = _sd3_nonblock(dims, rng, dense)
    if n_dual:  # sd3.5-medium MMDiT-X prefix group
        params["joint_blocks_dual"] = _sd3_block_leaves(
            dims,
            packed=lambda r, k: random_planar(qtype, (r, k), rng,
                                              device=device, stack=n_dual),
            dense=lambda *s: dense(n_dual, *s), pre_only=False, dual=True)
    params["joint_blocks"] = _sd3_block_leaves(
        dims,
        packed=lambda r, k: random_planar(qtype, (r, k), rng, device=device,
                                          stack=n),
        dense=lambda *s: dense(n, *s), pre_only=False)
    params["joint_blocks_last"] = _sd3_block_leaves(
        dims,
        packed=lambda r, k: random_planar(qtype, (r, k), rng,
                                          device=device),
        dense=dense, pre_only=True)
    return params


def sd3_example_inputs(dims: TinySD3Dims, batch: int = 1, h_lat: int = 16,
                       w_lat: int = 16, ctx_len: int = 16, seed: int = 1,
                       dtype=None):
    """(latent, context, pooled, t) matching sd3.forward."""
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    rng = np.random.default_rng(seed)
    latent = jnp.asarray(
        rng.standard_normal((batch, h_lat, w_lat, dims.in_ch)), dtype)
    context = jnp.asarray(
        rng.standard_normal((batch, ctx_len, dims.ctx_dim)), dtype)
    pooled = jnp.asarray(rng.standard_normal((batch, dims.pooled)), dtype)
    t = jnp.full((batch,), 0.7, jnp.float32)
    return latent, context, pooled, t


def vae_random_params(z_channels: int = 4, base_ch: int = 16,
                      ch_mult: tuple[int, ...] = (1, 1, 1, 1),
                      num_res_blocks: int = 1, seed: int = 0,
                      scale: float = 0.05):
    """Random sgm-format AutoencoderKL params (decoder + encoder) for a
    given geometry — the default 4-level ch_mult gives the 8× spatial
    factor of SD/flux VAEs at tiny channel counts (img2img tests)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def conv(o, i, k=3):
        return (rng.standard_normal((o, i, k, k)) * scale).astype(
            np.float32)

    def resnet(p, cin, cout):
        sd = {
            f"{p}.norm1.weight": np.ones(cin, np.float32),
            f"{p}.norm1.bias": np.zeros(cin, np.float32),
            f"{p}.conv1.weight": conv(cout, cin),
            f"{p}.conv1.bias": np.zeros(cout, np.float32),
            f"{p}.norm2.weight": np.ones(cout, np.float32),
            f"{p}.norm2.bias": np.zeros(cout, np.float32),
            f"{p}.conv2.weight": conv(cout, cout),
            f"{p}.conv2.bias": np.zeros(cout, np.float32),
        }
        if cin != cout:
            sd[f"{p}.nin_shortcut.weight"] = conv(cout, cin, 1)
            sd[f"{p}.nin_shortcut.bias"] = np.zeros(cout, np.float32)
        return sd

    def attn(p, c):
        sd = {f"{p}.norm.weight": np.ones(c, np.float32),
              f"{p}.norm.bias": np.zeros(c, np.float32)}
        for n in ("q", "k", "v", "proj_out"):
            sd[f"{p}.{n}.weight"] = conv(c, c, 1)
            sd[f"{p}.{n}.bias"] = np.zeros(c, np.float32)
        return sd

    chans = [base_ch * m for m in ch_mult]
    top = chans[-1]
    sd = {
        "decoder.conv_in.weight": conv(top, z_channels),
        "decoder.conv_in.bias": np.zeros(top, np.float32),
        "decoder.norm_out.weight": np.ones(chans[0], np.float32),
        "decoder.norm_out.bias": np.zeros(chans[0], np.float32),
        "decoder.conv_out.weight": conv(3, chans[0]),
        "decoder.conv_out.bias": np.zeros(3, np.float32),
        "encoder.conv_in.weight": conv(chans[0], 3),
        "encoder.conv_in.bias": np.zeros(chans[0], np.float32),
        "encoder.norm_out.weight": np.ones(top, np.float32),
        "encoder.norm_out.bias": np.zeros(top, np.float32),
        "encoder.conv_out.weight": conv(2 * z_channels, top),
        "encoder.conv_out.bias": np.zeros(2 * z_channels, np.float32),
    }
    for side in ("decoder.mid", "encoder.mid"):
        sd.update(resnet(f"{side}.block_1", top, top))
        sd.update(attn(f"{side}.attn_1", top))
        sd.update(resnet(f"{side}.block_2", top, top))
    n_levels = len(ch_mult)
    cur = top
    for i in reversed(range(n_levels)):
        for j in range(num_res_blocks + 1):
            sd.update(resnet(f"decoder.up.{i}.block.{j}", cur, chans[i]))
            cur = chans[i]
        if i > 0:
            sd[f"decoder.up.{i}.upsample.conv.weight"] = conv(cur, cur)
            sd[f"decoder.up.{i}.upsample.conv.bias"] = np.zeros(
                cur, np.float32)
    cur = chans[0]
    for i in range(n_levels):
        for j in range(num_res_blocks):
            sd.update(resnet(f"encoder.down.{i}.block.{j}", cur, chans[i]))
            cur = chans[i]
        if i < n_levels - 1:
            sd[f"encoder.down.{i}.downsample.conv.weight"] = conv(cur, cur)
            sd[f"encoder.down.{i}.downsample.conv.bias"] = np.zeros(
                cur, np.float32)
    return {k: jnp.asarray(v) for k, v in sd.items()}


@dataclasses.dataclass(frozen=True)
class TinyHiDreamDims:
    """HiDream-I1-like geometry knobs (defaults = tiny test size)."""
    hidden: int = 128
    heads: int = 2
    depth_double: int = 2
    depth_single: int = 2
    ffn: int = 256
    n_experts: int = 2
    top_k: int = 1
    t5_dim: int = 64
    llama_dim: int = 96
    pooled: int = 48
    in_ch: int = 16
    patch: int = 2

    def config(self):
        from .hidream import HiDreamConfig

        hd = self.hidden // self.heads
        return HiDreamConfig(
            hidden=self.hidden, n_heads=self.heads,
            depth_double=self.depth_double, depth_single=self.depth_single,
            in_channels=self.in_ch, patch_size=self.patch,
            n_experts=self.n_experts, top_k=self.top_k,
            axes_dim=(hd // 2, hd // 4, hd // 4))


# published HiDream-I1 scale: 2560 hidden / 20 heads / 16+32 blocks /
# 4 routed experts (top-2) + shared expert — ~17B params
HIDREAM_I1_DIMS = TinyHiDreamDims(
    hidden=2560, heads=20, depth_double=16, depth_single=32, ffn=6912,
    n_experts=4, top_k=2, t5_dim=4096, llama_dim=4096, pooled=2048)


def hidream_random_stacked_params(dims: TinyHiDreamDims, qtype=Q.Q4_K,
                                  seed: int = 0, device=None) -> dict:
    """Full-depth HiDream params directly in stack_hidream_params layout
    (depth-stacked block subtrees, MoE experts leaf-stacked as
    (depth, E, …)) with random packed weights — same no-transient-2×-HBM
    strategy as flux_random_stacked_params."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    H, FFN, E = dims.hidden, dims.ffn, dims.n_experts
    hd = H // dims.heads
    C4 = dims.in_ch * dims.patch ** 2

    def dense(*shape):
        dt = jnp.float32 if len(shape) <= 1 else jnp.bfloat16
        return jnp.asarray(
            (rng.standard_normal(shape) * 0.02).astype(np.float32), dtype=dt)

    def packed(n, r, k):
        return random_planar(qtype, (r, k), rng, device=device, stack=n)

    def packed_experts(n, r, k):
        """(depth, E, …) leaves: one (n·E)-stack reshaped."""
        leaf = random_planar(qtype, (r, k), rng, device=device, stack=n * E)
        return jax.tree_util.tree_map(
            lambda a: a.reshape(n, E, *a.shape[1:]), leaf)

    params = {
        "x_embedder.proj.weight": random_planar(qtype, (H, C4), rng,
                                                 device=device),
        "x_embedder.proj.bias": dense(H),
        "t_embedder.mlp.0.weight": random_planar(qtype, (H, 256), rng,
                                                 device=device),
        "t_embedder.mlp.0.bias": dense(H),
        "t_embedder.mlp.2.weight": random_planar(qtype, (H, H), rng,
                                                 device=device),
        "t_embedder.mlp.2.bias": dense(H),
        "p_embedder.mlp.0.weight": random_planar(qtype, (H, dims.pooled),
                                                 rng, device=device),
        "p_embedder.mlp.0.bias": dense(H),
        "p_embedder.mlp.2.weight": random_planar(qtype, (H, H), rng,
                                                 device=device),
        "p_embedder.mlp.2.bias": dense(H),
        # published ordering: 0..N-2 = llama taps, LAST = t5
        "caption_projection.0.linear.weight": random_planar(
            qtype, (H, dims.llama_dim), rng, device=device),
        "caption_projection.1.linear.weight": random_planar(
            qtype, (H, dims.t5_dim), rng, device=device),
        "final_layer.linear.weight": random_planar(qtype, (C4, H), rng,
                                                   device=device),
        "final_layer.linear.bias": dense(C4),
        "final_layer.adaLN_modulation.1.weight": random_planar(
            qtype, (2 * H, H), rng, device=device),
        "final_layer.adaLN_modulation.1.bias": dense(2 * H),
    }

    def moe(n):
        sub = {
            "gate.weight": dense(n, E, H),
            "shared_experts.w1.weight": packed(n, FFN, H),
            "shared_experts.w2.weight": packed(n, H, FFN),
            "shared_experts.w3.weight": packed(n, FFN, H),
            "experts_stacked": {
                "w1": packed_experts(n, FFN, H),
                "w2": packed_experts(n, H, FFN),
                "w3": packed_experts(n, FFN, H),
            },
        }
        return sub

    nd, ns = dims.depth_double, dims.depth_single
    double = {
        "block.adaLN_modulation.1.weight": packed(nd, 12 * H, H),
        "block.adaLN_modulation.1.bias": dense(nd, 12 * H),
    }
    for suf in ("", "_t"):
        for nme in ("to_q", "to_k", "to_v", "to_out"):
            double[f"block.attn1.{nme}{suf}.weight"] = packed(nd, H, H)
        double[f"block.attn1.q_rms_norm{suf}.weight"] = dense(nd, hd)
        double[f"block.attn1.k_rms_norm{suf}.weight"] = dense(nd, hd)
    for k, v in moe(nd).items():
        double[f"block.ff_i.{k}"] = v
    double["block.ff_t.w1.weight"] = packed(nd, FFN, H)
    double["block.ff_t.w2.weight"] = packed(nd, H, FFN)
    double["block.ff_t.w3.weight"] = packed(nd, FFN, H)
    params["double_stream_blocks"] = double

    single = {
        "block.adaLN_modulation.1.weight": packed(ns, 6 * H, H),
        "block.adaLN_modulation.1.bias": dense(ns, 6 * H),
    }
    for nme in ("to_q", "to_k", "to_v", "to_out"):
        single[f"block.attn1.{nme}.weight"] = packed(ns, H, H)
    single["block.attn1.q_rms_norm.weight"] = dense(ns, hd)
    single["block.attn1.k_rms_norm.weight"] = dense(ns, hd)
    for k, v in moe(ns).items():
        single[f"block.ff_i.{k}"] = v
    params["single_stream_blocks"] = single
    return params


def hidream_shape_spec(d: TinyHiDreamDims):
    """(nonblock, groups) flat shape spec mirroring models/hidream.py key
    expectations — the FLAT (per-block, per-expert) key layout the spec
    TP sharder consumes (parallel/tp_spec.shard_hidream_params); MoE
    experts stay un-stacked so the dense dispatch slices them by key."""
    H, F, E = d.hidden, d.ffn, d.n_experts
    hd = H // d.heads
    C4 = d.in_ch * d.patch ** 2
    nonblock = {
        "x_embedder.proj.weight": (H, C4), "x_embedder.proj.bias": (H,),
        "t_embedder.mlp.0.weight": (H, 256), "t_embedder.mlp.0.bias": (H,),
        "t_embedder.mlp.2.weight": (H, H), "t_embedder.mlp.2.bias": (H,),
        "p_embedder.mlp.0.weight": (H, d.pooled),
        "p_embedder.mlp.0.bias": (H,),
        "p_embedder.mlp.2.weight": (H, H), "p_embedder.mlp.2.bias": (H,),
        # published ordering: 0..N-2 = llama taps, LAST = t5
        "caption_projection.0.linear.weight": (H, d.llama_dim),
        "caption_projection.1.linear.weight": (H, d.t5_dim),
        "final_layer.linear.weight": (C4, H),
        "final_layer.linear.bias": (C4,),
        "final_layer.adaLN_modulation.1.weight": (2 * H, H),
        "final_layer.adaLN_modulation.1.bias": (2 * H,),
    }

    def moe_suffixes(prefix):
        s = {f"{prefix}.gate.weight": (E, H)}
        for p2 in ([f"{prefix}.shared_experts"]
                   + [f"{prefix}.experts.{e}" for e in range(E)]):
            s[f"{p2}.w1.weight"] = (F, H)
            s[f"{p2}.w2.weight"] = (H, F)
            s[f"{p2}.w3.weight"] = (F, H)
        return s

    double = {"block.adaLN_modulation.1.weight": (12 * H, H),
              "block.adaLN_modulation.1.bias": (12 * H,)}
    for t in ("", "_t"):
        for n in ("to_q", "to_k", "to_v", "to_out"):
            double[f"block.attn1.{n}{t}.weight"] = (H, H)
        double[f"block.attn1.q_rms_norm{t}.weight"] = (hd,)
        double[f"block.attn1.k_rms_norm{t}.weight"] = (hd,)
    double.update(moe_suffixes("block.ff_i"))
    double["block.ff_t.w1.weight"] = (F, H)
    double["block.ff_t.w2.weight"] = (H, F)
    double["block.ff_t.w3.weight"] = (F, H)

    single = {"block.adaLN_modulation.1.weight": (6 * H, H),
              "block.adaLN_modulation.1.bias": (6 * H,)}
    for n in ("to_q", "to_k", "to_v", "to_out"):
        single[f"block.attn1.{n}.weight"] = (H, H)
    single["block.attn1.q_rms_norm.weight"] = (hd,)
    single["block.attn1.k_rms_norm.weight"] = (hd,)
    single.update(moe_suffixes("block.ff_i"))

    return nonblock, {
        "double_stream_blocks": (d.depth_double, double),
        "single_stream_blocks": (d.depth_single, single),
    }


# ---------------------------------------------------------------------------
# Generic spec-driven full-depth generators (wan / hyvid / aura / lumina2 /
# qwen-image / ltxv / cosmos full-dims benches)
# ---------------------------------------------------------------------------

def random_flat_sd_from_spec(nonblock: dict, groups: dict,
                             seed: int = 0) -> dict:
    """Flat f32 numpy state dict from a shape spec — the input format
    the per-arch TP sharders and exactness baselines share
    (parallel/tp_spec.shard_stacked_params / quantize_unsharded): keys
    are ``{out_key}.{i}.{suffix}`` plus the nonblock keys. Norm scales
    ("norm" in the key) center at 1 like real checkpoints."""
    rng = np.random.default_rng(seed)

    def t(shape, key):
        w = (rng.standard_normal(shape) * 0.02).astype(np.float32)
        if "norm" in key and len(shape) == 1:
            w = w + 1.0
        return w

    sd = {k: t(tuple(s), k) for k, s in nonblock.items()}
    for out_key, (depth, suffixes) in groups.items():
        for i in range(depth):
            for suf, s in suffixes.items():
                sd[f"{out_key}.{i}.{suf}"] = t(tuple(s), suf)
    return sd


def random_stacked_from_spec(nonblock: dict, groups: dict, qtype=Q.Q4_K,
                             seed: int = 0, device=None) -> dict:
    """Full-depth stacked param tree straight from a shape spec.

    ``nonblock``: key → shape for prelude/finale tensors (kept DENSE —
    mirrors the reference quantizer's exclusion lists, which leave
    embedders / final layers unquantized, reference tools/lcpp.patch
    exclusion tables). ``groups``: out_key → (depth, {suffix → shape})
    describing one homogeneous scanned block; 2-D ``.weight`` suffixes
    with min dim ≥ 256 become stacked PlanarQuant leaves generated
    DIRECTLY at depth (no 2× HBM transient — same strategy as
    flux_random_stacked_params), everything else a dense stacked leaf.
    The output layout matches ``flux.stack_block_groups``.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def dense(shape):
        dt = jnp.float32 if len(shape) <= 1 else jnp.bfloat16
        return jnp.asarray(
            (rng.standard_normal(shape) * 0.02).astype(np.float32), dtype=dt)

    params = {k: dense(tuple(s)) for k, s in nonblock.items()}
    for out_key, (depth, suffixes) in groups.items():
        sub = {}
        for suf, s in suffixes.items():
            s = tuple(s)
            if (len(s) == 2 and suf.endswith(".weight")
                    and min(s) >= 256):
                sub[suf] = random_planar(qtype, s, rng, device=device,
                                         stack=depth)
            else:
                sub[suf] = dense((depth, *s))
        params[out_key] = sub
    return params


@dataclasses.dataclass(frozen=True)
class WanDims:
    """Wan 2.1 t2v dims (models/wan.py WanConfig fields)."""
    dim: int = 128
    ffn_dim: int = 256
    n_heads: int = 2
    n_layers: int = 2
    in_ch: int = 16
    text_dim: int = 64

    def config(self):
        from .wan import WanConfig
        return WanConfig(dim=self.dim, ffn_dim=self.ffn_dim,
                         n_heads=self.n_heads, n_layers=self.n_layers,
                         in_channels=self.in_ch, out_channels=self.in_ch,
                         text_dim=self.text_dim)


# Wan2.1-T2V-14B: dim 5120, ffn 13824, 40 heads (hd 128), 40 blocks,
# UMT5-xxl text states (4096), 16-ch VAE latents, (1,2,2) patch.
WAN_14B_DIMS = WanDims(dim=5120, ffn_dim=13824, n_heads=40, n_layers=40,
                       in_ch=16, text_dim=4096)


def wan_shape_spec(d: WanDims):
    """(nonblock, groups) shape spec for random_stacked_from_spec,
    mirroring tests/test_wan.py's tiny state dict / models/wan.py key
    expectations."""
    D, T, F, C = d.dim, d.text_dim, d.ffn_dim, d.in_ch
    nonblock = {
        "patch_embedding.weight": (D, C, 1, 2, 2),
        "patch_embedding.bias": (D,),
        "text_embedding.0.weight": (D, T),
        "text_embedding.0.bias": (D,),
        "text_embedding.2.weight": (D, D),
        "text_embedding.2.bias": (D,),
        "time_embedding.0.weight": (D, 256),
        "time_embedding.0.bias": (D,),
        "time_embedding.2.weight": (D, D),
        "time_embedding.2.bias": (D,),
        "time_projection.1.weight": (6 * D, D),
        "time_projection.1.bias": (6 * D,),
        "head.modulation": (1, 2, D),
        "head.head.weight": (C * 4, D),
        "head.head.bias": (C * 4,),
    }
    suffixes = {"modulation": (1, 6, D)}
    for a in ("self_attn", "cross_attn"):
        for n in ("q", "k", "v", "o"):
            suffixes[f"{a}.{n}.weight"] = (D, D)
            suffixes[f"{a}.{n}.bias"] = (D,)
        suffixes[f"{a}.norm_q.weight"] = (D,)
        suffixes[f"{a}.norm_k.weight"] = (D,)
    suffixes["norm3.weight"] = (D,)
    suffixes["norm3.bias"] = (D,)
    suffixes["ffn.0.weight"] = (F, D)
    suffixes["ffn.0.bias"] = (F,)
    suffixes["ffn.2.weight"] = (D, F)
    suffixes["ffn.2.bias"] = (D,)
    return nonblock, {"blocks": (d.n_layers, suffixes)}


def wan_random_stacked_params(d: WanDims, qtype=Q.Q4_K, seed: int = 0,
                              device=None) -> dict:
    nonblock, groups = wan_shape_spec(d)
    return random_stacked_from_spec(nonblock, groups, qtype=qtype,
                                    seed=seed, device=device)


@dataclasses.dataclass(frozen=True)
class HyVidDims:
    """HunyuanVideo dims (models/hyvid.py HyVidConfig fields)."""
    hidden: int = 128
    n_heads: int = 2
    depth_double: int = 2
    depth_single: int = 2
    refiner_depth: int = 1
    in_ch: int = 16
    text_dim: int = 64

    @property
    def mlp(self) -> int:
        return 4 * self.hidden

    def config(self):
        from .hyvid import HyVidConfig
        return HyVidConfig(hidden=self.hidden, n_heads=self.n_heads,
                           depth_double=self.depth_double,
                           depth_single=self.depth_single,
                           in_channels=self.in_ch, text_dim=self.text_dim)


# HunyuanVideo 13B: hidden 3072, 24 heads (hd 128), 20 double + 40
# single blocks, mlp_ratio 4, 2 LLM-token-refiner blocks, llama text
# states (4096), 16-ch latents, (1,2,2) patch.
HYVID_13B_DIMS = HyVidDims(hidden=3072, n_heads=24, depth_double=20,
                           depth_single=40, refiner_depth=2, in_ch=16,
                           text_dim=4096)


def hyvid_shape_spec(d: HyVidDims):
    """(nonblock, groups) spec mirroring tests/test_hyvid.py's tiny state
    dict / models/hyvid.py key expectations."""
    H, T, C, M = d.hidden, d.text_dim, d.in_ch, d.mlp
    hd = H // d.n_heads
    nonblock = {
        "img_in.proj.weight": (H, C, 1, 2, 2),
        "img_in.proj.bias": (H,),
        "time_in.in_layer.weight": (H, 256),
        "time_in.in_layer.bias": (H,),
        "time_in.out_layer.weight": (H, H),
        "time_in.out_layer.bias": (H,),
        "guidance_in.in_layer.weight": (H, 256),
        "guidance_in.in_layer.bias": (H,),
        "guidance_in.out_layer.weight": (H, H),
        "guidance_in.out_layer.bias": (H,),
        "txt_in.input_embedder.weight": (H, T),
        "txt_in.input_embedder.bias": (H,),
        "txt_in.t_embedder.mlp.0.weight": (H, 256),
        "txt_in.t_embedder.mlp.0.bias": (H,),
        "txt_in.t_embedder.mlp.2.weight": (H, H),
        "txt_in.t_embedder.mlp.2.bias": (H,),
        "txt_in.c_embedder.linear_1.weight": (H, H),
        "txt_in.c_embedder.linear_1.bias": (H,),
        "txt_in.c_embedder.linear_2.weight": (H, H),
        "txt_in.c_embedder.linear_2.bias": (H,),
        "final_layer.linear.weight": (C * 4, H),
        "final_layer.linear.bias": (C * 4,),
        "final_layer.adaLN_modulation.1.weight": (2 * H, H),
        "final_layer.adaLN_modulation.1.bias": (2 * H,),
    }
    for i in range(d.refiner_depth):
        rb = f"txt_in.individual_token_refiner.blocks.{i}"
        nonblock.update({
            f"{rb}.self_attn_qkv.weight": (3 * H, H),
            f"{rb}.self_attn_qkv.bias": (3 * H,),
            f"{rb}.self_attn_proj.weight": (H, H),
            f"{rb}.self_attn_proj.bias": (H,),
            f"{rb}.norm1.weight": (H,),
            f"{rb}.norm1.bias": (H,),
            f"{rb}.norm2.weight": (H,),
            f"{rb}.norm2.bias": (H,),
            f"{rb}.mlp.fc1.weight": (M, H),
            f"{rb}.mlp.fc1.bias": (M,),
            f"{rb}.mlp.fc2.weight": (H, M),
            f"{rb}.mlp.fc2.bias": (H,),
            f"{rb}.adaLN_modulation.1.weight": (2 * H, H),
            f"{rb}.adaLN_modulation.1.bias": (2 * H,),
        })
    double = {}
    for s in ("img", "txt"):
        double.update({
            f"{s}_mod.linear.weight": (6 * H, H),
            f"{s}_mod.linear.bias": (6 * H,),
            f"{s}_attn_qkv.weight": (3 * H, H),
            f"{s}_attn_qkv.bias": (3 * H,),
            f"{s}_attn_q_norm.weight": (hd,),
            f"{s}_attn_k_norm.weight": (hd,),
            f"{s}_attn_proj.weight": (H, H),
            f"{s}_attn_proj.bias": (H,),
            f"{s}_mlp.fc1.weight": (M, H),
            f"{s}_mlp.fc1.bias": (M,),
            f"{s}_mlp.fc2.weight": (H, M),
            f"{s}_mlp.fc2.bias": (H,),
        })
    single = {
        "linear1.weight": (3 * H + M, H),
        "linear1.bias": (3 * H + M,),
        "linear2.weight": (H, H + M),
        "linear2.bias": (H,),
        "modulation.linear.weight": (3 * H, H),
        "modulation.linear.bias": (3 * H,),
        "q_norm.weight": (hd,),
        "k_norm.weight": (hd,),
    }
    return nonblock, {"double_blocks": (d.depth_double, double),
                      "single_blocks": (d.depth_single, single)}


def hyvid_random_stacked_params(d: HyVidDims, qtype=Q.Q4_K, seed: int = 0,
                                device=None) -> dict:
    nonblock, groups = hyvid_shape_spec(d)
    return random_stacked_from_spec(nonblock, groups, qtype=qtype,
                                    seed=seed, device=device)


@dataclasses.dataclass(frozen=True)
class QwenImageDims:
    """Qwen-Image dims (models/qwen_image.py QwenImageConfig fields)."""
    hidden: int = 128
    n_heads: int = 2
    n_layers: int = 2
    in_ch: int = 32
    context_dim: int = 96

    def config(self):
        from .qwen_image import QwenImageConfig
        hd = self.hidden // self.n_heads
        third = 2 * ((hd - hd // 8) // 4)
        return QwenImageConfig(hidden=self.hidden, n_layers=self.n_layers,
                               n_heads=self.n_heads, in_channels=self.in_ch,
                               context_dim=self.context_dim,
                               axes_dim=(hd - 2 * third, third, third))


# Qwen-Image (20B MMDiT): hidden 3072, 24 heads (hd 128), 60 joint
# blocks, Qwen2.5-VL-7B text states (3584), 64 input features
# (16-ch latents × 2×2 patch).
QWEN_IMAGE_20B_DIMS = QwenImageDims(hidden=3072, n_heads=24, n_layers=60,
                                    in_ch=64, context_dim=3584)


def qwen_image_shape_spec(d: QwenImageDims):
    """(nonblock, groups) spec mirroring tests/test_cosmos_qwen.py's tiny
    state dict / models/qwen_image.py key expectations."""
    H, T, I = d.hidden, d.context_dim, d.in_ch
    hd = H // d.n_heads
    nonblock = {
        "img_in.weight": (H, I), "img_in.bias": (H,),
        "txt_in.weight": (H, T), "txt_in.bias": (H,),
        "txt_norm.weight": (T,),
        "time_text_embed.timestep_embedder.linear_1.weight": (H, 256),
        "time_text_embed.timestep_embedder.linear_1.bias": (H,),
        "time_text_embed.timestep_embedder.linear_2.weight": (H, H),
        "time_text_embed.timestep_embedder.linear_2.bias": (H,),
        "norm_out.linear.weight": (2 * H, H),
        "norm_out.linear.bias": (2 * H,),
        "proj_out.weight": (I, H), "proj_out.bias": (I,),
    }
    block = {
        "img_mod.1.weight": (6 * H, H), "img_mod.1.bias": (6 * H,),
        "txt_mod.1.weight": (6 * H, H), "txt_mod.1.bias": (6 * H,),
        "attn.to_out.0.weight": (H, H), "attn.to_out.0.bias": (H,),
        "attn.to_add_out.weight": (H, H), "attn.to_add_out.bias": (H,),
    }
    for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
              "add_v_proj"):
        block[f"attn.{n}.weight"] = (H, H)
        block[f"attn.{n}.bias"] = (H,)
    for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
        block[f"attn.{n}.weight"] = (hd,)
    for s in ("img", "txt"):
        block[f"{s}_mlp.net.0.proj.weight"] = (4 * H, H)
        block[f"{s}_mlp.net.0.proj.bias"] = (4 * H,)
        block[f"{s}_mlp.net.2.weight"] = (H, 4 * H)
        block[f"{s}_mlp.net.2.bias"] = (H,)
    return nonblock, {"transformer_blocks": (d.n_layers, block)}


def qwen_image_random_stacked_params(d: QwenImageDims, qtype=Q.Q4_K,
                                     seed: int = 0, device=None) -> dict:
    nonblock, groups = qwen_image_shape_spec(d)
    return random_stacked_from_spec(nonblock, groups, qtype=qtype,
                                    seed=seed, device=device)


@dataclasses.dataclass(frozen=True)
class Lumina2Dims:
    """Lumina-Image-2.0 NextDiT dims (models/lumina2.py fields)."""
    dim: int = 120
    n_heads: int = 2
    n_layers: int = 2
    n_refiner: int = 1
    n_context_refiner: int = 1
    ffn: int = 240
    in_ch: int = 4
    cap_dim: int = 64

    def config(self):
        from .lumina2 import Lumina2Config
        hd = self.dim // self.n_heads
        third = 2 * (hd // 6)
        return Lumina2Config(dim=self.dim, n_layers=self.n_layers,
                             n_refiner=self.n_refiner,
                             n_heads=self.n_heads, in_channels=self.in_ch,
                             cap_dim=self.cap_dim,
                             axes_dim=(hd - 2 * third, third, third))


# Lumina-Image-2.0 (2.6B NextDiT): dim 2304, 24 heads (hd 96), 26
# layers + 2 noise-refiner + 2 context-refiner blocks, SwiGLU ffn 6144
# (int(8·dim/3) rounded to 256), Gemma-2-2b caption states (2304),
# 16-ch latents.
LUMINA2_DIMS = Lumina2Dims(dim=2304, n_heads=24, n_layers=26, n_refiner=2,
                           n_context_refiner=2, ffn=6144, in_ch=16,
                           cap_dim=2304)


def _lumina2_block_spec(d: Lumina2Dims, adaln: bool) -> dict:
    D, F = d.dim, d.ffn
    hd = d.dim // d.n_heads
    s = {
        "attention.qkv.weight": (3 * D, D),
        "attention.out.weight": (D, D),
        "attention.q_norm.weight": (hd,),
        "attention.k_norm.weight": (hd,),
        "attention_norm1.weight": (D,),
        "attention_norm2.weight": (D,),
        "ffn_norm1.weight": (D,),
        "ffn_norm2.weight": (D,),
        "feed_forward.w1.weight": (F, D),
        "feed_forward.w2.weight": (D, F),
        "feed_forward.w3.weight": (F, D),
    }
    if adaln:
        s["adaLN_modulation.1.weight"] = (4 * D, D)
        s["adaLN_modulation.1.bias"] = (4 * D,)
    return s


def lumina2_shape_spec(d: Lumina2Dims):
    """(nonblock, groups) spec mirroring tests/test_lumina2.py's tiny
    state dict / models/lumina2.py key expectations. The noise/context
    refiners stay flat (unrolled in the prelude) — they are also in the
    reference quantizer's exclusion list (archs.py lumina2
    keys_noquant), so dense leaves match reference behavior."""
    D, C = d.dim, d.in_ch
    nonblock = {
        "x_embedder.weight": (D, C * 4),
        "x_embedder.bias": (D,),
        "cap_embedder.0.weight": (d.cap_dim,),
        "cap_embedder.1.weight": (D, d.cap_dim),
        "cap_embedder.1.bias": (D,),
        "t_embedder.mlp.0.weight": (D, 256),
        "t_embedder.mlp.0.bias": (D,),
        "t_embedder.mlp.2.weight": (D, D),
        "t_embedder.mlp.2.bias": (D,),
        "norm_final.weight": (D,),
        "final_layer.linear.weight": (C * 4, D),
        "final_layer.linear.bias": (C * 4,),
        "final_layer.adaLN_modulation.1.weight": (2 * D, D),
        "final_layer.adaLN_modulation.1.bias": (2 * D,),
    }
    for i in range(d.n_refiner):
        for suf, s in _lumina2_block_spec(d, adaln=True).items():
            nonblock[f"noise_refiner.{i}.{suf}"] = s
    for i in range(d.n_context_refiner):
        for suf, s in _lumina2_block_spec(d, adaln=False).items():
            nonblock[f"context_refiner.{i}.{suf}"] = s
    return nonblock, {"layers": (d.n_layers,
                                 _lumina2_block_spec(d, adaln=True))}


def lumina2_random_stacked_params(d: Lumina2Dims, qtype=Q.Q4_K,
                                  seed: int = 0, device=None) -> dict:
    nonblock, groups = lumina2_shape_spec(d)
    return random_stacked_from_spec(nonblock, groups, qtype=qtype,
                                    seed=seed, device=device)


@dataclasses.dataclass(frozen=True)
class AuraDims:
    """AuraFlow dims (models/aura.py AuraConfig fields)."""
    hidden: int = 256
    depth_double: int = 2
    depth_single: int = 2
    mlp: int = 512
    in_ch: int = 4
    cond_dim: int = 64
    n_register_tokens: int = 3
    max_tokens: int = 64  # positional_encoding length

    def config(self):
        from .aura import AuraConfig
        return AuraConfig(hidden=self.hidden,
                          n_heads=self.hidden // 256,
                          depth_double=self.depth_double,
                          depth_single=self.depth_single,
                          in_channels=self.in_ch, cond_dim=self.cond_dim,
                          n_register_tokens=self.n_register_tokens)


# AuraFlow v0.3 (6.8B): hidden 3072, 12 heads (hd 256), 4 double + 32
# single layers, gated mlp 8192 (find_multiple(2·4·dim/3, 256)),
# pile-t5-xl cond states (2048), 4-ch latents, 8 register tokens,
# learned positional table for up to 9216 tokens (1536² images).
AURA_V03_DIMS = AuraDims(hidden=3072, depth_double=4, depth_single=32,
                         mlp=8192, in_ch=4, cond_dim=2048,
                         n_register_tokens=8, max_tokens=9216)


def aura_shape_spec(d: AuraDims):
    """(nonblock, groups) spec mirroring tests/test_aura.py's tiny state
    dict / models/aura.py key expectations."""
    H, M, C = d.hidden, d.mlp, d.in_ch
    nonblock = {
        "init_x_linear.weight": (H, C * 4),
        "init_x_linear.bias": (H,),
        "positional_encoding": (1, d.max_tokens, H),
        "register_tokens": (1, d.n_register_tokens, H),
        "cond_seq_linear.weight": (H, d.cond_dim),
        "t_embedder.mlp.0.weight": (H, 256),
        "t_embedder.mlp.0.bias": (H,),
        "t_embedder.mlp.2.weight": (H, H),
        "t_embedder.mlp.2.bias": (H,),
        "modF.1.weight": (2 * H, H),
        "modF.1.bias": (2 * H,),
        "final_linear.weight": (C * 4, H),
    }

    def mlp(prefix):
        return {f"{prefix}.c_fc1.weight": (M, H),
                f"{prefix}.c_fc2.weight": (M, H),
                f"{prefix}.c_proj.weight": (H, M)}

    double = {"modC.1.weight": (6 * H, H), "modX.1.weight": (6 * H, H)}
    for w in ("w1q", "w1k", "w1v", "w1o", "w2q", "w2k", "w2v", "w2o"):
        double[f"attn.{w}.weight"] = (H, H)
    double.update(mlp("mlpC"))
    double.update(mlp("mlpX"))
    single = {"modCX.1.weight": (6 * H, H)}
    for w in ("w1q", "w1k", "w1v", "w1o"):
        single[f"attn.{w}.weight"] = (H, H)
    single.update(mlp("mlp"))
    return nonblock, {"double_layers": (d.depth_double, double),
                      "single_layers": (d.depth_single, single)}


def aura_random_stacked_params(d: AuraDims, qtype=Q.Q4_K, seed: int = 0,
                               device=None) -> dict:
    nonblock, groups = aura_shape_spec(d)
    return random_stacked_from_spec(nonblock, groups, qtype=qtype,
                                    seed=seed, device=device)


@dataclasses.dataclass(frozen=True)
class LTXVDims:
    """LTX-Video DiT dims (models/ltxv.py LTXVConfig fields)."""
    dim: int = 128
    n_layers: int = 2
    in_ch: int = 32
    caption_dim: int = 64

    def config(self):
        from .ltxv import LTXVConfig
        return LTXVConfig(dim=self.dim, n_layers=self.n_layers,
                          n_heads=self.dim // 64, in_channels=self.in_ch,
                          caption_dim=self.caption_dim)


# LTX-Video 2B: dim 2048, 32 heads (hd 64), 28 blocks, ffn 8192,
# 128-ch latent voxels (32× spatial / 8× temporal VAE, no patching),
# T5-xxl caption states (4096).
LTXV_2B_DIMS = LTXVDims(dim=2048, n_layers=28, in_ch=128, caption_dim=4096)


def ltxv_shape_spec(d: LTXVDims):
    """(nonblock, groups) spec mirroring tests/test_ltxv.py's tiny state
    dict / models/ltxv.py key expectations."""
    D, I, P = d.dim, d.in_ch, d.caption_dim
    hd = 64
    nonblock = {
        "patchify_proj.weight": (D, I),
        "patchify_proj.bias": (D,),
        "adaln_single.emb.timestep_embedder.linear_1.weight": (D, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": (D,),
        "adaln_single.emb.timestep_embedder.linear_2.weight": (D, D),
        "adaln_single.emb.timestep_embedder.linear_2.bias": (D,),
        "adaln_single.linear.weight": (6 * D, D),
        "adaln_single.linear.bias": (6 * D,),
        "caption_projection.linear_1.weight": (D, P),
        "caption_projection.linear_1.bias": (D,),
        "caption_projection.linear_2.weight": (D, D),
        "caption_projection.linear_2.bias": (D,),
        "scale_shift_table": (2, D),
        "proj_out.weight": (I, D),
        "proj_out.bias": (I,),
    }
    block = {"scale_shift_table": (6, D)}
    for a in ("attn1", "attn2"):
        for n in ("to_q", "to_k", "to_v"):
            block[f"{a}.{n}.weight"] = (D, D)
            block[f"{a}.{n}.bias"] = (D,)
        block[f"{a}.to_out.0.weight"] = (D, D)
        block[f"{a}.to_out.0.bias"] = (D,)
        block[f"{a}.q_norm.weight"] = (hd,)
        block[f"{a}.k_norm.weight"] = (hd,)
    block["ff.net.0.proj.weight"] = (4 * D, D)
    block["ff.net.0.proj.bias"] = (4 * D,)
    block["ff.net.2.weight"] = (D, 4 * D)
    block["ff.net.2.bias"] = (D,)
    return nonblock, {"transformer_blocks": (d.n_layers, block)}


def ltxv_random_stacked_params(d: LTXVDims, qtype=Q.Q4_K, seed: int = 0,
                               device=None) -> dict:
    nonblock, groups = ltxv_shape_spec(d)
    return random_stacked_from_spec(nonblock, groups, qtype=qtype,
                                    seed=seed, device=device)


@dataclasses.dataclass(frozen=True)
class CosmosDims:
    """Cosmos diffusion DiT dims (models/cosmos.py CosmosConfig fields)."""
    dim: int = 128
    n_heads: int = 2
    n_layers: int = 2
    in_ch: int = 16
    text_dim: int = 64

    def config(self):
        from .cosmos import CosmosConfig
        return CosmosConfig(dim=self.dim, n_layers=self.n_layers,
                            n_heads=self.n_heads, in_channels=self.in_ch,
                            text_dim=self.text_dim)


# Cosmos-1.0-Diffusion-7B: dim 4096, 32 heads (hd 128), 28 blocks,
# mlp 16384, T5 text states (1024), 16-ch latents, (1,2,2) patch.
COSMOS_7B_DIMS = CosmosDims(dim=4096, n_heads=32, n_layers=28, in_ch=16,
                            text_dim=1024)


def cosmos_shape_spec(d: CosmosDims):
    """(nonblock, groups) spec mirroring tests/test_cosmos_qwen.py's tiny
    state dict / models/cosmos.py key expectations."""
    D, T, C = d.dim, d.text_dim, d.in_ch
    hd = D // d.n_heads
    nonblock = {
        "x_embedder.proj.1.weight": (D, C * 4),
        "x_embedder.proj.1.bias": (D,),
        "t_embedder.1.linear_1.weight": (D, 256),
        "t_embedder.1.linear_1.bias": (D,),
        "t_embedder.1.linear_2.weight": (D, D),
        "t_embedder.1.linear_2.bias": (D,),
        "t_embedding_norm.weight": (D,),
        "final_layer.linear.weight": (C * 4, D),
        "final_layer.linear.bias": (C * 4,),
        "final_layer.adaln_modulation.1.weight": (2 * D, D),
        "final_layer.adaln_modulation.1.bias": (2 * D,),
    }
    block = {}
    for m in ("self_attn", "cross_attn", "mlp"):
        block[f"adaln_modulation_{m}.1.weight"] = (3 * D, D)
        block[f"adaln_modulation_{m}.1.bias"] = (3 * D,)
    for a, kdim in (("self_attn", D), ("cross_attn", T)):
        block[f"{a}.q_proj.weight"] = (D, D)
        block[f"{a}.k_proj.weight"] = (D, kdim)
        block[f"{a}.v_proj.weight"] = (D, kdim)
        block[f"{a}.output_proj.weight"] = (D, D)
        block[f"{a}.q_norm.weight"] = (hd,)
        block[f"{a}.k_norm.weight"] = (hd,)
    block["mlp.layer1.weight"] = (4 * D, D)
    block["mlp.layer2.weight"] = (D, 4 * D)
    return nonblock, {"blocks": (d.n_layers, block)}


def cosmos_random_stacked_params(d: CosmosDims, qtype=Q.Q4_K, seed: int = 0,
                                 device=None) -> dict:
    nonblock, groups = cosmos_shape_spec(d)
    return random_stacked_from_spec(nonblock, groups, qtype=qtype,
                                    seed=seed, device=device)


# ---------------------------------------------------------------------------
# SDXL / SD1 sgm UNet (models/unet.py key schema) — conv2d + hd-64
# attention full-depth bench geometry (BASELINE config 4's conv sibling)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SDXLDims:
    """sgm UNet geometry (models/unet.py). Real SDXL: mc 320,
    channel_mult (1,2,4), 2 res blocks, transformer depth (0, 2, 10),
    ctx 2048, adm 2816 — ~2.6B params."""

    model_channels: int = 32
    channel_mult: tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    depths: tuple[int, ...] = (0, 1, 1)  # transformer depth per level
    ctx: int = 64
    adm: int | None = 64  # None = SD1 (no label_emb, fixed 8 heads)
    in_ch: int = 4


SDXL_DIMS = SDXLDims(model_channels=320, depths=(0, 2, 10), ctx=2048,
                     adm=2816)
# SD1.x: 860M, attention (depth 1) at every level but the last, CLIP-L
# ctx 768, no pooled vector
SD1_DIMS = SDXLDims(model_channels=320, channel_mult=(1, 2, 4, 4),
                    depths=(1, 1, 1, 0), ctx=768, adm=None)


def sdxl_random_params(d: SDXLDims = SDXL_DIMS, qtype=Q.Q4_K,
                       seed: int = 0) -> dict:
    """Random SDXL-dims UNet params: 2-D weights packed planar (the
    quantizer's 2-D-only rule, reference lcpp.patch:427-429), convs and
    norms dense (bf16/f32) — exactly the mix a real quantized SDXL GGUF
    loads into."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    mc, emb = d.model_channels, 4 * d.model_channels
    sd: dict = {}

    def conv(name, o, i, k=3):
        sd[f"{name}.weight"] = jnp.asarray(
            (rng.standard_normal((o, i, k, k)) * 0.02).astype(np.float32),
            jnp.bfloat16)
        sd[f"{name}.bias"] = jnp.zeros(o, jnp.float32)

    def lin(name, o, i, bias=True):
        sd[f"{name}.weight"] = random_planar(qtype, (o, i), rng)
        if bias:
            sd[f"{name}.bias"] = jnp.zeros(o, jnp.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = jnp.ones(c, jnp.float32)
        sd[f"{name}.bias"] = jnp.zeros(c, jnp.float32)

    def resblock(p, cin, cout):
        norm(f"{p}.in_layers.0", cin)
        conv(f"{p}.in_layers.2", cout, cin)
        lin(f"{p}.emb_layers.1", cout, emb)
        norm(f"{p}.out_layers.0", cout)
        conv(f"{p}.out_layers.3", cout, cout)
        if cin != cout:
            conv(f"{p}.skip_connection", cout, cin, k=1)

    def transformer(p, c, depth):
        norm(f"{p}.norm", c)
        # SD1 stores proj_in/out as 1×1 convs; SDXL as linear
        # (models/unet.py branches on weight ndim)
        if d.adm is None:
            conv(f"{p}.proj_in", c, c, k=1)
        else:
            lin(f"{p}.proj_in", c, c)
        for i in range(depth):
            b = f"{p}.transformer_blocks.{i}"
            for n in ("norm1", "norm2", "norm3"):
                norm(f"{b}.{n}", c)
            lin(f"{b}.attn1.to_q", c, c, bias=False)
            lin(f"{b}.attn1.to_k", c, c, bias=False)
            lin(f"{b}.attn1.to_v", c, c, bias=False)
            lin(f"{b}.attn1.to_out.0", c, c)
            lin(f"{b}.attn2.to_q", c, c, bias=False)
            lin(f"{b}.attn2.to_k", c, d.ctx, bias=False)
            lin(f"{b}.attn2.to_v", c, d.ctx, bias=False)
            lin(f"{b}.attn2.to_out.0", c, c)
            lin(f"{b}.ff.net.0.proj", 8 * c, c)
            lin(f"{b}.ff.net.2", c, 4 * c)
        if d.adm is None:
            conv(f"{p}.proj_out", c, c, k=1)
        else:
            lin(f"{p}.proj_out", c, c)

    # embedders stay dense (noquant recipe); SD1 has no label_emb
    dense = [("time_embed.0", emb, mc), ("time_embed.2", emb, emb)]
    if d.adm is not None:
        dense += [("label_emb.0.0", emb, d.adm),
                  ("label_emb.0.2", emb, emb)]
    for name, o, i in dense:
        sd[f"{name}.weight"] = jnp.asarray(
            (rng.standard_normal((o, i)) * 0.02).astype(np.float32),
            jnp.bfloat16)
        sd[f"{name}.bias"] = jnp.zeros(o, jnp.float32)

    chans = [mc * m for m in d.channel_mult]
    # input blocks
    conv("input_blocks.0.0", mc, d.in_ch)
    skips = [mc]
    ch = mc
    bi = 1
    for lvl, c in enumerate(chans):
        for _ in range(d.num_res_blocks):
            resblock(f"input_blocks.{bi}.0", ch, c)
            ch = c
            if d.depths[lvl]:
                transformer(f"input_blocks.{bi}.1", c, d.depths[lvl])
            skips.append(ch)
            bi += 1
        if lvl < len(chans) - 1:
            conv(f"input_blocks.{bi}.0.op", ch, ch)
            skips.append(ch)
            bi += 1

    # middle
    resblock("middle_block.0", ch, ch)
    transformer("middle_block.1", ch, d.depths[-1] or 1)
    resblock("middle_block.2", ch, ch)

    # output blocks
    bo = 0
    for lvl in reversed(range(len(chans))):
        c = chans[lvl]
        for j in range(d.num_res_blocks + 1):
            resblock(f"output_blocks.{bo}.0", ch + skips.pop(), c)
            ch = c
            k = 1
            if d.depths[lvl]:
                transformer(f"output_blocks.{bo}.{k}", c, d.depths[lvl])
                k += 1
            if lvl > 0 and j == d.num_res_blocks:
                conv(f"output_blocks.{bo}.{k}.conv", c, c)
            bo += 1

    norm("out.0", mc)
    conv("out.2", d.in_ch, mc)
    return sd
