"""SD1 / SDXL UNet (sgm ``input_blocks/middle_block/output_blocks`` format).

Host-owned in the reference (ComfyUI builds the UNet; the plugin supplies
lazy-dequant layers and the converter handles the sgm key format — the
fingerprints at reference tools/convert.py:120-143 and the SD1/SDXL
quantizer exclusions at tools/lcpp.patch:344-356 name these exact keys).

The graph is **introspected from the state dict**: each numbered block is
classified by its sub-keys (``.0.op`` downsample conv, ``.0.in_layers``
ResBlock, ``.N.norm``+``.N.proj_in`` SpatialTransformer with depth counted
from its transformer_blocks, trailing upsample conv), so SD1, SD2 and SDXL
layouts all load from the same code without per-arch tables.

NHWC activations throughout; attention is heads-major over H·W tokens with
cross-attention against the CLIP context.
"""

from __future__ import annotations

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import (
    QuantConfig,
    DEFAULT_CONFIG,
    conv2d,
    group_norm,
    layer_norm,
    linear,
)
from .flux import timestep_embedding


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    model_channels: int
    context_dim: int
    adm_in_channels: int | None  # SDXL pooled+size embeds (2816); None = SD1
    head_dim: int | None  # SDXL: 64; SD1 uses fixed num_heads
    num_heads: int | None  # SD1: 8

    @staticmethod
    def from_state_dict(sd) -> "UNetConfig":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        mc = shape("input_blocks.0.0.weight")[0]
        ctx = None
        for k in sd:
            if k.endswith(".attn2.to_k.weight"):
                ctx = shape(k)[1]
                break
        adm = shape("label_emb.0.0.weight")[1] if "label_emb.0.0.weight" in sd \
            else None
        if adm is not None:
            return UNetConfig(mc, ctx or 2048, adm, head_dim=64,
                              num_heads=None)
        return UNetConfig(mc, ctx or 768, None, head_dim=None, num_heads=8)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def _resblock(params, p, x, emb, qcfg):
    h = group_norm(x, params[f"{p}.in_layers.0.weight"],
                   params[f"{p}.in_layers.0.bias"], eps=1e-5)
    h = conv2d(_silu(h), params[f"{p}.in_layers.2.weight"],
               params[f"{p}.in_layers.2.bias"], padding=1, cfg=qcfg)
    eo = linear(_silu(emb), params[f"{p}.emb_layers.1.weight"],
                params[f"{p}.emb_layers.1.bias"], cfg=qcfg)
    h = h + eo[:, None, None, :].astype(h.dtype)
    h = group_norm(h, params[f"{p}.out_layers.0.weight"],
                   params[f"{p}.out_layers.0.bias"], eps=1e-5)
    h = conv2d(_silu(h), params[f"{p}.out_layers.3.weight"],
               params[f"{p}.out_layers.3.bias"], padding=1, cfg=qcfg)
    if f"{p}.skip_connection.weight" in params:
        x = conv2d(x, params[f"{p}.skip_connection.weight"],
                   params[f"{p}.skip_connection.bias"], cfg=qcfg)
    return x + h


def _mh_attn(q, k, v, n_heads):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // n_heads
    kd = k.shape[2] // n_heads
    from ..nn.attention import dot_product_attention

    q = q.reshape(B, Lq, n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Lk, n_heads, kd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Lk, n_heads, kd).transpose(0, 2, 1, 3)
    out = dot_product_attention(q, k, v)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, D)


def _basic_block(params, p, x, context, n_heads, qcfg):
    # self-attention
    h = layer_norm(x, params[f"{p}.norm1.weight"], params[f"{p}.norm1.bias"])
    q = linear(h, params[f"{p}.attn1.to_q.weight"], cfg=qcfg)
    k = linear(h, params[f"{p}.attn1.to_k.weight"], cfg=qcfg)
    v = linear(h, params[f"{p}.attn1.to_v.weight"], cfg=qcfg)
    a = _mh_attn(q, k, v, n_heads)
    x = x + linear(a, params[f"{p}.attn1.to_out.0.weight"],
                   params[f"{p}.attn1.to_out.0.bias"], cfg=qcfg)
    # cross-attention
    h = layer_norm(x, params[f"{p}.norm2.weight"], params[f"{p}.norm2.bias"])
    q = linear(h, params[f"{p}.attn2.to_q.weight"], cfg=qcfg)
    k = linear(context, params[f"{p}.attn2.to_k.weight"], cfg=qcfg)
    v = linear(context, params[f"{p}.attn2.to_v.weight"], cfg=qcfg)
    a = _mh_attn(q, k, v, n_heads)
    x = x + linear(a, params[f"{p}.attn2.to_out.0.weight"],
                   params[f"{p}.attn2.to_out.0.bias"], cfg=qcfg)
    # geglu ff
    h = layer_norm(x, params[f"{p}.norm3.weight"], params[f"{p}.norm3.bias"])
    h = linear(h, params[f"{p}.ff.net.0.proj.weight"],
               params[f"{p}.ff.net.0.proj.bias"], cfg=qcfg)
    a, gate = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(gate.astype(jnp.float32),
                        approximate=False).astype(a.dtype)
    return x + linear(h, params[f"{p}.ff.net.2.weight"],
                      params[f"{p}.ff.net.2.bias"], cfg=qcfg)


def _spatial_transformer(params, p, x, context, cfg: UNetConfig, qcfg):
    B, H, W, C = x.shape
    n_heads = cfg.num_heads or C // cfg.head_dim
    h = group_norm(x, params[f"{p}.norm.weight"], params[f"{p}.norm.bias"],
                   eps=1e-6)
    w_in = params[f"{p}.proj_in.weight"]
    if len(w_in.shape) == 2:  # SDXL stores proj_in/out as linear
        h = h.reshape(B, H * W, C)
        h = linear(h, w_in, params[f"{p}.proj_in.bias"], cfg=qcfg)
    else:
        h = conv2d(h, w_in, params[f"{p}.proj_in.bias"], cfg=qcfg)
        h = h.reshape(B, H * W, C)
    i = 0
    while f"{p}.transformer_blocks.{i}.norm1.weight" in params:
        h = _basic_block(params, f"{p}.transformer_blocks.{i}", h, context,
                         n_heads, qcfg)
        i += 1
    w_out = params[f"{p}.proj_out.weight"]
    if len(w_out.shape) == 2:
        h = linear(h, w_out, params[f"{p}.proj_out.bias"], cfg=qcfg)
        h = h.reshape(B, H, W, C)
    else:
        h = h.reshape(B, H, W, C)
        h = conv2d(h, w_out, params[f"{p}.proj_out.bias"], cfg=qcfg)
    return x + h


def _apply_numbered_block(params, prefix, x, emb, context, cfg, qcfg):
    """One input/output block entry: iterate its sub-modules by index."""
    j = 0
    while True:
        p = f"{prefix}.{j}"
        if f"{p}.op.weight" in params:  # downsample
            # LDM/SGM UNet Downsample is a SYMMETRIC padding=1 stride-2
            # conv (openaimodel Downsample) — the asymmetric (0,1) pad
            # belongs to the VAE encoder, not the UNet; using it here
            # shifted every downsample's windows off the trained grid
            x = conv2d(x, params[f"{p}.op.weight"], params[f"{p}.op.bias"],
                       stride=2, padding=1, cfg=qcfg)
        elif f"{p}.in_layers.0.weight" in params:  # resblock
            x = _resblock(params, p, x, emb, qcfg)
        elif f"{p}.norm.weight" in params and f"{p}.proj_in.weight" in params:
            x = _spatial_transformer(params, p, x, context, cfg, qcfg)
        elif f"{p}.conv.weight" in params:  # upsample
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            x = conv2d(x, params[f"{p}.conv.weight"],
                       params[f"{p}.conv.bias"], padding=1, cfg=qcfg)
        elif f"{p}.weight" in params:  # bare conv (input_blocks.0.0)
            x = conv2d(x, params[f"{p}.weight"], params.get(f"{p}.bias"),
                       padding=1, cfg=qcfg)
        else:
            break
        j += 1
    return x


def _count_blocks(params, section: str) -> int:
    n = -1
    pat = re.compile(rf"^{section}\.(\d+)\.")
    for k in params:
        m = pat.match(k)
        if m:
            n = max(n, int(m.group(1)))
    return n + 1


def forward(params, cfg: UNetConfig, x: jax.Array, timesteps: jax.Array,
            context: jax.Array, y: jax.Array | None = None,
            qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """x (B, H, W, C) NHWC latent, timesteps (B,) discrete-schedule floats,
    context (B, L, context_dim) CLIP states, y (B, adm_in) SDXL vector."""
    temb = timestep_embedding(timesteps, cfg.model_channels, time_factor=1.0)
    emb = linear(temb.astype(x.dtype), params["time_embed.0.weight"],
                 params["time_embed.0.bias"], cfg=qcfg)
    emb = linear(_silu(emb), params["time_embed.2.weight"],
                 params["time_embed.2.bias"], cfg=qcfg)
    if cfg.adm_in_channels is not None:
        if y is None:
            raise ValueError("SDXL UNet needs the pooled/size vector y")
        v = linear(y.astype(x.dtype), params["label_emb.0.0.weight"],
                   params["label_emb.0.0.bias"], cfg=qcfg)
        v = linear(_silu(v), params["label_emb.0.2.weight"],
                   params["label_emb.0.2.bias"], cfg=qcfg)
        emb = emb + v

    hs = []
    h = x
    for i in range(_count_blocks(params, "input_blocks")):
        h = _apply_numbered_block(params, f"input_blocks.{i}", h, emb,
                                  context, cfg, qcfg)
        hs.append(h)

    h = _apply_numbered_block(params, "middle_block", h, emb, context, cfg,
                              qcfg)

    for i in range(_count_blocks(params, "output_blocks")):
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        h = _apply_numbered_block(params, f"output_blocks.{i}", h, emb,
                                  context, cfg, qcfg)

    h = group_norm(h, params["out.0.weight"], params["out.0.bias"], eps=1e-5)
    return conv2d(_silu(h), params["out.2.weight"], params["out.2.bias"],
                  padding=1, cfg=qcfg)
