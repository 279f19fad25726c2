"""HunyuanVideo causal 3-D VAE (decoder + encoder), TPU-native NDHWC.

Host-owned in the reference stack (SURVEY.md §1); convention follows the
public diffusers ``AutoencoderKLHunyuanVideo`` module layout (the naming
HyVid checkpoints ship with):

* ``*.conv.weight`` — every conv is a CausalConv3d wrapper: temporal pad
  front-only (k_t−1), spatial symmetric.
* ResNet blocks ``resnets.{i}.{norm1,conv1,norm2,conv2}`` with GroupNorm
  (32 groups, stats over T×H×W per group) + SiLU, ``conv_shortcut`` when
  channels change.
* Mid block ``mid_block.resnets.{0,1}`` around per-frame single-head
  spatial attention ``mid_block.attentions.0`` (group_norm + to_q/k/v +
  to_out.0 linears).
* ``up_blocks.{i}.upsamplers.0.conv`` — nearest-neighbour ×2 upsample
  (spatial always; temporal too when the stage is inside the 4× temporal
  compression range, detected from latent/t shape at call time: frame 0
  stays un-doubled, T → 2T−1) then causal conv.
* ``decoder.conv_norm_out`` + SiLU + ``decoder.conv_out``.

Like models/unet.py and models/wan_vae.py the structure is introspected
from the keys — block counts and widths come from the weights.

Frame bookkeeping: latent T ↔ pixel 1+4(T−1) (4× temporal compression,
first latent frame = one pixel frame), spatial 8×.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.attention import dot_product_attention
from ..nn.layers import QuantConfig, DEFAULT_CONFIG, group_norm, linear

F32 = jnp.float32


def _silu(x):
    return jax.nn.silu(x.astype(F32)).astype(x.dtype)


def _gn3d(x, w, b, groups: int = 32):
    """GroupNorm over (T, H, W) per channel group on NDHWC."""
    B, T, H, W, C = x.shape
    y = group_norm(x.reshape(B, T * H, W, C), w, b, num_groups=groups)
    return y.reshape(B, T, H, W, C)


def _cconv(params, p, x, *, stride=(1, 1, 1), cfg=DEFAULT_CONFIG):
    """CausalConv3d at key prefix ``p`` (diffusers wraps as ``p.conv``)."""
    from ..nn.layers import materialize

    key = f"{p}.conv.weight" if f"{p}.conv.weight" in params else f"{p}.weight"
    bkey = key[:-len("weight")] + "bias"
    wv = materialize(params[key], cfg.compute_dtype)
    kt, kh, kw = wv.shape[2], wv.shape[3], wv.shape[4]
    pad = ((kt - 1, 0), ((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2)
    out = jax.lax.conv_general_dilated(
        x.astype(cfg.compute_dtype), wv,
        window_strides=stride, padding=pad,
        dimension_numbers=("NDHWC", "OIDHW", "NDHWC"),
        preferred_element_type=F32,
    ).astype(x.dtype)
    if bkey in params:
        out = out + params[bkey].astype(out.dtype)
    return out


def _resnet(params, p, x, qcfg):
    h = _gn3d(x, params[f"{p}.norm1.weight"], params[f"{p}.norm1.bias"])
    h = _cconv(params, f"{p}.conv1", _silu(h), cfg=qcfg)
    h = _gn3d(h, params[f"{p}.norm2.weight"], params[f"{p}.norm2.bias"])
    h = _cconv(params, f"{p}.conv2", _silu(h), cfg=qcfg)
    if f"{p}.conv_shortcut.conv.weight" in params or \
            f"{p}.conv_shortcut.weight" in params:
        x = _cconv(params, f"{p}.conv_shortcut", x, cfg=qcfg)
    return x + h


def _mid_attn(params, p, x, qcfg):
    """Per-frame single-head spatial attention (diffusers Attention)."""
    B, T, H, W, C = x.shape
    h = _gn3d(x, params[f"{p}.group_norm.weight"],
              params[f"{p}.group_norm.bias"])
    h2 = h.reshape(B * T, H * W, C)
    q = linear(h2, params[f"{p}.to_q.weight"],
               params.get(f"{p}.to_q.bias"), cfg=qcfg)
    k = linear(h2, params[f"{p}.to_k.weight"],
               params.get(f"{p}.to_k.bias"), cfg=qcfg)
    v = linear(h2, params[f"{p}.to_v.weight"],
               params.get(f"{p}.to_v.bias"), cfg=qcfg)
    # heads-major (B·T, 1, H·W, C): one head over all spatial positions
    # ([:, :, None] would make H·W length-1 heads = identity attention)
    o = dot_product_attention(q[:, None], k[:, None], v[:, None]
                              ).reshape(B * T, H * W, C)
    o = linear(o, params[f"{p}.to_out.0.weight"],
               params.get(f"{p}.to_out.0.bias"), cfg=qcfg)
    return x + o.reshape(B, T, H, W, C)


def _upsample(params, p, x, temporal: bool, qcfg):
    """Nearest ×2 (spatial, + causal temporal when ``temporal``), conv."""
    B, T, H, W, C = x.shape
    if temporal and T > 1:
        # first frame stays single (causal): T → 2T−1
        rest = jnp.repeat(x[:, 1:], 2, axis=1)
        x = jnp.concatenate([x[:, :1], rest], axis=1)
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return _cconv(params, f"{p}.conv", x, cfg=qcfg)


def _walk_blocks(params, prefix, slot):
    i = 0
    while any(k.startswith(f"{prefix}.{slot}.{i}.") for k in params):
        yield f"{prefix}.{slot}.{i}"
        i += 1


@dataclasses.dataclass(frozen=True)
class HyVidVAEConfig:
    z_channels: int
    temporal_ups: int = 2  # 4x temporal compression

    @staticmethod
    def from_state_dict(sd) -> "HyVidVAEConfig":
        k = ("decoder.conv_in.conv.weight"
             if "decoder.conv_in.conv.weight" in sd
             else "decoder.conv_in.weight")
        return HyVidVAEConfig(z_channels=int(sd[k].shape[1]))


def decode(params, cfg: HyVidVAEConfig, z: jax.Array,
           qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """z: (B, T, H/8, W/8, z) → video (B, 1+4(T−1), H, W, 3)."""
    if "post_quant_conv.conv.weight" in params or \
            "post_quant_conv.weight" in params:
        z = _cconv(params, "post_quant_conv", z, cfg=qcfg)
    x = _cconv(params, "decoder.conv_in", z, cfg=qcfg)

    for rp in _walk_blocks(params, "decoder.mid_block", "resnets"):
        x = _resnet(params, rp, x, qcfg)
        if rp.endswith(".0") and any(
                k.startswith("decoder.mid_block.attentions.0.")
                for k in params):
            x = _mid_attn(params, "decoder.mid_block.attentions.0", x, qcfg)

    for bi, bp in enumerate(_walk_blocks(params, "decoder", "up_blocks")):
        for rp in _walk_blocks(params, bp, "resnets"):
            x = _resnet(params, rp, x, qcfg)
        if any(k.startswith(f"{bp}.upsamplers.0.") for k in params):
            # temporal doubling rides the DEEPEST temporal_ups upsampler
            # stages (decoder mirrors the encoder, whose last two
            # downsamplers carry the 4x temporal compression); T → 2T−1
            # per stage keeps the causal first frame single, so
            # 1+k → 1+2k → 1+4k with no warm-up trim
            temporal = bi < cfg.temporal_ups
            x = _upsample(params, f"{bp}.upsamplers.0", x, temporal, qcfg)

    x = _gn3d(x, params["decoder.conv_norm_out.weight"],
              params["decoder.conv_norm_out.bias"])
    return _cconv(params, "decoder.conv_out", _silu(x), cfg=qcfg)


def encode(params, cfg: HyVidVAEConfig, x: jax.Array,
           qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """video (B, 1+4k, H, W, 3) → latent mean (B, 1+k, H/8, W/8, z)."""
    h = _cconv(params, "encoder.conv_in", x, cfg=qcfg)
    n_down = sum(1 for _ in _walk_blocks(params, "encoder", "down_blocks"))
    for bi, bp in enumerate(_walk_blocks(params, "encoder", "down_blocks")):
        for rp in _walk_blocks(params, bp, "resnets"):
            h = _resnet(params, rp, h, qcfg)
        if any(k.startswith(f"{bp}.downsamplers.0.") for k in params):
            temporal = bi >= n_down - 1 - cfg.temporal_ups
            stride = (2, 2, 2) if temporal else (1, 2, 2)
            # causal stride-2: pad front so 1+2k frames → 1+k
            h = _cconv(params, f"{bp}.downsamplers.0.conv", h,
                       stride=stride, cfg=qcfg)
    for rp in _walk_blocks(params, "encoder.mid_block", "resnets"):
        h = _resnet(params, rp, h, qcfg)
        if rp.endswith(".0") and any(
                k.startswith("encoder.mid_block.attentions.0.")
                for k in params):
            h = _mid_attn(params, "encoder.mid_block.attentions.0", h, qcfg)
    h = _gn3d(h, params["encoder.conv_norm_out.weight"],
              params["encoder.conv_norm_out.bias"])
    h = _cconv(params, "encoder.conv_out", _silu(h), cfg=qcfg)
    if "quant_conv.conv.weight" in params or "quant_conv.weight" in params:
        h = _cconv(params, "quant_conv", h, cfg=qcfg)
    return h[..., : h.shape[-1] // 2]


def decode_tiled(params, cfg: HyVidVAEConfig, z: jax.Array, tile: int = 32,
                 overlap: int = 8,
                 qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """Spatially-tiled ``decode`` — see vae.tiled_apply_video."""
    from .vae import tiled_apply_video

    return tiled_apply_video(
        lambda zt: decode(params, cfg, zt, qcfg=qcfg), z, tile, overlap)


def decode_auto(params, cfg: HyVidVAEConfig, z: jax.Array,
                qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """``decode`` with the GGUF_TPU_VAE_TILE opt-in spatial tiling."""
    from .vae import _tile_env

    t = _tile_env()
    if t and (z.shape[2] > t or z.shape[3] > t):
        return decode_tiled(params, cfg, z, tile=t,
                            overlap=max(t // 4, 1), qcfg=qcfg)
    return decode(params, cfg, z, qcfg=qcfg)
