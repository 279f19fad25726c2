"""AutoencoderKL VAE (SD / SDXL / Flux latent codec), NHWC.

Host-owned in the reference (ComfyUI's VAE loads from safetensors; the GGUF
plugin never touches it). Implements the sgm/``first_stage_model`` key
format that Flux ``ae.safetensors`` and SD-family VAEs use:
``decoder.mid.block_1`` / ``decoder.up.{i}.block.{j}`` /
``decoder.mid.attn_1.{q,k,v,proj_out}``.

All convs run channel-minor (NHWC) so XLA tiles them onto the MXU; spatial
attention in the mid block is single-head over H·W tokens.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import QuantConfig, DEFAULT_CONFIG, conv2d, group_norm


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    z_channels: int = 16  # flux/sd3: 16, sd1/sdxl: 4
    base_ch: int = 128
    ch_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    scale_factor: float = 0.3611  # flux; sd1: 0.18215, sdxl: 0.13025
    shift_factor: float = 0.1159  # flux; 0.0 for sd1/sdxl
    has_quant_conv: bool = False  # sd1/sdxl wrap latents in (post_)quant_conv

    @staticmethod
    def from_state_dict(sd) -> "VAEConfig":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        z = shape("decoder.conv_in.weight")[1]
        has_qc = "post_quant_conv.weight" in sd
        if z == 4:
            return VAEConfig(z_channels=4, scale_factor=0.18215,
                             shift_factor=0.0, has_quant_conv=has_qc)
        return VAEConfig(z_channels=int(z), has_quant_conv=has_qc)


def _resnet(params, prefix, x, qcfg):
    h = group_norm(x, params[f"{prefix}.norm1.weight"],
                   params[f"{prefix}.norm1.bias"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = conv2d(h, params[f"{prefix}.conv1.weight"],
               params[f"{prefix}.conv1.bias"], padding=1, cfg=qcfg)
    h = group_norm(h, params[f"{prefix}.norm2.weight"],
                   params[f"{prefix}.norm2.bias"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = conv2d(h, params[f"{prefix}.conv2.weight"],
               params[f"{prefix}.conv2.bias"], padding=1, cfg=qcfg)
    if f"{prefix}.nin_shortcut.weight" in params:
        x = conv2d(x, params[f"{prefix}.nin_shortcut.weight"],
                   params[f"{prefix}.nin_shortcut.bias"], cfg=qcfg)
    return x + h


def _mid_attn(params, prefix, x, qcfg):
    B, H, W, C = x.shape
    h = group_norm(x, params[f"{prefix}.norm.weight"],
                   params[f"{prefix}.norm.bias"])
    q = conv2d(h, params[f"{prefix}.q.weight"], params[f"{prefix}.q.bias"],
               cfg=qcfg).reshape(B, H * W, C)
    k = conv2d(h, params[f"{prefix}.k.weight"], params[f"{prefix}.k.bias"],
               cfg=qcfg).reshape(B, H * W, C)
    v = conv2d(h, params[f"{prefix}.v.weight"], params[f"{prefix}.v.bias"],
               cfg=qcfg).reshape(B, H * W, C)
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) * (C ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(B, H, W, C)
    out = conv2d(out, params[f"{prefix}.proj_out.weight"],
                 params[f"{prefix}.proj_out.bias"], cfg=qcfg)
    return x + out


def _upsample(params, prefix, x, qcfg):
    B, H, W, C = x.shape
    x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
    return conv2d(x, params[f"{prefix}.conv.weight"],
                  params[f"{prefix}.conv.bias"], padding=1, cfg=qcfg)


def decode(params, cfg: VAEConfig, z: jax.Array,
           qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """Latent (B, h, w, z_channels) NHWC → image (B, 8h, 8w, 3) in [-1, 1]."""
    z = z.astype(jnp.float32) / cfg.scale_factor + cfg.shift_factor
    z = z.astype(jnp.bfloat16)
    if cfg.has_quant_conv and "post_quant_conv.weight" in params:
        z = conv2d(z, params["post_quant_conv.weight"],
                   params["post_quant_conv.bias"], cfg=qcfg)

    h = conv2d(z, params["decoder.conv_in.weight"],
               params["decoder.conv_in.bias"], padding=1, cfg=qcfg)
    h = _resnet(params, "decoder.mid.block_1", h, qcfg)
    h = _mid_attn(params, "decoder.mid.attn_1", h, qcfg)
    h = _resnet(params, "decoder.mid.block_2", h, qcfg)

    n_levels = len(cfg.ch_mult)
    for i in reversed(range(n_levels)):
        for j in range(cfg.num_res_blocks + 1):
            h = _resnet(params, f"decoder.up.{i}.block.{j}", h, qcfg)
        if i > 0:
            h = _upsample(params, f"decoder.up.{i}.upsample", h, qcfg)

    h = group_norm(h, params["decoder.norm_out.weight"],
                   params["decoder.norm_out.bias"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    img = conv2d(h, params["decoder.conv_out.weight"],
                 params["decoder.conv_out.bias"], padding=1, cfg=qcfg)
    return img.astype(jnp.float32)


def _downsample(params, prefix, x, qcfg):
    # asymmetric (0,1) pad then stride-2 conv (sgm convention)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(x, params[f"{prefix}.conv.weight"],
                  params[f"{prefix}.conv.bias"], stride=2, padding=0, cfg=qcfg)


def encode(params, cfg: VAEConfig, img: jax.Array,
           qcfg: QuantConfig = DEFAULT_CONFIG,
           sample_key: jax.Array | None = None) -> jax.Array:
    """Image (B, H, W, 3) in [-1, 1] → latent (B, H/8, W/8, z).

    Deterministic (mean) unless ``sample_key`` is given.
    """
    h = conv2d(img.astype(jnp.bfloat16), params["encoder.conv_in.weight"],
               params["encoder.conv_in.bias"], padding=1, cfg=qcfg)
    n_levels = len(cfg.ch_mult)
    for i in range(n_levels):
        for j in range(cfg.num_res_blocks):
            h = _resnet(params, f"encoder.down.{i}.block.{j}", h, qcfg)
        if i < n_levels - 1:
            h = _downsample(params, f"encoder.down.{i}.downsample", h, qcfg)
    h = _resnet(params, "encoder.mid.block_1", h, qcfg)
    h = _mid_attn(params, "encoder.mid.attn_1", h, qcfg)
    h = _resnet(params, "encoder.mid.block_2", h, qcfg)
    h = group_norm(h, params["encoder.norm_out.weight"],
                   params["encoder.norm_out.bias"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    moments = conv2d(h, params["encoder.conv_out.weight"],
                     params["encoder.conv_out.bias"], padding=1, cfg=qcfg)
    if cfg.has_quant_conv and "quant_conv.weight" in params:
        moments = conv2d(moments, params["quant_conv.weight"],
                         params["quant_conv.bias"], cfg=qcfg)
    mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
    if sample_key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(sample_key, mean.shape)
    return (mean - cfg.shift_factor) * cfg.scale_factor
