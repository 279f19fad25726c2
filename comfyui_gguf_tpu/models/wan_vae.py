"""Wan 2.1 causal 3-D video VAE (encoder + decoder), TPU-native NDHWC.

Host-owned in the reference stack (ComfyUI's WanVAE; the plugin only
supplies quantized UNet/DiT weights — SURVEY.md §1). Convention follows
the original Wan-Video module layout, whose checkpoints ComfyUI loads
directly:

* ``CausalConv3d``: 3-D conv, temporal padding applied FRONT-only
  (2·pad_t, 0) so frame t never sees t+1 — the property that lets the
  model stream video chunks; spatial padding symmetric.
* ``RMS_norm`` (video form): x/‖x‖₂ over channels · √C · gamma.
* ``ResidualBlock`` = Sequential(RMS, SiLU, conv3, RMS, SiLU, Dropout,
  conv3) + 1×1×1 shortcut — key slots ``residual.{0,3}.gamma``,
  ``residual.{2,6}.weight`` and ``shortcut.weight``.
* ``Resample``: spatial nearest-×2 + conv (``resample.1.*``), channels
  halve; ``upsample3d`` adds ``time_conv`` (C→2C, k=(3,1,1)) whose output
  interleaves to double T. ``downsample2d`` = asym ZeroPad(0,1) + stride-2
  conv; ``downsample3d`` adds a stride-(2,1,1) causal time conv.
* ``AttentionBlock``: per-frame single-head spatial attention
  (``norm.gamma``, ``to_qkv``, ``proj``).

Like models/unet.py, the graph is **introspected from the keys** — block
kind and channel widths come from the weights themselves, so base_dim /
dim_mult / temporal-scale variants all load from this one file.

Frame bookkeeping: latent T maps to pixel 1+4·(T−1) (first latent frame
encodes a single pixel frame). The decoder's two temporal doublings give
4T frames; the leading 2^n−1 warm-up frames are trimmed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.attention import dot_product_attention
from ..nn.layers import QuantConfig, DEFAULT_CONFIG, conv2d

F32 = jnp.float32


def _silu(x):
    return jax.nn.silu(x.astype(F32)).astype(x.dtype)


def _rms(x, gamma):
    """Wan RMS_norm (video): L2-normalize channels, scale by √C · gamma."""
    xf = x.astype(F32)
    n = xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-12)
    g = jnp.asarray(gamma, F32).reshape(-1)
    return (n * (x.shape[-1] ** 0.5) * g).astype(x.dtype)


def _causal_conv3d(x, w, b, *, stride=(1, 1, 1), cfg=DEFAULT_CONFIG):
    """x: (B, T, H, W, C); w: torch OIDHW. Temporal pad front-only."""
    from ..nn.layers import materialize

    wv = materialize(w, cfg.compute_dtype)
    kt, kh, kw = wv.shape[2], wv.shape[3], wv.shape[4]
    # kt=3 → front pad 2 (causal); kt=1 → none
    pad = ((kt - 1, 0), ((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2)
    out = jax.lax.conv_general_dilated(
        x.astype(cfg.compute_dtype), wv,
        window_strides=stride, padding=pad,
        dimension_numbers=("NDHWC", "OIDHW", "NDHWC"),
        preferred_element_type=F32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _per_frame(fn, x):
    """Apply a 2-D op to (B, T, H, W, C) by folding T into batch."""
    B, T, H, W, C = x.shape
    y = fn(x.reshape(B * T, H, W, C))
    return y.reshape(B, T, *y.shape[1:])


def _residual_block(params, p, x, qcfg):
    h = _rms(x, params[f"{p}.residual.0.gamma"])
    h = _causal_conv3d(_silu(h), params[f"{p}.residual.2.weight"],
                       params.get(f"{p}.residual.2.bias"), cfg=qcfg)
    h = _rms(h, params[f"{p}.residual.3.gamma"])
    h = _causal_conv3d(_silu(h), params[f"{p}.residual.6.weight"],
                       params.get(f"{p}.residual.6.bias"), cfg=qcfg)
    if f"{p}.shortcut.weight" in params:
        x = _causal_conv3d(x, params[f"{p}.shortcut.weight"],
                           params.get(f"{p}.shortcut.bias"), cfg=qcfg)
    return x + h


def _attention_block(params, p, x, qcfg):
    """Single-head spatial attention per frame."""
    h = _rms(x, params[f"{p}.norm.gamma"])

    def attn2d(hf):
        N, H, W, C = hf.shape
        qkv = conv2d(hf, params[f"{p}.to_qkv.weight"],
                     params.get(f"{p}.to_qkv.bias"), cfg=qcfg)
        # heads-major (B, H=1, L=H*W, D): ONE head over all spatial
        # positions — (N, H*W, 1, C) would be H*W heads of length-1
        # sequences, i.e. an identity "attention" with no mixing
        q, k, v = jnp.split(qkv.reshape(N, 1, H * W, 3 * C), 3, axis=-1)
        o = dot_product_attention(q, k, v).reshape(N, H, W, C)
        return conv2d(o, params[f"{p}.proj.weight"],
                      params.get(f"{p}.proj.bias"), cfg=qcfg)

    return x + _per_frame(attn2d, h)


def _upsample(params, p, x, qcfg):
    """Resample upsample2d/3d: optional temporal doubling, then spatial
    nearest-×2 + conv (channels halve)."""
    tc = f"{p}.time_conv.weight"
    if tc in params:
        B, T, H, W, C = x.shape
        h = _causal_conv3d(x, params[tc], params.get(f"{p}.time_conv.bias"),
                           cfg=qcfg)  # (B, T, H, W, 2C)
        h = h.reshape(B, T, H, W, 2, C)
        x = h.transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * T, H, W, C)

    def up2d(hf):
        N, H, W, C = hf.shape
        hf = jnp.repeat(jnp.repeat(hf, 2, axis=1), 2, axis=2)
        return conv2d(hf, params[f"{p}.resample.1.weight"],
                      params.get(f"{p}.resample.1.bias"), padding=1, cfg=qcfg)

    return _per_frame(up2d, x)


def _downsample(params, p, x, qcfg):
    """Resample downsample2d/3d: asym-pad stride-2 spatial conv, optional
    stride-2 causal time conv."""
    def down2d(hf):
        hf = jnp.pad(hf, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return conv2d(hf, params[f"{p}.resample.1.weight"],
                      params.get(f"{p}.resample.1.bias"), stride=2, cfg=qcfg)

    x = _per_frame(down2d, x)
    tc = f"{p}.time_conv.weight"
    if tc in params:
        x = _causal_conv3d(x, params[tc], params.get(f"{p}.time_conv.bias"),
                           stride=(2, 1, 1), cfg=qcfg)
    return x


def _block_kind(params, p):
    if f"{p}.residual.0.gamma" in params:
        return "res"
    if f"{p}.norm.gamma" in params:
        return "attn"
    if f"{p}.resample.1.weight" in params or f"{p}.time_conv.weight" in params:
        return "resample"
    return None


def _walk(params, prefix):
    """Yield (kind, path) for sequential block indices under prefix."""
    i = 0
    while True:
        p = f"{prefix}.{i}"
        kind = _block_kind(params, p)
        if kind is None:
            return
        yield kind, p
        i += 1


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    z_channels: int
    scale_factor: float = 1.0  # per-channel mean/std handled by caller

    @staticmethod
    def from_state_dict(sd) -> "WanVAEConfig":
        z = sd["decoder.conv1.weight"].shape[1]
        return WanVAEConfig(z_channels=int(z))


def decode(params, cfg: WanVAEConfig, z: jax.Array,
           qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """z: (B, T, H/8, W/8, z) → video (B, 1+4(T−1), H, W, 3) in [-1, 1]."""
    if "conv2.weight" in params:  # post-quant 1×1×1
        z = _causal_conv3d(z, params["conv2.weight"],
                           params.get("conv2.bias"), cfg=qcfg)
    x = _causal_conv3d(z, params["decoder.conv1.weight"],
                       params.get("decoder.conv1.bias"), cfg=qcfg)
    for kind, p in _walk(params, "decoder.middle"):
        x = (_residual_block(params, p, x, qcfg) if kind == "res"
             else _attention_block(params, p, x, qcfg))
    n_time_up = 0
    for kind, p in _walk(params, "decoder.upsamples"):
        if kind == "res":
            x = _residual_block(params, p, x, qcfg)
        else:
            if f"{p}.time_conv.weight" in params:
                n_time_up += 1
            x = _upsample(params, p, x, qcfg)
    x = _rms(x, params["decoder.head.0.gamma"])
    x = _causal_conv3d(_silu(x), params["decoder.head.2.weight"],
                       params.get("decoder.head.2.bias"), cfg=qcfg)
    trim = (1 << n_time_up) - 1  # causal warm-up frames
    return x[:, trim:] if trim else x


def encode(params, cfg: WanVAEConfig, x: jax.Array,
           qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """video (B, 1+4k, H, W, 3) → latent mean (B, 1+k, H/8, W/8, z)."""
    n_time_down = sum(
        1 for kind, p in _walk(params, "encoder.downsamples")
        if kind == "resample" and f"{p}.time_conv.weight" in params)
    # causal warm-up: repeat the first frame so T' lands on 1+k
    lead = (1 << n_time_down) - 1
    if lead:
        x = jnp.concatenate([jnp.repeat(x[:, :1], lead, axis=1), x], axis=1)
    h = _causal_conv3d(x, params["encoder.conv1.weight"],
                       params.get("encoder.conv1.bias"), cfg=qcfg)
    for kind, p in _walk(params, "encoder.downsamples"):
        h = (_residual_block(params, p, h, qcfg) if kind == "res"
             else _downsample(params, p, h, qcfg))
    for kind, p in _walk(params, "encoder.middle"):
        h = (_residual_block(params, p, h, qcfg) if kind == "res"
             else _attention_block(params, p, h, qcfg))
    h = _rms(h, params["encoder.head.0.gamma"])
    h = _causal_conv3d(_silu(h), params["encoder.head.2.weight"],
                       params.get("encoder.head.2.bias"), cfg=qcfg)
    if "conv1.weight" in params:  # quant conv on (mean, logvar)
        h = _causal_conv3d(h, params["conv1.weight"],
                           params.get("conv1.bias"), cfg=qcfg)
    return h[..., : h.shape[-1] // 2]  # mean half


def decode_tiled(params, cfg: WanVAEConfig, z: jax.Array, tile: int = 32,
                 overlap: int = 8,
                 qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """Spatially-tiled ``decode`` (256² pixel tiles at the default):
    peak activation memory bounded by one tile × full T. Temporal law
    stays exact (causal convs see the whole clip); per-tile GroupNorm is
    the standard tiled-VAE approximation."""
    from .vae import tiled_apply_video

    return tiled_apply_video(
        lambda zt: decode(params, cfg, zt, qcfg=qcfg), z, tile, overlap)


def decode_auto(params, cfg: WanVAEConfig, z: jax.Array,
                qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """``decode``, spatially tiled when ``GGUF_TPU_VAE_TILE`` (latent
    tile side) is set and exceeded — same opt-in as the image VAE."""
    from .vae import _tile_env

    t = _tile_env()
    if t and (z.shape[2] > t or z.shape[3] > t):
        return decode_tiled(params, cfg, z, tile=t,
                            overlap=max(t // 4, 1), qcfg=qcfg)
    return decode(params, cfg, z, qcfg=qcfg)
