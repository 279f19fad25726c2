"""LTX-Video causal 3-D VAE (encoder + decoder), TPU-native NDHWC.

Host-owned in the reference stack (ComfyUI's first-party LTXV support;
the GGUF plugin only supplies the quantized DiT — reference
tools/lcpp.patch:49-77 lists the ltxv arch). Convention follows the
published LTX-Video autoencoder description (Lightricks LTX-Video /
diffusers AutoencoderKLLTXVideo, 0.9.0 family):

* **Pixel-shuffle compression**: the encoder space-to-depths each frame
  by ``patch_size`` (4) before conv_in; the decoder depth-to-spaces back
  at conv_out. Combined with the striding blocks this gives the 1:32
  spatial / 1:8 temporal compression into 128 latent channels.
* ``CausalConv3d``: temporal padding is FRONT-only with edge
  replication (frame t never sees t+1 — the streaming property); the
  weight lives on an inner conv: ``*.conv.weight``.
* Res blocks are norm-free-affine: ``RMSNorm(elementwise_affine=False)``
  → SiLU → causal conv, twice, plus optional ``conv_shortcut`` when
  channels change. Keys: ``res_blocks.{j}.conv{1,2}.conv.weight``.
* Down path: per-level ``downsamplers.0.conv`` strided causal conv;
  whether a level strides time as well as space comes from
  ``spatio_temporal_scaling`` (default (True, True, True, False)).
* Up path (decoder): ``upsamplers.0.conv`` producing C·(st·sh·sw)
  channels, rearranged depth-to-space over (t, h, w) — pixel-shuffle
  upsampling, no transposed convs.
* Latents are normalized with the checkpoint's per-channel statistics
  ``per_channel_statistics.{mean,std}-of-means`` before the DiT and
  denormalized before decode.

Structure (level count, widths, res-block depth) is introspected from
the keys, house style of models/wan_vae.py / models/hyvid_vae.py; the
stride flags and patch size are config with LTX-0.9 defaults (they are
not recoverable from weight shapes).

Frame bookkeeping: latent T decodes to 1 + 8·(T−1) pixel frames (the
first latent frame carries a single pixel frame; each temporal doubling
trims its causal warm-up frame).
"""

from __future__ import annotations

import dataclasses
import re

import jax
import jax.numpy as jnp

from ..nn.layers import QuantConfig, DEFAULT_CONFIG, materialize

F32 = jnp.float32


def _silu(x):
    return jax.nn.silu(x.astype(F32)).astype(x.dtype)


def _rms_noaffine(x, eps=1e-8):
    xf = x.astype(F32)
    v = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(v + eps)).astype(x.dtype)


def _causal_conv3d(x, w, b, *, stride=(1, 1, 1), cfg=DEFAULT_CONFIG):
    """x: (B, T, H, W, C); w: torch OIDHW. Temporal pad front-only by
    EDGE REPLICATION (LTXV pads with the first frame, not zeros)."""
    wv = materialize(w, cfg.compute_dtype)
    kt, kh, kw = wv.shape[2], wv.shape[3], wv.shape[4]
    if kt > 1:
        front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([front, x], axis=1)
    pad = ((0, 0), ((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2)
    out = jax.lax.conv_general_dilated(
        x.astype(cfg.compute_dtype), wv,
        window_strides=stride, padding=pad,
        dimension_numbers=("NDHWC", "OIDHW", "NDHWC"),
        preferred_element_type=F32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _space_to_depth(x, p):
    """(B, T, H, W, C) → (B, T, H/p, W/p, C·p²)."""
    B, T, H, W, C = x.shape
    x = x.reshape(B, T, H // p, p, W // p, p, C)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        B, T, H // p, W // p, p * p * C)


def _depth_to_space(x, p):
    """(B, T, H, W, C·p²) → (B, T, H·p, W·p, C)."""
    B, T, H, W, C = x.shape
    c = C // (p * p)
    x = x.reshape(B, T, H, W, p, p, c)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, H * p, W * p, c)


def _depth_to_spacetime(x, st, sh, sw):
    """(B, T, H, W, C·st·sh·sw) → (B, T·st, H·sh, W·sw, C) — the decoder's
    pixel-shuffle upsampler. Channel-major factor order (st, sh, sw, c)."""
    B, T, H, W, C = x.shape
    c = C // (st * sh * sw)
    x = x.reshape(B, T, H, W, st, sh, sw, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, T * st, H * sh, W * sw, c)


@dataclasses.dataclass(frozen=True)
class LTXVVAEConfig:
    latent_channels: int = 128
    patch_size: int = 4
    # per down/up level: does this level also stride/upsample time?
    spatio_temporal_scaling: tuple[bool, ...] = (True, True, True, False)
    n_levels: int = 4
    res_blocks_per_level: int = 2

    @property
    def spatial_factor(self) -> int:
        # the last level never strides (standard ladder: n_levels-1 downs)
        return self.patch_size * (1 << (self.n_levels - 1))

    @property
    def temporal_factor(self) -> int:
        return 1 << sum(self.spatio_temporal_scaling[: self.n_levels - 1])

    @staticmethod
    def from_state_dict(sd) -> "LTXVVAEConfig":
        levels = set()
        res = set()
        for k in sd:
            m = re.match(r"(?:decoder|encoder)\.(?:up|down)_blocks\."
                         r"(\d+)\.res_blocks\.(\d+)\.", k)
            if m:
                levels.add(int(m.group(1)))
                res.add(int(m.group(2)))
        n_levels = (max(levels) + 1) if levels else 4
        lat = None
        if "decoder.conv_in.conv.weight" in sd:
            w = sd["decoder.conv_in.conv.weight"]
            lat = int(getattr(w, "shape", w.shape)[1])
        sts = tuple([True] * (n_levels - 1) + [False])
        return LTXVVAEConfig(
            latent_channels=lat or 128,
            spatio_temporal_scaling=sts,
            n_levels=n_levels,
            res_blocks_per_level=(max(res) + 1) if res else 2,
        )


def detect_ltxv_vae(keys) -> bool:
    return any(".res_blocks.0.conv1.conv.weight" in k for k in keys)


def _res_block(params, p, x, qcfg):
    h = _causal_conv3d(_silu(_rms_noaffine(x)),
                       params[f"{p}.conv1.conv.weight"],
                       params.get(f"{p}.conv1.conv.bias"), cfg=qcfg)
    h = _causal_conv3d(_silu(_rms_noaffine(h)),
                       params[f"{p}.conv2.conv.weight"],
                       params.get(f"{p}.conv2.conv.bias"), cfg=qcfg)
    sc = params.get(f"{p}.conv_shortcut.conv.weight")
    if sc is not None:
        x = _causal_conv3d(x, sc, params.get(f"{p}.conv_shortcut.conv.bias"),
                           cfg=qcfg)
    return x + h


def encode(params, cfg: LTXVVAEConfig, video, *, sample: bool = False,
           key=None, qcfg: QuantConfig = DEFAULT_CONFIG):
    """(B, T_pix, H, W, 3) in [-1, 1] → latent (B, T_lat, H/32, W/32, C),
    normalized by the per-channel statistics. T_pix must be 1 + 8·k."""
    x = _space_to_depth(video, cfg.patch_size)
    x = _causal_conv3d(x, params["encoder.conv_in.conv.weight"],
                       params.get("encoder.conv_in.conv.bias"), cfg=qcfg)
    for i in range(cfg.n_levels):
        base = f"encoder.down_blocks.{i}"
        for j in range(cfg.res_blocks_per_level):
            x = _res_block(params, f"{base}.res_blocks.{j}", x, qcfg)
        dw = params.get(f"{base}.downsamplers.0.conv.weight")
        if dw is not None:
            st = 2 if cfg.spatio_temporal_scaling[i] else 1
            # causal stride: drop the first frame's extra sample so
            # T 1+2k → 1+k (first latent frame keeps frame 0 alone)
            if st == 2:
                x = jnp.concatenate([x[:, :1], x], axis=1)
            x = _causal_conv3d(x, dw,
                               params.get(f"{base}.downsamplers.0.conv.bias"),
                               stride=(st, 2, 2), cfg=qcfg)
    for j in range(cfg.res_blocks_per_level):
        x = _res_block(params, f"encoder.mid_block.res_blocks.{j}", x, qcfg)
    x = _silu(_rms_noaffine(x))
    x = _causal_conv3d(x, params["encoder.conv_out.conv.weight"],
                       params.get("encoder.conv_out.conv.bias"), cfg=qcfg)
    mean, logvar = jnp.split(x, 2, axis=-1)
    z = mean
    if sample:
        key = key if key is not None else jax.random.key(0)
        z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * \
            jax.random.normal(key, mean.shape, mean.dtype)
    mu = params.get("per_channel_statistics.mean-of-means")
    std = params.get("per_channel_statistics.std-of-means")
    if mu is not None and std is not None:
        z = (z - jnp.asarray(mu, z.dtype)) / jnp.asarray(std, z.dtype)
    return z


def decode(params, cfg: LTXVVAEConfig, z, *,
           qcfg: QuantConfig = DEFAULT_CONFIG):
    """latent (B, T_lat, h, w, C) → video (B, 1+8·(T_lat−1), h·32, w·32, 3)
    in [-1, 1]."""
    mu = params.get("per_channel_statistics.mean-of-means")
    std = params.get("per_channel_statistics.std-of-means")
    if mu is not None and std is not None:
        z = z * jnp.asarray(std, z.dtype) + jnp.asarray(mu, z.dtype)
    x = _causal_conv3d(z, params["decoder.conv_in.conv.weight"],
                       params.get("decoder.conv_in.conv.bias"), cfg=qcfg)
    for j in range(cfg.res_blocks_per_level):
        x = _res_block(params, f"decoder.mid_block.res_blocks.{j}", x, qcfg)
    for i in range(cfg.n_levels):
        base = f"decoder.up_blocks.{i}"
        uw = params.get(f"{base}.upsamplers.0.conv.weight")
        if uw is not None:
            # mirror of the encoder level: levels run deep→shallow
            lvl = cfg.n_levels - 1 - i
            st = 2 if cfg.spatio_temporal_scaling[lvl] else 1
            x = _causal_conv3d(x, uw,
                               params.get(f"{base}.upsamplers.0.conv.bias"),
                               cfg=qcfg)
            x = _depth_to_spacetime(x, st, 2, 2)
            if st == 2:
                x = x[:, 1:]  # trim the causal warm-up frame
        for j in range(cfg.res_blocks_per_level):
            x = _res_block(params, f"{base}.res_blocks.{j}", x, qcfg)
    x = _silu(_rms_noaffine(x))
    x = _causal_conv3d(x, params["decoder.conv_out.conv.weight"],
                       params.get("decoder.conv_out.conv.bias"), cfg=qcfg)
    return _depth_to_space(x, cfg.patch_size)


def decode_tiled(params, cfg: LTXVVAEConfig, z, tile: int = 16,
                 overlap: int = 4, *,
                 qcfg: QuantConfig = DEFAULT_CONFIG):
    """Spatially-tiled ``decode`` (512² pixel tiles at the default 32×
    pixel-shuffle factor) — see vae.tiled_apply_video."""
    from .vae import tiled_apply_video

    return tiled_apply_video(
        lambda zt: decode(params, cfg, zt, qcfg=qcfg), z, tile, overlap)


def decode_auto(params, cfg: LTXVVAEConfig, z, *,
                qcfg: QuantConfig = DEFAULT_CONFIG):
    """``decode`` with the GGUF_TPU_VAE_TILE opt-in spatial tiling."""
    from .vae import _tile_env

    t = _tile_env()
    if t and (z.shape[2] > t or z.shape[3] > t):
        return decode_tiled(params, cfg, z, tile=t,
                            overlap=max(t // 4, 1), qcfg=qcfg)
    return decode(params, cfg, z, qcfg=qcfg)
