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

        z = int(shape("decoder.conv_in.weight")[1])
        has_qc = "post_quant_conv.weight" in sd
        # introspect geometry from the decoder keys (SD/SDXL/flux all use
        # base 128 × (1,2,4,4), but tiny/test and exotic VAEs differ)
        base = int(shape("decoder.conv_out.weight")[1])
        levels = 0
        while f"decoder.up.{levels}.block.0.conv1.weight" in sd:
            levels += 1
        nres = 0
        while f"decoder.up.0.block.{nres}.conv1.weight" in sd:
            nres += 1
        if levels:
            ch_mult = tuple(
                int(shape(f"decoder.up.{i}.block.{nres - 1}.conv1.weight"
                          )[0]) // base
                for i in range(levels))
            geo = dict(base_ch=base, ch_mult=ch_mult,
                       num_res_blocks=max(nres - 1, 1))
        else:
            geo = {}
        if z == 4:
            return VAEConfig(z_channels=4, scale_factor=0.18215,
                             shift_factor=0.0, has_quant_conv=has_qc,
                             **geo)
        return VAEConfig(z_channels=z, has_quant_conv=has_qc, **geo)


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


# -- tiled decode/encode ------------------------------------------------------
#
# Memory-bounded VAE for large resolutions (the host ecosystem's VAEDecodeTiled
# / VAEEncodeTiled capability, reference-adjacent comfy.utils.tiled_scale).
# TPU-shaped: a STATIC tile grid (python-level positions, last tile shifted to
# fit) so jit compiles the tile function exactly once, scanned over the
# position list with dynamic_slice / read-add-write dynamic_update_slice.
# Overlapping tiles are blended with a separable linear feather ramp
# ((t+1)/feather at every edge, matching the host's mask) and normalized by
# the accumulated weight, so coverage is exact wherever a single tile writes
# and a convex blend in overlaps.

def _tile_positions(size: int, tile: int, stride: int) -> list[int]:
    if size <= tile:
        return [0]
    pos = list(range(0, size - tile + 1, stride))
    if pos[-1] != size - tile:
        pos.append(size - tile)
    return pos


def _feather_mask(th: int, tw: int, feather: int) -> jnp.ndarray:
    """(th, tw, 1) separable linear ramp mask; interior value 1. The
    feather clamps to half the side per axis so degenerate tiles (one
    dimension smaller than the overlap — panorama strips) stay legal."""
    def ramp(n):
        w = jnp.ones((n,), jnp.float32)
        f = min(feather, n // 2)
        if f > 0:
            r = (jnp.arange(f, dtype=jnp.float32) + 1.0) / f
            w = w.at[:f].mul(r)
            w = w.at[n - f:].mul(r[::-1])
        return w
    return (ramp(th)[:, None] * ramp(tw)[None, :])[..., None]


def tiled_apply(fn, x: jax.Array, tile: int, overlap: int, factor: int,
                out_channels: int) -> jax.Array:
    """Apply ``fn`` ((B, tile, tile, C) → (B, tile·factor, tile·factor,
    out_channels)) over an overlapping tile grid of ``x`` and feather-blend.

    ``factor`` is the spatial scale of fn (8 for VAE decode); for a
    downscaling fn pass the INPUT-space tile/overlap and a fractional
    factor is not supported — call with x in the larger space.
    """
    B, H, W, C = x.shape
    if H <= tile and W <= tile:
        return fn(x)
    overlap = min(overlap, tile // 2)
    stride = tile - overlap
    pos = [(i, j) for i in _tile_positions(H, tile, stride)
           for j in _tile_positions(W, tile, stride)]
    pos_arr = jnp.asarray(pos, jnp.int32)

    th = min(tile, H) * factor
    tw = min(tile, W) * factor
    mask = _feather_mask(th, tw, overlap * factor)
    out = jnp.zeros((B, H * factor, W * factor, out_channels), jnp.float32)
    wsum = jnp.zeros((1, H * factor, W * factor, 1), jnp.float32)

    def body(carry, p):
        out, wsum = carry
        xt = jax.lax.dynamic_slice(
            x, (0, p[0], p[1], 0), (B, min(tile, H), min(tile, W), C))
        yt = fn(xt).astype(jnp.float32) * mask
        oi, oj = p[0] * factor, p[1] * factor
        cur = jax.lax.dynamic_slice(out, (0, oi, oj, 0), (B, th, tw,
                                                          out_channels))
        out = jax.lax.dynamic_update_slice(out, cur + yt, (0, oi, oj, 0))
        curw = jax.lax.dynamic_slice(wsum, (0, oi, oj, 0), (1, th, tw, 1))
        wsum = jax.lax.dynamic_update_slice(wsum, curw + mask[None],
                                            (0, oi, oj, 0))
        return (out, wsum), None

    (out, wsum), _ = jax.lax.scan(body, (out, wsum), pos_arr)
    return out / jnp.maximum(wsum, 1e-8)


def spatial_factor(cfg: VAEConfig) -> int:
    """Pixel/latent scale: one 2× resample per level transition."""
    return 2 ** (len(cfg.ch_mult) - 1)


def decode_tiled(params, cfg: VAEConfig, z: jax.Array, tile: int = 64,
                 overlap: int = 16,
                 qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """Tiled ``decode``: latent tiles of ``tile``² (512² pixels at the
    default) with ``overlap`` latent pixels of feathered overlap. Peak
    activation memory is bounded by one tile regardless of image size
    (GroupNorm statistics become per-tile — the standard tiled-VAE
    approximation the host UI ships)."""
    return tiled_apply(lambda zt: decode(params, cfg, zt, qcfg=qcfg),
                       z, tile, overlap, factor=spatial_factor(cfg),
                       out_channels=3)


def encode_tiled(params, cfg: VAEConfig, img: jax.Array, tile: int = 512,
                 overlap: int = 128,
                 qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """Tiled ``encode`` (deterministic mean): pixel tiles of ``tile``²
    encoded independently; the downscale happens inside the tile fn so
    blending runs in latent space (tile/overlap must be multiples of the
    VAE's spatial factor)."""
    f = spatial_factor(cfg)
    if tile % f or overlap % f:
        raise ValueError(f"tile/overlap must be multiples of {f}")
    B, H, W, C = img.shape
    if H <= tile and W <= tile:
        return encode(params, cfg, img, qcfg=qcfg)

    # run tiling in latent space: slice pixel tiles via a latent-space
    # "input" of the same grid by wrapping encode to take latent coords
    z_channels = cfg.z_channels
    lt, lov = tile // f, overlap // f
    lH, lW = H // f, W // f
    overlap_l = min(lov, lt // 2)
    stride = lt - overlap_l
    pos = [(i, j) for i in _tile_positions(lH, lt, stride)
           for j in _tile_positions(lW, lt, stride)]
    pos_arr = jnp.asarray(pos, jnp.int32)
    tl = min(lt, lH)
    tw = min(lt, lW)
    mask = _feather_mask(tl, tw, overlap_l)
    out = jnp.zeros((B, lH, lW, z_channels), jnp.float32)
    wsum = jnp.zeros((1, lH, lW, 1), jnp.float32)

    def body(carry, p):
        out, wsum = carry
        xt = jax.lax.dynamic_slice(
            img, (0, p[0] * f, p[1] * f, 0), (B, tl * f, tw * f, C))
        yt = encode(params, cfg, xt, qcfg=qcfg).astype(jnp.float32) * mask
        cur = jax.lax.dynamic_slice(out, (0, p[0], p[1], 0),
                                    (B, tl, tw, z_channels))
        out = jax.lax.dynamic_update_slice(out, cur + yt,
                                           (0, p[0], p[1], 0))
        curw = jax.lax.dynamic_slice(wsum, (0, p[0], p[1], 0),
                                     (1, tl, tw, 1))
        wsum = jax.lax.dynamic_update_slice(wsum, curw + mask[None],
                                            (0, p[0], p[1], 0))
        return (out, wsum), None

    (out, wsum), _ = jax.lax.scan(body, (out, wsum), pos_arr)
    return out / jnp.maximum(wsum, 1e-8)


def _tile_env() -> int:
    import os

    v = os.environ.get("GGUF_TPU_VAE_TILE", "").strip()
    return int(v) if v else 0


def decode_auto(params, cfg: VAEConfig, z: jax.Array,
                qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """``decode``, tiling automatically when ``GGUF_TPU_VAE_TILE=<latent
    tile side>`` is set and the latent exceeds it (the host UI's
    VAEDecodeTiled opt-in, env-shaped because jit needs static tile
    geometry — there is no catch-OOM-and-retry on TPU)."""
    t = _tile_env()
    if t and (z.shape[1] > t or z.shape[2] > t):
        return decode_tiled(params, cfg, z, tile=t,
                            overlap=max(t // 4, 1), qcfg=qcfg)
    return decode(params, cfg, z, qcfg=qcfg)


def encode_auto(params, cfg: VAEConfig, img: jax.Array,
                qcfg: QuantConfig = DEFAULT_CONFIG,
                sample_key: jax.Array | None = None) -> jax.Array:
    """``encode`` with the same opt-in tiling (threshold in latent units,
    like decode). Tiled encode is deterministic (mean)."""
    t = _tile_env()
    f = spatial_factor(cfg)
    if t and (img.shape[1] > t * f or img.shape[2] > t * f):
        return encode_tiled(params, cfg, img, tile=t * f,
                            overlap=max(t // 4, 1) * f, qcfg=qcfg)
    return encode(params, cfg, img, qcfg=qcfg, sample_key=sample_key)


def tiled_apply_video(fn, x: jax.Array, tile: int, overlap: int):
    """Spatially-tiled application of a video-VAE decode:
    fn (B, T, th, tw, C) → (B, T', th·f, tw·f, C'); T and the temporal
    law stay whole (causal convs make temporal tiling stateful — spatial
    tiling is the memory lever, H·W dominates video activation size).
    Output tile geometry (f, T', C') is inferred via ``jax.eval_shape``,
    so any pixel-shuffle factor (8× wan/hyvid, 32× LTXV) works."""
    B, T, H, W, C = x.shape
    if H <= tile and W <= tile:
        return fn(x)
    overlap = min(overlap, tile // 2)
    stride = tile - overlap
    th_in, tw_in = min(tile, H), min(tile, W)
    probe = jax.eval_shape(
        fn, jax.ShapeDtypeStruct((B, T, th_in, tw_in, C), x.dtype))
    _, T_out, th, tw, C_out = probe.shape
    f = th // th_in
    if th != th_in * f or tw != tw_in * f:
        raise ValueError(f"non-integral or asymmetric spatial factor: "
                         f"in ({th_in}, {tw_in}) -> out {probe.shape}")

    pos = [(i, j) for i in _tile_positions(H, tile, stride)
           for j in _tile_positions(W, tile, stride)]
    pos_arr = jnp.asarray(pos, jnp.int32)
    mask = _feather_mask(th, tw, overlap * f)[None]  # (1, th, tw, 1)
    out = jnp.zeros((B, T_out, H * f, W * f, C_out), jnp.float32)
    wsum = jnp.zeros((1, 1, H * f, W * f, 1), jnp.float32)

    def body(carry, p):
        out, wsum = carry
        xt = jax.lax.dynamic_slice(
            x, (0, 0, p[0], p[1], 0), (B, T, th_in, tw_in, C))
        yt = fn(xt).astype(jnp.float32) * mask
        oi, oj = p[0] * f, p[1] * f
        cur = jax.lax.dynamic_slice(
            out, (0, 0, oi, oj, 0), (B, T_out, th, tw, C_out))
        out = jax.lax.dynamic_update_slice(out, cur + yt,
                                           (0, 0, oi, oj, 0))
        curw = jax.lax.dynamic_slice(wsum, (0, 0, oi, oj, 0),
                                     (1, 1, th, tw, 1))
        wsum = jax.lax.dynamic_update_slice(wsum, curw + mask[None],
                                            (0, 0, oi, oj, 0))
        return (out, wsum), None

    (out, wsum), _ = jax.lax.scan(body, (out, wsum), pos_arr)
    return out / jnp.maximum(wsum, 1e-8)
