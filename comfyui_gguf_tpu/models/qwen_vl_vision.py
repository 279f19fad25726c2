"""Qwen2-VL / Qwen2.5-VL vision tower (mmproj sidecar forward graph).

The loader already discovers the mmproj GGUF, re-fuses split q/k/v, stacks
the 4-D patch-embed chunks to 5-D, and remaps to ``visual.*`` keys
(loader.gguf_mmproj_loader, role of reference loader.py:220-284). This
module runs those weights: ViT with 2-axis rotary embeddings, optional
Qwen2.5 window attention (same-window masking; full-attention blocks at
configurable indexes), SwiGLU (2.5) or quick-gelu (2.0) MLPs detected from
the key set, and the 2×2 patch merger.

Used by Qwen-Image-Edit conditioning (image inputs to the Qwen2.5-VL text
encoder).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import (
    QuantConfig,
    DEFAULT_CONFIG,
    layer_norm,
    linear,
    rms_norm,
)


@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    dim: int
    n_layers: int
    n_heads: int
    out_dim: int
    patch_size: int = 14
    temporal_patch: int = 2
    merge_size: int = 2
    # Qwen2.5-VL: all-window attention except these block indexes; window
    # spans 112 px = 8 patches = 4 merged cells. Qwen2-VL: all blocks full.
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    window_cells: int = 4  # window side length in merged cells
    use_window_attention: bool = True

    @staticmethod
    def from_state_dict(sd) -> "QwenVLVisionConfig":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        pe = shape("visual.patch_embed.proj.weight")  # (dim, 3, t, p, p)
        dim = pe[0]
        n = 0
        while f"visual.blocks.{n}.attn.qkv.weight" in sd:
            n += 1
        out_dim = shape("visual.merger.mlp.2.weight")[0]
        # 2.5-VL has gated MLPs + RMS norms; 2.0 has fc-style + LN
        is_25 = "visual.blocks.0.mlp.gate_proj.weight" in sd
        return QwenVLVisionConfig(
            dim=int(dim), n_layers=n, n_heads=int(dim) // 80,
            out_dim=int(out_dim), patch_size=int(pe[-1]),
            temporal_patch=int(pe[2]) if len(pe) == 5 else 2,
            use_window_attention=is_25,
        )


def _rot_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def _rope_2d(h: int, w: int, head_dim: int, theta: float = 10_000.0):
    """(L, head_dim) cos/sin over (row, col) half-split positions."""
    half = head_dim // 2
    omega = 1.0 / (theta ** (np.arange(0, half, 2, dtype=np.float32) / half))
    rows = np.repeat(np.arange(h), w).astype(np.float32)
    cols = np.tile(np.arange(w), h).astype(np.float32)
    ang = np.concatenate(
        [rows[:, None] * omega[None], cols[:, None] * omega[None]], axis=1
    )  # (L, half)
    ang = np.concatenate([ang, ang], axis=1)  # (L, head_dim)
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def _window_ids(h: int, w: int, merge: int, cells: int) -> np.ndarray:
    """window id per pre-merge token, (h*w,) int32."""
    rows, cols = np.divmod(np.arange(h * w), w)
    cell_r, cell_c = rows // merge, cols // merge
    win_r, win_c = cell_r // cells, cell_c // cells
    n_wc = -(-(w // merge) // cells)
    return (win_r * n_wc + win_c).astype(np.int32)


def forward(params, cfg: QwenVLVisionConfig, pixels: jax.Array,
            qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """pixels (h_patches, w_patches, C·tp·p·p) pre-extracted patch vectors
    → (h/merge · w/merge, out_dim) merged vision embeddings.

    (Patch extraction from raw images is a host-side reshape; see
    ``extract_patches``.)
    """
    hp, wp, _ = pixels.shape
    L = hp * wp
    D = cfg.dim
    H = cfg.n_heads
    hd = D // H

    w_pe = params["visual.patch_embed.proj.weight"]
    from ..nn.layers import materialize

    wk = materialize(w_pe, jnp.float32).reshape(D, -1)
    x = jnp.dot(pixels.reshape(L, -1).astype(jnp.float32), wk.T)
    if "visual.patch_embed.proj.bias" in params:
        x = x + params["visual.patch_embed.proj.bias"].astype(x.dtype)
    x = x.astype(jnp.bfloat16)[None]  # (1, L, D)

    cos, sin = _rope_2d(hp, wp, hd)
    wid = jnp.asarray(_window_ids(hp, wp, cfg.merge_size, cfg.window_cells))
    win_mask = jnp.where(wid[None, :] == wid[:, None], 0.0,
                         jnp.finfo(jnp.float32).min)[None, None]

    def norm(x, base):
        if f"{base}.bias" in params:
            return layer_norm(x, params[f"{base}.weight"],
                              params[f"{base}.bias"], eps=1e-6)
        return rms_norm(x, params[f"{base}.weight"], eps=1e-6)

    for i in range(cfg.n_layers):
        p = f"visual.blocks.{i}"
        full = (not cfg.use_window_attention
                or i in cfg.fullatt_block_indexes)
        h = norm(x, f"{p}.norm1")
        qkv = linear(h, params[f"{p}.attn.qkv.weight"],
                     params.get(f"{p}.attn.qkv.bias"), cfg=qcfg)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(1, L, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(1, L, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(1, L, H, hd).transpose(0, 2, 1, 3)
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = (qf * cos + _rot_half(qf) * sin).astype(x.dtype)
        k = (kf * cos + _rot_half(kf) * sin).astype(x.dtype)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        if not full:
            logits = logits + win_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        a = a.transpose(0, 2, 1, 3).reshape(1, L, D)
        x = x + linear(a, params[f"{p}.attn.proj.weight"],
                       params.get(f"{p}.attn.proj.bias"), cfg=qcfg)

        h = norm(x, f"{p}.norm2")
        if f"{p}.mlp.gate_proj.weight" in params:  # 2.5: SwiGLU
            g = linear(h, params[f"{p}.mlp.gate_proj.weight"],
                       params.get(f"{p}.mlp.gate_proj.bias"), cfg=qcfg)
            u = linear(h, params[f"{p}.mlp.up_proj.weight"],
                       params.get(f"{p}.mlp.up_proj.bias"), cfg=qcfg)
            m = jax.nn.silu(g.astype(jnp.float32)).astype(h.dtype) * u
        else:  # 2.0: fc → quick-gelu
            m = linear(h, params[f"{p}.mlp.up_proj.weight"],
                       params.get(f"{p}.mlp.up_proj.bias"), cfg=qcfg)
            mf = m.astype(jnp.float32)
            m = (mf * jax.nn.sigmoid(1.702 * mf)).astype(h.dtype)
        x = x + linear(m, params[f"{p}.mlp.down_proj.weight"],
                       params.get(f"{p}.mlp.down_proj.bias"), cfg=qcfg)

    # merger: ln_q per token, then concat merge² spatial neighbours
    x = norm(x, "visual.merger.ln_q")[0]  # (L, D)
    m = cfg.merge_size
    x = x.reshape(hp // m, m, wp // m, m, D).transpose(0, 2, 1, 3, 4)
    x = x.reshape((hp // m) * (wp // m), m * m * D)
    x = linear(x, params["visual.merger.mlp.0.weight"],
               params.get("visual.merger.mlp.0.bias"), cfg=qcfg)
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return linear(x, params["visual.merger.mlp.2.weight"],
                  params.get("visual.merger.mlp.2.bias"), cfg=qcfg)


def extract_patches(image: np.ndarray, patch: int = 14,
                    temporal: int = 2) -> np.ndarray:
    """(H, W, 3) float image → (h_patches, w_patches, 3·temporal·p·p)
    patch vectors (image replicated along the temporal patch axis, the
    single-image convention)."""
    H, W, C = image.shape
    hp, wp = H // patch, W // patch
    x = image[: hp * patch, : wp * patch]
    x = x.reshape(hp, patch, wp, patch, C).transpose(0, 2, 4, 1, 3)
    x = x.reshape(hp, wp, C, patch * patch)
    # kernel flattens OIDHW → (C, t, ph, pw); replicate the temporal axis
    # inside each channel
    x = np.repeat(x[:, :, :, None, :], temporal, axis=3)
    return x.reshape(hp, wp, C * temporal * patch * patch)