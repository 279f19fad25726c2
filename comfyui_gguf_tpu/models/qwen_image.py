"""Qwen-Image MMDiT (arch "qwen_image" in the reference allowlist).

Flux-lineage joint-attention double-stream transformer with the
diffusers-style key naming Qwen-Image checkpoints carry
(``transformer_blocks.N.attn.to_q`` for the image stream and
``attn.add_q_proj`` for the text stream, per-head RMS ``norm_q``/
``norm_added_q``), conditioned on Qwen2.5-VL text states (the reference
pairs these files with a qwen2vl text-encoder GGUF + mmproj sidecar,
reference loader.py:401-403).

Structure: img_in/txt_in linears, timestep-only modulation vector,
per-block 6-chunk img/txt modulations (``img_mod.1`` / ``txt_mod.1``),
joint attention (text first), GELU-tanh MLPs, 3-axis RoPE.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import QuantConfig, DEFAULT_CONFIG, layer_norm, linear, rms_norm
from .flux import rope_freqs, apply_rope, timestep_embedding


@dataclasses.dataclass(frozen=True)
class QwenImageConfig:
    hidden: int
    n_layers: int
    n_heads: int
    in_channels: int = 64
    context_dim: int = 3584
    axes_dim: tuple[int, ...] = (16, 56, 56)
    theta: int = 10_000

    @staticmethod
    def from_state_dict(sd) -> "QwenImageConfig":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        hidden, in_ch = shape("img_in.weight")
        qn = shape("transformer_blocks.0.attn.norm_q.weight")[0]
        n = 0
        while f"transformer_blocks.{n}.attn.to_q.weight" in sd:
            n += 1
        hd = int(qn)
        third = 2 * ((hd - hd // 8) // 4)
        return QwenImageConfig(
            hidden=int(hidden), n_layers=n, n_heads=int(hidden) // hd,
            in_channels=int(in_ch),
            context_dim=int(shape("txt_in.weight")[1]),
            axes_dim=(hd - 2 * third, third, third),
        )


def _heads(x, n):
    B, L, D = x.shape
    return x.reshape(B, L, n, D // n).transpose(0, 2, 1, 3)


def _mod(params, key, vec, qcfg):
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype)
    out = linear(v, params[f"{key}.1.weight"], params.get(f"{key}.1.bias"),
                 cfg=qcfg)
    return jnp.split(out[:, None, :], 6, axis=-1)


def _block(p, img, txt, vec, pe, cfg: QwenImageConfig, qcfg):
    """One MMDiT block over its UNPREFIXED param subtree ``p``
    (scan-compatible: the same function runs under lax.scan with stacked
    params in forward_stacked and in the python loop in forward)."""
    H = cfg.n_heads

    i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = _mod(p, "img_mod", vec, qcfg)
    t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = _mod(p, "txt_mod", vec, qcfg)

    img_mod = layer_norm(img, eps=1e-6) * (1 + i_sc1) + i_sh1
    txt_mod = layer_norm(txt, eps=1e-6) * (1 + t_sc1) + t_sh1

    iq = rms_norm(_heads(linear(img_mod, p["attn.to_q.weight"],
                                p.get("attn.to_q.bias"), cfg=qcfg),
                         H), p["attn.norm_q.weight"], eps=1e-6)
    ik = rms_norm(_heads(linear(img_mod, p["attn.to_k.weight"],
                                p.get("attn.to_k.bias"), cfg=qcfg),
                         H), p["attn.norm_k.weight"], eps=1e-6)
    iv = _heads(linear(img_mod, p["attn.to_v.weight"],
                       p.get("attn.to_v.bias"), cfg=qcfg), H)
    tq = rms_norm(_heads(linear(txt_mod, p["attn.add_q_proj.weight"],
                                p.get("attn.add_q_proj.bias"),
                                cfg=qcfg), H),
                  p["attn.norm_added_q.weight"], eps=1e-6)
    tk = rms_norm(_heads(linear(txt_mod, p["attn.add_k_proj.weight"],
                                p.get("attn.add_k_proj.bias"),
                                cfg=qcfg), H),
                  p["attn.norm_added_k.weight"], eps=1e-6)
    tv = _heads(linear(txt_mod, p["attn.add_v_proj.weight"],
                       p.get("attn.add_v_proj.bias"), cfg=qcfg), H)

    q = apply_rope(jnp.concatenate([tq, iq], axis=2), pe)
    k = apply_rope(jnp.concatenate([tk, ik], axis=2), pe)
    v = jnp.concatenate([tv, iv], axis=2)
    from ..nn.attention import dot_product_attention

    a = dot_product_attention(q, k, v)
    B, Hn, L, D = a.shape
    a = a.transpose(0, 2, 1, 3).reshape(B, L, Hn * D)
    L_txt = txt.shape[1]
    txt_a, img_a = a[:, :L_txt], a[:, L_txt:]

    img = img + i_g1 * linear(img_a, p["attn.to_out.0.weight"],
                              p.get("attn.to_out.0.bias"), cfg=qcfg)
    txt = txt + t_g1 * linear(txt_a, p["attn.to_add_out.weight"],
                              p.get("attn.to_add_out.bias"),
                              cfg=qcfg)

    h = layer_norm(img, eps=1e-6) * (1 + i_sc2) + i_sh2
    h = linear(h, p["img_mlp.net.0.proj.weight"],
               p.get("img_mlp.net.0.proj.bias"), cfg=qcfg)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(h.dtype)
    img = img + i_g2 * linear(h, p["img_mlp.net.2.weight"],
                              p.get("img_mlp.net.2.bias"), cfg=qcfg)

    h = layer_norm(txt, eps=1e-6) * (1 + t_sc2) + t_sh2
    h = linear(h, p["txt_mlp.net.0.proj.weight"],
               p.get("txt_mlp.net.0.proj.bias"), cfg=qcfg)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(h.dtype)
    txt = txt + t_g2 * linear(h, p["txt_mlp.net.2.weight"],
                              p.get("txt_mlp.net.2.bias"), cfg=qcfg)
    return img, txt


def _prelude(params, cfg, img, img_ids, txt, txt_ids, timesteps, qcfg):
    img = linear(img, params["img_in.weight"], params.get("img_in.bias"),
                 cfg=qcfg)
    if "txt_norm.weight" in params:
        txt = rms_norm(txt, params["txt_norm.weight"], eps=1e-6)
    txt = linear(txt, params["txt_in.weight"], params.get("txt_in.bias"),
                 cfg=qcfg)
    # keep the conditioning vector in the activation dtype: it rides the
    # scan carry in forward_stacked, whose dtype must stay fixed
    txt = txt.astype(img.dtype)

    pre = "time_text_embed.timestep_embedder."
    vec = linear(timestep_embedding(timesteps, 256).astype(img.dtype),
                 params[pre + "linear_1.weight"],
                 params.get(pre + "linear_1.bias"), cfg=qcfg)
    vec = jax.nn.silu(vec.astype(jnp.float32)).astype(img.dtype)
    vec = linear(vec, params[pre + "linear_2.weight"],
                 params.get(pre + "linear_2.bias"), cfg=qcfg)

    ids = jnp.concatenate([txt_ids, img_ids], axis=1)
    pe = rope_freqs(ids, cfg.axes_dim, cfg.theta)
    return img, txt, vec, pe


def _head(params, img, vec, qcfg):
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(img.dtype)
    mod = linear(v, params["norm_out.linear.weight"],
                 params.get("norm_out.linear.bias"), cfg=qcfg)
    sc, sh = jnp.split(mod[:, None, :], 2, axis=-1)
    img = layer_norm(img, eps=1e-6) * (1 + sc) + sh
    return linear(img, params["proj_out.weight"],
                  params.get("proj_out.bias"), cfg=qcfg)


def forward(params, cfg: QwenImageConfig, img: jax.Array, img_ids: jax.Array,
            txt: jax.Array, txt_ids: jax.Array, timesteps: jax.Array,
            qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """img (B, L_img, in_channels) patchified tokens, txt (B, L_txt,
    context_dim), ids (B, L, 3) RoPE positions."""
    from .flux import block_subtree

    img, txt, vec, pe = _prelude(params, cfg, img, img_ids, txt, txt_ids,
                                 timesteps, qcfg)
    for i in range(cfg.n_layers):
        img, txt = _block(block_subtree(params, f"transformer_blocks.{i}."),
                          img, txt, vec, pe, cfg, qcfg)
    return _head(params, img, vec, qcfg)


def stack_qwen_params(params: dict, cfg: QwenImageConfig) -> dict:
    """Flat GGUF-keyed params → {non-block keys, "transformer_blocks":
    stacked subtree over the depth axis} for the scanned forward.
    Qwen-Image blocks are fully homogeneous (no pre-only tail)."""
    from .flux import stack_block_groups

    return stack_block_groups(
        params, [("transformer_blocks", cfg.n_layers)], arch="qwen-image")


def forward_stacked(sparams: dict, cfg: QwenImageConfig, img: jax.Array,
                    img_ids: jax.Array, txt: jax.Array, txt_ids: jax.Array,
                    timesteps: jax.Array,
                    qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """forward() over stack_qwen_params() output — identical math, one
    lax.scan over the stacked blocks (zero-copy packed weights via
    IndexedQuant scalar prefetch, flux.scan_blocks)."""
    from .flux import scan_blocks

    img, txt, vec, pe = _prelude(sparams, cfg, img, img_ids, txt, txt_ids,
                                 timesteps, qcfg)

    def body(carry, bp):
        im, tx = carry
        return _block(bp, im, tx, vec, pe, cfg, qcfg)

    img, txt = scan_blocks(sparams["transformer_blocks"], body, (img, txt),
                           cfg.n_layers)
    return _head(sparams, img, vec, qcfg)
