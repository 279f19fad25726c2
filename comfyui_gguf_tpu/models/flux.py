"""Flux DiT (double-stream / single-stream rectified-flow transformer).

The reference never contains this graph — ComfyUI builds it and the GGUF
plugin only swaps in lazy-dequant layers (reference nodes.py:149-177).
Here the full model is native JAX over the flat GGUF state dict
(original BFL key naming, i.e. what `model.diffusion_model.`-prefixed GGUF
files carry), with all hot matmuls routed through the fused quantized
kernels via ``nn.linear``.

Architecture semantics follow the public Flux reference description:
3D-axis RoPE, QK-RMSNorm, 19 double blocks (separate img/txt streams with
joint attention), 38 single blocks (fused qkv+mlp), adaLN modulation from
timestep+guidance+pooled-CLIP vector.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import (QuantConfig, DEFAULT_CONFIG, layer_norm, linear,
                         linear_gelu, rms_norm)


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64  # 16 latent ch × 2×2 patch
    hidden: int = 3072
    n_heads: int = 24
    depth_double: int = 19
    depth_single: int = 38
    mlp_ratio: float = 4.0
    axes_dim: tuple[int, ...] = (16, 56, 56)
    theta: int = 10_000
    context_dim: int = 4096
    vec_dim: int = 768
    guidance_embed: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden // self.n_heads

    @staticmethod
    def from_state_dict(sd) -> "FluxConfig":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        hidden, in_ch = shape("img_in.weight")
        _, ctx = shape("txt_in.weight")
        _, vec = shape("vector_in.in_layer.weight")
        nd = 0
        while f"double_blocks.{nd}.img_mod.lin.weight" in sd:
            nd += 1
        ns = 0
        while f"single_blocks.{ns}.linear1.weight" in sd:
            ns += 1
        qn = shape("double_blocks.0.img_attn.norm.query_norm.scale")[0]
        return FluxConfig(
            in_channels=int(in_ch), hidden=int(hidden),
            n_heads=int(hidden) // int(qn), depth_double=nd, depth_single=ns,
            context_dim=int(ctx), vec_dim=int(vec),
            guidance_embed="guidance_in.in_layer.weight" in sd,
        )


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------

def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10_000.0,
                       time_factor: float = 1000.0) -> jax.Array:
    """Sinusoidal embedding, BFL convention (t scaled by 1000, cos|sin)."""
    t = time_factor * t.astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def rope_freqs(ids: jax.Array, axes_dim, theta: float = 10_000.0) -> jax.Array:
    """Position ids (B, L, n_axes) → rotation (B, L, D/2, 2) as (cos, sin)."""
    parts = []
    for i, d in enumerate(axes_dim):
        pos = ids[..., i].astype(jnp.float32)  # (B, L)
        omega = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
        angles = pos[..., None] * omega  # (B, L, d/2)
        parts.append(
            jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
        )
    return jnp.concatenate(parts, axis=2)  # (B, L, D/2, 2)


def apply_rope(x: jax.Array, pe: jax.Array) -> jax.Array:
    """x: (B, H, L, D); pe: (B, L, D/2, 2) — rotate adjacent pairs."""
    B, H, L, D = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, L, D // 2, 2)
    cos = pe[:, None, :, :, 0]
    sin = pe[:, None, :, :, 1]
    real = xf[..., 0] * cos - xf[..., 1] * sin
    imag = xf[..., 0] * sin + xf[..., 1] * cos
    return jnp.stack([real, imag], axis=-1).reshape(B, H, L, D).astype(x.dtype)


def make_img_ids(h_tok: int, w_tok: int, batch: int) -> np.ndarray:
    """(B, h*w, 3) position ids: axis0 unused, axis1 row, axis2 col."""
    ids = np.zeros((h_tok, w_tok, 3), dtype=np.int32)
    ids[..., 1] = np.arange(h_tok)[:, None]
    ids[..., 2] = np.arange(w_tok)[None, :]
    return np.broadcast_to(ids.reshape(1, -1, 3), (batch, h_tok * w_tok, 3))


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _mlp_embed(params, prefix: str, x: jax.Array, qcfg) -> jax.Array:
    h = linear(x, params[f"{prefix}.in_layer.weight"],
               params.get(f"{prefix}.in_layer.bias"), cfg=qcfg)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    return linear(h, params[f"{prefix}.out_layer.weight"],
                  params.get(f"{prefix}.out_layer.bias"), cfg=qcfg)


def _modulation(params, prefix: str, vec: jax.Array, n: int, qcfg):
    """silu(vec) → lin → n chunks of hidden, each (B, 1, hidden)."""
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype)
    out = linear(v, params[f"{prefix}.lin.weight"],
                 params.get(f"{prefix}.lin.bias"), cfg=qcfg)
    return jnp.split(out[:, None, :], n, axis=-1)


def _qknorm(params, prefix: str, q: jax.Array, k: jax.Array):
    q = rms_norm(q, params[f"{prefix}.query_norm.scale"], eps=1e-6)
    k = rms_norm(k, params[f"{prefix}.key_norm.scale"], eps=1e-6)
    return q, k


def _attention(q: jax.Array, k: jax.Array, v: jax.Array,
               pe: jax.Array) -> jax.Array:
    """(B, H, L, D) heads-major attention with RoPE; returns (B, L, H*D)."""
    from ..nn.attention import dot_product_attention

    q = apply_rope(q, pe)
    k = apply_rope(k, pe)
    B, H, L, D = q.shape
    out = dot_product_attention(q, k, v)  # (B, H, L, D)
    return out.transpose(0, 2, 1, 3).reshape(B, L, H * D)


def _split_heads(x: jax.Array, n_heads: int) -> tuple[jax.Array, ...]:
    """(B, L, 3*hidden) fused qkv → 3 × (B, H, L, D)."""
    B, L, _ = x.shape
    qkv = x.reshape(B, L, 3, n_heads, -1)
    return tuple(qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))


def block_subtree(params, prefix: str) -> dict:
    """Per-block param view: strips ``prefix`` from matching keys."""
    n = len(prefix)
    return {k[n:]: v for k, v in params.items() if k.startswith(prefix)}


def stack_block_groups(params: dict, groups, arch: str = "") -> dict:
    """Flat GGUF-keyed params → {non-block keys, out_key: depth-stacked
    subtree per group} for the scanned forwards.

    ``groups``: iterable of ``(out_key, n)`` — blocks live under
    ``{out_key}.{i}.``. Every block in a group must expose the same key
    set (a heterogeneous stack can't run under one lax.scan); callers
    with tails/special blocks (flux guidance, sd3's pre-only last block)
    handle those around this helper."""
    prefixes = tuple(f"{g[0]}." for g in groups)
    out = {k: v for k, v in params.items() if not k.startswith(prefixes)}
    for out_key, n in groups:
        subs = [block_subtree(params, f"{out_key}.{i}.") for i in range(n)]
        if len({frozenset(s) for s in subs}) > 1:
            raise ValueError(f"non-homogeneous {arch or out_key} blocks; "
                             "use forward()")
        out[out_key] = (jax.tree.map(lambda *xs: jnp.stack(xs), *subs)
                        if subs else {})
    return out


def _double_block(p: dict, img, txt, vec, pe, cfg: FluxConfig, qcfg):
    """One double-stream block over its UNPREFIXED param subtree ``p``
    (scan-compatible: the same function runs under lax.scan with stacked
    params in forward_stacked and in the python loop in forward)."""
    H = cfg.n_heads

    i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2 = _modulation(
        p, "img_mod", vec, 6, qcfg)
    t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2 = _modulation(
        p, "txt_mod", vec, 6, qcfg)

    img_mod = layer_norm(img, eps=1e-6) * (1 + i_scale1) + i_shift1
    txt_mod = layer_norm(txt, eps=1e-6) * (1 + t_scale1) + t_shift1

    iq, ik, iv = _split_heads(
        linear(img_mod, p["img_attn.qkv.weight"],
               p.get("img_attn.qkv.bias"), cfg=qcfg), H)
    tq, tk, tv = _split_heads(
        linear(txt_mod, p["txt_attn.qkv.weight"],
               p.get("txt_attn.qkv.bias"), cfg=qcfg), H)
    iq, ik = _qknorm(p, "img_attn.norm", iq, ik)
    tq, tk = _qknorm(p, "txt_attn.norm", tq, tk)

    # joint attention, text stream first (BFL ordering)
    q = jnp.concatenate([tq, iq], axis=2)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)
    attn = _attention(q, k, v, pe)
    L_txt = txt.shape[1]
    txt_attn, img_attn = attn[:, :L_txt], attn[:, L_txt:]

    img = img + i_gate1 * linear(img_attn, p["img_attn.proj.weight"],
                                 p.get("img_attn.proj.bias"), cfg=qcfg)
    h = layer_norm(img, eps=1e-6) * (1 + i_scale2) + i_shift2
    # bias+gelu ride the kernel epilogue (fusion barrier otherwise)
    h = linear_gelu(h, p["img_mlp.0.weight"], p.get("img_mlp.0.bias"),
                    cfg=qcfg)
    img = img + i_gate2 * linear(h, p["img_mlp.2.weight"],
                                 p.get("img_mlp.2.bias"), cfg=qcfg)

    txt = txt + t_gate1 * linear(txt_attn, p["txt_attn.proj.weight"],
                                 p.get("txt_attn.proj.bias"), cfg=qcfg)
    h = layer_norm(txt, eps=1e-6) * (1 + t_scale2) + t_shift2
    h = linear_gelu(h, p["txt_mlp.0.weight"], p.get("txt_mlp.0.bias"),
                    cfg=qcfg)
    txt = txt + t_gate2 * linear(h, p["txt_mlp.2.weight"],
                                 p.get("txt_mlp.2.bias"), cfg=qcfg)
    return img, txt


def _single_block(p: dict, x, vec, pe, cfg: FluxConfig, qcfg):
    """One single-stream block over its unprefixed param subtree."""
    H = cfg.n_heads
    # linear1 fuses [q|k|v|mlp]; derive the boundary EXACTLY from the
    # weights instead of cfg.hidden: linear1 out = 3h+m and linear2
    # in = h+m (full or per-shard alike), so 3h = 3·(W1−K2)/2 — no
    # mlp_ratio assumption, correct for pruned/fine-tuned mlp widths
    # and per shard under head-uniform TP column splits
    # (parallel/tp_spec flux rules)
    from ..nn.layers import in_features, out_features

    hid3 = 3 * (out_features(p["linear1.weight"])
                - in_features(p["linear2.weight"])) // 2

    shift, scale, gate = _modulation(p, "modulation", vec, 3, qcfg)
    x_mod = layer_norm(x, eps=1e-6) * (1 + scale) + shift

    # fused linear1: qkv columns pass through, mlp columns get the
    # GELU applied in the kernel epilogue (3·hidden is r-tile aligned)
    h = linear_gelu(x_mod, p["linear1.weight"], p.get("linear1.bias"),
                    tail_from=hid3, cfg=qcfg)
    qkv, act = h[..., :hid3], h[..., hid3:]
    q, k, v = _split_heads(qkv, H)
    q, k = _qknorm(p, "norm", q, k)
    attn = _attention(q, k, v, pe)
    out = linear(jnp.concatenate([attn, act], axis=-1),
                 p["linear2.weight"], p.get("linear2.bias"), cfg=qcfg)
    return x + gate * out


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------

def _prelude(params, cfg: FluxConfig, img, img_ids, txt, txt_ids,
             timesteps, y, guidance, qcfg):
    """Input embeddings + conditioning vector + RoPE table."""
    img = linear(img, params["img_in.weight"], params.get("img_in.bias"),
                 cfg=qcfg)
    txt = linear(txt, params["txt_in.weight"], params.get("txt_in.bias"),
                 cfg=qcfg)

    vec = _mlp_embed(params, "time_in",
                     timestep_embedding(timesteps, 256), qcfg)
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("guidance-distilled model needs guidance values")
        vec = vec + _mlp_embed(params, "guidance_in",
                               timestep_embedding(guidance, 256), qcfg)
    vec = vec + _mlp_embed(params, "vector_in", y, qcfg)
    # keep the conditioning vector in activation dtype — the f32 timestep
    # embedding must not promote every modulated stream to f32
    vec = vec.astype(img.dtype)

    ids = jnp.concatenate([txt_ids, img_ids], axis=1)
    pe = rope_freqs(ids, cfg.axes_dim, cfg.theta)
    return img, txt, vec, pe


def _final(params, img, vec, qcfg):
    """Final adaLN + projection to velocity tokens."""
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype)
    mod = linear(v, params["final_layer.adaLN_modulation.1.weight"],
                 params.get("final_layer.adaLN_modulation.1.bias"), cfg=qcfg)
    shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
    img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
    return linear(img, params["final_layer.linear.weight"],
                  params.get("final_layer.linear.bias"), cfg=qcfg)


def forward(params, cfg: FluxConfig, img: jax.Array, img_ids: jax.Array,
            txt: jax.Array, txt_ids: jax.Array, timesteps: jax.Array,
            y: jax.Array, guidance: jax.Array | None = None,
            qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """Patchified latent tokens → predicted flow velocity tokens.

    img: (B, L_img, in_channels); txt: (B, L_txt, context_dim);
    *_ids: (B, L, 3) RoPE position ids; y: (B, vec_dim) pooled CLIP.
    """
    img, txt, vec, pe = _prelude(params, cfg, img, img_ids, txt, txt_ids,
                                 timesteps, y, guidance, qcfg)

    for i in range(cfg.depth_double):
        img, txt = _double_block(block_subtree(params, f"double_blocks.{i}."),
                                 img, txt, vec, pe, cfg, qcfg)

    x = jnp.concatenate([txt, img], axis=1)
    for i in range(cfg.depth_single):
        x = _single_block(block_subtree(params, f"single_blocks.{i}."),
                          x, vec, pe, cfg, qcfg)
    img = x[:, txt.shape[1]:]
    return _final(params, img, vec, qcfg)


# ---------------------------------------------------------------------------
# stacked-params forward (lax.scan over block depth)
#
# The python-loop forward above traces every block separately — fine at
# tiny depth, but a full flux (19+38 blocks) would unroll into a huge HLO.
# TPU-idiomatic execution stacks the per-block params along a leading axis
# (PlanarQuant leaves stack like any pytree) and runs ONE traced block per
# kind under lax.scan: compile time stays O(1) in depth, the Pallas qmm
# kernels compile once per shape, and the same stacked layout feeds the
# pipeline-parallel trunk (parallel/pp.py).
# ---------------------------------------------------------------------------

def stack_flux_params(params: dict, cfg: FluxConfig) -> dict:
    """Flat GGUF-keyed params → {non-block keys, "double_blocks": stacked
    subtree (leading dim depth_double), "single_blocks": stacked subtree}.

    Stacking concatenates the per-block HBM buffers once at load time.
    """
    return stack_block_groups(params,
                              [("double_blocks", cfg.depth_double),
                               ("single_blocks", cfg.depth_single)],
                              arch="flux")


def scan_blocks(block_tree: dict, body, carry, length: int):
    """lax.scan over stacked block params WITHOUT slicing the packed
    weights: quantized leaves stay whole (scan constants) and blocks see
    them as ``IndexedQuant`` handles carrying the induction variable —
    the Pallas kernel gathers tiles via scalar prefetch. Dense leaves
    (biases, norm scales — tiny) ride the normal scan-xs slicing.

    Round-2 profile motivation: scan-sliced packed weights forced a
    slice+copy of every block's bytes before each custom call (~1.1 s of
    a 690 ms-compute forward); this removes it. body(carry, params_dict)
    → carry."""
    import dataclasses as _dc

    from ..lora import PatchedWeight
    from ..quant.i8 import I8Planar
    from ..quant.planar import IndexedQuant, PlanarQuant, TPShard

    if length == 0:
        # lax.scan TRACES the body even at length 0; an empty group
        # (e.g. sd3.5-medium when every non-last block is dual) must be
        # a no-op, not a KeyError inside the traced body
        return carry

    packed_types = (PlanarQuant, I8Planar)
    quant, patched, tp_packed, dense = {}, {}, {}, {}
    for k, v in block_tree.items():
        if isinstance(v, packed_types):
            quant[k] = v
        elif (isinstance(v, PatchedWeight)
              and isinstance(v.base, packed_types)):
            patched[k] = v  # packed base stays whole; LoRA factors (tiny)
        elif isinstance(v, TPShard) and isinstance(v.inner, packed_types):
            tp_packed[k] = v  # per-shard packed stack stays whole too
        else:
            dense[k] = v
    xs_patches = {k: v.patches for k, v in patched.items()}

    def step(c, xs):
        i, dsl, psl = xs
        p = dict(dsl)
        for k, v in quant.items():
            p[k] = IndexedQuant(v, i)
        for k, v in patched.items():
            p[k] = PatchedWeight(IndexedQuant(v.base, i), psl[k])
        for k, v in tp_packed.items():
            p[k] = _dc.replace(v, inner=IndexedQuant(v.inner, i))
        return body(c, p), None

    carry, _ = jax.lax.scan(step, carry,
                            (jnp.arange(length), dense, xs_patches))
    return carry


def forward_stacked(sparams: dict, cfg: FluxConfig, img: jax.Array,
                    img_ids: jax.Array, txt: jax.Array, txt_ids: jax.Array,
                    timesteps: jax.Array, y: jax.Array,
                    guidance: jax.Array | None = None,
                    qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """forward() over stack_flux_params() output — identical math, one
    lax.scan per block kind instead of an unrolled python loop."""
    img, txt, vec, pe = _prelude(sparams, cfg, img, img_ids, txt, txt_ids,
                                 timesteps, y, guidance, qcfg)

    def dbody(carry, bp):
        i, t = carry
        return _double_block(bp, i, t, vec, pe, cfg, qcfg)

    img, txt = scan_blocks(sparams["double_blocks"], dbody, (img, txt),
                           cfg.depth_double)

    x = jnp.concatenate([txt, img], axis=1)

    def sbody(x, bp):
        return _single_block(bp, x, vec, pe, cfg, qcfg)

    x = scan_blocks(sparams["single_blocks"], sbody, x, cfg.depth_single)
    img = x[:, txt.shape[1]:]
    return _final(sparams, img, vec, qcfg)


# ---------------------------------------------------------------------------
# latent patchify helpers (2×2)
# ---------------------------------------------------------------------------

def patchify(latent: jax.Array) -> jax.Array:
    """(B, H, W, C) latent → (B, H/2*W/2, C*4) tokens."""
    B, H, W, C = latent.shape
    x = latent.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(B, (H // 2) * (W // 2),
                                                 C * 4)


def unpatchify(tokens: jax.Array, h: int, w: int) -> jax.Array:
    """(B, h/2*w/2, C*4) tokens → (B, h, w, C) latent."""
    B, L, D = tokens.shape
    C = D // 4
    x = tokens.reshape(B, h // 2, w // 2, C, 2, 2)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(B, h, w, C)
