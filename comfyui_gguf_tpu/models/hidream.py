"""HiDream-I1 DiT (arch "hidream" in the reference allowlist).

MMDiT with mixture-of-experts FFNs. Grounded key facts from the reference:
detection fingerprint ``double_stream_blocks.0.block.ff_i.shared_experts
.w3.weight`` (reference tools/convert.py:52-57), fp32-forced
``.ff_i.gate.weight`` router (keys_hiprec, tools/convert.py:58-62), and
quantizer exclusions p/t/x embedders + caption_projection + final_layer
(tools/lcpp.patch:399-407).

Block layout follows the published HiDream-I1 design: per-block
``adaLN_modulation`` whose chunk count is read from the weight shape
(12 chunks = 6 per stream on double blocks, 6 on single blocks), image
attention ``attn1.to_q/k/v/out`` with text-side ``*_t`` twins and RMS
qk-norms, MoE FFN = shared expert + routed experts with softmax top-k
gating (all experts computed densely and mask-weighted — jit-friendly at
small expert counts).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import QuantConfig, DEFAULT_CONFIG, layer_norm, linear, rms_norm
from .flux import timestep_embedding


@dataclasses.dataclass(frozen=True)
class HiDreamConfig:
    hidden: int
    n_heads: int
    depth_double: int
    depth_single: int
    n_experts: int
    top_k: int = 2
    patch_size: int = 2
    in_channels: int = 16
    # flux-style 3-axis rope over (frame, row, col) ids; HiDream-I1 uses
    # head_dim 128 split (64, 32, 32), theta 10000 (pe_embedder EmbedND)
    axes_dim: tuple = (64, 32, 32)
    theta: int = 10_000

    @staticmethod
    def from_state_dict(sd) -> "HiDreamConfig":
        def shape(k):
            v = sd[k]
            return v.shape if hasattr(v, "shape") else np.asarray(v).shape

        qn = shape("double_stream_blocks.0.block.attn1.q_rms_norm.weight")[0]
        hidden = shape("double_stream_blocks.0.block.attn1.to_q.weight")[0]
        nd = 0
        while f"double_stream_blocks.{nd}.block.attn1.to_q.weight" in sd:
            nd += 1
        ns = 0
        while f"single_stream_blocks.{ns}.block.attn1.to_q.weight" in sd:
            ns += 1
        ne = 0
        base = "double_stream_blocks.0.block.ff_i.experts"
        while f"{base}.{ne}.w1.weight" in sd:
            ne += 1
        hd = int(qn)
        return HiDreamConfig(
            hidden=int(hidden), n_heads=int(hidden) // hd,
            depth_double=nd, depth_single=ns, n_experts=ne,
            # (hd/2, hd/4, hd/4) — HiDream-I1's (64, 32, 32) at hd=128
            axes_dim=(hd // 2, hd // 4, hd // 4),
        )


def _heads(x, n):
    B, L, D = x.shape
    return x.reshape(B, L, n, D // n).transpose(0, 2, 1, 3)


def _swiglu(params, p, x, qcfg):
    a = linear(x, params[f"{p}.w1.weight"], cfg=qcfg)
    b = linear(x, params[f"{p}.w3.weight"], cfg=qcfg)
    h = jax.nn.silu(a.astype(jnp.float32)).astype(a.dtype) * b
    return linear(h, params[f"{p}.w2.weight"], cfg=qcfg)


MOE_DISPATCH = "dense"  # "dense" (exact) | "capacity" (top-k) | "ep"
MOE_CAPACITY_FACTOR = 1.5
# "ep" mode: experts sharded one-per-device over this mesh (parallel/ep.py);
# requires stack_moe_experts() to have rewritten the params first
EP_MESH = None
EP_AXIS = "ep"


def stack_moe_experts(params: dict, n_experts: int) -> dict:
    """Rewrite flat per-expert keys ``{p}.experts.{e}.w{1,2,3}.weight``
    into stacked trees ``{p}.experts_stacked`` = {"w1": (E, ...), ...}
    (PlanarQuant leaves stack like any pytree) — the layout
    parallel/ep.py shards one-expert-per-device. Originals are dropped."""
    import jax

    prefixes = sorted({k.split(".experts.")[0] for k in params
                       if ".experts." in k})
    out = {k: v for k, v in params.items() if ".experts." not in k}
    for p in prefixes:
        stacked = {}
        for w in ("w1", "w2", "w3"):
            per = [params[f"{p}.experts.{e}.{w}.weight"]
                   for e in range(n_experts)]
            stacked[w] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *per)
        out[f"{p}.experts_stacked"] = stacked
    return out


def _swiglu_w(w: dict, x, qcfg):
    a = linear(x, w["w1"], cfg=qcfg)
    b = linear(x, w["w3"], cfg=qcfg)
    h = jax.nn.silu(a.astype(jnp.float32)).astype(a.dtype) * b
    return linear(h, w["w2"], cfg=qcfg)


# HiDream's MoEGate (DeepSeek lineage) keeps the GLOBAL softmax scores
# of the top-k experts UN-renormalized (norm_topk_prob=False): weights
# for 4-expert top-2 routing sum to < 1. Renormalizing (softmax over the
# masked logits) scaled every routed-FFN output by 1/Σtopk and
# compounded across all 48 blocks. Flip for models that renormalize.
MOE_RENORM_PROBS = False


def _routing_probs(params, p, x, n_experts, top_k, qcfg):
    logits = linear(x, params[f"{p}.gate.weight"], cfg=qcfg)
    logits = logits.astype(jnp.float32)
    k = min(top_k, n_experts)
    top_vals, _ = jax.lax.top_k(logits, k)
    thresh = top_vals[..., -1:]
    if MOE_RENORM_PROBS:
        masked = jnp.where(logits >= thresh, logits, -jnp.inf)
        return jax.nn.softmax(masked, axis=-1).astype(x.dtype), k
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(logits >= thresh, probs, 0.0)
    return probs.astype(x.dtype), k


def moe_ffn(params, p, x, n_experts, top_k, qcfg):
    """shared expert + softmax-top-k routed experts.

    dense mode computes every expert on every token and mask-weights —
    exact and jit-trivial, costs E/k× the optimal FFN FLOPs. capacity
    mode (MOE_DISPATCH="capacity") gathers each expert's routed tokens up
    to a static capacity C = cf·T·k/E and computes only those: identical
    output whenever no expert overflows C (guaranteed-ish at cf≥1.5 for
    image token counts; overflowing tokens lose that expert's
    contribution, the standard Switch/GShard drop semantics)."""
    out = _swiglu(params, f"{p}.shared_experts", x, qcfg)
    if n_experts == 0:
        return out
    probs, k = _routing_probs(params, p, x, n_experts, top_k, qcfg)

    stacked = params.get(f"{p}.experts_stacked")
    if (stacked is not None and MOE_DISPATCH == "ep"
            and EP_MESH is not None):
        # one expert per device, psum combine — exact vs dense
        # (masked probs are zero off the top-k)
        from ..parallel.ep import ep_moe_inline

        return out + ep_moe_inline(
            lambda w, xx: _swiglu_w(w, xx, qcfg), stacked, x, probs,
            EP_MESH, EP_AXIS)

    def expert(e, xx):
        """Expert e's FFN — stacked-leaf slice or flat per-expert keys."""
        if stacked is not None:
            we = jax.tree_util.tree_map(lambda a: a[e], stacked)
            return _swiglu_w(we, xx, qcfg)
        return _swiglu(params, f"{p}.experts.{e}", xx, qcfg)

    if MOE_DISPATCH != "capacity":
        for e in range(n_experts):
            out = out + probs[..., e: e + 1] * expert(e, x)
        return out

    B, L, D = x.shape
    T = B * L
    C = -(-int(MOE_CAPACITY_FACTOR * T * k) // n_experts)
    C = min(-(-C // 8) * 8, T)  # sublane-align, never above T
    x2 = x.reshape(T, D)
    p2 = probs.reshape(T, n_experts)
    acc = jnp.zeros((T, D), jnp.float32)
    for e in range(n_experts):
        routed = p2[:, e] > 0
        # routed tokens first (stable order), truncated at capacity
        idx = jnp.argsort(~routed, stable=True)[:C]
        xe = x2[idx]
        ye = expert(e, xe)
        w = (p2[idx, e] * routed[idx].astype(p2.dtype))[:, None]
        acc = acc.at[idx].add((ye * w).astype(jnp.float32))
    return out + acc.reshape(B, L, D).astype(out.dtype)


def _adaln(params, p, vec, qcfg, dim):
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(vec.dtype)
    mod = linear(v, params[f"{p}.adaLN_modulation.1.weight"],
                 params.get(f"{p}.adaLN_modulation.1.bias"), cfg=qcfg)
    n = mod.shape[-1] // dim
    return jnp.split(mod[:, None, :], n, axis=-1)


def _attn_joint(params, p, img_mod, txt_mod, H, qcfg, pe=None):
    hd_split = lambda z: _heads(z, H)
    iq = hd_split(linear(img_mod, params[f"{p}.attn1.to_q.weight"],
                         params.get(f"{p}.attn1.to_q.bias"), cfg=qcfg))
    ik = hd_split(linear(img_mod, params[f"{p}.attn1.to_k.weight"],
                         params.get(f"{p}.attn1.to_k.bias"), cfg=qcfg))
    iv = hd_split(linear(img_mod, params[f"{p}.attn1.to_v.weight"],
                         params.get(f"{p}.attn1.to_v.bias"), cfg=qcfg))
    iq = rms_norm(iq, params[f"{p}.attn1.q_rms_norm.weight"], eps=1e-6)
    ik = rms_norm(ik, params[f"{p}.attn1.k_rms_norm.weight"], eps=1e-6)
    if txt_mod is not None:
        tq = hd_split(linear(txt_mod, params[f"{p}.attn1.to_q_t.weight"],
                             params.get(f"{p}.attn1.to_q_t.bias"), cfg=qcfg))
        tk = hd_split(linear(txt_mod, params[f"{p}.attn1.to_k_t.weight"],
                             params.get(f"{p}.attn1.to_k_t.bias"), cfg=qcfg))
        tv = hd_split(linear(txt_mod, params[f"{p}.attn1.to_v_t.weight"],
                             params.get(f"{p}.attn1.to_v_t.bias"), cfg=qcfg))
        tq = rms_norm(tq, params[f"{p}.attn1.q_rms_norm_t.weight"], eps=1e-6)
        tk = rms_norm(tk, params[f"{p}.attn1.k_rms_norm_t.weight"], eps=1e-6)
        q = jnp.concatenate([iq, tq], axis=2)
        k = jnp.concatenate([ik, tk], axis=2)
        v = jnp.concatenate([iv, tv], axis=2)
    else:
        q, k, v = iq, ik, iv
    if pe is not None:
        from .flux import apply_rope

        q = apply_rope(q, pe)
        k = apply_rope(k, pe)
    from ..nn.attention import dot_product_attention

    a = dot_product_attention(q, k, v)
    B, Hn, L, D = a.shape
    return a.transpose(0, 2, 1, 3).reshape(B, L, Hn * D)


def _double_block(params, p, img, txt, vec, cfg: HiDreamConfig, qcfg,
                  pe=None):
    H = cfg.n_heads
    chunks = _adaln(params, p, vec, qcfg, cfg.hidden)
    (i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2,
     t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2) = chunks[:12]

    img_mod = layer_norm(img, eps=1e-6) * (1 + i_sc1) + i_sh1
    txt_mod = layer_norm(txt, eps=1e-6) * (1 + t_sc1) + t_sh1
    a = _attn_joint(params, p, img_mod, txt_mod, H, qcfg, pe=pe)
    L_img = img.shape[1]
    img_a, txt_a = a[:, :L_img], a[:, L_img:]
    img = img + i_g1 * linear(img_a, params[f"{p}.attn1.to_out.weight"],
                              params.get(f"{p}.attn1.to_out.bias"), cfg=qcfg)
    txt = txt + t_g1 * linear(txt_a, params[f"{p}.attn1.to_out_t.weight"],
                              params.get(f"{p}.attn1.to_out_t.bias"),
                              cfg=qcfg)

    h = layer_norm(img, eps=1e-6) * (1 + i_sc2) + i_sh2
    img = img + i_g2 * moe_ffn(params, f"{p}.ff_i", h, cfg.n_experts,
                               cfg.top_k, qcfg)
    h = layer_norm(txt, eps=1e-6) * (1 + t_sc2) + t_sh2
    txt = txt + t_g2 * _swiglu(params, f"{p}.ff_t", h, qcfg)
    return img, txt


def _single_block(params, p, x, vec, cfg: HiDreamConfig, qcfg, pe=None):
    H = cfg.n_heads
    sh1, sc1, g1, sh2, sc2, g2 = _adaln(params, p, vec, qcfg, cfg.hidden)[:6]
    h = layer_norm(x, eps=1e-6) * (1 + sc1) + sh1
    a = _attn_joint(params, p, h, None, H, qcfg, pe=pe)
    x = x + g1 * linear(a, params[f"{p}.attn1.to_out.weight"],
                        params.get(f"{p}.attn1.to_out.bias"), cfg=qcfg)
    h = layer_norm(x, eps=1e-6) * (1 + sc2) + sh2
    return x + g2 * moe_ffn(params, f"{p}.ff_i", h, cfg.n_experts,
                            cfg.top_k, qcfg)


def _prelude(params, cfg: HiDreamConfig, latent, t5_states, llama_states,
             pooled, timesteps, qcfg):
    B, Hh, Ww, C = latent.shape
    p = cfg.patch_size
    h_tok, w_tok = Hh // p, Ww // p

    xp = latent.reshape(B, h_tok, p, w_tok, p, C).transpose(0, 1, 3, 5, 2, 4)
    xp = xp.reshape(B, h_tok * w_tok, C * p * p)
    img = linear(xp, params["x_embedder.proj.weight"],
                 params.get("x_embedder.proj.bias"), cfg=qcfg)

    t = timestep_embedding(timesteps, 256).astype(img.dtype)
    vec = linear(t, params["t_embedder.mlp.0.weight"],
                 params.get("t_embedder.mlp.0.bias"), cfg=qcfg)
    vec = jax.nn.silu(vec.astype(jnp.float32)).astype(img.dtype)
    vec = linear(vec, params["t_embedder.mlp.2.weight"],
                 params.get("t_embedder.mlp.2.bias"), cfg=qcfg)
    pv = linear(pooled.astype(img.dtype),
                params["p_embedder.mlp.0.weight"],
                params.get("p_embedder.mlp.0.bias"), cfg=qcfg)
    pv = jax.nn.silu(pv.astype(jnp.float32)).astype(img.dtype)
    vec = vec + linear(pv, params["p_embedder.mlp.2.weight"],
                       params.get("p_embedder.mlp.2.bias"), cfg=qcfg)

    # caption projections, published HiDream-I1 ordering: projections
    # 0..N-2 take the llama layer taps, the LAST projection takes the T5
    # states, concatenated [llama taps…, t5] (the earlier 0→t5 layout
    # crossed the trained weights between streams)
    n_proj = 0
    while f"caption_projection.{n_proj}.linear.weight" in params:
        n_proj += 1
    parts = []
    for i in range(n_proj - 1):
        parts.append(linear(
            llama_states, params[f"caption_projection.{i}.linear.weight"],
            params.get(f"caption_projection.{i}.linear.bias"), cfg=qcfg))
    last = n_proj - 1
    parts.append(linear(
        t5_states, params[f"caption_projection.{last}.linear.weight"],
        params.get(f"caption_projection.{last}.linear.bias"), cfg=qcfg))
    txt = jnp.concatenate(parts, axis=1)

    # flux-style rope ids over the [img, txt] sequence: image tokens get
    # (0, row, col), text tokens all-zero ids (identity rotation)
    from .flux import rope_freqs

    ids = np.zeros((1, h_tok * w_tok + txt.shape[1], 3), np.int32)
    ids[0, : h_tok * w_tok, 1] = np.repeat(np.arange(h_tok), w_tok)
    ids[0, : h_tok * w_tok, 2] = np.tile(np.arange(w_tok), h_tok)
    pe = rope_freqs(jnp.asarray(ids), cfg.axes_dim, cfg.theta)
    return img, txt, vec, pe, (B, Hh, Ww, C, h_tok, w_tok)


def _finale(params, cfg: HiDreamConfig, img, vec, dims, qcfg):
    B, Hh, Ww, C, h_tok, w_tok = dims
    p = cfg.patch_size
    v = jax.nn.silu(vec.astype(jnp.float32)).astype(img.dtype)
    mod = linear(v, params["final_layer.adaLN_modulation.1.weight"],
                 params.get("final_layer.adaLN_modulation.1.bias"), cfg=qcfg)
    shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
    img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
    img = linear(img, params["final_layer.linear.weight"],
                 params.get("final_layer.linear.bias"), cfg=qcfg)
    img = img.reshape(B, h_tok, w_tok, p, p, C)
    return img.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hh, Ww, C)


def forward(params, cfg: HiDreamConfig, latent: jax.Array,
            t5_states: jax.Array, llama_states: jax.Array,
            pooled: jax.Array, timesteps: jax.Array,
            qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """latent (B, H, W, C) NHWC; t5/llama states (B, L, D_enc);
    pooled (B, D_pool)."""
    img, txt, vec, pe, dims = _prelude(params, cfg, latent, t5_states,
                                       llama_states, pooled, timesteps,
                                       qcfg)
    L_img = img.shape[1]
    for i in range(cfg.depth_double):
        img, txt = _double_block(params,
                                 f"double_stream_blocks.{i}.block",
                                 img, txt, vec, cfg, qcfg, pe=pe)
    x = jnp.concatenate([img, txt], axis=1)
    for i in range(cfg.depth_single):
        x = _single_block(params, f"single_stream_blocks.{i}.block",
                          x, vec, cfg, qcfg, pe=pe)
    return _finale(params, cfg, x[:, :L_img], vec, dims, qcfg)


def stack_hidream_params(params: dict, cfg: HiDreamConfig) -> dict:
    """Flat GGUF-keyed params → {non-block keys, "double_stream_blocks":
    stacked subtree, "single_stream_blocks": stacked subtree} for the
    scanned forward. Per-expert MoE weights are leaf-stacked first
    (stack_moe_experts), so under the depth stack each experts_stacked
    leaf carries (depth, E, …) and the dense dispatch slices experts
    statically inside the scan."""
    from .flux import stack_block_groups

    if any(".experts." in k for k in params):
        params = stack_moe_experts(params, cfg.n_experts)
    return stack_block_groups(params,
                              [("double_stream_blocks", cfg.depth_double),
                               ("single_stream_blocks", cfg.depth_single)],
                              arch="hidream")


def forward_stacked(sparams: dict, cfg: HiDreamConfig, latent: jax.Array,
                    t5_states: jax.Array, llama_states: jax.Array,
                    pooled: jax.Array, timesteps: jax.Array,
                    qcfg: QuantConfig = DEFAULT_CONFIG) -> jax.Array:
    """forward() over stack_hidream_params() output — identical math,
    one lax.scan per block kind (zero-copy packed weights via
    IndexedQuant scalar prefetch, flux.scan_blocks). MoE runs the
    dense/capacity dispatch; MOE_DISPATCH="ep" (shard_map inside scan)
    should use the unrolled forward."""
    from .flux import scan_blocks

    img, txt, vec, pe, dims = _prelude(sparams, cfg, latent, t5_states,
                                       llama_states, pooled, timesteps,
                                       qcfg)
    L_img = img.shape[1]

    def dbody(carry, bp):
        i, t = carry
        return _double_block(bp, "block", i, t, vec, cfg, qcfg, pe=pe)

    img, txt = scan_blocks(sparams["double_stream_blocks"], dbody,
                           (img, txt), cfg.depth_double)
    x = jnp.concatenate([img, txt], axis=1)

    def sbody(x, bp):
        return _single_block(bp, "block", x, vec, cfg, qcfg, pe=pe)

    x = scan_blocks(sparams["single_stream_blocks"], sbody, x,
                    cfg.depth_single)
    return _finale(sparams, cfg, x[:, :L_img], vec, dims, qcfg)
