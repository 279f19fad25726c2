"""LoRA patch pipeline: load, map keys, attach to packed weights, apply at
matmul time.

The reference defers LoRA application to dequant time — patches are stored
on the packed ``GGMLTensor`` (reference nodes.py:37-47) and
``comfy.lora.calculate_weight`` rewrites the dequantized fp weight every
forward (reference ops.py:166-191). The TPU-native equivalent keeps the
weight packed and applies the patch as a *rank-factored epilogue on the
output*:

    y = x @ (W + s·B·A)ᵀ  =  qmm(x, W_packed) + s·((x @ Aᵀ) @ Bᵀ)

which is the same linear map at O(r·(K+R)) extra FLOPs instead of a dense
O(K·R) weight rewrite, and — unlike the reference — never materializes the
patched weight. Full-rank patch types (diff) fold into a dense delta added
the same way. ``patch_dtype`` mirrors the reference's loader knob
(reference nodes.py:179-191).
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


@partial(jax.tree_util.register_dataclass,
         data_fields=["up", "down", "mid", "diff", "a1", "a2"],
         meta_fields=["scale"])
@dataclasses.dataclass(frozen=True)
class LoRAPatch:
    """One additive patch: ΔW = scale · up @ (mid @)? down, or dense diff.

    GLoRA additionally carries a weight-dependent term
    ΔW += scale · W @ a2 @ a1, applied as an *input-side* rank rewrite
    (see apply_patch_prologue) so the packed base weight is reused —
    never dequantized."""

    up: jax.Array | None  # (R, r)
    down: jax.Array | None  # (r, K)
    mid: jax.Array | None  # (r, r) LoCon mid block, rarely present
    diff: jax.Array | None  # dense (R, K) delta (patch type "diff")
    scale: float
    a1: jax.Array | None = None  # glora (r, K)
    a2: jax.Array | None = None  # glora (K, r)


@partial(jax.tree_util.register_dataclass,
         data_fields=["base", "patches"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class PatchedWeight:
    """A weight leaf (dense array or PlanarQuant) + pending LoRA patches."""

    base: object
    patches: tuple[LoRAPatch, ...]


def apply_patch_prologue(x: jax.Array, patches: tuple[LoRAPatch, ...],
                         patch_dtype=None) -> jax.Array:
    """GLoRA input rewrite: x' = x + Σ scale · (x @ a1ᵀ) @ a2ᵀ.

    Running x' through the base weight yields exactly the
    scale·W@a2@a1 term of the glora delta (x·(W a2 a1)ᵀ =
    ((x a1ᵀ) a2ᵀ)·Wᵀ) at O(r·K) instead of a dense weight rewrite."""
    dt = patch_dtype or x.dtype
    x0 = x  # every patch rewrites the ORIGINAL input: stacked GLoRAs
    # must sum independent deltas (W + Σ sᵢ·W·Aᵢ), not compound
    # sequentially (which adds sᵢ·sⱼ cross-terms the folded
    # materialize() path does not have)
    for p in patches:
        if p.a1 is None:
            continue
        h = jnp.dot(x0.astype(dt), p.a1.astype(dt).T,
                    preferred_element_type=jnp.float32).astype(dt)
        h = jnp.dot(h, p.a2.astype(dt).T,
                    preferred_element_type=jnp.float32)
        x = x + (p.scale * h).astype(x.dtype)
    return x


def rank_factorize(x: jax.Array, patches: tuple[LoRAPatch, ...],
                   patch_dtype=None):
    """Reduce a patch list to ONE (h, upᵀ) pair for the fused kernel
    epilogue: Σ scale·x@ΔWᵀ = h @ upᵀ with h = [x@downᵀ(@midᵀ)?…] the
    column-concatenated rank intermediates and upᵀ the scale-folded up
    factors. Returns None when any patch needs the dense path (diff /
    loha / lokr deltas) — callers fall back to apply_patch_epilogue.

    glora patches participate with their b-branch only (the weight-
    dependent a-branch rides apply_patch_prologue on the kernel INPUT,
    so the combination stays exact)."""
    dt = patch_dtype or x.dtype
    hs, ups = [], []
    for p in patches:
        if p.diff is not None:
            return None
        if p.up is None:
            continue  # prologue-only glora: nothing for the epilogue
        h = jnp.dot(x.astype(dt), p.down.astype(dt).T,
                    preferred_element_type=jnp.float32).astype(dt)
        if p.mid is not None:
            h = jnp.dot(h, p.mid.astype(dt).T,
                        preferred_element_type=jnp.float32).astype(dt)
        hs.append(h)
        ups.append((p.scale * p.up.astype(jnp.float32)).astype(dt).T)
    if not hs:
        return None
    return (jnp.concatenate(hs, axis=-1) if len(hs) > 1 else hs[0],
            jnp.concatenate(ups, axis=0) if len(ups) > 1 else ups[0])


def apply_patch_epilogue(x: jax.Array, out: jax.Array,
                         patches: tuple[LoRAPatch, ...],
                         patch_dtype=None) -> jax.Array:
    """out += Σ scale · x @ ΔWᵀ, rank-factored when possible.

    Multiple plain rank patches on one weight batch into ONE concatenated
    rank-Σr matmul pair (scales folded into the up factor) — N stacked
    LoRAs cost one epilogue, and the wider rank dim fills MXU lanes a
    lone rank-16 factor leaves idle (BASELINE config 5 round-2 item)."""
    dt = patch_dtype or x.dtype
    acc = out
    plain = [p for p in patches
             if p.diff is None and p.up is not None and p.mid is None]
    if len(plain) > 1:
        down_cat = jnp.concatenate([p.down.astype(dt) for p in plain],
                                   axis=0)
        up_cat = jnp.concatenate(
            [(p.scale * p.up.astype(jnp.float32)).astype(dt)
             for p in plain], axis=1)
        h = jnp.dot(x.astype(dt), down_cat.T,
                    preferred_element_type=jnp.float32).astype(dt)
        acc = acc + jnp.dot(h, up_cat.T).astype(acc.dtype)
        plain_ids = {id(p) for p in plain}
        patches = tuple(p for p in patches if id(p) not in plain_ids)
    for p in patches:
        if p.diff is None and p.up is None:
            continue  # prologue-only patch (glora without a b-branch)
        if p.diff is not None:
            delta = jnp.dot(x.astype(dt), p.diff.astype(dt).T,
                            preferred_element_type=jnp.float32)
        else:
            # rank-r intermediates stay fp32 (they're tiny: M×r), but the
            # (M, R) delta is emitted in the patch dtype — at bf16 that
            # halves the dominant HBM cost of the epilogue (the delta
            # write + re-read for the add), and LoRA deltas are small
            # relative to the base output so the rounding is negligible
            h = jnp.dot(x.astype(dt), p.down.astype(dt).T,
                        preferred_element_type=jnp.float32).astype(dt)
            if p.mid is not None:
                h = jnp.dot(h, p.mid.astype(dt).T,
                            preferred_element_type=jnp.float32).astype(dt)
            delta = jnp.dot((p.scale * h.astype(jnp.float32)).astype(dt),
                            p.up.astype(dt).T)
            acc = acc + delta.astype(acc.dtype)
            continue
        acc = acc + (p.scale * delta).astype(acc.dtype)
    return acc


# ---------------------------------------------------------------------------
# LoRA file loading + key mapping
# ---------------------------------------------------------------------------

def load_lora_safetensors(path: str) -> dict[str, np.ndarray]:
    import torch
    from safetensors.torch import load_file

    return {
        k: (v.float().numpy() if v.dtype in (torch.bfloat16, torch.float16)
            else v.numpy())
        for k, v in load_file(path).items()
    }


_PREFIXES = ("lora_unet_", "lora_transformer_", "lora_te_", "")
_SUFFIX_SETS = (
    # kohya: lora_up/lora_down/alpha
    (".lora_up.weight", ".lora_down.weight", ".alpha"),
    # PEFT/diffusers: lora_B/lora_A
    (".lora_B.weight", ".lora_A.weight", ".alpha"),
    (".lora.up.weight", ".lora.down.weight", ".alpha"),
)

# loha (hadamard) / lokr (kronecker) component suffixes → slot names
_EXTRA_SUFFIXES = {
    ".diff": "diff",
    ".lora_mid.weight": "mid",
    ".hada_w1_a": "hada_w1_a", ".hada_w1_b": "hada_w1_b",
    ".hada_w2_a": "hada_w2_a", ".hada_w2_b": "hada_w2_b",
    ".lokr_w1": "lokr_w1", ".lokr_w2": "lokr_w2",
    ".lokr_w1_a": "lokr_w1_a", ".lokr_w1_b": "lokr_w1_b",
    ".lokr_w2_a": "lokr_w2_a", ".lokr_w2_b": "lokr_w2_b",
    ".a1.weight": "glora_a1", ".a2.weight": "glora_a2",
    ".b1.weight": "glora_b1", ".b2.weight": "glora_b2",
}


def group_lora_keys(lora_sd: dict[str, np.ndarray]):
    """Group raw LoRA keys → {base_name: {slot: array}} (lora/locon, diff,
    loha, lokr component slots)."""
    groups: dict[str, dict[str, np.ndarray]] = {}
    for k, v in lora_sd.items():
        for up_s, down_s, alpha_s in _SUFFIX_SETS:
            if k.endswith(up_s):
                groups.setdefault(k[: -len(up_s)], {})["up"] = v
                break
            if k.endswith(down_s):
                groups.setdefault(k[: -len(down_s)], {})["down"] = v
                break
            if k.endswith(alpha_s):
                groups.setdefault(k[: -len(alpha_s)], {})["alpha"] = v
                break
        else:
            for suf, slot in _EXTRA_SUFFIXES.items():
                if k.endswith(suf):
                    groups.setdefault(k[: -len(suf)], {})[slot] = v
                    break
    return groups


def _loha_delta(parts, strength: float) -> tuple[np.ndarray, float]:
    """LoHa: ΔW = (w1a·w1b) ⊙ (w2a·w2b), scale = strength·alpha/rank."""
    w1 = np.asarray(parts["hada_w1_a"], np.float32) @ np.asarray(
        parts["hada_w1_b"], np.float32)
    w2 = np.asarray(parts["hada_w2_a"], np.float32) @ np.asarray(
        parts["hada_w2_b"], np.float32)
    rank = np.asarray(parts["hada_w1_b"]).shape[0]
    alpha = float(np.asarray(parts.get("alpha", rank)))
    return w1 * w2, strength * alpha / rank


def _lokr_delta(parts, strength: float) -> tuple[np.ndarray, float]:
    """LoKr: ΔW = kron(w1, w2); factored components recomposed first."""
    if "lokr_w1" in parts:
        w1 = np.asarray(parts["lokr_w1"], np.float32)
        rank = None
    else:
        a = np.asarray(parts["lokr_w1_a"], np.float32)
        b = np.asarray(parts["lokr_w1_b"], np.float32)
        w1 = a @ b
        rank = a.shape[1]
    if "lokr_w2" in parts:
        w2 = np.asarray(parts["lokr_w2"], np.float32)
    else:
        a = np.asarray(parts["lokr_w2_a"], np.float32)
        b = np.asarray(parts["lokr_w2_b"], np.float32)
        w2 = a @ b
        rank = rank or a.shape[1]
    if w2.ndim > 2:
        w2 = w2.reshape(w2.shape[0], -1)
    alpha = float(np.asarray(parts.get("alpha", rank or 1)))
    scale = strength * (alpha / rank if rank else 1.0)
    return np.kron(w1, w2), scale


def map_lora_to_model_keys(groups: dict, model_keys) -> dict:
    """Resolve LoRA base names to model weight keys.

    Handles kohya underscore-mangled names (``lora_unet_double_blocks_0_…``)
    by matching against underscore-collapsed model keys, plus plain and
    ``transformer.``-prefixed dotted names.
    """
    by_mangled: dict[str, str] = {}
    for mk in model_keys:
        if not mk.endswith(".weight"):
            continue
        stem = mk[: -len(".weight")]
        by_mangled[stem.replace(".", "_")] = mk
        by_mangled[stem] = mk

    mapped = {}
    unmatched = []
    for base, parts in groups.items():
        cand = base
        for pfx in _PREFIXES:
            if base.startswith(pfx):
                cand = base[len(pfx):]
                break
        if cand.startswith("transformer."):
            cand = cand[len("transformer."):]
        mk = by_mangled.get(cand) or by_mangled.get(cand.replace(".", "_"))
        if mk is None:
            unmatched.append(base)
            continue
        mapped[mk] = parts
    if unmatched:
        log.warning("LoRA: %d unmatched keys (e.g. %s)", len(unmatched),
                    unmatched[:3])
    return mapped


def build_patches(mapped: dict, strength: float = 1.0,
                  dtype=jnp.bfloat16) -> dict[str, tuple[LoRAPatch, ...]]:
    """→ {model_key: (LoRAPatch, ...)}; scale = strength · alpha / rank."""
    out: dict[str, tuple[LoRAPatch, ...]] = {}
    for mk, parts in mapped.items():
        if "diff" in parts:
            patch = LoRAPatch(up=None, down=None, mid=None,
                              diff=jnp.asarray(parts["diff"], dtype),
                              scale=float(strength))
        elif "hada_w1_a" in parts:
            delta, scale = _loha_delta(parts, strength)
            patch = LoRAPatch(up=None, down=None, mid=None,
                              diff=jnp.asarray(delta, dtype), scale=scale)
        elif "lokr_w1" in parts or "lokr_w1_a" in parts:
            delta, scale = _lokr_delta(parts, strength)
            patch = LoRAPatch(up=None, down=None, mid=None,
                              diff=jnp.asarray(delta, dtype), scale=scale)
        elif "glora_a1" in parts:
            # GLoRA, OLD layout: ΔW = s·(b2@b1 + W@a2@a1) with a1:(r,K),
            # a2:(K,r), b1:(r,K), b2:(R,r). The NEW layout transposes
            # every factor (a1:(K,r) …) and swaps the roles
            # (ΔW = s·(b1@b2 + W@a1@a2)) — detected by a1's orientation
            # (rank < K; a square a1 is ambiguous and treated as old,
            # matching the reference's shape-based detection) and
            # normalized to the old form by swapping the pairs.
            a1 = np.asarray(parts["glora_a1"], np.float32)
            if a1.shape[0] > a1.shape[1]:  # (K, r): new layout
                parts = dict(parts,
                             glora_a1=parts["glora_a2"],
                             glora_a2=parts["glora_a1"],
                             glora_b1=parts["glora_b2"],
                             glora_b2=parts["glora_b1"])
            b1 = np.asarray(parts["glora_b1"], np.float32)
            rank = b1.shape[0]
            alpha = float(np.asarray(parts.get("alpha", rank)))
            patch = LoRAPatch(
                up=jnp.asarray(parts["glora_b2"], dtype),
                down=jnp.asarray(b1, dtype), mid=None, diff=None,
                scale=float(strength) * alpha / rank,
                a1=jnp.asarray(parts["glora_a1"], dtype),
                a2=jnp.asarray(parts["glora_a2"], dtype),
            )
        elif "up" in parts and "down" in parts:
            up = np.asarray(parts["up"])
            down = np.asarray(parts["down"])
            rank = down.shape[0]
            alpha = float(np.asarray(parts.get("alpha", rank)))
            patch = LoRAPatch(
                up=jnp.asarray(up.reshape(up.shape[0], -1), dtype),
                down=jnp.asarray(down.reshape(down.shape[0], -1), dtype),
                mid=(jnp.asarray(parts["mid"], dtype)
                     if "mid" in parts else None),
                diff=None,
                scale=float(strength) * alpha / rank,
            )
        else:
            continue
        out[mk] = out.get(mk, ()) + (patch,)
    return out


# ---------------------------------------------------------------------------
# params-level attach / detach (role of reference GGUFModelPatcher,
# nodes.py:34-132)
# ---------------------------------------------------------------------------

def attach_patches(params: dict, patches: dict[str, tuple[LoRAPatch, ...]]
                   ) -> dict:
    """Non-destructively wrap patched weights; packed weights stay packed."""
    out = dict(params)
    for mk, plist in patches.items():
        if mk not in out:
            log.warning("LoRA patch for missing weight %s", mk)
            continue
        base = out[mk]
        if isinstance(base, PatchedWeight):
            out[mk] = PatchedWeight(base.base, base.patches + tuple(plist))
        else:
            out[mk] = PatchedWeight(base, tuple(plist))
    return out


def detach_patches(params: dict) -> dict:
    """Drop all patches (reference unpatch_model, nodes.py:68-77)."""
    return {
        k: (v.base if isinstance(v, PatchedWeight) else v)
        for k, v in params.items()
    }


def load_and_attach(params: dict, path: str, strength: float = 1.0,
                    dtype=jnp.bfloat16) -> dict:
    """Convenience: safetensors file → patched params."""
    sd = load_lora_safetensors(path)
    groups = group_lora_keys(sd)
    mapped = map_lora_to_model_keys(groups, params.keys())
    patches = build_patches(mapped, strength=strength, dtype=dtype)
    return attach_patches(params, patches)


def load_and_attach_te(params: dict, path: str, strength: float = 1.0,
                       dtype=jnp.bfloat16,
                       prefixes: tuple[str, ...] = ("te", "te1")) -> dict:
    """Attach the TEXT-ENCODER slice of a LoRA file to encoder params.

    kohya files patch encoders under ``lora_te_…`` (SD1 single encoder)
    / ``lora_te1_…``/``lora_te2_…`` (SDXL CLIP-L/CLIP-G) bases with the
    same underscore-mangled HF names our encoder params use
    (``text_model.encoder.layers.N.self_attn.q_proj``). The diffusion
    slice (``lora_unet_…``) is ignored here; ``prefixes`` picks which
    encoder slice this params tree receives. Returns the patched tree
    (packed/dense leaves get the standard rank epilogue)."""
    sd = load_lora_safetensors(path)
    groups = group_lora_keys(sd)
    sel = {}
    for base, parts in groups.items():
        for p in prefixes:
            pfx = f"lora_{p}_"
            if base.startswith(pfx):
                sel[base[len(pfx):]] = parts
                break
    if not sel:
        log.info("LoRA %s carries no lora_{%s}_ text-encoder keys", path,
                 "|".join(prefixes))
        return params
    mapped = map_lora_to_model_keys(sel, params.keys())
    patches = build_patches(mapped, strength=strength, dtype=dtype)
    return attach_patches(params, patches)
