"""User-facing model loading + generation API.

Role of the reference's node layer (reference nodes.py:149-321:
``UnetLoaderGGUF``/``UnetLoaderGGUFAdvanced``, ``CLIPLoaderGGUF`` and the
Dual/Triple/Quadruple variants, ``GGUFModelPatcher``) — re-shaped as a
library API since there is no ComfyUI graph executor here:

* ``load_diffusion_model(path, …)`` — GGUF → arch-dispatched model bundle
  with packed planar weights on device; ``dequant_dtype``/``patch_dtype``
  knobs mirror the Advanced loader (reference nodes.py:179-191).
* ``load_text_encoders(paths, …)`` — 1-4 text encoder files, gguf or
  safetensors mixed (reference nodes.py:193-312), each dispatched to the
  right encoder graph + tokenizer.
* ``DiffusionModel.apply_lora / unapply_loras`` — patch lifecycle (role of
  GGUFModelPatcher.load/unpatch_model, reference nodes.py:37-77).
* ``FluxPipeline.generate`` — full txt2img: tokenize → encode → denoise
  (one jitted lax.scan) → VAE decode.
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from . import lora as lora_mod
from .loader import gguf_clip_loader, gguf_sd_loader, to_jax_params
from .models import clip as clip_model
from .models import flux as flux_model
from .models import llama as llama_model
from .models import sd3 as sd3_model
from .models import t5 as t5_model
from .models import vae as vae_model
from .nn.layers import QuantConfig
from .sampling import (euler_sample, flux_schedule, linear_schedule,
                       sample_flow, shift_sigmas)

log = logging.getLogger(__name__)

_DTYPE_NAMES = {
    "default": None, "target": None,
    "float32": jnp.float32, "float16": jnp.float16, "bfloat16": jnp.bfloat16,
}


def _resolve_qcfg(dequant_dtype="default", patch_dtype="default",
                  prefer_pallas=None) -> QuantConfig:
    """Map the reference's Advanced-loader string knobs
    (reference nodes.py:179-191) onto a QuantConfig."""
    dd = _DTYPE_NAMES.get(dequant_dtype, dequant_dtype) or jnp.bfloat16
    pd = _DTYPE_NAMES.get(patch_dtype, patch_dtype)
    return QuantConfig(dequant_dtype=dd, patch_dtype=pd,
                       prefer_pallas=prefer_pallas)


def _arch_module(arch: str):
    import importlib

    entry = _ARCH_TABLE.get(arch)
    if entry is None:
        return None
    return importlib.import_module(f".models.{entry[0]}", __package__)


# ONE table per arch: (module name, config class) — split dicts drifted
_ARCH_TABLE = {
    "flux": ("flux", "FluxConfig"), "sd3": ("sd3", "SD3Config"),
    "sd1": ("unet", "UNetConfig"), "sdxl": ("unet", "UNetConfig"),
    "aura": ("aura", "AuraConfig"),
    "hidream": ("hidream", "HiDreamConfig"),
    "cosmos": ("cosmos", "CosmosConfig"), "ltxv": ("ltxv", "LTXVConfig"),
    "hyvid": ("hyvid", "HyVidConfig"), "wan": ("wan", "WanConfig"),
    "lumina2": ("lumina2", "Lumina2Config"),
    "qwen_image": ("qwen_image", "QwenImageConfig"),
}


@dataclasses.dataclass
class DiffusionModel:
    """Loaded DiT + config; the GGUFModelPatcher analogue."""

    arch: str
    params: dict
    config: object
    qcfg: QuantConfig
    base_params: dict | None = None  # pre-LoRA snapshot

    # depth-stacked tree marker per arch (DiffusionModel.stack layout)
    _STACK_MARKERS = {
        "flux": "double_blocks", "sd3": "joint_blocks",
        "qwen_image": "transformer_blocks", "wan": "blocks",
        "hyvid": "double_blocks", "ltxv": "transformer_blocks",
        "cosmos": "blocks", "aura": "double_layers", "lumina2": "layers",
        "hidream": "double_stream_blocks",
    }

    @property
    def is_stacked(self) -> bool:
        m = self._STACK_MARKERS.get(self.arch)
        return m is not None and m in self.params

    def forward(self, *args, **kwargs):
        mod = _arch_module(self.arch)
        if mod is None:
            raise NotImplementedError(
                f"forward graph for arch {self.arch!r} not implemented yet"
            )
        # stacked trees (stack()) route to the scanned forward — the flat
        # forward would KeyError on the restacked layout
        fn = (mod.forward_stacked
              if self.is_stacked and hasattr(mod, "forward_stacked")
              else mod.forward)
        return fn(self.params, self.config, *args,
                  qcfg=self.qcfg, **kwargs)

    def apply_lora(self, path: str, strength: float = 1.0):
        """Attach a LoRA; packed weights stay packed (patch-on-output).

        Attach BEFORE ``stack()``: the kohya key mapping targets the flat
        per-block names; attached rank patches then ride the depth stack
        (the LoRA-over-scan path)."""
        if self.is_stacked:
            raise ValueError(
                "apply_lora on a depth-stacked tree matches no keys; "
                "attach LoRAs before DiffusionModel.stack()")
        if self.base_params is None:
            self.base_params = self.params
        self.params = lora_mod.load_and_attach(
            self.params, path, strength=strength,
            dtype=self.qcfg.effective_patch_dtype or jnp.bfloat16)
        return self

    def unapply_loras(self):
        """Reference unpatch_model semantics (nodes.py:68-77)."""
        self.params = lora_mod.detach_patches(self.params)
        self.base_params = None

    def requantize_i8(self, *, mod_planar: bool = True,
                      free_source: bool = True,
                      max_bytes: int | None = None,
                      host_stage: bool | None = None) -> "DiffusionModel":
        """Convert packed planar weights to the w8a8 integer-MXU format
        (quant/i8.py): the MXU runs s8xs8->s32 at ~2x its bf16 rate, and
        DiT denoise is compute-bound at serving shapes — measured ~2x
        per-matmul and see BASELINE.md for the whole-model step. Costs
        ~1% end-to-end accuracy (8-bit dynamic activations) and ~8 bpw
        HBM instead of ~4.5.

        mod_planar: keep adaLN/modulation projections (M=batch rows,
        BW-bound) on the planar bf16 path. free_source: drop the planar
        leaves as they convert (both trees don't fit HBM at full depth);
        the converted model can no longer be un-converted — reload to go
        back. Call AFTER apply_lora/stack (patched bases convert too,
        patches keep riding the kernel epilogue).

        Mutates self and returns it (apply_lora convention) — with
        free_source the old tree is destroyed, so handing back a new
        object while self silently kept deleted buffers would be a trap.
        """
        from .quant.i8 import convert_tree_i8, is_modulation_key

        pred = (lambda k, v: not is_modulation_key(k)) if mod_planar \
            else None
        if host_stage is None:
            # budget-constrained conversions are exactly the ones whose
            # on-device transient (tree + largest int8 leaf) OOMs — the
            # host-staged path caps the device peak at the final
            # footprint for them (quant.i8.requantize_i8_host)
            host_stage = max_bytes is not None
        self.params = convert_tree_i8(self.params,
                                      free_source=free_source, pred=pred,
                                      max_bytes=max_bytes,
                                      host_stage=host_stage)
        self.base_params = None
        return self

    def stack(self) -> "DiffusionModel":
        """Flux / SD3: restack per-block params along a depth axis so
        forwards run the O(1)-compile scanned zero-copy path
        (models/flux.py forward_stacked, models/sd3.py forward_stacked;
        flux_engine and SD3Pipeline auto-detect).

        NOTE: stacking copies the packed leaves — transiently ~2× model
        HBM. Prefer stacking right after load, before anything else
        occupies the chip. SD3.5-medium's dual-attention blocks form a
        contiguous prefix in the published checkpoints and stack as
        their own scan group; only a (hypothetical) non-contiguous dual
        layout stays unstacked."""
        if self.arch == "flux" and "double_blocks" not in self.params:
            from .models import flux as flux_model

            return dataclasses.replace(
                self, params=flux_model.stack_flux_params(self.params,
                                                          self.config))
        _dual = (self.config.dual_attn_layers
                 if self.arch == "sd3" else ())
        if self.arch == "sd3" and "joint_blocks" not in self.params \
                and _dual == tuple(range(len(_dual))):
            from .models import sd3 as sd3_model

            return dataclasses.replace(
                self, params=sd3_model.stack_sd3_params(self.params,
                                                        self.config))
        if self.arch == "qwen_image" \
                and "transformer_blocks" not in self.params:
            from .models import qwen_image as qi_model

            return dataclasses.replace(
                self, params=qi_model.stack_qwen_params(self.params,
                                                        self.config))
        if self.arch == "wan" and "blocks" not in self.params:
            from .models import wan as wan_model

            return dataclasses.replace(
                self, params=wan_model.stack_wan_params(self.params,
                                                        self.config))
        if self.arch == "hyvid" and "double_blocks" not in self.params:
            from .models import hyvid as hyvid_model

            return dataclasses.replace(
                self, params=hyvid_model.stack_hyvid_params(self.params,
                                                            self.config))
        if self.arch == "ltxv" and "transformer_blocks" not in self.params:
            from .models import ltxv as ltxv_model

            return dataclasses.replace(
                self, params=ltxv_model.stack_ltxv_params(self.params,
                                                          self.config))
        if self.arch == "cosmos" and "blocks" not in self.params:
            from .models import cosmos as cosmos_model

            return dataclasses.replace(
                self, params=cosmos_model.stack_cosmos_params(self.params,
                                                              self.config))
        if self.arch == "aura" and "double_layers" not in self.params:
            from .models import aura as aura_model

            return dataclasses.replace(
                self, params=aura_model.stack_aura_params(self.params,
                                                          self.config))
        if self.arch == "lumina2" and "layers" not in self.params:
            from .models import lumina2 as lumina2_model

            return dataclasses.replace(
                self, params=lumina2_model.stack_lumina2_params(self.params,
                                                                self.config))
        if (self.arch == "hidream"
                and "double_stream_blocks" not in self.params):
            from .models import hidream as hidream_model

            return dataclasses.replace(
                self, params=hidream_model.stack_hidream_params(
                    self.params, self.config))
        return self

    def memory_report(self) -> dict:
        """Packed-vs-dense HBM accounting (observability.memory_report)."""
        from .observability import memory_report

        return memory_report(self.params)


def load_diffusion_model(path: str, dequant_dtype="default",
                         patch_dtype="default",
                         prefer_pallas=None) -> DiffusionModel:
    """GGUF diffusion model → DiffusionModel (role of
    UnetLoaderGGUF.load_unet, reference nodes.py:149-177)."""
    from .compile_cache import enable_from_env

    enable_from_env()  # GGUF_TPU_COMPILE_CACHE: reuse full-depth compiles
    qcfg = _resolve_qcfg(dequant_dtype, patch_dtype, prefer_pallas)
    sd, arch = gguf_sd_loader(path, return_arch=True)
    params = to_jax_params(sd, qcfg)
    mod = _arch_module(arch)
    config = None
    if mod is not None:
        cls = getattr(mod, _ARCH_TABLE[arch][1])
        config = cls.from_state_dict(params)
    return DiffusionModel(arch=arch, params=params, config=config, qcfg=qcfg)


@dataclasses.dataclass
class TextEncoder:
    kind: str  # "t5" | "clip_l" | "clip_g" | "llama"
    params: dict
    config: object
    tokenizer: object | None
    qcfg: QuantConfig

    def encode(self, *args, **kwargs):
        mod = {"t5": t5_model, "clip_l": clip_model, "clip_g": clip_model,
               "llama": llama_model}[self.kind]
        return mod.encode(self.params, self.config, *args, qcfg=self.qcfg,
                          **kwargs)

    def apply_lora(self, path: str, strength: float = 1.0):
        """Attach this encoder's slice of a LoRA file (kohya ``lora_te_``
        for SD1 CLIP, ``lora_te1_``/``lora_te2_`` for the SDXL pair; the
        ``lora_unet_`` slice goes to DiffusionModel.apply_lora)."""
        prefixes = {"clip_l": ("te1", "te"), "clip_g": ("te2",),
                    "t5": ("te3", "te"), "llama": ("te", "llama")}[self.kind]
        self.params = lora_mod.load_and_attach_te(
            self.params, path, strength=strength,
            dtype=self.qcfg.effective_patch_dtype or jnp.bfloat16,
            prefixes=prefixes)
        return self

    def unapply_loras(self):
        self.params = lora_mod.detach_patches(self.params)
        return self

    def requantize_i8(self, *, free_source: bool = True) -> "TextEncoder":
        """w8a8 conversion for the encoder stack (see
        DiffusionModel.requantize_i8). Worth it for batched/long-prompt
        encoding (M = tokens is MXU-viable); single short prompts are
        latency-dominated either way. Mutates self and returns it."""
        from .quant.i8 import convert_tree_i8

        self.params = convert_tree_i8(self.params,
                                      free_source=free_source)
        return self


def _load_safetensors_sd(path: str) -> dict:
    import torch
    from safetensors.torch import load_file

    return {
        k: (v.float().numpy() if v.dtype in (torch.bfloat16, torch.float16)
            else v.numpy())
        for k, v in load_file(path).items()
    }


def load_vae(path: str):
    """Load any supported VAE and detect its family from the keys.

    → (kind, params, config): kind ∈ {"image", "wan", "hyvid", "ltxv"};
    decode with models.vae / models.wan_vae / models.hyvid_vae /
    models.ltxv_vae respectively. Strips a leading ``vae.`` /
    ``first_stage_model.`` prefix (checkpoint-bundled VAEs use it)."""
    raw = _load_safetensors_sd(path)
    for pfx in ("vae.", "first_stage_model."):
        if any(k.startswith(pfx) for k in raw):
            raw = {k[len(pfx):]: v for k, v in raw.items()
                   if k.startswith(pfx)}
            break
    params = {k: jnp.asarray(v) for k, v in raw.items()}
    if any(k.startswith("decoder.middle.") for k in params):
        from .models import wan_vae

        return "wan", params, wan_vae.WanVAEConfig.from_state_dict(params)
    from .models import ltxv_vae

    if ltxv_vae.detect_ltxv_vae(params.keys()):
        return ("ltxv", params,
                ltxv_vae.LTXVVAEConfig.from_state_dict(params))
    if any(k.startswith("decoder.mid_block.") for k in params):
        # "decoder.mid_block." is the generic diffusers prefix — ordinary
        # diffusers-format IMAGE VAEs carry it too. HyVid's causal convs
        # are 5-D (O, I, kt, kh, kw); a 4-D conv means an image VAE in
        # diffusers naming, which the sgm-format decoder can't load
        w = next((v for k, v in params.items()
                  if k.startswith("decoder.mid_block.")
                  and k.endswith("conv.weight")
                  or k.startswith("decoder.conv_in")), None)
        ndim = len(getattr(w, "shape", ())) if w is not None else 0
        if ndim == 5:
            from .models import hyvid_vae

            return ("hyvid", params,
                    hyvid_vae.HyVidVAEConfig.from_state_dict(params))
        raise ValueError(
            "diffusers-format image VAE (4-D convs under "
            "decoder.mid_block.*) — convert to the sgm key format "
            "(first_stage_model decoder.mid.*) or load the sgm export")
    return "image", params, vae_model.VAEConfig.from_state_dict(params)


def load_text_encoder(path: str, prefer_pallas=None) -> TextEncoder:
    """One text-encoder file (gguf or safetensors) → TextEncoder
    (role of CLIPLoaderGGUF.load_data/load_clip, reference nodes.py:216-251).
    """
    qcfg = _resolve_qcfg(prefer_pallas=prefer_pallas)
    tokenizer = None
    if path.endswith(".gguf"):
        sd, arch, tok_spec = gguf_clip_loader(path)
        params = to_jax_params(sd, qcfg)
        if tok_spec is not None:
            from .tokenizer import build_tokenizer

            try:
                tokenizer = build_tokenizer(tok_spec)
            except NotImplementedError:
                log.warning("no native tokenizer for %s", tok_spec.model)
        if arch in ("t5", "t5encoder"):
            return TextEncoder("t5", params,
                               t5_model.T5Config.from_state_dict(params),
                               tokenizer, qcfg)
        if arch in ("llama", "qwen2vl", "qwen3", "qwen3vl"):
            return TextEncoder(
                "llama", params,
                llama_model.LlamaConfig.from_state_dict(params),
                tokenizer, qcfg)
        raise ValueError(f"unsupported text arch {arch!r}")

    raw = _load_safetensors_sd(path)
    if any(k.startswith("transformer.resblocks.") for k in raw):
        raw = clip_model.remap_open_clip(raw)
    scaled_fp8 = [k for k in raw if "scaled_fp8" in k]
    if scaled_fp8:
        # reference rejects mixing scaled-FP8 encoders (nodes.py:223-224)
        raise ValueError("scaled_fp8 text encoders are not supported here")
    if "text_model.embeddings.token_embedding.weight" in raw:
        params = {k: jnp.asarray(v) for k, v in raw.items()}
        cfg = clip_model.CLIPTextConfig.from_state_dict(params)
        kind = "clip_g" if cfg.hidden >= 1280 else "clip_l"
        # safetensors CLIPs carry no tokenizer; pick up HF-style
        # vocab.json + merges.txt sitting next to the weights
        import os as _os

        d = _os.path.dirname(_os.path.abspath(path))
        vj, mt = _os.path.join(d, "vocab.json"), _os.path.join(d,
                                                               "merges.txt")
        if _os.path.exists(vj) and _os.path.exists(mt):
            from .tokenizer.clip_bpe import CLIPBPETokenizer

            tokenizer = CLIPBPETokenizer.from_files(vj, mt)
        return TextEncoder(kind, params, cfg, tokenizer, qcfg)
    if any(k.startswith("encoder.block.") for k in raw):
        params = {k: jnp.asarray(v) for k, v in raw.items()}
        return TextEncoder("t5", params,
                           t5_model.T5Config.from_state_dict(params), None,
                           qcfg)
    raise ValueError(f"unrecognized text encoder format: {path}")


def qwen_vl_encode_with_image(llama_enc: TextEncoder,
                              vision_params: dict,
                              ids: np.ndarray,
                              image: np.ndarray,
                              image_pad_token_id: int,
                              mask: np.ndarray | None = None):
    """Image-conditioned Qwen-VL encoding (the reference's mmproj flow,
    reference loader.py mmproj merge): run the vision tower, splice its
    merged embeddings over the ``<|image_pad|>`` placeholder tokens in
    ``ids``, and encode with the LLM via ``inputs_embeds``.

    ids must contain EXACTLY as many image_pad tokens as the tower emits
    for ``image`` ((H/14/m)·(W/14/m) with merge m). Host-side splice keeps
    the jitted encoder graph static.
    """
    from .models import qwen_vl_vision as vision
    from .nn.layers import embedding as embed_lookup

    vcfg = vision.QwenVLVisionConfig.from_state_dict(vision_params)
    pe = vision_params["visual.patch_embed.proj.weight"]
    pe_shape = pe.shape if hasattr(pe, "shape") else np.asarray(pe).shape
    patches = vision.extract_patches(np.asarray(image, np.float32),
                                     patch=int(pe_shape[-1]),
                                     temporal=int(pe_shape[2]))
    vis = vision.forward(vision_params, vcfg, jnp.asarray(patches),
                         qcfg=llama_enc.qcfg)  # (n_img_tokens, D)

    ids = np.asarray(ids)
    tok = np.array(embed_lookup(
        jnp.asarray(ids), llama_enc.params["model.embed_tokens.weight"],
        cfg=llama_enc.qcfg), np.float32)  # np.array: writable copy
    visn = np.asarray(vis, np.float32)
    merge = getattr(vcfg, "merge", 2)
    gh = int(np.asarray(image, np.float32).shape[0]
             // int(pe_shape[-1]) // merge)
    gw = visn.shape[0] // max(gh, 1)
    # Qwen-VL M-RoPE position streams (HF get_rope_index): text tokens
    # advance all three streams together; vision tokens carry their
    # (t, h, w) GRID positions offset by the text position at the image,
    # and following text resumes from offset + max(grid dims)
    B, L = ids.shape
    pos3 = np.zeros((3, B, L), np.int64)
    for b in range(ids.shape[0]):
        pos = np.nonzero(ids[b] == image_pad_token_id)[0]
        if len(pos) != visn.shape[0]:
            raise ValueError(
                f"prompt has {len(pos)} image_pad tokens but the vision "
                f"tower produced {visn.shape[0]} embeddings")
        tok[b, pos] = visn
        st = 0
        i = 0
        while i < L:
            if ids[b, i] == image_pad_token_id:
                n = len(pos)
                grid = np.arange(n)
                pos3[0, b, i: i + n] = st  # t (single frame)
                pos3[1, b, i: i + n] = st + grid // gw
                pos3[2, b, i: i + n] = st + grid % gw
                st += max(1, gh, gw)
                i += n
            else:
                pos3[:, b, i] = st
                st += 1
                i += 1
    out = llama_enc.encode(jnp.asarray(ids),
                           None if mask is None else jnp.asarray(mask),
                           inputs_embeds=jnp.asarray(tok),
                           position_ids=jnp.asarray(pos3))
    return out


def load_text_encoders(*paths: str, prefer_pallas=None) -> dict[str, TextEncoder]:
    """1-4 encoder files → {kind: TextEncoder} (role of Dual/Triple/
    QuadrupleCLIPLoaderGGUF, reference nodes.py:253-312)."""
    out = {}
    for p in paths:
        enc = load_text_encoder(p, prefer_pallas=prefer_pallas)
        out[enc.kind] = enc
    return out


# ---------------------------------------------------------------------------
# txt2img pipelines
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FluxPipeline:
    model: DiffusionModel
    t5: TextEncoder
    clip_l: TextEncoder
    vae_params: dict | None = None
    vae_config: object | None = None

    @staticmethod
    def load(unet_path: str, t5_path: str, clip_l_path: str,
             vae_path: str | None = None, **kw) -> "FluxPipeline":
        model = load_diffusion_model(unet_path, **kw)
        encs = load_text_encoders(t5_path, clip_l_path)
        vp = vc = None
        if vae_path:
            vp = {k: jnp.asarray(v)
                  for k, v in _load_safetensors_sd(vae_path).items()}
            vc = vae_model.VAEConfig.from_state_dict(vp)
        return FluxPipeline(model, encs["t5"], encs["clip_l"], vp, vc)

    def generate(self, prompt: str, width: int = 1024, height: int = 1024,
                 steps: int = 20, guidance: float = 3.5, seed: int = 0,
                 max_t5_len: int = 512, shift: bool = True,
                 init_image: np.ndarray | None = None,
                 denoise: float = 1.0,
                 inpaint_mask: np.ndarray | None = None,
                 ref_images=None, ref_latents=None,
                 sampler: str | None = None) -> np.ndarray:
        """→ (H, W, 3) float image in [0, 1] (or latent if no VAE given).

        img2img: pass ``init_image`` (H, W, 3) in [0, 1] + ``denoise`` < 1 —
        the latent starts from the VAE-encoded image noised to
        σ = sigmas[first_step] and only the remaining steps run.

        inpainting: additionally pass ``inpaint_mask`` (H, W) in [0, 1]
        (1 = regenerate); the kept region is re-projected onto the noised
        source every step (sampling.euler_sample_inpaint).

        Kontext editing (flux-kontext checkpoints load as plain flux —
        reference arch allowlist): pass ``ref_images`` ((H, W, 3) in
        [0, 1], VAE-encoded here) and/or ``ref_latents`` ((H_lat, W_lat,
        C) spatial latents). References are patchified and appended to
        the image token stream with rope frame index 1, 2, …; the
        velocity over the reference span is discarded each step.
        """
        ids, mask = self.t5.tokenizer.encode_batch([prompt],
                                                   max_length=max_t5_len)
        txt = self.t5.encode(jnp.asarray(ids), jnp.asarray(mask))
        if self.clip_l.tokenizer is not None:
            clip_len = min(77, self.clip_l.config.max_positions)
            cids, _ = self.clip_l.tokenizer.encode_batch([prompt],
                                                         max_length=clip_len)
        else:
            raise ValueError("clip_l tokenizer unavailable; pass token ids")
        pooled = self.clip_l.encode(jnp.asarray(cids))["pooled"]

        h_lat, w_lat = height // 8, width // 8
        lat_c = self.model.config.in_channels // 4
        key = jax.random.key(seed)
        noise = jax.random.normal(key, (1, h_lat, w_lat, lat_c),
                                  jnp.bfloat16)
        img_tokens = flux_model.patchify(noise)
        sigmas = flux_schedule(steps, img_tokens.shape[1], shift=shift)

        z0_tokens = mask_tokens = None
        if init_image is not None:
            if self.vae_params is None:
                raise ValueError("img2img needs a VAE")
            first = int(round((1.0 - denoise) * steps))
            sigmas = sigmas[first:]
            img01 = jnp.asarray(init_image, jnp.float32)[None] * 2 - 1
            z0 = vae_model.encode_auto(self.vae_params, self.vae_config, img01)
            s0 = jnp.float32(sigmas[0])
            x = ((1 - s0) * z0.astype(jnp.float32)
                 + s0 * noise.astype(jnp.float32)).astype(jnp.bfloat16)
            if inpaint_mask is not None:
                m = jnp.asarray(inpaint_mask, jnp.float32)
                m = jax.image.resize(m, (h_lat, w_lat), method="nearest")
                m = jnp.broadcast_to(m[None, :, :, None], z0.shape)
                z0_tokens = flux_model.patchify(z0.astype(jnp.bfloat16))
                mask_tokens = flux_model.patchify(m)
        else:
            x = noise
        img_tokens = flux_model.patchify(x)
        img_ids = jnp.asarray(
            flux_model.make_img_ids(h_lat // 2, w_lat // 2, 1))

        def _as_list(v):
            if v is None:
                return []
            return [v] if not isinstance(v, (list, tuple)) else list(v)

        ref_images, ref_latents = _as_list(ref_images), _as_list(ref_latents)
        ref_tok = None
        if ref_images or ref_latents:
            refs = [jnp.asarray(r, jnp.float32) for r in ref_latents]
            for im in ref_images:
                if self.vae_params is None:
                    raise ValueError("ref_images need a VAE; pass "
                                     "ref_latents instead")
                z = vae_model.encode_auto(
                    self.vae_params, self.vae_config,
                    jnp.asarray(im, jnp.float32)[None] * 2 - 1)
                refs.append(z[0])
            toks, rids = [], [np.asarray(img_ids)]
            for ri, r in enumerate(refs, start=1):
                r = r[None] if r.ndim == 3 else r
                toks.append(flux_model.patchify(r).astype(jnp.bfloat16))
                rid = np.array(flux_model.make_img_ids(
                    r.shape[1] // 2, r.shape[2] // 2, 1))
                rid[:, :, 0] = ri
                rids.append(rid)
            ref_tok = jnp.concatenate(toks, axis=1)
            img_ids = jnp.asarray(np.concatenate(rids, axis=1))
        L = img_tokens.shape[1]
        txt_ids = jnp.zeros((1, txt.shape[1], 3), jnp.int32)
        g = jnp.full((1,), guidance, jnp.float32)

        model = self.model

        from .sampling import euler_sample_inpaint

        @jax.jit
        def denoise(params, x0, txt, pooled, *refargs):
            def velocity(xc, sigma):
                tt = jnp.full((xc.shape[0],), sigma, jnp.float32)
                xa = (xc if not refargs
                      else jnp.concatenate([xc, refargs[0]], axis=1))
                out = flux_model.forward(
                    params, model.config, xa, img_ids, txt, txt_ids, tt,
                    pooled, g, qcfg=model.qcfg)
                return out if not refargs else out[:, :L]
            if mask_tokens is not None:
                return euler_sample_inpaint(
                    velocity, x0, sigmas, z0_tokens, mask_tokens,
                    jax.random.fold_in(key, 1))
            return sample_flow(velocity, x0, sigmas, sampler=sampler)

        rargs = (ref_tok,) if ref_tok is not None else ()
        out_tokens = denoise(model.params, img_tokens, txt, pooled, *rargs)
        latent = flux_model.unpatchify(out_tokens, h_lat, w_lat)
        if self.vae_params is None:
            return np.asarray(latent[0])
        img = vae_model.decode_auto(self.vae_params, self.vae_config, latent)
        return np.asarray((jnp.clip(img[0], -1, 1) + 1) / 2)


def _jit_cfg_denoise(fwd, sigmas, cfg_scale, sampler=None, window=None):
    """Shared rectified-flow denoise scaffold for the CFG pipelines.

    ``fwd(params, xc, ts, cond)`` — the per-arch forward over ONE
    conditioning pytree. Returns a jitted ``denoise(params, x0, cond,
    *neg)``: with a negative cond it runs both forwards and mixes
    ``v_u + cfg_scale·(v_c − v_u)``; without, the plain conditional
    velocity. One definition of the CFG semantics instead of a copy per
    pipeline (the engines' analogue is _cfg_mix_velocity).

    ``window``: dispatch-window chunking — run the scan ``window`` steps
    per jitted dispatch with a host sync between windows, instead of all
    N steps in one dispatch. Identical math (the euler update carries
    only the latent), bounded dispatch length: a full Wan denoise is a
    multi-minute single dispatch that reproducibly wedges the TPU worker
    (BASELINE round-3/4 "long-dispatch fault") — windows keep every
    dispatch under the fault horizon. At most two program variants
    compile (window and the remainder).
    """
    sigmas = jnp.asarray(sigmas, jnp.float32)
    n_steps = int(sigmas.shape[0]) - 1
    # resolve the EFFECTIVE sampler now (sampler=None means the live
    # process default, sampling.flow_match.DEFAULT_FLOW_SAMPLER) and pin
    # it, so the window-safety check below and the traced execution
    # cannot disagree if the global changes later
    from .sampling import flow_match as _fm

    windowed = bool(window) and window < n_steps  # 0/None = one dispatch
    eff_sampler = sampler if not windowed \
        else (sampler or _fm.DEFAULT_FLOW_SAMPLER)

    @jax.jit
    def win(params, x0, sig, cond, *neg):
        def velocity(xc, sigma):
            ts = jnp.full((xc.shape[0],), sigma, jnp.float32)
            v_c = fwd(params, xc, ts, cond)
            if not neg:
                return v_c
            v_u = fwd(params, xc, ts, neg[0])
            return v_u + cfg_scale * (v_c - v_u)
        return sample_flow(velocity, x0, sig, sampler=eff_sampler)

    if not windowed:
        def denoise(params, x0, cond, *neg):
            return win(params, x0, sigmas, cond, *neg)
        return denoise

    if eff_sampler != "euler":
        raise ValueError(
            "dispatch-window chunking carries only the latent between "
            "windows; history-carrying samplers need window=None — "
            f"effective sampler is {eff_sampler!r} (explicit argument or "
            "the process-default flow sampler)")

    def denoise(params, x0, cond, *neg):
        x = x0
        for s in range(0, n_steps, window):
            k = min(window, n_steps - s)
            x = win(params, x, sigmas[s: s + k + 1], cond, *neg)
            x.block_until_ready()  # bound the in-flight dispatch
        return x

    return denoise


def _sig_expand(s, x):
    """(B,) sigma → broadcastable over x's trailing dims."""
    return jnp.asarray(s, jnp.float32).reshape(
        (x.shape[0],) + (1,) * (x.ndim - 1))


def _cfg_mix_velocity(fwd, model, ckey: str = "ctx", nkey: str = "nctx"):
    """Velocity closure for CFG-mixing engines: conditional +
    unconditional forwards, per-request scale mixed in f32."""
    def velocity(params, x, s_cur, cond):
        v_c = fwd(params, model.config, x, cond[ckey], s_cur,
                  qcfg=model.qcfg)
        v_u = fwd(params, model.config, x, cond[nkey], s_cur,
                  qcfg=model.qcfg)
        return v_u.astype(jnp.float32) + _sig_expand(
            cond["cfg_scale"], x) * (v_c.astype(jnp.float32)
                                     - v_u.astype(jnp.float32))
    return velocity


def make_flow_engine(model: DiffusionModel, velocity, cond_spec: dict, *,
                     max_batch: int = 4, pipeline_depth: int = 1,
                     sampler: str = "euler", dp_mesh=None,
                     params_provider=None):
    """Generic rectified-flow continuous-batching engine.

    ``velocity(params, x, s_cur, cond) -> v`` — the per-arch forward
    (CFG mixing, guidance embeds, rope ids all live in the closure);
    ``cond_spec`` maps each stacked cond key to its device dtype. Works
    for any latent rank (sigma broadcast follows ``x.ndim``).

    ``sampler``: "euler" (1st order) or "dpmpp_2m" — per-LANE 2nd-order
    multistep: each pooled request carries its own denoised history and
    previous sigma in device-resident aux state
    (serving.lane_dpmpp_2m_update), so mixed-progress/mixed-schedule
    batches integrate exactly at the same one-model-call-per-lane cost.

    ``dp_mesh``: a ``jax.sharding.Mesh`` with a ``"dp"`` axis runs every
    tick DATA-PARALLEL — params are replicated across the axis once and
    the pooled batch/cond/aux are sharded along axis 0, so GSPMD splits
    each step across devices with zero collectives in the forward (the
    step is embarrassingly parallel over lanes). Batch buckets snap to
    multiples of the dp size so every shard stays shape-static.

    ``params_provider``: optional zero-arg callable returning the
    device param tree to use for THIS tick — the multi-model residency
    hook (serving.ResidentModelServer): params are jit ARGUMENTS, so an
    evict/re-place cycle swaps buffers without any retrace or recompile.
    Mutually exclusive with ``dp_mesh`` (the dp path replicates a fixed
    tree up front).
    """
    from .serving import (ContinuousBatchEngine, flow_multistep_aux_init,
                          lane_dpmpp_2m_update)

    if params_provider is not None and dp_mesh is not None:
        raise ValueError("params_provider and dp_mesh are mutually "
                         "exclusive")
    get_params = params_provider or (lambda: model.params)

    batch_sizes = None
    shard_in = None
    if dp_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = dp_mesh.shape["dp"]
        if max_batch % dp:
            raise ValueError(f"max_batch {max_batch} not divisible by "
                             f"dp={dp}")
        batch_sizes = tuple(sorted(
            {dp * m for m in (1, 2, 4, 8, 16) if dp * m <= max_batch}
            | {max_batch}))  # max_batch itself is always a bucket
        batched = NamedSharding(dp_mesh, P("dp"))
        replicated = NamedSharding(dp_mesh, P())
        # replicate the (packed) weights across the dp axis once
        model = dataclasses.replace(
            model, params=jax.device_put(model.params, replicated))

        def shard_in(tree):
            return jax.tree.map(
                lambda a: jax.device_put(a, batched), tree)

    def _cast(cond):
        cond = {k: jnp.asarray(cond[k], dt) for k, dt in cond_spec.items()}
        return shard_in(cond) if shard_in is not None else cond

    def _place(x):
        return shard_in(x) if shard_in is not None else x

    if sampler == "euler":
        @jax.jit
        def _step(params, x, s_cur, s_next, cond):
            v = velocity(params, x, s_cur, cond)
            step = _sig_expand(s_next - s_cur, x) * v.astype(jnp.float32)
            return (x.astype(jnp.float32) + step).astype(x.dtype)

        def step_fn(x, s_cur, s_next, cond):
            return _step(get_params(),
                         _place(jnp.asarray(x, jnp.bfloat16)),
                         jnp.asarray(s_cur, jnp.float32),
                         jnp.asarray(s_next, jnp.float32), _cast(cond))

        return ContinuousBatchEngine(step_fn, max_batch=max_batch,
                                     batch_sizes=batch_sizes,
                                     pipeline_depth=pipeline_depth)

    if sampler != "dpmpp_2m":
        raise ValueError(f"sampler must be euler|dpmpp_2m, got {sampler!r}")

    @jax.jit
    def _step2m(params, x, s_cur, s_next, cond, aux):
        v = velocity(params, x, s_cur, cond)
        denoised = (x.astype(jnp.float32)
                    - _sig_expand(s_cur, x) * v.astype(jnp.float32))
        return lane_dpmpp_2m_update(x, denoised, s_cur, s_next, aux)

    def step_fn2m(x, s_cur, s_next, cond, aux):
        return _step2m(get_params(),
                       _place(jnp.asarray(x, jnp.bfloat16)),
                       jnp.asarray(s_cur, jnp.float32),
                       jnp.asarray(s_next, jnp.float32), _cast(cond),
                       _place(aux) if dp_mesh is not None else aux)

    return ContinuousBatchEngine(step_fn2m, max_batch=max_batch,
                                 batch_sizes=batch_sizes,
                                 pipeline_depth=pipeline_depth,
                                 aux_init=flow_multistep_aux_init)


def flux_engine(model: DiffusionModel, h_lat: int, w_lat: int,
                txt_len: int, max_batch: int = 4,
                pipeline_depth: int = 1, mesh=None,
                sampler: str = "euler",
                dp_mesh=None, params_provider=None):
    """Continuous-batching engine for a loaded flux model.

    ``sampler="dpmpp_2m"`` runs 2nd-order multistep per LANE (each
    pooled request carries its own denoised history + previous sigma in
    device-resident aux state) — same one model call per lane per tick
    as Euler, so ~30-40% fewer steps at equal quality for free.

    Requests carry latent tokens + cond {"txt", "y", "guidance"}; one
    engine tick advances the whole in-flight pool by one Euler step
    (serving.ContinuousBatchEngine). Shapes are fixed per engine (one
    resolution bucket), so jit compiles once per batch-size bucket.
    pipeline_depth > 1 chains that many ticks per host sync (JAX async
    dispatch) — pays the dispatch round trip once per window, which
    matters when the host link is slow (remote-chip tunnel).

    ``mesh``: a ``jax.sharding.Mesh`` with a ``"tp"`` axis runs every
    tick tensor-parallel (parallel.tp_flux shard_map forward, per-shard
    fused kernels); ``model.params`` must then be the TP-sharded tree
    from ``tp_flux.place_tp_params(tp_flux.shard_flux_params(...))``.
    """
    import functools

    from .serving import ContinuousBatchEngine

    img_ids = jnp.asarray(
        flux_model.make_img_ids(h_lat // 2, w_lat // 2, 1))[0]
    txt_ids = jnp.zeros((txt_len, 3), jnp.int32)

    # stacked param trees (flux_model.stack_flux_params layout) take the
    # scanned zero-copy forward — O(1)-in-depth compile for serving boots
    if mesh is not None:
        from .parallel import tp_flux

        fwd = functools.partial(tp_flux.tp_forward_stacked, mesh=mesh)
    else:
        fwd = (flux_model.forward_stacked
               if "double_blocks" in model.params else flux_model.forward)

    def velocity(params, x, s_cur, cond):
        B = x.shape[0]
        ids_i = jnp.broadcast_to(img_ids[None], (B, *img_ids.shape))
        ids_t = jnp.broadcast_to(txt_ids[None], (B, *txt_ids.shape))
        return fwd(params, model.config, x, ids_i, cond["txt"], ids_t,
                   s_cur, cond["y"], cond["guidance"], qcfg=model.qcfg)

    return make_flow_engine(
        model, velocity,
        {"txt": jnp.bfloat16, "y": jnp.bfloat16, "guidance": jnp.float32},
        max_batch=max_batch, pipeline_depth=pipeline_depth,
        sampler=sampler, dp_mesh=dp_mesh,
        params_provider=params_provider)


def qwen_image_engine(model: DiffusionModel, h_tok: int, w_tok: int,
                      txt_len: int, max_batch: int = 4,
                      pipeline_depth: int = 1, sampler: str = "euler",
                      dp_mesh=None, mesh=None):
    """Continuous-batching engine for a loaded Qwen-Image model.

    Requests carry patchified latent tokens (L_img, in_channels) + cond
    {"txt"}; flux-style 3-axis RoPE ids are engine-fixed (one resolution
    bucket per engine). Stacked param trees (DiffusionModel.stack) take
    the scanned zero-copy forward; same pipeline_depth dispatch-window
    semantics as flux_engine.

    ``mesh``: a ``jax.sharding.Mesh`` with a ``"tp"`` axis serves every
    tick tensor-parallel through the spec-driven sharding
    (parallel.tp_spec.tp_qwen_image_forward); ``model.params`` must then
    be the TP tree from ``tp_spec.shard_qwen_image_params`` placed with
    ``tp_spec.place_tp_params`` — the qwen_image-20B configuration (the
    model the single chip cannot hold int8)."""
    import functools

    from .models import qwen_image as qi_model
    from .serving import ContinuousBatchEngine

    img_ids = jnp.asarray(flux_model.make_img_ids(h_tok, w_tok, 1))[0]
    txt_ids = jnp.zeros((txt_len, 3), jnp.int32)
    if mesh is not None:
        from .parallel import tp_spec

        fwd = functools.partial(tp_spec.tp_qwen_image_forward, mesh=mesh)
    else:
        fwd = (qi_model.forward_stacked
               if "transformer_blocks" in model.params
               else qi_model.forward)

    def velocity(params, x, s_cur, cond):
        B = x.shape[0]
        ids_i = jnp.broadcast_to(img_ids[None], (B, *img_ids.shape))
        ids_t = jnp.broadcast_to(txt_ids[None], (B, *txt_ids.shape))
        return fwd(params, model.config, x, ids_i, cond["txt"], ids_t,
                   s_cur, qcfg=model.qcfg)

    return make_flow_engine(
        model, velocity, {"txt": jnp.bfloat16}, max_batch=max_batch,
        pipeline_depth=pipeline_depth, sampler=sampler, dp_mesh=dp_mesh)


def wan_engine(model: DiffusionModel, max_batch: int = 2,
               pipeline_depth: int = 1, sampler: str = "euler",
               dp_mesh=None, mesh=None):
    """Continuous-batching engine for a loaded Wan 2.1 t2v model — video
    serving: requests carry (F, H, W, C) latent video + cond {"ctx",
    "nctx", "cfg_scale"}; each tick runs the conditional AND
    unconditional forwards and applies per-request CFG mixing, so
    requests with different guidance scales pool into one batch
    (cfg_scale 1.0 degrades to the pure conditional velocity). Stacked
    param trees (DiffusionModel.stack) take the scanned zero-copy
    forward.

    ``mesh``: a ``jax.sharding.Mesh`` with a ``"tp"`` axis serves every
    tick tensor-parallel (parallel.tp_spec.tp_wan_forward);
    ``model.params`` must then be the tree from
    ``tp_spec.shard_wan_params`` placed with ``place_tp_params``."""
    import functools

    from .models import wan as wan_model
    from .serving import ContinuousBatchEngine

    if mesh is not None:
        from .parallel import tp_spec

        fwd = functools.partial(tp_spec.tp_wan_forward, mesh=mesh)
    else:
        fwd = (wan_model.forward_stacked if "blocks" in model.params
               else wan_model.forward)

    velocity = _cfg_mix_velocity(fwd, model)

    return make_flow_engine(
        model, velocity, {"ctx": jnp.bfloat16, "nctx": jnp.bfloat16,
                          "cfg_scale": jnp.float32},
        max_batch=max_batch, pipeline_depth=pipeline_depth,
        sampler=sampler, dp_mesh=dp_mesh)


def hyvid_engine(model: DiffusionModel, max_batch: int = 2,
                 pipeline_depth: int = 1, sampler: str = "euler",
                 dp_mesh=None, mesh=None):
    """Continuous-batching engine for a loaded HunyuanVideo model —
    guidance-distilled video serving: requests carry (F, H, W, C) latent
    video + cond {"txt", "guidance"}; one conditional forward per tick
    with per-request embedded-guidance scales (in units of 1.0, embedded
    ×1000 like HyVidPipeline). Stacked param trees (DiffusionModel.stack)
    take the scanned zero-copy forward.

    ``mesh``: serve tensor-parallel through
    parallel.tp_spec.tp_hyvid_forward (params from shard_hyvid_params +
    place_tp_params)."""
    import functools

    from .models import hyvid as hyvid_model
    from .serving import ContinuousBatchEngine

    if mesh is not None:
        from .parallel import tp_spec

        fwd = functools.partial(tp_spec.tp_hyvid_forward, mesh=mesh)
    else:
        fwd = (hyvid_model.forward_stacked
               if "double_blocks" in model.params
               else hyvid_model.forward)

    def velocity(params, x, s_cur, cond):
        return fwd(params, model.config, x, cond["txt"], s_cur,
                   cond["guidance"] * 1000.0, qcfg=model.qcfg)

    return make_flow_engine(
        model, velocity, {"txt": jnp.bfloat16, "guidance": jnp.float32},
        max_batch=max_batch, pipeline_depth=pipeline_depth,
        sampler=sampler, dp_mesh=dp_mesh)


def ltxv_engine(model: DiffusionModel, max_batch: int = 2,
                pipeline_depth: int = 1, sampler: str = "euler",
                dp_mesh=None):
    """Continuous-batching engine for a loaded LTX-Video model — token
    video serving: requests carry (L, in_channels) latent voxels + cond
    {"ids" (L, 3) voxel positions, "ctx", "nctx", "cfg_scale"}; each tick
    runs the conditional AND unconditional forwards and applies
    per-request CFG mixing (cfg_scale 1.0 degrades to the pure
    conditional velocity). Stacked param trees (DiffusionModel.stack)
    take the scanned zero-copy forward."""
    from .models import ltxv as ltxv_model
    from .serving import ContinuousBatchEngine

    fwd = (ltxv_model.forward_stacked
           if "transformer_blocks" in model.params else ltxv_model.forward)

    def velocity(params, x, s_cur, cond):
        v_c = fwd(params, model.config, x, cond["ids"], cond["ctx"],
                  s_cur, qcfg=model.qcfg)
        v_u = fwd(params, model.config, x, cond["ids"], cond["nctx"],
                  s_cur, qcfg=model.qcfg)
        return v_u.astype(jnp.float32) + _sig_expand(
            cond["cfg_scale"], x) * (v_c.astype(jnp.float32)
                                     - v_u.astype(jnp.float32))

    return make_flow_engine(
        model, velocity, {"ids": jnp.int32, "ctx": jnp.bfloat16,
                          "nctx": jnp.bfloat16, "cfg_scale": jnp.float32},
        max_batch=max_batch, pipeline_depth=pipeline_depth,
        sampler=sampler, dp_mesh=dp_mesh)


def unet_engine(model: DiffusionModel, max_batch: int = 4,
                pipeline_depth: int = 1, sampler: str = "euler"):
    """Continuous-batching engine for a loaded SD1/SDXL eps-prediction
    UNet: requests carry (H, W, C) sigma-scaled latents (x0 noise ×
    sigmas[0]) + cond {"ctx", "nctx", "cfg_scale"} (+ "adm" pooled/size
    vector for SDXL) and a k-diffusion sigma schedule (kd.normal_schedule
    / karras_schedule); each tick runs one per-request-sigma step in the
    standard k-diffusion parameterization (denoised = x − σ·eps(x·c_in,
    t(σ))) with per-request CFG mixing. ``sampler="dpmpp_2m"`` runs
    per-lane 2nd-order multistep on the denoised prediction
    (lane_dpmpp_2m_update is parameterization-agnostic). Mixed-progress
    batches are exact because σ and the multistep history are
    per-lane."""
    from .models import unet as unet_model
    from .sampling import kdiffusion as kd
    from .serving import (ContinuousBatchEngine, flow_multistep_aux_init,
                          lane_dpmpp_2m_update)

    if sampler not in ("euler", "dpmpp_2m"):
        raise ValueError(f"sampler must be euler|dpmpp_2m, got {sampler!r}")
    table = jnp.asarray(kd.ddpm_sigmas())
    needs_adm = model.config.adm_in_channels is not None
    use_2m = sampler == "dpmpp_2m"

    def _eps_cfg(params, x, s_cur, ctx, nctx, scale, adm):
        s = s_cur[:, None, None, None].astype(jnp.float32)
        c_in = 1.0 / jnp.sqrt(1.0 + s ** 2)
        t = kd.sigma_to_t(s_cur, table)
        xs = (x.astype(jnp.float32) * c_in).astype(x.dtype)
        y = adm[0] if adm else None
        e_c = unet_model.forward(params, model.config, xs, t, ctx, y,
                                 qcfg=model.qcfg).astype(jnp.float32)
        e_u = unet_model.forward(params, model.config, xs, t, nctx, y,
                                 qcfg=model.qcfg).astype(jnp.float32)
        return e_u + scale[:, None, None, None] * (e_c - e_u)

    @jax.jit
    def _step(params, x, s_cur, s_next, ctx, nctx, scale, *adm):
        eps = _eps_cfg(params, x, s_cur, ctx, nctx, scale, adm)
        # denoised = x − σ·eps;  d = (x − denoised)/σ = eps
        step = (s_next - s_cur)[:, None, None, None] * eps
        return (x.astype(jnp.float32) + step).astype(x.dtype)

    @jax.jit
    def _step2m(params, x, s_cur, s_next, ctx, nctx, scale, aux, *adm):
        eps = _eps_cfg(params, x, s_cur, ctx, nctx, scale, adm)
        denoised = (x.astype(jnp.float32)
                    - s_cur[:, None, None, None] * eps)
        return lane_dpmpp_2m_update(x, denoised, s_cur, s_next, aux)

    def step_fn(x, s_cur, s_next, cond, *aux):
        adm = ((jnp.asarray(cond["adm"], jnp.bfloat16),)
               if needs_adm else ())
        args = (model.params, jnp.asarray(x, jnp.bfloat16),
                jnp.asarray(s_cur, jnp.float32),
                jnp.asarray(s_next, jnp.float32),
                jnp.asarray(cond["ctx"], jnp.bfloat16),
                jnp.asarray(cond["nctx"], jnp.bfloat16),
                jnp.asarray(cond["cfg_scale"], jnp.float32))
        if use_2m:
            return _step2m(*args, aux[0], *adm)
        return _step(*args, *adm)

    return ContinuousBatchEngine(
        step_fn, max_batch=max_batch, pipeline_depth=pipeline_depth,
        aux_init=flow_multistep_aux_init if use_2m else None)


def hidream_engine(model: DiffusionModel, max_batch: int = 2,
                   pipeline_depth: int = 1, sampler: str = "euler",
                   dp_mesh=None, mesh=None):
    """Continuous-batching engine for a loaded HiDream-I1 MoE model:
    requests carry (H, W, C) spatial latents + cond {"t5", "llama",
    "pooled"} (quad-encoder states, guidance-distilled — one forward per
    tick). The MoE FFNs run in whatever dispatch mode the process has
    configured (dense / capacity / ep).

    ``mesh``: serve tensor-parallel through
    parallel.tp_spec.tp_hidream_forward (params from
    shard_hidream_params + place_tp_params) — the serving configuration
    that fits the FULL 17B int8 tree at tp=2 where one chip caps the
    conversion at ~20% of tree bytes."""
    import functools

    from .models import hidream as hidream_model
    from .serving import ContinuousBatchEngine

    if mesh is not None:
        from .parallel import tp_spec

        fwd = functools.partial(tp_spec.tp_hidream_forward, mesh=mesh)
    else:
        fwd = (hidream_model.forward_stacked
               if "double_stream_blocks" in model.params
               else hidream_model.forward)

    def velocity(params, x, s_cur, cond):
        return fwd(params, model.config, x, cond["t5"],
                   cond["llama"], cond["pooled"], s_cur, qcfg=model.qcfg)

    return make_flow_engine(
        model, velocity, {"t5": jnp.bfloat16, "llama": jnp.bfloat16,
                          "pooled": jnp.bfloat16},
        max_batch=max_batch, pipeline_depth=pipeline_depth,
        sampler=sampler, dp_mesh=dp_mesh)


def cosmos_engine(model: DiffusionModel, max_batch: int = 2,
                  pipeline_depth: int = 1, sampler: str = "euler",
                  dp_mesh=None):
    """Continuous-batching engine for a loaded Cosmos Predict2 model —
    t2i/t2v serving: requests carry (F, H, W, C) NDHWC latents + cond
    {"ctx", "nctx", "cfg_scale"} (T5 states); each tick runs the
    conditional AND unconditional forwards and applies per-request CFG
    mixing. Stacked param trees (DiffusionModel.stack) take the scanned
    zero-copy forward."""
    from .models import cosmos as cosmos_model
    from .serving import ContinuousBatchEngine

    fwd = (cosmos_model.forward_stacked
           if "blocks" in model.params else cosmos_model.forward)

    velocity = _cfg_mix_velocity(fwd, model)

    return make_flow_engine(
        model, velocity, {"ctx": jnp.bfloat16, "nctx": jnp.bfloat16,
                          "cfg_scale": jnp.float32},
        max_batch=max_batch, pipeline_depth=pipeline_depth,
        sampler=sampler, dp_mesh=dp_mesh)


def aura_engine(model: DiffusionModel, max_batch: int = 4,
                pipeline_depth: int = 1, sampler: str = "euler",
                dp_mesh=None):
    """Continuous-batching engine for a loaded AuraFlow model: requests
    carry (H, W, C) spatial latents + cond {"ctx", "nctx", "cfg_scale"}
    (Pile-T5 states, padded to a fixed length per bucket); each tick runs
    the conditional AND unconditional forwards and applies per-request
    CFG mixing. Stacked param trees (DiffusionModel.stack) take the
    scanned zero-copy forward."""
    from .models import aura as aura_model
    from .serving import ContinuousBatchEngine

    fwd = (aura_model.forward_stacked
           if "double_layers" in model.params else aura_model.forward)

    velocity = _cfg_mix_velocity(fwd, model)

    return make_flow_engine(
        model, velocity, {"ctx": jnp.bfloat16, "nctx": jnp.bfloat16,
                          "cfg_scale": jnp.float32},
        max_batch=max_batch, pipeline_depth=pipeline_depth,
        sampler=sampler, dp_mesh=dp_mesh)


def lumina2_engine(model: DiffusionModel, max_batch: int = 4,
                   pipeline_depth: int = 1, sampler: str = "euler",
                   dp_mesh=None):
    """Continuous-batching engine for a loaded Lumina Image 2.0 model:
    requests carry (H, W, C) spatial latents + cond {"cap", "ncap",
    "cfg_scale"} (Gemma2 hidden states, padded to a fixed length per
    bucket); each tick runs the conditional AND unconditional forwards
    and applies per-request CFG mixing. Stacked param trees
    (DiffusionModel.stack) take the scanned zero-copy forward."""
    from .models import lumina2 as lumina2_model
    from .serving import ContinuousBatchEngine

    fwd = (lumina2_model.forward_stacked
           if "layers" in model.params else lumina2_model.forward)

    velocity = _cfg_mix_velocity(fwd, model, ckey="cap", nkey="ncap")

    return make_flow_engine(
        model, velocity, {"cap": jnp.bfloat16, "ncap": jnp.bfloat16,
                          "cfg_scale": jnp.float32},
        max_batch=max_batch, pipeline_depth=pipeline_depth,
        sampler=sampler, dp_mesh=dp_mesh)


def sd3_engine(model: DiffusionModel, max_batch: int = 4,
               pipeline_depth: int = 1, sampler: str = "euler",
               dp_mesh=None):
    """Continuous-batching engine for a loaded SD3/SD3.5 model.

    Requests carry spatial latents (h_lat, w_lat, C) + cond
    {"ctx", "pooled"}; one tick advances the in-flight pool by one Euler
    step. Stacked param trees (DiffusionModel.stack) take the scanned
    forward; EngineGroup handles mixed resolutions (one jit bucket per
    latent shape). Same pipeline_depth dispatch-window semantics as
    flux_engine; ``sampler="dpmpp_2m"`` runs per-lane 2nd-order
    multistep (see flux_engine)."""
    from .serving import ContinuousBatchEngine

    fwd = (sd3_model.forward_stacked if "joint_blocks" in model.params
           else sd3_model.forward)

    def velocity(params, x, s_cur, cond):
        return fwd(params, model.config, x, cond["ctx"], cond["pooled"],
                   s_cur, qcfg=model.qcfg)

    return make_flow_engine(
        model, velocity, {"ctx": jnp.bfloat16, "pooled": jnp.bfloat16},
        max_batch=max_batch, pipeline_depth=pipeline_depth,
        sampler=sampler, dp_mesh=dp_mesh)


@dataclasses.dataclass
class SD3Pipeline:
    """SD3/SD3.5 txt2img: CLIP-L + CLIP-G (+ optional T5) conditioning,
    CFG over the rectified-flow ODE (role of TripleCLIPLoaderGGUF wiring,
    reference nodes.py:269-284)."""

    model: DiffusionModel
    clip_l: TextEncoder
    clip_g: TextEncoder
    t5: TextEncoder | None = None
    vae_params: dict | None = None
    vae_config: object | None = None
    shift: float = 3.0

    @staticmethod
    def load(unet_path: str, clip_l_path: str, clip_g_path: str,
             t5_path: str | None = None, vae_path: str | None = None,
             **kw) -> "SD3Pipeline":
        model = load_diffusion_model(unet_path, **kw)
        encs = [load_text_encoder(p) for p in
                (clip_l_path, clip_g_path) + ((t5_path,) if t5_path else ())]
        by_kind = {e.kind: e for e in encs}
        vp = vc = None
        if vae_path:
            vp = {k: jnp.asarray(v)
                  for k, v in _load_safetensors_sd(vae_path).items()}
            vc = vae_model.VAEConfig.from_state_dict(vp)
        return SD3Pipeline(model, by_kind["clip_l"], by_kind["clip_g"],
                           by_kind.get("t5"), vp, vc)

    def _condition(self, clip_l_ids, clip_g_ids, t5_ids):
        """SD3 conditioning: penultimate CLIP-L ⊕ CLIP-G states padded to
        4096 channels, concatenated with T5 states; pooled = pooled_l ⊕
        pooled_g."""
        l_out = self.clip_l.encode(clip_l_ids)
        g_out = self.clip_g.encode(clip_g_ids)
        clip_ctx = jnp.concatenate(
            [l_out["penultimate"], g_out["penultimate"]], axis=-1)
        ctx_dim = (self.model.config.context_dim
                   if self.model is not None else 4096)
        clip_ctx = jnp.pad(
            clip_ctx, ((0, 0), (0, 0), (0, ctx_dim - clip_ctx.shape[-1])))
        parts = [clip_ctx]
        if self.t5 is not None and t5_ids is not None:
            parts.append(self.t5.encode(t5_ids).astype(clip_ctx.dtype))
        ctx = jnp.concatenate(parts, axis=1)
        pooled = jnp.concatenate([l_out["pooled"], g_out["pooled"]], axis=-1)
        return ctx, pooled

    def generate(self, prompt: str, negative_prompt: str = "", **kw):
        """Prompt-level txt2img; needs tokenizers on the CLIP encoders
        (available when they were loaded from GGUF with tokenizer
        metadata — safetensors CLIP ships no vocab)."""
        def ids_for(enc, text):
            if enc is None:
                return None
            if enc.tokenizer is None:
                raise ValueError(
                    f"{enc.kind} has no tokenizer (safetensors encoder); "
                    "use generate_from_ids with external token ids")
            L = getattr(enc.config, "max_positions", None)
            ids, _ = enc.tokenizer.encode_batch(
                [text], max_length=min(77, L) if L else kw.get(
                    "max_t5_len", 512))
            return jnp.asarray(ids)

        return self.generate_from_ids(
            ids_for(self.clip_l, prompt), ids_for(self.clip_g, prompt),
            t5_ids=ids_for(self.t5, prompt),
            neg_clip_l_ids=ids_for(self.clip_l, negative_prompt),
            neg_clip_g_ids=ids_for(self.clip_g, negative_prompt),
            neg_t5_ids=ids_for(self.t5, negative_prompt),
            **{k: v for k, v in kw.items() if k != "max_t5_len"})

    def generate_from_ids(self, clip_l_ids, clip_g_ids, t5_ids=None,
                          neg_clip_l_ids=None, neg_clip_g_ids=None,
                          neg_t5_ids=None, width: int = 1024,
                          height: int = 1024, steps: int = 28,
                          cfg_scale: float = 4.5, seed: int = 0,
                          init_image: np.ndarray | None = None,
                          denoise: float = 1.0,
                          inpaint_mask: np.ndarray | None = None,
                          sampler: str | None = None):
        """txt2img; img2img when ``init_image`` (H, W, 3) in [0, 1] +
        ``denoise`` < 1 (VAE-encode, forward-noise to the schedule point,
        sample down — same host semantics as FluxPipeline); inpainting
        when ``inpaint_mask`` (H_lat, W_lat or any resizable 2-D, 1 =
        generate) is also given."""
        from .sampling import euler_sample, linear_schedule, shift_sigmas

        ctx, pooled = self._condition(clip_l_ids, clip_g_ids, t5_ids)
        use_cfg = cfg_scale != 1.0 and neg_clip_l_ids is not None
        if use_cfg:
            nctx, npooled = self._condition(neg_clip_l_ids, neg_clip_g_ids,
                                            neg_t5_ids)

        h_lat, w_lat = height // 8, width // 8
        key = jax.random.key(seed)
        noise = jax.random.normal(
            key, (1, h_lat, w_lat, self.model.config.in_channels),
            jnp.bfloat16)
        sigmas = shift_sigmas(linear_schedule(steps), self.shift)

        x, z0, mask = noise, None, None
        if init_image is not None:
            if self.vae_params is None:
                raise ValueError("img2img needs a VAE")
            first = int(round((1.0 - denoise) * steps))
            sigmas = sigmas[first:]
            img01 = jnp.asarray(init_image, jnp.float32)[None] * 2 - 1
            z0 = vae_model.encode_auto(self.vae_params, self.vae_config,
                                       img01)
            s0 = jnp.float32(sigmas[0])
            x = ((1 - s0) * z0.astype(jnp.float32)
                 + s0 * noise.astype(jnp.float32)).astype(jnp.bfloat16)
            if inpaint_mask is not None:
                m = jax.image.resize(jnp.asarray(inpaint_mask, jnp.float32),
                                     (h_lat, w_lat), method="nearest")
                mask = jnp.broadcast_to(m[None, :, :, None], z0.shape)
        elif inpaint_mask is not None:
            raise ValueError("inpaint_mask needs an init_image")
        model = self.model

        # stacked trees (DiffusionModel.stack) take the scanned forward
        fwd = (sd3_model.forward_stacked if "joint_blocks" in model.params
               else sd3_model.forward)

        from .sampling import euler_sample_inpaint

        @jax.jit
        def denoise(params, x0, ctx, pooled, *neg):
            def velocity(xc, sigma):
                tt = jnp.full((xc.shape[0],), sigma, jnp.float32)
                v_c = fwd(params, model.config, xc, ctx,
                          pooled, tt, qcfg=model.qcfg)
                if not neg:
                    return v_c
                v_u = fwd(params, model.config, xc, neg[0],
                          neg[1], tt, qcfg=model.qcfg)
                return v_u + cfg_scale * (v_c - v_u)
            if mask is not None:
                return euler_sample_inpaint(
                    velocity, x0, sigmas, z0.astype(jnp.bfloat16), mask,
                    jax.random.fold_in(key, 1))
            return sample_flow(velocity, x0, sigmas, sampler=sampler)

        args = (nctx, npooled) if use_cfg else ()
        latent = denoise(model.params, x, ctx, pooled, *args)
        if self.vae_params is None:
            return np.asarray(latent[0])
        img = vae_model.decode_auto(self.vae_params, self.vae_config, latent)
        return np.asarray((jnp.clip(img[0], -1, 1) + 1) / 2)


@dataclasses.dataclass
class WanPipeline:
    """Wan 2.1 t2v: UMT5 conditioning, CFG rectified flow.

    With ``vae_params`` set (models/wan_vae.py causal 3-D VAE), ``generate``
    returns decoded video (T, H, W, 3) in [0, 1]; otherwise latent video.
    Per-channel latent statistics (``latents_mean``/``latents_std``, 16-wide,
    from the checkpoint config) un-normalize z before decode when given.
    """

    model: DiffusionModel
    t5: TextEncoder
    shift: float = 5.0
    vae_params: dict | None = None
    latents_mean: np.ndarray | None = None
    latents_std: np.ndarray | None = None

    @staticmethod
    def load(unet_path: str, t5_path: str, **kw) -> "WanPipeline":
        return WanPipeline(load_diffusion_model(unet_path, **kw),
                           load_text_encoder(t5_path))

    def generate(self, prompt: str, negative_prompt: str = "",
                 latent_frames: int = 21, latent_height: int = 60,
                 latent_width: int = 104, steps: int = 30,
                 cfg_scale: float = 5.0, seed: int = 0,
                 max_t5_len: int = 512,
                 dispatch_window: int | None = 4) -> np.ndarray:
        """dispatch_window: steps per jitted dispatch (host sync between
        windows) — a full 30-step Wan denoise in ONE dispatch is minutes
        of queued device work and wedges the worker (the round-3/4
        long-dispatch fault); 4 CFG steps ≈ 2 min worst case on the 14B
        at 480p. None = single dispatch (identical math)."""
        from .models import wan as wan_model

        def cond(text):
            ids, mask = self.t5.tokenizer.encode_batch(
                [text], max_length=max_t5_len)
            c = self.t5.encode(jnp.asarray(ids), jnp.asarray(mask))
            # Wan reference zeroes the padded positions (zero_out_masked):
            # the UMT5 encoder emits nonzero states there, and the DiT's
            # cross-attention has no mask — pad garbage must be zeros
            return c * jnp.asarray(mask)[..., None].astype(c.dtype)

        ctx = cond(prompt)
        use_cfg = cfg_scale != 1.0
        if use_cfg:
            nctx = cond(negative_prompt)

        C = self.model.config.in_channels
        key = jax.random.key(seed)
        x = jax.random.normal(
            key, (1, latent_frames, latent_height, latent_width, C),
            jnp.bfloat16)
        sigmas = shift_sigmas(linear_schedule(steps), self.shift)
        model = self.model
        fwd = (wan_model.forward_stacked if "blocks" in model.params
               else wan_model.forward)

        denoise = _jit_cfg_denoise(
            lambda p, xc, ts, c: fwd(p, model.config, xc, c, ts,
                                     qcfg=model.qcfg), sigmas, cfg_scale,
            window=dispatch_window)

        args = (nctx,) if use_cfg else ()
        lat = denoise(model.params, x, ctx, *args)
        if self.vae_params is None:
            return np.asarray(lat[0])
        from .models import wan_vae

        z = lat.astype(jnp.float32)
        if self.latents_mean is not None:
            mean = jnp.asarray(self.latents_mean, jnp.float32)
            std = jnp.asarray(self.latents_std, jnp.float32)
            z = z * std + mean
        vcfg = wan_vae.WanVAEConfig.from_state_dict(self.vae_params)
        vid = wan_vae.decode_auto(self.vae_params, vcfg, z, qcfg=model.qcfg)
        return np.asarray((jnp.clip(vid[0], -1, 1) + 1) / 2)


@dataclasses.dataclass
class HyVidPipeline:
    """HunyuanVideo t2v: LLM conditioning, guidance-distilled rectified
    flow; optional causal-VAE decode (models/hyvid_vae.py)."""

    model: DiffusionModel
    text: TextEncoder  # llama-family (llava-llama3 text tower)
    shift: float = 7.0
    vae_params: dict | None = None

    def generate(self, prompt: str, latent_frames: int = 9,
                 latent_height: int = 60, latent_width: int = 104,
                 steps: int = 20, guidance: float = 6.0, seed: int = 0,
                 max_len: int = 256,
                 dispatch_window: int | None = 4) -> np.ndarray:
        """dispatch_window: steps per jitted dispatch with a host sync
        between windows (see WanPipeline.generate — the long-dispatch
        worker fault); None = one dispatch, identical math."""
        from .models import hyvid as hyvid_model

        ids, mask = self.text.tokenizer.encode_batch([prompt],
                                                     max_length=max_len)
        txt = self.text.encode(jnp.asarray(ids), jnp.asarray(mask))
        if isinstance(txt, dict):
            txt = txt.get("last_hidden", txt)

        C = self.model.config.in_channels
        key = jax.random.key(seed)
        x = jax.random.normal(
            key, (1, latent_frames, latent_height, latent_width, C),
            jnp.bfloat16)
        sigmas = shift_sigmas(linear_schedule(steps), self.shift)
        g = jnp.full((1,), guidance * 1000.0, jnp.float32)
        model = self.model

        fwd = (hyvid_model.forward_stacked
               if "double_blocks" in model.params else hyvid_model.forward)

        denoise = _jit_cfg_denoise(
            lambda p, xc, ts, c: fwd(p, model.config, xc, c, ts, g,
                                     qcfg=model.qcfg), sigmas, 1.0,
            window=dispatch_window)

        lat = denoise(model.params, x, txt)
        if self.vae_params is None:
            return np.asarray(lat[0])
        from .models import hyvid_vae

        vcfg = hyvid_vae.HyVidVAEConfig.from_state_dict(self.vae_params)
        vid = hyvid_vae.decode_auto(self.vae_params, vcfg,
                               lat.astype(jnp.float32), qcfg=model.qcfg)
        return np.asarray((jnp.clip(vid[0], -1, 1) + 1) / 2)


@dataclasses.dataclass
class LTXVPipeline:
    """LTX-Video t2v: T5 conditioning over flattened latent voxels with
    (t, h, w) position ids; rectified flow; causal pixel-shuffle VAE
    decode to pixels when vae_params is set (models/ltxv_vae.py)."""

    model: DiffusionModel
    t5: TextEncoder
    shift: float = 3.0
    vae_params: dict | None = None
    vae_config: object | None = None  # derived lazily, cached

    def generate(self, prompt: str, latent_frames: int = 9,
                 latent_height: int = 32, latent_width: int = 32,
                 steps: int = 20, cfg_scale: float = 3.0, seed: int = 0,
                 negative_prompt: str = "", max_t5_len: int = 256
                 ) -> np.ndarray:
        from .models import ltxv as ltxv_model

        ids_, mask = self.t5.tokenizer.encode_batch([prompt],
                                                    max_length=max_t5_len)
        ctx = self.t5.encode(jnp.asarray(ids_), jnp.asarray(mask))
        use_cfg = cfg_scale != 1.0
        if use_cfg:
            nids, nmask = self.t5.tokenizer.encode_batch(
                [negative_prompt], max_length=max_t5_len)
            nctx = self.t5.encode(jnp.asarray(nids), jnp.asarray(nmask))

        C = self.model.config.in_channels
        F_, H_, W_ = latent_frames, latent_height, latent_width
        L = F_ * H_ * W_
        tt, hh, ww = jnp.meshgrid(jnp.arange(F_), jnp.arange(H_),
                                  jnp.arange(W_), indexing="ij")
        pos = jnp.stack([tt, hh, ww], axis=-1).reshape(1, L, 3)
        key = jax.random.key(seed)
        x = jax.random.normal(key, (1, L, C), jnp.bfloat16)
        sigmas = shift_sigmas(linear_schedule(steps), self.shift)
        model = self.model

        fwd = (ltxv_model.forward_stacked
               if "transformer_blocks" in model.params
               else ltxv_model.forward)

        denoise = _jit_cfg_denoise(
            lambda p, xc, ts, c: fwd(p, model.config, xc, pos, c, ts,
                                     qcfg=model.qcfg), sigmas, cfg_scale)

        args = (nctx,) if use_cfg else ()
        lat = denoise(model.params, x, ctx, *args)
        lat = lat.reshape(1, F_, H_, W_, C)
        if self.vae_params is None:
            return np.asarray(lat[0])
        from .models import ltxv_vae

        if self.vae_config is None:  # cache the key introspection
            self.vae_config = ltxv_vae.LTXVVAEConfig.from_state_dict(
                self.vae_params)
        vid = ltxv_vae.decode_auto(self.vae_params, self.vae_config,
                              lat.astype(jnp.float32), qcfg=model.qcfg)
        return np.asarray((jnp.clip(vid[0], -1, 1) + 1) / 2)


@dataclasses.dataclass
class QwenImagePipeline:
    """Qwen-Image txt2img: Qwen2.5 LLM conditioning, flux-style patchified
    latent tokens with 3-axis RoPE ids; rectified flow; latent output."""

    model: DiffusionModel
    text: TextEncoder  # qwen2.5 (llama-family graph)
    shift: float = 2.2

    def generate(self, prompt: str, width: int = 1024, height: int = 1024,
                 steps: int = 20, cfg_scale: float = 4.0, seed: int = 0,
                 negative_prompt: str = " ", max_len: int = 256
                 ) -> np.ndarray:
        from .models import qwen_image as qi_model

        def cond(p):
            ids_, mask = self.text.tokenizer.encode_batch([p],
                                                          max_length=max_len)
            out = self.text.encode(jnp.asarray(ids_), jnp.asarray(mask))
            return out.get("last_hidden", out) if isinstance(out, dict) \
                else out

        txt = cond(prompt)
        use_cfg = cfg_scale != 1.0
        if use_cfg:
            ntxt = cond(negative_prompt)

        h_tok, w_tok = height // 16, width // 16
        L = h_tok * w_tok
        img_ids = jnp.asarray(flux_model.make_img_ids(h_tok, w_tok, 1))
        txt_ids = jnp.zeros((1, txt.shape[1], 3), jnp.int32)
        C = self.model.config.in_channels
        key = jax.random.key(seed)
        x = jax.random.normal(key, (1, L, C), jnp.bfloat16)
        sigmas = shift_sigmas(linear_schedule(steps), self.shift)
        model = self.model

        fwd = (qi_model.forward_stacked
               if "transformer_blocks" in model.params else qi_model.forward)

        denoise = _jit_cfg_denoise(
            lambda p, xc, ts, c: fwd(p, model.config, xc, img_ids, c,
                                     txt_ids, ts, qcfg=model.qcfg),
            sigmas, cfg_scale)

        args = (ntxt,) if use_cfg else ()
        lat = denoise(model.params, x, txt, *args)
        return np.asarray(lat[0])

    def generate_edit(self, prompt: str, ref_latents,
                      width: int = 1024, height: int = 1024,
                      steps: int = 20, cfg_scale: float = 4.0,
                      seed: int = 0, negative_prompt: str = " ",
                      max_len: int = 256, txt_override=None,
                      ntxt_override=None) -> np.ndarray:
        """Qwen-Image-Edit: generation conditioned on reference image
        latents. Each reference (H_lat, W_lat, C_lat spatial latent, e.g.
        a Wan-VAE encode of the source image) is 2×2-patchified and
        CONCATENATED to the image token stream with rope frame index
        1, 2, … (generation tokens keep frame 0, same spatial grid —
        kontext-style id convention); the velocity for the reference
        span is discarded each step. ``txt_override``/``ntxt_override``
        accept pre-computed conditioning states — e.g. from
        ``qwen_vl_encode_with_image`` when the edit prompt embeds the
        source image through the vision tower (mmproj)."""
        from .models import qwen_image as qi_model

        if not isinstance(ref_latents, (list, tuple)):
            ref_latents = [ref_latents]

        def cond(p):
            ids_, mask = self.text.tokenizer.encode_batch([p],
                                                          max_length=max_len)
            out = self.text.encode(jnp.asarray(ids_), jnp.asarray(mask))
            return out.get("last_hidden", out) if isinstance(out, dict) \
                else out

        txt = txt_override if txt_override is not None else cond(prompt)
        use_cfg = cfg_scale != 1.0
        if use_cfg:
            ntxt = (ntxt_override if ntxt_override is not None
                    else cond(negative_prompt))

        h_tok, w_tok = height // 16, width // 16
        L = h_tok * w_tok
        ids = [np.asarray(flux_model.make_img_ids(h_tok, w_tok, 1))]
        ref_tok = []
        for ri, r in enumerate(ref_latents, start=1):
            r = jnp.asarray(r, jnp.float32)[None]  # (1, H_lat, W_lat, C)
            ref_tok.append(flux_model.patchify(r))
            rid = np.array(flux_model.make_img_ids(
                r.shape[1] // 2, r.shape[2] // 2, 1))
            rid[:, :, 0] = ri
            ids.append(rid)
        img_ids = jnp.asarray(np.concatenate(ids, axis=1))
        ref = jnp.concatenate(ref_tok, axis=1).astype(jnp.bfloat16)
        txt_ids = jnp.zeros((1, txt.shape[1], 3), jnp.int32)
        C = self.model.config.in_channels
        key = jax.random.key(seed)
        x = jax.random.normal(key, (1, L, C), jnp.bfloat16)
        sigmas = shift_sigmas(linear_schedule(steps), self.shift)
        model = self.model

        fwd = (qi_model.forward_stacked
               if "transformer_blocks" in model.params else qi_model.forward)

        def _edit_fwd(p, xc, ts, c):
            xa = jnp.concatenate([xc, ref], axis=1)
            return fwd(p, model.config, xa, img_ids, c, txt_ids, ts,
                       qcfg=model.qcfg)[:, :L]

        denoise = _jit_cfg_denoise(_edit_fwd, sigmas, cfg_scale)

        args = (ntxt,) if use_cfg else ()
        lat = denoise(model.params, x, txt, *args)
        return np.asarray(lat[0])


@dataclasses.dataclass
class AuraPipeline:
    """AuraFlow txt2img: Pile-T5 conditioning, rectified flow, latent out."""

    model: DiffusionModel
    t5: TextEncoder
    shift: float = 1.73

    def generate(self, prompt: str, width: int = 1024, height: int = 1024,
                 steps: int = 20, cfg_scale: float = 3.5, seed: int = 0,
                 negative_prompt: str = "", max_len: int = 256) -> np.ndarray:
        from .models import aura as aura_model

        def cond(p):
            ids_, mask = self.t5.tokenizer.encode_batch([p],
                                                        max_length=max_len)
            out = self.t5.encode(jnp.asarray(ids_), jnp.asarray(mask))
            return out.get("last_hidden", out) if isinstance(out, dict) \
                else out

        ctx = cond(prompt)
        use_cfg = cfg_scale != 1.0
        if use_cfg:
            nctx = cond(negative_prompt)
        C = self.model.config.in_channels
        key = jax.random.key(seed)
        x = jax.random.normal(key, (1, height // 8, width // 8, C),
                              jnp.bfloat16)
        sigmas = shift_sigmas(linear_schedule(steps), self.shift)
        model = self.model

        fwd = (aura_model.forward_stacked
               if "double_layers" in model.params else aura_model.forward)

        denoise = _jit_cfg_denoise(
            lambda p, xc, ts, c: fwd(p, model.config, xc, c, ts,
                                     qcfg=model.qcfg), sigmas, cfg_scale)

        args = (nctx,) if use_cfg else ()
        return np.asarray(denoise(model.params, x, ctx, *args)[0])


@dataclasses.dataclass
class CosmosPipeline:
    """Cosmos Predict2 t2v/t2i: T5 conditioning, rectified flow over NDHWC
    latents; latent output."""

    model: DiffusionModel
    t5: TextEncoder
    shift: float = 1.0

    def generate(self, prompt: str, latent_frames: int = 1,
                 latent_height: int = 64, latent_width: int = 64,
                 steps: int = 20, cfg_scale: float = 4.0, seed: int = 0,
                 negative_prompt: str = "", max_len: int = 256) -> np.ndarray:
        from .models import cosmos as cosmos_model

        def cond(p):
            ids_, mask = self.t5.tokenizer.encode_batch([p],
                                                        max_length=max_len)
            out = self.t5.encode(jnp.asarray(ids_), jnp.asarray(mask))
            return out.get("last_hidden", out) if isinstance(out, dict) \
                else out

        ctx = cond(prompt)
        use_cfg = cfg_scale != 1.0
        if use_cfg:
            nctx = cond(negative_prompt)
        C = self.model.config.in_channels
        key = jax.random.key(seed)
        x = jax.random.normal(
            key, (1, latent_frames, latent_height, latent_width, C),
            jnp.bfloat16)
        sigmas = shift_sigmas(linear_schedule(steps), self.shift)
        model = self.model

        fwd = (cosmos_model.forward_stacked
               if "blocks" in model.params else cosmos_model.forward)
        denoise = _jit_cfg_denoise(
            lambda p, xc, ts, c: fwd(p, model.config, xc, c, ts,
                                     qcfg=model.qcfg), sigmas, cfg_scale)

        args = (nctx,) if use_cfg else ()
        return np.asarray(denoise(model.params, x, ctx, *args)[0])


@dataclasses.dataclass
class Lumina2Pipeline:
    """Lumina Image 2.0 txt2img: Gemma2 conditioning, rectified flow."""

    model: DiffusionModel
    text: TextEncoder  # gemma2 (llama-family graph)
    shift: float = 6.0

    def generate(self, prompt: str, width: int = 1024, height: int = 1024,
                 steps: int = 20, cfg_scale: float = 4.0, seed: int = 0,
                 negative_prompt: str = "", max_len: int = 256) -> np.ndarray:
        from .models import lumina2 as lumina2_model

        def cond(p):
            ids_, mask = self.text.tokenizer.encode_batch([p],
                                                          max_length=max_len)
            out = self.text.encode(jnp.asarray(ids_), jnp.asarray(mask))
            return out.get("last_hidden", out) if isinstance(out, dict) \
                else out

        cap = cond(prompt)
        use_cfg = cfg_scale != 1.0
        if use_cfg:
            ncap = cond(negative_prompt)
        C = self.model.config.in_channels
        key = jax.random.key(seed)
        x = jax.random.normal(key, (1, height // 8, width // 8, C),
                              jnp.bfloat16)
        sigmas = shift_sigmas(linear_schedule(steps), self.shift)
        model = self.model

        fwd = (lumina2_model.forward_stacked
               if "layers" in model.params else lumina2_model.forward)

        denoise = _jit_cfg_denoise(
            lambda p, xc, ts, c: fwd(p, model.config, xc, c, ts,
                                     qcfg=model.qcfg), sigmas, cfg_scale)

        args = (ncap,) if use_cfg else ()
        return np.asarray(denoise(model.params, x, cap, *args)[0])


@dataclasses.dataclass
class HiDreamPipeline:
    """HiDream-I1 txt2img: quad conditioning (CLIP-L + CLIP-G pooled,
    T5 + Llama sequence states), MoE DiT, rectified flow."""

    model: DiffusionModel
    clip_l: TextEncoder
    clip_g: TextEncoder
    t5: TextEncoder
    llama: TextEncoder
    shift: float = 3.0

    def generate_from_ids(self, clip_l_ids, clip_g_ids, t5_ids, llama_ids,
                          width: int = 1024, height: int = 1024,
                          steps: int = 20, seed: int = 0) -> np.ndarray:
        from .models import hidream as hidream_model

        l_out = self.clip_l.encode(clip_l_ids)
        g_out = self.clip_g.encode(clip_g_ids)
        pooled = jnp.concatenate([l_out["pooled"], g_out["pooled"]], axis=-1)
        t5s = self.t5.encode(t5_ids)
        if isinstance(t5s, dict):
            t5s = t5s["last_hidden"]
        lls = self.llama.encode(llama_ids)
        if isinstance(lls, dict):
            lls = lls["last_hidden"]
        C = self.model.config.in_channels
        key = jax.random.key(seed)
        x = jax.random.normal(key, (1, height // 8, width // 8, C),
                              jnp.bfloat16)
        sigmas = shift_sigmas(linear_schedule(steps), self.shift)
        model = self.model

        fwd = (hidream_model.forward_stacked
               if "double_stream_blocks" in model.params
               else hidream_model.forward)

        denoise = _jit_cfg_denoise(
            lambda p, xc, ts, c: fwd(p, model.config, xc, c[0], c[1],
                                     c[2], ts, qcfg=model.qcfg),
            sigmas, 1.0)

        return np.asarray(denoise(model.params, x,
                                  (t5s, lls, pooled))[0])


@dataclasses.dataclass
class SD1Pipeline:
    """SD1.x txt2img: single CLIP-L conditioning, eps-prediction UNet in
    sigma space — the smallest member of the reference's sgm family
    (keys_detect sd1 branch, reference tools/convert.py:120-143)."""

    model: DiffusionModel
    clip_l: TextEncoder
    vae_params: dict | None = None
    vae_config: object | None = None

    def generate_from_ids(self, clip_l_ids, neg_clip_l_ids=None,
                          width: int = 512, height: int = 512,
                          steps: int = 20, cfg_scale: float = 7.0,
                          seed: int = 0, sampler: str = "euler",
                          scheduler: str = "normal",
                          init_image: np.ndarray | None = None,
                          denoise: float = 1.0):
        from .models import unet as unet_model
        from .sampling import kdiffusion as kd

        ctx = self.clip_l.encode(clip_l_ids)["last_hidden"]
        use_cfg = cfg_scale != 1.0 and neg_clip_l_ids is not None
        if use_cfg:
            nctx = self.clip_l.encode(neg_clip_l_ids)["last_hidden"]

        table = kd.ddpm_sigmas()
        sigmas = kd.make_schedule(scheduler, steps, table)
        h_lat, w_lat = height // 8, width // 8
        key = jax.random.key(seed)
        if init_image is not None:
            if self.vae_params is None:
                raise ValueError("img2img needs a VAE")
            first = min(int(round((1.0 - denoise) * steps)), steps - 1)
            sigmas = sigmas[first:]
            img01 = jnp.asarray(init_image, jnp.float32)[None] * 2 - 1
            z0 = vae_model.encode_auto(self.vae_params, self.vae_config,
                                       img01)
            noise = jax.random.normal(key, z0.shape, jnp.float32)
            x = (z0 + noise * float(sigmas[0])).astype(jnp.bfloat16)
        else:
            x = jax.random.normal(key, (1, h_lat, w_lat, 4),
                                  jnp.bfloat16) * float(sigmas[0])
        model = self.model

        @jax.jit
        def sample(params, x0, ctx, *neg):
            def eps(x_in, t, ctx_):
                return unet_model.forward(params, model.config, x_in, t,
                                          ctx_, None, qcfg=model.qcfg)

            def eps_cfg(x_in, t):
                e_c = eps(x_in, t, ctx)
                if not neg:
                    return e_c
                e_u = eps(x_in, t, neg[0])
                return e_u + cfg_scale * (e_c - e_u)

            den = kd.make_eps_denoiser(eps_cfg, table)
            # stochastic samplers (euler_ancestral/lcm/dpmpp_*sde) draw
            # from a sampler-private stream decorrelated from the init
            # noise; deterministic ones ignore the key
            skey = jax.random.fold_in(jax.random.key(seed), 0x5A)
            return kd.run_sampler(sampler, den, x0, sigmas, key=skey)

        args = (nctx,) if use_cfg else ()
        latent = sample(model.params, x, ctx, *args)
        if self.vae_params is None:
            return np.asarray(latent[0])
        img = vae_model.decode_auto(self.vae_params, self.vae_config, latent)
        return np.asarray((jnp.clip(img[0], -1, 1) + 1) / 2)


@dataclasses.dataclass
class SDXLPipeline:
    """SDXL txt2img: dual CLIP conditioning, eps-prediction UNet sampled in
    sigma space (sampling/kdiffusion)."""

    model: DiffusionModel
    clip_l: TextEncoder
    clip_g: TextEncoder
    vae_params: dict | None = None
    vae_config: object | None = None

    def generate_from_ids(self, clip_l_ids, clip_g_ids,
                          neg_clip_l_ids=None, neg_clip_g_ids=None,
                          width: int = 1024, height: int = 1024,
                          steps: int = 20, cfg_scale: float = 7.0,
                          seed: int = 0, sampler: str = "euler",
                          scheduler: str = "normal",
                          init_image: np.ndarray | None = None,
                          denoise: float = 1.0,
                          inpaint_mask: np.ndarray | None = None):
        """txt2img, or img2img when ``init_image`` (H, W, 3) in [0, 1]
        and ``denoise`` < 1 are given: the VAE-encoded image is noised to
        the sigma at 1-denoise of the schedule and sampled down from
        there (reference host semantics). ``inpaint_mask`` (any
        resizable 2-D, 1 = regenerate) with an init_image switches to
        masked Euler (kept region re-projected onto the noised source
        every step); the ``sampler`` knob is ignored in that mode."""
        from .models import unet as unet_model
        from .sampling import kdiffusion as kd

        def cond(l_ids, g_ids):
            l_out = self.clip_l.encode(l_ids)
            g_out = self.clip_g.encode(g_ids)
            ctx = jnp.concatenate(
                [l_out["penultimate"], g_out["penultimate"]], axis=-1)
            # SDXL vector: pooled_g ⊕ size/crop/target embeddings (256×6)
            sizes = jnp.asarray(
                [[height, width, 0, 0, height, width]], jnp.float32)
            size_emb = flux_model.timestep_embedding(
                sizes.reshape(-1), 256, time_factor=1.0).reshape(1, -1)
            y = jnp.concatenate(
                [g_out["pooled"], size_emb.astype(g_out["pooled"].dtype)],
                axis=-1)
            return ctx, y

        ctx, y = cond(clip_l_ids, clip_g_ids)
        use_cfg = cfg_scale != 1.0 and neg_clip_l_ids is not None
        if use_cfg:
            nctx, ny = cond(neg_clip_l_ids, neg_clip_g_ids)

        table = kd.ddpm_sigmas()
        sigmas = kd.make_schedule(scheduler, steps, table)
        h_lat, w_lat = height // 8, width // 8
        key = jax.random.key(seed)
        z0 = mask = None
        if init_image is not None:
            if self.vae_params is None:
                raise ValueError("img2img needs a VAE")
            first = min(int(round((1.0 - denoise) * steps)), steps - 1)
            sigmas = sigmas[first:]
            img01 = jnp.asarray(init_image, jnp.float32)[None] * 2 - 1
            z0 = vae_model.encode_auto(self.vae_params, self.vae_config, img01)
            noise = jax.random.normal(key, z0.shape, jnp.float32)
            x = (z0 + noise * float(sigmas[0])).astype(jnp.bfloat16)
            if inpaint_mask is not None:
                m = jax.image.resize(jnp.asarray(inpaint_mask, jnp.float32),
                                     (h_lat, w_lat), method="nearest")
                mask = jnp.broadcast_to(m[None, :, :, None], z0.shape)
        elif inpaint_mask is not None:
            raise ValueError("inpaint_mask needs an init_image")
        else:
            x = jax.random.normal(key, (1, h_lat, w_lat, 4),
                                  jnp.bfloat16) * float(sigmas[0])
        model = self.model

        @jax.jit
        def sample(params, x0, ctx, y, *neg):
            def eps(x_in, t, ctx_, y_):
                return unet_model.forward(params, model.config, x_in, t,
                                          ctx_, y_, qcfg=model.qcfg)

            def eps_cfg(x_in, t):
                e_c = eps(x_in, t, ctx, y)
                if not neg:
                    return e_c
                e_u = eps(x_in, t, neg[0], neg[1])
                return e_u + cfg_scale * (e_c - e_u)

            den = kd.make_eps_denoiser(eps_cfg, table)
            # stochastic samplers (euler_ancestral/lcm/dpmpp_*sde) draw
            # from a sampler-private stream decorrelated from the init
            # noise; deterministic ones ignore the key
            skey = jax.random.fold_in(jax.random.key(seed), 0x5A)
            if mask is not None:
                return kd.euler_sample_sigma_inpaint(
                    den, x0, sigmas, z0, mask,
                    jax.random.fold_in(jax.random.key(seed), 1))
            return kd.run_sampler(sampler, den, x0, sigmas, key=skey)

        args = (nctx, ny) if use_cfg else ()
        latent = sample(model.params, x, ctx, y, *args)
        if self.vae_params is None:
            return np.asarray(latent[0])
        img = vae_model.decode_auto(self.vae_params, self.vae_config, latent)
        return np.asarray((jnp.clip(img[0], -1, 1) + 1) / 2)

    def refine_from_ids(self, latent, clip_g_ids, neg_clip_g_ids=None, *,
                        refiner: DiffusionModel,
                        width: int = 1024, height: int = 1024,
                        steps: int = 20, cfg_scale: float = 7.0,
                        denoise: float = 0.25,
                        aesthetic_score: float = 6.0,
                        negative_aesthetic_score: float = 2.5,
                        seed: int = 0, decode: bool = True,
                        sampler: str = "euler",
                        scheduler: str = "normal"):
        """SDXL refiner pass (ensemble-of-experts second stage).

        The refiner UNet conditions on CLIP-G only (1280-wide context) and
        replaces the base model's target-size embeddings with an aesthetic
        score: y = pooled_g ⊕ emb256(h, w, crop_h, crop_w, aesthetic) →
        adm 2560 (sgm GeneralConditioner convention). ``latent`` is the base
        model's output (h/8, w/8, 4) or (1, h/8, w/8, 4); it is re-noised
        to the sigma at ``1-denoise`` of the schedule and sampled down.
        """
        from .models import unet as unet_model
        from .sampling import kdiffusion as kd

        def cond(g_ids, score):
            g_out = self.clip_g.encode(g_ids)
            vals = jnp.asarray([[height, width, 0, 0, score]], jnp.float32)
            emb = flux_model.timestep_embedding(
                vals.reshape(-1), 256, time_factor=1.0).reshape(1, -1)
            y = jnp.concatenate(
                [g_out["pooled"], emb.astype(g_out["pooled"].dtype)],
                axis=-1)
            return g_out["penultimate"], y

        ctx, y = cond(clip_g_ids, aesthetic_score)
        use_cfg = cfg_scale != 1.0 and neg_clip_g_ids is not None
        if use_cfg:
            nctx, ny = cond(neg_clip_g_ids, negative_aesthetic_score)

        table = kd.ddpm_sigmas()
        sigmas = kd.make_schedule(scheduler, steps, table)
        first = min(int(round((1.0 - denoise) * steps)), steps - 1)
        sigmas = sigmas[first:]
        lat = jnp.asarray(latent, jnp.bfloat16)
        if lat.ndim == 3:
            lat = lat[None]
        key = jax.random.key(seed)
        x = lat + jax.random.normal(key, lat.shape, lat.dtype) * float(
            sigmas[0])

        @jax.jit
        def sample(params, x0, ctx, y, *neg):
            def eps(x_in, t, ctx_, y_):
                return unet_model.forward(params, refiner.config, x_in, t,
                                          ctx_, y_, qcfg=refiner.qcfg)

            def eps_cfg(x_in, t):
                e_c = eps(x_in, t, ctx, y)
                if not neg:
                    return e_c
                e_u = eps(x_in, t, neg[0], neg[1])
                return e_u + cfg_scale * (e_c - e_u)

            den = kd.make_eps_denoiser(eps_cfg, table)
            # stochastic samplers (euler_ancestral/lcm/dpmpp_*sde) draw
            # from a sampler-private stream decorrelated from the init
            # noise; deterministic ones ignore the key
            skey = jax.random.fold_in(jax.random.key(seed), 0x5A)
            return kd.run_sampler(sampler, den, x0, sigmas, key=skey)

        args = (nctx, ny) if use_cfg else ()
        out = sample(refiner.params, x, ctx, y, *args)
        if not decode or self.vae_params is None:
            return np.asarray(out[0])
        img = vae_model.decode_auto(self.vae_params, self.vae_config, out)
        return np.asarray((jnp.clip(img[0], -1, 1) + 1) / 2)
