"""Native mixed-precision GGUF quantizer (CLI).

Replaces the reference's patched llama.cpp ``llama-quantize`` binary
(reference tools/lcpp.patch, 451 lines of C++): F16/BF16/F32 GGUF →
Q2_K…Q8_0 GGUF with the same per-tensor recipe:

* tier bumps for sensitive tensors — attn_v / fused-qkv / ffn_down raised
  one-two qtypes per ftype (reference tools/lcpp.patch:129-255,
  ``img_tensor_get_type``);
* per-arch exclusion lists keeping embedders / modulation / final layers
  unquantized (reference tools/lcpp.patch:327-425);
* only 2-D tensors quantized for image models
  (reference tools/lcpp.patch:427-429);
* K-quant row-width check: in-features % 256 != 0 → F16 fallback
  (reference tools/lcpp.patch:229-255);
* T5 relative-position bias never quantized.

The reference's ndim metadata surgery (SD3 ``pos_embed``, Aura
``positional_encoding``, Wan ``.modulation`` — lcpp.patch:275-319) exists
because llama.cpp's writer truncates trailing 1-dims; this writer preserves
dims natively, so no surgery is needed.

The block encoders run through an optional C++ fast path
(tools/native, ctypes) when built, else vectorized numpy.

Usage:  python -m comfyui_gguf_tpu.tools.quantize --src m-F16.gguf \
            --ftype Q4_K_M [--dst out.gguf]
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from ..archs import IMG_ARCH_LIST, get_arch_spec
from ..gguf.constants import GGMLQuantizationType, LlamaFileType, QK_K
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter
from ..quant import codecs

Q = GGMLQuantizationType
F = LlamaFileType
log = logging.getLogger(__name__)

# name fragments identifying sensitive tensor classes
# (reference tools/lcpp.patch:155-162, 178-182, 189-196)
ATTN_V_PATTERNS = ("attn_v.weight", ".to_v.weight", ".v.weight",
                   ".attn.w1v.weight", ".attn.w2v.weight",
                   "_attn.v_proj.weight")
QKV_PATTERNS = ("attn_qkv.weight", "attn.qkv.weight", "attention.qkv.weight")
FFN_DOWN_PATTERNS = (".ffn.2.weight", ".ff.net.2.weight",
                     ".mlp.layer2.weight", ".adaln_modulation_mlp.2.weight",
                     ".feed_forward.w2.weight")


def _is_attn_v(name: str) -> bool:
    return any(p in name for p in ATTN_V_PATTERNS)


def _is_qkv(name: str) -> bool:
    return any(p in name for p in QKV_PATTERNS)


def _is_ffn_down(name: str) -> bool:
    if "ffn_down" in name:
        return True
    if "experts." in name and ".w2.weight" in name:
        return True
    return any(p in name for p in FFN_DOWN_PATTERNS)


class QuantState:
    """Running counters used by layer-position-dependent rules."""

    def __init__(self):
        self.i_attention_wv = 0
        self.i_ffn_down = 0
        self.n_fallback = 0


def tensor_qtype(name: str, shape: tuple[int, ...], ftype: LlamaFileType,
                 qs: QuantState) -> GGMLQuantizationType:
    """Per-tensor qtype selection (reference lcpp.patch img_tensor_get_type)."""
    new_type = ftype.default_qtype

    if _is_attn_v(name):
        if ftype == F.MOSTLY_Q2_K:
            new_type = Q.Q3_K
        elif ftype == F.MOSTLY_Q3_K_M:
            new_type = Q.Q5_K if qs.i_attention_wv < 2 else Q.Q4_K
        elif ftype == F.MOSTLY_Q3_K_L:
            new_type = Q.Q5_K
        elif ftype in (F.MOSTLY_Q4_K_M, F.MOSTLY_Q5_K_M):
            new_type = Q.Q6_K
        elif ftype == F.MOSTLY_Q4_K_S and qs.i_attention_wv < 4:
            new_type = Q.Q5_K
        qs.i_attention_wv += 1
    elif _is_qkv(name):
        if ftype in (F.MOSTLY_Q3_K_M, F.MOSTLY_Q3_K_L):
            new_type = Q.Q4_K
        elif ftype == F.MOSTLY_Q4_K_M:
            new_type = Q.Q5_K
        elif ftype == F.MOSTLY_Q5_K_M:
            new_type = Q.Q6_K
    elif _is_ffn_down(name):
        if ftype == F.MOSTLY_Q3_K_M:
            new_type = Q.Q4_K
        elif ftype == F.MOSTLY_Q3_K_L:
            new_type = Q.Q5_K
        elif ftype == F.MOSTLY_Q4_K_S:
            new_type = Q.Q5_K
        elif ftype in (F.MOSTLY_Q4_K_M, F.MOSTLY_Q5_K_M):
            new_type = Q.Q6_K
        elif ftype == F.MOSTLY_Q4_0:
            new_type = Q.Q4_1
        elif ftype == F.MOSTLY_Q5_0:
            new_type = Q.Q5_1
        qs.i_ffn_down += 1

    # row-width sanity: rows must hold whole blocks (the reference checks
    # K-quant superblocks, lcpp.patch:229-239; we extend to every format)
    from ..gguf.constants import GGML_QUANT_SIZES

    block = GGML_QUANT_SIZES[new_type][0]
    if block > 1 and shape[-1] % block != 0:
        log.warning("%s: row width %d %% %d != 0 — F16 fallback",
                    name, shape[-1], block)
        new_type = Q.F16
        qs.n_fallback += 1
    return new_type


def should_quantize(name: str, shape: tuple[int, ...], arch: str) -> bool:
    """Exclusion rules (reference lcpp.patch:327-429 + T5 rel-bias rule)."""
    if "attn_rel_b.weight" in name:
        return False
    if arch in IMG_ARCH_LIST:
        if len(shape) != 2:
            return False
        spec = get_arch_spec(arch)
        if spec is not None:
            if any(s in name for s in spec.keys_noquant):
                return False
            if name in spec.keys_noquant_exact:
                return False
    return True


_FTYPE_BY_NAME = {f.name.replace("MOSTLY_", ""): f for f in LlamaFileType}


def quantize_file(src: str, dst: str | None, ftype_name: str) -> str:
    ftype = _FTYPE_BY_NAME[ftype_name.upper()]
    reader = GGUFReader(src)
    arch = reader.get_str("general.architecture")
    if arch is None:
        raise ValueError(f"{src}: missing general.architecture")
    # the reference's quantizer rejects all IQ ftypes for image models
    # (reference tools/lcpp.patch:144-155)
    if arch in IMG_ARCH_LIST and ftype in (F.MOSTLY_IQ4_NL, F.MOSTLY_IQ4_XS):
        raise ValueError(
            f"{ftype_name}: IQ quantization types are not supported for "
            f"image models (arch {arch!r})")
    # the recipe below ports the reference's IMAGE-model type ladder
    # (lcpp.patch img_tensor_get_type); text encoders (t5/llama) go through
    # stock llama.cpp's llama_tensor_get_type in the reference workflow, a
    # different per-tensor policy — refuse rather than silently diverge
    if arch not in IMG_ARCH_LIST:
        raise ValueError(
            f"arch {arch!r} is not an image model; this quantizer implements "
            f"the image-model recipe only — quantize text encoders with "
            f"stock llama.cpp (the reference does the same, tools/README)")

    if dst is None:
        base = src
        for suf in ("-F16.gguf", "-BF16.gguf", "-F32.gguf", ".gguf"):
            if base.endswith(suf):
                base = base[: -len(suf)]
                break
        dst = f"{base}-{ftype_name.upper()}.gguf"

    writer = GGUFWriter(arch)
    for key, val in reader.fields.items():
        if key in ("general.architecture", "general.file_type"):
            continue
        writer.add_field(key, val.type, val.value, val.item_type)
    writer.add_file_type(ftype)

    qs = QuantState()
    n_quantized = 0
    total_in = total_out = 0
    for t in reader.tensors:
        src_bpw = t.n_bytes / max(t.n_elements, 1)
        total_in += t.n_bytes
        if (t.qtype not in (Q.F16, Q.BF16, Q.F32)
                or not should_quantize(t.name, t.shape, arch)):
            writer.add_tensor(t.name, np.ascontiguousarray(t.data),
                              raw_dtype=t.qtype, raw_shape=t.shape)
            total_out += t.n_bytes
            continue
        new_type = tensor_qtype(t.name, t.shape, ftype, qs)
        if new_type == t.qtype:
            writer.add_tensor(t.name, np.ascontiguousarray(t.data),
                              raw_dtype=t.qtype, raw_shape=t.shape)
            total_out += t.n_bytes
            continue
        f32 = codecs.dequantize(t.data, t.qtype, t.shape)
        payload = codecs.quantize(f32, new_type)
        writer.add_tensor(t.name, payload, raw_dtype=new_type,
                          raw_shape=t.shape)
        total_out += payload.nbytes
        n_quantized += 1
        del f32
        log.debug("%s: %s -> %s", t.name, t.qtype.name, new_type.name)

    writer.write_to_file(dst)
    log.info("quantized %d tensors; %.1f MB -> %.1f MB (%d fallbacks)",
             n_quantized, total_in / 1e6, total_out / 1e6, qs.n_fallback)
    return dst


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="F16/BF16 .gguf input")
    ap.add_argument("--dst", help="output .gguf")
    ap.add_argument("--ftype", required=True,
                    help="target ftype, e.g. Q4_K_M, Q4_K_S, Q8_0, Q5_K_M")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    print(quantize_file(args.src, args.dst, args.ftype))


if __name__ == "__main__":
    main()
