"""ctypes bridge to the C++ block codecs (libggquant.so).

Builds lazily via ``make`` on first use if the shared library is missing
(toolchain permitting); every entry point degrades to the numpy codecs, so
nothing here is load-bearing for correctness — only for conversion
throughput on multi-GB checkpoints (role of the reference's C++ quantizer
binary, reference tools/lcpp.patch).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libggquant.so")
_lib = None
_tried = False

# qtypes the C++ library implements (encode)
NATIVE_ENCODE_QTYPES = frozenset({2, 8, 12, 13, 14})  # Q4_0 Q8_0 Q4_K Q5_K Q6_K
NATIVE_DECODE_QTYPES = frozenset({2, 8, 12, 14})


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # missing toolchain, sandbox, …
        log.info("native codec build unavailable: %s", e)
        return False


def get_lib():
    """Load (building if needed) the shared library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_DIR, "quant_kernels.cc")
    stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    if (not os.path.exists(_LIB_PATH) or stale) and not _build() \
            and not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ggq_quantize.restype = ctypes.c_int
        lib.ggq_quantize.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.ggq_dequantize.restype = ctypes.c_int
        lib.ggq_dequantize.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.ggq_type_size.restype = ctypes.c_int
        lib.ggq_type_size.argtypes = [ctypes.c_int]
        lib.ggq_block_size.restype = ctypes.c_int
        lib.ggq_block_size.argtypes = [ctypes.c_int]
        try:  # symbols absent from a pre-round-3 .so (stale build)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i8p = ctypes.POINTER(ctypes.c_int8)
            i64 = ctypes.c_int64
            lib.ggq_pack_nib4_planar.restype = ctypes.c_int
            lib.ggq_pack_nib4_planar.argtypes = [u8p, u8p, i64, i64, i64]
            lib.ggq_transpose_i8.restype = ctypes.c_int
            lib.ggq_transpose_i8.argtypes = [i8p, i8p, i64, i64, i64]
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.ggq_extract_q4k.restype = ctypes.c_int
            lib.ggq_extract_q4k.argtypes = [u8p, u8p, f32p, f32p, i64]
            lib.ggq_extract_q5k.restype = ctypes.c_int
            lib.ggq_extract_q5k.argtypes = [u8p, u8p, f32p, f32p, i64]
            lib.ggq_extract_q2k.restype = ctypes.c_int
            lib.ggq_extract_q2k.argtypes = [u8p, u8p, f32p, f32p, i64]
            lib.ggq_extract_q6k.restype = ctypes.c_int
            lib.ggq_extract_q6k.argtypes = [u8p, i8p, f32p, i64]
            lib.ggq_extract_q3k.restype = ctypes.c_int
            lib.ggq_extract_q3k.argtypes = [u8p, i8p, f32p, i64]
        except AttributeError:
            log.info("libggquant.so predates the planar fast paths; "
                     "codecs available, planar assembly stays on numpy")
        _lib = lib
    except OSError as e:
        log.info("native codec load failed: %s", e)
    return _lib


def available(qtype: int, *, decode: bool = False) -> bool:
    table = NATIVE_DECODE_QTYPES if decode else NATIVE_ENCODE_QTYPES
    return int(qtype) in table and get_lib() is not None


def quantize(x: np.ndarray, qtype: int) -> np.ndarray | None:
    """float array → packed (n_blocks, type_size) bytes, or None if the
    native path can't handle this qtype."""
    lib = get_lib()
    q = int(qtype)
    if lib is None or q not in NATIVE_ENCODE_QTYPES:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    bs = lib.ggq_block_size(q)
    ts = lib.ggq_type_size(q)
    if x.size % bs:
        return None
    out = np.empty((x.size // bs, ts), dtype=np.uint8)
    rc = lib.ggq_quantize(
        q, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), x.size)
    return out if rc == 0 else None


def pack_nib4_planar(q: np.ndarray, rp: int) -> np.ndarray | None:
    """(R, K) u8 codes → (K//2, rp) planar nibble plane (zero lane pad),
    the quant/planar.py nib4 assembly. None if the library is absent.

    The numpy form (contiguous byte transpose then nibble OR) runs at
    ~40 MB/s; the tiled C++ path runs at memory bandwidth — this is the
    difference between ~3 min and seconds of host time when loading a
    real 12B-param GGUF checkpoint."""
    lib = get_lib()
    if lib is None or hasattr(lib, "ggq_pack_nib4_planar") is False:
        return None
    R, K = q.shape
    if K % 2 or rp < R:
        return None
    q = np.ascontiguousarray(q, dtype=np.uint8)
    out = np.empty((K // 2, rp), dtype=np.uint8)
    rc = lib.ggq_pack_nib4_planar(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        R, K, rp)
    return out if rc == 0 else None


def extract_q4k(blocks: np.ndarray):
    """(n, 144) Q4_K blocks → (q (n,256) u8, A (n,8) f32, B (n,8) f32)
    matching codecs.components_Q4_K bit-exactly, or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ggq_extract_q4k"):
        return None
    blocks = np.ascontiguousarray(blocks).view(np.uint8).reshape(-1, 144)
    n = blocks.shape[0]
    q = np.empty((n, 256), dtype=np.uint8)
    A = np.empty((n, 8), dtype=np.float32)
    B = np.empty((n, 8), dtype=np.float32)
    rc = lib.ggq_extract_q4k(
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return (q, A, B) if rc == 0 else None


def _extract_scale_min(sym: str, type_size: int, blocks: np.ndarray,
                       ngroups: int):
    """Shared driver for the scale+min formats (Q4_K/Q5_K/Q2_K): emit
    (q u8 (n,256), A (n,ngroups) f32, B (n,ngroups) f32) or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, sym):
        return None
    blocks = np.ascontiguousarray(blocks).view(np.uint8) \
        .reshape(-1, type_size)
    n = blocks.shape[0]
    q = np.empty((n, 256), dtype=np.uint8)
    A = np.empty((n, ngroups), dtype=np.float32)
    B = np.empty((n, ngroups), dtype=np.float32)
    rc = getattr(lib, sym)(
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return (q, A, B) if rc == 0 else None


def _extract_signed(sym: str, type_size: int, blocks: np.ndarray):
    """Shared driver for the signed-code formats (Q6_K/Q3_K): emit
    (q i8 (n,256), A (n,16) f32) or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, sym):
        return None
    blocks = np.ascontiguousarray(blocks).view(np.uint8) \
        .reshape(-1, type_size)
    n = blocks.shape[0]
    q = np.empty((n, 256), dtype=np.int8)
    A = np.empty((n, 16), dtype=np.float32)
    rc = getattr(lib, sym)(
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return (q, A) if rc == 0 else None


def extract_q5k(blocks: np.ndarray):
    """(n, 176) Q5_K blocks → (q (n,256) u8, A (n,8) f32, B (n,8) f32)
    matching codecs.components_Q5_K bit-exactly, or None."""
    return _extract_scale_min("ggq_extract_q5k", 176, blocks, 8)


def extract_q2k(blocks: np.ndarray):
    """(n, 84) Q2_K blocks → (q (n,256) u8, A (n,16) f32, B (n,16) f32)
    matching codecs.components_Q2_K bit-exactly, or None."""
    return _extract_scale_min("ggq_extract_q2k", 84, blocks, 16)


def extract_q6k(blocks: np.ndarray):
    """(n, 210) Q6_K blocks → (q (n,256) i8, A (n,16) f32) matching
    codecs.components_Q6_K bit-exactly, or None."""
    return _extract_signed("ggq_extract_q6k", 210, blocks)


def extract_q3k(blocks: np.ndarray):
    """(n, 110) Q3_K blocks → (q (n,256) i8, A (n,16) f32) matching
    codecs.components_Q3_K bit-exactly, or None."""
    return _extract_signed("ggq_extract_q3k", 110, blocks)


def transpose_i8(q: np.ndarray, rp: int) -> np.ndarray | None:
    """(R, K) i8 codes → (K, rp) planar plane (zero lane pad)."""
    lib = get_lib()
    if lib is None or hasattr(lib, "ggq_transpose_i8") is False:
        return None
    R, K = q.shape
    if rp < R:
        return None
    q = np.ascontiguousarray(q, dtype=np.int8)
    out = np.empty((K, rp), dtype=np.int8)
    rc = lib.ggq_transpose_i8(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        R, K, rp)
    return out if rc == 0 else None


def dequantize(blocks: np.ndarray, qtype: int,
               n_elements: int) -> np.ndarray | None:
    lib = get_lib()
    q = int(qtype)
    if lib is None or q not in NATIVE_DECODE_QTYPES:
        return None
    blocks = np.ascontiguousarray(blocks).view(np.uint8).reshape(-1)
    from ..gguf.constants import GGML_QUANT_SIZES, GGMLQuantizationType

    bs, ts = GGML_QUANT_SIZES[GGMLQuantizationType(q)]
    need = (n_elements // bs) * ts
    if n_elements % bs or blocks.size < need:
        # a short buffer would make the C decoder read out of bounds
        raise ValueError(
            f"dequantize: qtype {q} needs {need} bytes for "
            f"{n_elements} elements, got {blocks.size}")
    out = np.empty(n_elements, dtype=np.float32)
    rc = lib.ggq_dequantize(
        q, blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_elements)
    return out if rc == 0 else None
