"""Scalar reference decoders for GGML blocks, written as straight-line loops
following llama.cpp's dequantize_row_* structure. Deliberately independent of
the vectorized implementation in comfyui_gguf_tpu.quant.codecs — used as the
hand-computed oracle in tests (SURVEY.md §4). All math in np.float32 scalars
so comparisons are bit-exact.
"""

import numpy as np

F32 = np.float32
KV = [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113]


def f16(lo, hi):
    return np.frombuffer(bytes([lo, hi]), dtype="<f2")[0].astype(np.float32)


def oracle_q8_0(b):
    d = f16(b[0], b[1])
    return [F32(d * F32(b[2 + i] - 256 if b[2 + i] > 127 else b[2 + i]))
            for i in range(32)]


def oracle_q4_0(b):
    d = f16(b[0], b[1])
    out = [None] * 32
    for i in range(16):
        out[i] = F32(d * F32((b[2 + i] & 0xF) - 8))
        out[i + 16] = F32(d * F32((b[2 + i] >> 4) - 8))
    return out


def oracle_q4_1(b):
    d = f16(b[0], b[1])
    m = f16(b[2], b[3])
    out = [None] * 32
    for i in range(16):
        out[i] = F32(F32(d * F32(b[4 + i] & 0xF)) + m)
        out[i + 16] = F32(F32(d * F32(b[4 + i] >> 4)) + m)
    return out


def oracle_q5_0(b):
    d = f16(b[0], b[1])
    qh = int.from_bytes(bytes(b[2:6]), "little")
    out = [None] * 32
    for i in range(16):
        q0 = (b[6 + i] & 0xF) | (((qh >> i) & 1) << 4)
        q1 = (b[6 + i] >> 4) | (((qh >> (i + 16)) & 1) << 4)
        out[i] = F32(d * F32(q0 - 16))
        out[i + 16] = F32(d * F32(q1 - 16))
    return out


def oracle_q5_1(b):
    d = f16(b[0], b[1])
    m = f16(b[2], b[3])
    qh = int.from_bytes(bytes(b[4:8]), "little")
    out = [None] * 32
    for i in range(16):
        q0 = (b[8 + i] & 0xF) | (((qh >> i) & 1) << 4)
        q1 = (b[8 + i] >> 4) | (((qh >> (i + 16)) & 1) << 4)
        out[i] = F32(F32(d * F32(q0)) + m)
        out[i + 16] = F32(F32(d * F32(q1)) + m)
    return out


def oracle_iq4_nl(b):
    d = f16(b[0], b[1])
    out = [None] * 32
    for i in range(16):
        out[i] = F32(d * F32(KV[b[2 + i] & 0xF]))
        out[i + 16] = F32(d * F32(KV[b[2 + i] >> 4]))
    return out


def _scale_min_k4(j, sc):
    if j < 4:
        return sc[j] & 63, sc[j + 4] & 63
    return (
        (sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4),
        (sc[j + 4] >> 4) | ((sc[j] >> 6) << 4),
    )


def oracle_q4_k(b):
    d = f16(b[0], b[1])
    dmin = f16(b[2], b[3])
    scales = b[4:16]
    qs = b[16:144]
    out = []
    ofs = 0
    for j in range(4):
        sc1, m1 = _scale_min_k4(2 * j, scales)
        sc2, m2 = _scale_min_k4(2 * j + 1, scales)
        d1, mm1 = F32(d * F32(sc1)), F32(dmin * F32(m1))
        d2, mm2 = F32(d * F32(sc2)), F32(dmin * F32(m2))
        for l in range(32):
            out.append(F32(F32(d1 * F32(qs[ofs + l] & 0xF)) - mm1))
        for l in range(32):
            out.append(F32(F32(d2 * F32(qs[ofs + l] >> 4)) - mm2))
        ofs += 32
    return out


def oracle_q5_k(b):
    d = f16(b[0], b[1])
    dmin = f16(b[2], b[3])
    scales = b[4:16]
    qh = b[16:48]
    qs = b[48:176]
    out = []
    ofs = 0
    u1, u2 = 1, 2
    for j in range(4):
        sc1, m1 = _scale_min_k4(2 * j, scales)
        sc2, m2 = _scale_min_k4(2 * j + 1, scales)
        d1, mm1 = F32(d * F32(sc1)), F32(dmin * F32(m1))
        d2, mm2 = F32(d * F32(sc2)), F32(dmin * F32(m2))
        for l in range(32):
            q = (qs[ofs + l] & 0xF) + (16 if qh[l] & u1 else 0)
            out.append(F32(F32(d1 * F32(q)) - mm1))
        for l in range(32):
            q = (qs[ofs + l] >> 4) + (16 if qh[l] & u2 else 0)
            out.append(F32(F32(d2 * F32(q)) - mm2))
        ofs += 32
        u1 <<= 2
        u2 <<= 2
    return out


def oracle_q6_k(b):
    ql = b[0:128]
    qh = b[128:192]
    sc = np.frombuffer(bytes(b[192:208]), dtype=np.int8)
    d = f16(b[208], b[209])
    out = [None] * 256
    for half in range(2):
        lofs, hofs, sofs, eofs = half * 64, half * 32, half * 8, half * 128
        for l in range(32):
            is_ = l // 16
            q1 = ((ql[lofs + l] & 0xF) | (((qh[hofs + l] >> 0) & 3) << 4)) - 32
            q2 = ((ql[lofs + l + 32] & 0xF) | (((qh[hofs + l] >> 2) & 3) << 4)) - 32
            q3 = ((ql[lofs + l] >> 4) | (((qh[hofs + l] >> 4) & 3) << 4)) - 32
            q4 = ((ql[lofs + l + 32] >> 4) | (((qh[hofs + l] >> 6) & 3) << 4)) - 32
            out[eofs + l] = F32(F32(d * F32(sc[sofs + is_])) * F32(q1))
            out[eofs + l + 32] = F32(F32(d * F32(sc[sofs + is_ + 2])) * F32(q2))
            out[eofs + l + 64] = F32(F32(d * F32(sc[sofs + is_ + 4])) * F32(q3))
            out[eofs + l + 96] = F32(F32(d * F32(sc[sofs + is_ + 6])) * F32(q4))
    return out


def oracle_q3_k(b):
    hmask = b[0:32]
    qs = b[32:96]
    raw_sc = b[96:108]
    d = f16(b[108], b[109])
    # unpack 16 6-bit signed scales
    sc = []
    for i in range(16):
        lo = (raw_sc[i % 8] >> (4 * (i // 8))) & 0xF
        hi = (raw_sc[8 + (i % 4)] >> (2 * (i // 4))) & 3
        sc.append(((lo | (hi << 4))) - 32)
    out = [None] * 256
    for e in range(256):
        g, r = divmod(e, 128)
        shift, byte = divmod(r, 32)
        ql = (qs[g * 32 + byte] >> (2 * shift)) & 3
        hbit = (hmask[e % 32] >> (e // 32)) & 1
        q = ql - (0 if hbit else 4)
        out[e] = F32(F32(d * F32(sc[e // 16])) * F32(q))
    return out


def oracle_q2_k(b):
    scales = b[0:16]
    qs = b[16:80]
    d = f16(b[80], b[81])
    dmin = f16(b[82], b[83])
    out = [None] * 256
    for e in range(256):
        g, r = divmod(e, 128)
        shift, byte = divmod(r, 32)
        q = (qs[g * 32 + byte] >> (2 * shift)) & 3
        s = scales[e // 16]
        dl = F32(d * F32(s & 0xF))
        ml = F32(dmin * F32(s >> 4))
        out[e] = F32(F32(dl * F32(q)) - ml)
    return out


def oracle_iq4_xs(b):
    d = f16(b[0], b[1])
    sh = int.from_bytes(bytes(b[2:4]), "little")
    sl = b[4:8]
    qs = b[8:136]
    out = []
    for j in range(8):
        lo = (sl[j // 2] >> (4 * (j % 2))) & 0xF
        hi = (sh >> (2 * j)) & 3
        ls = (lo | (hi << 4)) - 32
        dl = F32(d * F32(ls))
        for l in range(16):
            out.append(F32(dl * F32(KV[qs[j * 16 + l] & 0xF])))
        for l in range(16):
            out.append(F32(dl * F32(KV[qs[j * 16 + l] >> 4])))
    return out


ORACLES = {
    "Q8_0": oracle_q8_0,
    "Q4_0": oracle_q4_0,
    "Q4_1": oracle_q4_1,
    "Q5_0": oracle_q5_0,
    "Q5_1": oracle_q5_1,
    "IQ4_NL": oracle_iq4_nl,
    "Q4_K": oracle_q4_k,
    "Q5_K": oracle_q5_k,
    "Q6_K": oracle_q6_k,
    "Q3_K": oracle_q3_k,
    "Q2_K": oracle_q2_k,
    "IQ4_XS": oracle_iq4_xs,
}
