// Fast GGML block codecs (C++, OpenMP) for the offline toolchain.
//
// Native-code counterpart of quant/codecs.py: the reference ships its
// quantizer as a patched llama.cpp C++ binary (reference tools/lcpp.patch);
// this framework's converter/quantizer runs in-process and calls this
// shared library through ctypes (native/__init__.py) for multi-GB models,
// falling back to the vectorized numpy encoders when the library isn't
// built. Outputs are byte-identical to the numpy implementations
// (asserted in tests/test_native.py).
//
// Build: see native/Makefile (g++ -O3 -shared -fopenmp).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// ---------------------------------------------------------------------------
// portable float <-> half
// ---------------------------------------------------------------------------

inline uint16_t f32_to_f16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    const uint32_t sign = (x >> 16) & 0x8000u;
    uint32_t mant = x & 0x007fffffu;
    int32_t exp = (int32_t)((x >> 23) & 0xff) - 127 + 15;
    if (((x >> 23) & 0xff) == 0xff && mant) {
        // NaN: keep it NaN (quiet bit + payload high bits) — mapping to
        // inf would silently diverge from the numpy codec
        return (uint16_t)(sign | 0x7e00u | (mant >> 13));
    }
    if (exp >= 31) return (uint16_t)(sign | 0x7c00u);  // inf/overflow
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;  // underflow to zero
        mant |= 0x00800000u;
        uint32_t shift = (uint32_t)(14 - exp);
        // round-to-nearest-even on the shifted-out bits
        uint32_t half = 1u << (shift - 1);
        uint32_t rounded = (mant + half - 1 + ((mant >> shift) & 1)) >> shift;
        return (uint16_t)(sign | rounded);
    }
    // round-to-nearest-even
    uint32_t round_bit = 0x00001000u;
    if ((mant & round_bit) && ((mant & (round_bit - 1)) || (mant & (round_bit << 1)))) {
        mant += round_bit;
        if (mant & 0x00800000u) { mant = 0; ++exp; if (exp >= 31) return (uint16_t)(sign | 0x7c00u); }
    }
    return (uint16_t)(sign | ((uint32_t)exp << 10) | (mant >> 13));
}

inline float f16_to_f32(uint16_t h) {
    const uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1f;
    uint32_t mant = h & 0x3ffu;
    uint32_t x;
    if (exp == 0) {
        if (mant == 0) { x = sign; }
        else {
            exp = 127 - 15 + 1;
            while (!(mant & 0x400u)) { mant <<= 1; --exp; }
            mant &= 0x3ffu;
            x = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        x = sign | 0x7f800000u | (mant << 13);
    } else {
        x = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &x, 4);
    return f;
}

inline float f16_round(float v) { return f16_to_f32(f32_to_f16(v)); }

inline float safe_inv(float d) { return d != 0.0f ? 1.0f / d : 0.0f; }

// ---------------------------------------------------------------------------
// Q8_0: 32 elems -> f16 d + 32 int8 (34 B)
// ---------------------------------------------------------------------------

void enc_q8_0_block(const float* x, uint8_t* dst) {
    float amax = 0.f;
    for (int i = 0; i < 32; ++i) amax = std::max(amax, std::fabs(x[i]));
    float d = f16_round(amax / 127.0f);
    uint16_t dh = f32_to_f16(amax / 127.0f);
    std::memcpy(dst, &dh, 2);
    float inv = safe_inv(d);
    int8_t* q = (int8_t*)(dst + 2);
    for (int i = 0; i < 32; ++i) {
        float v = nearbyintf(x[i] * inv);
        v = std::min(127.0f, std::max(-127.0f, v));
        q[i] = (int8_t)v;
    }
}

void dec_q8_0_block(const uint8_t* src, float* x) {
    uint16_t dh; std::memcpy(&dh, src, 2);
    float d = f16_to_f32(dh);
    const int8_t* q = (const int8_t*)(src + 2);
    for (int i = 0; i < 32; ++i) x[i] = d * (float)q[i];
}

// ---------------------------------------------------------------------------
// Q4_0: 32 elems -> f16 d + 16 nibble bytes (18 B); zero-point 8
// ---------------------------------------------------------------------------

void enc_q4_0_block(const float* x, uint8_t* dst) {
    float amax = 0.f, m = 0.f;
    for (int i = 0; i < 32; ++i) {
        float a = std::fabs(x[i]);
        if (a > amax) { amax = a; m = x[i]; }
    }
    float d = f16_round(m / -8.0f);
    uint16_t dh = f32_to_f16(m / -8.0f);
    std::memcpy(dst, &dh, 2);
    float inv = safe_inv(d);
    uint8_t q[32];
    for (int i = 0; i < 32; ++i) {
        float v = truncf(x[i] * inv + 8.5f);
        v = std::min(15.0f, std::max(0.0f, v));
        q[i] = (uint8_t)v;
    }
    for (int i = 0; i < 16; ++i) dst[2 + i] = (uint8_t)(q[i] | (q[16 + i] << 4));
}

void dec_q4_0_block(const uint8_t* src, float* x) {
    uint16_t dh; std::memcpy(&dh, src, 2);
    float d = f16_to_f32(dh);
    for (int i = 0; i < 16; ++i) {
        x[i] = d * (float)((int)(src[2 + i] & 0x0F) - 8);
        x[16 + i] = d * (float)((int)(src[2 + i] >> 4) - 8);
    }
}

// ---------------------------------------------------------------------------
// Q4_K / Q5_K: 256 elems, 8 sub-blocks of 32, affine fit (144 / 176 B)
// matches codecs._affine_fit_sub + encode_Q4_K/encode_Q5_K exactly
// ---------------------------------------------------------------------------

void pack_scale_min_k4(const uint8_t* sc, const uint8_t* mn, uint8_t* out12) {
    for (int i = 0; i < 4; ++i) {
        out12[i] = (uint8_t)((sc[i] & 0x3F) | ((sc[4 + i] >> 4) << 6));
        out12[4 + i] = (uint8_t)((mn[i] & 0x3F) | ((mn[4 + i] >> 4) << 6));
        out12[8 + i] = (uint8_t)((sc[4 + i] & 0x0F) | ((mn[4 + i] & 0x0F) << 4));
    }
}

template <int QMAX>
void affine_fit(const float* x, uint8_t* sc, uint8_t* mn, uint8_t* q,
                float* d16p, float* dmin16p) {
    float mn_sub[8], rng_sub[8];
    for (int s = 0; s < 8; ++s) {
        float lo = x[s * 32], hi = x[s * 32];
        for (int i = 1; i < 32; ++i) {
            lo = std::min(lo, x[s * 32 + i]);
            hi = std::max(hi, x[s * 32 + i]);
        }
        mn_sub[s] = std::max(0.0f, -lo);
        rng_sub[s] = hi + mn_sub[s];
    }
    float dmax = 0.f, mmax = 0.f;
    for (int s = 0; s < 8; ++s) {
        dmax = std::max(dmax, std::max(rng_sub[s], 0.0f) / QMAX);
        mmax = std::max(mmax, mn_sub[s]);
    }
    float d16 = f16_round(dmax / 63.0f);
    float dmin16 = f16_round(mmax / 63.0f);
    float invd = safe_inv(d16), invm = safe_inv(dmin16);
    for (int s = 0; s < 8; ++s) {
        float scv = nearbyintf(std::max(rng_sub[s], 0.0f) / QMAX * invd);
        float mnv = nearbyintf(mn_sub[s] * invm);
        sc[s] = (uint8_t)std::min(63.0f, std::max(0.0f, scv));
        mn[s] = (uint8_t)std::min(63.0f, std::max(0.0f, mnv));
        float S = d16 * (float)sc[s];
        float M = dmin16 * (float)mn[s];
        float invS = safe_inv(S);
        for (int i = 0; i < 32; ++i) {
            float v = nearbyintf((x[s * 32 + i] + M) * invS);
            q[s * 32 + i] = (uint8_t)std::min((float)QMAX, std::max(0.0f, v));
        }
    }
    *d16p = d16;
    *dmin16p = dmin16;
}

void enc_q4_k_block(const float* x, uint8_t* dst) {
    uint8_t sc[8], mn[8], q[256];
    float d16, dmin16;
    affine_fit<15>(x, sc, mn, q, &d16, &dmin16);
    uint16_t dh = f32_to_f16(d16), mh = f32_to_f16(dmin16);
    std::memcpy(dst, &dh, 2);
    std::memcpy(dst + 2, &mh, 2);
    pack_scale_min_k4(sc, mn, dst + 4);
    uint8_t* qs = dst + 16;
    for (int g = 0; g < 4; ++g)
        for (int i = 0; i < 32; ++i)
            qs[g * 32 + i] = (uint8_t)(q[g * 64 + i] | (q[g * 64 + 32 + i] << 4));
}

void dec_q4_k_block(const uint8_t* src, float* x) {
    uint16_t dh, mh;
    std::memcpy(&dh, src, 2); std::memcpy(&mh, src + 2, 2);
    float d = f16_to_f32(dh), dmin = f16_to_f32(mh);
    const uint8_t* s12 = src + 4;
    uint8_t sc[8], mn[8];
    for (int i = 0; i < 4; ++i) {
        sc[i] = s12[i] & 0x3F;
        mn[i] = s12[4 + i] & 0x3F;
        sc[4 + i] = (uint8_t)((s12[8 + i] & 0x0F) | ((s12[i] >> 2) & 0x30));
        mn[4 + i] = (uint8_t)((s12[8 + i] >> 4) | ((s12[4 + i] >> 2) & 0x30));
    }
    const uint8_t* qs = src + 16;
    for (int g = 0; g < 4; ++g) {
        float A0 = d * (float)sc[2 * g], B0 = dmin * (float)mn[2 * g];
        float A1 = d * (float)sc[2 * g + 1], B1 = dmin * (float)mn[2 * g + 1];
        for (int i = 0; i < 32; ++i) {
            x[g * 64 + i] = A0 * (float)(qs[g * 32 + i] & 0x0F) - B0;
            x[g * 64 + 32 + i] = A1 * (float)(qs[g * 32 + i] >> 4) - B1;
        }
    }
}

void enc_q5_k_block(const float* x, uint8_t* dst) {
    uint8_t sc[8], mn[8], q[256];
    float d16, dmin16;
    affine_fit<31>(x, sc, mn, q, &d16, &dmin16);
    uint16_t dh = f32_to_f16(d16), mh = f32_to_f16(dmin16);
    std::memcpy(dst, &dh, 2);
    std::memcpy(dst + 2, &mh, 2);
    pack_scale_min_k4(sc, mn, dst + 4);
    uint8_t* qh = dst + 16;
    uint8_t* qs = dst + 48;
    std::memset(qh, 0, 32);
    for (int s = 0; s < 8; ++s)
        for (int i = 0; i < 32; ++i)
            qh[i] |= (uint8_t)((q[s * 32 + i] >> 4) << s);
    for (int g = 0; g < 4; ++g)
        for (int i = 0; i < 32; ++i)
            qs[g * 32 + i] = (uint8_t)((q[g * 64 + i] & 0x0F) |
                                       ((q[g * 64 + 32 + i] & 0x0F) << 4));
}

// ---------------------------------------------------------------------------
// Q6_K: 256 elems, 16 sub-blocks of 16, signed 6-bit (210 B)
// ---------------------------------------------------------------------------

void enc_q6_k_block(const float* x, uint8_t* dst) {
    float amax_sub[16];
    for (int s = 0; s < 16; ++s) {
        float a = 0.f;
        for (int i = 0; i < 16; ++i)
            a = std::max(a, std::fabs(x[s * 16 + i]));
        amax_sub[s] = a;
    }
    float dmax = 0.f;
    for (int s = 0; s < 16; ++s) dmax = std::max(dmax, amax_sub[s] / 31.0f);
    float d16 = f16_round(dmax / 127.0f);
    float invd = safe_inv(d16);
    int8_t sc[16];
    uint8_t q[256];
    for (int s = 0; s < 16; ++s) {
        float scv = nearbyintf(amax_sub[s] / 31.0f * invd);
        sc[s] = (int8_t)std::min(127.0f, std::max(0.0f, scv));
        float S = d16 * (float)sc[s];
        float invS = safe_inv(S);
        for (int i = 0; i < 16; ++i) {
            float v = nearbyintf(x[s * 16 + i] * invS);
            v = std::min(31.0f, std::max(-32.0f, v));
            q[s * 16 + i] = (uint8_t)((int)v + 32);
        }
    }
    uint8_t* ql = dst;            // 128 B
    uint8_t* qh = dst + 128;      // 64 B
    uint8_t* scp = dst + 192;     // 16 B
    for (int h = 0; h < 2; ++h) {
        const uint8_t* qq = q + h * 128;
        for (int i = 0; i < 64; ++i)
            ql[h * 64 + i] = (uint8_t)((qq[i] & 0x0F) | ((qq[64 + i] & 0x0F) << 4));
        for (int i = 0; i < 32; ++i) {
            uint8_t b = 0;
            for (int s2 = 0; s2 < 4; ++s2)
                b |= (uint8_t)(((qq[s2 * 32 + i] >> 4) & 0x03) << (2 * s2));
            qh[h * 32 + i] = b;
        }
    }
    std::memcpy(scp, sc, 16);
    uint16_t dh = f32_to_f16(d16);
    std::memcpy(dst + 208, &dh, 2);
}

void dec_q6_k_block(const uint8_t* src, float* x) {
    const uint8_t* ql = src;
    const uint8_t* qh = src + 128;
    const int8_t* sc = (const int8_t*)(src + 192);
    uint16_t dh; std::memcpy(&dh, src + 208, 2);
    float d = f16_to_f32(dh);
    for (int h = 0; h < 2; ++h) {
        for (int i = 0; i < 64; ++i) {
            int lo0 = ql[h * 64 + i] & 0x0F;
            int lo1 = ql[h * 64 + i] >> 4;
            int i0 = h * 128 + i, i1 = h * 128 + 64 + i;
            int hi0 = (qh[h * 32 + (i % 32)] >> (2 * (i / 32))) & 0x03;
            int hi1 = (qh[h * 32 + (i % 32)] >> (2 * ((i + 64) / 32))) & 0x03;
            int q0 = (lo0 | (hi0 << 4)) - 32;
            int q1 = (lo1 | (hi1 << 4)) - 32;
            x[i0] = d * (float)sc[i0 / 16] * (float)q0;
            x[i1] = d * (float)sc[i1 / 16] * (float)q1;
        }
    }
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

// qtype codes match gguf.constants.GGMLQuantizationType
enum { GGQ_Q4_0 = 2, GGQ_Q8_0 = 8, GGQ_Q4_K = 12, GGQ_Q5_K = 13,
       GGQ_Q6_K = 14 };

int ggq_block_size(int qtype) {
    switch (qtype) {
        case GGQ_Q4_0: case GGQ_Q8_0: return 32;
        case GGQ_Q4_K: case GGQ_Q5_K: case GGQ_Q6_K: return 256;
        default: return 0;
    }
}

int ggq_type_size(int qtype) {
    switch (qtype) {
        case GGQ_Q4_0: return 18;
        case GGQ_Q8_0: return 34;
        case GGQ_Q4_K: return 144;
        case GGQ_Q5_K: return 176;
        case GGQ_Q6_K: return 210;
        default: return 0;
    }
}

// src: n floats (n % block == 0). dst: n/block * type_size bytes.
int ggq_quantize(int qtype, const float* src, uint8_t* dst, int64_t n) {
    int bs = ggq_block_size(qtype), ts = ggq_type_size(qtype);
    if (!bs || n % bs) return -1;
    int64_t nb = n / bs;
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nb; ++b) {
        const float* x = src + b * bs;
        uint8_t* d = dst + b * ts;
        switch (qtype) {
            case GGQ_Q4_0: enc_q4_0_block(x, d); break;
            case GGQ_Q8_0: enc_q8_0_block(x, d); break;
            case GGQ_Q4_K: enc_q4_k_block(x, d); break;
            case GGQ_Q5_K: enc_q5_k_block(x, d); break;
            case GGQ_Q6_K: enc_q6_k_block(x, d); break;
        }
    }
    return 0;
}

// Q4_K component extraction (codecs.components_Q4_K): per block emit
// q (256 u8 codes, sub-block order lo|hi per 32-byte group), A = d*sc
// (8 f32), B = -dmin*mn (8 f32). Matches the numpy extractor bit-exactly
// (same f16->f32, same integer unpacks).
int ggq_extract_q4k(const uint8_t* blocks, uint8_t* q, float* A, float* B,
                    int64_t n_blocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* src = blocks + b * 144;
        uint8_t* qb = q + b * 256;
        float* Ab = A + b * 8;
        float* Bb = B + b * 8;
        const float d = f16_to_f32((uint16_t)(src[0] | (src[1] << 8)));
        const float dmin = f16_to_f32((uint16_t)(src[2] | (src[3] << 8)));
        const uint8_t* s = src + 4;  // 12-byte 6-bit scale/min table
        for (int i = 0; i < 4; ++i) {
            const uint8_t sc_lo = (uint8_t)(s[i] & 0x3F);
            const uint8_t mn_lo = (uint8_t)(s[4 + i] & 0x3F);
            const uint8_t sc_hi =
                (uint8_t)((s[8 + i] & 0x0F) | ((s[i] >> 2) & 0x30));
            const uint8_t mn_hi =
                (uint8_t)((s[8 + i] >> 4) | ((s[4 + i] >> 2) & 0x30));
            Ab[i] = d * (float)sc_lo;
            Ab[4 + i] = d * (float)sc_hi;
            Bb[i] = -(dmin * (float)mn_lo);
            Bb[4 + i] = -(dmin * (float)mn_hi);
        }
        const uint8_t* qs = src + 16;  // 4 groups of 32 bytes
        for (int g = 0; g < 4; ++g) {
            const uint8_t* gp = qs + g * 32;
            uint8_t* lo = qb + g * 64;
            uint8_t* hi = lo + 32;
            for (int i = 0; i < 32; ++i) {
                lo[i] = (uint8_t)(gp[i] & 0x0F);
                hi[i] = (uint8_t)(gp[i] >> 4);
            }
        }
    }
    return 0;
}

// Q5_K component extraction (codecs.components_Q5_K): q (256 u8 5-bit
// codes, sub-block order lo|hi per 32-byte group with qh bit j for
// sub-block j), A = d*sc (8 f32), B = -dmin*mn (8 f32).
int ggq_extract_q5k(const uint8_t* blocks, uint8_t* q, float* A, float* B,
                    int64_t n_blocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* src = blocks + b * 176;
        uint8_t* qb = q + b * 256;
        float* Ab = A + b * 8;
        float* Bb = B + b * 8;
        const float d = f16_to_f32((uint16_t)(src[0] | (src[1] << 8)));
        const float dmin = f16_to_f32((uint16_t)(src[2] | (src[3] << 8)));
        const uint8_t* s = src + 4;  // 12-byte 6-bit scale/min table
        for (int i = 0; i < 4; ++i) {
            const uint8_t sc_lo = (uint8_t)(s[i] & 0x3F);
            const uint8_t mn_lo = (uint8_t)(s[4 + i] & 0x3F);
            const uint8_t sc_hi =
                (uint8_t)((s[8 + i] & 0x0F) | ((s[i] >> 2) & 0x30));
            const uint8_t mn_hi =
                (uint8_t)((s[8 + i] >> 4) | ((s[4 + i] >> 2) & 0x30));
            Ab[i] = d * (float)sc_lo;
            Ab[4 + i] = d * (float)sc_hi;
            Bb[i] = -(dmin * (float)mn_lo);
            Bb[4 + i] = -(dmin * (float)mn_hi);
        }
        const uint8_t* qh = src + 16;  // 32 bytes of 5th bits
        const uint8_t* qs = src + 48;  // 4 groups of 32 low-nibble bytes
        for (int g = 0; g < 4; ++g) {
            const uint8_t* gp = qs + g * 32;
            uint8_t* lo = qb + g * 64;  // sub-block 2g
            uint8_t* hi = lo + 32;      // sub-block 2g+1
            for (int i = 0; i < 32; ++i) {
                lo[i] = (uint8_t)((gp[i] & 0x0F)
                                  | (((qh[i] >> (2 * g)) & 1) << 4));
                hi[i] = (uint8_t)((gp[i] >> 4)
                                  | (((qh[i] >> (2 * g + 1)) & 1) << 4));
            }
        }
    }
    return 0;
}

// Q6_K component extraction (codecs.components_Q6_K): q (256 i8 codes,
// value range [-32, 31]), A = d*sc (16 f32, signed 8-bit scales).
int ggq_extract_q6k(const uint8_t* blocks, int8_t* q, float* A,
                    int64_t n_blocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* src = blocks + b * 210;
        const uint8_t* ql = src;         // 128 low-nibble bytes
        const uint8_t* qh = src + 128;   // 64 bytes of 2-bit highs
        const int8_t* sc = (const int8_t*)(src + 192);  // 16 i8 scales
        const float d =
            f16_to_f32((uint16_t)(src[208] | (src[209] << 8)));
        int8_t* qb = q + b * 256;
        float* Ab = A + b * 16;
        for (int i = 0; i < 16; ++i) Ab[i] = d * (float)sc[i];
        for (int h = 0; h < 2; ++h) {
            const uint8_t* l = ql + h * 64;
            const uint8_t* hh = qh + h * 32;
            int8_t* out = qb + h * 128;
            for (int i = 0; i < 32; ++i) {
                out[i] = (int8_t)((int)((l[i] & 0x0F)
                                        | (((hh[i] >> 0) & 3) << 4)) - 32);
                out[32 + i] = (int8_t)((int)((l[32 + i] & 0x0F)
                                             | (((hh[i] >> 2) & 3) << 4))
                                       - 32);
                out[64 + i] = (int8_t)((int)((l[i] >> 4)
                                             | (((hh[i] >> 4) & 3) << 4))
                                       - 32);
                out[96 + i] = (int8_t)((int)((l[32 + i] >> 4)
                                             | (((hh[i] >> 6) & 3) << 4))
                                       - 32);
            }
        }
    }
    return 0;
}

// Q3_K component extraction (codecs.components_Q3_K): q (256 i8 codes,
// ql - 4*(1 - high_bit)), A = d*sc (16 f32, 6-bit signed scales).
int ggq_extract_q3k(const uint8_t* blocks, int8_t* q, float* A,
                    int64_t n_blocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* src = blocks + b * 110;
        const uint8_t* hmask = src;        // 32 bytes of high bits
        const uint8_t* qs = src + 32;      // 64 bytes of 2-bit lows
        const uint8_t* scales = src + 96;  // 12-byte 6-bit scale table
        const float d =
            f16_to_f32((uint16_t)(src[108] | (src[109] << 8)));
        int8_t* qb = q + b * 256;
        float* Ab = A + b * 16;
        for (int j = 0; j < 16; ++j) {
            const uint8_t lo4 = (j < 8) ? (uint8_t)(scales[j] & 0x0F)
                                        : (uint8_t)(scales[j - 8] >> 4);
            const uint8_t hi2 =
                (uint8_t)((scales[8 + (j & 3)] >> (2 * (j >> 2))) & 3);
            Ab[j] = d * (float)((int8_t)(lo4 | (hi2 << 4)) - 32);
        }
        for (int h = 0; h < 2; ++h) {
            const uint8_t* g = qs + h * 32;
            for (int s = 0; s < 4; ++s) {
                int8_t* out = qb + h * 128 + s * 32;
                const int sh = h * 4 + s;  // hmask bit index for this sub
                for (int i = 0; i < 32; ++i) {
                    const int lo = (g[i] >> (2 * s)) & 3;
                    const int hb = (hmask[i] >> sh) & 1;
                    out[i] = (int8_t)(lo - ((hb ^ 1) << 2));
                }
            }
        }
    }
    return 0;
}

// Q2_K component extraction (codecs.components_Q2_K): q (256 u8 2-bit
// codes), A = d*(scale&0xF) (16 f32), B = -dmin*(scale>>4) (16 f32).
int ggq_extract_q2k(const uint8_t* blocks, uint8_t* q, float* A, float* B,
                    int64_t n_blocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* src = blocks + b * 84;
        const uint8_t* scales = src;   // 16 bytes: lo4 scale, hi4 min
        const uint8_t* qs = src + 16;  // 64 bytes of 2-bit codes
        const float d = f16_to_f32((uint16_t)(src[80] | (src[81] << 8)));
        const float dmin =
            f16_to_f32((uint16_t)(src[82] | (src[83] << 8)));
        uint8_t* qb = q + b * 256;
        float* Ab = A + b * 16;
        float* Bb = B + b * 16;
        for (int i = 0; i < 16; ++i) {
            Ab[i] = d * (float)(scales[i] & 0x0F);
            Bb[i] = -(dmin * (float)(scales[i] >> 4));
        }
        for (int h = 0; h < 2; ++h) {
            const uint8_t* g = qs + h * 32;
            for (int s = 0; s < 4; ++s) {
                uint8_t* out = qb + h * 128 + s * 32;
                for (int i = 0; i < 32; ++i)
                    out[i] = (uint8_t)((g[i] >> (2 * s)) & 3);
            }
        }
    }
    return 0;
}

// Planar re-tiling fast paths (quant/planar.py assembly): the hot cost
// of loading a real multi-GB checkpoint is the byte-granular (R, K) ->
// (K, R) transpose — numpy materializes it at ~40 MB/s (cache-hostile
// strided writes). Tiled transposes run at memory bandwidth.

// dst (K/2, rp), zero-padded beyond R: dst[j, r] = q[r, j] | q[r, j+K/2]<<4
// (the nib4 global K-split: low nibble row j, high nibble row j+K/2).
int ggq_pack_nib4_planar(const uint8_t* q, uint8_t* dst,
                         int64_t R, int64_t K, int64_t rp) {
    if (K % 2 || rp < R) return -1;
    const int64_t Kh = K / 2;
    const int64_t T = 64;  // tile edge (fits L1 both ways)
#pragma omp parallel for schedule(static)
    for (int64_t j0 = 0; j0 < Kh; j0 += T) {
        const int64_t j1 = j0 + T < Kh ? j0 + T : Kh;
        for (int64_t r0 = 0; r0 < R; r0 += T) {
            const int64_t r1 = r0 + T < R ? r0 + T : R;
            for (int64_t r = r0; r < r1; ++r) {
                const uint8_t* lo = q + r * K;
                const uint8_t* hi = lo + Kh;
                for (int64_t j = j0; j < j1; ++j)
                    dst[j * rp + r] =
                        (uint8_t)(lo[j] | (uint8_t)(hi[j] << 4));
            }
        }
        // zero the lane padding for this row stripe
        for (int64_t j = j0; j < j1; ++j)
            for (int64_t r = R; r < rp; ++r) dst[j * rp + r] = 0;
    }
    return 0;
}

// dst (K, rp) int8, zero-padded beyond R: dst[j, r] = q[r, j]
int ggq_transpose_i8(const int8_t* q, int8_t* dst,
                     int64_t R, int64_t K, int64_t rp) {
    if (rp < R) return -1;
    const int64_t T = 64;
#pragma omp parallel for schedule(static)
    for (int64_t j0 = 0; j0 < K; j0 += T) {
        const int64_t j1 = j0 + T < K ? j0 + T : K;
        for (int64_t r0 = 0; r0 < R; r0 += T) {
            const int64_t r1 = r0 + T < R ? r0 + T : R;
            for (int64_t r = r0; r < r1; ++r) {
                const int8_t* row = q + r * K;
                for (int64_t j = j0; j < j1; ++j)
                    dst[j * rp + r] = row[j];
            }
        }
        for (int64_t j = j0; j < j1; ++j)
            for (int64_t r = R; r < rp; ++r) dst[j * rp + r] = 0;
    }
    return 0;
}

int ggq_dequantize(int qtype, const uint8_t* src, float* dst, int64_t n) {
    int bs = ggq_block_size(qtype), ts = ggq_type_size(qtype);
    if (!bs || n % bs) return -1;
    if (qtype == GGQ_Q5_K) return -2;  // decode via numpy path
    int64_t nb = n / bs;
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* s = src + b * ts;
        float* x = dst + b * bs;
        switch (qtype) {
            case GGQ_Q4_0: dec_q4_0_block(s, x); break;
            case GGQ_Q8_0: dec_q8_0_block(s, x); break;
            case GGQ_Q4_K: dec_q4_k_block(s, x); break;
            case GGQ_Q6_K: dec_q6_k_block(s, x); break;
        }
    }
    return 0;
}

}  // extern "C"
