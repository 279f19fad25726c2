"""Microbenchmark: int8 MXU throughput vs bf16 on this chip.

Gate for the round-3 w8a8 qmm path: v5e lists int8 at ~394 TOPS vs
197 TFLOP/s bf16 — but only if Mosaic lowers s8xs8->s32 dots onto the
MXU at rate. Timing method: the tunnel memoizes (program, inputs) and
block_until_ready doesn't await scalar results, so each measurement runs
the op ITERS times inside one jitted data-dependent scan, fetches the
carry with device_get, and differences two ITERS values to cancel the
constant RTT/dispatch overhead (~26 ms).

Variants:
  * bf16xbf16->f32 baseline
  * s8xs8->s32, no scales (raw MXU int rate)
  * w8a8 epilogue-rescale: int32 acc across the k loop, one
    per-row (xs) x per-column (ws) f32 rescale at k==n_k-1 — the exact
    shape of ops/i8mm.py's kernel
  * same with whole-K tiles (n_k=1)
"""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, R = 4096, 3072, 12288
MT, RT = 512, 512
ITERS_LO, ITERS_HI = 100, 300


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_plain(in_dtype, acc_dtype, kt):
    n_k = K // kt

    def kernel(x_ref, w_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                              preferred_element_type=acc_dtype)

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    vmem = lambda b, im: pl.BlockSpec(b, im, memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel, grid=(M // MT, R // RT, n_k),
        in_specs=[vmem((MT, kt), lambda i, j, k: (i, k)),
                  vmem((kt, RT), lambda i, j, k: (k, j))],
        out_specs=vmem((MT, RT), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, R), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((MT, RT), acc_dtype)],
    )
    return f


def make_w8a8(kt, xs_lanes=128):
    """int32 acc across k; per-row*per-col f32 rescale in the epilogue."""
    n_k = K // kt

    def kernel(x_ref, w_ref, xs_ref, ws_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                              preferred_element_type=jnp.int32)

        @pl.when(k == n_k - 1)
        def _():
            accf = (acc_ref[:].astype(jnp.float32)
                    * xs_ref[:, 0:1] * ws_ref[0].astype(jnp.float32)[None, :])
            o_ref[:] = accf.astype(o_ref.dtype)

    vmem = lambda b, im: pl.BlockSpec(b, im, memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel, grid=(M // MT, R // RT, n_k),
        in_specs=[vmem((MT, kt), lambda i, j, k: (i, k)),
                  vmem((kt, RT), lambda i, j, k: (k, j)),
                  vmem((MT, xs_lanes), lambda i, j, k: (i, 0)),
                  vmem((1, RT), lambda i, j, k: (0, j))],
        out_specs=vmem((MT, RT), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, R), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((MT, RT), jnp.int32)],
    )
    return f


def bench(f, args, perturb_idx=0):
    """args[perturb_idx] gets a data-dependent tweak each scan step."""

    def make_many(iters):
        @jax.jit
        def many(*a):
            def body(c, _):
                aa = list(a)
                x = aa[perturb_idx]
                if x.dtype == jnp.int8:
                    aa[perturb_idx] = x ^ (c.astype(jnp.int32)
                                           % 127).astype(jnp.int8)
                else:
                    aa[perturb_idx] = x + c.astype(x.dtype) * 1e-6
                o = f(*aa)
                dep = o[0, 0].astype(jnp.float32)
                dep = jnp.where(jnp.isfinite(dep), dep, 0.0) * 1e-20
                return c + 1.0 + dep, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=iters)
            return c
        return many

    def variant(i):
        a = list(args)
        x = a[perturb_idx]
        if x.dtype == jnp.int8:
            a[perturb_idx] = x ^ jnp.int8(i + 1)
        else:
            a[perturb_idx] = x + (i + 1) * 1e-3
        jax.block_until_ready(a[perturb_idx])
        return a

    lo, hi = make_many(ITERS_LO), make_many(ITERS_HI)
    jax.device_get(lo(*variant(0)))   # compile
    jax.device_get(hi(*variant(0)))

    def timed(fn, i):
        a = variant(i)
        t0 = time.perf_counter()
        jax.device_get(fn(*a))
        return time.perf_counter() - t0

    t_lo = statistics.median(timed(lo, i) for i in (1, 2))
    t_hi = statistics.median(timed(hi, i) for i in (3, 4))
    return (t_hi - t_lo) / (ITERS_HI - ITERS_LO)


def main():
    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (M, K), jnp.bfloat16)
    wb = jax.random.normal(key, (K, R), jnp.bfloat16)
    x8 = jax.random.randint(key, (M, K), -127, 128, jnp.int8)
    w8 = jax.random.randint(key, (K, R), -127, 128, jnp.int8)
    xs = jnp.ones((M, 128), jnp.float32)
    ws = jnp.ones((1, R), jnp.float32)
    flops = 2 * M * K * R

    def run(tag, mk, args):
        try:
            dt = bench(mk, args)
            log(f"{tag}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} T/s")
        except Exception as e:
            log(f"{tag} FAILED: {type(e).__name__}: {str(e)[:400]}")

    run("bf16 kt=1536        ", make_plain(jnp.bfloat16, jnp.float32, 1536),
        (xb, wb))
    run("s8 raw kt=1536      ", make_plain(jnp.int8, jnp.int32, 1536),
        (x8, w8))
    run("s8 raw kt=3072      ", make_plain(jnp.int8, jnp.int32, 3072),
        (x8, w8))
    run("w8a8 rescale kt=1536", make_w8a8(1536), (x8, w8, xs, ws))
    run("w8a8 rescale kt=3072", make_w8a8(3072), (x8, w8, xs, ws))
    run("w8a8 rescale xs1 kt=1536", make_w8a8(1536, xs_lanes=1),
        (x8, w8, jnp.ones((M, 1), jnp.float32), ws))


if __name__ == "__main__":
    main()
