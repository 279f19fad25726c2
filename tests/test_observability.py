"""Roofline math + memory accounting tests."""

import numpy as np

import jax.numpy as jnp

from comfyui_gguf_tpu import observability as obs
from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
from comfyui_gguf_tpu.quant import codecs, planar


def _pq(R=256, K=512, qtype=Q.Q4_K):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((R, K), dtype=np.float32)
    return planar.planarize(codecs.quantize(w, qtype), qtype, (R, K))


def test_qmm_roofline_math():
    pq = _pq()
    r = obs.qmm_roofline(pq, m=128, measured_s=1e-3, chip="v5e")
    assert r.flops == 2 * 128 * 512 * 256
    # Q4_K planar: 4bpw codes + f32 scales + f32 offsets per 32-group
    assert r.weight_bytes == pq.nbytes_packed
    assert r.sol_s > 0 and r.sol_fraction < 1.0
    rep = r.report()
    assert rep["achieved_tflops"] > 0 and rep["achieved_gbs"] > 0


def test_sol_is_max_of_compute_and_bandwidth():
    pq = _pq()
    r = obs.qmm_roofline(pq, m=1, chip="v5e")  # tiny m → bandwidth-bound
    tf, gbs = obs.CHIP_SPECS["v5e"]
    assert abs(r.sol_s - r.total_bytes / (gbs * 1e9)) < 1e-12
    r2 = obs.qmm_roofline(pq, m=100_000, chip="v5e")
    want = max(r2.flops / (tf * 1e12),
               r2.total_bytes / (gbs * 1e9))
    assert abs(r2.sol_s - want) < 1e-12


def test_memory_report():
    pq = _pq()
    params = {"w.weight": pq, "b.bias": jnp.zeros(256, jnp.float32)}
    rep = obs.memory_report(params)
    assert rep["n_packed"] == 1 and rep["n_dense"] == 1
    assert rep["largest_tensor"] == "w.weight"
    assert rep["compression"] > 1.5  # Q4_K planar ≈ 6 bpw vs 16 bpw
    assert rep["packed_bytes"] == pq.nbytes_packed + 256 * 4


def test_step_timer():
    t = obs.StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    snap = t.snapshot()
    assert snap["a"]["count"] == 2
