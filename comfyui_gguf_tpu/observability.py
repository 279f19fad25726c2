"""Profiling, roofline accounting, and memory reporting.

The reference has no tracing/metrics beyond a qtype census log and the
VRAM-estimation hack (SURVEY.md §5); this module supplies the TPU-native
equivalents called for there: jax.profiler trace capture, per-matmul
roofline math (achieved HBM GB/s and TFLOP/s vs speed-of-light), and
packed-vs-dense memory reports.
"""

from __future__ import annotations

import contextlib
import logging
import dataclasses
import time

import numpy as np

from .quant.planar import PlanarQuant

# per-chip peaks for roofline normalization
CHIP_SPECS = {
    # bf16 TFLOP/s, HBM GB/s
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "cpu": (1.0, 50.0),
}


log = logging.getLogger(__name__)


def detect_chip() -> str:
    import jax

    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "v5p" in kind or "v5" in kind:
        return "v5p"
    if "v4" in kind:
        return "v4"
    if "tpu" in kind or d.platform == "tpu":
        # unknown TPU generation (v6e/trillium/...): CPU peaks would be
        # ~200x off — warn and use the newest known chip as the floor
        log.warning("unrecognized TPU kind %r; using v5e peaks for "
                    "roofline math", kind)
        return "v5e"
    return "cpu"


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


# ---------------------------------------------------------------------------
# roofline accounting for the fused dequant+matmul
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MatmulRoofline:
    """Ideal vs measured numbers for x(M,K) @ W(R,K)ᵀ with packed W."""

    m: int
    shape: tuple[int, int]
    flops: int
    weight_bytes: int
    act_bytes: int
    chip: str
    measured_s: float | None = None

    @property
    def total_bytes(self) -> int:
        return self.weight_bytes + self.act_bytes

    @property
    def sol_s(self) -> float:
        """Speed-of-light time: max(MXU time, HBM time)."""
        tf, gbs = CHIP_SPECS[self.chip]
        return max(self.flops / (tf * 1e12), self.total_bytes / (gbs * 1e9))

    @property
    def achieved_tflops(self) -> float | None:
        if not self.measured_s:
            return None
        return self.flops / self.measured_s / 1e12

    @property
    def achieved_gbs(self) -> float | None:
        if not self.measured_s:
            return None
        return self.total_bytes / self.measured_s / 1e9

    @property
    def sol_fraction(self) -> float | None:
        if not self.measured_s:
            return None
        return self.sol_s / self.measured_s

    def report(self) -> dict:
        out = {
            "shape": f"{self.m}x{self.shape[1]}x{self.shape[0]}",
            "flops": self.flops,
            "bytes": self.total_bytes,
            "sol_ms": round(self.sol_s * 1e3, 4),
            "chip": self.chip,
        }
        if self.measured_s:
            out.update({
                "measured_ms": round(self.measured_s * 1e3, 4),
                "achieved_tflops": round(self.achieved_tflops, 2),
                "achieved_gbs": round(self.achieved_gbs, 2),
                "sol_fraction": round(self.sol_fraction, 4),
            })
        return out


def qmm_roofline(pq: PlanarQuant, m: int, measured_s: float | None = None,
                 chip: str | None = None,
                 act_bytes_per_elem: int = 2) -> MatmulRoofline:
    R, K = pq.shape
    return MatmulRoofline(
        m=m, shape=pq.shape,
        flops=2 * m * K * R,
        weight_bytes=pq.nbytes_packed,
        act_bytes=(m * K + m * R) * act_bytes_per_elem,
        chip=chip or detect_chip(),
        measured_s=measured_s,
    )


# ---------------------------------------------------------------------------
# memory accounting (role of the reference's VRAM-estimation mechanism,
# reference loader.py:134-137 + ops.py:140-164)
# ---------------------------------------------------------------------------

def memory_report(params: dict) -> dict:
    """Packed vs would-be-dense bytes per param dict + largest tensor."""
    packed = dense16 = 0
    largest_key, largest_bytes = None, -1
    n_packed = n_dense = 0
    from .lora import PatchedWeight

    for k, v in params.items():
        # NOTE: hasattr(v, "base") is true for every numpy array (view
        # base) — must be a real type check or dense leaves get replaced
        # by their backing buffer (or None)
        if isinstance(v, PatchedWeight):
            v = v.base
        from .quant.i8 import I8Planar

        if isinstance(v, (PlanarQuant, I8Planar)):
            b = v.nbytes_packed
            packed += b
            dense16 += 2 * v.shape[0] * v.shape[1]
            n_packed += 1
        else:
            arr = np.asarray(v) if not hasattr(v, "nbytes") else v
            b = int(arr.nbytes)
            packed += b
            dense16 += b
            n_dense += 1
        if b > largest_bytes:
            largest_key, largest_bytes = k, b
    return {
        "packed_bytes": packed,
        "dense_bf16_bytes": dense16,
        "compression": round(dense16 / packed, 3) if packed else None,
        "largest_tensor": largest_key,
        "largest_tensor_bytes": largest_bytes,
        "n_packed": n_packed,
        "n_dense": n_dense,
    }


class StepTimer:
    """Wall-clock accumulator for named phases (lightweight metrics)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def snapshot(self) -> dict:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_ms": round(v / self.counts[k] * 1e3, 3)}
            for k, v in self.totals.items()
        }
