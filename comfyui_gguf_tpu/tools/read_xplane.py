"""Summarize a jax.profiler xplane capture: per-op device time ranking.

Usage: python -m comfyui_gguf_tpu.tools.read_xplane <trace_dir_or_pb> [top_n]

Parses the ``/device:TPU:*`` plane of ``*.xplane.pb`` (the device
timeline) and prints total duration, call count, and share per XLA op,
grouped by a readable op label. This is the ground-truth view that the
roofline estimates in observability.py are checked against — e.g. it is
how the phantom "K-heavy kernel plateau" was traced to benchmark-harness
copies rather than the kernel (docs/NOTES_ROUND1.md).

Requires the baked-in tensorflow's xplane proto bindings; set
``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python`` if the fast-proto
runtime rejects the generated code (done automatically below).
"""

from __future__ import annotations

import glob
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def _find_pb(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return hits[-1]  # latest capture


def _label(op_name: str) -> str:
    """Collapse an HLO op name to a readable family label."""
    m = re.match(r"%?([A-Za-z0-9_.\-]+)", op_name)
    name = m.group(1) if m else op_name
    name = re.sub(r"\.\d+$", "", name)  # strip SSA counter
    for pat, lab in (
        (r"pallas|custom-call", "pallas/custom-call"),
        (r"^fusion|_fusion", "fusion"),
        # async DMA issue/rendezvous (copy-start/copy-done) OVERLAPS
        # compute on the other line events — separate it from sync
        # copies so an op-sum > wall reads correctly
        (r"copy-start|copy-done", "copy-async(dma)"),
        (r"^copy", "copy"),
        (r"^slice|dynamic-slice", "slice"),
        (r"^while", "while-wrapper"),
        (r"convolution|conv", "convolution"),
        (r"^dot|gemm", "dot"),
        (r"all-reduce|all-gather|reduce-scatter|collective", "collective"),
    ):
        if re.search(pat, name):
            return lab
    return name


def summarize(path: str, top_n: int = 20) -> list[dict]:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E501  (baked-in TF)

    pb = _find_pb(path)
    xs = xplane_pb2.XSpace()
    with open(pb, "rb") as f:
        xs.ParseFromString(f.read())

    rows: dict[tuple, dict] = {}
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # ONLY the "XLA Ops" line(s): "Steps"/"XLA TraceMe" are
            # container events spanning every op beneath them —
            # aggregating them doubled TOTAL and diluted every share
            if "XLA Ops" not in line.name:
                continue
            agg: dict[str, list] = defaultdict(lambda: [0, 0, ""])
            for ev in line.events:
                nm = meta.get(ev.metadata_id, "?")
                lab = _label(nm)
                # skip the outer while wrapper: it contains everything
                if lab == "while-wrapper":
                    continue
                a = agg[lab]
                a[0] += ev.duration_ps
                a[1] += 1
                a[2] = nm[:100]
            for lab, (ps, n, example) in agg.items():
                key = (plane.name, lab)
                r = rows.setdefault(key, {"plane": plane.name, "op": lab,
                                          "ms": 0.0, "count": 0,
                                          "example": example})
                r["ms"] += ps / 1e9
                r["count"] += n

    out = sorted(rows.values(), key=lambda r: -r["ms"])
    total = sum(r["ms"] for r in out)
    for r in out:
        r["share"] = r["ms"] / total if total else 0.0
    return out[:top_n]


def main(argv=None):
    argv = argv or sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    top_n = int(argv[1]) if len(argv) > 1 else 20
    rows = summarize(argv[0], top_n)
    # grand total over ALL ops (shares were computed against it), not
    # the truncated display — otherwise shares never reconcile with TOTAL
    total = (rows[0]["ms"] / rows[0]["share"]
             if rows and rows[0]["share"] else 0.0)
    shown = sum(r["ms"] for r in rows)
    print(f"{'op':<24}{'ms':>10}{'calls':>8}{'share':>8}  example")
    for r in rows:
        print(f"{r['op']:<24}{r['ms']:>10.2f}{r['count']:>8}"
              f"{r['share']:>8.1%}  {r['example'][:60]}")
    print(f"{'TOTAL (all ops)':<24}{total:>10.2f}   shown {shown:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


def module_ms(path: str) -> dict[str, tuple[float, int]]:
    """Total device time per XLA module (the 'XLA Modules' line):
    {module_name: (total_ms, run_count)}. The most trustworthy whole-jit
    timing through the remote tunnel — no host RTT, no differencing."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pb = _find_pb(path)
    xs = xplane_pb2.XSpace()
    with open(pb, "rb") as f:
        xs.ParseFromString(f.read())
    out: dict[str, list] = {}
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                nm = re.sub(r"\(\d+\)$", "", meta.get(ev.metadata_id, "?"))
                r = out.setdefault(nm, [0.0, 0])
                r[0] += ev.duration_ps / 1e9
                r[1] += 1
    return {k: (v[0], v[1]) for k, v in out.items()}
