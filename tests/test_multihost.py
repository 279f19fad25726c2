"""Two-process DCN execution (VERDICT r1 item 5): jax.distributed over
localhost, (host, dp, tp) mesh, batch split across "hosts", one quantized
flux forward — compared against a single-process reference.

The reference has no distributed story at all (SURVEY.md §2.15); this
validates that the multihost layout actually EXECUTES with
process_index > 0, not just that it type-checks.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dcn_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "dcn_worker.py"),
             str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    sums = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("CHECKSUM")]
        assert lines, out
        sums.append(float(lines[-1].split()[1]))
    assert sums[0] == sums[1], sums  # both processes saw the same gather

    # single-process reference on the same seed/config
    from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q
    from comfyui_gguf_tpu.models import flux, testing
    from comfyui_gguf_tpu.nn.layers import QuantConfig

    dims = testing.TinyFluxDims()
    sd = testing.flux_state_dict(dims, seed=0)
    params = testing.quantize_flux_params(sd, qtype=Q.Q8_0)
    cfg = dims.config()
    inputs = testing.flux_example_inputs(dims, batch=4)
    ref = flux.forward(params, cfg, *inputs,
                       qcfg=QuantConfig(prefer_pallas=False))
    want = float(np.abs(np.asarray(ref)).mean())
    assert abs(sums[0] - want) < 5e-3 * max(1.0, abs(want)), (sums[0], want)
