"""Worker for the two-process DCN test (tests/test_multihost.py).

Each process contributes 4 virtual CPU devices; jax.distributed wires the
two processes into one 8-device system. Validates the (host, dp, tp)
multihost mesh layout, batch_spec dispatch, and one quantized flux
forward with the batch split across "hosts" — the paths that only
execute when process_index > 0 exists (parallel/mesh.py).

Run: python tests/dcn_worker.py <process_id> <coordinator_port>
Prints one line: CHECKSUM <mean_abs> on success.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from comfyui_gguf_tpu.gguf.constants import GGMLQuantizationType as Q  # noqa: E402
from comfyui_gguf_tpu.models import flux, testing  # noqa: E402
from comfyui_gguf_tpu.nn.layers import QuantConfig  # noqa: E402
from comfyui_gguf_tpu.parallel.mesh import (  # noqa: E402
    batch_spec, make_multihost_mesh, shard_quant_params)

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8
assert jax.process_index() == pid

mesh = make_multihost_mesh(tp=2)
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
    "host": 2, "dp": 2, "tp": 2}
# ICI axes must stay process-local: every (dp, tp) plane of one host row
# belongs to one process
for h in range(2):
    procs = {d.process_index for d in mesh.devices[h].flat}
    assert len(procs) == 1, procs

dims = testing.TinyFluxDims()
sd = testing.flux_state_dict(dims, seed=0)
params = testing.quantize_flux_params(sd, qtype=Q.Q8_0)
params = shard_quant_params(params, mesh)
cfg = dims.config()
qcfg = QuantConfig(prefer_pallas=False)

B = 4  # one sample per (host, dp) group
img, img_ids, txt, txt_ids, t, y, g = testing.flux_example_inputs(
    dims, batch=B)
bs = NamedSharding(mesh, batch_spec(mesh))
# per-process local slice of the globally-sharded batch
img = jax.make_array_from_process_local_data(bs, np.asarray(img)[
    pid * (B // 2):(pid + 1) * (B // 2)])
txt = jax.make_array_from_process_local_data(bs, np.asarray(txt)[
    pid * (B // 2):(pid + 1) * (B // 2)])


@jax.jit
def fwd(params, img, txt):
    return flux.forward(params, cfg, img, img_ids, txt, txt_ids, t, y, g,
                        qcfg=qcfg)


out = fwd(params, img, txt)
out.block_until_ready()

from jax.experimental import multihost_utils  # noqa: E402

full = multihost_utils.process_allgather(out, tiled=True)
print(f"CHECKSUM {float(np.abs(np.asarray(full)).mean()):.6f}", flush=True)
