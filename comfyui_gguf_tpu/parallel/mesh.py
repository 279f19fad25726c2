"""Device mesh + sharding layout for packed quantized weights.

The reference is strictly single-GPU/single-process (SURVEY.md §2.14-2.15:
no parallelism of any kind); this subsystem is new TPU-native design. The
strategy (SURVEY.md §7.8):

* mesh axes ``("dp", "tp")`` — data parallel over requests/batch, tensor
  parallel over weight out-features.
* ``PlanarQuant`` leaves are stored K-major with out-features on the lane
  (minor) axis, so tensor-parallel sharding is a plain lane partition
  ``P(None, "tp")`` of codes/scales/offsets alike — the K-quant superblock
  never splits (it lives along the sublane axis), which is the same
  constraint the reference's C++ quantizer enforces on row widths
  (reference tools/lcpp.patch:229-239).
* GSPMD/pjit inserts the collectives; activations ride ``P("dp")`` batch
  sharding. XLA's latency-hiding scheduler overlaps the resulting
  all-gathers with compute.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.planar import PlanarQuant


def make_mesh(n_devices: int | None = None, tp: int | None = None,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh. tp defaults to all devices (pure TP)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if tp is None:
        tp = n
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    arr = np.array(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def make_multihost_mesh(tp: int | None = None, devices=None) -> Mesh:
    """(host, dp, tp) mesh for multi-host pods: the leading ``host`` axis
    maps to the slow DCN links, the inner axes to ICI.

    Layout rule (the scaling-book recipe): put ONLY the batch dimension on
    ``host`` — per-sample denoise steps need no cross-sample collective, so
    the only DCN traffic is request dispatch; tp collectives (psum per
    block) stay inside a host's ICI domain where they cost µs, not ms.
    Weight shardings never touch ``host``: every host holds a full packed
    replica (packed planar weights are 4-8× smaller than fp16, so a flux
    Q4_K replica is ~6 GB — replication is cheaper than paying DCN latency
    every layer).

    Under ``jax.distributed`` each process contributes its local devices;
    here the axis comes from ``process_index`` grouping. Single-process
    (tests, the 8-CPU virtual mesh): pass ``devices`` pre-grouped or get a
    1-host mesh."""
    if devices is None:
        devices = jax.devices()
    n_hosts = max(d.process_index for d in devices) + 1
    per_host = len(devices) // n_hosts
    if tp is None:
        tp = per_host
    if per_host % tp:
        raise ValueError(f"{per_host} per-host devices not divisible by "
                         f"tp={tp}")
    by_host = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.array(by_host).reshape(n_hosts, per_host // tp, tp)
    return Mesh(arr, ("host", "dp", "tp"))


def _tp_divisible(pq: PlanarQuant, tp: int) -> bool:
    return pq.padded_out % tp == 0


def shard_quant_params(params: dict, mesh: Mesh) -> dict:
    """Place a flat param dict on the mesh.

    PlanarQuant leaves: lane (out-feature) axis sharded over "tp".
    Dense leaves: replicated (norm scales / biases / embeddings are small
    compared to the packed 2-D weights that dominate HBM).
    """
    tp = mesh.shape["tp"]
    lane_sharded = NamedSharding(mesh, P(None, "tp"))
    repl = NamedSharding(mesh, P())

    out = {}
    for k, v in params.items():
        if isinstance(v, PlanarQuant) and _tp_divisible(v, tp):
            out[k] = jax.tree_util.tree_map(
                lambda leaf: jax.device_put(leaf, lane_sharded), v
            )
        else:
            out[k] = jax.tree_util.tree_map(
                lambda leaf: jax.device_put(leaf, repl), v
            ) if isinstance(v, PlanarQuant) else jax.device_put(v, repl)
    return out


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec for the batch axis: (host, dp) on multi-host meshes
    (DCN carries only request dispatch), plain dp otherwise."""
    return P(("host", "dp")) if "host" in mesh.shape else P("dp")


def replicate(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)
