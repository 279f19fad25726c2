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


def replicate(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)
