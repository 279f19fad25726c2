"""Model lifecycle: HBM-budget residency manager (host↔device offload).

Role of the reference stack's ModelPatcher load/offload tiers (ComfyUI
model_management: lowvram partial loads, LRU model eviction — the plugin
hooks it via ``mmap_released`` / patcher clones, reference nodes.py:34-132).

The torch design streams layer-by-layer because a 24 GB GPU can't hold
model + activations; on TPU the packed planar weights are 4-8× smaller
than fp16, so whole-model residency is the common case and the unit of
offload is the MODEL, not the layer: params trees move between host RAM
(numpy leaves) and device HBM (jax leaves) wholesale. jit caches key on
shape/dtype, not buffer identity, so a model re-acquired after eviction
reuses its compiled executables.

Typical use — three encoders + DiT + VAE sharing one 16 GB v5e chip:

    reg = ResidencyManager(hbm_budget=12 << 30)
    reg.register("t5", t5_params); reg.register("flux", flux_params)
    with reg.acquire("t5") as p:   # evicts LRU models if over budget
        ctx = t5.encode(p, ...)
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
from collections import OrderedDict

import jax
import numpy as np

log = logging.getLogger(__name__)


def _leaf_bytes(leaf) -> int:
    return leaf.size * leaf.dtype.itemsize if hasattr(leaf, "size") else 0


def tree_bytes(params) -> int:
    return sum(_leaf_bytes(x) for x in jax.tree_util.tree_leaves(params))


def to_host(params):
    """Device → host RAM: numpy leaves (frees HBM once device refs drop)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)),
                                  params)


def free_tree(params) -> None:
    """Delete the device buffers of every jax.Array leaf in ``params``.

    Unlike dropping python references, this frees HBM even when the
    caller (or an engine closure) still holds the tree — the arrays
    become "deleted" and any later compute on them raises. Use after
    registering a model with a ResidencyManager (whose host copy is the
    durable source) or after a stacked/converted copy supersedes the
    original tree."""
    for leaf in jax.tree_util.tree_leaves(params):
        if isinstance(leaf, jax.Array) and hasattr(leaf, "delete"):
            leaf.delete()


def to_device(params, device=None):
    dev = device or jax.devices()[0]
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), params)


@dataclasses.dataclass
class _Entry:
    host: object  # host-resident tree (numpy leaves), the durable copy
    device: object | None  # device tree or None when evicted
    nbytes: int
    pins: int = 0


class ResidencyManager:
    """LRU residency manager for whole-model param trees.

    ``acquire`` returns a context manager yielding the device-resident
    tree; while pinned, the model cannot be evicted. When placing a model
    would exceed ``hbm_budget``, least-recently-used unpinned models are
    evicted (their device copy dropped — the host copy persists)."""

    def __init__(self, hbm_budget: int | None = None, device=None):
        self.hbm_budget = hbm_budget
        self.device = device
        self._models: OrderedDict[str, _Entry] = OrderedDict()

    def register(self, name: str, params, keep_device: bool = False,
                 free_source: bool = False) -> None:
        """Add a model. ``params`` may be host- or device-resident; a host
        copy is kept as the durable source. keep_device=True places it
        immediately (counting against the budget).

        free_source=True deletes the device buffers of the CALLER'S tree
        after the host copy is made. Without it, a device-resident source
        that stays referenced (engine closures, the caller's local) keeps
        its HBM forever and the budget is not actually enforced — LRU
        eviction only drops the manager's own copies."""
        if name in self._models:
            raise ValueError(f"model {name!r} already registered")
        host = to_host(params)
        if free_source:
            log.info("register(%r): freeing the caller's device buffers "
                     "(free_source=True) — further use of the source "
                     "tree will raise; read through the manager", name)
            free_tree(params)
        entry = _Entry(host=host, device=None, nbytes=tree_bytes(host))
        self._models[name] = entry
        if keep_device:
            self._ensure_resident(name)

    def unregister(self, name: str) -> None:
        if self._models[name].pins:
            raise RuntimeError(f"model {name!r} is pinned")
        del self._models[name]

    def device_bytes(self) -> int:
        return sum(e.nbytes for e in self._models.values()
                   if e.device is not None)

    def _evict_until(self, needed: int) -> None:
        if self.hbm_budget is None:
            return
        for name in list(self._models):  # oldest first
            if self.device_bytes() + needed <= self.hbm_budget:
                return
            e = self._models[name]
            if e.device is not None and not e.pins:
                log.info("evicting %s (%.1f MB) to host", name,
                         e.nbytes / 2**20)
                e.device = None
        if self.device_bytes() + needed > self.hbm_budget:
            if needed > self.hbm_budget:
                raise MemoryError(
                    f"model needs {needed} bytes but hbm_budget is only "
                    f"{self.hbm_budget} — raise the budget")
            pinned = [n for n, e in self._models.items()
                      if e.device is not None and e.pins]
            raise MemoryError(
                f"cannot free {needed} bytes: pinned resident models "
                f"{pinned or 'none'} hold "
                f"{self.device_bytes()} of {self.hbm_budget}")

    def _ensure_resident(self, name: str):
        e = self._models[name]
        self._models.move_to_end(name)  # most-recently-used
        if e.device is None:
            self._evict_until(e.nbytes)
            e.device = to_device(e.host, self.device)
        return e

    def resident_params(self, name: str):
        """Device tree for ``name``, loading (and LRU-evicting other
        unpinned models) as needed — the unpinned read used by
        per-tick params providers (serving.ResidentModelServer)."""
        return self._ensure_resident(name).device

    @contextlib.contextmanager
    def acquire(self, name: str):
        e = self._ensure_resident(name)
        e.pins += 1
        try:
            yield e.device
        finally:
            e.pins -= 1

    def evict(self, name: str) -> None:
        e = self._models[name]
        if e.pins:
            raise RuntimeError(f"model {name!r} is pinned")
        e.device = None

    def stats(self) -> dict:
        return {
            name: {"bytes": e.nbytes,
                   "resident": e.device is not None,
                   "pinned": bool(e.pins)}
            for name, e in self._models.items()
        }
