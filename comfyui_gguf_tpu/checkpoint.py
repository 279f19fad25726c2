"""Planar checkpoint cache: save/load re-tiled param trees.

GGUF → planar re-tiling is a one-time host-side cost (component
extraction + K-major transpose over every tensor, seconds-to-minutes for
10-GB models). Serving fleets pay it on every cold start; this module
makes it a cache: the planarized tree round-trips through one ``.npz``
file whose arrays are already in device layout, so a warm load is a
straight mmap → ``device_put`` stream.

No reference counterpart (the reference re-dequantizes from the GGUF at
every load; its cache is the OS page cache of the mmap'd file —
loader.py reads, ops.py dequantizes per forward).

Format: numpy ``.npz`` (zip of .npy). Each PlanarQuant leaf writes its
arrays under ``<key>/qs``, ``<key>/scales``, ``<key>/offsets`` plus one
JSON metadata row; dense leaves write ``<key>/dense``. bf16 arrays are
bit-cast to uint16 (npz has no bfloat16 dtype).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .quant.planar import PlanarQuant

_MAGIC = "comfyui-gguf-tpu-planar-v1"


def _to_np(x):
    a = np.asarray(jax.device_get(x))
    if a.dtype == jnp.bfloat16:
        return a.view(np.uint16), "bfloat16"
    return a, str(a.dtype)


def _from_np(a, dtype):
    if dtype == "bfloat16":
        return jnp.asarray(a.view(jnp.bfloat16))
    return jnp.asarray(a)


def save_params(path: str, params: dict) -> None:
    # np.savez silently appends ".npz" to bare paths; normalize up front so
    # save_params(p) / load_params(p) agree on the on-disk name
    if not str(path).endswith(".npz"):
        path = f"{path}.npz"
    arrays: dict[str, np.ndarray] = {}
    meta: dict[str, dict] = {}
    for key, v in params.items():
        if isinstance(v, PlanarQuant):
            qs, qs_dt = _to_np(v.qs)
            sc, sc_dt = _to_np(v.scales)
            arrays[f"{key}/qs"] = qs
            arrays[f"{key}/scales"] = sc
            m = {"kind": "planar", "qtype": v.qtype, "layout": v.layout,
                 "group_size": v.group_size, "zero_point": v.zero_point,
                 "shape": list(v.shape), "qs_dtype": qs_dt,
                 "sc_dtype": sc_dt}
            if v.offsets is not None:
                of, of_dt = _to_np(v.offsets)
                arrays[f"{key}/offsets"] = of
                m["of_dtype"] = of_dt
            meta[key] = m
        elif type(v).__name__ == "I8Planar":
            qs, qs_dt = _to_np(v.qs)
            sc, sc_dt = _to_np(v.scales)
            arrays[f"{key}/qs"] = qs
            arrays[f"{key}/scales"] = sc
            meta[key] = {"kind": "i8", "qtype": v.qtype,
                         "shape": list(v.shape), "qs_dtype": qs_dt,
                         "sc_dtype": sc_dt}
        else:
            a, dt = _to_np(v)
            if a.dtype == object:
                # np.savez would silently pickle this and load_params
                # could never read it back (allow_pickle=False) — fail
                # NOW with the offending key instead of corrupting the
                # cache (detach LoRA patches before caching)
                raise TypeError(
                    f"save_params: {key!r} is not an array leaf "
                    f"({type(v).__name__}); detach patches / flatten "
                    "custom leaves before caching")
            arrays[f"{key}/dense"] = a
            meta[key] = {"kind": "dense", "dtype": dt}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"magic": _MAGIC, "keys": meta}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_params(path: str, device=None) -> dict:
    if not str(path).endswith(".npz") and not os.path.exists(path):
        path = f"{path}.npz"
    z = np.load(path)
    head = json.loads(bytes(z["__meta__"]).decode())
    if head.get("magic") != _MAGIC:
        raise ValueError(f"{path}: not a planar checkpoint")
    put = ((lambda x: jax.device_put(x, device)) if device is not None
           else (lambda x: x))
    out: dict[str, object] = {}
    for key, m in head["keys"].items():
        if m["kind"] == "dense":
            out[key] = put(_from_np(z[f"{key}/dense"], m["dtype"]))
        elif m["kind"] == "i8":
            from .quant.i8 import I8Planar

            out[key] = I8Planar(
                qs=put(_from_np(z[f"{key}/qs"], m["qs_dtype"])),
                scales=put(_from_np(z[f"{key}/scales"], m["sc_dtype"])),
                qtype=int(m["qtype"]), shape=tuple(m["shape"]))
        else:
            offsets = None
            if f"{key}/offsets" in z:
                offsets = put(_from_np(z[f"{key}/offsets"], m["of_dtype"]))
            out[key] = PlanarQuant(
                qs=put(_from_np(z[f"{key}/qs"], m["qs_dtype"])),
                scales=put(_from_np(z[f"{key}/scales"], m["sc_dtype"])),
                offsets=offsets,
                qtype=int(m["qtype"]), layout=m["layout"],
                group_size=int(m["group_size"]),
                zero_point=int(m["zero_point"]),
                shape=tuple(m["shape"]),
            )
    return out
