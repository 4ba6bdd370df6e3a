"""Checkpointing of (possibly compressed) model parameters.

The reference only caches calibration Hessians (``main.py:47-49``); it never
checkpoints compressed weights — every run re-decomposes. Here the packed
representation (codes, scales, L/R factors, per-layer bit config) is saved
so decomposition runs once and serving restarts cheaply.

Format: a directory with ``params.npz`` (all array leaves, keyed by pytree
path) and ``manifest.json`` (tree structure + static metadata + model
config). This is self-describing and dependency-free; orbax can be layered
on top for multi-host async checkpointing.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, DenseLinear)
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    LayerParams, ModelParams)


_DTYPES: dict = {}     # populated per save; written into the manifest


def _np(x):
    """numpy-ify a JAX array; bf16 is stored as f32 (npz has no bf16)."""
    import jax.numpy as jnp
    a = np.asarray(x)
    if a.dtype == np.dtype("V2") or str(x.dtype) == "bfloat16":
        return np.asarray(x, np.float32), "bfloat16"
    return a, str(a.dtype)


def _encode_linear(lin, prefix, arrays):
    def put(key, val):
        arrays[key], _DTYPES[key] = _np(val)

    if isinstance(lin, DenseLinear):
        put(f"{prefix}.w", lin.w)
        if lin.b is not None:
            put(f"{prefix}.b", lin.b)
        return {"kind": "dense", "has_bias": lin.b is not None}
    assert isinstance(lin, CalderaLinear)
    if lin.q_method == "e8p":
        # store the 2-bit lattice codes, not the 4-bit serving pack: the
        # int4 form is an HBM-resident decode of the codes and is rebuilt
        # losslessly at load (ops/lattice.py int4<->code round trip)
        from ee274_convexcaldera_llm_quantization_tpu.ops import lattice
        put(f"{prefix}.e8p_codes", lattice.int4_planes_to_codes(lin.packed))
    else:
        put(f"{prefix}.packed", lin.packed)
    put(f"{prefix}.scales", lin.scales)
    put(f"{prefix}.L", lin.L)
    put(f"{prefix}.R", lin.R)
    put(f"{prefix}.global_scale", lin.global_scale)
    if lin.b is not None:
        put(f"{prefix}.b", lin.b)
    return {"kind": "caldera", "has_bias": lin.b is not None,
            "num_bits": lin.num_bits, "group_size": lin.group_size,
            "out_features": lin.out_features, "in_features": lin.in_features,
            "mode": lin.mode, "q_method": lin.q_method}


def _decode_linear(meta, prefix, z, dtypes):
    import jax.numpy as jnp

    def get(key):
        want = dtypes.get(key)
        return jnp.asarray(z[key], want if want else z[key].dtype)

    b = get(f"{prefix}.b") if meta["has_bias"] else None
    if meta["kind"] == "dense":
        return DenseLinear(w=get(f"{prefix}.w"), b=b)
    q_method = meta.get("q_method", "uniform")
    if q_method == "e8p":
        from ee274_convexcaldera_llm_quantization_tpu.ops import lattice
        packed = lattice.codes_to_int4_planes(get(f"{prefix}.e8p_codes"),
                                              meta["in_features"])
    else:
        packed = get(f"{prefix}.packed")
    return CalderaLinear(
        packed=packed,
        scales=get(f"{prefix}.scales"),
        L=get(f"{prefix}.L"),
        R=get(f"{prefix}.R"),
        global_scale=get(f"{prefix}.global_scale"),
        b=b, num_bits=meta["num_bits"], group_size=meta["group_size"],
        out_features=meta["out_features"], in_features=meta["in_features"],
        mode=meta.get("mode", "grouped"), q_method=q_method)


def save_params(path: str, params: ModelParams, config: ModelConfig) -> None:
    os.makedirs(path, exist_ok=True)
    _DTYPES.clear()
    arrays: dict = {}
    arrays["embed"], _DTYPES["embed"] = _np(params.embed)
    arrays["final_norm"], _DTYPES["final_norm"] = _np(params.final_norm)
    manifest: dict = {
        "config": dataclasses.asdict(config),
        "num_layers": len(params.layers),
        "layers": [],
        "has_lm_head": params.lm_head is not None,
    }
    for i, lp in enumerate(params.layers):
        layer_meta = {}
        for name in LayerParams._fields:
            val = getattr(lp, name)
            prefix = f"layers.{i}.{name}"
            if name.endswith("_norm"):
                arrays[prefix], _DTYPES[prefix] = _np(val)
                layer_meta[name] = {"kind": "array"}
            else:
                layer_meta[name] = _encode_linear(val, prefix, arrays)
        manifest["layers"].append(layer_meta)
    if params.lm_head is not None:
        manifest["lm_head"] = _encode_linear(params.lm_head, "lm_head",
                                             arrays)
    manifest["dtypes"] = dict(_DTYPES)
    np.savez_compressed(os.path.join(path, "params.npz"), **arrays)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def load_params(path: str) -> Tuple[ModelParams, ModelConfig]:
    import jax.numpy as jnp
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    config = ModelConfig(**manifest["config"])
    dtypes = manifest.get("dtypes", {})
    z = np.load(os.path.join(path, "params.npz"))

    def get(key):
        a = jnp.asarray(z[key])
        want = dtypes.get(key)
        return a.astype(want) if want and str(a.dtype) != want else a

    layers = []
    for i, layer_meta in enumerate(manifest["layers"]):
        fields = {}
        for name in LayerParams._fields:
            prefix = f"layers.{i}.{name}"
            meta = layer_meta[name]
            if meta["kind"] == "array":
                fields[name] = get(prefix)
            else:
                fields[name] = _decode_linear(meta, prefix, z, dtypes)
        layers.append(LayerParams(**fields))
    lm_head = (_decode_linear(manifest["lm_head"], "lm_head", z, dtypes)
               if manifest["has_lm_head"] else None)
    return ModelParams(embed=get("embed"), layers=layers,
                       final_norm=get("final_norm"),
                       lm_head=lm_head), config
