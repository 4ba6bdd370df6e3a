"""Device mesh construction and the sharding catalog.

The reference is strictly single-process / single-GPU (SURVEY.md section
2.10: no torch.distributed anywhere); this layer is built fresh for TPU:

- :func:`make_mesh` builds a ``jax.sharding.Mesh`` with named axes
  ``("dp", "tp")`` (data parallel over DCN/ICI, tensor parallel over ICI).
- :func:`model_shardings` returns a pytree of ``NamedSharding`` matching a
  :class:`models.llama.ModelParams` (dense or CALDERA-compressed), using
  Megatron-style layout: q/k/v/gate/up column-parallel (shard the output
  features), o/down row-parallel (shard the input features). For
  CalderaLinear the packed code planes, scales, and the matching L/R factor
  are sharded along the same logical axis, so the fused dequant-matmul runs
  fully locally and XLA inserts one reduce-scatter/all-reduce per block —
  exactly the hand-written Megatron pattern, but compiler-inserted.
- KV caches shard heads over ``tp`` and batch over ``dp``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, DenseLinear)
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    KVCache, LayerParams, ModelParams)


def make_mesh(dp: int = 1, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh with ``dp * tp`` devices; tp is the fast (ICI-contiguous) axis."""
    if devices is None:
        devices = jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# Column-parallel: shard output features. Row-parallel: shard input features.
_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW = ("o_proj", "down_proj")


def _linear_spec(lin, kind: str):
    """PartitionSpec pytree for one Linear. ``kind``: 'col' | 'row' | 'rep'."""
    if isinstance(lin, DenseLinear):
        if kind == "col":
            w = P("tp", None)
            b = P("tp") if lin.b is not None else None
        elif kind == "row":
            w = P(None, "tp")
            b = P(None) if lin.b is not None else None
        else:
            w = P(None, None)
            b = P(None) if lin.b is not None else None
        return DenseLinear(w=w, b=b)
    assert isinstance(lin, CalderaLinear)
    if kind == "col":
        # shard output rows: packed (N, K/f), scales (N, K/G), L (N, r)
        spec = dict(packed=P("tp", None), scales=P("tp", None),
                    L=P("tp", None), R=P(None, None),
                    b=P("tp") if lin.b is not None else None)
    elif kind == "row":
        # shard input features: packed/scales along K, R along K; L replicated
        spec = dict(packed=P(None, "tp"), scales=P(None, "tp"),
                    L=P(None, None), R=P(None, "tp"),
                    b=P(None) if lin.b is not None else None)
    else:
        spec = dict(packed=P(None, None), scales=P(None, None),
                    L=P(None, None), R=P(None, None),
                    b=P(None) if lin.b is not None else None)
    return CalderaLinear(
        packed=spec["packed"], scales=spec["scales"], L=spec["L"],
        R=spec["R"], global_scale=P(), b=spec["b"],
        num_bits=lin.num_bits, group_size=lin.group_size,
        out_features=lin.out_features, in_features=lin.in_features)


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop named axes whose dimension is not divisible by the mesh axis.

    Small arrays (e.g. per-group scales with a single group, or a rank
    smaller than tp) silently fall back to replication instead of failing
    ``device_put``.
    """
    fixed = []
    for i, axis in enumerate(spec):
        if axis is None or i >= len(shape):
            fixed.append(axis)
            continue
        size = mesh.shape[axis] if isinstance(axis, str) else int(
            np.prod([mesh.shape[a] for a in axis]))
        fixed.append(axis if shape[i] % size == 0 else None)
    return P(*fixed)


def model_shardings(params: ModelParams, mesh: Mesh) -> ModelParams:
    """NamedSharding pytree matching ``params`` (Megatron TP layout)."""
    def ns(spec_tree, value_tree):
        return jax.tree.map(
            lambda s, v: (NamedSharding(mesh, _fit_spec(s, v.shape, mesh))
                          if isinstance(s, P) else s),
            spec_tree, value_tree,
            is_leaf=lambda x: isinstance(x, P) or x is None)

    layers = []
    for lp in params.layers:
        fields = {}
        for name in LayerParams._fields:
            lin = getattr(lp, name)
            if name.endswith("_norm"):
                fields[name] = NamedSharding(mesh, P(None))
            elif name in _COL:
                fields[name] = ns(_linear_spec(lin, "col"), lin)
            elif name in _ROW:
                fields[name] = ns(_linear_spec(lin, "row"), lin)
            else:
                fields[name] = ns(_linear_spec(lin, "rep"), lin)
        layers.append(LayerParams(**fields))
    lm_head = None
    if params.lm_head is not None:
        lm_head = ns(_linear_spec(params.lm_head, "col"), params.lm_head)
    return ModelParams(
        embed=NamedSharding(mesh,
                            _fit_spec(P("tp", None), params.embed.shape,
                                      mesh)),
        layers=layers,
        final_norm=NamedSharding(mesh, P(None)),
        lm_head=lm_head,
    )


def kvcache_shardings(mesh: Mesh) -> KVCache:
    """Shard KV heads over tp and batch over dp:
    (layers, batch, seq, kv_heads, head_dim)."""
    spec = NamedSharding(mesh, P(None, "dp", None, "tp", None))
    return KVCache(k=spec, v=spec)


def shard_params(params: ModelParams, mesh: Mesh) -> ModelParams:
    """Place a parameter pytree onto the mesh with the catalog shardings.

    Note: KV-head column sharding requires ``num_kv_heads % tp == 0``; use
    ``tp <= num_kv_heads`` or replicate k/v for wider meshes.
    """
    shardings = model_shardings(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s) if x is not None else None,
        params, shardings,
        is_leaf=lambda x: x is None or isinstance(x, (jax.Array, np.ndarray)))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))
