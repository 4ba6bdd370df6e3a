"""Tensor-parallel decode/prefill over a device mesh (whole-model TP).

Megatron-style sharding of the stacked W4A8 serving path
(``models.stacked.decode_step_w4a8``), executed with ``shard_map`` so the
Pallas kernels run on local shards and XLA inserts exactly two ``psum``
collectives per layer (after o_proj and down_proj):

- **column parallel** q/k/v/gate/up: output features (= attention heads /
  MLP channels) sharded over the tp axis; activations replicated; no
  collective — the consumer (attention / silu·mul) stays sharded.
- **row parallel** o/down: input features sharded (matching the sharded
  attention/MLP outputs); each device computes a partial product over its
  K-range and ``psum`` over tp completes the contraction.
- **KV cache** sharded over the kv-head axis — each device attends its own
  heads; attention needs no collective.
- **lm_head** sharded over the vocab axis; logits return vocab-sharded and
  are gathered lazily by the consumer.

The low-rank CALDERA factors follow the same layout (column: ``L`` by rows;
row: ``R`` by columns with the rank axis replicated), so the per-shard math
is byte-identical to the single-chip kernels. Row-parallel packed codes are
**exactly** repacked per K-shard (same per-row scale, codes just reordered
into shard-local bit planes — see :func:`repack_row_parallel_stacked`); the
only numerical difference vs single-chip is the dynamic int8 activation
quantization, whose absmax is per K-shard instead of per full row.

The reference has no parallelism of any kind (SURVEY.md section 2.10); this
module is the TPU-native scaling layer it lacked. Validated on a CPU
host-platform mesh; ICI-scaling numbers require real multi-chip hardware.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, DenseLinear)
from ee274_convexcaldera_llm_quantization_tpu.models import llama, stacked
from ee274_convexcaldera_llm_quantization_tpu.models.stacked import (
    StackedModelParams)

Array = jax.Array

_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW = ("o_proj", "down_proj")


def repack_row_parallel_stacked(packed: Array, num_bits: int,
                                shards: int) -> Array:
    """Exactly repack stacked w4a8 codes ``(L, N, K*bits/8)`` for K-sharding.

    The serving byte layout is plane-major over the whole row (byte ``c``
    holds codes for ``k = p*plane_len + c``), so a plain slice of the byte
    axis scrambles k-order. This unpacks to code order, slices K into
    ``shards`` ranges, and repacks each range plane-major *locally*; byte
    range ``s`` of the result is shard ``s``'s standalone packing. Codes
    and per-row scales are unchanged — the repack is bit-exact (unlike
    re-quantizing each shard, which would re-round every weight).
    """
    f = 8 // num_bits
    nbytes = packed.shape[-1]
    K = nbytes * f
    if K % shards:
        raise ValueError(f"K={K} not divisible by {shards} shards")
    ks = K // shards
    if ks % f:
        raise ValueError(f"shard width {ks} not divisible by pack factor {f}")
    if f == 1:
        return packed          # bytes are codes; slicing bytes slices K
    if shards == 1:
        return packed          # one shard: local plane-major == global
    mask = (1 << num_bits) - 1

    def repack2d(pk2):
        """(N, K/f) -> repacked (N, K/f); bounded VMEM/HBM transient."""
        pk = pk2.astype(jnp.int32)
        planes = [(pk >> (num_bits * (f - 1 - p))) & mask for p in range(f)]
        u = jnp.concatenate(planes, axis=-1)        # (N, K) code order
        outs = []
        for s in range(shards):
            us = u[..., s * ks:(s + 1) * ks]
            g = us.reshape(*us.shape[:-1], f, ks // f)   # local plane-major
            b = jnp.zeros(g.shape[:-2] + (ks // f,), jnp.int32)
            for p in range(f):
                b = b | (g[..., p, :] << (num_bits * (f - 1 - p)))
            outs.append(b.astype(jnp.uint8))
        return jnp.concatenate(outs, axis=-1)

    if packed.ndim == 2:
        return repack2d(packed)
    # stacked (L, N, K/f): map over layers so the int32 unpacked planes
    # (16x the packed bytes) never materialize for the whole stack at once
    # — a 7B down_proj stack would transiently need ~5.8 GB otherwise
    return jax.lax.map(repack2d, packed)


def _path_names(path) -> list:
    return [getattr(e, "name", getattr(e, "key", "")) for e in path]


def _param_spec(names, axis: str) -> P:
    """PartitionSpec for one StackedModelParams leaf, by its tree path."""
    if "lm_head" in names:
        field = names[-1]
        if field in ("w", "w8", "scales"):
            return P(axis, None)                     # vocab-sharded head
        if field == "b":
            return P(axis)
        return P()
    proj = next((n for n in names if n in _COL or n in _ROW), None)
    if proj is None:
        return P()                                   # embed / norms
    field = names[-1]
    if proj in _COL:
        if field in ("packed", "scales", "L", "L_scale"):
            return P(None, axis, None)               # output features
        if field == "b":
            return P(None, axis)
        return P()                                   # R / R_scale / gs
    if field in ("packed", "scales", "R"):
        return P(None, None, axis)                   # input features
    return P()                                       # L / L_scale / gs / b


def _cache_spec(cache, axis: str):
    """KV caches shard on the kv-head axis (dim 3 of (L, B, T, KVH, D))."""
    return type(cache)(*[
        P(None, None, None, axis, None) if x.ndim == 5
        else P(None, None, None, axis) for x in cache])


def param_specs(params: StackedModelParams, axis: str = "tp"):
    """PartitionSpec pytree for a stacked w4a8 model under whole-model TP."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: _param_spec(_path_names(path), axis), params)


def shard_stacked_model_tp(params: StackedModelParams, mesh: Mesh,
                           axis: str = "tp") -> StackedModelParams:
    """Repack + place a stacked w4a8 model for tensor-parallel serving.

    Row-parallel projections (o/down) get their packed codes exactly
    repacked per K-shard and their per-row scales broadcast to one copy
    per shard; everything else is placed under :func:`param_specs`.
    A tied (``None``) lm_head is materialized from the embedding so it can
    be vocab-sharded independently of the replicated input embedding.
    """
    tp = mesh.shape[axis]
    fields = {}
    for name in llama.LayerParams._fields:
        lin = getattr(params.layers, name)
        if name in _ROW:
            if not isinstance(lin, CalderaLinear) or lin.mode != "w4a8":
                raise ValueError(f"{name} must be a stacked w4a8 "
                                 "CalderaLinear for TP serving")
            if lin.b is not None:
                raise ValueError(f"row-parallel {name} cannot carry a bias")
            fields[name] = dataclasses.replace(
                lin,
                packed=repack_row_parallel_stacked(lin.packed, lin.num_bits,
                                                   tp),
                scales=jnp.broadcast_to(
                    lin.scales, lin.scales.shape[:-1] + (tp,)))
        else:
            fields[name] = lin
    lm_head = params.lm_head
    if lm_head is None:
        lm_head = DenseLinear(w=params.embed)
    params = StackedModelParams(embed=params.embed,
                                layers=llama.LayerParams(**fields),
                                final_norm=params.final_norm,
                                lm_head=lm_head)
    specs = param_specs(params, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def shard_kv_cache_tp(cache, mesh: Mesh, axis: str = "tp"):
    """Place a (Quant)KVCache with kv heads sharded over the tp axis."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, _cache_spec(cache, axis))


def _local_config(config: ModelConfig, tp: int) -> ModelConfig:
    for field, div in (("num_heads", tp), ("num_kv_heads", tp),
                       ("intermediate_size", tp), ("vocab_size", tp)):
        if getattr(config, field) % div:
            raise ValueError(f"{field}={getattr(config, field)} not "
                             f"divisible by tp={tp}")
    return dataclasses.replace(
        config,
        num_heads=config.num_heads // tp,
        num_kv_heads=config.num_kv_heads // tp,
        intermediate_size=config.intermediate_size // tp,
        vocab_size=config.vocab_size // tp)


@functools.partial(
    jax.jit,
    static_argnames=("config", "mesh", "axis", "interpret"),
    donate_argnames=("cache",))
def decode_step_w4a8_tp(params: StackedModelParams, tokens: Array,
                        pos: Array, cache, config: ModelConfig, mesh: Mesh,
                        axis: str = "tp", interpret: bool = False):
    """Tensor-parallel batched decode step (see module docstring).

    ``params`` from :func:`shard_stacked_model_tp`, ``cache`` from
    :func:`shard_kv_cache_tp`. Returns (logits (B, vocab), cache) — logits
    come back vocab-sharded over the mesh and gather lazily.
    """
    cfg_local = _local_config(config, mesh.shape[axis])
    pspecs = param_specs(params, axis)
    cspecs = _cache_spec(cache, axis)

    def local_fn(params, tokens, pos, cache):
        return stacked.decode_step_w4a8(params, tokens, pos, cache,
                                        cfg_local, interpret=interpret,
                                        tp_axis=axis)

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(pspecs, P(None), P(None), cspecs),
        out_specs=(P(None, axis), cspecs),
        check_vma=False,
    )(params, tokens, pos, cache)


@functools.partial(
    jax.jit,
    static_argnames=("config", "mesh", "axis", "interpret"),
    donate_argnames=("cache",))
def prefill_into_slot_w4a8_tp(params: StackedModelParams, tokens: Array,
                              slot: Array, cache, config: ModelConfig,
                              mesh: Mesh, axis: str = "tp",
                              interpret: bool = False,
                              last_pos: Optional[Array] = None):
    """Tensor-parallel prefill of one (1, S) prompt into ``slot``."""
    cfg_local = _local_config(config, mesh.shape[axis])
    pspecs = param_specs(params, axis)
    cspecs = _cache_spec(cache, axis)

    def local_fn(params, tokens, slot, cache, last_pos):
        return stacked.prefill_into_slot_w4a8(
            params, tokens, slot, cache, cfg_local, interpret=interpret,
            last_pos=last_pos, tp_axis=axis)

    if last_pos is None:
        last_pos = tokens.shape[1] - 1       # x[-1:] in the inner prefill
    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(pspecs, P(None), P(), cspecs, P()),
        out_specs=(P(axis), cspecs),
        check_vma=False,
    )(params, tokens, jnp.asarray(slot), cache, jnp.asarray(last_pos))
