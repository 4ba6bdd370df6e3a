"""Scan-over-layers model execution (stacked homogeneous layer params).

The unrolled per-layer Python loop in ``models.llama`` compiles one copy of
the layer body per layer — a 32-layer 7B decode graph inlines ~224 Pallas
calls, which is slow to compile (minutes through a remote-compile path).
When every layer has identical structure (the common case after whole-model
surgery), the layers can be stacked along a leading axis and executed with
``lax.scan``: the layer body is compiled ONCE and XLA loops it, cutting
compile time by ~an order of magnitude with identical runtime math.

``stack_layers`` converts a :class:`ModelParams` with homogeneous layers to
a stacked representation; ``forward`` / ``decode_step_batched`` here mirror
the unrolled versions bit-for-bit (same ops, same dtypes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, DenseLinear, apply_linear)
from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    KVCache, LayerParams, ModelParams)

Array = jax.Array


class StackedModelParams(NamedTuple):
    embed: Array
    layers: LayerParams          # leaves stacked: leading axis = num_layers
    final_norm: Array
    lm_head: Optional[object]


def _homogeneous(layers) -> bool:
    def sig(lin):
        if isinstance(lin, DenseLinear):
            return ("dense", lin.w.shape, lin.b is not None)
        return ("caldera", lin.packed.shape, lin.num_bits, lin.group_size,
                lin.L.shape, lin.b is not None)
    first = [sig(getattr(layers[0], f)) for f in LayerParams._fields
             if not f.endswith("_norm")]
    return all(
        [sig(getattr(lp, f)) for f in LayerParams._fields
         if not f.endswith("_norm")] == first
        for lp in layers[1:])


def stack_layers(params: ModelParams) -> StackedModelParams:
    """Stack per-layer params along a new leading axis (layers must be
    structurally homogeneous — same kinds, shapes, bit widths)."""
    if not _homogeneous(params.layers):
        raise ValueError(
            "layers are heterogeneous (mixed dense/compressed or differing "
            "shapes); use the unrolled models.llama forward instead")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params.layers)
    return StackedModelParams(embed=params.embed, layers=stacked,
                              final_norm=params.final_norm,
                              lm_head=params.lm_head)


def _layer_body(x, lp: LayerParams, cos, sin, mask, ck, cv, pos,
                config: ModelConfig, use_pallas: bool, interpret: bool,
                rows=None):
    """Shared transformer block for the scan path. ``ck``/``cv`` are this
    layer's cache slabs; ``pos`` indexes the write position (per-row when
    ``rows`` is given)."""
    B, S, _ = x.shape
    lin = functools.partial(apply_linear, use_pallas=use_pallas,
                            interpret=interpret)
    y = llama.rms_norm(x, lp.attn_norm, config.rms_norm_eps)
    q = lin(lp.q_proj, y).reshape(B, S, config.num_heads, config.head_dim)
    k = lin(lp.k_proj, y).reshape(B, S, config.num_kv_heads, config.head_dim)
    v = lin(lp.v_proj, y).reshape(B, S, config.num_kv_heads, config.head_dim)
    q = llama.apply_rope(q, cos, sin)
    k = llama.apply_rope(k, cos, sin)
    if ck is not None:
        if rows is not None:
            ck = ck.at[rows, pos].set(k[:, 0].astype(ck.dtype))
            cv = cv.at[rows, pos].set(v[:, 0].astype(cv.dtype))
        else:
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                              (0, pos, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                              (0, pos, 0, 0))
        attn = llama._attention(q, ck, cv, mask)
    else:
        attn = llama._attention(q, k, v, mask)
    x = x + lin(lp.o_proj, attn.reshape(B, S, config.q_dim))
    y = llama.rms_norm(x, lp.mlp_norm, config.rms_norm_eps)
    x = x + lin(lp.down_proj,
                jax.nn.silu(lin(lp.gate_proj, y)) * lin(lp.up_proj, y))
    return x, ck, cv


@functools.partial(jax.jit,
                   static_argnames=("config", "use_pallas", "interpret"))
def forward(params: StackedModelParams, tokens: Array, config: ModelConfig,
            use_pallas: bool = False, interpret: bool = False) -> Array:
    """Full-sequence forward via scan (mirrors ``llama.forward``)."""
    B, S = tokens.shape
    x = params.embed[tokens].astype(jnp.float32)
    positions = jnp.arange(S)[None, :]
    cos, sin = llama.rope_tables(config, positions)
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    mask = jnp.where(causal, 0.0, -1e30)[None, None, None, :, :]

    def body(x, lp):
        x, _, _ = _layer_body(x, lp, cos, sin, mask, None, None, None,
                              config, use_pallas, interpret)
        return x, None

    x, _ = jax.lax.scan(body, x, params.layers)
    return llama._logits(x, ModelParams(params.embed, [], params.final_norm,
                                        params.lm_head),
                         config, use_pallas, interpret)


@functools.partial(jax.jit,
                   static_argnames=("config", "use_pallas", "interpret"))
def decode_step_batched(params: StackedModelParams, tokens: Array,
                        pos: Array, cache: KVCache, config: ModelConfig,
                        use_pallas: bool = False,
                        interpret: bool = False) -> Tuple[Array, KVCache]:
    """Per-slot-position decode step via scan (mirrors
    ``llama.decode_step_batched``)."""
    B = tokens.shape[0]
    T = cache.k.shape[2]
    x = params.embed[tokens][:, None, :].astype(jnp.float32)
    cos, sin = llama.rope_tables(config, pos[:, None])
    valid = jnp.arange(T)[None, :] <= pos[:, None]
    mask = jnp.where(valid, 0.0, -1e30)[:, None, None, None, :]
    rows = jnp.arange(B)

    def body(x, scanned):
        lp, ck, cv = scanned
        x, ck, cv = _layer_body(x, lp, cos, sin, mask, ck, cv, pos, config,
                                use_pallas, interpret, rows=rows)
        return x, (ck, cv)

    x, (ks, vs) = jax.lax.scan(body, x, (params.layers, cache.k, cache.v))
    logits = llama._logits(x, ModelParams(params.embed, [], params.final_norm,
                                          params.lm_head),
                           config, use_pallas, interpret)
    return logits[:, 0, :], KVCache(ks, vs)


@functools.partial(jax.jit,
                   static_argnames=("config", "use_pallas", "interpret"))
def prefill(params: StackedModelParams, tokens: Array, cache: KVCache,
            config: ModelConfig, use_pallas: bool = False,
            interpret: bool = False) -> Tuple[Array, KVCache]:
    """Prompt prefill via scan (mirrors ``llama.prefill``)."""
    B, S = tokens.shape
    T = cache.k.shape[2]
    x = params.embed[tokens].astype(jnp.float32)
    positions = jnp.arange(S)[None, :]
    cos, sin = llama.rope_tables(config, positions)
    valid = jnp.arange(T)[None, :] <= jnp.arange(S)[:, None]
    mask = jnp.where(valid, 0.0, -1e30)[None, None, None, :, :]

    def body(x, scanned):
        lp, ck, cv = scanned
        x, ck, cv = _layer_body(x, lp, cos, sin, mask, ck, cv, 0, config,
                                use_pallas, interpret)
        return x, (ck, cv)

    x, (ks, vs) = jax.lax.scan(body, x, (params.layers, cache.k, cache.v))
    logits = llama._logits(x[:, -1:, :],
                           ModelParams(params.embed, [], params.final_norm,
                                       params.lm_head),
                           config, use_pallas, interpret)
    return logits[:, 0, :], KVCache(ks, vs)
