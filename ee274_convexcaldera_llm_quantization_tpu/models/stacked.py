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


def _low_rank_layer(lin: CalderaLinear, l, y, xr_reduce=None):
    """Low-rank contribution ``y @ (L[l] @ R[l]).T`` for a stacked
    CalderaLinear (bf16 or int8 factors)."""
    from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as Kr

    idx = functools.partial(jax.lax.dynamic_index_in_dim, index=l, axis=0,
                            keepdims=False)
    return Kr.low_rank_matmul(
        y, idx(lin.L), idx(lin.R),
        None if lin.L_scale is None else idx(lin.L_scale),
        None if lin.R_scale is None else idx(lin.R_scale),
        xr_reduce=xr_reduce)


def quantize_model_factors_int8(params: StackedModelParams,
                                lm_head_int8: bool = True
                                ) -> StackedModelParams:
    """int8-quantize the low-rank factors of every compressed projection
    (and optionally the output head) of a stacked model. See
    ``fused.quantize_factors_int8_fused`` for the fused-layout variant."""
    from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
        quantize_factors_int8, quantize_linear_int8)

    fields = {}
    for name in LayerParams._fields:
        lin = getattr(params.layers, name)
        fields[name] = (quantize_factors_int8(lin)
                        if isinstance(lin, CalderaLinear) else lin)
    lm_head = params.lm_head
    if lm_head_int8:
        if lm_head is None:
            lm_head = quantize_linear_int8(DenseLinear(w=params.embed))
        elif isinstance(lm_head, DenseLinear):
            lm_head = quantize_linear_int8(lm_head)
    return StackedModelParams(embed=params.embed,
                              layers=LayerParams(**fields),
                              final_norm=params.final_norm, lm_head=lm_head)


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


def _row_out(out: Array, lin, tp_axis: Optional[str]) -> Array:
    """Complete a row-parallel (input-feature-sharded) projection under
    tensor parallelism: each shard's ``out`` is a partial product over its
    K-range; ``psum`` over the tp axis finishes the contraction. A bias
    would have been added per shard (``tp``-times total), so row-parallel
    projections must be bias-free (Llama o/down projections are)."""
    if tp_axis is None:
        return out
    if lin.b is not None:
        raise ValueError("row-parallel projection cannot carry a bias")
    return jax.lax.psum(out, tp_axis)


def decode_layers_w4a8(lp: LayerParams, x: Array, pos: Array, cache: KVCache,
                       config: ModelConfig, interpret: bool = False,
                       tp_axis: Optional[str] = None
                       ) -> Tuple[Array, KVCache]:
    """Run ``config.num_layers`` stacked w4a8 transformer layers on one-token
    activations ``x`` (B, h), updating ``cache`` rows at ``[l, :, pos]``.

    The shared layer loop of :func:`decode_step_w4a8` (single chip / TP) and
    :func:`parallel.pp.decode_step_w4a8_pp` (pipeline stages run it on their
    local layer slab with a local config).
    """
    from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as Kr

    quant_kv = isinstance(cache, llama.QuantKVCache)
    B = x.shape[0]
    T = cache.k.shape[2]
    cos, sin = llama.rope_tables(config, pos[:, None])
    valid = jnp.arange(T)[None, :] <= pos[:, None]
    mask = jnp.where(valid, 0.0, -1e30)[:, None, None, None, :]
    rows = jnp.arange(B)

    def qmm(lin, l, y):
        yq = Kr.quantized_matmul_w4a8_stacked(
            y, lin.packed, lin.scales, l, lin.num_bits, interpret=interpret)
        # Factor matmuls stay XLA dots on dynamic slices: replacing them
        # with scalar-prefetch Pallas kernels was measured SLOWER (11.3 vs
        # 10.3 ms/step on 7B) — 2 extra kernel launches per projection cost
        # more than the ~1 MB slice copies they avoid.
        ylr = _low_rank_layer(lin, l, y)
        gs = jax.lax.dynamic_index_in_dim(lin.global_scale, l, 0,
                                          keepdims=False)
        out = (yq + ylr) * gs
        if lin.b is not None:
            out = out + jax.lax.dynamic_index_in_dim(
                lin.b, l, 0, keepdims=False)[None, :]
        return out

    def body(l, carry):
        x, cache = carry
        an = jax.lax.dynamic_index_in_dim(lp.attn_norm, l, 0, keepdims=False)
        y = llama.rms_norm(x[:, None, :], an, config.rms_norm_eps)[:, 0]
        q = qmm(lp.q_proj, l, y).reshape(B, 1, config.num_heads,
                                         config.head_dim)
        k = qmm(lp.k_proj, l, y).reshape(B, 1, config.num_kv_heads,
                                         config.head_dim)
        v = qmm(lp.v_proj, l, y).reshape(B, 1, config.num_kv_heads,
                                         config.head_dim)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        if quant_kv:
            kq, ksc = llama.quantize_kv(k[:, 0])
            vq, vsc = llama.quantize_kv(v[:, 0])
            cache = llama.QuantKVCache(
                cache.k.at[l, rows, pos].set(kq),
                cache.v.at[l, rows, pos].set(vq),
                cache.k_scale.at[l, rows, pos].set(ksc),
                cache.v_scale.at[l, rows, pos].set(vsc))
            attn = llama._attention_q8(
                q,
                jax.lax.dynamic_index_in_dim(cache.k, l, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(cache.v, l, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(cache.k_scale, l, 0,
                                             keepdims=False),
                jax.lax.dynamic_index_in_dim(cache.v_scale, l, 0,
                                             keepdims=False),
                mask).reshape(B, config.q_dim)
        else:
            cache = KVCache(
                cache.k.at[l, rows, pos].set(k[:, 0].astype(cache.k.dtype)),
                cache.v.at[l, rows, pos].set(v[:, 0].astype(cache.v.dtype)))
            ck = jax.lax.dynamic_index_in_dim(cache.k, l, 0, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(cache.v, l, 0, keepdims=False)
            attn = llama._attention(q, ck, cv, mask).reshape(B, config.q_dim)
        x = x + _row_out(qmm(lp.o_proj, l, attn), lp.o_proj, tp_axis)
        mn = jax.lax.dynamic_index_in_dim(lp.mlp_norm, l, 0, keepdims=False)
        y = llama.rms_norm(x[:, None, :], mn, config.rms_norm_eps)[:, 0]
        h = jax.nn.silu(qmm(lp.gate_proj, l, y)) * qmm(lp.up_proj, l, y)
        x = x + _row_out(qmm(lp.down_proj, l, h), lp.down_proj, tp_axis)
        return x, cache

    return jax.lax.fori_loop(0, config.num_layers, body, (x, cache))


@functools.partial(jax.jit,
                   static_argnames=("config", "interpret", "tp_axis"),
                   donate_argnames=("cache",))
def decode_step_w4a8(params: StackedModelParams, tokens: Array, pos: Array,
                     cache: KVCache, config: ModelConfig,
                     interpret: bool = False,
                     tp_axis: Optional[str] = None) -> Tuple[Array, KVCache]:
    """Fast decode: fori_loop over layers with scalar-prefetch weight access.

    Requires every projection to be a stacked w4a8 :class:`CalderaLinear`.
    Unlike the scan path, the stacked weights are never sliced (XLA
    materializes a full per-layer copy of scanned operands before a Pallas
    call — ~3x the HBM traffic); the kernel's index_map selects the layer
    slab directly. The KV cache is donated and updated in place.

    ``cache`` may be a bf16 :class:`KVCache` or an int8
    :class:`llama.QuantKVCache` (half the cache bandwidth, double the
    context capacity); the branch is a trace-time pytree-structure check.
    """
    x = params.embed[tokens].astype(jnp.float32)          # (B, h)
    x, cache = decode_layers_w4a8(params.layers, x, pos, cache, config,
                                  interpret=interpret, tp_axis=tp_axis)
    logits = llama._logits(
        x[:, None, :],
        llama.ModelParams(params.embed, [], params.final_norm,
                          params.lm_head),
        config, False, interpret)
    return logits[:, 0, :], cache


@functools.partial(jax.jit,
                   static_argnames=("config", "interpret", "tp_axis"),
                   donate_argnames=("cache",))
def prefill_into_slot_w4a8(params: StackedModelParams, tokens: Array,
                           slot: Array, cache: KVCache, config: ModelConfig,
                           interpret: bool = False,
                           last_pos: Optional[Array] = None,
                           tp_axis: Optional[str] = None
                           ) -> Tuple[Array, KVCache]:
    """Prefill one prompt (1, S) into slot ``slot`` via the fast w4a8 path.

    Same scalar-prefetch weight access as :func:`decode_step_w4a8` (the
    W4A8 kernels take (S, K) activations, so prefill reuses them verbatim).
    ``last_pos`` as in ``llama.prefill_into_slot`` (bucketed prompts).
    ``cache`` may be bf16 or int8 (:class:`llama.QuantKVCache`): prompt
    self-attention always uses the exact K/V; only the cache write is
    quantized.
    """
    from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as Kr

    quant_kv = isinstance(cache, llama.QuantKVCache)
    S = tokens.shape[1]
    lp = params.layers
    x = params.embed[tokens[0]].astype(jnp.float32)      # (S, h)
    positions = jnp.arange(S)
    cos, sin = llama.rope_tables(config, positions[None, :])
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    mask = jnp.where(causal, 0.0, -1e30)[None, None, None, :, :]

    def qmm(lin, l, y):
        yq = Kr.quantized_matmul_w4a8_stacked(
            y, lin.packed, lin.scales, l, lin.num_bits, interpret=interpret)
        ylr = _low_rank_layer(lin, l, y)
        gs = jax.lax.dynamic_index_in_dim(lin.global_scale, l, 0,
                                          keepdims=False)
        out = (yq + ylr) * gs
        if lin.b is not None:
            out = out + jax.lax.dynamic_index_in_dim(
                lin.b, l, 0, keepdims=False)[None, :]
        return out

    def body(l, carry):
        x, cache = carry
        an = jax.lax.dynamic_index_in_dim(lp.attn_norm, l, 0, keepdims=False)
        y = llama.rms_norm(x[None], an, config.rms_norm_eps)[0]
        q = qmm(lp.q_proj, l, y).reshape(1, S, config.num_heads,
                                         config.head_dim)
        k = qmm(lp.k_proj, l, y).reshape(1, S, config.num_kv_heads,
                                         config.head_dim)
        v = qmm(lp.v_proj, l, y).reshape(1, S, config.num_kv_heads,
                                         config.head_dim)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        attn = llama._attention(q, k, v, mask).reshape(S, config.q_dim)
        if quant_kv:
            kq, ksc = llama.quantize_kv(k)
            vq, vsc = llama.quantize_kv(v)
            cache = llama.QuantKVCache(
                jax.lax.dynamic_update_slice(cache.k, kq[None],
                                             (l, slot, 0, 0, 0)),
                jax.lax.dynamic_update_slice(cache.v, vq[None],
                                             (l, slot, 0, 0, 0)),
                jax.lax.dynamic_update_slice(cache.k_scale, ksc[None],
                                             (l, slot, 0, 0)),
                jax.lax.dynamic_update_slice(cache.v_scale, vsc[None],
                                             (l, slot, 0, 0)))
        else:
            cache = KVCache(
                jax.lax.dynamic_update_slice(
                    cache.k, k.astype(cache.k.dtype)[None],
                    (l, slot, 0, 0, 0)),
                jax.lax.dynamic_update_slice(
                    cache.v, v.astype(cache.v.dtype)[None],
                    (l, slot, 0, 0, 0)))
        x = x + _row_out(qmm(lp.o_proj, l, attn), lp.o_proj, tp_axis)
        mn = jax.lax.dynamic_index_in_dim(lp.mlp_norm, l, 0, keepdims=False)
        y = llama.rms_norm(x[None], mn, config.rms_norm_eps)[0]
        h = jax.nn.silu(qmm(lp.gate_proj, l, y)) * qmm(lp.up_proj, l, y)
        x = x + _row_out(qmm(lp.down_proj, l, h), lp.down_proj, tp_axis)
        return x, cache

    x, cache = jax.lax.fori_loop(0, config.num_layers, body, (x, cache))
    if last_pos is None:
        x_last = x[-1:]
    else:
        x_last = jax.lax.dynamic_slice_in_dim(x, last_pos, 1, axis=0)
    logits = llama._logits(
        x_last[None],
        llama.ModelParams(params.embed, [], params.final_norm,
                          params.lm_head),
        config, False, interpret)
    return logits[0, 0, :], cache


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
