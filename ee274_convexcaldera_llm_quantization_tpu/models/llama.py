"""Llama/Qwen2-family transformer in plain functional JAX.

Design notes (TPU-first, not a port — the reference uses stock HF PyTorch
models, ``main.py:261-266``):

- parameters are a plain pytree of :class:`models.compressed.Linear` leaves
  (dense or CALDERA-compressed), so the same forward serves both the FP
  baseline and the quantized model;
- the decode path takes a preallocated static-shape KV cache and a position
  index — no dynamic shapes, everything jits once;
- attention uses GQA (kv heads broadcast over query groups) and rotary
  embeddings computed on the fly from a precomputed inv-freq table;
- matmuls run in bf16 with fp32 accumulation (``preferred_element_type``),
  norms and softmax in fp32.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    DenseLinear, Linear, apply_linear)

Array = jax.Array


class LayerParams(NamedTuple):
    attn_norm: Array
    q_proj: Linear
    k_proj: Linear
    v_proj: Linear
    o_proj: Linear
    mlp_norm: Array
    gate_proj: Linear
    up_proj: Linear
    down_proj: Linear


class ModelParams(NamedTuple):
    embed: Array                   # (vocab, hidden)
    layers: List[LayerParams]
    final_norm: Array
    lm_head: Optional[Linear]      # None => tied with embed


class KVCache(NamedTuple):
    """Static-shape decode cache: (layers, batch, max_seq, kv_heads, head_dim)."""
    k: Array
    v: Array

    @staticmethod
    def create(config: ModelConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (config.num_layers, batch, max_len, config.num_kv_heads,
                 config.head_dim)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class QuantKVCache(NamedTuple):
    """int8 KV cache with per-(token, head) symmetric scales.

    Halves cache HBM traffic (the decode-attention bottleneck at long
    context) and doubles context capacity vs a bf16 :class:`KVCache`.
    Scales are applied inside attention as rank-1 rescales of the logits
    (K side) and of the probabilities (V side), so the dequantized tensors
    are never materialized in HBM.
    """
    k: Array                       # (L, B, T, KVH, D) int8
    v: Array                       # (L, B, T, KVH, D) int8
    k_scale: Array                 # (L, B, T, KVH) f32
    v_scale: Array                 # (L, B, T, KVH) f32

    @staticmethod
    def create(config: ModelConfig, batch: int,
               max_len: int) -> "QuantKVCache":
        shape = (config.num_layers, batch, max_len, config.num_kv_heads,
                 config.head_dim)
        return QuantKVCache(jnp.zeros(shape, jnp.int8),
                            jnp.zeros(shape, jnp.int8),
                            jnp.zeros(shape[:-1], jnp.float32),
                            jnp.zeros(shape[:-1], jnp.float32))


class HeadMajorQuantKVCache(NamedTuple):
    """int8 KV cache in head-major layout for the flash decode kernel.

    Layout ``(L, B, KVH, T, D)`` (vs :class:`QuantKVCache`'s token-major
    ``(L, B, T, KVH, D)``): each (batch, kv-head) attention stream is a
    contiguous ``(T, D)`` slab, so the flash kernel's per-block DMA reads
    are contiguous instead of strided across heads. Scales are
    per-(token, head) as in :class:`QuantKVCache`.
    """
    k: Array                       # (L, B, KVH, T, D) int8
    v: Array                       # (L, B, KVH, T, D) int8
    k_scale: Array                 # (L, B, KVH, T) f32
    v_scale: Array                 # (L, B, KVH, T) f32

    @staticmethod
    def create(config: ModelConfig, batch: int,
               max_len: int) -> "HeadMajorQuantKVCache":
        shape = (config.num_layers, batch, config.num_kv_heads, max_len,
                 config.head_dim)
        return HeadMajorQuantKVCache(jnp.zeros(shape, jnp.int8),
                                     jnp.zeros(shape, jnp.int8),
                                     jnp.zeros(shape[:-1], jnp.float32),
                                     jnp.zeros(shape[:-1], jnp.float32))


def quantize_kv(x: Array) -> Tuple[Array, Array]:
    """Symmetric int8 quantization over the trailing head_dim axis.

    ``x``: (..., KVH, D) -> (int8 codes, f32 scales (..., KVH)).
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    scale = absmax / 127.0
    codes = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return codes, scale[..., 0]


def init_params(key: Array, config: ModelConfig,
                dtype=jnp.bfloat16) -> ModelParams:
    """Random init with standard transformer scaling (for tests / benches)."""
    h, im = config.hidden_size, config.intermediate_size
    keys = jax.random.split(key, config.num_layers + 2)

    def dense(k, out_d, in_d, bias=False):
        w = (jax.random.normal(k, (out_d, in_d), jnp.float32)
             * (in_d ** -0.5)).astype(dtype)
        b = jnp.zeros((out_d,), dtype) if bias else None
        return DenseLinear(w=w, b=b)

    layers = []
    for i in range(config.num_layers):
        ks = jax.random.split(keys[i], 7)
        layers.append(LayerParams(
            attn_norm=jnp.ones((h,), jnp.float32),
            q_proj=dense(ks[0], config.q_dim, h, config.attention_bias),
            k_proj=dense(ks[1], config.kv_dim, h, config.attention_bias),
            v_proj=dense(ks[2], config.kv_dim, h, config.attention_bias),
            o_proj=dense(ks[3], h, config.q_dim),
            mlp_norm=jnp.ones((h,), jnp.float32),
            gate_proj=dense(ks[4], im, h),
            up_proj=dense(ks[5], im, h),
            down_proj=dense(ks[6], h, im),
        ))
    embed = (jax.random.normal(keys[-2], (config.vocab_size, h), jnp.float32)
             * 0.02).astype(dtype)
    lm_head = None if config.tie_word_embeddings else dense(
        keys[-1], config.vocab_size, h)
    return ModelParams(embed=embed, layers=layers,
                       final_norm=jnp.ones((h,), jnp.float32),
                       lm_head=lm_head)


def rms_norm(x: Array, weight: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight).astype(jnp.float32)


def rope_tables(config: ModelConfig, positions: Array) -> Tuple[Array, Array]:
    """(cos, sin) of shape (..., head_dim/2) for the given positions."""
    half = config.head_dim // 2
    inv_freq = 1.0 / (config.rope_theta ** (
        jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """Rotate pairs split as (first half, second half) — HF Llama convention.

    ``x``: (..., seq, heads, head_dim); cos/sin: (..., seq, head_dim/2).
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[..., None, :]
    s = sin[..., None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s],
                           axis=-1).astype(x.dtype)


def _attention(q: Array, k: Array, v: Array, mask: Optional[Array]) -> Array:
    """q: (B, S, H, D); k/v: (B, T, KVH, D). GQA via head broadcasting."""
    B, S, H, D = q.shape
    KVH = k.shape[2]
    groups = H // KVH
    q = q.reshape(B, S, KVH, groups, D)
    logits = jnp.einsum("bskgd,btkd->bkgst", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / jnp.sqrt(jnp.float32(D))
    if mask is not None:
        logits = logits + mask            # mask broadcast: (B, 1, 1, S, T)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v.astype(jnp.float32))
    return out.reshape(B, S, H, D)


def _attention_q8(q: Array, k: Array, v: Array, ks: Array, vs: Array,
                  mask: Optional[Array]) -> Array:
    """Attention over an int8 KV cache (same math as :func:`_attention`).

    ``q``: (B, S, H, D) f32; ``k``/``v``: (B, T, KVH, D) int8;
    ``ks``/``vs``: (B, T, KVH) f32 per-(token, head) scales. The K scale is
    folded into the logits and the V scale into the probabilities, so the
    int8 slabs go straight from HBM into the dots.
    """
    B, S, H, D = q.shape
    KVH = k.shape[2]
    groups = H // KVH
    q = q.reshape(B, S, KVH, groups, D)
    logits = jnp.einsum("bskgd,btkd->bkgst", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    logits = logits * (ks.transpose(0, 2, 1)[:, :, None, None, :]
                       / jnp.sqrt(jnp.float32(D)))
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1)
    pv = probs * vs.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bkgst,btkd->bskgd", pv, v.astype(jnp.float32))
    return out.reshape(B, S, H, D)


def _layer(x: Array, lp: LayerParams, config: ModelConfig,
           cos: Array, sin: Array, mask: Optional[Array],
           cache_kv: Optional[Tuple[Array, Array]],
           cache_pos: Optional[Array],
           use_pallas: bool, interpret: bool):
    """One transformer block. Returns (x, (new_k, new_v) or None)."""
    B, S, h = x.shape
    lin = functools.partial(apply_linear, use_pallas=use_pallas,
                            interpret=interpret)

    y = rms_norm(x, lp.attn_norm, config.rms_norm_eps)
    q = lin(lp.q_proj, y).reshape(B, S, config.num_heads, config.head_dim)
    k = lin(lp.k_proj, y).reshape(B, S, config.num_kv_heads, config.head_dim)
    v = lin(lp.v_proj, y).reshape(B, S, config.num_kv_heads, config.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice(
            ck, k.astype(ck.dtype), (0, cache_pos, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cv, v.astype(cv.dtype), (0, cache_pos, 0, 0))
        attn = _attention(q, ck, cv, mask)
        new_cache = (ck, cv)
    else:
        attn = _attention(q, k, v, mask)
        new_cache = None

    attn = attn.reshape(B, S, config.q_dim)
    x = x + lin(lp.o_proj, attn)

    y = rms_norm(x, lp.mlp_norm, config.rms_norm_eps)
    gate = lin(lp.gate_proj, y)
    up = lin(lp.up_proj, y)
    x = x + lin(lp.down_proj, jax.nn.silu(gate) * up)
    return x, new_cache


def _logits(x: Array, params: ModelParams, config: ModelConfig,
            use_pallas: bool, interpret: bool) -> Array:
    x = rms_norm(x, params.final_norm, config.rms_norm_eps)
    if params.lm_head is None:
        return jnp.dot(x.astype(jnp.bfloat16),
                       params.embed.T.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return apply_linear(params.lm_head, x, use_pallas=use_pallas,
                        interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("config", "use_pallas", "interpret"))
def forward(params: ModelParams, tokens: Array, config: ModelConfig,
            use_pallas: bool = False, interpret: bool = False) -> Array:
    """Full-sequence forward (training / perplexity eval). tokens: (B, S)."""
    B, S = tokens.shape
    x = params.embed[tokens].astype(jnp.float32)
    positions = jnp.arange(S)[None, :]
    cos, sin = rope_tables(config, positions)
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    mask = jnp.where(causal, 0.0, -1e30)[None, None, None, :, :]
    for lp in params.layers:
        x, _ = _layer(x, lp, config, cos, sin, mask, None, None,
                      use_pallas, interpret)
    return _logits(x, params, config, use_pallas, interpret)


@functools.partial(jax.jit,
                   static_argnames=("config", "use_pallas", "interpret"))
def prefill(params: ModelParams, tokens: Array, cache: KVCache,
            config: ModelConfig, use_pallas: bool = False,
            interpret: bool = False) -> Tuple[Array, KVCache]:
    """Run the prompt through the model, filling the cache from position 0.

    tokens: (B, S). Returns (logits at the last position (B, vocab), cache).
    """
    B, S = tokens.shape
    T = cache.k.shape[2]
    x = params.embed[tokens].astype(jnp.float32)
    positions = jnp.arange(S)[None, :]
    cos, sin = rope_tables(config, positions)
    valid = jnp.arange(T)[None, :] <= jnp.arange(S)[:, None]   # (S, T) causal
    mask = jnp.where(valid, 0.0, -1e30)[None, None, None, :, :]
    ks, vs = [], []
    for i, lp in enumerate(params.layers):
        x, kv = _layer(x, lp, config, cos, sin, mask,
                       (cache.k[i], cache.v[i]), 0, use_pallas, interpret)
        ks.append(kv[0])
        vs.append(kv[1])
    logits = _logits(x[:, -1:, :], params, config, use_pallas, interpret)
    return logits[:, 0, :], KVCache(jnp.stack(ks), jnp.stack(vs))


@functools.partial(jax.jit,
                   static_argnames=("config", "use_pallas", "interpret"))
def decode_step(params: ModelParams, token: Array, pos: Array,
                cache: KVCache, config: ModelConfig,
                use_pallas: bool = False,
                interpret: bool = False) -> Tuple[Array, KVCache]:
    """One autoregressive step. token: (B,), pos: scalar current position.

    Returns (logits (B, vocab), updated cache).
    """
    B = token.shape[0]
    T = cache.k.shape[2]
    x = params.embed[token][:, None, :].astype(jnp.float32)
    positions = jnp.full((B, 1), pos)
    cos, sin = rope_tables(config, positions)
    valid = (jnp.arange(T) <= pos)[None, :]                    # (1, T)
    mask = jnp.where(valid, 0.0, -1e30)[None, None, None, :, :]
    ks, vs = [], []
    for i, lp in enumerate(params.layers):
        x, kv = _layer(x, lp, config, cos, sin, mask,
                       (cache.k[i], cache.v[i]), pos, use_pallas, interpret)
        ks.append(kv[0])
        vs.append(kv[1])
    logits = _logits(x, params, config, use_pallas, interpret)
    return logits[:, 0, :], KVCache(jnp.stack(ks), jnp.stack(vs))


@functools.partial(jax.jit,
                   static_argnames=("config", "use_pallas", "interpret"))
def decode_step_batched(params: ModelParams, tokens: Array, pos: Array,
                        cache: KVCache, config: ModelConfig,
                        use_pallas: bool = False,
                        interpret: bool = False) -> Tuple[Array, KVCache]:
    """One decode step with a *per-row* position vector (continuous batching).

    tokens: (B,), pos: (B,) current position of each sequence slot. Rows
    whose position is stale (finished/free slots) still compute but their
    cache writes land at their own ``pos`` — the engine masks their outputs.
    Returns (logits (B, vocab), updated cache).
    """
    B = tokens.shape[0]
    T = cache.k.shape[2]
    x = params.embed[tokens][:, None, :].astype(jnp.float32)
    cos, sin = rope_tables(config, pos[:, None])
    valid = jnp.arange(T)[None, :] <= pos[:, None]             # (B, T)
    mask = jnp.where(valid, 0.0, -1e30)[:, None, None, None, :]
    lin = functools.partial(apply_linear, use_pallas=use_pallas,
                            interpret=interpret)
    rows = jnp.arange(B)
    ks, vs = [], []
    for i, lp in enumerate(params.layers):
        y = rms_norm(x, lp.attn_norm, config.rms_norm_eps)
        q = lin(lp.q_proj, y).reshape(B, 1, config.num_heads, config.head_dim)
        k = lin(lp.k_proj, y).reshape(B, 1, config.num_kv_heads,
                                      config.head_dim)
        v = lin(lp.v_proj, y).reshape(B, 1, config.num_kv_heads,
                                      config.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ck = cache.k[i].at[rows, pos].set(k[:, 0].astype(cache.k.dtype))
        cv = cache.v[i].at[rows, pos].set(v[:, 0].astype(cache.v.dtype))
        attn = _attention(q, ck, cv, mask).reshape(B, 1, config.q_dim)
        x = x + lin(lp.o_proj, attn)
        y = rms_norm(x, lp.mlp_norm, config.rms_norm_eps)
        x = x + lin(lp.down_proj,
                    jax.nn.silu(lin(lp.gate_proj, y)) * lin(lp.up_proj, y))
        ks.append(ck)
        vs.append(cv)
    logits = _logits(x, params, config, use_pallas, interpret)
    return logits[:, 0, :], KVCache(jnp.stack(ks), jnp.stack(vs))


@functools.partial(jax.jit,
                   static_argnames=("config", "use_pallas", "interpret"))
def prefill_into_slot(params: ModelParams, tokens: Array, slot: Array,
                      cache: KVCache, config: ModelConfig,
                      use_pallas: bool = False,
                      interpret: bool = False,
                      last_pos: Optional[Array] = None
                      ) -> Tuple[Array, KVCache]:
    """Prefill one prompt (1, S) into batch slot ``slot`` of a shared cache.

    ``last_pos`` selects which position's logits to return (default S-1) —
    used when the prompt is right-padded to a length bucket: pad positions
    beyond ``last_pos`` are causally invisible to all future decode steps
    (each decode step at position p attends only to positions <= p, and the
    first real decode overwrites pad slot K/V before exposing it).

    Returns (logits at ``last_pos`` (vocab,), updated cache).
    """
    S = tokens.shape[1]
    x = params.embed[tokens].astype(jnp.float32)
    positions = jnp.arange(S)[None, :]
    cos, sin = rope_tables(config, positions)
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    mask = jnp.where(causal, 0.0, -1e30)[None, None, None, :, :]
    lin = functools.partial(apply_linear, use_pallas=use_pallas,
                            interpret=interpret)
    ks, vs = [], []
    for i, lp in enumerate(params.layers):
        y = rms_norm(x, lp.attn_norm, config.rms_norm_eps)
        q = lin(lp.q_proj, y).reshape(1, S, config.num_heads, config.head_dim)
        k = lin(lp.k_proj, y).reshape(1, S, config.num_kv_heads,
                                      config.head_dim)
        v = lin(lp.v_proj, y).reshape(1, S, config.num_kv_heads,
                                      config.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = _attention(q, k, v, mask).reshape(1, S, config.q_dim)
        x = x + lin(lp.o_proj, attn)
        y = rms_norm(x, lp.mlp_norm, config.rms_norm_eps)
        x = x + lin(lp.down_proj,
                    jax.nn.silu(lin(lp.gate_proj, y)) * lin(lp.up_proj, y))
        ck = jax.lax.dynamic_update_slice(
            cache.k[i], k.astype(cache.k.dtype),
            (slot, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cache.v[i], v.astype(cache.v.dtype),
            (slot, 0, 0, 0))
        ks.append(ck)
        vs.append(cv)
    if last_pos is None:
        x_last = x[:, -1:, :]
    else:
        x_last = jax.lax.dynamic_slice_in_dim(x, last_pos, 1, axis=1)
    logits = _logits(x_last, params, config, use_pallas, interpret)
    return logits[0, 0, :], KVCache(jnp.stack(ks), jnp.stack(vs))


def generate_greedy(params: ModelParams, prompt: Array, max_new_tokens: int,
                    config: ModelConfig, use_pallas: bool = False,
                    interpret: bool = False) -> Array:
    """Greedy generation (reference eval uses greedy ``model.generate``,
    ``main.py:358``). prompt: (B, S). Returns (B, S + max_new_tokens)."""
    B, S = prompt.shape
    total = S + max_new_tokens
    cache = KVCache.create(config, B, total)
    logits, cache = prefill(params, prompt, cache, config, use_pallas,
                            interpret)
    tokens = [jnp.argmax(logits, axis=-1)]
    for step in range(max_new_tokens - 1):
        logits, cache = decode_step(params, tokens[-1],
                                    jnp.asarray(S + step), cache, config,
                                    use_pallas, interpret)
        tokens.append(jnp.argmax(logits, axis=-1))
    return jnp.concatenate([prompt, jnp.stack(tokens, axis=1)], axis=1)
