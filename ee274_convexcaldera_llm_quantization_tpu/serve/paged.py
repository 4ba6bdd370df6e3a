"""Paged KV cache and paged decode step.

vLLM-style paging, TPU-first: the KV pool is one static-shape array of
pages per layer; sequences own pages via the native allocator
(``serve.runtime``), and the decode step receives per-slot page tables as a
device array. Attention gathers the logical context through the page table
— XLA lowers the gather to dynamic slices over HBM — so fragmentation never
copies KV data and context capacity is bounded by the pool, not by
``max_slots * max_seq_len``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    apply_linear)
from ee274_convexcaldera_llm_quantization_tpu.models import llama

Array = jax.Array


class PagedKVPool(NamedTuple):
    """(layers, num_pages, page_size, kv_heads, head_dim) page pools."""

    k: Array
    v: Array

    @staticmethod
    def create(config: ModelConfig, num_pages: int, page_size: int,
               dtype=jnp.bfloat16) -> "PagedKVPool":
        shape = (config.num_layers, num_pages, page_size,
                 config.num_kv_heads, config.head_dim)
        return PagedKVPool(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def page_size(self) -> int:
        return self.k.shape[2]


@functools.partial(jax.jit,
                   static_argnames=("config", "use_pallas", "interpret"))
def paged_decode_step(
    params: llama.ModelParams,
    tokens: Array,          # (B,) current token per slot
    pos: Array,             # (B,) positions
    pool: PagedKVPool,
    page_tables: Array,     # (B, max_pages) int32, padded with 0
    config: ModelConfig,
    use_pallas: bool = False,
    interpret: bool = False,
    active: Optional[Array] = None,   # (B,) bool; False slots write nothing
) -> Tuple[Array, PagedKVPool]:
    """One decode step over the paged pool.

    Each slot writes its K/V into page ``page_tables[b, pos // P]`` at
    offset ``pos % P``, then attends over its gathered logical context
    ``page_tables -> (max_pages * P)`` with positions ``> pos`` masked.

    ``active`` masks the K/V WRITES of unused batch slots: a zero-filled
    page-table row would otherwise scatter that slot's garbage K/V into
    page 0 — which may be another sequence's live (possibly prefix-shared)
    page. Inactive writes are routed out of bounds, which JAX scatter
    semantics drop.
    """
    B = tokens.shape[0]
    P = pool.page_size
    max_pages = page_tables.shape[1]
    T = max_pages * P

    x = params.embed[tokens][:, None, :].astype(jnp.float32)
    cos, sin = llama.rope_tables(config, pos[:, None])
    valid = jnp.arange(T)[None, :] <= pos[:, None]
    mask = jnp.where(valid, 0.0, -1e30)[:, None, None, None, :]
    lin = functools.partial(apply_linear, use_pallas=use_pallas,
                            interpret=interpret)
    write_page = jnp.take_along_axis(page_tables, (pos // P)[:, None],
                                     axis=1)[:, 0]               # (B,)
    if active is not None:
        num_pages = pool.k.shape[1]
        write_page = jnp.where(active, write_page, num_pages)  # OOB: dropped
    write_off = pos % P

    ks, vs = [], []
    for i, lp in enumerate(params.layers):
        y = llama.rms_norm(x, lp.attn_norm, config.rms_norm_eps)
        q = lin(lp.q_proj, y).reshape(B, 1, config.num_heads, config.head_dim)
        k = lin(lp.k_proj, y).reshape(B, 1, config.num_kv_heads,
                                      config.head_dim)
        v = lin(lp.v_proj, y).reshape(B, 1, config.num_kv_heads,
                                      config.head_dim)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        ck = pool.k[i].at[write_page, write_off].set(
            k[:, 0].astype(pool.k.dtype))
        cv = pool.v[i].at[write_page, write_off].set(
            v[:, 0].astype(pool.v.dtype))
        # gather the logical context: (B, max_pages, P, KVH, D) -> (B, T, ...)
        k_ctx = ck[page_tables].reshape(B, T, config.num_kv_heads,
                                        config.head_dim)
        v_ctx = cv[page_tables].reshape(B, T, config.num_kv_heads,
                                        config.head_dim)
        attn = llama._attention(q, k_ctx, v_ctx, mask).reshape(
            B, 1, config.q_dim)
        x = x + lin(lp.o_proj, attn)
        y = llama.rms_norm(x, lp.mlp_norm, config.rms_norm_eps)
        x = x + lin(lp.down_proj,
                    jax.nn.silu(lin(lp.gate_proj, y)) * lin(lp.up_proj, y))
        ks.append(ck)
        vs.append(cv)
    logits = llama._logits(x, params, config, use_pallas, interpret)
    return logits[:, 0, :], PagedKVPool(jnp.stack(ks), jnp.stack(vs))


@functools.partial(jax.jit,
                   static_argnames=("config", "use_pallas", "interpret"))
def paged_prefill(
    params: llama.ModelParams,
    tokens: Array,          # (1, S) prompt
    pool: PagedKVPool,
    page_table: Array,      # (max_pages,) this sequence's pages
    config: ModelConfig,
    use_pallas: bool = False,
    interpret: bool = False,
) -> Tuple[Array, PagedKVPool]:
    """Prefill one prompt, scattering K/V into the sequence's pages.

    Returns (last-position logits (vocab,), updated pool).
    """
    S = tokens.shape[1]
    P = pool.page_size
    x = params.embed[tokens].astype(jnp.float32)
    positions = jnp.arange(S)[None, :]
    cos, sin = llama.rope_tables(config, positions)
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    mask = jnp.where(causal, 0.0, -1e30)[None, None, None, :, :]
    lin = functools.partial(apply_linear, use_pallas=use_pallas,
                            interpret=interpret)
    tok_pages = page_table[jnp.arange(S) // P]                  # (S,)
    tok_offs = jnp.arange(S) % P

    ks, vs = [], []
    for i, lp in enumerate(params.layers):
        y = llama.rms_norm(x, lp.attn_norm, config.rms_norm_eps)
        q = lin(lp.q_proj, y).reshape(1, S, config.num_heads, config.head_dim)
        k = lin(lp.k_proj, y).reshape(1, S, config.num_kv_heads,
                                      config.head_dim)
        v = lin(lp.v_proj, y).reshape(1, S, config.num_kv_heads,
                                      config.head_dim)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        attn = llama._attention(q, k, v, mask).reshape(1, S, config.q_dim)
        ck = pool.k[i].at[tok_pages, tok_offs].set(
            k[0].astype(pool.k.dtype))
        cv = pool.v[i].at[tok_pages, tok_offs].set(
            v[0].astype(pool.v.dtype))
        x = x + lin(lp.o_proj, attn)
        y = llama.rms_norm(x, lp.mlp_norm, config.rms_norm_eps)
        x = x + lin(lp.down_proj,
                    jax.nn.silu(lin(lp.gate_proj, y)) * lin(lp.up_proj, y))
        ks.append(ck)
        vs.append(cv)
    logits = llama._logits(x[:, -1:, :], params, config, use_pallas,
                           interpret)
    return logits[0, 0, :], PagedKVPool(jnp.stack(ks), jnp.stack(vs))


@functools.partial(jax.jit,
                   static_argnames=("config", "use_pallas", "interpret"))
def paged_prefill_suffix(
    params: llama.ModelParams,
    tokens: Array,          # (1, Sq) UNcached suffix of the prompt
    cached_len: Array,      # () tokens already in the pool (page-aligned)
    pool: PagedKVPool,
    page_table: Array,      # (max_pages,) this sequence's pages
    config: ModelConfig,
    use_pallas: bool = False,
    interpret: bool = False,
) -> Tuple[Array, PagedKVPool]:
    """Prefill only the uncached suffix of a prompt (prefix-cache hit).

    The first ``cached_len`` tokens' K/V already sit in the sequence's
    shared pages (written by an earlier identical prefix — the native
    allocator guarantees shared pages are full and never rewritten).
    Suffix queries attend over the gathered paged context (prefix + the
    suffix itself), with positions beyond each query masked. Compute drops
    from O(S^2) to O(Sq * S): a hit on a long shared system prompt skips
    almost the whole prefill.
    """
    Sq = tokens.shape[1]
    P = pool.page_size
    max_pages = page_table.shape[0]
    T = max_pages * P
    x = params.embed[tokens].astype(jnp.float32)
    pos_abs = cached_len + jnp.arange(Sq)                   # (Sq,)
    cos, sin = llama.rope_tables(config, pos_abs[None, :])
    valid = jnp.arange(T)[None, :] <= pos_abs[:, None]      # (Sq, T)
    mask = jnp.where(valid, 0.0, -1e30)[None, None, None, :, :]
    lin = functools.partial(apply_linear, use_pallas=use_pallas,
                            interpret=interpret)
    tok_pages = page_table[pos_abs // P]
    tok_offs = pos_abs % P

    ks, vs = [], []
    for i, lp in enumerate(params.layers):
        y = llama.rms_norm(x, lp.attn_norm, config.rms_norm_eps)
        q = lin(lp.q_proj, y).reshape(1, Sq, config.num_heads,
                                      config.head_dim)
        k = lin(lp.k_proj, y).reshape(1, Sq, config.num_kv_heads,
                                      config.head_dim)
        v = lin(lp.v_proj, y).reshape(1, Sq, config.num_kv_heads,
                                      config.head_dim)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        ck = pool.k[i].at[tok_pages, tok_offs].set(k[0].astype(pool.k.dtype))
        cv = pool.v[i].at[tok_pages, tok_offs].set(v[0].astype(pool.v.dtype))
        k_ctx = ck[page_table].reshape(1, T, config.num_kv_heads,
                                       config.head_dim)
        v_ctx = cv[page_table].reshape(1, T, config.num_kv_heads,
                                       config.head_dim)
        attn = llama._attention(q, k_ctx, v_ctx, mask).reshape(
            1, Sq, config.q_dim)
        x = x + lin(lp.o_proj, attn)
        y = llama.rms_norm(x, lp.mlp_norm, config.rms_norm_eps)
        x = x + lin(lp.down_proj,
                    jax.nn.silu(lin(lp.gate_proj, y)) * lin(lp.up_proj, y))
        ks.append(ck)
        vs.append(cv)
    logits = llama._logits(x[:, -1:, :], params, config, use_pallas,
                           interpret)
    return logits[0, 0, :], PagedKVPool(jnp.stack(ks), jnp.stack(vs))
