"""Whole-step persistent-kernel decode path (ONE Pallas call per step).

Wraps :func:`ops.megastep.megastep` — the single-launch 32-layer decode
megakernel — with the model-level plumbing: embedding lookup, rope
tables, the end-of-step staged KV commit, final norm and lm_head. See
the kernel module docstring for the design; this module mirrors
``models.fused.decode_step_fused``'s interface so engines and the bench
can switch per-flag.

The reference has no serving path (``main.py:197-199`` materializes
dense weights into HF modules); this is pure TPU-serving design.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear)
from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    HeadMajorQuantKVCache)
from ee274_convexcaldera_llm_quantization_tpu.models.fused import (
    FusedStackedParams)
from ee274_convexcaldera_llm_quantization_tpu.ops import megastep as MS

Array = jax.Array


def persistent_supported(params: FusedStackedParams,
                         config: ModelConfig) -> bool:
    """Whether the whole-step megakernel can serve this model: MHA,
    128-aligned head_dim/rank, f >= 2 packing, int8 factors in the
    N-concatenated ('l'/'lr') layout for the fused groups, int8-factor
    w4a8 o/down projections, no biases."""
    lp = params.layers
    qkv, gu = lp.qkv, lp.gateup
    o, dn = lp.o_proj, lp.down_proj
    if config.num_heads != config.num_kv_heads:
        return False
    if config.head_dim % 128 or config.hidden_size % 128:
        return False
    if qkv.L_cat is None or gu.L_cat is None:
        return False
    if qkv.b is not None or gu.b is not None:
        return False
    ranks = set(qkv.ranks) | set(gu.ranks)
    if not (isinstance(o, CalderaLinear) and isinstance(dn, CalderaLinear)):
        return False
    if o.b is not None or dn.b is not None:
        return False
    if o.L_scale is None or dn.L_scale is None or o.R_scale is None \
            or dn.R_scale is None:
        return False
    ranks |= {o.L.shape[2], dn.L.shape[2]}
    if len(ranks) != 1 or next(iter(ranks)) % 128:
        return False
    bits = {qkv.num_bits, gu.num_bits, o.num_bits, dn.num_bits}
    if len(bits) != 1 or next(iter(bits)) not in (2, 4):
        return False
    if config.intermediate_size % 128 or config.intermediate_size > 128 * 128:
        return False
    return True


class GateUpInterleaved(NamedTuple):
    """Gate/up arrays re-ordered into interleaved bng-row blocks
    (``[gate_j ++ up_j]``) for the megastep kernel's single-phase
    gate+up programs. Build ONCE at load time (the packed array is
    GB-scale at 7B; interleaving it per step would double weight
    traffic)."""
    packed: Array
    scales: Array
    L_cat: Array
    L_scale_cat: Array


def megastep_bng(im: int) -> int:
    """The megastep plan's gate/up block width for this model."""
    from ee274_convexcaldera_llm_quantization_tpu.ops.megastep import _Plan
    return _Plan._bn(256, im)


@functools.partial(jax.jit, static_argnames=("im",))
def prepare_gateup_interleaved(gu, im: int) -> GateUpInterleaved:
    """Interleave a fused gate++up projection's rows by megastep blocks."""
    bng = megastep_bng(im)
    ng = im // bng
    j = jnp.arange(ng)[:, None]
    half = jnp.stack([j * bng + jnp.arange(bng)[None, :],
                      im + j * bng + jnp.arange(bng)[None, :]],
                     axis=1)                       # (ng, 2, bng)
    perm = half.reshape(-1)
    return GateUpInterleaved(
        packed=jnp.take(gu.packed, perm, axis=1),
        scales=jnp.take(gu.scales, perm, axis=1),
        L_cat=jnp.take(gu.L_cat, perm, axis=1),
        L_scale_cat=jnp.take(gu.L_scale_cat, perm, axis=1))


@functools.partial(jax.jit,
                   static_argnames=("config", "interpret", "staged_kv"),
                   donate_argnames=("cache",))
def decode_step_persistent(params: FusedStackedParams, tokens: Array,
                           pos: Array, cache, config: ModelConfig,
                           interpret: bool = False,
                           staged_kv: str = "uniform",
                           prep: GateUpInterleaved = None):
    """Batched decode step through the whole-layer megakernel.

    Same contract as ``decode_step_fused(staged_kv=...)`` on a head-major
    int8 cache: the cache holds tokens ``< pos``; this step's K/V are
    committed at ``pos`` on return. ``staged_kv`` selects the commit
    shape ("uniform" is guarded — ragged positions fall back to the
    per-row commit, as in the fused path).
    """
    if not isinstance(cache, HeadMajorQuantKVCache):
        raise ValueError("decode_step_persistent requires a "
                         "HeadMajorQuantKVCache")
    if not persistent_supported(params, config):
        raise ValueError("model not supported by the persistent kernel "
                         "(need MHA, 128-aligned head_dim/rank, int8 "
                         "'l'-layout factors; see persistent_supported)")
    lp = params.layers
    qkv, gu = lp.qkv, lp.gateup
    o, dn = lp.o_proj, lp.down_proj
    B = tokens.shape[0]
    rank = o.L.shape[2]

    x0 = params.embed[tokens].astype(jnp.float32)
    cos, sin = llama.rope_tables(config, pos[:, None])   # (B, 1, half)
    gs_all = jnp.concatenate([
        qkv.global_scale,                                # (L, 3)
        o.global_scale.reshape(-1, 1),
        gu.global_scale,                                 # (L, 2)
        dn.global_scale.reshape(-1, 1),
        jnp.zeros((config.num_layers, 1), jnp.float32),
    ], axis=1)

    if prep is None:
        # fallback for tests/small models: interleave per call. For real
        # serving, pass prepare_gateup_interleaved(params.layers.gateup,
        # im) built ONCE — the packed gate/up array is GB-scale at 7B
        prep = prepare_gateup_interleaved(gu, config.intermediate_size)

    xo, k8, ks8, v8, vs8 = MS.megastep(
        x0, pos, lp.attn_norm, lp.mlp_norm,
        qkv.packed, qkv.scales, qkv.R, qkv.R_scale, qkv.L_cat,
        qkv.L_scale_cat,
        o.packed, o.scales, o.R, o.R_scale, o.L, o.L_scale,
        prep.packed, prep.scales, gu.R, gu.R_scale, prep.L_cat,
        prep.L_scale_cat,
        dn.packed, dn.scales, dn.R, dn.R_scale, dn.L, dn.L_scale,
        gs_all,
        cache.k, cache.k_scale, cache.v, cache.v_scale,
        cos[:, 0, :], sin[:, 0, :],
        num_bits=qkv.num_bits, rank=rank,
        eps=config.rms_norm_eps,
        kvhd=(config.num_kv_heads, config.head_dim),
        interpret=interpret)

    # end-of-step staged commit (same shapes/guards as the fused path)
    ck, cv, cks, cvs = cache

    def _commit_uniform(ck, cv, cks, cvs):
        p0 = pos[0]
        return (
            jax.lax.dynamic_update_slice(
                ck, k8[:, :, :, None, :], (0, 0, 0, p0, 0)),
            jax.lax.dynamic_update_slice(
                cv, v8[:, :, :, None, :], (0, 0, 0, p0, 0)),
            jax.lax.dynamic_update_slice(
                cks, ks8[:, :, :, None], (0, 0, 0, p0)),
            jax.lax.dynamic_update_slice(
                cvs, vs8[:, :, :, None], (0, 0, 0, p0)))

    def _commit_per_row(ck, cv, cks, cvs):
        for b in range(B):
            ck = jax.lax.dynamic_update_slice(
                ck, k8[:, b][:, None, :, None, :], (0, b, 0, pos[b], 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v8[:, b][:, None, :, None, :], (0, b, 0, pos[b], 0))
            cks = jax.lax.dynamic_update_slice(
                cks, ks8[:, b][:, None, :, None], (0, b, 0, pos[b]))
            cvs = jax.lax.dynamic_update_slice(
                cvs, vs8[:, b][:, None, :, None], (0, b, 0, pos[b]))
        return ck, cv, cks, cvs

    if staged_kv == "uniform":
        ck, cv, cks, cvs = jax.lax.cond(
            jnp.all(pos == pos[0]), _commit_uniform, _commit_per_row,
            ck, cv, cks, cvs)
    else:
        ck, cv, cks, cvs = _commit_per_row(ck, cv, cks, cvs)
    cache = HeadMajorQuantKVCache(ck, cv, cks, cvs)

    logits = llama._logits(
        xo[:, None, :],
        llama.ModelParams(params.embed, [], params.final_norm,
                          params.lm_head),
        config, False, interpret)
    return logits[:, 0, :], cache
