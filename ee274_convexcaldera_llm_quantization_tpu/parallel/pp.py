"""Pipeline-parallel decode over a device mesh (layer-stage sharding).

The reference is strictly single-process / single-GPU (SURVEY.md section
2.10 lists pipeline parallelism as absent); this module is the TPU-native
stage-sharding layer for models whose packed weights exceed one chip's HBM
(13B-class and up, `main.py`-scale serving was never possible there).

Design — idiomatic XLA pipelining, not a port of GPU send/recv code:

- The **stacked** model's layer axis (leading axis of every
  ``StackedModelParams.layers`` leaf) is sharded over a ``pp`` mesh axis, so
  stage ``s`` physically holds layers ``[s*L/S, (s+1)*L/S)`` — packed codes,
  scales, factors, norms. Embedding / final norm / lm_head are replicated
  (they are ~an order of magnitude smaller than the layer stack at 7B+).
- The KV cache shards on the same layer axis: each stage owns the cache of
  its local layers for the **full** batch.
- One decode step runs a GPipe fill/drain schedule inside ``shard_map``:
  the batch splits into ``S`` microbatches; at tick ``t`` stage ``s``
  processes microbatch ``m = t - s`` (when ``0 <= m < S``) through its
  local layers via the same scalar-prefetch W4A8 kernels as the single-chip
  path (:func:`models.stacked.decode_layers_w4a8`), then ``ppermute``\\ s the
  activations one stage forward. After ``2S - 1`` ticks every microbatch has
  crossed all stages; the last stage accumulates logits.

The per-step bubble is the usual ``(S-1)/(2S-1)``; consecutive decode steps
could overlap fill/drain (future work — needs cross-step activation
carry). Use TP (:mod:`parallel.tp_decode`) for latency; PP buys HBM
capacity with per-hop ICI traffic of only ``B/S * hidden`` floats.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    DenseLinear)
from ee274_convexcaldera_llm_quantization_tpu.models import llama, stacked
from ee274_convexcaldera_llm_quantization_tpu.models.stacked import (
    StackedModelParams)

Array = jax.Array


def _path_names(path) -> list:
    return [getattr(e, "name", getattr(e, "key", "")) for e in path]


def param_specs(params: StackedModelParams, axis: str = "pp"):
    """PartitionSpec pytree: layer-stacked leaves sharded on their leading
    (layer) axis; embed / final_norm / lm_head replicated."""
    def spec(path, x):
        if "layers" in _path_names(path):
            return P(axis, *([None] * (x.ndim - 1)))
        return P(*([None] * x.ndim))
    return jax.tree_util.tree_map_with_path(spec, params)


def _cache_spec(cache, axis: str):
    """KV caches shard on the layer axis (dim 0)."""
    return type(cache)(*[P(axis, *([None] * (x.ndim - 1))) for x in cache])


def shard_stacked_model_pp(params: StackedModelParams, mesh: Mesh,
                           axis: str = "pp") -> StackedModelParams:
    """Place a stacked w4a8 model with layers stage-sharded over ``axis``.

    A tied (``None``) lm_head is materialized from the embedding so the
    last stage can compute logits without touching stage-0 state.
    """
    if params.lm_head is None:
        params = StackedModelParams(
            embed=params.embed, layers=params.layers,
            final_norm=params.final_norm,
            lm_head=DenseLinear(w=params.embed))
    specs = param_specs(params, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def shard_fused_model_pp(params, mesh: Mesh, axis: str = "pp"):
    """Place a fused w4a8 model (``FusedStackedParams``) with layers
    stage-sharded: every ``layers`` leaf carries the leading layer axis,
    so :func:`param_specs` applies unchanged. A tied (None) head is
    materialized as an int8 head (matching the single-chip fused path)."""
    from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
        quantize_linear_int8)
    if params.lm_head is None:
        params = params._replace(
            lm_head=quantize_linear_int8(DenseLinear(w=params.embed)))
    specs = param_specs(params, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def shard_kv_cache_pp(cache, mesh: Mesh, axis: str = "pp"):
    """Place a (Quant)KVCache with the layer axis sharded over ``axis``."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, _cache_spec(cache, axis))


@functools.partial(
    jax.jit,
    static_argnames=("config", "mesh", "axis", "interpret"),
    donate_argnames=("cache",))
def decode_step_w4a8_pp(params: StackedModelParams, tokens: Array,
                        pos: Array, cache, config: ModelConfig, mesh: Mesh,
                        axis: str = "pp", interpret: bool = False):
    """Pipeline-parallel batched decode step (see module docstring).

    ``params`` from :func:`shard_stacked_model_pp`, ``cache`` from
    :func:`shard_kv_cache_pp`. ``tokens``/``pos``: (B,) with
    ``B % n_stages == 0`` and ``config.num_layers % n_stages == 0``.
    Returns (logits (B, vocab) replicated, cache layer-sharded).
    """
    S = mesh.shape[axis]
    if config.num_layers % S:
        raise ValueError(f"num_layers={config.num_layers} not divisible by "
                         f"pp={S}")
    B = tokens.shape[0]
    if B % S:
        raise ValueError(f"batch={B} not divisible by pp={S} microbatches")
    Bmu = B // S
    cfg_local = dataclasses.replace(config,
                                    num_layers=config.num_layers // S)
    pspecs = param_specs(params, axis)
    cspecs = _cache_spec(cache, axis)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local_fn(params, tokens, pos, cache):
        s = jax.lax.axis_index(axis)
        hidden = params.embed.shape[1]
        x_in = jnp.zeros((Bmu, hidden), jnp.float32)
        logits_buf = jnp.zeros((B, config.vocab_size), jnp.float32)

        def tick(t, carry):
            x_in, cache, logits_buf = carry
            m = t - s                                # this stage's microbatch
            valid = jnp.logical_and(m >= 0, m < S)
            mc = jnp.clip(m, 0, S - 1)
            start = mc * Bmu
            tok_mu = jax.lax.dynamic_slice_in_dim(tokens, start, Bmu)
            pos_mu = jax.lax.dynamic_slice_in_dim(pos, start, Bmu)
            # stage 0 embeds the entering microbatch; later stages consume
            # the activations rotated in from the previous stage.
            x0 = params.embed[tok_mu].astype(jnp.float32)
            x = jnp.where(s == 0, x0, x_in)

            def run(x, cache):
                cache_mu = jax.tree.map(
                    lambda c: jax.lax.dynamic_slice_in_dim(c, start, Bmu,
                                                           axis=1), cache)
                x, cache_mu = stacked.decode_layers_w4a8(
                    params.layers, x, pos_mu, cache_mu, cfg_local,
                    interpret=interpret)
                cache = jax.tree.map(
                    lambda c, cm: jax.lax.dynamic_update_slice_in_dim(
                        c, cm.astype(c.dtype), start, axis=1), cache,
                    cache_mu)
                return x, cache

            x_out, cache = jax.lax.cond(
                valid, run, lambda x, c: (x, c), x, cache)

            def write_logits(buf):
                lg = llama._logits(
                    x_out[:, None, :],
                    llama.ModelParams(params.embed, [], params.final_norm,
                                      params.lm_head),
                    config, False, interpret)[:, 0, :]
                return jax.lax.dynamic_update_slice(
                    buf, lg.astype(buf.dtype), (start, 0))

            logits_buf = jax.lax.cond(
                jnp.logical_and(valid, s == S - 1), write_logits,
                lambda b: b, logits_buf)
            x_next = jax.lax.ppermute(x_out, axis, perm)
            return x_next, cache, logits_buf

        x_in, cache, logits_buf = jax.lax.fori_loop(
            0, 2 * S - 1, tick, (x_in, cache, logits_buf))
        # logits live only on the last stage; psum replicates (others zero)
        return jax.lax.psum(logits_buf, axis), cache

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(pspecs, P(None), P(None), cspecs),
        out_specs=(P(None, None), cspecs),
        check_vma=False,
    )(params, tokens, pos, cache)


def _prepend_axis(specs, axis: str):
    """Prepend ``axis`` to the leading (layer) dim of every ``layers``
    leaf's PartitionSpec — composes PP stage-sharding with a within-layer
    TP spec tree."""
    def upd(path, sp):
        if "layers" in _path_names(path):
            rest = tuple(sp) if len(sp) else ()
            assert not rest or rest[0] is None, rest
            return P(axis, *rest[1:]) if rest else P(axis)
        return sp
    return jax.tree_util.tree_map_with_path(
        upd, specs, is_leaf=lambda x: isinstance(x, P))


def shard_fused_model_pp_tp(params, mesh: Mesh, pp_axis: str = "pp",
                            tp_axis: str = "tp"):
    """Place a fused w4a8 model for combined PP x TP serving: the TP
    transforms (fused-group permutation + local static splits, exact
    row-parallel K-shard repack) from ``parallel.tp_fused`` first, then
    layer-stage sharding on top. Returns the placed params; specs are
    recomputed inside :func:`decode_step_fused_pp`."""
    from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
        quantize_linear_int8)
    from ee274_convexcaldera_llm_quantization_tpu.parallel import (
        tp_fused as tpf)

    tp = mesh.shape[tp_axis]
    lp = params.layers
    lm_head = params.lm_head
    if lm_head is None:
        lm_head = quantize_linear_int8(DenseLinear(w=params.embed))
    out = params._replace(
        layers=lp._replace(
            qkv=tpf._shard_col_group(lp.qkv, tp),
            o_proj=tpf._shard_row_linear(lp.o_proj, tp),
            gateup=tpf._shard_col_group(lp.gateup, tp),
            down_proj=tpf._shard_row_linear(lp.down_proj, tp)),
        lm_head=lm_head)
    specs = _prepend_axis(tpf.fused_param_specs(out, tp_axis), pp_axis)
    return jax.tree.map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
        out, specs)


@functools.partial(
    jax.jit,
    static_argnames=("config", "mesh", "axis", "interpret", "tp_axis"),
    donate_argnames=("cache",))
def decode_step_fused_pp(params, tokens: Array, pos: Array, cache,
                         config: ModelConfig, mesh: Mesh, axis: str = "pp",
                         interpret: bool = False, tp_axis=None):
    """Pipeline-parallel decode on the HEADLINE fused path (round 4).

    Same GPipe fill/drain schedule as :func:`decode_step_w4a8_pp`, but
    each stage runs its layer slice through the fused step's layer body
    (``models.fused.decode_layers_fused``: fused qkv/gate-up kernels,
    staged flash attention, int8 factors, staged KV commits) — so PP
    serves the same step the single-chip headline runs. ``params`` is a
    layer-stage-sharded ``FusedStackedParams`` (``param_specs`` works
    unchanged: every ``layers`` leaf carries the leading layer axis);
    ``cache`` is a layer-sharded :class:`HeadMajorQuantKVCache`.
    """
    import dataclasses as _dc
    from ee274_convexcaldera_llm_quantization_tpu.models import (
        fused as fusedm)

    S = mesh.shape[axis]
    if config.num_layers % S:
        raise ValueError(f"num_layers={config.num_layers} not divisible by "
                         f"pp={S}")
    B = tokens.shape[0]
    if B % S:
        raise ValueError(f"batch={B} not divisible by pp={S} microbatches")
    Bmu = B // S
    cfg_local = _dc.replace(config, num_layers=config.num_layers // S)
    if tp_axis is None:
        pspecs = param_specs(params, axis)
        cspecs = _cache_spec(cache, axis)
        vocab_local = config.vocab_size
        logits_out_spec = P(None, None)
    else:
        # PP x TP: params were placed by shard_fused_model_pp_tp; within a
        # stage the layer slice serves Megatron-TP (2 psums/layer inside
        # decode_layers_fused), and the cache shards (layer, kv-head).
        from ee274_convexcaldera_llm_quantization_tpu.parallel import (
            tp_decode as tpd, tp_fused as tpf)
        tp = mesh.shape[tp_axis]
        cfg_local = tpd._local_config(cfg_local, tp)
        pspecs = _prepend_axis(tpf.fused_param_specs(params, tp_axis), axis)
        base = tpf._cache_spec(cache, tp_axis)   # (None,None,tp,None,None)
        cspecs = type(cache)(*[P(axis, *tuple(sp)[1:]) for sp in base])
        vocab_local = config.vocab_size // tp
        logits_out_spec = P(None, tp_axis)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local_fn(params, tokens, pos, cache):
        s = jax.lax.axis_index(axis)
        hidden = params.embed.shape[1]
        x_in = jnp.zeros((Bmu, hidden), jnp.float32)
        logits_buf = jnp.zeros((B, vocab_local), jnp.float32)

        def tick(t, carry):
            x_in, cache, logits_buf = carry
            m = t - s
            valid = jnp.logical_and(m >= 0, m < S)
            mc = jnp.clip(m, 0, S - 1)
            start = mc * Bmu
            tok_mu = jax.lax.dynamic_slice_in_dim(tokens, start, Bmu)
            pos_mu = jax.lax.dynamic_slice_in_dim(pos, start, Bmu)
            x0 = params.embed[tok_mu].astype(jnp.float32)
            x = jnp.where(s == 0, x0, x_in)

            def run(x, cache):
                cache_mu = jax.tree.map(
                    lambda c: jax.lax.dynamic_slice_in_dim(c, start, Bmu,
                                                           axis=1), cache)
                x, cache_mu = fusedm.decode_layers_fused(
                    params.layers, x, pos_mu, cache_mu, cfg_local,
                    interpret=interpret, tp_axis=tp_axis)
                cache = jax.tree.map(
                    lambda c, cm: jax.lax.dynamic_update_slice_in_dim(
                        c, cm.astype(c.dtype), start, axis=1), cache,
                    cache_mu)
                return x, cache

            x_out, cache = jax.lax.cond(
                valid, run, lambda x, c: (x, c), x, cache)

            def write_logits(buf):
                lg = llama._logits(
                    x_out[:, None, :],
                    llama.ModelParams(params.embed, [], params.final_norm,
                                      params.lm_head),
                    config, False, interpret)[:, 0, :]
                return jax.lax.dynamic_update_slice(
                    buf, lg.astype(buf.dtype), (start, 0))

            logits_buf = jax.lax.cond(
                jnp.logical_and(valid, s == S - 1), write_logits,
                lambda b: b, logits_buf)
            x_next = jax.lax.ppermute(x_out, axis, perm)
            return x_next, cache, logits_buf

        x_in, cache, logits_buf = jax.lax.fori_loop(
            0, 2 * S - 1, tick, (x_in, cache, logits_buf))
        return jax.lax.psum(logits_buf, axis), cache

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(pspecs, P(None), P(None), cspecs),
        out_specs=(logits_out_spec, cspecs),
        check_vma=False,
    )(params, tokens, pos, cache)
