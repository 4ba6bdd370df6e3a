"""Mixed-precision serving: per-(layer, projection) bit widths, fast path.

``allocate.multigroup`` + ``surgery.compress_model_with_budget`` implement
the reference's documented-but-never-built multi-group objective (reference
``README.md:87-93``, ``CONVEX_CALDERA_IMPLEMENTATION.md:163-177``): every
projection gets its own bit width from the menu under a global budget.
Serving such a model fast is a TPU-design problem the reference never
faced (it materializes dense weights, ``main.py:197-199``):

- the fast stacked decode path (``stacked.decode_step_w4a8``) requires ONE
  static bit width per projection stack — packed code arrays of different
  widths have different shapes and cannot share a scalar-prefetch stack;
- unrolling the layer loop per bit width compiles one layer body per layer
  (minutes through a remote-compile relay).

The scheme here keeps the single compiled layer body: for each projection
name, layers are partitioned into **bit-width buckets**. Each bucket stacks
its member layers' packed codes/scales/factors (static ``num_bits``), and
two small index vectors map the global layer id to (bucket, index within
bucket). The decode loop stays a ``fori_loop``; each projection apply is a
``lax.switch`` over the buckets, so exactly one W4A8 kernel (at that
layer's width) runs per projection per step, still selecting its layer slab
via scalar-prefetch — no weight slices, no copies.

Layers the quality gate left dense ride in a DenseLinear bucket (bf16
matmul branch), mirroring the reference's revert-to-FP behavior
(``main.py:212-218``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, DenseLinear)
from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    HeadMajorQuantKVCache, KVCache, LayerParams, ModelParams, QuantKVCache)
from ee274_convexcaldera_llm_quantization_tpu.ops import attention as AT

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MixedProjection:
    """One projection across all layers, bucketed by bit width.

    ``buckets[j]`` is a stacked :class:`CalderaLinear` (leading axis = the
    bucket's member layers, static ``num_bits``) or a stacked
    :class:`DenseLinear`; ``bucket_of[l]`` / ``index_in[l]`` locate global
    layer ``l``'s weights.
    """

    buckets: Tuple[object, ...]
    bucket_of: Array              # (num_layers,) int32
    index_in: Array               # (num_layers,) int32
    # static copies of the bucket maps: the segmented decode path
    # (decode_step_mixed_segmented) partitions the layer sequence into
    # uniform-width runs at TRACE time, which needs the values as Python
    # ints, not traced arrays
    bucket_of_static: Tuple[int, ...] = dataclasses.field(
        default=(), metadata=dict(static=True))
    index_in_static: Tuple[int, ...] = dataclasses.field(
        default=(), metadata=dict(static=True))


class MixedLayerStack(NamedTuple):
    attn_norm: Array              # (layers, hidden)
    q_proj: MixedProjection
    k_proj: MixedProjection
    v_proj: MixedProjection
    o_proj: MixedProjection
    mlp_norm: Array
    gate_proj: MixedProjection
    up_proj: MixedProjection
    down_proj: MixedProjection


class MixedStackedParams(NamedTuple):
    embed: Array
    layers: MixedLayerStack
    final_norm: Array
    lm_head: Optional[object]


def _stack_lins(lins):
    """Stack a homogeneous list of CalderaLinear/DenseLinear on axis 0."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *lins)


def _bucket_key(lin):
    if isinstance(lin, DenseLinear):
        return ("dense", lin.w.shape, lin.b is not None)
    if not isinstance(lin, CalderaLinear):
        raise TypeError(f"unsupported projection type {type(lin).__name__}")
    if lin.mode != "w4a8":
        raise ValueError(
            "mixed fast serving requires w4a8-mode CalderaLinear "
            f"projections (got mode={lin.mode!r}); recompress with "
            "serving_mode='w4a8'")
    return ("caldera", lin.num_bits, lin.grid_bits, lin.packed.shape,
            lin.L.shape, lin.b is not None, lin.L_scale is not None,
            lin.R_scale is not None)


def _build_projection(lins) -> MixedProjection:
    keys = [_bucket_key(lin) for lin in lins]
    order = []                    # distinct keys, first-seen order
    for k in keys:
        if k not in order:
            order.append(k)
    bucket_of = jnp.asarray([order.index(k) for k in keys], jnp.int32)
    index_in = []
    counters = {k: 0 for k in order}
    for k in keys:
        index_in.append(counters[k])
        counters[k] += 1
    members = {k: [lin for lin, kk in zip(lins, keys) if kk == k]
               for k in order}
    buckets = tuple(_stack_lins(members[k]) for k in order)
    return MixedProjection(
        buckets=buckets, bucket_of=bucket_of,
        index_in=jnp.asarray(index_in, jnp.int32),
        bucket_of_static=tuple(order.index(k) for k in keys),
        index_in_static=tuple(index_in))


def stack_layers_mixed(params: ModelParams) -> MixedStackedParams:
    """Bucket a (possibly heterogeneous) per-layer model for mixed serving.

    Accepts the output of ``surgery.compress_model_with_budget(...,
    serving_mode="w4a8")``: any combination of per-layer bit widths plus
    dense (reverted/uncompressed) layers.
    """
    lps = params.layers
    fields = {"attn_norm": jnp.stack([lp.attn_norm for lp in lps]),
              "mlp_norm": jnp.stack([lp.mlp_norm for lp in lps])}
    for name in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                 "up_proj", "down_proj"):
        fields[name] = _build_projection([getattr(lp, name) for lp in lps])
    return MixedStackedParams(embed=params.embed,
                              layers=MixedLayerStack(**fields),
                              final_norm=params.final_norm,
                              lm_head=params.lm_head)


def num_bits_per_layer(mp: MixedProjection):
    """Static per-layer bit widths of a projection (16 for dense buckets)."""
    widths = []
    for j in range(len(mp.buckets)):
        b = mp.buckets[j]
        widths.append(b.num_bits if isinstance(b, CalderaLinear) else 16)
    return [widths[int(i)] for i in mp.bucket_of]


def _apply_bucket(bucket, idx, y, interpret: bool):
    """Apply layer ``idx`` of one bucket stack to activations ``y``."""
    from ee274_convexcaldera_llm_quantization_tpu.models import stacked as st
    from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as Kr

    if isinstance(bucket, DenseLinear):
        W = jax.lax.dynamic_index_in_dim(bucket.w, idx, 0, keepdims=False)
        out = jnp.dot(y.astype(jnp.bfloat16), W.T.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        if bucket.b is not None:
            out = out + jax.lax.dynamic_index_in_dim(
                bucket.b, idx, 0, keepdims=False)[None, :]
        return out
    yq = Kr.quantized_matmul_w4a8_stacked(
        y, bucket.packed, bucket.scales, idx, bucket.num_bits,
        interpret=interpret)
    ylr = st._low_rank_layer(bucket, idx, y)
    gs = jax.lax.dynamic_index_in_dim(bucket.global_scale, idx, 0,
                                      keepdims=False)
    out = (yq + ylr) * gs
    if bucket.b is not None:
        out = out + jax.lax.dynamic_index_in_dim(
            bucket.b, idx, 0, keepdims=False)[None, :]
    return out


def _apply_mixed(mp: MixedProjection, l, y, interpret: bool):
    """Projection apply for global layer ``l``: one switch, one kernel."""
    if len(mp.buckets) == 1:
        idx = jax.lax.dynamic_index_in_dim(mp.index_in, l, 0, keepdims=False)
        return _apply_bucket(mp.buckets[0], idx, y, interpret)
    branches = [functools.partial(_apply_bucket, b, interpret=interpret)
                for b in mp.buckets]
    bid = jax.lax.dynamic_index_in_dim(mp.bucket_of, l, 0, keepdims=False)
    idx = jax.lax.dynamic_index_in_dim(mp.index_in, l, 0, keepdims=False)
    return jax.lax.switch(bid, branches, idx, y)


@functools.partial(jax.jit,
                   static_argnames=("config", "interpret"),
                   donate_argnames=("cache",))
def decode_step_mixed(params: MixedStackedParams, tokens: Array, pos: Array,
                      cache, config: ModelConfig,
                      interpret: bool = False):
    """Batched decode step over a mixed-precision bucketed model.

    Mirrors ``stacked.decode_step_w4a8`` (same math, same cache handling)
    with each projection dispatched through its bit-width bucket. ``cache``
    may be bf16 :class:`KVCache`, int8 :class:`QuantKVCache`, or head-major
    :class:`HeadMajorQuantKVCache` (flash decode-attention kernel).
    """
    quant_kv = isinstance(cache, QuantKVCache)
    head_major = isinstance(cache, HeadMajorQuantKVCache)
    B = tokens.shape[0]
    T = cache.k.shape[3] if head_major else cache.k.shape[2]
    lp = params.layers
    x = params.embed[tokens].astype(jnp.float32)
    cos, sin = llama.rope_tables(config, pos[:, None])
    if head_major:
        mask = None
    else:
        valid = jnp.arange(T)[None, :] <= pos[:, None]
        mask = jnp.where(valid, 0.0, -1e30)[:, None, None, None, :]
    rows = jnp.arange(B)
    kv_groups = config.num_heads // config.num_kv_heads

    def body(l, carry):
        x, cache = carry
        an = jax.lax.dynamic_index_in_dim(lp.attn_norm, l, 0, keepdims=False)
        y = llama.rms_norm(x[:, None, :], an, config.rms_norm_eps)[:, 0]
        q = _apply_mixed(lp.q_proj, l, y, interpret).reshape(
            B, 1, config.num_heads, config.head_dim)
        k = _apply_mixed(lp.k_proj, l, y, interpret).reshape(
            B, 1, config.num_kv_heads, config.head_dim)
        v = _apply_mixed(lp.v_proj, l, y, interpret).reshape(
            B, 1, config.num_kv_heads, config.head_dim)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        if head_major:
            kq, ksc = llama.quantize_kv(k[:, 0])
            vq, vsc = llama.quantize_kv(v[:, 0])
            ck, cv, cks, cvs = cache
            for b in range(B):
                ck = jax.lax.dynamic_update_slice(
                    ck, kq[b][None, None, :, None, :], (l, b, 0, pos[b], 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, vq[b][None, None, :, None, :], (l, b, 0, pos[b], 0))
                cks = jax.lax.dynamic_update_slice(
                    cks, ksc[b][None, None, :, None], (l, b, 0, pos[b]))
                cvs = jax.lax.dynamic_update_slice(
                    cvs, vsc[b][None, None, :, None], (l, b, 0, pos[b]))
            cache = HeadMajorQuantKVCache(ck, cv, cks, cvs)
            qh = q[:, 0].reshape(B, config.num_kv_heads, kv_groups,
                                 config.head_dim)
            attn = AT.flash_decode_q8(
                qh, cache.k, cache.v, cache.k_scale, cache.v_scale,
                l, pos, interpret=interpret).reshape(B, config.q_dim)
        elif quant_kv:
            kq, ksc = llama.quantize_kv(k[:, 0])
            vq, vsc = llama.quantize_kv(v[:, 0])
            cache = QuantKVCache(
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
        x = x + _apply_mixed(lp.o_proj, l, attn, interpret)
        mn = jax.lax.dynamic_index_in_dim(lp.mlp_norm, l, 0, keepdims=False)
        y = llama.rms_norm(x[:, None, :], mn, config.rms_norm_eps)[:, 0]
        gate = _apply_mixed(lp.gate_proj, l, y, interpret)
        up = _apply_mixed(lp.up_proj, l, y, interpret)
        x = x + _apply_mixed(lp.down_proj, l, jax.nn.silu(gate) * up,
                             interpret)
        return x, cache

    x, cache = jax.lax.fori_loop(0, config.num_layers, body, (x, cache))
    logits = llama._logits(
        x[:, None, :],
        ModelParams(params.embed, [], params.final_norm, params.lm_head),
        config, False, interpret)
    return logits[:, 0, :], cache


_PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
               "up_proj", "down_proj")


def mixed_segments(layers: MixedLayerStack, num_layers: int):
    """Partition the layer sequence into maximal contiguous runs whose
    per-projection bucket signature is constant. Returns a list of
    ``(start, end, {proj_name: bucket_id})``."""
    sigs = []
    for l in range(num_layers):
        sigs.append(tuple(
            getattr(layers, n).bucket_of_static[l] for n in _PROJ_NAMES))
    runs = []
    start = 0
    for l in range(1, num_layers + 1):
        if l == num_layers or sigs[l] != sigs[start]:
            runs.append((start, l,
                         dict(zip(_PROJ_NAMES, sigs[start]))))
            start = l
    return runs


def truncate_mixed(params: MixedStackedParams,
                   n_layers: int) -> MixedStackedParams:
    """Early-exit view of a mixed model: the first ``n_layers`` blocks as
    a standalone :class:`MixedStackedParams` sharing the embedding /
    final-norm / head arrays.

    The speculative self-draft for a mixed-precision target (round-5
    composition, the 13B flagship serves ``decode_step_mixed_segmented``).
    ``_build_projection`` assigns bucket members in layer order, so the
    members with layer < ``n_layers`` are exactly a prefix of each bucket
    stack — truncation is a per-bucket leading-axis slice plus a bucket
    renumbering that drops buckets with no remaining members.
    """
    lp = params.layers
    fields = {"attn_norm": lp.attn_norm[:n_layers],
              "mlp_norm": lp.mlp_norm[:n_layers]}
    for name in _PROJ_NAMES:
        mp = getattr(lp, name)
        keep = [(mp.bucket_of_static[l], mp.index_in_static[l])
                for l in range(n_layers)]
        used = []                     # surviving old bucket ids, in order
        counts = {}                   # old id -> members kept
        for b, i in keep:
            if b not in used:
                used.append(b)
            counts[b] = max(counts.get(b, 0), i + 1)
        buckets = tuple(
            jax.tree.map(lambda a, n=counts[b]: a[:n], mp.buckets[b])
            for b in used)
        bucket_of = tuple(used.index(b) for b, _ in keep)
        index_in = tuple(i for _, i in keep)
        fields[name] = MixedProjection(
            buckets=buckets,
            bucket_of=jnp.asarray(bucket_of, jnp.int32),
            index_in=jnp.asarray(index_in, jnp.int32),
            bucket_of_static=bucket_of, index_in_static=index_in)
    return params._replace(layers=MixedLayerStack(**fields))


def prepare_fused_segments(params: MixedStackedParams,
                           config: ModelConfig):
    """Per-segment fused qkv / gate+up stacks for the segmented decode.

    Within a uniform-width run, the q/k/v (resp. gate/up) projections can
    be served exactly like the uniform fused path — ONE kernel launch and
    ONE activation quantization per group instead of three — whenever
    their container widths match. This builds, for each segment, a
    :class:`fused.FusedW4A8Linear` over the segment's layers (int8
    'l'-layout factors) or ``None`` when the widths differ / dense layers
    are present. Build ONCE at load (GB-scale gathers at 13B); pass the
    result to ``decode_step_mixed_segmented(fused_prep=...)``.

    Fusion is EXACT: the int8 factor codes and scales concatenate
    directly (R along the rank axis, L along N), so the fused group
    computes bit-for-bit what the unfused buckets compute (modulo the
    usual fused-vs-unfused f32 dot ordering). Segments whose projections
    have non-int8 factors, unequal containers, or unaligned ranks stay
    ``None`` (served unfused).
    """
    from ee274_convexcaldera_llm_quantization_tpu.models import (
        fused as fusedm)
    from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as Kr

    lp = params.layers
    runs = mixed_segments(lp, config.num_layers)

    def seg_lin(name, s, e, sig):
        mp = getattr(lp, name)
        b = mp.buckets[sig[name]]
        i0 = mp.index_in_static[s]
        return jax.tree.map(lambda a: a[i0:i0 + (e - s)], b)

    def try_fuse(names, s, e, sig):
        lins = [seg_lin(n, s, e, sig) for n in names]
        if not all(isinstance(l, CalderaLinear) and l.mode == "w4a8"
                   and l.b is None and l.L_scale is not None
                   and l.R_scale is not None for l in lins):
            return None
        if len({l.num_bits for l in lins}) != 1:
            return None
        ranks = {l.L.shape[2] for l in lins}
        if len(ranks) != 1 or next(iter(ranks)) % 128:
            return None
        splits = tuple(l.packed.shape[1] for l in lins)
        rks = tuple(l.R.shape[1] for l in lins)
        if not Kr.lr_stacked_supported(splits, rks):
            return None
        return fusedm.FusedW4A8Linear(
            packed=jnp.concatenate([l.packed for l in lins], axis=1),
            scales=jnp.concatenate([l.scales for l in lins], axis=1),
            R=jnp.concatenate([l.R for l in lins], axis=1),
            R_scale=jnp.concatenate([l.R_scale for l in lins], axis=1),
            Ls=(),
            L_scales=tuple(l.L_scale for l in lins),
            L_cat=jnp.concatenate([l.L for l in lins], axis=1),
            L_scale_cat=jnp.concatenate([l.L_scale for l in lins], axis=1),
            global_scale=jnp.stack(
                [l.global_scale.reshape(-1) for l in lins], axis=1),
            b=None, num_bits=lins[0].num_bits, splits=splits, ranks=rks,
            factor_kernel="l")

    prep = []
    for (s, e, sig) in runs:
        prep.append({
            "qkv": try_fuse(("q_proj", "k_proj", "v_proj"), s, e, sig),
            "gateup": try_fuse(("gate_proj", "up_proj"), s, e, sig),
        })
    return prep


@functools.partial(jax.jit,
                   static_argnames=("config", "interpret", "staged_kv",
                                    "attn_dots"),
                   donate_argnames=("cache",))
def decode_step_mixed_segmented(params: MixedStackedParams, tokens: Array,
                                pos: Array, cache, config: ModelConfig,
                                interpret: bool = False,
                                staged_kv: bool = True,
                                fused_prep=None,
                                attn_dots: str = "f32"):
    """Mixed-precision decode WITHOUT per-layer ``lax.switch``.

    Round 2 measured the switch dispatch at ~14 roofline points on the
    13B mixed config (39% vs 59% uniform): the per-layer branch blocks
    XLA from overlapping weight-slab DMA across the switch boundary. The
    bit allocator's depth-smooth profiles make per-layer widths BLOCKY,
    so the layer sequence splits into a handful of contiguous runs of
    constant bucket signature (``mixed_segments``); each run decodes
    through a plain ``fori_loop`` with its buckets selected STATICALLY —
    the same scalar-prefetch kernels as the uniform stacked path, zero
    dynamic dispatch. Math identical to :func:`decode_step_mixed`
    (bit-exact: same kernels, same order). Compile cost is one layer body
    per run; heavily interleaved allocations should keep using the switch
    path (the segment count is the caller's knob — see
    ``scripts/exp_13b_mixed.py --segmented``).

    Head-major int8 caches only (the 13B flagship serving config).
    """
    if not isinstance(cache, HeadMajorQuantKVCache):
        raise ValueError("decode_step_mixed_segmented requires a "
                         "HeadMajorQuantKVCache")
    B = tokens.shape[0]
    lp = params.layers
    x = params.embed[tokens].astype(jnp.float32)
    cos, sin = llama.rope_tables(config, pos[:, None])
    kv_groups = config.num_heads // config.num_kv_heads
    runs = mixed_segments(lp, config.num_layers)
    Lk, KVH, D = config.num_layers, config.num_kv_heads, config.head_dim
    if staged_kv:
        # staged commits (as in the fused path): one dynamic_update_slice
        # per staging array per layer instead of 4*B per layer — at 13B
        # B8/L40 that is 160 thunks instead of 1280
        staging = (jnp.zeros((Lk, B, KVH, D), jnp.int8),
                   jnp.zeros((Lk, B, KVH), jnp.float32),
                   jnp.zeros((Lk, B, KVH, D), jnp.int8),
                   jnp.zeros((Lk, B, KVH), jnp.float32))

    def run_body(start, sig, fp_run):
        from ee274_convexcaldera_llm_quantization_tpu.models import (
            fused as fusedm)
        base = {n: getattr(lp, n).index_in_static[start]
                for n in _PROJ_NAMES}

        def apply(name, l, y):
            mp = getattr(lp, name)
            idx = base[name] + (l - start)
            return _apply_bucket(mp.buckets[sig[name]], idx, y, interpret)

        def body(l, carry):
            if staged_kv:
                x, cache, stg = carry
            else:
                x, cache = carry
            an = jax.lax.dynamic_index_in_dim(lp.attn_norm, l, 0,
                                              keepdims=False)
            y = llama.rms_norm(x[:, None, :], an,
                               config.rms_norm_eps)[:, 0]
            if fp_run is not None and fp_run["qkv"] is not None:
                q, k, v = fusedm._apply_fused(fp_run["qkv"], l - start, y,
                                              interpret)
                q = q.reshape(B, 1, config.num_heads, config.head_dim)
                k = k.reshape(B, 1, config.num_kv_heads, config.head_dim)
                v = v.reshape(B, 1, config.num_kv_heads, config.head_dim)
            else:
                q = apply("q_proj", l, y).reshape(
                    B, 1, config.num_heads, config.head_dim)
                k = apply("k_proj", l, y).reshape(
                    B, 1, config.num_kv_heads, config.head_dim)
                v = apply("v_proj", l, y).reshape(
                    B, 1, config.num_kv_heads, config.head_dim)
            q = llama.apply_rope(q, cos, sin)
            k = llama.apply_rope(k, cos, sin)
            kq, ksc = llama.quantize_kv(k[:, 0])
            vq, vsc = llama.quantize_kv(v[:, 0])
            qh = q[:, 0].reshape(B, config.num_kv_heads, kv_groups,
                                 config.head_dim)
            if staged_kv:
                kf = kq.astype(jnp.float32) * ksc[..., None]
                vf = vq.astype(jnp.float32) * vsc[..., None]
                sk, sks, sv, svs = stg
                sk = jax.lax.dynamic_update_slice(sk, kq[None],
                                                  (l, 0, 0, 0))
                sks = jax.lax.dynamic_update_slice(sks, ksc[None],
                                                   (l, 0, 0))
                sv = jax.lax.dynamic_update_slice(sv, vq[None],
                                                  (l, 0, 0, 0))
                svs = jax.lax.dynamic_update_slice(svs, vsc[None],
                                                   (l, 0, 0))
                stg = (sk, sks, sv, svs)
                attn = AT.flash_decode_q8_staged(
                    qh, cache.k, cache.v, cache.k_scale, cache.v_scale,
                    kf, vf, l, pos, interpret=interpret,
                    dots=attn_dots).reshape(B, config.q_dim)
            else:
                ck, cv, cks, cvs = cache
                for b in range(B):
                    ck = jax.lax.dynamic_update_slice(
                        ck, kq[b][None, None, :, None, :],
                        (l, b, 0, pos[b], 0))
                    cv = jax.lax.dynamic_update_slice(
                        cv, vq[b][None, None, :, None, :],
                        (l, b, 0, pos[b], 0))
                    cks = jax.lax.dynamic_update_slice(
                        cks, ksc[b][None, None, :, None], (l, b, 0, pos[b]))
                    cvs = jax.lax.dynamic_update_slice(
                        cvs, vsc[b][None, None, :, None], (l, b, 0, pos[b]))
                cache = HeadMajorQuantKVCache(ck, cv, cks, cvs)
                attn = AT.flash_decode_q8(
                    qh, cache.k, cache.v, cache.k_scale, cache.v_scale,
                    l, pos, interpret=interpret,
                    dots=attn_dots).reshape(B, config.q_dim)
            x = x + apply("o_proj", l, attn)
            mn = jax.lax.dynamic_index_in_dim(lp.mlp_norm, l, 0,
                                              keepdims=False)
            y = llama.rms_norm(x[:, None, :], mn,
                               config.rms_norm_eps)[:, 0]
            if fp_run is not None and fp_run["gateup"] is not None:
                gate, up = fusedm._apply_fused(fp_run["gateup"], l - start,
                                               y, interpret)
            else:
                gate = apply("gate_proj", l, y)
                up = apply("up_proj", l, y)
            x = x + apply("down_proj", l, jax.nn.silu(gate) * up)
            if staged_kv:
                return x, cache, stg
            return x, cache

        return body

    carry = (x, cache, staging) if staged_kv else (x, cache)
    for i, (start, end, sig) in enumerate(runs):
        fp_run = fused_prep[i] if fused_prep is not None else None
        carry = jax.lax.fori_loop(start, end,
                                  run_body(start, sig, fp_run), carry)
    if staged_kv:
        x, cache, stg = carry
        sk, sks, sv, svs = stg
        ck, cv, cks, cvs = cache
        for b in range(B):
            ck = jax.lax.dynamic_update_slice(
                ck, sk[:, b][:, None, :, None, :], (0, b, 0, pos[b], 0))
            cv = jax.lax.dynamic_update_slice(
                cv, sv[:, b][:, None, :, None, :], (0, b, 0, pos[b], 0))
            cks = jax.lax.dynamic_update_slice(
                cks, sks[:, b][:, None, :, None], (0, b, 0, pos[b]))
            cvs = jax.lax.dynamic_update_slice(
                cvs, svs[:, b][:, None, :, None], (0, b, 0, pos[b]))
        cache = HeadMajorQuantKVCache(ck, cv, cks, cvs)
    else:
        x, cache = carry
    logits = llama._logits(
        x[:, None, :],
        ModelParams(params.embed, [], params.final_norm, params.lm_head),
        config, False, interpret)
    return logits[:, 0, :], cache


@functools.partial(jax.jit,
                   static_argnames=("config", "interpret"),
                   donate_argnames=("cache",))
def prefill_into_slot_mixed(params: MixedStackedParams, tokens: Array,
                            slot: Array, cache, config: ModelConfig,
                            interpret: bool = False,
                            last_pos: Optional[Array] = None):
    """Prefill one (1, S) prompt into ``slot`` on the mixed path (the W4A8
    kernels take (S, K) activations, so prefill reuses the same buckets)."""
    quant_kv = isinstance(cache, QuantKVCache)
    head_major = isinstance(cache, HeadMajorQuantKVCache)
    S = tokens.shape[1]
    lp = params.layers
    x = params.embed[tokens[0]].astype(jnp.float32)
    positions = jnp.arange(S)
    cos, sin = llama.rope_tables(config, positions[None, :])
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    mask = jnp.where(causal, 0.0, -1e30)[None, None, None, :, :]

    def body(l, carry):
        x, cache = carry
        an = jax.lax.dynamic_index_in_dim(lp.attn_norm, l, 0, keepdims=False)
        y = llama.rms_norm(x[None], an, config.rms_norm_eps)[0]
        q = _apply_mixed(lp.q_proj, l, y, interpret).reshape(
            1, S, config.num_heads, config.head_dim)
        k = _apply_mixed(lp.k_proj, l, y, interpret).reshape(
            1, S, config.num_kv_heads, config.head_dim)
        v = _apply_mixed(lp.v_proj, l, y, interpret).reshape(
            1, S, config.num_kv_heads, config.head_dim)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        attn = llama._attention(q, k, v, mask).reshape(S, config.q_dim)
        if head_major:
            kq, ksc = llama.quantize_kv(k)
            vq, vsc = llama.quantize_kv(v)
            cache = HeadMajorQuantKVCache(
                jax.lax.dynamic_update_slice(
                    cache.k, kq[0].transpose(1, 0, 2)[None, None],
                    (l, slot, 0, 0, 0)),
                jax.lax.dynamic_update_slice(
                    cache.v, vq[0].transpose(1, 0, 2)[None, None],
                    (l, slot, 0, 0, 0)),
                jax.lax.dynamic_update_slice(
                    cache.k_scale, ksc[0].T[None, None], (l, slot, 0, 0)),
                jax.lax.dynamic_update_slice(
                    cache.v_scale, vsc[0].T[None, None], (l, slot, 0, 0)))
        elif quant_kv:
            kq, ksc = llama.quantize_kv(k)
            vq, vsc = llama.quantize_kv(v)
            cache = QuantKVCache(
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
        x = x + _apply_mixed(lp.o_proj, l, attn, interpret)
        mn = jax.lax.dynamic_index_in_dim(lp.mlp_norm, l, 0, keepdims=False)
        y = llama.rms_norm(x[None], mn, config.rms_norm_eps)[0]
        gate = _apply_mixed(lp.gate_proj, l, y, interpret)
        up = _apply_mixed(lp.up_proj, l, y, interpret)
        x = x + _apply_mixed(lp.down_proj, l, jax.nn.silu(gate) * up,
                             interpret)
        return x, cache

    x, cache = jax.lax.fori_loop(0, config.num_layers, body, (x, cache))
    if last_pos is None:
        x_last = x[-1:]
    else:
        x_last = jax.lax.dynamic_slice_in_dim(x, last_pos, 1, axis=0)
    logits = llama._logits(
        x_last[None],
        ModelParams(params.embed, [], params.final_norm, params.lm_head),
        config, False, interpret)
    return logits[0, 0, :], cache
