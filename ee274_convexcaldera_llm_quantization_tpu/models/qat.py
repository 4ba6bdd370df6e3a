"""Quantization-aware training of CALDERA-compressed models (STE).

The reference exposes an ``apply_qat`` flag but never implements any
training (reference ``convex_caldera.py:52``); this module supplies it
TPU-first: convert packed serving params to trainable fake-quant form
(:class:`compressed.QATLinear`), fine-tune with the shardable
``models.train.train_step`` (the straight-through estimator in
``compressed.ste_quantize`` makes the quantizer differentiable), then
finalize back to bit-packed serving form **losslessly** — the fake-quant
grid is the same symmetric absmax grid the serving packers
(``kernels.pack_rowscale`` / ``pack_for_serving``) use, so the final
re-pack reproduces ``ste_quantize``'s forward values bit-exactly.

Round-trip guarantee (tested): ``finalize(prepare(m))`` reproduces ``m``'s
packed codes exactly, because dequantized grid points re-quantize to
themselves under the same scale.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, QATLinear, compress_linear)
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    LayerParams, ModelParams)

Array = jax.Array


def prepare_qat_linear(lin: CalderaLinear) -> QATLinear:
    """Unpack a serving CalderaLinear into trainable fake-quant form.

    Dequantization runs in f32 (NOT via the bf16 ``dequant_serving_xla``):
    exact grid points re-quantize to the same codes under the same scale,
    which is what makes ``finalize_qat_linear`` lossless.
    """
    f = 8 // lin.num_bits
    maxq = 2 ** (lin.num_bits - 1) - 1
    mask = (1 << lin.num_bits) - 1
    pk = lin.packed.astype(jnp.int32)
    planes = [((pk >> (lin.num_bits * (f - 1 - p))) & mask)
              for p in range(f)]
    u = jnp.concatenate(planes, axis=1) if f > 1 else planes[0]
    q = u.astype(jnp.float32) - maxq
    if lin.mode == "w4a8":
        Wq = q * lin.scales                          # (N, 1) row scales
        group = None
    else:
        Kin = q.shape[1]
        G = Kin // lin.scales.shape[1]
        Wq = q * jnp.repeat(lin.scales, G, axis=1, total_repeat_length=Kin)
        group = lin.group_size
    L, R = lin.factors()
    return QATLinear(Wq=Wq, L=L.astype(jnp.float32),
                     R=R.astype(jnp.float32),
                     global_scale=jnp.asarray(lin.global_scale, jnp.float32),
                     b=lin.b, num_bits=lin.num_bits, group_size=group,
                     mode=lin.mode)


def finalize_qat_linear(lin: QATLinear) -> CalderaLinear:
    """Re-pack a trained QATLinear into serving form (lossless vs the
    fake-quant forward: same absmax grid, same codes)."""
    return compress_linear(
        lin.Wq, lin.L, lin.R, lin.num_bits,
        global_scale=float(lin.global_scale),
        group_size=lin.group_size, bias=lin.b, mode=lin.mode)


def _map_linears(params: ModelParams, fn, match) -> ModelParams:
    layers = []
    for lp in params.layers:
        fields = {}
        for name in LayerParams._fields:
            lin = getattr(lp, name)
            fields[name] = fn(lin) if isinstance(lin, match) else lin
        layers.append(LayerParams(**fields))
    return ModelParams(embed=params.embed, layers=layers,
                       final_norm=params.final_norm,
                       lm_head=params.lm_head)


def prepare_qat_model(params: ModelParams) -> ModelParams:
    """CalderaLinear -> QATLinear across all layers.

    Every leaf is copied: ``train.train_step`` donates its parameter tree,
    and aliasing the caller's embed/norm arrays into a donated tree would
    delete the caller's buffers on the first step.
    """
    out = _map_linears(params, prepare_qat_linear, CalderaLinear)
    return jax.tree.map(jnp.copy, out)


def finalize_qat_model(params: ModelParams) -> ModelParams:
    """QATLinear -> packed CalderaLinear across all layers."""
    return _map_linears(params, finalize_qat_linear, QATLinear)


def make_qat_optimizer(lr: float = 1e-5) -> optax.GradientTransformation:
    """AdamW over everything except the per-matrix ``global_scale`` leaves
    (their STE gradient is zero by construction; without the mask AdamW's
    weight decay would still shrink them every step)."""
    def mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, x: not any(
                getattr(e, "name", None) == "global_scale" for e in path),
            params)
    return optax.masked(optax.adamw(lr), mask)


def qat_finetune(params: ModelParams, tokens: Array, config,
                 steps: int = 10, lr: float = 1e-5):
    """Convenience loop: prepare -> train ``steps`` on (B, S) ``tokens`` ->
    finalize. Returns (packed params, list of losses)."""
    from ee274_convexcaldera_llm_quantization_tpu.models import train

    qp = prepare_qat_model(params)
    opt = make_qat_optimizer(lr)
    state = opt.init(qp)
    losses = []
    for _ in range(steps):
        qp, state, loss = train.train_step(qp, state, tokens, config, opt)
        losses.append(float(loss))
    return finalize_qat_model(qp), losses
