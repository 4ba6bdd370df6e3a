"""Compressed linear-layer parameter store and application.

The reference materializes compressed layers back to dense fp32 before
inference (``module.weight.data = Q + L @ R``, reference ``main.py:197-199``)
— it demonstrates compression *quality* only. Here a linear layer's weights
live in one of two jit-friendly pytree forms:

- :class:`DenseLinear` — plain (out, in) matrix (bf16), used for layers the
  quality gate reverted or that were never compressed;
- :class:`CalderaLinear` — bit-packed ``Q`` codes (serving plane layout from
  ``ops.kernels``) + per-(row, group) scales + low-rank ``L``/``R`` factors
  + global scale, applied with the fused Pallas dequant-matmul.

Both are registered dataclass pytrees, so a whole model's parameters remain
one pytree that can be donated, sharded with ``NamedSharding``, and
checkpointed with orbax.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as K

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseLinear:
    w: Array                      # (out, in)
    b: Optional[Array] = None     # (out,)

    @property
    def shape(self):
        return self.w.shape

    def materialize(self) -> Array:
        return self.w.astype(jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CalderaLinear:
    """``W ~= global_scale * (Q + L @ R)`` with Q bit-packed.

    ``mode`` selects the serving kernel:

    - ``"grouped"`` — per-(row, group) scales, bf16 dequant-matmul kernel
      (highest fidelity);
    - ``"w4a8"`` — per-row weight scales + dynamic int8 activations on the
      int8 MXU (near memory-bound: ~3x faster at decode; ``scales`` is
      (out, 1)).
    """

    packed: Array                 # (out, in * bits / 8) uint8
    scales: Array                 # (out, in / group) f32
    L: Array                      # (out, rank) bf16 — or int8 codes
    R: Array                      # (rank, in) bf16 — or int8 codes
    global_scale: Array           # () f32
    b: Optional[Array] = None     # (out,)
    # int8 factors (from quantize_factors_int8): per-row absmax scales;
    # None => L/R are bf16 values
    L_scale: Optional[Array] = None   # (out, 1) f32
    R_scale: Optional[Array] = None   # (rank, 1) f32
    num_bits: int = dataclasses.field(default=4, metadata=dict(static=True))
    group_size: int = dataclasses.field(default=256,
                                        metadata=dict(static=True))
    out_features: int = dataclasses.field(default=0,
                                          metadata=dict(static=True))
    in_features: int = dataclasses.field(default=0,
                                         metadata=dict(static=True))
    mode: str = dataclasses.field(default="grouped",
                                  metadata=dict(static=True))
    # how the packed codes were produced: "uniform" (RTN absmax) or "e8p"
    # (lattice codewords repacked as int4 — checkpoints store the 2-bit
    # uint16 codes instead of the 4-bit serving pack; utils/checkpoint.py)
    q_method: str = dataclasses.field(default="uniform",
                                      metadata=dict(static=True))
    # quantization-grid width when it differs from the container width
    # (e.g. a 3-bit grid served in the 4-bit container, ops.kernels
    # .container_bits); 0 means grid == container. Bit accounting uses the
    # grid (information rate); the kernels use num_bits (HBM residency).
    grid_bits: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def shape(self):
        return (self.out_features, self.in_features)

    def factors(self) -> tuple:
        """Dense bf16 (L, R) regardless of storage dtype."""
        L, R = self.L, self.R
        if self.L_scale is not None:
            L = (L.astype(jnp.float32) * self.L_scale).astype(jnp.bfloat16)
        if self.R_scale is not None:
            R = (R.astype(jnp.float32) * self.R_scale).astype(jnp.bfloat16)
        return L, R

    def materialize(self) -> Array:
        """Dense reconstruction (for tests / error reporting only)."""
        if self.mode == "w4a8":
            f = 8 // self.num_bits
            maxq = 2 ** (self.num_bits - 1) - 1
            mask = (1 << self.num_bits) - 1
            pk = self.packed
            planes = [((pk >> (self.num_bits * (f - 1 - p))) & mask)
                      for p in range(f)]
            u = jnp.concatenate(planes, axis=1) if f > 1 else planes[0]
            Q = (u.astype(jnp.float32) - maxq) * self.scales
        else:
            Q = K.dequant_serving_xla(self.packed, self.scales,
                                      self.num_bits,
                                      self.group_size).astype(jnp.float32)
        L, R = self.factors()
        return self.global_scale * (Q + L.astype(jnp.float32)
                                    @ R.astype(jnp.float32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Int8Linear:
    """Plain int8 row-quantized linear (for lm_head / embeddings at serve
    time): ``W ~= scales * w8``. Served by the zero-unpack int8 MXU kernel."""

    w8: Array                     # (out, in) int8
    scales: Array                 # (out, 1) f32
    b: Optional[Array] = None     # (out,)

    @property
    def shape(self):
        return self.w8.shape

    def materialize(self) -> Array:
        return self.w8.astype(jnp.float32) * self.scales


def ste_quantize(W: Array, num_bits: int,
                 group_size: Optional[int] = None) -> Array:
    """Fake-quantize with a straight-through gradient estimator.

    Forward: symmetric absmax quantize-dequantize at ``num_bits`` —
    per-row when ``group_size`` is None (the w4a8 serving scheme,
    ``kernels.pack_rowscale``) or per-(row, group) (``pack_for_serving``).
    Backward: identity (``W + stop_grad(quant(W) - W)``); symmetric absmax
    never clips, so no gradient gating is needed. Used by QAT — the
    reference exposes an ``apply_qat`` flag but never implements training
    (reference ``convex_caldera.py:52``).
    """
    maxq = 2 ** (num_bits - 1) - 1
    Wf = W.astype(jnp.float32)
    if group_size is None:
        g = Wf
    else:
        N, Kin = Wf.shape
        if Kin % group_size:
            raise ValueError(f"K={Kin} not divisible by group {group_size}")
        g = Wf.reshape(N, Kin // group_size, group_size)
    absmax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True), 1e-8)
    scale = absmax / maxq
    q = jnp.clip(jnp.round(g / scale), -maxq, maxq) * scale
    q = q.reshape(Wf.shape)
    return Wf + jax.lax.stop_gradient(q - Wf)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QATLinear:
    """Trainable fake-quantized CALDERA linear for QAT fine-tuning.

    ``W ~= global_scale * (ste_quantize(Wq) + L @ R)`` with a dense f32
    latent ``Wq`` re-quantized every forward pass (straight-through
    gradients), and f32 low-rank factors trained directly. Convert from/to
    the packed serving form with ``models.qat.prepare_qat_model`` /
    ``finalize_qat_model`` — the fake-quant grid matches the serving
    packers exactly, so finalizing is lossless.
    """

    Wq: Array                     # (out, in) f32 latent quantized component
    L: Array                      # (out, rank) f32
    R: Array                      # (rank, in) f32
    global_scale: Array           # () f32
    b: Optional[Array] = None     # (out,)
    num_bits: int = dataclasses.field(default=4, metadata=dict(static=True))
    group_size: Optional[int] = dataclasses.field(
        default=None, metadata=dict(static=True))   # None => per-row
    mode: str = dataclasses.field(default="w4a8",
                                  metadata=dict(static=True))

    @property
    def shape(self):
        return self.Wq.shape

    def effective_weight(self) -> Array:
        """Dense f32 weight the QAT forward pass sees."""
        q = ste_quantize(self.Wq, self.num_bits, self.group_size)
        return jax.lax.stop_gradient(self.global_scale) * (
            q + self.L @ self.R)

    def materialize(self) -> Array:
        return self.effective_weight()


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RotatedLinear:
    """A CalderaLinear served in a Hadamard-rotated basis.

    ``W = H1 @ W' @ H2`` with orthonormal symmetric Hadamard rotations on
    the power-of-two sides (``rot_out`` for H1 / output features,
    ``rot_in`` for H2 / input features); ``inner`` stores the bit-packed
    ``W'``. Forward: ``y = H1 (W' (H2 x)) + b`` — the activation rotation
    runs as O(n log n) FWHT butterflies at serve time, so the incoherence-
    processed basis (which spreads weight outliers and helps 2-bit
    quantization) stays packed. The reference's Hadamard path can only
    materialize dense weights (``main.py:221-240``); runtime-rotated
    serving is new here. Bias lives outside the rotation.
    """

    inner: CalderaLinear
    b: Optional[Array] = None
    rot_in: bool = dataclasses.field(default=True,
                                     metadata=dict(static=True))
    rot_out: bool = dataclasses.field(default=True,
                                      metadata=dict(static=True))

    @property
    def shape(self):
        return self.inner.shape

    def materialize(self) -> Array:
        W = self.inner.materialize().astype(jnp.float32)
        if self.rot_out:
            W = K.fwht(W, axis=0) / jnp.sqrt(jnp.float32(W.shape[0]))
        if self.rot_in:
            W = K.fwht(W, axis=1) / jnp.sqrt(jnp.float32(W.shape[1]))
        return W


Linear = Union[DenseLinear, CalderaLinear, Int8Linear, QATLinear,
               RotatedLinear]


def quantize_linear_int8(lin: DenseLinear) -> Int8Linear:
    """Row-wise int8 quantization of a dense linear (e.g. the lm_head:
    0.26 GB bf16 -> 0.13 GB for Llama-2-7B, ~1 ms/decode-step of HBM)."""
    w8, scales = K.quantize_int8_rowwise(lin.w)
    return Int8Linear(w8=w8, scales=scales, b=lin.b)


def quantize_factors_int8(lin: CalderaLinear) -> CalderaLinear:
    """Convert a CalderaLinear's bf16 L/R factors to int8 + per-row scales
    (halves factor HBM traffic; works on flat or layer-stacked arrays)."""
    if lin.L_scale is not None:
        return lin
    L8, Ls = K.quantize_int8_rowwise(lin.L)
    R8, Rs = K.quantize_int8_rowwise(lin.R)
    return dataclasses.replace(lin, L=L8, R=R8, L_scale=Ls, R_scale=Rs)


def compress_linear(
    W: Array,
    L: Array,
    R: Array,
    num_bits: int,
    global_scale: float = 1.0,
    group_size: Optional[int] = None,
    bias: Optional[Array] = None,
    mode: str = "grouped",
    q_method: str = "uniform",
) -> CalderaLinear:
    """Pack a CALDERA decomposition ``(Q, L, R)`` into serving form.

    ``W`` here is the *Q component* (already quantize-dequantized by the
    solver, or the raw residual ``W/gs - L @ R``); re-quantizing it at the
    same bit width in the serving layout is exact for the uniform quantizer
    up to per-group rescaling.

    ``q_method="e8p"`` quantizes the residual with the E8 lattice codebook
    (2 bits/weight information rate, ``ops.lattice``) and serves it through
    the int4 W4A8 layout via the lossless odd-quarter repack
    (``lattice.e8p_pack_rowscale``): the per-row lattice offset ``s/4``
    becomes an extra rank-1 term appended to ``L``/``R``, so every existing
    w4a8 kernel (flat, stacked, fused, TP) serves lattice-quantized weights
    unchanged. Requires ``mode="w4a8"``; ``num_bits`` is forced to 4 (the
    HBM-resident form) — bit accounting should count 2.
    """
    N, Kin = W.shape
    if q_method == "e8p":
        if mode != "w4a8":
            raise ValueError("e8p serving requires mode='w4a8'")
        from ee274_convexcaldera_llm_quantization_tpu.ops import lattice
        packed, half_scales, offsets = lattice.e8p_pack_rowscale(W)
        gs = jnp.asarray(global_scale, jnp.float32)
        L_aug = jnp.concatenate(
            [L.astype(jnp.bfloat16),
             (offsets / gs).astype(jnp.bfloat16)], axis=1)
        R_aug = jnp.concatenate(
            [R.astype(jnp.bfloat16), jnp.ones((1, Kin), jnp.bfloat16)],
            axis=0)
        return CalderaLinear(
            packed=packed, scales=half_scales, L=L_aug, R=R_aug,
            global_scale=gs, b=bias, num_bits=4, group_size=Kin,
            out_features=N, in_features=Kin, mode="w4a8", q_method="e8p")
    if q_method != "uniform":
        raise ValueError(f"unknown serving q_method {q_method!r}")
    if num_bits == 3 and mode != "w4a8":
        raise ValueError("3-bit serving (int4-container grid) requires "
                         "mode='w4a8'")
    if mode == "w4a8":
        packed, scales = K.pack_rowscale(W, num_bits)
        group_size = Kin
        serve_bits = K.container_bits(num_bits)   # 3-bit grid -> int4 pack
    else:
        group_size = K.resolve_group(num_bits, Kin, group_size)
        packed, scales = K.pack_for_serving(W, num_bits, group_size)
        serve_bits = num_bits
    return CalderaLinear(
        packed=packed,
        scales=scales,
        L=L.astype(jnp.bfloat16),
        R=R.astype(jnp.bfloat16),
        global_scale=jnp.asarray(global_scale, jnp.float32),
        b=bias,
        num_bits=serve_bits,
        group_size=group_size,
        out_features=N,
        in_features=Kin,
        mode=mode,
        grid_bits=num_bits if serve_bits != num_bits else 0,
    )


def apply_linear(lin: Linear, x: Array, *, use_pallas: bool = False,
                 interpret: bool = False) -> Array:
    """``y = x @ W.T (+ b)`` for either representation.

    ``x``: (..., in). The fused Pallas path is used when ``use_pallas`` (on
    TPU); the XLA twin otherwise — both share the packed layout, so the
    choice is purely a dispatch decision.
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    if isinstance(lin, DenseLinear):
        y = jnp.dot(x2.astype(jnp.bfloat16), lin.w.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    elif isinstance(lin, QATLinear):
        # f32 dot: QAT runs at calibration time, fidelity over speed
        y = jnp.dot(x2.astype(jnp.float32), lin.effective_weight().T,
                    preferred_element_type=jnp.float32)
    elif isinstance(lin, RotatedLinear):
        u = x2.astype(jnp.float32)
        if lin.rot_in:
            u = K.fwht(u, axis=-1) / jnp.sqrt(jnp.float32(u.shape[-1]))
        y = apply_linear(lin.inner, u, use_pallas=use_pallas,
                         interpret=interpret)
        if lin.rot_out:
            y = K.fwht(y, axis=-1) / jnp.sqrt(jnp.float32(y.shape[-1]))
        if lin.b is not None:
            y = y + lin.b[None, :]
        return y.reshape(*shape[:-1], y.shape[-1])
    elif isinstance(lin, Int8Linear):
        if use_pallas:
            y = K.int8_matmul(x2, lin.w8, lin.scales, interpret=interpret)
        else:
            y = K.int8_matmul_xla(x2, lin.w8, lin.scales)
    elif lin.mode == "w4a8":
        if use_pallas:
            yq = K.quantized_matmul_w4a8(x2, lin.packed, lin.scales,
                                         lin.num_bits, interpret=interpret)
        else:
            yq = K.quantized_matmul_w4a8_xla(x2, lin.packed, lin.scales,
                                             lin.num_bits)
        ylr = K.low_rank_matmul(x2, lin.L, lin.R, lin.L_scale, lin.R_scale)
        y = (yq + ylr) * lin.global_scale
    elif lin.L_scale is not None or lin.R_scale is not None:
        if use_pallas:
            yq = K.quantized_matmul(x2, lin.packed, lin.scales, lin.num_bits,
                                    lin.group_size, interpret=interpret)
        else:
            yq = K.quantized_matmul_xla(x2, lin.packed, lin.scales,
                                        lin.num_bits, lin.group_size)
        ylr = K.low_rank_matmul(x2, lin.L, lin.R, lin.L_scale, lin.R_scale)
        y = (yq + ylr) * lin.global_scale
    else:
        y = K.fused_qlr_matmul(
            x2, lin.packed, lin.scales, lin.L, lin.R, lin.num_bits,
            group_size=lin.group_size, global_scale=lin.global_scale,
            use_pallas=use_pallas, interpret=interpret)
    if lin.b is not None:
        y = y + lin.b[None, :]
    return y.reshape(*shape[:-1], y.shape[-1])
