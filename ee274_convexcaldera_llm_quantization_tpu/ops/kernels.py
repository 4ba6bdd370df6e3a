"""Pallas TPU kernels: fused dequantize + matmul (+ low-rank add).

This is the serving hot path the reference never had — it materializes
compressed layers back to dense fp32 before inference
(``main.py:197-199`` in the reference). Here the quantized component ``Q``
stays bit-packed in HBM and is unpacked inside the kernel, feeding the MXU
with bf16 tiles without ever materializing a dense weight matrix.

Serving layout ("plane-packed"):
  weights ``W`` of shape ``(N, K)`` (out, in) are quantized with symmetric
  per-(row, group) absmax scales, group size ``G`` along K. Codes are stored
  offset-binary and packed so that the byte at column ``c`` of a group holds
  the codes for ``k = c, c + G/f, ..., c + (f-1) * G/f`` (``f = 8 / bits``
  planes, MSB first). Unpacking a tile is then ``f`` shift-and-mask ops plus
  a lane-dimension concatenate — no interleaving shuffles, which keeps the
  unpack on the VPU at full width. With the defaults below a packed group is
  always 128 bytes, exactly one vreg lane row.

Every kernel has an XLA twin (``*_xla``) used for equivalence tests and as
an automatic fallback on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default group sizes chosen so a packed group is 128 bytes (one lane row).
DEFAULT_GROUP = {2: 512, 4: 256, 8: 128}


def _pack_factor(num_bits: int) -> int:
    return 8 // num_bits


def resolve_group(num_bits: int, K: int, group_size: Optional[int]) -> int:
    """Pick the scale-group size: the 128-byte default, clamped to K.

    The clamp keeps small matrices (K < default group) working; K must still
    be divisible by the result.
    """
    if group_size is None:
        group_size = min(DEFAULT_GROUP[num_bits], K)
    return group_size


# ---------------------------------------------------------------------------
# Serving-layout quantization (host/XLA side, runs once at load time)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_bits", "group_size"))
def pack_for_serving(W: jax.Array, num_bits: int,
                     group_size: Optional[int] = None):
    """Quantize ``W`` (N, K) to plane-packed codes + per-(row, group) scales.

    Returns ``(packed uint8 (N, K/f), scales f32 (N, K/G))``. Symmetric
    absmax quantization: ``q = round(w / scale)`` with
    ``scale = absmax / (2^(b-1) - 1)``, stored offset-binary.
    """
    N, K = W.shape
    group_size = resolve_group(num_bits, K, group_size)
    if K % group_size != 0:
        raise ValueError(f"K={K} not divisible by group size {group_size}")
    f = _pack_factor(num_bits)
    G = group_size
    maxq = 2 ** (num_bits - 1) - 1

    Wg = W.astype(jnp.float32).reshape(N, K // G, G)
    absmax = jnp.maximum(jnp.max(jnp.abs(Wg), axis=-1, keepdims=True), 1e-8)
    scales = (absmax / maxq).reshape(N, K // G)
    codes = jnp.clip(jnp.round(Wg / absmax * maxq), -maxq, maxq)
    u = (codes + maxq).astype(jnp.uint8)            # offset binary
    planes = u.reshape(N, K // G, f, G // f)        # plane p = k offset p*G/f
    packed = jnp.zeros((N, K // G, G // f), jnp.uint8)
    for p in range(f):
        packed = packed | (planes[:, :, p, :] << (num_bits * (f - 1 - p)))
    return packed.reshape(N, K // f), scales


@functools.partial(jax.jit, static_argnames=("num_bits", "group_size"))
def dequant_serving_xla(packed: jax.Array, scales: jax.Array, num_bits: int,
                        group_size: Optional[int] = None) -> jax.Array:
    """XLA twin: reconstruct the dense (N, K) bf16 weight matrix."""
    f = _pack_factor(num_bits)
    N = packed.shape[0]
    K = packed.shape[1] * f
    G = resolve_group(num_bits, K, group_size)
    maxq = 2 ** (num_bits - 1) - 1
    mask = (1 << num_bits) - 1
    pg = packed.reshape(N, K // G, G // f)
    planes = [((pg >> (num_bits * (f - 1 - p))) & mask) for p in range(f)]
    u = jnp.stack(planes, axis=2)                    # (N, K/G, f, G/f)
    q = u.astype(jnp.float32) - maxq
    w = q * scales[:, :, None, None]
    return w.reshape(N, K).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Fused dequant-matmul Pallas kernel
# ---------------------------------------------------------------------------

def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, *, num_bits: int):
    """One (TM, TN) output tile, accumulating over the k (group) grid axis.

    ``x_ref``: (TM, G) bf16 activations; ``w_ref``: (TN, G/f) uint8 packed
    codes; ``s_ref``: (TN, num_groups) f32 scales for the whole row tile
    (TPU lane tiling forbids a 1-wide lane block, so all groups ride along
    and the current one is dynamically sliced). The MXU sees a pure bf16
    codes matmul; the per-group scale is applied to the (TM, TN) f32
    partial product — one VPU multiply per tile.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    f = _pack_factor(num_bits)
    maxq = 2 ** (num_bits - 1) - 1
    mask = (1 << num_bits) - 1
    # Mosaic legalizes shifts/casts on i32 vectors but not on i8 — widen the
    # packed bytes once, then shift-and-mask per plane. (TN, G) signed codes.
    packed = w_ref[:].astype(jnp.int32)
    planes = [((packed >> (num_bits * (f - 1 - p))) & mask) for p in range(f)]
    u = jnp.concatenate(planes, axis=1) if f > 1 else planes[0]
    wq = (u - maxq).astype(jnp.float32).astype(jnp.bfloat16)

    partial = jax.lax.dot_general(
        x_ref[:], wq,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (TM, TN)
    # Select column k of the scales without a dynamic lane slice (Mosaic
    # requires 128-aligned lane offsets): masked reduction over the small
    # group axis.
    s_all = s_ref[:]                                    # (TN, num_groups)
    col = jax.lax.broadcasted_iota(jnp.int32, s_all.shape, 1)
    scale = jnp.sum(jnp.where(col == k, s_all, 0.0), axis=1)  # (TN,)
    o_ref[:] += partial * scale[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("num_bits", "group_size", "block_m", "block_n",
                     "interpret"))
def quantized_matmul(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    num_bits: int,
    group_size: Optional[int] = None,
    block_m: int = 128,
    block_n: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """``y = x @ dequant(packed, scales).T`` with in-kernel unpacking.

    ``x``: (M, K); returns (M, N) f32. M is padded to ``block_m`` internally;
    N must be divisible by ``block_n`` and K by the group size.
    """
    f = _pack_factor(num_bits)
    M, K = x.shape
    G = resolve_group(num_bits, K, group_size)
    N = packed.shape[0]
    assert packed.shape[1] * f == K, (packed.shape, K, f)
    block_n = min(block_n, N)
    if K % G or N % block_n:
        raise ValueError(f"shapes not tileable: K={K} group={G} N={N} "
                         f"block_n={block_n}")

    TM = min(block_m, _round_up(M, 16))
    Mp = _round_up(M, TM)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    grid = (Mp // TM, N // block_n, K // G)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, num_bits=num_bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, G), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, G // f), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, K // G), lambda i, j, k: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + N * K // f + Mp * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), packed, scales.astype(jnp.float32))
    return out[:M]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("num_bits", "group_size"))
def quantized_matmul_xla(x, packed, scales, num_bits, group_size=None):
    """XLA twin of :func:`quantized_matmul` (dense dequant then dot)."""
    W = dequant_serving_xla(packed, scales, num_bits, group_size)
    return jnp.dot(x.astype(jnp.bfloat16), W.T,
                   preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Fused Q + L@R linear (the CALDERA serving op)
# ---------------------------------------------------------------------------

def fused_qlr_matmul(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    L: jax.Array,
    R: jax.Array,
    num_bits: int,
    group_size: Optional[int] = None,
    global_scale: float = 1.0,
    use_pallas: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """``y = x @ (gs * (Q + L @ R)).T`` with Q bit-packed.

    The low-rank path is two thin matmuls ``(x @ R.T) @ L.T`` (rank ~128),
    which XLA schedules alongside the Pallas kernel; the quantized path never
    materializes Q. ``L``: (N, r), ``R``: (r, K).
    """
    if use_pallas:
        yq = quantized_matmul(x, packed, scales, num_bits, group_size,
                              interpret=interpret)
    else:
        yq = quantized_matmul_xla(x, packed, scales, num_bits, group_size)
    xr = jnp.dot(x.astype(jnp.bfloat16), R.T.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    ylr = jnp.dot(xr.astype(jnp.bfloat16), L.T.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return (yq + ylr) * global_scale


# ---------------------------------------------------------------------------
# Fast Walsh-Hadamard transform (replaces the reference's
# scipy.linalg.hadamard dense matmuls, ``main.py:75-133``)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("axis",))
def fwht(x: jax.Array, axis: int = -1) -> jax.Array:
    """Fast Walsh-Hadamard transform along ``axis`` (length must be 2^k).

    Unnormalized (matches ``scipy.linalg.hadamard @ x``); divide by
    ``sqrt(n)`` for the orthonormal version. O(n log n) via butterfly
    reshapes — XLA fuses each stage into a single elementwise pass.
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    if n & (n - 1):
        raise ValueError(f"FWHT length {n} is not a power of two")
    shape = x.shape
    h = 1
    while h < n:
        x = x.reshape(*shape[:-1], n // (2 * h), 2, h)
        a = x[..., 0, :]
        b = x[..., 1, :]
        x = jnp.stack([a + b, a - b], axis=-2)
        h *= 2
    x = x.reshape(shape)
    return jnp.moveaxis(x, -1, axis)


def hadamard_sandwich(W: jax.Array) -> Tuple[jax.Array, int, int]:
    """Orthonormal two-sided Hadamard rotation with power-of-two padding.

    Returns ``(H1 @ W_padded @ H2 / sqrt(m2 * n2), m2, n2)`` — the reference's
    incoherence-processing transform (``main.py:75-133``) done in O(mn log mn)
    instead of dense Hadamard matmuls. Invert with
    :func:`hadamard_unsandwich`.
    """
    m, n = W.shape
    m2, n2 = 1 << (m - 1).bit_length(), 1 << (n - 1).bit_length()
    Wp = jnp.pad(W, ((0, m2 - m), (0, n2 - n)))
    out = fwht(fwht(Wp, axis=0), axis=1) / jnp.sqrt(jnp.float32(m2 * n2))
    return out, m2, n2


def hadamard_unsandwich(A: jax.Array, m: int, n: int) -> jax.Array:
    """Inverse of :func:`hadamard_sandwich` (orthonormal H is an involution)."""
    out = fwht(fwht(A, axis=0), axis=1) / jnp.sqrt(
        jnp.float32(A.shape[0] * A.shape[1]))
    return out[:m, :n]
