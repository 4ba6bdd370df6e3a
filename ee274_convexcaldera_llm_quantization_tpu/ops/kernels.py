"""Pallas TPU kernels: fused dequantize + matmul (+ low-rank add).

This is the serving hot path the reference never had — it materializes
compressed layers back to dense fp32 before inference
(``main.py:197-199`` in the reference). Here the quantized component ``Q``
stays bit-packed in HBM and is unpacked inside the kernel, feeding the MXU
with bf16 tiles without ever materializing a dense weight matrix.

Serving layout ("global plane-packed"):
  weights ``W`` of shape ``(N, K)`` (out, in) are quantized with symmetric
  per-(row, group) absmax scales, group size ``G`` along K. Codes are stored
  offset-binary and packed so the byte at column ``j`` of a row holds the
  codes for ``k = j, j + K/f, ..., j + (f-1) * K/f`` (``f = 8 / bits``
  row-global planes, MSB first). Unpacking a full row tile is then ``f``
  shift-and-mask ops plus one lane-dimension concatenate that restores exact
  k-order — no interleave shuffles — so the kernel can fetch a whole
  ``(block_n, K/f)`` tile with one large DMA (hundreds of KB, enough to
  saturate HBM) instead of per-group 16 KB tiles. ``G`` is chosen to divide
  ``K/f`` so per-group scales broadcast with a static lane repeat.

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

# Candidate scale-group sizes, largest preferred (fewest scales).
_GROUP_CANDIDATES = (512, 256, 128, 64, 32, 16, 8)


def _pack_factor(num_bits: int) -> int:
    return 8 // num_bits


def container_bits(num_bits: int) -> int:
    """HBM-resident container width for a quantization grid.

    2/4/8-bit grids pack natively. A 3-bit grid is served in the 4-bit
    container: on the TPU the W4A8 kernels are VPU-bound on unpack, and a
    true 3-bit unpack costs ~4x the vector ops of the 4-bit path (three
    1-bit sub-plane extractions per code) — more than the 25% HBM-byte
    saving buys back. Storage/checkpoints still count 3 bits (information
    rate); only the serving residency is 4-bit, mirroring the e8p repack
    (``models.compressed.compress_linear``).
    """
    if num_bits in (2, 4, 8):
        return num_bits
    if num_bits == 3:
        return 4
    raise ValueError(f"unsupported serving grid {num_bits}-bit")


def resolve_group(num_bits: int, K: int, group_size: Optional[int]) -> int:
    """Pick the scale-group size: the largest candidate dividing ``K / f``.

    Dividing the plane length ``K/f`` (not just K) lets the kernel broadcast
    scales over unpacked planes with static slices. An explicit
    ``group_size`` is validated against the same constraint.
    """
    f = _pack_factor(num_bits)
    plane = K // f
    if group_size is None:
        for g in _GROUP_CANDIDATES:
            if g <= plane and plane % g == 0:
                return g
        return plane if plane > 0 else K
    if plane % group_size != 0:
        raise ValueError(
            f"group size {group_size} must divide K/f = {plane} "
            f"(K={K}, {num_bits}-bit)")
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
    f = _pack_factor(num_bits)
    G = group_size
    maxq = 2 ** (num_bits - 1) - 1

    Wg = W.astype(jnp.float32).reshape(N, K // G, G)
    absmax = jnp.maximum(jnp.max(jnp.abs(Wg), axis=-1, keepdims=True), 1e-8)
    scales = (absmax / maxq).reshape(N, K // G)
    codes = jnp.clip(jnp.round(Wg / absmax * maxq), -maxq, maxq)
    u = (codes + maxq).astype(jnp.uint8).reshape(N, K)   # offset binary
    planes = u.reshape(N, f, K // f)     # row-global planes (k-order major)
    packed = jnp.zeros((N, K // f), jnp.uint8)
    for p in range(f):
        packed = packed | (planes[:, p, :] << (num_bits * (f - 1 - p)))
    return packed, scales


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
    planes = [((packed >> (num_bits * (f - 1 - p))) & mask) for p in range(f)]
    u = jnp.concatenate(planes, axis=1) if f > 1 else planes[0]   # (N, K)
    q = u.astype(jnp.float32) - maxq
    w = q * jnp.repeat(scales, G, axis=1, total_repeat_length=K)
    return w.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Fused dequant-matmul Pallas kernel
# ---------------------------------------------------------------------------


def resolve_block_n(block_n, num_bits: int = 4) -> int:
    """Default output-block rows for the serving kernels.

    Measured round 4 (e2e headline step, B8 ctx256): 512-row blocks beat
    256 by ~2% (8.05 vs 8.20 ms/step — half the grid steps at a marginal
    ~0.12 us/program) and 1024 regresses (coarser double-buffering);
    the 2-bit container prefers 256 (its unpack output is 4x the packed
    block). Callers pass ``block_n=None`` to get these defaults.
    """
    if block_n is not None:
        return block_n
    return 256 if num_bits == 2 else 512

def _pick_chunk(plane_len: int, group: int, block_n: int,
                budget_bytes: int = 2 * 1024 * 1024) -> int:
    """Bytes of packed data to unpack per inner step: a divisor of the plane
    length that is a multiple of the group size, sized so the f32
    intermediates stay within ``budget_bytes``."""
    target = max(budget_bytes // (block_n * 4), group)
    best = plane_len
    for m in range(1, plane_len // group + 1):
        if plane_len % m:
            continue
        chb = plane_len // m
        if chb % group:
            continue
        if chb <= target:
            return chb
        best = chb
    return best


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, *, num_bits: int,
                group_size: int, chunk_bytes: int):
    """One (TM, TN) output tile over the FULL contraction dimension.

    ``x_ref``: (TM, K) bf16 activations; ``w_ref``: (TN, K/f) uint8 packed
    codes — fetched as ONE large DMA per tile (hundreds of KB; per-group
    16 KB tiles cannot saturate HBM); ``s_ref``: (TN, K/G) f32 scales.

    The tile is processed in static byte-chunks to bound VMEM: each chunk
    of ``chunk_bytes`` packed columns yields ``f`` plane sub-tiles of codes
    whose k-offsets are ``p * K/f + c * chunk_bytes`` (row-global plane
    layout), each dequantized (shift/mask on i32, scale broadcast by lane
    repeat) and contracted against the matching static x slice, with fp32
    accumulation across chunks on the MXU.
    """
    f = _pack_factor(num_bits)
    maxq = 2 ** (num_bits - 1) - 1
    mask = (1 << num_bits) - 1
    plane_len = w_ref.shape[1]
    TM = x_ref.shape[0]
    TN = w_ref.shape[0]
    acc = jnp.zeros((TM, TN), jnp.float32)
    for c in range(plane_len // chunk_bytes):
        chunk = w_ref[:, c * chunk_bytes:(c + 1) * chunk_bytes]
        if f == 1:
            u_planes = [chunk.astype(jnp.int32) & mask]
        else:
            u_planes = _unpack_chunk_planes(chunk, num_bits)
        for p in range(f):
            codes = u_planes[p].astype(jnp.float32) - maxq
            koff = p * plane_len + c * chunk_bytes
            ng = chunk_bytes // group_size
            sc = s_ref[:, koff // group_size:koff // group_size + ng]
            # Broadcast each group scale across its G lanes. jnp.repeat
            # lowers to an unsupported scatter in Mosaic; a matmul against
            # a 0/1 expansion matrix built from iota is MXU-native.
            row = jax.lax.broadcasted_iota(jnp.int32, (ng, chunk_bytes), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (ng, chunk_bytes), 1)
            expand = (col // group_size == row).astype(jnp.float32)
            scale = jax.lax.dot_general(
                sc, expand, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (TN, chunk)
            wq = (codes.astype(jnp.float32) * scale).astype(jnp.bfloat16)
            acc += jax.lax.dot_general(
                x_ref[:, koff:koff + chunk_bytes], wq,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[:] = acc


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
    block_n: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """``y = x @ dequant(packed, scales).T`` with in-kernel unpacking.

    ``x``: (M, K); returns (M, N) f32. M is padded internally; N must be
    divisible by ``block_n`` (clamped to N) and the group size must divide
    ``K/f``.
    """
    f = _pack_factor(num_bits)
    M, K = x.shape
    G = resolve_group(num_bits, K, group_size)
    N = packed.shape[0]
    assert packed.shape[1] * f == K, (packed.shape, K, f)
    assert packed.dtype == jnp.uint8, packed.dtype  # p==0 unpack relies on zero-extension
    block_n = min(resolve_block_n(block_n, num_bits), N)
    while N % block_n:
        block_n //= 2
    plane_len = K // f
    chunk_bytes = _pick_chunk(plane_len, G, block_n)

    TM = min(block_m, _round_up(M, 16))
    Mp = _round_up(M, TM)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    grid = (Mp // TM, N // block_n)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, num_bits=num_bits, group_size=G,
                          chunk_bytes=chunk_bytes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, plane_len), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, K // G), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
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
# W4A8: int8-MXU fused kernel (per-row weight scales, int8 activations)
#
# The bf16 kernel above is VPU-bound: every weight code pays ~6 vector ops
# (widen, shift, mask, f32 convert, scale multiply, bf16 convert). Feeding
# the MXU int8 instead cuts that to ~3.5 (widen, shift, mask, i8 convert) —
# scales move to the (TM, TN) accumulator, which per-ROW weight scales make
# a single rank-1 rescale. Activations are dynamically quantized to int8
# per row (standard W4A8 serving).
# ---------------------------------------------------------------------------

def pack_rowscale(W: jax.Array, num_bits: int):
    """Quantize with one symmetric absmax scale per output row.

    Returns (packed (N, K/f) uint8 in global-plane layout, row_scales
    (N, 1) f32). Coarser than grouped scales but still strictly finer than
    the reference's single whole-matrix scale (``alg.py:247``).

    A 3-bit grid is packed into the 4-bit container (codes in [-3, 3],
    offset by the container's maxq=7): the kernels run with
    ``num_bits=container_bits(3)=4`` and their rank-1 bias correction
    removes the container offset exactly. See :func:`container_bits`.
    """
    N, K = W.shape
    cb = container_bits(num_bits)
    f = _pack_factor(cb)
    maxq = 2 ** (num_bits - 1) - 1          # quantization grid
    cmaxq = 2 ** (cb - 1) - 1               # container offset
    Wf = W.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(Wf), axis=1, keepdims=True), 1e-8)
    scales = absmax / maxq
    codes = jnp.clip(jnp.round(Wf / scales), -maxq, maxq)
    u = (codes + cmaxq).astype(jnp.uint8)
    planes = u.reshape(N, f, K // f)
    packed = jnp.zeros((N, K // f), jnp.uint8)
    for p in range(f):
        packed = packed | (planes[:, p, :] << (cb * (f - 1 - p)))
    return packed, scales


def quantize_activations_int8(x: jax.Array,
                              scale: Optional[jax.Array] = None):
    """Per-row symmetric int8 quantization of activations (M, K).

    ``scale`` ((M, 1) f32), when given, overrides the per-row absmax/127
    computation — used by tensor-parallel callers to quantize every
    K-shard with the GLOBAL row scale (``pmax`` over the tp axis) so the
    sharded step reproduces the single-chip codes exactly."""
    xf = x.astype(jnp.float32)
    if scale is None:
        absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                             1e-12)
        scale = absmax / 127.0
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def _unpack_plane_unsigned(chunk, p: int, num_bits: int, f: int):
    """Unsigned codes of plane ``p`` from an i32-widened packed byte chunk.

    Fallback path (used when the row count is not a multiple of 4 — see
    :func:`_unpack_chunk_planes` for the SWAR fast path). The top plane
    needs no mask (the widened byte is < 256, so the shift already isolates
    it) and the bottom plane needs no shift. Codes stay offset-binary
    (0..2^b-1, fits int8 for b <= 4); the caller removes the +maxq bias
    with a rank-1 correction of the accumulator:
    ``xq @ (u - maxq) == xq @ u - maxq * rowsum(xq)`` (exact int math).

    The mask-free ``p == 0`` path is only correct when the chunk was
    zero-extended from a **uint8** container (an int8-stored container would
    sign-extend and make ``chunk >> shift`` negative); the public kernel
    wrappers assert ``packed.dtype == uint8`` to pin that assumption.
    """
    shift = num_bits * (f - 1 - p)
    if p == 0:
        u = chunk >> shift
    elif shift == 0:
        u = chunk & ((1 << num_bits) - 1)
    else:
        u = (chunk >> shift) & ((1 << num_bits) - 1)
    return u.astype(jnp.int8)


def _unpack_chunk_planes(chunk, num_bits: int):
    """All ``f`` unsigned int8 code planes of a (TN, C) uint8 packed chunk.

    SWAR fast path (round 4): ``pltpu.bitcast`` reinterprets the uint8
    chunk as (TN/4, C) int32 words — a free sublane relayout that packs 4
    CONSECUTIVE rows per word, little-endian (measured on v5e: row 4s+b in
    byte slot b, roundtrip identity). One shift + one byte-parallel mask
    (``0x03030303``-style) then extracts plane ``p`` of all four bytes at
    once, and a second free bitcast returns the result to (TN, C) int8 —
    no per-code widen/convert at all. Vector-op cost per packed byte drops
    from ~11 (2-bit) / ~5 (4-bit) i32-lane ops to ~1.75 / ~0.75, which
    un-VPU-binds the W4A8 kernels (round-3 measurement: the 2-bit kernel
    read HALF the bytes of 4-bit in the same time).

    Falls back to the widen-tree when TN % 4 != 0 (bitcast packs along the
    second-minor dim). Semantics are identical either way: offset-binary
    codes 0..2^b-1; callers remove the +maxq bias with the rank-1
    correction. f == 1 (8-bit) callers keep their signed per-code path.
    """
    f = _pack_factor(num_bits)
    TN = chunk.shape[0]
    if f == 1 or TN % 4 != 0:
        widened = chunk.astype(jnp.int32)
        return [_unpack_plane_unsigned(widened, p, num_bits, f)
                for p in range(f)]
    mask8 = (1 << num_bits) - 1
    m32 = mask8 * 0x01010101
    X = pltpu.bitcast(chunk, jnp.int32)          # (TN/4, C)
    planes = []
    for p in range(f):
        shift = num_bits * (f - 1 - p)
        Y = (X >> shift) & m32 if shift else X & m32
        planes.append(pltpu.bitcast(Y, jnp.int8))   # (TN, C)
    return planes


def _rowsum_i32(xq):
    """Per-row sum of int8 activations, exact in i32 — the rank-1 bias
    correction term for unsigned-code accumulation."""
    return jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)   # (TM, 1)


def _qmm_w4a8_kernel(xq_ref, w_ref, s_ref, sx_ref, o_ref, *, num_bits: int,
                     chunk_bytes: int):
    """int8 MXU path: unsigned-code matmul + rank-1 dequant/bias correction.

    ``y = sx_m * s_n * (sum_k xq[k] * u[k] - maxq * sum_k xq[k])`` — codes
    are fed to the int8 MXU offset-binary (unsigned, no per-code re-sign),
    and both the scale AND the +maxq bias are removed from the int32
    accumulator with rank-1 terms. 8-bit codes (0..254) would overflow the
    int8 cast, so f == 1 keeps the signed per-code path.
    """
    f = _pack_factor(num_bits)
    maxq = 2 ** (num_bits - 1) - 1
    plane_len = w_ref.shape[1]
    TM = xq_ref.shape[0]
    TN = w_ref.shape[0]
    xq = xq_ref[:]
    acc = jnp.zeros((TM, TN), jnp.int32)
    for c in range(plane_len // chunk_bytes):
        chunk = w_ref[:, c * chunk_bytes:(c + 1) * chunk_bytes]
        if f == 1:
            planes = [(chunk.astype(jnp.int32) - maxq).astype(jnp.int8)]
        else:
            planes = _unpack_chunk_planes(chunk, num_bits)
        for p, u in enumerate(planes):
            koff = p * plane_len + c * chunk_bytes
            acc += jax.lax.dot_general(
                xq[:, koff:koff + chunk_bytes], u,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    if f > 1:
        acc = acc - maxq * _rowsum_i32(xq)
    o_ref[:] = (acc.astype(jnp.float32)
                * s_ref[:, 0][None, :] * sx_ref[:, 0][:, None])


@functools.partial(
    jax.jit,
    static_argnames=("num_bits", "block_m", "block_n", "interpret"))
def quantized_matmul_w4a8(
    x: jax.Array,
    packed: jax.Array,
    row_scales: jax.Array,
    num_bits: int,
    block_m: int = 128,
    block_n: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """``y ~= x @ dequant(packed, row_scales).T`` on the int8 MXU.

    Activations are quantized per-row to int8 on the fly; weight codes are
    unpacked straight to int8 (no f32 intermediates); dequantization is a
    rank-1 rescale of the int32 accumulator.
    """
    f = _pack_factor(num_bits)
    M, K = x.shape
    N = packed.shape[0]
    assert packed.shape[1] * f == K
    assert packed.dtype == jnp.uint8, packed.dtype  # p==0 unpack relies on zero-extension
    block_n = min(resolve_block_n(block_n, num_bits), N)
    while N % block_n:
        block_n //= 2
    plane_len = K // f
    chunk_bytes = _pick_chunk(plane_len, 1, block_n)

    xq, sx = quantize_activations_int8(x)
    TM = min(block_m, _round_up(M, 32))      # int8 sublane tile is 32
    Mp = _round_up(M, TM)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)), constant_values=1.0)

    grid = (Mp // TM, N // block_n)
    out = pl.pallas_call(
        functools.partial(_qmm_w4a8_kernel, num_bits=num_bits,
                          chunk_bytes=chunk_bytes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, plane_len), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K + N * K // f + Mp * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, packed, row_scales.astype(jnp.float32), sx)
    return out[:M]


def _qmm_w4a8_stacked_kernel(l_ref, xq_ref, w_ref, s_ref, sx_ref, o_ref, *,
                             num_bits: int, chunk_bytes: int):
    """Stacked variant: ``w_ref``/``s_ref`` blocks carry a leading layer axis
    of size 1, selected by the scalar-prefetch layer index in the index_map
    (the whole point: no materialized per-layer slice of the stacked
    weights — the DMA engine fetches the right slab straight from HBM)."""
    del l_ref
    f = _pack_factor(num_bits)
    maxq = 2 ** (num_bits - 1) - 1
    plane_len = w_ref.shape[2]
    TM = xq_ref.shape[0]
    TN = w_ref.shape[1]
    xq = xq_ref[:]
    acc = jnp.zeros((TM, TN), jnp.int32)
    for c in range(plane_len // chunk_bytes):
        chunk = w_ref[0, :, c * chunk_bytes:(c + 1) * chunk_bytes]
        if f == 1:
            planes = [(chunk.astype(jnp.int32) - maxq).astype(jnp.int8)]
        else:
            planes = _unpack_chunk_planes(chunk, num_bits)
        for p, u in enumerate(planes):
            koff = p * plane_len + c * chunk_bytes
            acc += jax.lax.dot_general(
                xq[:, koff:koff + chunk_bytes], u,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    if f > 1:
        acc = acc - maxq * _rowsum_i32(xq)
    o_ref[:] = (acc.astype(jnp.float32)
                * s_ref[0, :, 0][None, :] * sx_ref[:, 0][:, None])


@functools.partial(
    jax.jit,
    static_argnames=("num_bits", "block_m", "block_n", "interpret"))
def quantized_matmul_w4a8_stacked(
    x: jax.Array,
    packed: jax.Array,       # (layers, N, K/f) uint8
    row_scales: jax.Array,   # (layers, N, 1) f32
    layer: jax.Array,        # () or (1,) int32
    num_bits: int,
    block_m: int = 128,
    block_n: Optional[int] = None,
    interpret: bool = False,
    act_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """W4A8 matmul against layer ``layer`` of a stacked weight tensor.

    Scalar-prefetch BlockSpec indexing pulls the selected layer's tiles
    directly from the stacked HBM array — the layer-loop caller never
    slices (and therefore never copies) the weights.
    """
    f = _pack_factor(num_bits)
    M, K = x.shape
    N = packed.shape[1]
    assert packed.shape[2] * f == K
    assert packed.dtype == jnp.uint8, packed.dtype  # p==0 unpack relies on zero-extension
    block_n = min(resolve_block_n(block_n, num_bits), N)
    while N % block_n:
        block_n //= 2
    plane_len = K // f
    chunk_bytes = _pick_chunk(plane_len, 1, block_n)

    xq, sx = quantize_activations_int8(x, act_scale)
    TM = min(block_m, _round_up(M, 32))
    Mp = _round_up(M, TM)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)), constant_values=1.0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // TM, N // block_n),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j, L: (i, 0)),
            pl.BlockSpec((1, block_n, plane_len),
                         lambda i, j, L: (L[0], j, 0)),
            pl.BlockSpec((1, block_n, 1), lambda i, j, L: (L[0], j, 0)),
            pl.BlockSpec((TM, 1), lambda i, j, L: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TM, block_n), lambda i, j, L: (i, j)),
    )
    out = pl.pallas_call(
        functools.partial(_qmm_w4a8_stacked_kernel, num_bits=num_bits,
                          chunk_bytes=chunk_bytes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xq, packed,
      row_scales.astype(jnp.float32), sx)
    return out[:M]


def _qmm_w4a8_persistent_kernel(l_ref, xq_ref, sx_ref, s_ref, w_hbm, o_ref,
                                wbuf, wsem, *,
                                num_bits: int, chunk_bytes: int,
                                block_n: int, nb: int):
    """Persistent manual-DMA variant of :func:`_qmm_w4a8_stacked_kernel`.

    Round-5 experiment (VERDICT r4 ask #5, the last unexecuted
    single-chip idea): ONE program per M-tile walks every N block of the
    selected layer's packed weights with explicit double-buffered
    ``pltpu.make_async_copy`` from HBM — no per-grid-step Mosaic
    pipelining, no kernel-boundary drain/refill between N blocks. Only
    the packed weights ride the manual DMA (``memory_space=pl.ANY``,
    layer slice by the scalar-prefetch index); the row scales are tiny
    (N floats/layer) and load as one regular VMEM block — a trailing
    dim-1 array cannot be DMA-sliced from ANY space (Mosaic memref_slice
    rejects the lane-degenerate layout, measured round 5).
    """
    l = l_ref[0]
    f = _pack_factor(num_bits)
    maxq = 2 ** (num_bits - 1) - 1
    plane_len = w_hbm.shape[2]
    xq = xq_ref[:]
    rsum = _rowsum_i32(xq) if f > 1 else None

    def wdma(slot, j):
        return pltpu.make_async_copy(
            w_hbm.at[l, pl.ds(j * block_n, block_n), :],
            wbuf.at[slot], wsem.at[slot])

    wdma(0, 0).start()

    def body(j, _):
        slot = jax.lax.rem(j, 2)
        nslot = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < nb)
        def _prefetch():
            wdma(nslot, j + 1).start()

        wdma(slot, j).wait()

        acc = jnp.zeros((xq.shape[0], block_n), jnp.int32)
        for c in range(plane_len // chunk_bytes):
            chunk = wbuf[slot, :, c * chunk_bytes:(c + 1) * chunk_bytes]
            if f == 1:
                planes = [(chunk.astype(jnp.int32) - maxq).astype(jnp.int8)]
            else:
                planes = _unpack_chunk_planes(chunk, num_bits)
            for p, u in enumerate(planes):
                koff = p * plane_len + c * chunk_bytes
                acc = acc + jax.lax.dot_general(
                    xq[:, koff:koff + chunk_bytes], u,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
        if f > 1:
            acc = acc - maxq * rsum
        sblk = s_ref[0, pl.ds(j * block_n, block_n), 0]    # (block_n,)
        vals = (acc.astype(jnp.float32) * sblk[None, :]
                * sx_ref[:, 0][:, None])
        o_ref[:, pl.ds(j * block_n, block_n)] = vals
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_bits", "block_m", "block_n", "interpret"))
def quantized_matmul_w4a8_stacked_persistent(
    x: jax.Array,
    packed: jax.Array,       # (layers, N, K/f) uint8
    row_scales: jax.Array,   # (layers, N, 1) f32
    layer: jax.Array,
    num_bits: int,
    block_m: int = 128,
    block_n: Optional[int] = None,
    interpret: bool = False,
    act_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """:func:`quantized_matmul_w4a8_stacked` with manual-DMA persistent
    scheduling — see :func:`_qmm_w4a8_persistent_kernel`. Measured head to
    head against the grid-pipelined kernel in
    ``scripts/exp_persistent_chip.py``."""
    f = _pack_factor(num_bits)
    M, K = x.shape
    N = packed.shape[1]
    assert packed.shape[2] * f == K
    assert packed.dtype == jnp.uint8, packed.dtype
    block_n = min(resolve_block_n(block_n, num_bits), N)
    while N % block_n:
        block_n //= 2
    plane_len = K // f
    chunk_bytes = _pick_chunk(plane_len, 1, block_n)
    nb = N // block_n

    xq, sx = quantize_activations_int8(x, act_scale)
    TM = min(block_m, _round_up(M, 32))
    Mp = _round_up(M, TM)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)), constant_values=1.0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // TM,),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, L: (i, 0)),
            pl.BlockSpec((TM, 1), lambda i, L: (i, 0)),
            pl.BlockSpec((1, N, 1), lambda i, L: (L[0], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TM, N), lambda i, L: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block_n, plane_len), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_qmm_w4a8_persistent_kernel, num_bits=num_bits,
                          chunk_bytes=chunk_bytes, block_n=block_n, nb=nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xq,
      sx, row_scales.astype(jnp.float32), packed)
    return out[:M]


@functools.partial(jax.jit, static_argnames=("num_bits",))
def quantized_matmul_w4a8_xla(x, packed, row_scales, num_bits):
    """XLA twin of the W4A8 kernel (same activation quantization)."""
    f = _pack_factor(num_bits)
    K = packed.shape[1] * f
    maxq = 2 ** (num_bits - 1) - 1
    mask = (1 << num_bits) - 1
    planes = [((packed >> (num_bits * (f - 1 - p))) & mask) for p in range(f)]
    u = jnp.concatenate(planes, axis=1) if f > 1 else planes[0]
    xq, sx = quantize_activations_int8(x)
    acc = jax.lax.dot_general(
        xq.astype(jnp.int32), u.astype(jnp.int32) - maxq,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * row_scales[:, 0][None, :] * sx


def _qmm_w4a8_lr_stacked_kernel(l_ref, pid_ref, xq_ref, y_ref, w_ref, s_ref,
                                sx_ref, R_ref, Rs_ref, L_ref, Ls_ref, o_ref,
                                xr_ref, *, num_bits: int, chunk_bytes: int,
                                rank: int, single: bool):
    """Stacked W4A8 matmul with the CALDERA low-rank path fused in.

    Same packed-codes int8-MXU matmul as :func:`_qmm_w4a8_stacked_kernel`,
    plus the ``x @ (L @ R).T`` factor contribution computed in the SAME grid
    step: the layer's ``R`` slab is DMA'd once per row block (its index_map
    ignores ``j``, so Mosaic elides the re-fetch across output blocks) and
    ``x @ R.T`` lands in VMEM scratch at ``j == 0``; each output block then
    adds ``xr @ L_block.T`` where ``L_block`` is the (block_n, rank) slab of
    the per-projection factors, concatenated along N in the same order as
    the packed rows. This removes the XLA ``dynamic_index_in_dim`` factor
    slices of the unfused path, which materialize an HBM copy of every
    factor matrix every layer (~3x the compulsory factor traffic).
    ``pid_ref[j]`` gives the projection id of output block ``j`` (scalar
    prefetch), selecting the (lane-aligned) rank window of the scratch.
    """
    del l_ref
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _xr():
        # chunk the K contraction so the int8->bf16 cast of the R slab
        # never materializes more than ~1 MB of converted values in VMEM
        K_ = y_ref.shape[1]
        sumR = R_ref.shape[1]
        kc = K_
        while kc > 2048:
            kc //= 2
        xr = jnp.zeros((y_ref.shape[0], sumR), jnp.float32)
        for c in range(K_ // kc):
            Rc = (R_ref[0, :, c * kc:(c + 1) * kc]
                  .astype(jnp.float32).astype(jnp.bfloat16))   # (sumR, kc)
            xr += jax.lax.dot_general(
                y_ref[:, c * kc:(c + 1) * kc], Rc,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (TM, sumR)
        xr_ref[:] = xr * Rs_ref[0, :, 0][None, :]

    f = _pack_factor(num_bits)
    maxq = 2 ** (num_bits - 1) - 1
    plane_len = w_ref.shape[2]
    TM = xq_ref.shape[0]
    TN = w_ref.shape[1]
    xq = xq_ref[:]
    acc = jnp.zeros((TM, TN), jnp.int32)
    for c in range(plane_len // chunk_bytes):
        chunk = w_ref[0, :, c * chunk_bytes:(c + 1) * chunk_bytes]
        if f == 1:
            planes = [(chunk.astype(jnp.int32) - maxq).astype(jnp.int8)]
        else:
            planes = _unpack_chunk_planes(chunk, num_bits)
        for p, u in enumerate(planes):
            koff = p * plane_len + c * chunk_bytes
            acc += jax.lax.dot_general(
                xq[:, koff:koff + chunk_bytes], u,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    if f > 1:
        acc = acc - maxq * _rowsum_i32(xq)

    if single:
        xr_j = xr_ref[:]                       # n_proj == 1: whole scratch
    else:
        xr_j = xr_ref[:, pl.ds(pid_ref[j] * rank, rank)]  # rank % 128 == 0
    Lb = L_ref[0].astype(jnp.float32).astype(jnp.bfloat16)   # (TN, rank)
    ylr = jax.lax.dot_general(
        xr_j.astype(jnp.bfloat16), Lb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (acc.astype(jnp.float32)
                * s_ref[0, :, 0][None, :] * sx_ref[:, 0][:, None]
                + ylr * Ls_ref[0, :, 0][None, :])


def lr_stacked_supported(splits: Tuple[int, ...], ranks: Tuple[int, ...],
                         block_n: Optional[int] = None,
                         num_bits: int = 4) -> bool:
    """Whether the fused-factor stacked kernel supports this fusion group:
    uniform rank, lane-aligned rank windows (or a single projection), and a
    reasonable (>= 128) common output block size. ``num_bits`` must match
    the group's actual width so the verdict uses the same
    ``resolve_block_n`` chain as the kernel (ADVICE r4 #1: a 2-bit group
    resolves 256, not the 4-bit default's 512)."""
    if len(set(ranks)) != 1:
        return False
    if len(splits) > 1 and ranks[0] % 128 != 0:
        return False
    block_n = min(resolve_block_n(block_n, num_bits), min(splits))
    while any(n % block_n for n in splits):
        block_n //= 2
    return block_n >= 128


@functools.partial(
    jax.jit,
    static_argnames=("num_bits", "rank", "splits", "block_m", "block_n",
                     "interpret"))
def quantized_matmul_w4a8_lr_stacked(
    x: jax.Array,
    packed: jax.Array,       # (layers, sumN, K/f) uint8
    row_scales: jax.Array,   # (layers, sumN, 1) f32
    layer: jax.Array,        # () or (1,) int32
    R: jax.Array,            # (layers, n_proj * rank, K) int8 codes
    R_scale: jax.Array,      # (layers, n_proj * rank, 1) f32
    L_cat: jax.Array,        # (layers, sumN, rank) int8 codes, N-concat
    L_scale_cat: jax.Array,  # (layers, sumN, 1) f32
    num_bits: int,
    rank: int,
    splits: Tuple[int, ...],
    block_m: int = 128,
    block_n: Optional[int] = None,
    interpret: bool = False,
    act_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """W4A8 + low-rank matmul against layer ``layer``: one kernel computes
    ``x @ (dequant(packed) + L @ R).T`` for a fusion group of ``len(splits)``
    same-input projections (scales applied; per-projection global scales and
    biases stay with the caller). Factor numerics match
    :func:`low_rank_matmul` exactly (bf16 dots, f32 rank-1 rescales), so the
    fused and unfused paths agree to float-associativity noise.
    """
    f = _pack_factor(num_bits)
    M, K = x.shape
    N = packed.shape[1]
    assert packed.shape[2] * f == K
    assert packed.dtype == jnp.uint8, packed.dtype  # p==0 unpack relies on zero-extension
    assert sum(splits) == N and L_cat.shape[1] == N
    assert R.shape[1] == len(splits) * rank
    block_n = min(resolve_block_n(block_n, num_bits), min(splits))
    while any(n % block_n for n in splits):
        block_n //= 2
    plane_len = K // f
    chunk_bytes = _pick_chunk(plane_len, 1, block_n)
    single = len(splits) == 1

    # projection id of each output block, in fusion order
    pid = []
    for i, n in enumerate(splits):
        pid += [i] * (n // block_n)
    pid = jnp.asarray(pid, jnp.int32)

    xq, sx = quantize_activations_int8(x)
    TM = min(block_m, _round_up(M, 32))
    Mp = _round_up(M, TM)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)), constant_values=1.0)
    y = jnp.pad(x.astype(jnp.bfloat16), ((0, Mp - M), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Mp // TM, N // block_n),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j, Lx, P: (i, 0)),
            pl.BlockSpec((TM, K), lambda i, j, Lx, P: (i, 0)),
            pl.BlockSpec((1, block_n, plane_len),
                         lambda i, j, Lx, P: (Lx[0], j, 0)),
            pl.BlockSpec((1, block_n, 1), lambda i, j, Lx, P: (Lx[0], j, 0)),
            pl.BlockSpec((TM, 1), lambda i, j, Lx, P: (i, 0)),
            pl.BlockSpec((1, R.shape[1], K),
                         lambda i, j, Lx, P: (Lx[0], 0, 0)),
            pl.BlockSpec((1, R.shape[1], 1),
                         lambda i, j, Lx, P: (Lx[0], 0, 0)),
            pl.BlockSpec((1, block_n, rank),
                         lambda i, j, Lx, P: (Lx[0], j, 0)),
            pl.BlockSpec((1, block_n, 1), lambda i, j, Lx, P: (Lx[0], j, 0)),
        ],
        out_specs=pl.BlockSpec((TM, block_n), lambda i, j, Lx, P: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((TM, R.shape[1]), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_qmm_w4a8_lr_stacked_kernel, num_bits=num_bits,
                          chunk_bytes=chunk_bytes, rank=rank, single=single),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), pid, xq, y, packed,
      row_scales.astype(jnp.float32), sx, R, R_scale.astype(jnp.float32),
      L_cat, L_scale_cat.astype(jnp.float32))
    return out[:M]


def _qmm_w4a8_l_stacked_kernel(l_ref, pid_ref, xq_ref, w_ref, s_ref, sx_ref,
                               xr_ref, L_ref, Ls_ref, o_ref, *,
                               num_bits: int, chunk_bytes: int, rank: int,
                               single: bool):
    """Stacked W4A8 matmul with only the ``L``-factor half fused in.

    The caller computes ``xr = (x @ R[l].T) * R_scale[l]`` with a plain XLA
    dot (tiny: (TM, K) x (K, sum_ranks)) and passes it in; each output block
    adds ``xr_window @ L_block.T`` where ``L_block`` is the (block_n, rank)
    slab of the N-concatenated factors. Unlike the full
    :func:`_qmm_w4a8_lr_stacked_kernel`, no R slab is DMA'd or converted
    inside the kernel, so nothing serializes ahead of the first output block
    (the measured regression of the full fusion, see
    ``models/fused.quantize_factors_int8_fused``); unlike the XLA factor
    path, the big per-layer ``L`` matrices are never copied out of the
    stacked HBM array by ``dynamic_index_in_dim`` (~0.18 GB/step of copy
    write+read traffic on Llama-2-7B rank-128).
    """
    del l_ref
    j = pl.program_id(1)
    f = _pack_factor(num_bits)
    maxq = 2 ** (num_bits - 1) - 1
    plane_len = w_ref.shape[2]
    TM = xq_ref.shape[0]
    TN = w_ref.shape[1]
    xq = xq_ref[:]
    acc = jnp.zeros((TM, TN), jnp.int32)
    for c in range(plane_len // chunk_bytes):
        chunk = w_ref[0, :, c * chunk_bytes:(c + 1) * chunk_bytes]
        if f == 1:
            planes = [(chunk.astype(jnp.int32) - maxq).astype(jnp.int8)]
        else:
            planes = _unpack_chunk_planes(chunk, num_bits)
        for p, u in enumerate(planes):
            koff = p * plane_len + c * chunk_bytes
            acc += jax.lax.dot_general(
                xq[:, koff:koff + chunk_bytes], u,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    if f > 1:
        acc = acc - maxq * _rowsum_i32(xq)

    if single:
        xr_j = xr_ref[:]
    else:
        xr_j = xr_ref[:, pl.ds(pid_ref[j] * rank, rank)]  # rank % 128 == 0
    Lb = L_ref[0].astype(jnp.float32).astype(jnp.bfloat16)   # (TN, rank)
    ylr = jax.lax.dot_general(
        xr_j.astype(jnp.bfloat16), Lb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (acc.astype(jnp.float32)
                * s_ref[0, :, 0][None, :] * sx_ref[:, 0][:, None]
                + ylr * Ls_ref[0, :, 0][None, :])


@functools.partial(
    jax.jit,
    static_argnames=("num_bits", "rank", "splits", "block_m", "block_n",
                     "interpret"))
def quantized_matmul_w4a8_l_stacked(
    x: jax.Array,
    packed: jax.Array,       # (layers, sumN, K/f) uint8
    row_scales: jax.Array,   # (layers, sumN, 1) f32
    layer: jax.Array,        # () or (1,) int32
    xr: jax.Array,           # (M, n_proj * rank) f32 — (x @ R[l].T) * Rs[l]
    L_cat: jax.Array,        # (layers, sumN, rank) int8 codes, N-concat
    L_scale_cat: jax.Array,  # (layers, sumN, 1) f32
    num_bits: int,
    rank: int,
    splits: Tuple[int, ...],
    block_m: int = 128,
    block_n: Optional[int] = None,
    interpret: bool = False,
    act_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """W4A8 matmul + L-factor add against layer ``layer``: one kernel
    computes ``x @ dequant(packed).T + xr @ L.T`` for a fusion group of
    ``len(splits)`` same-input projections, with ``xr`` (the thin
    R-contraction) supplied by the caller. Factor numerics match
    :func:`low_rank_matmul` exactly (bf16 dot on the f32-rescaled xr)."""
    f = _pack_factor(num_bits)
    M, K = x.shape
    N = packed.shape[1]
    assert packed.shape[2] * f == K
    assert packed.dtype == jnp.uint8, packed.dtype
    assert sum(splits) == N and L_cat.shape[1] == N
    assert xr.shape == (M, len(splits) * rank), (xr.shape, splits, rank)
    block_n = min(resolve_block_n(block_n, num_bits), min(splits))
    while any(n % block_n for n in splits):
        block_n //= 2
    plane_len = K // f
    chunk_bytes = _pick_chunk(plane_len, 1, block_n)
    single = len(splits) == 1

    pid = []
    for i, n in enumerate(splits):
        pid += [i] * (n // block_n)
    pid = jnp.asarray(pid, jnp.int32)

    xq, sx = quantize_activations_int8(x, act_scale)
    TM = min(block_m, _round_up(M, 32))
    Mp = _round_up(M, TM)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)), constant_values=1.0)
        xr = jnp.pad(xr, ((0, Mp - M), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Mp // TM, N // block_n),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j, Lx, P: (i, 0)),
            pl.BlockSpec((1, block_n, plane_len),
                         lambda i, j, Lx, P: (Lx[0], j, 0)),
            pl.BlockSpec((1, block_n, 1), lambda i, j, Lx, P: (Lx[0], j, 0)),
            pl.BlockSpec((TM, 1), lambda i, j, Lx, P: (i, 0)),
            pl.BlockSpec((TM, xr.shape[1]), lambda i, j, Lx, P: (i, 0)),
            pl.BlockSpec((1, block_n, rank),
                         lambda i, j, Lx, P: (Lx[0], j, 0)),
            pl.BlockSpec((1, block_n, 1), lambda i, j, Lx, P: (Lx[0], j, 0)),
        ],
        out_specs=pl.BlockSpec((TM, block_n), lambda i, j, Lx, P: (i, j)),
    )
    out = pl.pallas_call(
        functools.partial(_qmm_w4a8_l_stacked_kernel, num_bits=num_bits,
                          chunk_bytes=chunk_bytes, rank=rank, single=single),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), pid, xq, packed,
      row_scales.astype(jnp.float32), sx, xr.astype(jnp.float32), L_cat,
      L_scale_cat.astype(jnp.float32))
    return out[:M]


def _qmm_w4a8_mlp_stacked_kernel(
        l_ref, gugs_ref, xq_ref, sx_ref, xr_ref, guw_ref, gus_ref, guL_ref,
        guLs_ref, dnw_ref, dns_ref, dnR_ref, dnRs_ref, dnL_ref, dnLs_ref,
        o_ref, gm_ref, amax_ref, m8_ref, sm_ref, rs_ref, xrd_ref, *,
        num_bits: int, gu_chunk: int, dn_chunk: int, rank: int, Gg: int,
        G1: int, bn1: int):
    """Whole-MLP megakernel: gate/up packed matmuls -> SiLU-mul -> dynamic
    int8 requantization -> down packed matmul, one launch per layer.

    1D 'arbitrary' grid of ``G1 + G2`` programs. Programs ``j < Gg`` compute
    gate output blocks into VMEM scratch (``gm_ref``); programs
    ``Gg <= j < G1`` compute the matching up blocks, overwrite the scratch
    with ``silu(gate) * up`` (global scales applied from SMEM), and
    accumulate the running per-row absmax. Program ``G1`` requantizes the
    intermediate to int8 (same per-row absmax rule as
    :func:`quantize_activations_int8`), precomputes its rowsum bias term,
    and contracts it with the down ``R`` factor slab; programs ``>= G1``
    then run the standard W4A8 + L-factor output blocks of down_proj.

    Removes, per layer: one Pallas launch, the gate/up HBM round trip, the
    XLA silu/mul/quantize thunks, and the down R-slab copy — all glue
    between two DMA-bound matmuls that XLA cannot fuse across a
    ``pallas_call`` boundary. Factor numerics match :func:`low_rank_matmul`
    (bf16 dots, f32 rank-1 rescales); the down activation quantization
    matches :func:`quantize_activations_int8` exactly.

    The (layers, 2) gate/up global scales ride as the SECOND scalar-
    prefetch argument (indexed by the layer id from the first) — Mosaic
    rejects a (1, 2) SMEM block of a (layers, 2) input (second-minor 1
    fails the 8-divisibility rule).
    """
    lsel = l_ref[0]
    j = pl.program_id(0)
    f = _pack_factor(num_bits)
    maxq = 2 ** (num_bits - 1) - 1
    TM = xq_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        amax_ref[:] = jnp.zeros_like(amax_ref)

    @pl.when(j < G1)
    def _gateup():
        plane_len = guw_ref.shape[2]
        xq = xq_ref[:]
        acc = jnp.zeros((TM, bn1), jnp.int32)
        for c in range(plane_len // gu_chunk):
            chunk = guw_ref[0, :, c * gu_chunk:(c + 1) * gu_chunk]
            if f == 1:
                planes = [(chunk.astype(jnp.int32) - maxq).astype(jnp.int8)]
            else:
                planes = _unpack_chunk_planes(chunk, num_bits)
            for p, u in enumerate(planes):
                koff = p * plane_len + c * gu_chunk
                acc += jax.lax.dot_general(
                    xq[:, koff:koff + gu_chunk], u,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
        if f > 1:
            acc = acc - maxq * _rowsum_i32(xq)
        is_gate = j < Gg
        sel = jnp.where(is_gate, 0, 1)
        xr_j = xr_ref[:, pl.ds(pl.multiple_of(sel * rank, rank), rank)]
        Lb = guL_ref[0].astype(jnp.float32).astype(jnp.bfloat16)
        ylr = jax.lax.dot_general(
            xr_j.astype(jnp.bfloat16), Lb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = (acc.astype(jnp.float32)
               * gus_ref[0, :, 0][None, :] * sx_ref[:, 0][:, None]
               + ylr * guLs_ref[0, :, 0][None, :])
        out = out * jnp.where(is_gate, gugs_ref[lsel, 0], gugs_ref[lsel, 1])
        col = pl.multiple_of(jnp.where(is_gate, j, j - Gg) * bn1, bn1)

        @pl.when(is_gate)
        def _store_gate():
            gm_ref[:, pl.ds(col, bn1)] = out

        @pl.when(~is_gate)
        def _store_m():
            g = gm_ref[:, pl.ds(col, bn1)]
            m = (g * jax.lax.logistic(g)) * out          # silu(gate) * up
            gm_ref[:, pl.ds(col, bn1)] = m
            amax_ref[:] = jnp.maximum(
                amax_ref[:], jnp.max(jnp.abs(m), axis=1, keepdims=True))

    @pl.when(j == G1)
    def _requant():
        im = gm_ref.shape[1]
        sm = jnp.maximum(amax_ref[:, :1], 1e-12) / 127.0      # (TM, 1)
        sm_ref[:] = jnp.broadcast_to(sm, sm_ref.shape)
        m8 = jnp.clip(jnp.round(gm_ref[:] / sm), -127, 127).astype(jnp.int8)
        m8_ref[:] = m8
        rs = jnp.sum(m8.astype(jnp.int32), axis=1, keepdims=True)
        rs_ref[:] = jnp.broadcast_to(rs, rs_ref.shape)
        kc = im
        while kc > 2048:
            kc //= 2
        xrd = jnp.zeros((TM, rank), jnp.float32)
        for c in range(im // kc):
            Rc = (dnR_ref[0, :, c * kc:(c + 1) * kc]
                  .astype(jnp.float32).astype(jnp.bfloat16))   # (rank, kc)
            mb = gm_ref[:, c * kc:(c + 1) * kc].astype(jnp.bfloat16)
            xrd += jax.lax.dot_general(
                mb, Rc, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        xrd_ref[:] = xrd * dnRs_ref[0, :, 0][None, :]

    @pl.when(j >= G1)
    def _down():
        plane_len = dnw_ref.shape[2]
        TN = dnw_ref.shape[1]
        m8 = m8_ref[:]
        acc = jnp.zeros((TM, TN), jnp.int32)
        for c in range(plane_len // dn_chunk):
            chunk = dnw_ref[0, :, c * dn_chunk:(c + 1) * dn_chunk]
            if f == 1:
                planes = [(chunk.astype(jnp.int32) - maxq).astype(jnp.int8)]
            else:
                planes = _unpack_chunk_planes(chunk, num_bits)
            for p, u in enumerate(planes):
                koff = p * plane_len + c * dn_chunk
                acc += jax.lax.dot_general(
                    m8[:, koff:koff + dn_chunk], u,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
        if f > 1:
            acc = acc - maxq * rs_ref[:, :1]
        Lb = dnL_ref[0].astype(jnp.float32).astype(jnp.bfloat16)
        ylr = jax.lax.dot_general(
            xrd_ref[:].astype(jnp.bfloat16), Lb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = (acc.astype(jnp.float32)
                    * dns_ref[0, :, 0][None, :] * sm_ref[:, :1]
                    + ylr * dnLs_ref[0, :, 0][None, :])


def mlp_stacked_supported(im: int, h: int, rank: int, num_bits: int) -> bool:
    """Whether the MLP megakernel supports this fusion: lane-aligned rank
    windows for the gate/up xr split and 128-divisible block sizes."""
    if rank % 128:
        return False
    bn1 = min(256, im)
    bn2 = min(256, h)
    return (im % bn1 == 0 and h % bn2 == 0 and bn1 >= 128 and bn2 >= 128
            and (8 // container_bits(num_bits)) >= 1)


@functools.partial(
    jax.jit,
    static_argnames=("num_bits", "rank", "block_m", "block_n", "interpret"))
def quantized_matmul_w4a8_mlp_stacked(
    x: jax.Array,            # (M, h) f32 — normed layer input
    gu_packed: jax.Array,    # (layers, 2*im, h*bits/8) uint8 (gate ++ up)
    gu_scales: jax.Array,    # (layers, 2*im, 1) f32
    layer: jax.Array,        # () or (1,) int32
    xr_gu: jax.Array,        # (M, 2*rank) f32 — (x @ R_gu[l].T) * Rs_gu[l]
    gu_L_cat: jax.Array,     # (layers, 2*im, rank) int8, N-concatenated
    gu_L_scale: jax.Array,   # (layers, 2*im, 1) f32
    gu_gs: jax.Array,        # (layers, 2) f32 — gate / up global scales
    dn_packed: jax.Array,    # (layers, h, im*bits/8) uint8
    dn_scales: jax.Array,    # (layers, h, 1) f32
    dn_R: jax.Array,         # (layers, rank, im) int8
    dn_R_scale: jax.Array,   # (layers, rank, 1) f32
    dn_L: jax.Array,         # (layers, h, rank) int8
    dn_L_scale: jax.Array,   # (layers, h, 1) f32
    num_bits: int,
    rank: int,
    block_m: int = 128,
    block_n: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Whole-MLP W4A8 decode: ``down(silu(gate(x)) * up(x))`` in ONE Pallas
    launch against layer ``layer`` of the stacked weights (factor halves
    fused; the thin gate/up R contraction rides in as ``xr_gu``). Returns
    the down_proj output BEFORE its global scale (caller applies it, as in
    the unfused path). See :func:`_qmm_w4a8_mlp_stacked_kernel`.
    """
    f = _pack_factor(num_bits)
    M, K = x.shape
    N_gu = gu_packed.shape[1]
    im = N_gu // 2
    h = dn_packed.shape[1]
    assert gu_packed.shape[2] * f == K and dn_packed.shape[2] * f == im
    assert gu_packed.dtype == jnp.uint8 and dn_packed.dtype == jnp.uint8
    assert xr_gu.shape == (M, 2 * rank), (xr_gu.shape, rank)
    assert dn_R.shape[1:] == (rank, im)
    block_n = resolve_block_n(block_n, num_bits)
    bn1 = min(block_n, im)
    while im % bn1:
        bn1 //= 2
    bn2 = min(block_n, h)
    while h % bn2:
        bn2 //= 2
    gu_plane = K // f
    dn_plane = im // f
    gu_chunk = _pick_chunk(gu_plane, 1, bn1)
    dn_chunk = _pick_chunk(dn_plane, 1, bn2)
    Gg = im // bn1
    G1 = 2 * Gg
    G2 = h // bn2

    xq, sx = quantize_activations_int8(x)
    TM = min(block_m, _round_up(M, 32))
    Mp = _round_up(M, TM)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)), constant_values=1.0)
        xr_gu = jnp.pad(xr_gu, ((0, Mp - M), (0, 0)))
    if Mp != TM:
        raise ValueError("mlp megakernel supports one row block "
                         f"(M={M} > block_m={block_m})")

    def gu_idx(j, Lx, Gs):
        return (Lx[0], jnp.minimum(j, G1 - 1), 0)

    def gu_idx2(j, Lx, Gs):
        return (Lx[0], jnp.minimum(j, G1 - 1), 0)

    def dn_idx(j, Lx, Gs):
        return (Lx[0], jnp.maximum(j - G1, 0), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # layer id + (layers, 2) gu scales
        grid=(G1 + G2,),
        in_specs=[
            pl.BlockSpec((TM, K), lambda j, Lx, Gs: (0, 0)),
            pl.BlockSpec((TM, 1), lambda j, Lx, Gs: (0, 0)),
            pl.BlockSpec((TM, 2 * rank), lambda j, Lx, Gs: (0, 0)),
            pl.BlockSpec((1, bn1, gu_plane), gu_idx),
            pl.BlockSpec((1, bn1, 1), gu_idx2),
            pl.BlockSpec((1, bn1, rank), gu_idx),
            pl.BlockSpec((1, bn1, 1), gu_idx2),
            pl.BlockSpec((1, bn2, dn_plane), dn_idx),
            pl.BlockSpec((1, bn2, 1), dn_idx),
            pl.BlockSpec((1, rank, im), lambda j, Lx, Gs: (Lx[0], 0, 0)),
            pl.BlockSpec((1, rank, 1), lambda j, Lx, Gs: (Lx[0], 0, 0)),
            pl.BlockSpec((1, bn2, rank), dn_idx),
            pl.BlockSpec((1, bn2, 1), dn_idx),
        ],
        out_specs=pl.BlockSpec(
            (TM, bn2), lambda j, Lx, Gs: (0, jnp.maximum(j - G1, 0))),
        scratch_shapes=[
            pltpu.VMEM((TM, im), jnp.float32),     # gate outputs, then m
            pltpu.VMEM((TM, 128), jnp.float32),    # running absmax of m
            pltpu.VMEM((TM, im), jnp.int8),        # m quantized
            pltpu.VMEM((TM, 128), jnp.float32),    # m row scales
            pltpu.VMEM((TM, 128), jnp.int32),      # m rowsum (bias term)
            pltpu.VMEM((TM, rank), jnp.float32),   # xr for down
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _qmm_w4a8_mlp_stacked_kernel, num_bits=num_bits,
            gu_chunk=gu_chunk, dn_chunk=dn_chunk, rank=rank, Gg=Gg, G1=G1,
            bn1=bn1),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, h), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), gu_gs.astype(jnp.float32),
      xq, sx, xr_gu.astype(jnp.float32), gu_packed,
      gu_scales.astype(jnp.float32), gu_L_cat,
      gu_L_scale.astype(jnp.float32),
      dn_packed, dn_scales.astype(jnp.float32), dn_R,
      dn_R_scale.astype(jnp.float32), dn_L, dn_L_scale.astype(jnp.float32))
    return out[:M]


def _bf16_stacked_kernel(l_ref, x_ref, w_ref, o_ref):
    del l_ref
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def bf16_matmul_stacked(
    x: jax.Array,            # (M, K)
    W: jax.Array,            # (layers, N, K) bf16
    layer: jax.Array,        # () int32
    block_m: int = 128,
    block_n: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """``y = x @ W[layer].T`` with scalar-prefetch layer selection.

    Used for the low-rank L/R factor matmuls in the stacked decode path:
    an XLA ``dynamic_index_in_dim`` would materialize a copy of the layer's
    factor matrix before the dot; here the DMA engine reads the slab
    directly.
    """
    M, K = x.shape
    N = W.shape[1]
    block_n = min(resolve_block_n(block_n), N)
    while N % block_n:
        block_n //= 2
    TM = min(block_m, _round_up(M, 16))
    Mp = _round_up(M, TM)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // TM, N // block_n),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j, L: (i, 0)),
            pl.BlockSpec((1, block_n, K), lambda i, j, L: (L[0], j, 0)),
        ],
        out_specs=pl.BlockSpec((TM, block_n), lambda i, j, L: (i, j)),
    )
    out = pl.pallas_call(
        _bf16_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x.astype(jnp.bfloat16),
      W.astype(jnp.bfloat16))
    return out[:M]


# ---------------------------------------------------------------------------
# W8A8 container: int8 weights served directly (zero unpack work)
#
# For latency-critical serving, 4-bit codes can be *stored* in an int8
# container (or true 8-bit quantization used): the weight tile feeds the
# MXU as-is — no VPU unpack at all — trading 2x HBM footprint/bandwidth
# for the removal of the per-code vector work.
# ---------------------------------------------------------------------------

def _qmm_int8_kernel(xq_ref, w_ref, s_ref, sx_ref, o_ref):
    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32)
                * s_ref[:, 0][None, :] * sx_ref[:, 0][:, None])


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def int8_matmul(
    x: jax.Array,
    w_int8: jax.Array,
    row_scales: jax.Array,
    block_m: int = 128,
    block_n: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """``y = x @ (row_scales * w_int8).T`` with int8 weights fed straight to
    the MXU (signed codes, no unpack)."""
    M, K = x.shape
    N = w_int8.shape[0]
    block_n = min(resolve_block_n(block_n), N)
    while N % block_n:
        block_n //= 2
    xq, sx = quantize_activations_int8(x)
    TM = min(block_m, _round_up(M, 32))
    Mp = _round_up(M, TM)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)), constant_values=1.0)
    grid = (Mp // TM, N // block_n)
    out = pl.pallas_call(
        _qmm_int8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, K), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K + N * K + Mp * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, w_int8, row_scales.astype(jnp.float32), sx)
    return out[:M]


def quantize_int8_rowwise(W: jax.Array):
    """(..., N, K) -> (int8 codes, (..., N, 1) f32 row scales)."""
    Wf = W.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(Wf), axis=-1, keepdims=True), 1e-8)
    scales = absmax / 127.0
    codes = jnp.clip(jnp.round(Wf / scales), -127, 127).astype(jnp.int8)
    return codes, scales


@jax.jit
def int8_matmul_xla(x, w_int8, row_scales):
    """XLA twin of :func:`int8_matmul` (same activation quantization)."""
    xq, sx = quantize_activations_int8(x)
    acc = jax.lax.dot_general(
        xq.astype(jnp.int32), w_int8.astype(jnp.int32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * row_scales[:, 0][None, :] * sx


def low_rank_matmul(x2: jax.Array, L: jax.Array, R: jax.Array,
                    L_scale: Optional[jax.Array] = None,
                    R_scale: Optional[jax.Array] = None,
                    xr_reduce=None) -> jax.Array:
    """``x2 @ (L @ R).T`` as two thin dots, factors bf16 or int8.

    int8 factors (``*_scale`` given, per-row absmax) are cast to bf16 —
    exact, |codes| <= 127 — fed to the MXU, and dequantized as a rank-1
    column rescale of the f32 accumulator: half the factor HBM traffic of
    bf16 with no extra rounding beyond the int8 codes themselves.
    ``L``: (N, r), ``R``: (r, K), scales (N, 1) / (r, 1).

    ``xr_reduce``: optional hook applied to the f32 ``xr`` BEFORE its
    bf16 cast. Tensor-parallel row-sharded callers psum the K-partial xr
    here (and mask to one shard) so the cast — a nonlinearity — sees the
    full-K value, not a shard partial; without it the sharded step's
    low-rank contribution drifts ~1e-4 from the single-chip numerics.
    """
    xr = jnp.dot(x2.astype(jnp.bfloat16), R.T.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    if R_scale is not None:
        xr = xr * R_scale[:, 0][None, :]
    if xr_reduce is not None:
        xr = xr_reduce(xr)
    ylr = jnp.dot(xr.astype(jnp.bfloat16), L.T.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    if L_scale is not None:
        ylr = ylr * L_scale[:, 0][None, :]
    return ylr


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
