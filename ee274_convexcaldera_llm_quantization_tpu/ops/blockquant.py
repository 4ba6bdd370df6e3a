"""Blockwise quantization primitives (XLA/jnp reference implementations).

These are the functional, jit-friendly building blocks behind the
``quant.quantizers.BlockQuantizer`` API. Behavior matches the reference
quantizer family (``rank-constrained-regression-main/src/caldera/utils/
quantization.py:93-243`` in the reference repo) but is written TPU-first:
every routine is a pure function on ``(num_blocks, block_size)`` arrays with
static shapes, no Python loops over data, and no host round trips.

Layout convention: a 2-D weight ``W`` of shape ``(m, n)`` is flattened
row-major and reshaped to ``(m*n // block_size, block_size)`` — identical to
the reference's flat blocking (``quantization.py:257-258``) so that numerics
line up exactly for parity tests.

Codebook notes:
- ``NF4_LEVELS_LEGACY`` reproduces the reference's hand-rolled NF4 table
  (``quantization.py:45-51``).
- ``NF4_LEVELS_TRUE`` is the exact bitsandbytes NF4 codebook, which the
  reference keeps in ``quantization_experimental.py:8-26`` as an alternative;
  we expose it as method ``"nf4_true"``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Legacy NF4 table used by the reference's canonical quantizer.
NF4_LEVELS_LEGACY = jnp.array(
    [-1.334, -1.0, -0.784, -0.617, -0.476, -0.347, -0.226, -0.112,
     0.0, 0.112, 0.226, 0.347, 0.476, 0.617, 0.784, 1.0],
    dtype=jnp.float32,
)

# Exact bitsandbytes NF4 codebook (normal-float, 16 asymmetric levels).
NF4_LEVELS_TRUE = jnp.array(
    [-1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
     -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
     0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
     0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
     0.7229568362236023, 1.0],
    dtype=jnp.float32,
)

NF2_LEVELS = jnp.array([-0.8165, -0.3333, 0.3333, 0.8165], dtype=jnp.float32)


def blockify(W: jax.Array, block_size: int) -> Tuple[jax.Array, Tuple[int, ...]]:
    """Flatten row-major and reshape to (num_blocks, block_size).

    ``W.size`` must be divisible by ``block_size`` (the reference raises the
    same constraint, ``quantization.py:250-255``).
    """
    if W.size % block_size != 0:
        raise ValueError(
            f"matrix with {W.size} elements is not divisible by block size "
            f"{block_size}"
        )
    return W.reshape(-1, block_size), W.shape


def unblockify(blocks: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    return blocks.reshape(shape)


# ---------------------------------------------------------------------------
# Uniform (symmetric absmax) quantization
# ---------------------------------------------------------------------------

def uniform_quantize_blocks(blocks: jax.Array, num_bits: int):
    """Per-block symmetric absmax quantization to ``2^(b-1)-1`` integer range.

    Returns (codes, absmax). Codes are int8 for b<=8 else int16
    (matches ``quantization.py:93-105``).
    """
    absmax = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1, keepdims=True), _EPS)
    maxq = 2 ** (num_bits - 1) - 1
    codes = jnp.round(blocks / absmax * maxq)
    dtype = jnp.int8 if num_bits <= 8 else jnp.int16
    return codes.astype(dtype), absmax


def uniform_dequantize_blocks(codes: jax.Array, absmax: jax.Array, num_bits: int):
    maxq = 2 ** (num_bits - 1) - 1
    return codes.astype(jnp.float32) / maxq * absmax


# ---------------------------------------------------------------------------
# NF (normal-float codebook) quantization
# ---------------------------------------------------------------------------

def nf_levels(method: str) -> jax.Array:
    if method in ("nf4", "nf4_meanstd"):
        return NF4_LEVELS_LEGACY
    if method == "nf4_true":
        return NF4_LEVELS_TRUE
    if method == "nf2":
        return NF2_LEVELS
    raise ValueError(f"unknown NF method {method!r}")


def nf_meanstd_quantize_blocks(blocks: jax.Array, levels: jax.Array):
    """Mean/std-standardized NF quantization (the reference's historical
    ``quantization_stable_nf4.py:187-224`` variant: per-block standardize by
    (mean, std) instead of absmax scaling). Returns (idx, mean, std)."""
    mean = jnp.mean(blocks, axis=1, keepdims=True)
    std = jnp.maximum(jnp.std(blocks, axis=1, keepdims=True), _EPS)
    scaled = (blocks - mean) / std
    thresholds = (levels[:-1] + levels[1:]) / 2.0
    idx = jnp.sum(scaled[..., None] > thresholds, axis=-1).astype(jnp.uint8)
    return idx, mean, std


def nf_meanstd_dequantize_blocks(idx: jax.Array, mean: jax.Array,
                                 std: jax.Array, levels: jax.Array):
    return levels[idx.astype(jnp.int32)] * std + mean


def nf_quantize_blocks(blocks: jax.Array, levels: jax.Array):
    """Absmax-scaled codebook quantization by threshold counting.

    Index = number of midpoints-between-levels that the scaled value exceeds —
    equivalent to nearest-level assignment for a sorted codebook and exactly
    the reference's loop (``quantization.py:78-83``) vectorized.
    Returns (uint8 indices, scale).
    """
    scale = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1, keepdims=True), _EPS)
    scaled = blocks / scale
    thresholds = (levels[:-1] + levels[1:]) / 2.0
    idx = jnp.sum(scaled[..., None] > thresholds, axis=-1).astype(jnp.uint8)
    return idx, scale


def nf_dequantize_blocks(idx: jax.Array, scale: jax.Array, levels: jax.Array):
    return levels[idx.astype(jnp.int32)] * scale


# ---------------------------------------------------------------------------
# Affine min/max quantization with 6-sigma outlier extraction
# (bitsandbytes-style "bbint4"/"bbint2", quantization.py:107-243)
# ---------------------------------------------------------------------------

class AffineOutlierQuant(NamedTuple):
    """Result of affine blockwise quantization with outlier extraction.

    ``codes`` are unpacked integer codes in [0, 2^b - 1] (packing to bytes is
    a separate, lossless step in ``ops.packing``). Outliers are kept as a
    dense mask + values, which is the static-shape (jit-friendly) analogue of
    the reference's sparse COO storage; ``ops.packing.mask_to_coo`` converts
    to the compact form for storage accounting.
    """

    codes: jax.Array          # (nb, bs) uint8, regular codes
    block_min: jax.Array      # (nb, 1) f32
    scales: jax.Array         # (nb, 1) f32
    outlier_mask: jax.Array   # (nb, bs) bool
    outlier_values: jax.Array  # (nb, bs) f32 (zeros where not outlier)


def affine_outlier_quantize_blocks(
    blocks: jax.Array, num_bits: int, sigma_thresh: float = 6.0
) -> AffineOutlierQuant:
    """Per-block affine quantization after removing >6-sigma outliers.

    Mirrors ``quantization.py:107-243``: outliers (|x - mean| > 6 * std, std
    with Bessel correction) are replaced by the block mean before computing
    min/max; the affine grid has ``2^b - 1`` steps; outliers are restored
    exactly at dequantization.
    """
    maxq = 2 ** num_bits - 1
    mean = jnp.mean(blocks, axis=1, keepdims=True)
    std = jnp.std(blocks, axis=1, keepdims=True, ddof=1)
    std = jnp.maximum(std, _EPS)
    mask = jnp.abs(blocks - mean) > sigma_thresh * std
    cleaned = jnp.where(mask, mean, blocks)

    bmin = jnp.min(cleaned, axis=1, keepdims=True)
    bmax = jnp.max(cleaned, axis=1, keepdims=True)
    scales = jnp.maximum((bmax - bmin) / maxq, _EPS)
    codes = jnp.clip(jnp.round((cleaned - bmin) / scales), 0, maxq)
    return AffineOutlierQuant(
        codes=codes.astype(jnp.uint8),
        block_min=bmin,
        scales=scales,
        outlier_mask=mask,
        outlier_values=jnp.where(mask, blocks, 0.0).astype(jnp.float32),
    )


def affine_outlier_dequantize_blocks(q: AffineOutlierQuant) -> jax.Array:
    dq = q.codes.astype(jnp.float32) * q.scales + q.block_min
    return jnp.where(q.outlier_mask, q.outlier_values, dq)


# ---------------------------------------------------------------------------
# Fused quantize->dequantize round trips (the decomposition hot path)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_bits", "method", "block_size"))
def quantize_dequantize(W: jax.Array, num_bits: int, method: str,
                        block_size: int) -> jax.Array:
    """One-shot quantize+dequantize of a matrix (any method).

    This is what the CALDERA inner loop calls; XLA fuses the whole thing into
    a couple of elementwise passes, so there is no reason to materialize codes.
    """
    blocks, shape = blockify(W.astype(jnp.float32), block_size)
    if method == "uniform":
        codes, absmax = uniform_quantize_blocks(blocks, num_bits)
        out = uniform_dequantize_blocks(codes, absmax, num_bits)
    elif method in ("nf4", "nf4_true", "nf2"):
        levels = nf_levels(method)
        idx, scale = nf_quantize_blocks(blocks, levels)
        out = nf_dequantize_blocks(idx, scale, levels)
    elif method == "nf4_meanstd":
        levels = nf_levels(method)
        idx, mean, std = nf_meanstd_quantize_blocks(blocks, levels)
        out = nf_meanstd_dequantize_blocks(idx, mean, std, levels)
    elif method in ("bbint4", "bbint2"):
        q = affine_outlier_quantize_blocks(blocks, num_bits)
        out = affine_outlier_dequantize_blocks(q)
    elif method == "e8p":
        from ee274_convexcaldera_llm_quantization_tpu.ops import lattice
        if num_bits != 2:
            raise ValueError("e8p is a fixed-rate 2-bit codebook")
        codes, scale = lattice.e8p_quantize_blocks(blocks)
        out = lattice.e8p_dequantize_blocks(codes, scale)
    else:
        raise ValueError(f"unknown quantization method {method!r}")
    return unblockify(out, shape)
