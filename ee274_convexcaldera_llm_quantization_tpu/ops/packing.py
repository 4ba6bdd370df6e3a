"""Bit packing / unpacking for int4 / int2 codes (XLA reference twins).

The reference packs two 4-bit codes (``quantization.py:152``) or four 2-bit
codes (``quantization.py:217-220``) per byte with the *first* code in the
high bits. We keep that byte layout (so storage accounting matches) but
implement it as vectorized shifts over the last axis, which XLA lowers to a
handful of VPU ops. The Pallas serving kernels in ``ops.kernels`` consume
the same layout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_codes(codes: jax.Array, num_bits: int) -> jax.Array:
    """Pack unsigned integer codes in [0, 2^b - 1] along the last axis.

    ``num_bits`` must be 4 or 2 (8-bit codes are stored as-is). The last axis
    length must be divisible by the pack factor ``8 // num_bits``. First code
    of each group lands in the most-significant bits, matching the reference
    byte layout.
    """
    if num_bits == 8:
        return codes.astype(jnp.uint8)
    if num_bits not in (4, 2):
        raise ValueError(f"cannot pack {num_bits}-bit codes")
    factor = 8 // num_bits
    if codes.shape[-1] % factor != 0:
        raise ValueError(
            f"last axis {codes.shape[-1]} not divisible by pack factor {factor}"
        )
    c = codes.astype(jnp.uint8)
    g = c.reshape(*c.shape[:-1], c.shape[-1] // factor, factor)
    packed = jnp.zeros(g.shape[:-1], dtype=jnp.uint8)
    for i in range(factor):
        shift = num_bits * (factor - 1 - i)
        packed = packed | (g[..., i] << shift)
    return packed


def unpack_codes(packed: jax.Array, num_bits: int) -> jax.Array:
    """Inverse of :func:`pack_codes`; returns uint8 codes."""
    if num_bits == 8:
        return packed.astype(jnp.uint8)
    if num_bits not in (4, 2):
        raise ValueError(f"cannot unpack {num_bits}-bit codes")
    factor = 8 // num_bits
    mask = (1 << num_bits) - 1
    parts = []
    for i in range(factor):
        shift = num_bits * (factor - 1 - i)
        parts.append((packed >> shift) & mask)
    out = jnp.stack(parts, axis=-1)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * factor)


def pack_signed(codes: jax.Array, num_bits: int) -> jax.Array:
    """Pack signed symmetric codes in [-(2^(b-1)-1), 2^(b-1)-1].

    Uses offset-binary (add ``2^(b-1)-1``) so the stored codes are unsigned;
    ``unpack_signed`` removes the offset. Used for the serving layout of the
    CALDERA ``Q`` component.
    """
    offset = 2 ** (num_bits - 1) - 1
    return pack_codes(codes.astype(jnp.int32) + offset, num_bits)


def unpack_signed(packed: jax.Array, num_bits: int) -> jax.Array:
    offset = 2 ** (num_bits - 1) - 1
    return unpack_codes(packed, num_bits).astype(jnp.int32) - offset


def mask_to_coo(mask: np.ndarray, values: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side conversion of a dense outlier mask to COO (indices, values).

    Storage form for the affine-outlier quantizers: the jitted path keeps a
    dense mask (static shapes), this converts to the compact representation
    for checkpointing / bit accounting.
    """
    mask = np.asarray(mask)
    values = np.asarray(values)
    idx = np.argwhere(mask)
    return idx, values[mask]


def coo_to_mask(shape: Tuple[int, ...], idx: np.ndarray,
                vals: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mask = np.zeros(shape, dtype=bool)
    values = np.zeros(shape, dtype=np.float32)
    if len(idx):
        mask[tuple(idx.T)] = True
        values[tuple(idx.T)] = vals
    return mask, values
