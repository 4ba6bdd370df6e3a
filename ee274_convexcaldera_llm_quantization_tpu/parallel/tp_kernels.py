"""Tensor-parallel wrappers for the quantized serving kernels.

GSPMD shards XLA ops automatically, but a Pallas kernel is a black box to
the partitioner — multi-chip execution wraps it in ``shard_map`` so each
device runs the kernel on its local weight shard and XLA inserts the
Megatron-style collectives around it:

- **column parallel** (q/k/v/gate/up): weights sharded on the output
  feature axis, activations replicated; each device computes its slice of
  the output, no collective needed (the consumer stays sharded).
- **row parallel** (o/down): weights sharded on the input feature axis,
  activations sharded the same way; each device computes a partial product
  over its k-range and a ``psum`` over the tp axis produces the full output.

The low-rank factors follow the same layout: column-parallel shards ``L``
by rows; row-parallel shards ``R`` by columns with the rank dim replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as K


def column_parallel_w4a8(
    mesh: Mesh,
    num_bits: int,
    axis: str = "tp",
    interpret: bool = False,
):
    """Returns ``f(x, packed, row_scales) -> y`` with N sharded over ``axis``.

    ``x`` replicated (B, K); ``packed`` (N, K/f) sharded on N;
    output (B, N) sharded on N.
    """
    def local(x, packed, scales):
        return K.quantized_matmul_w4a8(x, packed, scales, num_bits,
                                       interpret=interpret)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P(axis, None)),
        out_specs=P(None, axis),
        check_vma=False,
    )


def pack_rowscale_sharded(W: jax.Array, num_bits: int, shards: int):
    """Row-parallel packing: quantize/pack each k-shard independently.

    The global-plane byte layout spans a whole row, so a plain slice of the
    packed axis scrambles k-order — shards must be packed locally. Each
    shard gets its own per-row scale (at least as accurate as one global
    row scale). Returns ``(packed (N, K/f), shard_scales (N, shards))``
    where byte-range ``s`` holds shard ``s``'s local plane packing.
    """
    N, Kdim = W.shape
    if Kdim % shards:
        raise ValueError(f"K={Kdim} not divisible by {shards} shards")
    ks = Kdim // shards
    packs, scales = [], []
    for s in range(shards):
        p, sc = K.pack_rowscale(W[:, s * ks:(s + 1) * ks], num_bits)
        packs.append(p)
        scales.append(sc)
    return jnp.concatenate(packs, axis=1), jnp.concatenate(scales, axis=1)


def row_parallel_w4a8(
    mesh: Mesh,
    num_bits: int,
    axis: str = "tp",
    interpret: bool = False,
):
    """Returns ``f(x, packed, shard_scales) -> y`` with K sharded over ``axis``.

    Weights must come from :func:`pack_rowscale_sharded` with the mesh's tp
    size. ``x`` (B, K) sharded on K; each shard computes a partial (B, N)
    product with its local scales and a ``psum`` over ``axis`` completes
    the contraction. Per-shard activation quantization uses the local
    absmax — rounding differs from single-device at the int8 step level.
    """
    def local(x, packed, scales):
        partial = K.quantized_matmul_w4a8(x, packed, scales, num_bits,
                                          interpret=interpret)
        return jax.lax.psum(partial, axis)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, None),
        check_vma=False,
    )


def shard_caldera_linear_column(lin, mesh: Mesh, axis: str = "tp"):
    """Place a w4a8 CalderaLinear with output features sharded."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))
    return lin.__class__(
        packed=put(lin.packed, P(axis, None)),
        scales=put(lin.scales, P(axis, None)),
        L=put(lin.L, P(axis, None)),
        R=put(lin.R, P(None, None)),
        global_scale=put(lin.global_scale, P()),
        b=put(lin.b, P(axis)) if lin.b is not None else None,
        num_bits=lin.num_bits, group_size=lin.group_size,
        out_features=lin.out_features, in_features=lin.in_features,
        mode=lin.mode)


def shard_caldera_linear_row(lin, mesh: Mesh, axis: str = "tp"):
    """Place a w4a8 CalderaLinear with input features sharded."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))
    return lin.__class__(
        packed=put(lin.packed, P(None, axis)),
        scales=put(lin.scales, P(None, None)),
        L=put(lin.L, P(None, None)),
        R=put(lin.R, P(None, axis)),
        global_scale=put(lin.global_scale, P()),
        b=put(lin.b, P(None)) if lin.b is not None else None,
        num_bits=lin.num_bits, group_size=lin.group_size,
        out_features=lin.out_features, in_features=lin.in_features,
        mode=lin.mode)
