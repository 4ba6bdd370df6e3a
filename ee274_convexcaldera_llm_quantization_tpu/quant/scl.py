"""SCL classical quantization baselines: scalar uniform, Lloyd-Max, K-means
vector quantization.

TPU-native re-implementation of the reference baselines
(``src/caldera/utils/scl_baselines.py``): the reference runs Lloyd-Max and
K-means as host NumPy loops with full pairwise distance matrices
(``scl_baselines.py:143-155,222-250``); here both are jitted
``lax.while_loop`` fixed-point iterations with static shapes and no host
round trips. Assignment uses an argmin over the codebook axis — O(n * 2^b)
on the VPU — and centroid updates are segment means via one-hot matmuls,
which XLA maps onto the MXU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SCLQuantizationParams:
    """Parameters (reference ``SCLQuantizationParams``,
    ``scl_baselines.py:17-44``)."""

    num_bits: int = 2
    method: str = "scalar"          # "scalar" | "lloyd_max" | "vector"
    vector_dim: int = 1
    max_iterations: int = 100
    tolerance: float = 1e-6
    random_seed: int = 42
    distortion_metric: str = "mse"  # "mse" | "mae"


@dataclasses.dataclass
class SCLQuantizationResult:
    """Result (reference ``SCLQuantizationResult``, ``scl_baselines.py:47-63``)."""

    quantized: Array
    codebook: Array
    indices: Optional[Array]
    rate: float
    distortion: float
    compression_ratio: float
    num_codebook_entries: int
    method: str


# ---------------------------------------------------------------------------
# Scalar uniform
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_bits",))
def scalar_quantize_uniform(data: Array, num_bits: int):
    """Min/max range uniform quantization (ref ``scl_baselines.py:66-112``).

    Returns (quantized, codebook, indices).
    """
    data = data.astype(jnp.float32)
    lo = jnp.min(data)
    hi = jnp.max(data)
    levels = 2 ** num_bits
    step = jnp.maximum((hi - lo) / (levels - 1), 1e-12)
    idx = jnp.clip(jnp.round((data - lo) / step), 0, levels - 1).astype(
        jnp.int32)
    codebook = lo + step * jnp.arange(levels, dtype=jnp.float32)
    return codebook[idx], codebook, idx


# ---------------------------------------------------------------------------
# Lloyd-Max (optimal scalar MSE quantizer)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_bits", "max_iterations"))
def lloyd_max(data: Array, num_bits: int, max_iterations: int = 100,
              tolerance: float = 1e-6):
    """Lloyd-Max fixed point as a jitted ``lax.while_loop``.

    Same math as the reference (``scl_baselines.py:115-188``): nearest-level
    assignment, centroid = conditional mean (empty cells keep their level),
    stop when the distortion delta falls below ``tolerance``. Uniform
    initialization over [min, max].
    """
    flat = data.reshape(-1).astype(jnp.float32)
    levels = 2 ** num_bits
    codebook0 = jnp.linspace(jnp.min(flat), jnp.max(flat), levels)

    def assign(codebook):
        return jnp.argmin(jnp.abs(flat[:, None] - codebook[None, :]), axis=1)

    def update(codebook):
        idx = assign(codebook)
        onehot = jax.nn.one_hot(idx, levels, dtype=jnp.float32)
        counts = onehot.sum(axis=0)
        sums = onehot.T @ flat
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), codebook)
        dist = jnp.mean((flat - new[idx]) ** 2)
        return new, dist

    def cond(state):
        _, prev_dist, dist, it = state
        return jnp.logical_and(it < max_iterations,
                               jnp.abs(prev_dist - dist) >= tolerance)

    def body(state):
        codebook, _, dist, it = state
        new, new_dist = update(codebook)
        return new, dist, new_dist, it + 1

    cb, d0 = update(codebook0)
    state = (cb, jnp.asarray(jnp.inf, jnp.float32), d0, jnp.asarray(1))
    codebook, _, distortion, _ = jax.lax.while_loop(cond, body, state)

    idx = assign(codebook)
    quantized = codebook[idx].reshape(data.shape)
    return quantized, codebook, idx.reshape(data.shape), distortion


# ---------------------------------------------------------------------------
# K-means vector quantization (generalized Lloyd)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("num_bits", "vector_dim", "max_iterations", "seed"))
def kmeans_vq(data: Array, num_bits: int, vector_dim: int = 2,
              max_iterations: int = 100, tolerance: float = 1e-6,
              seed: int = 42):
    """K-means VQ as a jitted fixed point (ref ``scl_baselines.py:191-284``).

    Data is zero-padded to a multiple of ``vector_dim`` and reshaped to
    vectors; ``2^b`` centroids are initialized from a random subset.
    Distances are computed with the ``||x||^2 - 2 x.c + ||c||^2`` expansion
    (one MXU matmul) instead of the reference's O(n * k * d) broadcast
    tensor. Returns (quantized, codebook, indices, distortion).
    """
    flat = data.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    pad = (-n) % vector_dim
    if pad:
        flat = jnp.pad(flat, (0, pad))
    vecs = flat.reshape(-1, vector_dim)
    num_vecs = vecs.shape[0]
    k = min(2 ** num_bits, num_vecs)

    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, num_vecs, (k,), replace=False)
    centroids0 = vecs[init_idx]

    v_sq = jnp.sum(vecs * vecs, axis=1, keepdims=True)

    def assign(centroids):
        c_sq = jnp.sum(centroids * centroids, axis=1)[None, :]
        d = v_sq - 2.0 * vecs @ centroids.T + c_sq
        return jnp.argmin(d, axis=1)

    def update(centroids):
        idx = assign(centroids)
        onehot = jax.nn.one_hot(idx, k, dtype=jnp.float32)
        counts = onehot.sum(axis=0)[:, None]
        sums = onehot.T @ vecs
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0),
                        centroids)
        dist = jnp.mean((vecs - new[idx]) ** 2)
        return new, dist

    def cond(state):
        _, prev, dist, it = state
        return jnp.logical_and(it < max_iterations,
                               jnp.abs(prev - dist) >= tolerance)

    def body(state):
        centroids, _, dist, it = state
        new, new_dist = update(centroids)
        return new, dist, new_dist, it + 1

    cb, d0 = update(centroids0)
    state = (cb, jnp.asarray(jnp.inf, jnp.float32), d0, jnp.asarray(1))
    centroids, _, distortion, _ = jax.lax.while_loop(cond, body, state)

    idx = assign(centroids)
    quant_flat = centroids[idx].reshape(-1)[:n]
    return quant_flat.reshape(data.shape), centroids, idx, distortion


# ---------------------------------------------------------------------------
# Dispatcher + model application (reference scl_quantize /
# apply_scl_baseline_to_model, scl_baselines.py:311-432)
# ---------------------------------------------------------------------------

def compute_distortion(original: Array, quantized: Array,
                       metric: str = "mse") -> float:
    if metric == "mse":
        return float(jnp.mean((original - quantized) ** 2))
    if metric == "mae":
        return float(jnp.mean(jnp.abs(original - quantized)))
    raise ValueError(f"unknown metric {metric!r}")


def scl_quantize(data: Array,
                 params: Optional[SCLQuantizationParams] = None
                 ) -> SCLQuantizationResult:
    """Dispatch to the configured baseline and compute rate/distortion/ratio
    (reference ``scl_quantize``, ``scl_baselines.py:311-390``)."""
    if params is None:
        params = SCLQuantizationParams()
    data = jnp.asarray(data)

    if params.method == "scalar":
        quantized, codebook, indices = scalar_quantize_uniform(
            data, params.num_bits)
        distortion = compute_distortion(data, quantized,
                                        params.distortion_metric)
    elif params.method == "lloyd_max":
        quantized, codebook, indices, dist = lloyd_max(
            data, params.num_bits, params.max_iterations, params.tolerance)
        distortion = float(dist)
    elif params.method == "vector":
        quantized, codebook, indices, dist = kmeans_vq(
            data, params.num_bits, params.vector_dim, params.max_iterations,
            params.tolerance, params.random_seed)
        distortion = float(dist)
    else:
        raise ValueError(f"unknown method {params.method!r}")

    n_entries = int(codebook.shape[0])
    if params.method == "vector":
        rate = float(np.log2(n_entries) / params.vector_dim)
    else:
        rate = float(np.log2(n_entries))
    original_bits = data.size * 16  # FP16 baseline, as in the reference
    compressed_bits = data.size * rate
    ratio = original_bits / compressed_bits if compressed_bits > 0 else 0.0

    return SCLQuantizationResult(
        quantized=quantized, codebook=codebook, indices=indices, rate=rate,
        distortion=distortion, compression_ratio=ratio,
        num_codebook_entries=n_entries, method=params.method)


def apply_scl_baseline_to_params(params_tree, layer_names=None,
                                 scl_params: Optional[SCLQuantizationParams] = None):
    """Quantize every 2-D weight in a parameter pytree in place-functionally.

    The JAX analogue of the reference's module-walking
    ``apply_scl_baseline_to_model`` (``scl_baselines.py:393-432``): returns
    (new_params_tree, {path: SCLQuantizationResult}).
    """
    results = {}
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_tree)
    new_leaves = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        if (hasattr(leaf, "ndim") and leaf.ndim == 2
                and (layer_names is None or name in layer_names)):
            res = scl_quantize(leaf, scl_params)
            results[name] = res
            new_leaves.append(res.quantized.astype(leaf.dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), results
