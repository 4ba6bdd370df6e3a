"""Hessian (input-activation second moment) calibration.

The TPU-native equivalent of the reference's forward-hook machinery
(``hook_fn`` + the calibration loop, ``main.py:72-74,276-320``): a tapped
forward pass captures the inputs of every target projection and accumulates
``sum x x^T`` (full) or ``sum x^2`` (diagonal) across batches, normalizing
**once** at the end — fixing the reference's repeated-renormalization bug
(the running sum is divided by ``idx+1`` inside the loop every iteration,
``main.py:315``).

Outputs use the ``layers.{i}.{proj}`` key schema consumed by
``models.surgery.compress_model`` and match the shipped
``diag_Hessians.pt`` semantics (diag of ``E[x x^T]`` per projection input,
SURVEY.md section 2.9).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    apply_linear)
from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    ModelParams)

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("config", "diag"))
def _tapped_forward(params: ModelParams, tokens: Array, config: ModelConfig,
                    diag: bool = True):
    """Forward pass that returns per-projection input second moments.

    Returns ``{name: (accum, count)}`` where ``accum`` is ``sum x^2`` (diag,
    shape (in,)) or ``sum x x^T`` (full, (in, in)) over all token positions
    in the batch.
    """
    B, S = tokens.shape
    x = params.embed[tokens].astype(jnp.float32)
    positions = jnp.arange(S)[None, :]
    cos, sin = llama.rope_tables(config, positions)
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    mask = jnp.where(causal, 0.0, -1e30)[None, None, None, :, :]

    stats = {}
    count = B * S

    def accumulate(name, acts):
        a = acts.reshape(-1, acts.shape[-1]).astype(jnp.float32)
        if diag:
            stats[name] = jnp.sum(a * a, axis=0)
        else:
            stats[name] = a.T @ a

    for i, lp in enumerate(params.layers):
        y = llama.rms_norm(x, lp.attn_norm, config.rms_norm_eps)
        for proj in ("q_proj", "k_proj", "v_proj"):
            accumulate(f"layers.{i}.{proj}", y)
        q = apply_linear(lp.q_proj, y).reshape(B, S, config.num_heads,
                                               config.head_dim)
        k = apply_linear(lp.k_proj, y).reshape(B, S, config.num_kv_heads,
                                               config.head_dim)
        v = apply_linear(lp.v_proj, y).reshape(B, S, config.num_kv_heads,
                                               config.head_dim)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        attn = llama._attention(q, k, v, mask).reshape(B, S, config.q_dim)
        accumulate(f"layers.{i}.o_proj", attn)
        x = x + apply_linear(lp.o_proj, attn)

        y = llama.rms_norm(x, lp.mlp_norm, config.rms_norm_eps)
        accumulate(f"layers.{i}.gate_proj", y)
        accumulate(f"layers.{i}.up_proj", y)
        gate = apply_linear(lp.gate_proj, y)
        up = apply_linear(lp.up_proj, y)
        h = jax.nn.silu(gate) * up
        accumulate(f"layers.{i}.down_proj", h)
        x = x + apply_linear(lp.down_proj, h)

    return stats, count


def collect_hessians(
    params: ModelParams,
    token_batches,
    config: ModelConfig,
    diag: bool = True,
) -> Dict[str, np.ndarray]:
    """Accumulate projection-input second moments over calibration batches.

    ``token_batches``: iterable of (B, S) int32 arrays. Returns
    ``{name: H}`` with ``H = (1/N) sum x x^T`` (or its diagonal), normalized
    exactly once over the total number of token positions.
    """
    totals: Dict[str, np.ndarray] = {}
    n_total = 0
    for tokens in token_batches:
        tokens = jnp.asarray(tokens)
        stats, count = _tapped_forward(params, tokens, config, diag)
        n_total += int(count)
        for name, acc in stats.items():
            acc = np.asarray(acc, np.float64)
            if name in totals:
                totals[name] += acc
            else:
                totals[name] = acc
    return {name: acc / max(n_total, 1) for name, acc in totals.items()}


def save_hessians(path: str, hessians: Dict[str, np.ndarray]) -> None:
    """Checkpoint the calibration artifact (npz; the reference caches a
    ``diag_Hessians.pt`` torch pickle, ``main.py:47-49``)."""
    np.savez_compressed(path, **hessians)


def load_hessians(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".pt"):
        return load_reference_hessians(path)
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def load_reference_hessians(path: str) -> Dict[str, np.ndarray]:
    """Load a reference-format ``diag_Hessians.pt`` (torch pickle of
    ``{module_path: tensor}``) and remap keys to ``layers.{i}.{proj}``.

    Only language-tower keys are kept (the reference quantizes only those,
    ``main.py:147-162``).
    """
    import torch  # local import: torch is only needed for this loader
    raw = torch.load(path, map_location="cpu", weights_only=False)
    from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
        hessian_key_map_from_reference)
    key_map = hessian_key_map_from_reference(
        [k for k in raw.keys() if "language_model" in k or
         k.startswith("model.layers")])
    return {new: np.asarray(raw[old].float().numpy(), np.float64)
            for old, new in key_map.items()}
