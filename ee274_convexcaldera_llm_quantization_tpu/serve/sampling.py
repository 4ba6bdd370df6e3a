"""Batched token sampling: greedy / temperature / top-k / top-p.

The reference generates strictly greedily through HF ``model.generate``
(`main.py:358`, ``do_sample`` never enabled); a serving engine needs the
standard sampling controls. One jitted call handles a whole batch with
**per-row** settings (continuous batching mixes requests with different
temperatures/filters in one decode step):

- ``temperature <= 0`` → greedy (argmax) for that row;
- ``top_k > 0`` keeps the k highest-probability tokens (ties at the
  threshold are all kept, the usual convention);
- ``top_p < 1`` keeps the smallest prefix of the probability-sorted
  vocabulary whose *exclusive* cumulative mass is below ``top_p`` (the
  highest-probability token is always kept).

Filters compose (top-k first is a no-op ordering: both reduce to a
per-row logit threshold applied to the temperature-scaled logits). The
whole computation is one sort + elementwise ops — no host round trips
in the decode loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = jnp.float32(-1e30)


def filter_logits(logits: Array, temperature: Array, top_k: Array,
                  top_p: Array) -> Array:
    """Temperature-scale and top-k/top-p-filter logits per row.

    ``logits`` (B, V) float; ``temperature``/``top_p`` (B,) float32;
    ``top_k`` (B,) int32 (0 disables). Returns (B, V) float32 filtered
    logits (dropped entries at -1e30) whose softmax is the sampling
    distribution. Shared by :func:`sample_logits` and speculative
    decoding's rejection sampler (which must evaluate the *identical*
    distribution for draft and target).
    """
    logits = logits.astype(jnp.float32)
    B, V = logits.shape
    temperature = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (B,))
    top_k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (B,))
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (B,))

    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    sorted_desc = -jnp.sort(-scaled, axis=-1)          # (B, V) descending

    # top-k -> per-row value threshold (k-th largest scaled logit)
    k = jnp.clip(jnp.where(top_k <= 0, V, top_k), 1, V)
    thr_k = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)

    # top-p -> smallest kept value in the sorted prefix whose exclusive
    # cumulative probability stays below p (row head always kept)
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum_excl = jnp.cumsum(probs, axis=-1) - probs
    keep_sorted = cum_excl < jnp.maximum(top_p, 1e-6)[:, None]
    thr_p = jnp.min(jnp.where(keep_sorted, sorted_desc, jnp.inf),
                    axis=-1, keepdims=True)

    keep = (scaled >= thr_k) & (scaled >= thr_p)
    return jnp.where(keep, scaled, _NEG_INF)


@jax.jit
def sample_logits(key: Array, logits: Array, temperature: Array,
                  top_k: Array, top_p: Array) -> Array:
    """Sample one token per row. ``logits`` (B, V) float; ``temperature``
    and ``top_p`` (B,) float32; ``top_k`` (B,) int32 (0 disables).

    Returns (B,) int32 token ids.
    """
    logits = logits.astype(jnp.float32)
    B = logits.shape[0]
    temperature = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (B,))
    filtered = filter_logits(logits, temperature, top_k, top_p)
    sampled = jax.random.categorical(key, filtered, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)
