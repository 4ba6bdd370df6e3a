"""Perplexity evaluation harness.

Evaluates next-token negative log-likelihood over a token stream in
fixed-length windows — the standard WikiText-2/C4 protocol the reference's
README quality tables use (``README.md:355-360``; the reference repo itself
contains no perplexity code).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models import llama

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("config", "use_pallas",
                                             "interpret"))
def _window_nll(params, tokens: Array, config: ModelConfig,
                use_pallas: bool = False, interpret: bool = False):
    """Per-row NLL sums (nats) for (B, S) windows, predicting 1..S-1."""
    logits = llama.forward(params, tokens, config, use_pallas, interpret)
    logp = jax.nn.log_softmax(logits[:, :-1, :].astype(jnp.float32), axis=-1)
    targets = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll, axis=1)          # (B,)


def evaluate_perplexity(
    params,
    token_stream: np.ndarray,
    config: ModelConfig,
    window: int = 1024,
    batch_size: int = 1,
    stride: Optional[int] = None,
    use_pallas: bool = False,
    interpret: bool = False,
    mesh=None,
    batch_axis: str = "dp",
    seq_axis: Optional[str] = None,
) -> float:
    """Sliding-window perplexity over a 1-D token stream.

    Non-overlapping windows by default (``stride = window``), matching the
    common WikiText-2 protocol. The final partial batch is padded (padded
    rows are excluded from the average).

    With a ``mesh``, evaluation shards over the devices: windows are
    data-parallel over ``batch_axis`` and, when ``seq_axis`` is given, the
    sequence dimension is additionally sharded (GSPMD partitions the
    attention/matmul work along the context — the sequence-parallel eval
    story; the reference has no parallelism of any kind, SURVEY.md
    section 2.10).
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        tok_sharding = NamedSharding(mesh, P(batch_axis, seq_axis))
        if batch_size % mesh.shape[batch_axis] != 0:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by mesh axis "
                f"'{batch_axis}' of size {mesh.shape[batch_axis]}")
    else:
        tok_sharding = None
    stride = stride or window
    stream = np.asarray(token_stream).reshape(-1)
    starts = list(range(0, len(stream) - window + 1, stride))
    if not starts:
        raise ValueError(f"stream of {len(stream)} tokens shorter than "
                         f"window {window}")
    windows = np.stack([stream[s:s + window] for s in starts])
    n = len(windows)
    pad = (-n) % batch_size
    if pad:
        windows = np.concatenate([windows,
                                  np.repeat(windows[-1:], pad, axis=0)])
    total_nll, total_tok = 0.0, 0
    for i in range(0, len(windows), batch_size):
        toks = jnp.asarray(windows[i:i + batch_size], jnp.int32)
        if tok_sharding is not None:
            toks = jax.device_put(toks, tok_sharding)
        row_nll = np.asarray(_window_nll(params, toks, config, use_pallas,
                                         interpret))
        n_real = min(batch_size, n - i)
        total_nll += float(row_nll[:n_real].sum())
        total_tok += n_real * (window - 1)
    return float(np.exp(total_nll / max(total_tok, 1)))
