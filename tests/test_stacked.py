"""Scan-over-stacked-layers execution must match the unrolled model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import llama, stacked
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)


@pytest.fixture(scope="module")
def tiny_model():
    return llama.init_params(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def tiny_compressed(tiny_model):
    cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=8, iters=1,
                       lplr_iters=1)
    qparams, _ = compress_model(tiny_model, cp)
    return qparams


class TestStacked:
    def test_forward_matches_unrolled_dense(self, tiny_model):
        sp = stacked.stack_layers(tiny_model)
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                                  TINY.vocab_size)
        a = np.asarray(llama.forward(tiny_model, toks, TINY))
        b = np.asarray(stacked.forward(sp, toks, TINY))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_forward_matches_unrolled_compressed(self, tiny_compressed):
        sp = stacked.stack_layers(tiny_compressed)
        toks = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0,
                                  TINY.vocab_size)
        a = np.asarray(llama.forward(tiny_compressed, toks, TINY))
        b = np.asarray(stacked.forward(sp, toks, TINY))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_decode_matches_unrolled(self, tiny_model):
        sp = stacked.stack_layers(tiny_model)
        cache_a = llama.KVCache.create(TINY, 2, 16)
        cache_b = llama.KVCache.create(TINY, 2, 16)
        toks = jax.random.randint(jax.random.PRNGKey(3), (2,), 0,
                                  TINY.vocab_size)
        pos = jnp.asarray([3, 5], jnp.int32)
        la, cache_a = llama.decode_step_batched(tiny_model, toks, pos,
                                                cache_a, TINY)
        lb, cache_b = stacked.decode_step_batched(sp, toks, pos, cache_b,
                                                  TINY)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cache_a.k),
                                   np.asarray(cache_b.k), atol=1e-6)

    def test_prefill_matches_unrolled(self, tiny_model):
        sp = stacked.stack_layers(tiny_model)
        toks = jax.random.randint(jax.random.PRNGKey(4), (2, 6), 0,
                                  TINY.vocab_size)
        cache_a = llama.KVCache.create(TINY, 2, 16)
        cache_b = llama.KVCache.create(TINY, 2, 16)
        la, _ = llama.prefill(tiny_model, toks, cache_a, TINY)
        lb, _ = stacked.prefill(sp, toks, cache_b, TINY)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4, atol=1e-4)

    def test_heterogeneous_rejected(self, tiny_model, tiny_compressed):
        mixed = llama.ModelParams(
            embed=tiny_model.embed,
            layers=[tiny_model.layers[0], tiny_compressed.layers[1]],
            final_norm=tiny_model.final_norm,
            lm_head=tiny_model.lm_head)
        with pytest.raises(ValueError):
            stacked.stack_layers(mixed)
