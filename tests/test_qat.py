"""QAT: straight-through estimator, lossless prepare/finalize round trip,
and loss reduction under fine-tuning."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import llama, qat, train
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, QATLinear, apply_linear, compress_linear, ste_quantize)
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)


@pytest.fixture(scope="module")
def compressed_model():
    params = llama.init_params(jax.random.PRNGKey(0), TINY)
    cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=8, iters=1,
                       lplr_iters=1)
    qparams, _ = compress_model(params, cp)
    return qparams


class TestSTE:
    def test_forward_is_quantized_grid(self):
        W = jax.random.normal(jax.random.PRNGKey(1), (8, 32), jnp.float32)
        q = ste_quantize(W, 4)
        maxq = 7
        scale = np.abs(np.asarray(W)).max(axis=1, keepdims=True) / maxq
        codes = np.asarray(q) / scale
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-5)
        assert np.abs(codes).max() <= maxq + 1e-5

    def test_gradient_is_identity(self):
        W = jax.random.normal(jax.random.PRNGKey(2), (4, 16), jnp.float32)
        g = jax.grad(lambda w: jnp.sum(ste_quantize(w, 4) * 3.0))(W)
        np.testing.assert_allclose(np.asarray(g), 3.0, rtol=1e-6)

    def test_grouped_matches_pack_for_serving(self):
        from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as K
        W = jax.random.normal(jax.random.PRNGKey(3), (8, 64), jnp.float32)
        q = ste_quantize(W, 4, group_size=16)
        packed, scales = K.pack_for_serving(W, 4, group_size=16)
        deq = K.dequant_serving_xla(packed, scales, 4, 16).astype(jnp.float32)
        # dequant_serving_xla returns bf16 (~8-bit mantissa)
        np.testing.assert_allclose(np.asarray(q), np.asarray(deq),
                                   rtol=1e-2, atol=1e-2)

    def test_idempotent_on_grid_points(self):
        W = jax.random.normal(jax.random.PRNGKey(4), (8, 32), jnp.float32)
        q1 = ste_quantize(W, 4)
        q2 = ste_quantize(q1, 4)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-6)


class TestRoundTrip:
    @pytest.mark.parametrize("mode", ["w4a8", "grouped"])
    def test_prepare_finalize_reproduces_codes(self, mode):
        W = jax.random.normal(jax.random.PRNGKey(5), (16, 64), jnp.float32)
        Wq = ste_quantize(W, 4, group_size=None if mode == "w4a8" else 16)
        L = jax.random.normal(jax.random.PRNGKey(6), (16, 4)) * 0.02
        R = jax.random.normal(jax.random.PRNGKey(7), (4, 64)) * 0.02
        lin = compress_linear(Wq, L, R, 4, group_size=None
                              if mode == "w4a8" else 16, mode=mode)
        back = qat.finalize_qat_linear(qat.prepare_qat_linear(lin))
        np.testing.assert_array_equal(np.asarray(lin.packed),
                                      np.asarray(back.packed))
        np.testing.assert_allclose(np.asarray(lin.scales),
                                   np.asarray(back.scales), rtol=1e-6)

    def test_model_roundtrip_forward_identical(self, compressed_model):
        toks = jax.random.randint(jax.random.PRNGKey(8), (1, 8), 0,
                                  TINY.vocab_size)
        ref = llama.forward(compressed_model, toks, TINY)
        back = qat.finalize_qat_model(qat.prepare_qat_model(compressed_model))
        out = llama.forward(back, toks, TINY)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_qat_forward_close_to_packed_forward(self, compressed_model):
        toks = jax.random.randint(jax.random.PRNGKey(9), (1, 8), 0,
                                  TINY.vocab_size)
        ref = llama.forward(compressed_model, toks, TINY)
        qp = qat.prepare_qat_model(compressed_model)
        out = llama.forward(qp, toks, TINY)
        rel = (np.linalg.norm(np.asarray(out - ref))
               / np.linalg.norm(np.asarray(ref)))
        assert rel < 0.01   # bf16 factor cast in the packed path


class TestQATTraining:
    def test_finetune_reduces_loss(self, compressed_model):
        tokens = jax.random.randint(jax.random.PRNGKey(10), (4, 16), 0,
                                    TINY.vocab_size)
        qp = qat.prepare_qat_model(compressed_model)
        opt = qat.make_qat_optimizer(1e-3)
        state = opt.init(qp)
        losses = []
        for _ in range(8):
            qp, state, loss = train.train_step(qp, state, tokens, TINY, opt)
            losses.append(float(loss))
        assert losses[-1] < losses[0] - 0.05, losses
        # latent weights moved but stay finite
        lin = qp.layers[0].q_proj
        assert isinstance(lin, QATLinear)
        assert np.isfinite(np.asarray(lin.Wq)).all()

    def test_global_scale_frozen(self, compressed_model):
        tokens = jax.random.randint(jax.random.PRNGKey(11), (2, 8), 0,
                                    TINY.vocab_size)
        qp = qat.prepare_qat_model(compressed_model)
        gs0 = float(qp.layers[0].q_proj.global_scale)
        opt = qat.make_qat_optimizer(1e-3)
        state = opt.init(qp)
        for _ in range(3):
            qp, state, _ = train.train_step(qp, state, tokens, TINY, opt)
        assert float(qp.layers[0].q_proj.global_scale) == gs0

    def test_qat_finetune_end_to_end(self, compressed_model):
        tokens = jax.random.randint(jax.random.PRNGKey(12), (2, 12), 0,
                                    TINY.vocab_size)
        packed, losses = qat.qat_finetune(compressed_model, tokens, TINY,
                                          steps=4, lr=1e-3)
        assert len(losses) == 4 and losses[-1] < losses[0]
        assert isinstance(packed.layers[0].q_proj, CalderaLinear)
        out = llama.forward(packed, tokens, TINY)
        assert np.isfinite(np.asarray(out)).all()