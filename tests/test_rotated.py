"""Servable Hadamard-rotated serving: forward equivalence, incoherence
quality benefit at 2-bit, and whole-model surgery integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    RotatedLinear, apply_linear, compress_linear)
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_linear_rotated, compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as K


class TestRotatedLinear:
    @pytest.mark.parametrize("rot_in,rot_out", [(True, True), (True, False),
                                                (False, True)])
    def test_apply_matches_materialized_dense(self, rot_in, rot_out):
        Wq = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
        L = jax.random.normal(jax.random.PRNGKey(1), (64, 8)) * 0.02
        R = jax.random.normal(jax.random.PRNGKey(2), (8, 128)) * 0.02
        b = jax.random.normal(jax.random.PRNGKey(3), (64,)) * 0.1
        inner = compress_linear(Wq, L, R, 4, group_size=32)
        rl = RotatedLinear(inner=inner, b=b, rot_in=rot_in, rot_out=rot_out)
        x = jax.random.normal(jax.random.PRNGKey(4), (5, 128), jnp.float32)
        y = apply_linear(rl, x)
        W = rl.materialize()
        ref = x @ W.T + b[None, :]
        rel = (np.linalg.norm(np.asarray(y - ref))
               / np.linalg.norm(np.asarray(ref)))
        assert rel < 0.01   # bf16 matmul floor

    def test_rotation_is_involution(self):
        # materialize of a both-sides rotation undoes the weight rotation
        W = jax.random.normal(jax.random.PRNGKey(5), (32, 64), jnp.float32)
        Wr = K.fwht(K.fwht(W, axis=0), axis=1) / jnp.sqrt(
            jnp.float32(32 * 64))
        back = K.fwht(K.fwht(Wr, axis=0), axis=1) / jnp.sqrt(
            jnp.float32(32 * 64))
        np.testing.assert_allclose(np.asarray(back), np.asarray(W),
                                   rtol=1e-5, atol=1e-6)


class TestRotatedQuality:
    def test_rotated_pipeline_exact_at_8bit(self):
        # 8-bit leaves ~no quantization error: the full rotate -> decompose
        # -> pack -> runtime-rotate round trip must reproduce W
        W = jax.random.normal(jax.random.PRNGKey(6), (128, 128), jnp.float32)
        cp = CalderaParams(Q_bits=8, L_bits=16, R_bits=16, rank=8, iters=1,
                           lplr_iters=1)
        rl, err = compress_linear_rotated(cp, W, serving_bits=8)
        assert err < 0.02, err

    def test_rotation_error_comparable_to_plain(self):
        # Measured finding (PERFORMANCE.md): with absmax-uniform serving
        # quantizers and an activation-aware solver, incoherence rotation
        # does NOT reduce error (it pairs with codebook/lattice quantizers
        # a la QuIP#). Regression guard: the rotated path must stay within
        # 2x of the plain path, not that it beats it.
        W = jax.random.normal(jax.random.PRNGKey(7), (128, 128), jnp.float32)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=8, iters=2,
                           lplr_iters=2)
        rl, err_rot = compress_linear_rotated(cp, W, serving_bits=4)
        from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
            caldera)
        dec = caldera(cp, W, scale_W=False)
        plain = compress_linear(W / dec.global_scale - dec.L @ dec.R,
                                dec.L, dec.R, 4,
                                global_scale=float(dec.global_scale))
        err_plain = float(jnp.linalg.norm(plain.materialize() - W)
                          / jnp.linalg.norm(W))
        assert err_rot < 2 * err_plain, (err_rot, err_plain)

    def test_non_pow2_sides_skip_rotation(self):
        W = jax.random.normal(jax.random.PRNGKey(8), (96, 64), jnp.float32)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        rl, err = compress_linear_rotated(cp, W)
        assert rl.rot_out is False and rl.rot_in is True
        assert err < 0.2


class TestRotatedModel:
    def test_compress_model_servable_hadamard(self):
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=8, iters=1,
                           lplr_iters=1)
        qp, report = compress_model(params, cp, use_hadamard="servable")
        assert report.compressed          # something got compressed
        assert isinstance(qp.layers[0].q_proj, RotatedLinear)
        # intermediate (256) and hidden (128) are pow2 in TINY: all rotated
        assert qp.layers[0].q_proj.rot_in and qp.layers[0].q_proj.rot_out
        toks = jax.random.randint(jax.random.PRNGKey(9), (1, 8), 0,
                                  TINY.vocab_size)
        ref = llama.forward(params, toks, TINY)
        out = llama.forward(qp, toks, TINY)
        rel = (np.linalg.norm(np.asarray(out - ref))
               / np.linalg.norm(np.asarray(ref)))
        assert np.isfinite(np.asarray(out)).all()
        assert rel < 0.75    # 4-bit rank-8 on random weights

    def test_rotated_engine_generation(self):
        from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
            Request, ServingEngine)
        params = llama.init_params(jax.random.PRNGKey(1), TINY)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=8, iters=1,
                           lplr_iters=1)
        qp, _ = compress_model(params, cp, use_hadamard="servable")
        eng = ServingEngine(qp, TINY, max_slots=2, max_seq_len=32,
                            use_pallas=False)
        rng = np.random.default_rng(3)
        for uid in range(2):
            eng.submit(Request(uid=uid,
                               prompt=rng.integers(0, 256, size=5),
                               max_new_tokens=4))
        done = eng.run()
        assert sorted(c.uid for c in done) == [0, 1]
        assert all(len(c.tokens) == 4 for c in done)