"""int8 low-rank factors and int8 lm_head: container round-trips and
decode-path equivalence within int8 rounding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import (
    fused, llama, stacked)
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, DenseLinear, Int8Linear, apply_linear, compress_linear,
    quantize_factors_int8, quantize_linear_int8)
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as K

RNG = np.random.default_rng(7)


def rand(n, k, scale=0.1):
    return jnp.asarray(RNG.normal(size=(n, k)).astype(np.float32) * scale)


class TestInt8Linear:
    def test_quantize_and_apply(self):
        lin = DenseLinear(w=rand(128, 256))
        q = quantize_linear_int8(lin)
        assert q.w8.dtype == jnp.int8
        x = rand(4, 256, scale=1.0)
        y = apply_linear(q, x)
        y_ref = apply_linear(lin, x)
        rel = (np.linalg.norm(np.asarray(y - y_ref))
               / np.linalg.norm(np.asarray(y_ref)))
        assert rel < 0.03

    def test_pallas_matches_xla(self):
        lin = quantize_linear_int8(DenseLinear(w=rand(128, 256)))
        x = rand(4, 256, scale=1.0)
        y_p = apply_linear(lin, x, use_pallas=True, interpret=True)
        y_x = apply_linear(lin, x, use_pallas=False)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                   rtol=1e-5, atol=1e-6)

    def test_materialize(self):
        W = rand(64, 128)
        q = quantize_linear_int8(DenseLinear(w=W))
        rel = (np.linalg.norm(np.asarray(q.materialize() - W))
               / np.linalg.norm(np.asarray(W)))
        assert rel < 0.01


class TestInt8Factors:
    def test_factors_roundtrip(self):
        W = rand(128, 256)
        L, R = rand(128, 16), rand(16, 256)
        lin = compress_linear(W, L, R, 4, mode="w4a8")
        lin8 = quantize_factors_int8(lin)
        assert lin8.L.dtype == jnp.int8 and lin8.R.dtype == jnp.int8
        L2, R2 = lin8.factors()
        rel = (np.linalg.norm(np.asarray(L2, np.float32)
                              - np.asarray(L, np.float32))
               / np.linalg.norm(np.asarray(L)))
        assert rel < 0.02   # int8 + bf16 rounding
        # idempotent
        assert quantize_factors_int8(lin8) is lin8

    def test_apply_linear_int8_factors(self):
        W = rand(128, 256)
        L, R = rand(128, 16), rand(16, 256)
        for mode in ("w4a8", "grouped"):
            lin = compress_linear(W, L, R, 4, mode=mode)
            lin8 = quantize_factors_int8(lin)
            x = rand(4, 256, scale=1.0)
            y = apply_linear(lin8, x)
            y_ref = apply_linear(lin, x)
            rel = (np.linalg.norm(np.asarray(y - y_ref))
                   / np.linalg.norm(np.asarray(y_ref)))
            assert rel < 0.02, mode

    def test_low_rank_matmul_scales(self):
        x = rand(4, 64, scale=1.0)
        L, R = rand(32, 8), rand(8, 64)
        y_ref = K.low_rank_matmul(x, L, R)
        L8, Ls = K.quantize_int8_rowwise(L)
        R8, Rs = K.quantize_int8_rowwise(R)
        y8 = K.low_rank_matmul(x, L8, R8, Ls, Rs)
        rel = (np.linalg.norm(np.asarray(y8 - y_ref))
               / np.linalg.norm(np.asarray(y_ref)))
        assert rel < 0.02


@pytest.fixture(scope="module")
def w4a8_stacked():
    params = llama.init_params(jax.random.PRNGKey(0), TINY)
    cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=8, iters=1,
                       lplr_iters=1)
    qparams, _ = compress_model(params, cp)

    def convert(lp):
        fields = {}
        for name in llama.LayerParams._fields:
            lin = getattr(lp, name)
            if isinstance(lin, CalderaLinear):
                W = (lin.materialize() / lin.global_scale
                     - lin.L.astype(jnp.float32) @ lin.R.astype(jnp.float32))
                fields[name] = compress_linear(
                    W, lin.L.astype(jnp.float32), lin.R.astype(jnp.float32),
                    lin.num_bits, global_scale=float(lin.global_scale),
                    bias=lin.b, mode="w4a8")
            else:
                fields[name] = lin
        return llama.LayerParams(**fields)

    model = llama.ModelParams(embed=qparams.embed,
                              layers=[convert(lp) for lp in qparams.layers],
                              final_norm=qparams.final_norm,
                              lm_head=qparams.lm_head)
    return stacked.stack_layers(model)


class TestModelInt8Factors:
    def test_stacked_decode_close(self, w4a8_stacked):
        sp8 = stacked.quantize_model_factors_int8(w4a8_stacked)
        assert isinstance(sp8.lm_head, Int8Linear)
        toks = jax.random.randint(jax.random.PRNGKey(3), (2,), 0,
                                  TINY.vocab_size)
        pos = jnp.asarray([3, 5], jnp.int32)
        ca = llama.KVCache.create(TINY, 2, 16)
        cb = llama.KVCache.create(TINY, 2, 16)
        la, _ = stacked.decode_step_w4a8(w4a8_stacked, toks, pos, ca, TINY,
                                         interpret=True)
        lb, _ = stacked.decode_step_w4a8(sp8, toks, pos, cb, TINY,
                                         interpret=True)
        rel = (np.linalg.norm(np.asarray(lb - la))
               / np.linalg.norm(np.asarray(la)))
        assert rel < 0.1    # int8 factors + int8 head through a random TINY

    def test_fused_decode_close(self, w4a8_stacked):
        fp = fused.fuse_stacked(w4a8_stacked)
        fp8 = fused.quantize_factors_int8_fused(fp)
        assert fp8.layers.qkv.R.dtype == jnp.int8
        assert fp8.layers.qkv.L_scales is not None
        toks = jax.random.randint(jax.random.PRNGKey(3), (2,), 0,
                                  TINY.vocab_size)
        pos = jnp.asarray([3, 5], jnp.int32)
        ca = llama.KVCache.create(TINY, 2, 16)
        cb = llama.KVCache.create(TINY, 2, 16)
        la, _ = fused.decode_step_fused(fp, toks, pos, ca, TINY,
                                        interpret=True)
        lb, _ = fused.decode_step_fused(fp8, toks, pos, cb, TINY,
                                        interpret=True)
        rel = (np.linalg.norm(np.asarray(lb - la))
               / np.linalg.norm(np.asarray(la)))
        assert rel < 0.1

    def test_fuse_after_int8_dequantizes(self, w4a8_stacked):
        # int8-factor stacked params can be fused (factors dequantized)
        sp8 = stacked.quantize_model_factors_int8(w4a8_stacked,
                                                  lm_head_int8=False)
        fp = fused.fuse_stacked(sp8)
        assert fp.layers.qkv.R.dtype == jnp.bfloat16
