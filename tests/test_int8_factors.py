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


class TestFusedFactorKernelPath:
    """A config wide enough (rank 128, all N_i multiples of 128) takes the
    single-kernel fused-factor path (``FusedW4A8Linear.L_cat``); its decode
    must match the unfused stacked int8-factor path (same factor
    quantization, different fusion)."""

    def _wide(self):
        from ee274_convexcaldera_llm_quantization_tpu.models.config import (
            ModelConfig)
        cfg = ModelConfig(vocab_size=128, hidden_size=256,
                          intermediate_size=384, num_layers=2, num_heads=2,
                          num_kv_heads=2, head_dim=128, max_seq_len=32)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=128,
                           iters=1, lplr_iters=1)
        qparams, _ = compress_model(params, cp)

        def convert(lp):
            fields = {}
            for name in llama.LayerParams._fields:
                lin = getattr(lp, name)
                if isinstance(lin, CalderaLinear):
                    W = (lin.materialize() / lin.global_scale
                         - lin.L.astype(jnp.float32)
                         @ lin.R.astype(jnp.float32))
                    fields[name] = compress_linear(
                        W, lin.L.astype(jnp.float32),
                        lin.R.astype(jnp.float32), lin.num_bits,
                        global_scale=float(lin.global_scale), bias=lin.b,
                        mode="w4a8")
                else:
                    fields[name] = lin
            return llama.LayerParams(**fields)

        model = llama.ModelParams(
            embed=qparams.embed,
            layers=[convert(lp) for lp in qparams.layers],
            final_norm=qparams.final_norm, lm_head=qparams.lm_head)
        return cfg, stacked.stack_layers(model)

    def test_lcat_built_and_decode_matches_stacked(self):
        cfg, sp = self._wide()
        fp8 = fused.quantize_factors_int8_fused(fused.fuse_stacked(sp),
                                                fuse_factor_kernel=True)
        assert fp8.layers.qkv.L_cat is not None       # fused kernel path on
        assert fp8.layers.qkv.Ls == ()                # single storage copy
        assert fp8.layers.gateup.L_cat is not None
        sp8 = stacked.quantize_model_factors_int8(sp)

        # per-projection: the single-kernel path must match the unfused
        # stacked int8 pieces to float-associativity noise
        y = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.hidden_size))
        l = jnp.asarray(0)
        q, k, v = fused._apply_fused(fp8.layers.qkv, l, y, True)
        for out, lin in [(q, sp8.layers.q_proj), (k, sp8.layers.k_proj),
                         (v, sp8.layers.v_proj)]:
            yq = K.quantized_matmul_w4a8_stacked(
                y, lin.packed, lin.scales, l, lin.num_bits, interpret=True)
            ref = (yq + stacked._low_rank_layer(lin, l, y)
                   ) * lin.global_scale[0]
            rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
            assert rel < 1e-5

        # end-to-end: int8 activation requantization amplifies f32
        # association noise (a 1e-7 input delta can flip a round()),
        # so whole-step logits only agree loosely
        toks = jax.random.randint(jax.random.PRNGKey(3), (2,), 0,
                                  cfg.vocab_size)
        pos = jnp.asarray([3, 5], jnp.int32)
        ca = llama.KVCache.create(cfg, 2, 16)
        cb = llama.KVCache.create(cfg, 2, 16)
        la, _ = fused.decode_step_fused(fp8, toks, pos, ca, cfg,
                                        interpret=True)
        lb, _ = stacked.decode_step_w4a8(sp8, toks, pos, cb, cfg,
                                         interpret=True)
        rel = (np.linalg.norm(np.asarray(lb - la))
               / np.linalg.norm(np.asarray(la)))
        assert rel < 0.05

    def test_l_factor_kernel_decode_matches_xla_path(self):
        # the "l" factor path (L fused in-kernel, xr by XLA) must agree
        # with the "xla" path bit-for-bit up to float association noise
        cfg, sp = self._wide()
        fp_l = fused.quantize_factors_int8_fused(fused.fuse_stacked(sp),
                                                 fuse_factor_kernel="l")
        fp_x = fused.quantize_factors_int8_fused(fused.fuse_stacked(sp),
                                                 fuse_factor_kernel=False)
        assert fp_l.layers.qkv.factor_kernel == "l"
        assert fp_l.layers.qkv.L_cat is not None

        y = jax.random.normal(jax.random.PRNGKey(7), (2, cfg.hidden_size))
        l = jnp.asarray(1)
        outs_l = fused._apply_fused(fp_l.layers.qkv, l, y, True)
        outs_x = fused._apply_fused(fp_x.layers.qkv, l, y, True)
        for a, b in zip(outs_l, outs_x):
            rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
            assert rel < 1e-5
        # plain projections through the l-kernel too
        o_l = fused._apply_plain(fp_l.layers.o_proj, l, y, True, "l")
        o_x = fused._apply_plain(fp_x.layers.o_proj, l, y, True, "xla")
        rel = float(jnp.linalg.norm(o_l - o_x) / jnp.linalg.norm(o_x))
        assert rel < 1e-5

        toks = jax.random.randint(jax.random.PRNGKey(8), (2,), 0,
                                  cfg.vocab_size)
        pos = jnp.asarray([3, 5], jnp.int32)
        ca = llama.KVCache.create(cfg, 2, 16)
        cb = llama.KVCache.create(cfg, 2, 16)
        la, _ = fused.decode_step_fused(fp_l, toks, pos, ca, cfg,
                                        interpret=True)
        lb, _ = fused.decode_step_fused(fp_x, toks, pos, cb, cfg,
                                        interpret=True)
        rel = (np.linalg.norm(np.asarray(lb - la))
               / np.linalg.norm(np.asarray(la)))
        assert rel < 0.05

    def test_prefill_lcat_matches_xla_attention(self):
        cfg, sp = self._wide()
        fp8 = fused.quantize_factors_int8_fused(fused.fuse_stacked(sp),
                                                fuse_factor_kernel=True)
        toks = jax.random.randint(jax.random.PRNGKey(5), (1, 8), 0,
                                  cfg.vocab_size)
        ca = llama.KVCache.create(cfg, 2, 16)
        logits, cache = fused.prefill_into_slot_fused(
            fp8, toks, jnp.asarray(1), ca, cfg, interpret=True)
        assert logits.shape == (cfg.vocab_size,)
        assert np.isfinite(np.asarray(logits)).all()
