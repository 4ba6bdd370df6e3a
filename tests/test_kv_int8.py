"""int8 KV cache: quantization roundtrip, fast-path decode/prefill
equivalence vs the bf16 cache, and engine integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import llama, stacked
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, compress_linear)
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)


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


class TestQuantizeKV:
    def test_roundtrip_error(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 2, 8),
                              jnp.float32)
        codes, scale = llama.quantize_kv(x)
        assert codes.dtype == jnp.int8
        assert scale.shape == (4, 16, 2)
        back = codes.astype(jnp.float32) * scale[..., None]
        rel = (np.linalg.norm(np.asarray(back - x))
               / np.linalg.norm(np.asarray(x)))
        assert rel < 0.006   # int8 per-(token, head) absmax

    def test_zero_rows_safe(self):
        codes, scale = llama.quantize_kv(jnp.zeros((2, 3, 4)))
        assert np.all(np.asarray(codes) == 0)
        assert np.all(np.isfinite(np.asarray(scale)))

    def test_attention_q8_matches_dense(self):
        key = jax.random.PRNGKey(2)
        q = jax.random.normal(key, (2, 1, 4, 8), jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 2, 8))
        v = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 2, 8))
        kq, ks = llama.quantize_kv(k)
        vq, vs = llama.quantize_kv(v)
        out8 = llama._attention_q8(q, kq, vq, ks, vs, None)
        out = llama._attention(q, k, v, None)
        rel = (np.linalg.norm(np.asarray(out8 - out))
               / np.linalg.norm(np.asarray(out)))
        assert rel < 0.01


class TestFastPathInt8KV:
    def test_decode_logits_close_to_bf16_cache(self, w4a8_stacked):
        toks = jax.random.randint(jax.random.PRNGKey(3), (2,), 0,
                                  TINY.vocab_size)
        pos = jnp.asarray([3, 5], jnp.int32)
        cb = llama.KVCache.create(TINY, 2, 16)
        cq = llama.QuantKVCache.create(TINY, 2, 16)
        lb, cb = stacked.decode_step_w4a8(w4a8_stacked, toks, pos, cb, TINY,
                                          interpret=True)
        lq, cq = stacked.decode_step_w4a8(w4a8_stacked, toks, pos, cq, TINY,
                                          interpret=True)
        assert isinstance(cq, llama.QuantKVCache)
        rel = (np.linalg.norm(np.asarray(lq - lb))
               / np.linalg.norm(np.asarray(lb)))
        # int8 V rounding (~0.4%) amplified through a random TINY tower
        assert rel < 0.06

    def test_decode_cache_write_position(self, w4a8_stacked):
        toks = jnp.asarray([1, 2], jnp.int32)
        pos = jnp.asarray([3, 5], jnp.int32)
        cq = llama.QuantKVCache.create(TINY, 2, 16)
        _, cq = stacked.decode_step_w4a8(w4a8_stacked, toks, pos, cq, TINY,
                                         interpret=True)
        ks = np.array(cq.k_scale)
        # scales written exactly at (row, pos), zero elsewhere
        assert (ks[:, 0, 3] > 0).all() and (ks[:, 1, 5] > 0).all()
        ks[:, 0, 3] = 0
        ks[:, 1, 5] = 0
        assert np.all(ks == 0)

    def test_prefill_logits_independent_of_cache_dtype(self, w4a8_stacked):
        # prompt self-attention uses exact K/V: logits must be identical
        toks = jax.random.randint(jax.random.PRNGKey(5), (1, 8), 0,
                                  TINY.vocab_size)
        cb = llama.KVCache.create(TINY, 2, 16)
        cq = llama.QuantKVCache.create(TINY, 2, 16)
        lb, cb = stacked.prefill_into_slot_w4a8(
            w4a8_stacked, toks, jnp.asarray(1), cb, TINY, interpret=True)
        lq, cq = stacked.prefill_into_slot_w4a8(
            w4a8_stacked, toks, jnp.asarray(1), cq, TINY, interpret=True)
        np.testing.assert_array_equal(np.asarray(lb), np.asarray(lq))
        # cache contents dequantize back to the bf16 cache contents
        back = (np.asarray(cq.k[:, 1, :8]).astype(np.float32)
                * np.asarray(cq.k_scale[:, 1, :8])[..., None])
        ref = np.asarray(cb.k[:, 1, :8]).astype(np.float32)
        rel = np.linalg.norm(back - ref) / max(np.linalg.norm(ref), 1e-9)
        assert rel < 0.01

    def test_prefill_then_decode_generation(self, w4a8_stacked):
        # first sampled token after prefill is exact; later ones close
        toks = jax.random.randint(jax.random.PRNGKey(7), (1, 8), 0,
                                  TINY.vocab_size)
        results = {}
        for name, cache in [("bf16", llama.KVCache.create(TINY, 1, 16)),
                            ("int8", llama.QuantKVCache.create(TINY, 1, 16))]:
            logits, cache = stacked.prefill_into_slot_w4a8(
                w4a8_stacked, toks, jnp.asarray(0), cache, TINY,
                interpret=True)
            results[name] = int(jnp.argmax(logits))
        assert results["int8"] == results["bf16"]


class TestEngineInt8KV:
    def test_fast_engine_kv_int8(self, w4a8_stacked):
        from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
            Request)
        from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine import (
            FastServingEngine)
        rng = np.random.default_rng(5)
        prompts = [rng.integers(0, TINY.vocab_size, size=5),
                   rng.integers(0, TINY.vocab_size, size=9)]
        eng = FastServingEngine(w4a8_stacked, TINY, max_slots=2,
                                max_seq_len=32, interpret=True, kv_int8=True)
        assert isinstance(eng.cache, llama.QuantKVCache)
        for uid, p in enumerate(prompts):
            eng.submit(Request(uid=uid, prompt=p, max_new_tokens=5))
        done = eng.run()
        assert sorted(c.uid for c in done) == [0, 1]
        assert all(len(c.tokens) == 5 for c in done)
