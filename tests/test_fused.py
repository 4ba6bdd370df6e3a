"""Fused qkv / gate-up projection path: equivalence vs the unfused
stacked W4A8 path, cache-type support, and engine dispatch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import (
    fused, llama, stacked)
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, compress_linear)
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)


@pytest.fixture(scope="module")
def both_params():
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
    sp = stacked.stack_layers(model)
    return sp, fused.fuse_stacked(sp)


class TestFuse:
    def test_shapes_and_splits(self, both_params):
        sp, fp = both_params
        qkv = fp.layers.qkv
        Nq = sp.layers.q_proj.packed.shape[1]
        Nkv = sp.layers.k_proj.packed.shape[1]
        assert qkv.packed.shape[1] == Nq + 2 * Nkv
        assert qkv.splits == (Nq, Nkv, Nkv)
        assert qkv.R.shape[1] == sum(qkv.ranks)
        gu = fp.layers.gateup
        assert gu.splits == (sp.layers.gate_proj.packed.shape[1],
                             sp.layers.up_proj.packed.shape[1])

    def test_rejects_non_w4a8(self):
        params = llama.init_params(jax.random.PRNGKey(1), TINY)
        sp = stacked.stack_layers(params)      # dense layers
        with pytest.raises(ValueError, match="w4a8"):
            fused.fuse_stacked(sp)

    def test_apply_fused_matches_per_projection(self, both_params):
        sp, fp = both_params
        y = jax.random.normal(jax.random.PRNGKey(2), (2, TINY.hidden_size))
        from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as Kr
        l = jnp.asarray(0)
        q, k, v = fused._apply_fused(fp.layers.qkv, l, y, True)
        for out, lin in [(q, sp.layers.q_proj), (k, sp.layers.k_proj),
                         (v, sp.layers.v_proj)]:
            yq = Kr.quantized_matmul_w4a8_stacked(
                y, lin.packed, lin.scales, l, lin.num_bits, interpret=True)
            xr = jnp.dot(y.astype(jnp.bfloat16), lin.R[0].T,
                         preferred_element_type=jnp.float32)
            ylr = jnp.dot(xr.astype(jnp.bfloat16), lin.L[0].T,
                          preferred_element_type=jnp.float32)
            ref = (yq + ylr) * lin.global_scale[0]
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)


class TestFusedDecode:
    def test_decode_matches_unfused(self, both_params):
        sp, fp = both_params
        toks = jax.random.randint(jax.random.PRNGKey(3), (2,), 0,
                                  TINY.vocab_size)
        pos = jnp.asarray([3, 5], jnp.int32)
        ca = llama.KVCache.create(TINY, 2, 16)
        cb = llama.KVCache.create(TINY, 2, 16)
        la, ca = stacked.decode_step_w4a8(sp, toks, pos, ca, TINY,
                                          interpret=True)
        lb, cb = fused.decode_step_fused(fp, toks, pos, cb, TINY,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ca.k, np.float32),
                                   np.asarray(cb.k, np.float32),
                                   rtol=1e-2, atol=1e-3)

    def test_decode_int8_cache(self, both_params):
        _, fp = both_params
        toks = jnp.asarray([1, 2], jnp.int32)
        pos = jnp.asarray([3, 5], jnp.int32)
        cq = llama.QuantKVCache.create(TINY, 2, 16)
        lq, cq = fused.decode_step_fused(fp, toks, pos, cq, TINY,
                                         interpret=True)
        assert isinstance(cq, llama.QuantKVCache)
        assert np.isfinite(np.asarray(lq)).all()
        ks = np.array(cq.k_scale)
        assert (ks[:, 0, 3] > 0).all() and (ks[:, 1, 5] > 0).all()

    def test_prefill_matches_unfused(self, both_params):
        sp, fp = both_params
        toks = jax.random.randint(jax.random.PRNGKey(5), (1, 8), 0,
                                  TINY.vocab_size)
        ca = llama.KVCache.create(TINY, 2, 16)
        cb = llama.KVCache.create(TINY, 2, 16)
        la, ca = stacked.prefill_into_slot_w4a8(
            sp, toks, jnp.asarray(1), ca, TINY, interpret=True,
            last_pos=jnp.asarray(7))
        lb, cb = fused.prefill_into_slot_fused(
            fp, toks, jnp.asarray(1), cb, TINY, interpret=True,
            last_pos=jnp.asarray(7))
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4, atol=1e-4)


class TestFusedEngine:
    def test_fused_engine_matches_unfused(self, both_params):
        from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
            Request)
        from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine import (
            FastServingEngine)
        sp, fp = both_params
        rng = np.random.default_rng(5)
        prompts = [rng.integers(0, TINY.vocab_size, size=5),
                   rng.integers(0, TINY.vocab_size, size=9)]
        base = FastServingEngine(sp, TINY, max_slots=2, max_seq_len=32,
                                 interpret=True)
        fast = FastServingEngine(fp, TINY, max_slots=2, max_seq_len=32,
                                 interpret=True)
        assert fast._fused and not base._fused
        for uid, p in enumerate(prompts):
            base.submit(Request(uid=uid, prompt=p, max_new_tokens=5))
            fast.submit(Request(uid=uid, prompt=p, max_new_tokens=5))
        out_b = {c.uid: c.tokens for c in base.run()}
        out_f = {c.uid: c.tokens for c in fast.run()}
        assert out_f == out_b
