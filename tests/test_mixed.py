"""Mixed-precision serving tests: bucketed per-layer bit widths.

The reference documents per-group bit widths under a global budget but
never implements them (reference ``CONVEX_CALDERA_IMPLEMENTATION.md:
163-177``); the allocator tests live in test_scl_and_metrics / test_models.
These tests cover the *serving* side: ``models.mixed`` must reproduce the
unrolled per-layer forward bit-for-bit while running the fast bucketed
fori_loop path.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import llama, mixed
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, DenseLinear, compress_linear)

CFG4 = dataclasses.replace(TINY, num_layers=4)
BITS_SCHEDULE = [2, 4, 8, 4]


@pytest.fixture(scope="module")
def mixed_model():
    """4-layer tiny model: per-layer Q bits [2, 4, 8, 4], with layer 1's
    down_proj left dense (the quality-gate revert case)."""
    params = llama.init_params(jax.random.PRNGKey(0), CFG4)
    rng = np.random.default_rng(7)

    def convert(lp, bits, dense_down):
        fields = {}
        for name in llama.LayerParams._fields:
            lin = getattr(lp, name)
            if not isinstance(lin, DenseLinear) or name.endswith("_norm"):
                fields[name] = lin
                continue
            if dense_down and name == "down_proj":
                fields[name] = lin
                continue
            m, k = lin.w.shape
            r = 4
            L = jnp.asarray(rng.normal(size=(m, r)).astype(np.float32) * 0.05)
            R = jnp.asarray(rng.normal(size=(r, k)).astype(np.float32) * 0.05)
            fields[name] = compress_linear(
                lin.w.astype(jnp.float32), L, R, bits,
                global_scale=1.0, bias=lin.b, mode="w4a8")
        return llama.LayerParams(**fields)

    layers = [convert(lp, BITS_SCHEDULE[i], dense_down=(i == 1))
              for i, lp in enumerate(params.layers)]
    return llama.ModelParams(embed=params.embed, layers=layers,
                             final_norm=params.final_norm,
                             lm_head=params.lm_head)


class TestBucketing:
    def test_buckets_and_index_maps(self, mixed_model):
        mp = mixed.stack_layers_mixed(mixed_model)
        q = mp.layers.q_proj
        # bits [2, 4, 8, 4] -> 3 buckets; layers 1 and 3 share bucket 1
        assert len(q.buckets) == 3
        np.testing.assert_array_equal(np.asarray(q.bucket_of), [0, 1, 2, 1])
        np.testing.assert_array_equal(np.asarray(q.index_in), [0, 0, 0, 1])
        assert [b.num_bits for b in q.buckets] == [2, 4, 8]
        # the stacked bucket 1 carries layers 1 and 3
        assert q.buckets[1].packed.shape[0] == 2
        # down_proj: layer 1 dense -> a DenseLinear bucket
        d = mp.layers.down_proj
        kinds = [type(b).__name__ for b in d.buckets]
        assert "DenseLinear" in kinds

    def test_num_bits_per_layer(self, mixed_model):
        mp = mixed.stack_layers_mixed(mixed_model)
        assert mixed.num_bits_per_layer(mp.layers.q_proj) == BITS_SCHEDULE
        # dense layers report 16 (bf16 storage)
        down = mixed.num_bits_per_layer(mp.layers.down_proj)
        assert down[1] == 16 and down[0] == BITS_SCHEDULE[0]

    def test_grouped_mode_rejected(self, mixed_model):
        lin = mixed_model.layers[0].q_proj
        bad = dataclasses.replace(lin, mode="grouped")
        lps = [llama.LayerParams(**{
            **mixed_model.layers[0]._asdict(), "q_proj": bad})]
        badm = llama.ModelParams(embed=mixed_model.embed, layers=lps,
                                 final_norm=mixed_model.final_norm,
                                 lm_head=mixed_model.lm_head)
        with pytest.raises(ValueError, match="w4a8"):
            mixed.stack_layers_mixed(badm)


class TestMixedDecode:
    def test_decode_bit_exact_vs_unrolled(self, mixed_model):
        mp = mixed.stack_layers_mixed(mixed_model)
        toks = jax.random.randint(jax.random.PRNGKey(3), (2,), 0,
                                  CFG4.vocab_size)
        pos = jnp.asarray([3, 5], jnp.int32)
        ca = llama.KVCache.create(CFG4, 2, 16)
        cb = llama.KVCache.create(CFG4, 2, 16)
        la, ca = llama.decode_step_batched(mixed_model, toks, pos, ca, CFG4,
                                           use_pallas=False)
        lb, cb = mixed.decode_step_mixed(mp, toks, pos, cb, CFG4,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        np.testing.assert_array_equal(np.asarray(ca.k), np.asarray(cb.k))

    def test_decode_quant_kv(self, mixed_model):
        mp = mixed.stack_layers_mixed(mixed_model)
        toks = jnp.asarray([1, 2], jnp.int32)
        pos = jnp.asarray([0, 1], jnp.int32)
        cache = llama.QuantKVCache.create(CFG4, 2, 16)
        logits, cache = mixed.decode_step_mixed(mp, toks, pos, cache, CFG4,
                                                interpret=True)
        assert np.isfinite(np.asarray(logits)).all()
        assert cache.k.dtype == jnp.int8

    def test_decode_head_major_flash(self, mixed_model):
        mp = mixed.stack_layers_mixed(mixed_model)
        toks = jnp.asarray([1, 2], jnp.int32)
        pos = jnp.asarray([2, 3], jnp.int32)
        cache = llama.HeadMajorQuantKVCache.create(CFG4, 2, 16)
        logits, cache = mixed.decode_step_mixed(mp, toks, pos, cache, CFG4,
                                                interpret=True)
        assert np.isfinite(np.asarray(logits)).all()

    def test_segmented_matches_switch_path(self, mixed_model):
        # the run-partitioned decode must be BIT-exact vs the lax.switch
        # dispatch (same kernels, same order, no dynamic branch)
        mp = mixed.stack_layers_mixed(mixed_model)
        runs = mixed.mixed_segments(mp.layers, CFG4.num_layers)
        # schedule [2,4,8,4] + layer-1 dense down: every layer is its own
        # signature here -> 4 runs (the worst case still works)
        assert len(runs) == 4
        toks = jnp.asarray([1, 2], jnp.int32)
        pos = jnp.asarray([2, 3], jnp.int32)
        ca = llama.HeadMajorQuantKVCache.create(CFG4, 2, 16)
        cb = llama.HeadMajorQuantKVCache.create(CFG4, 2, 16)
        cc = llama.HeadMajorQuantKVCache.create(CFG4, 2, 16)
        la, ca2 = mixed.decode_step_mixed(mp, toks, pos, ca, CFG4,
                                          interpret=True)
        # inline-KV segmented: bit-exact vs the switch path
        lb, cb2 = mixed.decode_step_mixed_segmented(
            mp, toks, pos, cb, CFG4, interpret=True, staged_kv=False)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        np.testing.assert_array_equal(np.asarray(ca2.k), np.asarray(cb2.k))
        np.testing.assert_array_equal(np.asarray(ca2.v), np.asarray(cb2.v))
        # staged-KV segmented (the fast default): f32-rounding-equal
        # logits, bit-identical committed codes
        lc, cc2 = mixed.decode_step_mixed_segmented(
            mp, toks, pos, cc, CFG4, interpret=True)
        np.testing.assert_allclose(np.asarray(lc), np.asarray(la),
                                   rtol=2e-4, atol=2e-4)
        assert (np.argmax(np.asarray(la), -1)
                == np.argmax(np.asarray(lc), -1)).all()
        np.testing.assert_array_equal(np.asarray(ca2.k), np.asarray(cc2.k))
        np.testing.assert_array_equal(np.asarray(ca2.v), np.asarray(cc2.v))

    def test_fused_segments_match(self):
        # uniform-width MHA model with lane-aligned rank: segments fuse
        # qkv / gate+up; output must match the unfused segmented path to
        # the (documented) factor re-quantization noise
        from ee274_convexcaldera_llm_quantization_tpu.models.config import (
            TINY_MHA)
        params = llama.init_params(jax.random.PRNGKey(3), TINY_MHA)
        rng = np.random.default_rng(5)

        def conv(lp):
            fields = {}
            for name in llama.LayerParams._fields:
                lin = getattr(lp, name)
                if not isinstance(lin, DenseLinear) or \
                        name.endswith("_norm"):
                    fields[name] = lin
                    continue
                m, k = lin.w.shape
                r = 128
                Lf = jnp.asarray(
                    rng.normal(size=(m, r)).astype(np.float32) * 0.05)
                Rf = jnp.asarray(
                    rng.normal(size=(r, k)).astype(np.float32) * 0.05)
                fields[name] = compress_linear(
                    lin.w.astype(jnp.float32), Lf, Rf, 4,
                    global_scale=1.0, bias=lin.b, mode="w4a8")
            return llama.LayerParams(**fields)

        from ee274_convexcaldera_llm_quantization_tpu.models.compressed \
            import quantize_factors_int8
        model = llama.ModelParams(
            embed=params.embed,
            layers=[conv(lp) for lp in params.layers],
            final_norm=params.final_norm, lm_head=params.lm_head)
        mp = mixed.stack_layers_mixed(model)
        # int8 factors (the serving config; exact fusion requires them)
        import dataclasses as dc

        def q8(proj):
            return dc.replace(proj, buckets=tuple(
                quantize_factors_int8(b) if isinstance(b, CalderaLinear)
                else b for b in proj.buckets))

        mp = mp._replace(layers=mp.layers._replace(
            **{n: q8(getattr(mp.layers, n))
               for n in ("q_proj", "k_proj", "v_proj", "o_proj",
                         "gate_proj", "up_proj", "down_proj")}))
        prep = mixed.prepare_fused_segments(mp, TINY_MHA)
        assert any(p["qkv"] is not None for p in prep)
        assert any(p["gateup"] is not None for p in prep)
        toks = jnp.asarray([1, 2], jnp.int32)
        pos = jnp.asarray([2, 3], jnp.int32)
        ca = llama.HeadMajorQuantKVCache.create(TINY_MHA, 2, 16)
        cb = llama.HeadMajorQuantKVCache.create(TINY_MHA, 2, 16)
        la, _ = mixed.decode_step_mixed_segmented(
            mp, toks, pos, ca, TINY_MHA, interpret=True)
        lb, _ = mixed.decode_step_mixed_segmented(
            mp, toks, pos, cb, TINY_MHA, interpret=True, fused_prep=prep)
        # fusion concatenates the int8 factor codes/scales directly, so
        # only the fused-vs-unfused f32 dot ordering differs
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=2e-4, atol=2e-4)
        assert (np.argmax(np.asarray(la), -1)
                == np.argmax(np.asarray(lb), -1)).all()

    def test_prefill_matches_unrolled(self, mixed_model):
        mp = mixed.stack_layers_mixed(mixed_model)
        toks = jax.random.randint(jax.random.PRNGKey(9), (1, 6), 0,
                                  CFG4.vocab_size)
        ca = llama.KVCache.create(CFG4, 2, 16)
        cb = llama.KVCache.create(CFG4, 2, 16)
        la, ca = llama.prefill_into_slot(mixed_model, toks, jnp.int32(1),
                                         ca, CFG4, use_pallas=False)
        lb, cb = mixed.prefill_into_slot_mixed(mp, toks, jnp.int32(1), cb,
                                               CFG4, interpret=True)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ca.k), np.asarray(cb.k),
                                   rtol=1e-5, atol=1e-5)


class TestBudgetToServing:
    def test_end_to_end_budget_allocation_serves(self):
        """compress_model_with_budget -> stack_layers_mixed -> decode."""
        from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
            CalderaParams)
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model_with_budget)

        params = llama.init_params(jax.random.PRNGKey(1), TINY)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        qparams, report, alloc = compress_model_with_budget(
            params, cp, B_tot=4.0, menu=(2, 4, 8), serving_mode="w4a8")
        assert alloc.avg_bits <= 4.0 + 1e-9
        mp = mixed.stack_layers_mixed(qparams)
        toks = jnp.asarray([1, 2], jnp.int32)
        pos = jnp.asarray([0, 0], jnp.int32)
        cache = llama.KVCache.create(TINY, 2, 16)
        logits, _ = mixed.decode_step_mixed(mp, toks, pos, cache, TINY,
                                            interpret=True)
        assert np.isfinite(np.asarray(logits)).all()
