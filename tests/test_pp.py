"""Pipeline-parallel decode: stage-sharded layers must reproduce the
single-device stacked W4A8 decode step exactly (same kernels, same math —
only the schedule differs), on the 8-device CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from ee274_convexcaldera_llm_quantization_tpu.models import llama, stacked
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, compress_linear)
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.parallel import pp as PP

TINY4 = dataclasses.replace(TINY, num_layers=4)


def _w4a8_model(config, seed=0):
    params = llama.init_params(jax.random.PRNGKey(seed), config)
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


@pytest.fixture(scope="module")
def model2():
    return _w4a8_model(TINY)


@pytest.fixture(scope="module")
def model4():
    return _w4a8_model(TINY4)


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("pp",))


class TestPPDecode:
    def _run(self, model, config, n_stages, batch, quant_kv=False):
        toks = jnp.arange(1, batch + 1, dtype=jnp.int32)
        pos = jnp.asarray([3 + 2 * i for i in range(batch)], jnp.int32)
        make = (llama.QuantKVCache.create if quant_kv
                else llama.KVCache.create)
        ref, ref_cache = stacked.decode_step_w4a8(
            model, toks, pos, make(config, batch, 16), config,
            interpret=True)
        mesh = _mesh(n_stages)
        pp_params = PP.shard_stacked_model_pp(model, mesh)
        pp_cache = PP.shard_kv_cache_pp(make(config, batch, 16), mesh)
        out, pp_cache = PP.decode_step_w4a8_pp(
            pp_params, toks, pos, pp_cache, config, mesh, interpret=True)
        return ref, ref_cache, out, pp_cache

    @pytest.mark.parametrize("n_stages,batch", [(2, 4), (2, 2)])
    def test_matches_single_device_tiny(self, model2, n_stages, batch):
        ref, ref_cache, out, pp_cache = self._run(model2, TINY, n_stages,
                                                  batch)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        for r, p in zip(ref_cache, pp_cache):
            np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)

    def test_four_stages(self, model4):
        ref, ref_cache, out, pp_cache = self._run(model4, TINY4, 4, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        for r, p in zip(ref_cache, pp_cache):
            np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)

    def test_int8_kv_cache(self, model2):
        ref, ref_cache, out, pp_cache = self._run(model2, TINY, 2, 4,
                                                  quant_kv=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(pp_cache.k),
                                      np.asarray(ref_cache.k))
        np.testing.assert_array_equal(np.asarray(pp_cache.v),
                                      np.asarray(ref_cache.v))

    def test_multi_step_generation(self, model2):
        """Greedy 3-step generation must agree between PP and single-chip."""
        batch = 4
        toks = jnp.asarray([5, 6, 7, 8], jnp.int32)
        pos = jnp.zeros((batch,), jnp.int32)
        mesh = _mesh(2)
        pp_params = PP.shard_stacked_model_pp(model2, mesh)
        cache_s = llama.KVCache.create(TINY, batch, 16)
        cache_p = PP.shard_kv_cache_pp(llama.KVCache.create(TINY, batch, 16),
                                       mesh)
        ts, tp_ = toks, toks
        for step in range(3):
            ls, cache_s = stacked.decode_step_w4a8(
                model2, ts, pos + step, cache_s, TINY, interpret=True)
            lp_, cache_p = PP.decode_step_w4a8_pp(
                pp_params, tp_, pos + step, cache_p, TINY, mesh,
                interpret=True)
            ts = jnp.argmax(ls, axis=-1).astype(jnp.int32)
            tp_ = jnp.argmax(lp_, axis=-1).astype(jnp.int32)
            np.testing.assert_array_equal(np.asarray(ts), np.asarray(tp_))

    def test_rejects_indivisible(self, model2):
        mesh = _mesh(2)
        pp_params = PP.shard_stacked_model_pp(model2, mesh)
        cache = PP.shard_kv_cache_pp(llama.KVCache.create(TINY, 3, 16), mesh)
        with pytest.raises(ValueError, match="not divisible"):
            PP.decode_step_w4a8_pp(
                pp_params, jnp.zeros((3,), jnp.int32),
                jnp.zeros((3,), jnp.int32), cache, TINY, mesh,
                interpret=True)


class TestFusedPP:
    def test_fused_pp_matches_single_device(self):
        """The fused PP step (GPipe over the headline layer body) must
        match the single-device fused step with staged per-row commits."""
        import numpy as np
        from jax.sharding import Mesh
        from ee274_convexcaldera_llm_quantization_tpu.models import (
            fused as fusedm, llama, stacked)
        from ee274_convexcaldera_llm_quantization_tpu.models.config import (
            TINY)
        from ee274_convexcaldera_llm_quantization_tpu.models.compressed \
            import CalderaLinear, compress_linear
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model)
        from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
            CalderaParams)
        from ee274_convexcaldera_llm_quantization_tpu.parallel import (
            pp as ppm)

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
        fp = fusedm.quantize_factors_int8_fused(
            fusedm.fuse_stacked(stacked.stack_layers(model)))

        toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
        pos = jnp.asarray([3, 5, 2, 7], jnp.int32)
        ref, cref = fusedm.decode_step_fused(
            fp, toks, pos, llama.HeadMajorQuantKVCache.create(TINY, 4, 16),
            TINY, interpret=True, staged_kv=True)

        mesh = Mesh(np.asarray(jax.devices()[:2]), ("pp",))
        pp_params = ppm.shard_fused_model_pp(fp, mesh)
        pp_cache = ppm.shard_kv_cache_pp(
            llama.HeadMajorQuantKVCache.create(TINY, 4, 16), mesh)
        out, pp_cache = ppm.decode_step_fused_pp(
            pp_params, toks, pos, pp_cache, TINY, mesh, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        # KV codes must be bit-identical (same kernels, same quantization)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(pp_cache.k)), np.asarray(cref.k))

    def test_fused_pp_tp_composition(self):
        """PP x TP on one (pp=2, tp=2) mesh: layer stages x Megatron
        within-stage — the multi-host 13B+ serving topology. Greedy
        argmax must match the single-device fused step."""
        import numpy as np
        from jax.sharding import Mesh
        from ee274_convexcaldera_llm_quantization_tpu.models import (
            fused as fusedm, llama, stacked)
        from ee274_convexcaldera_llm_quantization_tpu.models.config import (
            TINY)
        from ee274_convexcaldera_llm_quantization_tpu.models.compressed \
            import CalderaLinear, compress_linear
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model)
        from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
            CalderaParams)
        from ee274_convexcaldera_llm_quantization_tpu.parallel import (
            pp as ppm)

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
        fp = fusedm.quantize_factors_int8_fused(
            fusedm.fuse_stacked(stacked.stack_layers(model)))

        toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
        pos = jnp.asarray([3, 5, 2, 7], jnp.int32)
        ref, _ = fusedm.decode_step_fused(
            fp, toks, pos, llama.HeadMajorQuantKVCache.create(TINY, 4, 16),
            TINY, interpret=True, staged_kv=True)

        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                    ("pp", "tp"))
        pt_params = ppm.shard_fused_model_pp_tp(fp, mesh)
        cache = llama.HeadMajorQuantKVCache.create(TINY, 4, 16)
        from jax.sharding import NamedSharding, PartitionSpec as P
        cspecs = llama.HeadMajorQuantKVCache(
            P("pp", None, "tp", None, None), P("pp", None, "tp", None, None),
            P("pp", None, "tp", None), P("pp", None, "tp", None))
        pt_cache = jax.tree.map(
            lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
            cache, cspecs)
        out, pt_cache = ppm.decode_step_fused_pp(
            pt_params, toks, pos, pt_cache, TINY, mesh, interpret=True,
            tp_axis="tp")
        assert out.shape == ref.shape
        rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
               / np.linalg.norm(np.asarray(ref)))
        assert rel < 0.05, rel
        assert (np.argmax(np.asarray(out), -1)
                == np.argmax(np.asarray(ref), -1)).all()
