"""Fused (headline-step) paged serving: the paged flash kernel vs its XLA
twin, the fused paged decode step vs the contiguous fused step, the
inactive-row scratch-page commit, and the engine end to end (incl. the
native prefix cache)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import (
    fused as fusedm, llama, stacked)
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, compress_linear)
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.ops import attention as AT
from ee274_convexcaldera_llm_quantization_tpu.serve import paged
from ee274_convexcaldera_llm_quantization_tpu.serve.engine import Request
from ee274_convexcaldera_llm_quantization_tpu.serve.paged_engine import (
    PagedServingEngine)


@pytest.fixture(scope="module")
def stacked_model():
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


@pytest.fixture(scope="module")
def fused_model(stacked_model):
    return fusedm.quantize_factors_int8_fused(
        fusedm.fuse_stacked(stacked_model))


class TestPagedFlashKernel:
    def test_matches_xla_twin_ragged(self):
        rng = np.random.default_rng(0)
        L, NP, KVH, P, D, B, G = 2, 10, 2, 32, 128, 3, 2
        k = jnp.asarray(rng.integers(-127, 128, (L, NP, KVH, P, D)),
                        jnp.int8)
        v = jnp.asarray(rng.integers(-127, 128, (L, NP, KVH, P, D)),
                        jnp.int8)
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (L, NP, KVH, P)),
                         jnp.float32)
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (L, NP, KVH, P)),
                         jnp.float32)
        q = jnp.asarray(rng.standard_normal((B, KVH, G, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KVH, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KVH, D)), jnp.float32)
        pt = jnp.asarray(rng.permutation(NP)[:B * 3].reshape(B, 3),
                         jnp.int32)
        pos = jnp.asarray([0, 17, 95], jnp.int32)    # incl. empty context
        out = AT.flash_decode_q8_paged(q, k, v, ks, vs, kn, vn,
                                       jnp.asarray(1), pt, pos,
                                       interpret=True)
        ref = AT.flash_decode_q8_paged_xla(q, k, v, ks, vs, kn, vn,
                                           jnp.asarray(1), pt, pos)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 3e-5, rel


class TestPagedFusedStep:
    def test_decode_matches_contiguous_fused(self, fused_model):
        """With identity page tables, the paged fused step must reproduce
        the contiguous fused step (same weights, same int8 KV math)."""
        B, P, n_pages_seq = 2, 16, 2
        T = P * n_pages_seq
        rng = np.random.default_rng(1)
        prompt_len = 7
        toks = jnp.asarray(rng.integers(0, TINY.vocab_size, (B,)), jnp.int32)

        # contiguous reference: prefill a prompt per row, then one decode
        cache = llama.HeadMajorQuantKVCache.create(TINY, B, T)
        prompts = rng.integers(0, TINY.vocab_size, (B, prompt_len))
        for b in range(B):
            _, cache = fusedm.prefill_into_slot_fused(
                fused_model, jnp.asarray(prompts[b:b + 1], jnp.int32),
                jnp.asarray(b), cache, TINY, interpret=True)
        pos = jnp.full((B,), prompt_len, jnp.int32)
        ref, _ = fusedm.decode_step_fused(
            fused_model, toks, pos, cache, TINY, interpret=True,
            staged_kv="uniform")

        # paged: same prompts through the fused paged prefill, identity
        # tables (row b owns pages [b*n, ..., b*n + n-1])
        pool = paged.PagedQuantKVPool.create(TINY, B * n_pages_seq + 1, P)
        tables = np.arange(B * n_pages_seq).reshape(B, n_pages_seq)
        for b in range(B):
            _, pool = paged.paged_prefill_fused(
                fused_model, jnp.asarray(prompts[b:b + 1], jnp.int32), pool,
                jnp.asarray(tables[b], jnp.int32), TINY, interpret=True)
        out, pool = paged.paged_decode_step_fused(
            fused_model, toks, pos, pool, jnp.asarray(tables, jnp.int32),
            TINY, interpret=True)
        rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
               / np.linalg.norm(np.asarray(ref)))
        assert rel < 2e-4, rel
        assert (np.argmax(np.asarray(out), -1)
                == np.argmax(np.asarray(ref), -1)).all()

    def test_inactive_rows_write_scratch_only(self, fused_model):
        B, P = 2, 16
        pool = paged.PagedQuantKVPool.create(TINY, 5, P)   # page 4 scratch
        live = jax.random.randint(jax.random.PRNGKey(3),
                                  pool.k[:, :4].shape, -127, 128, jnp.int8)
        pool = pool._replace(
            k=pool.k.at[:, :4].set(live), v=pool.v.at[:, :4].set(live))
        tables = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
        toks = jnp.asarray([1, 2], jnp.int32)
        pos = jnp.asarray([3, 0], jnp.int32)
        active = jnp.asarray([True, False])
        _, pool2 = paged.paged_decode_step_fused(
            fused_model, toks, pos, pool, tables, TINY, interpret=True,
            active=active, scratch_page=4)
        # row 1 inactive: pages 2/3 (its table) must be untouched
        np.testing.assert_array_equal(np.asarray(pool2.k[:, 2:4]),
                                      np.asarray(pool.k[:, 2:4]))
        # row 0 active: its write landed in page 0 at offset 3
        assert not np.array_equal(np.asarray(pool2.k[:, 0, :, 3]),
                                  np.asarray(pool.k[:, 0, :, 3]))

    def test_requires_scratch_with_active(self, fused_model):
        pool = paged.PagedQuantKVPool.create(TINY, 4, 16)
        with pytest.raises(ValueError, match="scratch_page"):
            paged.paged_decode_step_fused(
                fused_model, jnp.asarray([1], jnp.int32),
                jnp.asarray([0], jnp.int32), pool,
                jnp.asarray([[0, 1]], jnp.int32), TINY, interpret=True,
                active=jnp.asarray([True]))


class TestPagedFusedEngine:
    def test_generates_and_matches_fast_engine(self, stacked_model,
                                               fused_model):
        from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine \
            import FastServingEngine
        rng = np.random.default_rng(5)
        prompts = [rng.integers(0, TINY.vocab_size, size=5),
                   rng.integers(0, TINY.vocab_size, size=9)]
        eng = PagedServingEngine(fused_model, TINY, max_slots=2,
                                 num_pages=16, page_size=16,
                                 interpret=True)
        assert eng.fused
        for uid, p in enumerate(prompts):
            eng.submit(Request(uid=uid, prompt=p, max_new_tokens=6,
                               temperature=0.0))
        done = {c.uid: c for c in eng.run()}
        assert sorted(done) == [0, 1]
        assert all(len(done[u].tokens) == 6 for u in done)
        # greedy tokens must match the slotted fast engine (same fused
        # weights, same int8 KV quantization — only f32 attention
        # reduction order differs between the paged and contiguous flash
        # kernels)
        fast = FastServingEngine(stacked_model, TINY, max_slots=2,
                                 max_seq_len=32, interpret=True)
        for uid, p in enumerate(prompts):
            fast.submit(Request(uid=uid, prompt=p, max_new_tokens=6,
                                temperature=0.0))
        ref = {c.uid: c.tokens for c in fast.run()}
        assert {u: done[u].tokens for u in done} == ref

    def test_prefix_cache_suffix_path(self, fused_model):
        rng = np.random.default_rng(6)
        shared = rng.integers(0, TINY.vocab_size, size=16)   # page-aligned
        p1 = np.concatenate([shared, rng.integers(0, TINY.vocab_size,
                                                  size=4)])
        p2 = np.concatenate([shared, rng.integers(0, TINY.vocab_size,
                                                  size=5)])
        # without prefix cache
        eng = PagedServingEngine(fused_model, TINY, max_slots=1,
                                 num_pages=16, page_size=16,
                                 interpret=True)
        eng.submit(Request(uid=0, prompt=p1, max_new_tokens=4,
                           temperature=0.0))
        eng.submit(Request(uid=1, prompt=p2, max_new_tokens=4,
                           temperature=0.0))
        ref = {c.uid: c.tokens for c in eng.run()}
        # with the native prefix cache (second prompt hits the shared page)
        eng2 = PagedServingEngine(fused_model, TINY, max_slots=1,
                                  num_pages=16, page_size=16,
                                  interpret=True, prefix_cache=True)
        eng2.submit(Request(uid=0, prompt=p1, max_new_tokens=4,
                            temperature=0.0))
        eng2.submit(Request(uid=1, prompt=p2, max_new_tokens=4,
                            temperature=0.0))
        got = {c.uid: c.tokens for c in eng2.run()}
        assert got == ref
