"""Chunked prefill: chunk-by-chunk cache writes + cross-chunk attention
must reproduce the one-shot prefill, and the fast engine must interleave
decode steps between chunks."""

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
from ee274_convexcaldera_llm_quantization_tpu.serve.engine import Request
from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine import (
    FastServingEngine)


@pytest.fixture(scope="module")
def fused_model():
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
    return fusedm.fuse_stacked(stacked.stack_layers(model))


def _prompt(n, seed=3):
    return np.asarray(
        jax.random.randint(jax.random.PRNGKey(seed), (n,), 1,
                           TINY.vocab_size), np.int32)


CACHES = {
    "bf16": (llama.KVCache, 5e-2),
    "int8": (llama.QuantKVCache, 8e-2),
    "head_major": (llama.HeadMajorQuantKVCache, 8e-2),
}


class TestChunkVsOneShot:
    @pytest.mark.parametrize("kind", list(CACHES))
    def test_logits_match(self, fused_model, kind):
        cls, tol = CACHES[kind]
        prompt = _prompt(16)
        ref, ref_cache = fusedm.prefill_into_slot_fused(
            fused_model, jnp.asarray(prompt)[None, :], jnp.asarray(0),
            cls.create(TINY, 2, 32), TINY, interpret=True,
            last_pos=jnp.asarray(15))
        cache = cls.create(TINY, 2, 32)
        for off in (0, 8):
            chunk = jnp.asarray(prompt[off:off + 8])[None, :]
            logits, cache = fusedm.prefill_chunk_fused(
                fused_model, chunk, jnp.asarray(0), jnp.asarray(off), cache,
                TINY, interpret=True,
                last_pos=jnp.asarray(7 if off == 8 else 0))
        # one-shot attends exact K/V; chunked attends the cache-resident
        # (rounded) K/V -> small dtype-floor differences
        rel = (np.linalg.norm(np.asarray(logits) - np.asarray(ref))
               / np.linalg.norm(np.asarray(ref)))
        assert rel < tol, rel
        # layer 0 sees identical inputs in both paths -> bit-identical codes;
        # deeper layers drift by the attention dtype floor, so compare the
        # (dequantized) values by norm
        np.testing.assert_array_equal(np.asarray(cache.k[0, 0]),
                                      np.asarray(ref_cache.k[0, 0]))

        def deq(c):
            if hasattr(c, "k_scale"):
                if kind == "head_major":     # (L, B, KVH, T) scales
                    return (np.asarray(c.k[:, 0], np.float32)
                            * np.asarray(c.k_scale[:, 0])[..., None])
                return (np.asarray(c.k[:, 0], np.float32)
                        * np.asarray(c.k_scale[:, 0])[..., None])
            return np.asarray(c.k[:, 0], np.float32)

        a, b = deq(cache), deq(ref_cache)
        rel_c = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert rel_c < tol, rel_c

    def test_uneven_tail_chunk(self, fused_model):
        """Prompt length not a multiple of the chunk: padded tail chunk."""
        prompt = _prompt(11)
        ref, _ = fusedm.prefill_into_slot_fused(
            fused_model, jnp.asarray(np.pad(prompt, (0, 5)))[None, :],
            jnp.asarray(1), llama.KVCache.create(TINY, 2, 32), TINY,
            interpret=True, last_pos=jnp.asarray(10))
        cache = llama.KVCache.create(TINY, 2, 32)
        for off in (0, 8):
            chunk = np.zeros(8, np.int32)
            end = min(off + 8, 11)
            chunk[:end - off] = prompt[off:end]
            logits, cache = fusedm.prefill_chunk_fused(
                fused_model, jnp.asarray(chunk)[None, :], jnp.asarray(1),
                jnp.asarray(off), cache, TINY, interpret=True,
                last_pos=jnp.asarray(10 - off if off == 8 else 0))
        rel = (np.linalg.norm(np.asarray(logits) - np.asarray(ref))
               / np.linalg.norm(np.asarray(ref)))
        assert rel < 5e-2, rel


class TestEngineChunked:
    def test_generation_matches_unchunked(self, fused_model):
        prompt = _prompt(20)
        outs = []
        for chunk in (0, 8):
            eng = FastServingEngine(fused_model, TINY, max_slots=2,
                                    max_seq_len=32, interpret=True,
                                    prefill_chunk=chunk)
            eng.submit(Request(uid=0, prompt=prompt, max_new_tokens=5))
            outs.append(eng.run()[0].tokens)
        assert outs[0] == outs[1]

    def test_decode_interleaves_with_chunks(self, fused_model):
        """While a long prompt prefills chunk-by-chunk, an active short
        request keeps decoding every tick."""
        eng = FastServingEngine(fused_model, TINY, max_slots=2,
                                max_seq_len=32, interpret=True,
                                prefill_chunk=8)
        eng.submit(Request(uid=0, prompt=_prompt(3), max_new_tokens=8))
        eng.step()                           # admit + first decode of uid 0
        assert len(eng.slots) == 1
        gen_before = len(next(iter(eng.slots.values())).generated)
        eng.submit(Request(uid=1, prompt=_prompt(24, seed=5),
                           max_new_tokens=2))
        eng.step()                           # chunk 1/3 of uid 1 + decode
        assert eng._pending()                # uid 1 still prefilling
        gen_after = len(next(iter(
            st for st in eng.slots.values() if st.req.uid == 0)).generated)
        assert gen_after == gen_before + 1   # uid 0 decoded during the chunk
        done = eng.run()
        assert sorted(c.uid for c in done) == [0, 1]

    def test_rejects_misaligned_chunk(self, fused_model):
        with pytest.raises(ValueError, match="multiple of"):
            FastServingEngine(fused_model, TINY, max_slots=1,
                              max_seq_len=30, interpret=True,
                              prefill_chunk=8)
