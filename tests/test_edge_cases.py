"""Edge-case hardening: checkpoint of mixed-precision models, page-boundary
serving, context-limit decode, HF import from a fake checkpoint dir."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model_with_budget)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)


@pytest.fixture(scope="module")
def tiny_model():
    return llama.init_params(jax.random.PRNGKey(0), TINY)


class TestMixedPrecisionCheckpoint:
    def test_budget_mixed_model_round_trips(self, tiny_model, tmp_path):
        from ee274_convexcaldera_llm_quantization_tpu.utils.checkpoint import (
            load_params, save_params)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        qp, report, alloc = compress_model_with_budget(
            tiny_model, cp, B_tot=3.0, menu=(2, 4, 8))
        assert len({int(b) for b in alloc.bits.values()}) >= 2
        p = str(tmp_path / "mixed")
        save_params(p, qp, TINY)
        qp2, _ = load_params(p)
        # per-layer bit widths preserved
        for i, lp in enumerate(qp.layers):
            assert qp2.layers[i].q_proj.num_bits == lp.q_proj.num_bits
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0,
                                  TINY.vocab_size)
        np.testing.assert_allclose(
            np.asarray(llama.forward(qp, toks, TINY)),
            np.asarray(llama.forward(qp2, toks, TINY)), rtol=1e-5,
            atol=1e-5)


class TestPageBoundaries:
    def test_generation_across_page_boundaries(self, tiny_model):
        # prompt of 7 with page_size 4: decode crosses a boundary at token 8
        from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
            Request, ServingEngine)
        from ee274_convexcaldera_llm_quantization_tpu.serve.paged_engine import (
            PagedServingEngine)
        rng = np.random.default_rng(0)
        prompt = rng.integers(0, TINY.vocab_size, size=7)
        ref_eng = ServingEngine(tiny_model, TINY, max_slots=1,
                                max_seq_len=32)
        ref_eng.submit(Request(uid=0, prompt=prompt, max_new_tokens=10))
        ref = ref_eng.run()[0].tokens
        pag = PagedServingEngine(tiny_model, TINY, max_slots=1, num_pages=8,
                                 page_size=4, max_pages_per_seq=5)
        pag.submit(Request(uid=0, prompt=prompt, max_new_tokens=10))
        out = pag.run()[0].tokens
        assert out == ref

    def test_prompt_exactly_page_multiple(self, tiny_model):
        from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
            Request)
        from ee274_convexcaldera_llm_quantization_tpu.serve.paged_engine import (
            PagedServingEngine)
        rng = np.random.default_rng(1)
        pag = PagedServingEngine(tiny_model, TINY, max_slots=1, num_pages=8,
                                 page_size=4, max_pages_per_seq=4)
        pag.submit(Request(uid=0,
                           prompt=rng.integers(0, TINY.vocab_size, size=8),
                           max_new_tokens=3))
        out = pag.run()
        assert len(out[0].tokens) == 3


class TestContextLimits:
    def test_decode_at_last_cache_position(self, tiny_model):
        # writing at pos = T-1 must not go out of bounds
        cache = llama.KVCache.create(TINY, 1, 16)
        tok = jnp.asarray([3], jnp.int32)
        logits, cache = llama.decode_step_batched(
            tiny_model, tok, jnp.asarray([15], jnp.int32), cache, TINY)
        assert np.isfinite(np.asarray(logits)).all()

    def test_engine_fills_exact_capacity(self, tiny_model):
        from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
            Request, ServingEngine)
        eng = ServingEngine(tiny_model, TINY, max_slots=1, max_seq_len=16)
        prompt = np.zeros(8, np.int32)
        eng.submit(Request(uid=0, prompt=prompt, max_new_tokens=8))
        done = eng.run()
        assert len(done[0].tokens) == 8


class TestHFImportDir:
    def test_config_json_plus_bin_checkpoint(self, tmp_path, tiny_model):
        # write a fake HF checkpoint dir (torch .bin path) and load it back
        import torch
        from ee274_convexcaldera_llm_quantization_tpu.models.hf_import import (
            load_hf_checkpoint)
        c = TINY
        hf_config = {
            "vocab_size": c.vocab_size, "hidden_size": c.hidden_size,
            "intermediate_size": c.intermediate_size,
            "num_hidden_layers": c.num_layers,
            "num_attention_heads": c.num_heads,
            "num_key_value_heads": c.num_kv_heads,
            "head_dim": c.head_dim,
            "rope_theta": c.rope_theta, "rms_norm_eps": c.rms_norm_eps,
            "max_position_embeddings": c.max_seq_len,
            "model_type": "llama", "attention_bias": False,
            "tie_word_embeddings": False,
        }
        with open(tmp_path / "config.json", "w") as f:
            json.dump(hf_config, f)
        sd = {}
        proj_map = {"q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
                    "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
                    "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
                    "down_proj": "mlp.down_proj"}
        for i, lp in enumerate(tiny_model.layers):
            b = f"model.layers.{i}"
            sd[f"{b}.input_layernorm.weight"] = torch.from_numpy(
                np.asarray(lp.attn_norm, np.float32))
            sd[f"{b}.post_attention_layernorm.weight"] = torch.from_numpy(
                np.asarray(lp.mlp_norm, np.float32))
            for ours, hf in proj_map.items():
                sd[f"{b}.{hf}.weight"] = torch.from_numpy(
                    np.asarray(getattr(lp, ours).w, np.float32))
        sd["model.embed_tokens.weight"] = torch.from_numpy(
            np.asarray(tiny_model.embed, np.float32))
        sd["model.norm.weight"] = torch.from_numpy(
            np.asarray(tiny_model.final_norm, np.float32))
        sd["lm_head.weight"] = torch.from_numpy(
            np.asarray(tiny_model.lm_head.w, np.float32))
        torch.save(sd, tmp_path / "pytorch_model.bin")

        params, config = load_hf_checkpoint(str(tmp_path))
        assert config == TINY
        toks = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0,
                                  TINY.vocab_size)
        np.testing.assert_allclose(
            np.asarray(llama.forward(params, toks, TINY)),
            np.asarray(llama.forward(tiny_model, toks, TINY)),
            rtol=2e-2, atol=2e-2)  # bf16 save/load round trip
