"""CLI, checkpoint round-trip, and HF-import tests."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.utils.checkpoint import (
    load_params, save_params)
from ee274_convexcaldera_llm_quantization_tpu.models import hf_import
from ee274_convexcaldera_llm_quantization_tpu import cli


@pytest.fixture(scope="module")
def tiny_model():
    return llama.init_params(jax.random.PRNGKey(0), TINY)


class TestCheckpoint:
    def test_dense_round_trip(self, tiny_model, tmp_path):
        p = str(tmp_path / "ckpt")
        save_params(p, tiny_model, TINY)
        params2, config2 = load_params(p)
        assert config2 == TINY
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0,
                                  TINY.vocab_size)
        np.testing.assert_allclose(
            np.asarray(llama.forward(tiny_model, toks, TINY)),
            np.asarray(llama.forward(params2, toks, TINY)),
            rtol=1e-5, atol=1e-5)

    def test_compressed_round_trip(self, tiny_model, tmp_path):
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        qparams, _ = compress_model(tiny_model, cp)
        p = str(tmp_path / "qckpt")
        save_params(p, qparams, TINY)
        params2, _ = load_params(p)
        # bit-exact: packed codes are integers
        np.testing.assert_array_equal(
            np.asarray(qparams.layers[0].q_proj.packed),
            np.asarray(params2.layers[0].q_proj.packed))
        toks = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0,
                                  TINY.vocab_size)
        np.testing.assert_allclose(
            np.asarray(llama.forward(qparams, toks, TINY)),
            np.asarray(llama.forward(params2, toks, TINY)),
            rtol=1e-5, atol=1e-5)


class TestHFImport:
    def make_fake_state(self):
        rng = np.random.default_rng(0)
        c = TINY
        state = {}
        for i in range(c.num_layers):
            b = f"model.layers.{i}"
            state[f"{b}.input_layernorm.weight"] = np.ones(c.hidden_size,
                                                           np.float32)
            state[f"{b}.post_attention_layernorm.weight"] = np.ones(
                c.hidden_size, np.float32)
            shapes = {"self_attn.q_proj": (c.q_dim, c.hidden_size),
                      "self_attn.k_proj": (c.kv_dim, c.hidden_size),
                      "self_attn.v_proj": (c.kv_dim, c.hidden_size),
                      "self_attn.o_proj": (c.hidden_size, c.q_dim),
                      "mlp.gate_proj": (c.intermediate_size, c.hidden_size),
                      "mlp.up_proj": (c.intermediate_size, c.hidden_size),
                      "mlp.down_proj": (c.hidden_size, c.intermediate_size)}
            for name, shape in shapes.items():
                state[f"{b}.{name}.weight"] = rng.normal(
                    size=shape).astype(np.float32) * 0.02
                if name.startswith("self_attn.") and \
                        not name.endswith("o_proj"):
                    state[f"{b}.{name}.bias"] = np.zeros(shape[0], np.float32)
        state["model.embed_tokens.weight"] = rng.normal(
            size=(c.vocab_size, c.hidden_size)).astype(np.float32) * 0.02
        state["model.norm.weight"] = np.ones(c.hidden_size, np.float32)
        state["lm_head.weight"] = rng.normal(
            size=(c.vocab_size, c.hidden_size)).astype(np.float32) * 0.02
        return state

    def test_params_from_state_dict(self):
        state = self.make_fake_state()
        params = hf_import.params_from_state_dict(state, TINY)
        assert len(params.layers) == TINY.num_layers
        assert params.layers[0].q_proj.b is not None  # qkv bias imported
        toks = jnp.zeros((1, 4), jnp.int32)
        logits = llama.forward(params, toks, TINY)
        assert np.isfinite(np.asarray(logits)).all()

    def test_config_from_hf(self):
        hf = {"vocab_size": 151936, "hidden_size": 896,
              "intermediate_size": 4864, "num_hidden_layers": 24,
              "num_attention_heads": 14, "num_key_value_heads": 2,
              "rope_theta": 1000000.0, "rms_norm_eps": 1e-6,
              "max_position_embeddings": 32768, "model_type": "qwen2",
              "tie_word_embeddings": True}
        cfg = hf_import.config_from_hf(hf)
        assert cfg.num_kv_heads == 2
        assert cfg.attention_bias  # qwen2 implies attention bias
        assert cfg.head_dim == 64
        assert cfg.tie_word_embeddings

    def test_multimodal_text_config_unwrap(self):
        hf = {"text_config": {"vocab_size": 100, "hidden_size": 64,
                              "intermediate_size": 128,
                              "num_hidden_layers": 2,
                              "num_attention_heads": 4,
                              "model_type": "qwen2"}}
        cfg = hf_import.config_from_hf(hf)
        assert cfg.vocab_size == 100


class TestCLI:
    def test_compress_command(self, capsys):
        cli.main(["compress", "--model", "tiny", "--q-bits", "4",
                  "--rank", "4", "--iters", "1", "--lplr-iters", "1"])
        out = capsys.readouterr().out
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["compressed"] == TINY.num_layers * 7
        assert rec["avg_bits_per_param"] < 16

    def test_eval_command(self, capsys):
        cli.main(["eval", "--model", "tiny", "--synthetic-tokens", "256",
                  "--window", "64"])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["perplexity"] > 1

    def test_calibrate_command(self, capsys, tmp_path):
        out = str(tmp_path / "h.npz")
        cli.main(["calibrate", "--model", "tiny", "--num-batches", "1",
                  "--window", "16", "--output", out])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["layers"] == TINY.num_layers * 7
        assert os.path.exists(out)

    def test_serve_command(self, capsys):
        cli.main(["serve", "--model", "tiny", "--num-requests", "2",
                  "--prompt-len", "4", "--max-new-tokens", "4",
                  "--max-seq-len", "32"])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["requests"] == 2
        assert rec["tokens"] == 8

    def test_compress_save_load(self, capsys, tmp_path):
        out = str(tmp_path / "model")
        cli.main(["compress", "--model", "tiny", "--q-bits", "4",
                  "--rank", "4", "--iters", "1", "--lplr-iters", "1",
                  "--output", out])
        capsys.readouterr()
        params, config = load_params(out)
        assert config == TINY

    def test_serve_fast_and_paged_fused_engines(self, capsys, tmp_path):
        """A w4a8-compressed checkpoint served through --engine fast and
        --engine paged (which auto-fuses to the headline paged path)."""
        out = str(tmp_path / "model")
        cli.main(["compress", "--model", "tiny", "--q-bits", "4",
                  "--rank", "4", "--iters", "1", "--lplr-iters", "1",
                  "--serving-mode", "w4a8", "--output", out])
        capsys.readouterr()
        for engine in ("fast", "paged"):
            cli.main(["serve", "--checkpoint", out, "--engine", engine,
                      "--num-requests", "2", "--prompt-len", "4",
                      "--max-new-tokens", "3", "--max-seq-len", "32",
                      "--num-pages", "8", "--page-size", "16"])
            rec = json.loads(capsys.readouterr().out.strip()
                             .splitlines()[-1])
            assert rec["requests"] == 2
            assert rec["tokens"] == 6

    def test_serve_fast_rejects_uncompressed(self, capsys):
        with pytest.raises(SystemExit, match="w4a8"):
            cli.main(["serve", "--model", "tiny", "--engine", "fast",
                      "--num-requests", "1", "--prompt-len", "4",
                      "--max-new-tokens", "2", "--max-seq-len", "32"])


class TestHeadlineDrift:
    def test_readme_headline_matches_headline_json(self):
        """README (and any doc listed in HEADLINE.json) must carry the
        generated headline block — stale numbers fail the suite (rounds 1
        AND 2 shipped READMEs contradicting the measurement records)."""
        import os
        import subprocess
        import sys
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            [sys.executable, os.path.join(root, "scripts",
                                          "gen_headline.py"), "--check"],
            capture_output=True, text=True)
        assert out.returncode == 0, out.stderr
