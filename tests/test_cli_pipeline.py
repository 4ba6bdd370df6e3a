"""End-to-end CLI pipeline on a real-format (HF) checkpoint (VERDICT r1 #4).

Proves the composition the reference drives through ``main.py``
(load HF checkpoint -> calibrate -> quantize -> evaluate,
ref ``main.py:135-251,340-404``) works through OUR surfaces: a local
safetensors+config.json checkpoint directory goes through
``ccq calibrate`` -> ``ccq compress --q-bits 2 --serving-quant e8p
--output ckpt`` -> ``ccq eval --checkpoint ckpt``, entirely via
``cli.main(argv)``.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu import cli
from ee274_convexcaldera_llm_quantization_tpu.models import hf_export, llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.hf_import import (
    load_hf_checkpoint)


def test_hf_export_import_round_trip(tmp_path):
    params = llama.init_params(jax.random.PRNGKey(0), TINY)
    hf_dir = str(tmp_path / "hf")
    hf_export.save_hf_checkpoint(hf_dir, params, TINY)
    assert os.path.exists(os.path.join(hf_dir, "config.json"))
    assert os.path.exists(os.path.join(hf_dir, "model.safetensors"))
    params2, config2 = load_hf_checkpoint(hf_dir, dtype=jnp.float32)
    assert config2 == TINY
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, TINY.vocab_size, (2, 16)),
        jnp.int32)
    l1 = llama.forward(params, toks, TINY)
    l2 = llama.forward(params2, toks, TINY)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-2, atol=2e-2)   # bf16 -> f32 storage


def test_cli_pipeline_hf_compress_checkpoint_eval(tmp_path, capsys):
    # real-format checkpoint: init tiny params, write safetensors dir
    params = llama.init_params(jax.random.PRNGKey(1), TINY)
    hf_dir = str(tmp_path / "hf")
    hf_export.save_hf_checkpoint(hf_dir, params, TINY)

    # token stream shared by all evals
    stream = np.random.default_rng(1).integers(0, TINY.vocab_size, 2048)
    tok_path = str(tmp_path / "stream.npy")
    np.save(tok_path, stream)

    # 1. calibrate Hessians from the HF dir
    hess_path = str(tmp_path / "hess.npz")
    cli.main(["calibrate", "--model", hf_dir, "--num-batches", "2",
              "--batch-size", "2", "--window", "32",
              "--output", hess_path])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["layers"] > 0

    # 2. compress at 2-bit e8p (the reference's flagship regime,
    #    main.py:168-196) and save a framework checkpoint
    ckpt = str(tmp_path / "ckpt_2bit_e8p")
    cli.main(["compress", "--model", hf_dir, "--hessians", hess_path,
              "--q-bits", "2", "--rank", "8", "--iters", "1",
              "--lplr-iters", "1", "--serving-mode", "w4a8",
              "--serving-quant", "e8p", "--output", ckpt])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compressed"] > 0
    assert out["avg_bits_per_param"] < 8.0

    # 3. evaluate dense vs compressed THROUGH the CLI checkpoint path
    cli.main(["eval", "--model", hf_dir, "--tokens", tok_path,
              "--window", "128"])
    dense = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cli.main(["eval", "--checkpoint", ckpt, "--tokens", tok_path,
              "--window", "128"])
    comp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert np.isfinite(dense["perplexity"]) and np.isfinite(
        comp["perplexity"])
    # untrained model on uniform tokens: both sit near vocab_size; the
    # compressed model must stay in the same regime (no blow-up)
    assert comp["perplexity"] < 4 * dense["perplexity"]
