"""HuggingFace checkpoint export (local directories; zero-egress safe).

Inverse of :mod:`models.hf_import`: writes :class:`ModelParams` (dense
linears) to a standard HF Llama/Qwen2 checkpoint directory —
``config.json`` + ``model.safetensors`` — so the full offline pipeline can
be driven end to end against a *real-format* checkpoint even in an
offline image (train a tiny model, export, then ``ccq compress`` /
``ccq eval`` consume the directory exactly as they would a downloaded
Llama-2 snapshot; reference ``main.py:261-266`` loads with stock
``from_pretrained``).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    DenseLinear)
from ee274_convexcaldera_llm_quantization_tpu.models.hf_import import _HF_PROJ
from ee274_convexcaldera_llm_quantization_tpu.models.llama import ModelParams


def config_to_hf(config: ModelConfig, model_type: str = "llama") -> dict:
    """Translate :class:`ModelConfig` to the HF LlamaConfig/Qwen2Config
    schema (the exact keys ``hf_import.config_from_hf`` reads back)."""
    return {
        "model_type": model_type,
        "architectures": ["LlamaForCausalLM" if model_type == "llama"
                          else "Qwen2ForCausalLM"],
        "vocab_size": config.vocab_size,
        "hidden_size": config.hidden_size,
        "intermediate_size": config.intermediate_size,
        "num_hidden_layers": config.num_layers,
        "num_attention_heads": config.num_heads,
        "num_key_value_heads": config.num_kv_heads,
        "head_dim": config.head_dim,
        "rope_theta": config.rope_theta,
        "rms_norm_eps": config.rms_norm_eps,
        "max_position_embeddings": config.max_seq_len,
        "attention_bias": config.attention_bias,
        "tie_word_embeddings": config.tie_word_embeddings,
        "torch_dtype": "float32",
    }


def save_hf_checkpoint(path: str, params: ModelParams, config: ModelConfig,
                       model_type: str = "llama") -> None:
    """Write ``config.json`` + ``model.safetensors`` in HF Llama layout.

    Requires dense (uncompressed) params — HF checkpoints carry dense
    weights; compressed models round-trip through
    :mod:`utils.checkpoint` instead.
    """
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    state = {}

    def put_linear(key: str, lin) -> None:
        if not isinstance(lin, DenseLinear):
            raise ValueError(
                f"{key}: HF export requires dense weights, got "
                f"{type(lin).__name__} (use utils.checkpoint for "
                "compressed models)")
        state[f"{key}.weight"] = np.asarray(lin.w, np.float32)
        if lin.b is not None:
            state[f"{key}.bias"] = np.asarray(lin.b, np.float32)

    state["model.embed_tokens.weight"] = np.asarray(params.embed, np.float32)
    for i, lp in enumerate(params.layers):
        base = f"model.layers.{i}"
        state[f"{base}.input_layernorm.weight"] = np.asarray(
            lp.attn_norm, np.float32)
        state[f"{base}.post_attention_layernorm.weight"] = np.asarray(
            lp.mlp_norm, np.float32)
        for ours, hf in _HF_PROJ.items():
            put_linear(f"{base}.{hf}", getattr(lp, ours))
    state["model.norm.weight"] = np.asarray(params.final_norm, np.float32)
    if params.lm_head is not None and not config.tie_word_embeddings:
        put_linear("lm_head", params.lm_head)

    save_file(state, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config_to_hf(config, model_type), f, indent=2)
