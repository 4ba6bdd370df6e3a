"""HuggingFace checkpoint import (local directories; zero-egress safe).

Maps a local HF Llama/Qwen2 checkpoint (``config.json`` +
``*.safetensors`` / ``pytorch_model*.bin``) onto :class:`ModelParams`. The
reference loads its model with stock HF ``from_pretrained``
(``main.py:261-266``); this importer covers the same weight schema,
including the LLaVA-OneVision language tower (keys prefixed
``language_model.``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    DenseLinear)
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    LayerParams, ModelParams)

_HF_PROJ = {
    "q_proj": "self_attn.q_proj",
    "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj",
    "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj",
    "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}


def config_from_hf(hf: dict) -> ModelConfig:
    """Translate an HF ``config.json`` (LlamaConfig/Qwen2Config schema)."""
    if "text_config" in hf:            # multimodal wrapper (LLaVA-OneVision)
        hf = hf["text_config"]
    num_heads = hf["num_attention_heads"]
    head_dim = hf.get("head_dim") or hf["hidden_size"] // num_heads
    return ModelConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=num_heads,
        num_kv_heads=hf.get("num_key_value_heads", num_heads),
        head_dim=head_dim,
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        max_seq_len=hf.get("max_position_embeddings", 4096),
        attention_bias=hf.get("attention_bias",
                              hf.get("model_type") == "qwen2"),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read all safetensors / torch-bin shards in a checkpoint dir."""
    state: Dict[str, np.ndarray] = {}
    st_files = sorted(f for f in os.listdir(path)
                      if f.endswith(".safetensors"))
    if st_files:
        from safetensors import safe_open
        for fname in st_files:
            with safe_open(os.path.join(path, fname), framework="np") as f:
                for k in f.keys():
                    state[k] = f.get_tensor(k)
        return state
    bin_files = sorted(f for f in os.listdir(path)
                       if f.startswith("pytorch_model") and
                       f.endswith(".bin"))
    if bin_files:
        import torch
        for fname in bin_files:
            sd = torch.load(os.path.join(path, fname), map_location="cpu",
                            weights_only=True)
            for k, v in sd.items():
                state[k] = v.float().numpy()
        return state
    raise FileNotFoundError(f"no safetensors/bin weights under {path}")


def _strip_prefix(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize key prefixes: ``model.`` / ``language_model.model.`` etc."""
    out = {}
    for k, v in state.items():
        for prefix in ("language_model.model.", "language_model.", "model.",
                       ""):
            if k.startswith(prefix):
                out[k[len(prefix):]] = v
                break
    return out


def params_from_state_dict(state: Dict[str, np.ndarray],
                           config: ModelConfig,
                           dtype=None) -> ModelParams:
    """Build ModelParams from a normalized HF state dict (numpy values)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.bfloat16
    state = _strip_prefix(state)

    def lin(prefix):
        w = jnp.asarray(state[f"{prefix}.weight"], dtype)
        b = None
        if f"{prefix}.bias" in state:
            b = jnp.asarray(state[f"{prefix}.bias"], jnp.float32)
        return DenseLinear(w=w, b=b)

    layers = []
    for i in range(config.num_layers):
        base = f"layers.{i}"
        fields = dict(
            attn_norm=jnp.asarray(state[f"{base}.input_layernorm.weight"],
                                  jnp.float32),
            mlp_norm=jnp.asarray(
                state[f"{base}.post_attention_layernorm.weight"],
                jnp.float32),
        )
        for ours, hf in _HF_PROJ.items():
            fields[ours] = lin(f"{base}.{hf}")
        layers.append(LayerParams(**fields))

    embed = jnp.asarray(state["embed_tokens.weight"], dtype)
    lm_head = None
    if not config.tie_word_embeddings and "lm_head.weight" in state:
        lm_head = DenseLinear(w=jnp.asarray(state["lm_head.weight"], dtype))
    return ModelParams(
        embed=embed, layers=layers,
        final_norm=jnp.asarray(state["norm.weight"], jnp.float32),
        lm_head=lm_head)


def load_hf_checkpoint(path: str,
                       dtype=None) -> Tuple[ModelParams, ModelConfig]:
    """Load a local HF checkpoint directory."""
    with open(os.path.join(path, "config.json")) as f:
        config = config_from_hf(json.load(f))
    state = _load_state_dict(path)
    return params_from_state_dict(state, config, dtype), config
