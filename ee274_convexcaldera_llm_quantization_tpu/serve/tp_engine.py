"""Tensor-parallel continuous-batching engine over a device mesh.

Same host-side scheduler as :class:`serve.engine.ServingEngine`, with
prefill/decode dispatched through the whole-model TP steps
(``parallel.tp_decode``): Megatron column/row sharding of the stacked W4A8
projections, kv-head-sharded KV cache, two psums per layer. The reference
has no distributed execution of any kind (SURVEY.md section 2.10).

Scaling numbers require real multi-chip hardware; on the CPU host-platform
mesh this validates the full sharded serving loop end to end.
"""

from __future__ import annotations

from jax.sharding import Mesh

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models import stacked
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    KVCache, QuantKVCache)
from ee274_convexcaldera_llm_quantization_tpu.parallel import (
    tp_decode as tpd)
from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine import (
    FastServingEngine)

import jax.numpy as jnp
import numpy as np
import time


class TPServingEngine(FastServingEngine):
    """Continuous batching with every model step sharded over ``mesh``.

    ``params`` is an UNsharded :class:`stacked.StackedModelParams` with
    w4a8 projections; the constructor repacks row-parallel codes and
    places every array on the mesh (``tp_decode.shard_stacked_model_tp``).
    """

    def __init__(self, params: stacked.StackedModelParams,
                 config: ModelConfig, mesh: Mesh, axis: str = "tp",
                 max_slots: int = 8, max_seq_len=None,
                 interpret: bool = False, seed: int = 0,
                 kv_int8: bool = False):
        super().__init__(params, config, max_slots=max_slots,
                         max_seq_len=max_seq_len, interpret=interpret,
                         seed=seed, kv_int8=kv_int8)
        self.mesh = mesh
        self.axis = axis
        self.params = tpd.shard_stacked_model_tp(params, mesh, axis)
        cache_cls = QuantKVCache if kv_int8 else KVCache
        self.cache = tpd.shard_kv_cache_tp(
            cache_cls.create(config, max_slots, self.max_seq_len),
            mesh, axis)

    def _admit(self) -> None:
        from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
            _Slot)
        while self.queue and self.free_slots:
            req = self.queue.popleft()
            slot = self.free_slots.pop()
            n = len(req.prompt)
            bucket = min(self._bucket(n), self.max_seq_len)
            padded = np.zeros(bucket, np.int32)
            padded[:n] = req.prompt
            logits, self.cache = tpd.prefill_into_slot_w4a8_tp(
                self.params, jnp.asarray(padded, jnp.int32)[None, :],
                jnp.asarray(slot), self.cache, self.config, self.mesh,
                axis=self.axis, interpret=self.interpret,
                last_pos=jnp.asarray(n - 1))
            tok = int(self._sample(logits[None, :], req.temperature)[0])
            self.slots[slot] = _Slot(req=req, pos=n, generated=[tok],
                                     start_time=time.time())
            self.tokens_generated += 1
            self._maybe_finish(slot)

    def _decode(self) -> None:
        tokens = np.zeros(self.max_slots, np.int32)
        pos = np.zeros(self.max_slots, np.int32)
        for s, st in self.slots.items():
            tokens[s] = st.generated[-1]
            pos[s] = st.pos
        logits, self.cache = tpd.decode_step_w4a8_tp(
            self.params, jnp.asarray(tokens), jnp.asarray(pos), self.cache,
            self.config, self.mesh, axis=self.axis,
            interpret=self.interpret)
        temps = np.zeros(self.max_slots, np.float32)
        for s, st in self.slots.items():
            temps[s] = st.req.temperature
        sampled = np.asarray(self._sample(logits, temps))
        for s in list(self.slots):
            st = self.slots[s]
            st.generated.append(int(sampled[s]))
            st.pos += 1
            self.tokens_generated += 1
            self._maybe_finish(s)
