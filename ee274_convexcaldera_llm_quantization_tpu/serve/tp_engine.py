"""Tensor-parallel continuous-batching engine over a device mesh.

Same host-side scheduler as :class:`serve.engine.ServingEngine`, with
prefill/decode dispatched through whole-model TP steps. The default
(``fused=True``, round 4) serves the HEADLINE step under TP —
``parallel.tp_fused`` shards ``models.fused.decode_step_fused`` itself
(fused qkv/gate-up, flash decode attention, int8 head-major KV, staged
per-row KV commits, int8 factors), measured bit-exact at tp=1 on the
real chip with -0.2% overhead vs the single-chip step
(``scripts/exp_tp_fused_chip.py``). ``fused=False`` keeps the round-1
stacked path (``parallel.tp_decode``) for bf16-KV serving.

The reference has no distributed execution of any kind (SURVEY.md
section 2.10). Scaling numbers require real multi-chip hardware; on the
CPU host-platform mesh this validates the full sharded serving loop end
to end.
"""

from __future__ import annotations

from jax.sharding import Mesh

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models import (
    fused as fusedm, stacked)
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    HeadMajorQuantKVCache, KVCache, QuantKVCache)
from ee274_convexcaldera_llm_quantization_tpu.parallel import (
    tp_decode as tpd, tp_fused as tpf)
from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine import (
    FastServingEngine)

import jax.numpy as jnp
import numpy as np
import time


class TPServingEngine(FastServingEngine):
    """Continuous batching with every model step sharded over ``mesh``.

    ``params`` is an UNsharded :class:`stacked.StackedModelParams` with
    w4a8 projections; the constructor fuses + repacks + places every
    array on the mesh. ``fused=True`` (default) serves the headline
    fused step (int8 head-major KV implied — ``kv_int8`` is ignored);
    ``fused=False`` serves the stacked step with bf16 or int8-per-token
    KV per ``kv_int8``.
    """

    def __init__(self, params: stacked.StackedModelParams,
                 config: ModelConfig, mesh: Mesh, axis: str = "tp",
                 max_slots: int = 8, max_seq_len=None,
                 interpret: bool = False, seed: int = 0,
                 kv_int8: bool = False, fused: bool = True):
        super().__init__(params, config, max_slots=max_slots,
                         max_seq_len=max_seq_len, interpret=interpret,
                         seed=seed, kv_int8=kv_int8)
        self.mesh = mesh
        self.axis = axis
        self.fused = fused
        if fused:
            fp = fusedm.quantize_factors_int8_fused(
                fusedm.fuse_stacked(params))
            self.params = tpf.shard_fused_model_tp(fp, mesh, axis)
            self.cache = tpf.shard_headmajor_cache_tp(
                HeadMajorQuantKVCache.create(config, max_slots,
                                             self.max_seq_len), mesh, axis)
        else:
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
            if self.fused:
                logits, self.cache = tpf.prefill_into_slot_fused_tp(
                    self.params, jnp.asarray(padded, jnp.int32)[None, :],
                    jnp.asarray(slot), self.cache, self.config, self.mesh,
                    axis=self.axis, interpret=self.interpret,
                    last_pos=jnp.asarray(n - 1))
            else:
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
        if self.fused:
            # staged_kv=True (ragged-safe per-row commits): continuous
            # batching decodes slots at different positions
            logits, self.cache = tpf.decode_step_fused_tp(
                self.params, jnp.asarray(tokens), jnp.asarray(pos),
                self.cache, self.config, self.mesh, axis=self.axis,
                interpret=self.interpret, staged_kv=True)
        else:
            logits, self.cache = tpd.decode_step_w4a8_tp(
                self.params, jnp.asarray(tokens), jnp.asarray(pos),
                self.cache, self.config, self.mesh, axis=self.axis,
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
