"""Production serving engine on the W4A8 fast path.

Same continuous-batching scheduler as :class:`serve.engine.ServingEngine`,
but prefill and decode run the stacked scalar-prefetch W4A8 path
(``models.stacked.decode_step_w4a8`` / ``prefill_into_slot_w4a8``) — the
configuration that reaches ~52% of the HBM roofline on a single chip
(PERFORMANCE.md). Requires a :class:`StackedModelParams` whose projections
are all w4a8 :class:`CalderaLinear` (e.g. from
``compress_model(..., serving_mode="w4a8")`` + ``stack_layers``).
"""

from __future__ import annotations

import functools
import time

import jax.numpy as jnp
import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models import fused, stacked
from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
    ServingEngine, _Slot)


class FastServingEngine(ServingEngine):
    """Continuous batching over the stacked W4A8 decode/prefill steps.

    ``params`` may be a :class:`stacked.StackedModelParams` or the
    fused-projection :class:`fused.FusedStackedParams` (qkv and gate/up in
    one kernel call each — from ``fused.fuse_stacked``).

    ``kv_int8=True`` swaps the bf16 KV cache for the int8
    :class:`llama.QuantKVCache` — half the cache bandwidth (the decode
    bottleneck at long context) and double the context capacity, at the
    cost of per-(token, head) 8-bit rounding of K/V.

    ``flash_attn=True`` (fused params only) uses the head-major int8 cache
    and the flash decode-attention Pallas kernel
    (``ops.attention.flash_decode_q8``): online softmax in VMEM, contiguous
    per-(batch, head) cache DMA, no materialized logits. Implies int8 KV.
    """

    def __init__(self, params, config: ModelConfig, max_slots: int = 8,
                 max_seq_len=None, interpret: bool = False, seed: int = 0,
                 kv_int8: bool = False, flash_attn: bool = False,
                 prefill_chunk: int = 0, staged_kv=None,
                 attn_kernel: str = "auto", mlp_kernel: bool = False):
        super().__init__(params, config, max_slots=max_slots,
                         max_seq_len=max_seq_len, use_pallas=True,
                         interpret=interpret, seed=seed)
        self._fused = isinstance(params, fused.FusedStackedParams)
        self._flash = flash_attn
        # staged KV writes default ON with the flash head-major cache:
        # each layer's new K/V is staged and committed once per step (the
        # ragged-safe staged_kv=True variant — continuous batching decodes
        # at per-slot positions, so the "uniform" lockstep commit does not
        # apply; its runtime guard would fall back every step anyway)
        self._staged = bool(flash_attn) if staged_kv is None else staged_kv
        if attn_kernel == "auto":
            # measured round 3: the all-batch kernel wins at long context
            # (11.77 vs 12.38 ms/step at ctx 2048) and loses slightly at
            # short (8.94 vs 8.81 at ctx 256)
            attn_kernel = "ab" if self.max_seq_len >= 1024 else "row"
        self._attn_kernel = attn_kernel
        self._mlp_kernel = mlp_kernel
        self._chunk = int(prefill_chunk)
        self._prefilling = {}           # slot -> [req, next_offset]
        if self._chunk:
            if not self._fused:
                raise ValueError("prefill_chunk requires fused params")
            if self.max_seq_len % self._chunk:
                raise ValueError(
                    f"max_seq_len {self.max_seq_len} must be a multiple of "
                    f"prefill_chunk {self._chunk} (aligned chunk writes)")
        if flash_attn:
            if not self._fused:
                raise ValueError("flash_attn requires fused params "
                                 "(fused.fuse_stacked)")
            from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
                HeadMajorQuantKVCache)
            self.cache = HeadMajorQuantKVCache.create(config, max_slots,
                                                      self.max_seq_len)
        elif kv_int8:
            from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
                QuantKVCache)
            self.cache = QuantKVCache.create(config, max_slots,
                                             self.max_seq_len)

    def _admit(self) -> None:
        if self._chunk:
            self._admit_chunked()
            return
        if self._fused:
            prefill_fn = functools.partial(fused.prefill_into_slot_fused,
                                           flash=self._flash)
        else:
            prefill_fn = stacked.prefill_into_slot_w4a8
        while self.queue and self.free_slots:
            req = self.queue.popleft()
            slot = self.free_slots.pop()
            n = len(req.prompt)
            bucket = min(self._bucket(n), self.max_seq_len)
            padded = np.zeros(bucket, np.int32)
            padded[:n] = req.prompt
            logits, self.cache = prefill_fn(
                self.params, jnp.asarray(padded, jnp.int32)[None, :],
                jnp.asarray(slot), self.cache, self.config,
                interpret=self.interpret, last_pos=jnp.asarray(n - 1))
            tok = int(self._sample(logits[None, :], req.temperature,
                                   req.top_k, req.top_p)[0])
            st = _Slot(req=req, pos=n, generated=[tok],
                       start_time=time.time())
            self.slots[slot] = st
            self.tokens_generated += 1
            self._maybe_finish(slot)

    def _pending(self) -> bool:
        return bool(self._prefilling)

    def _admit_chunked(self) -> None:
        """Chunked-prefill admission: claim free slots, then advance every
        in-flight prompt by ONE chunk per scheduler tick, so decode steps
        for active slots interleave between chunks (the decode stall per
        tick is bounded by one chunk, not one whole prompt)."""
        while self.queue and self.free_slots:
            req = self.queue.popleft()
            slot = self.free_slots.pop()
            self._prefilling[slot] = [req, 0]
        C = self._chunk
        for slot in list(self._prefilling):
            req, off = self._prefilling[slot]
            n = len(req.prompt)
            end = min(off + C, n)
            chunk = np.zeros(C, np.int32)
            chunk[:end - off] = req.prompt[off:end]
            is_last = end >= n
            logits, self.cache = fused.prefill_chunk_fused(
                self.params, jnp.asarray(chunk)[None, :], jnp.asarray(slot),
                jnp.asarray(off), self.cache, self.config,
                interpret=self.interpret,
                last_pos=jnp.asarray((n - 1 - off) if is_last else 0))
            if is_last:
                del self._prefilling[slot]
                tok = int(self._sample(logits[None, :], req.temperature,
                                       req.top_k, req.top_p)[0])
                self.slots[slot] = _Slot(req=req, pos=n, generated=[tok],
                                         start_time=time.time())
                self.tokens_generated += 1
                self._maybe_finish(slot)
            else:
                self._prefilling[slot][1] = end

    def _decode(self) -> None:
        tokens = np.zeros(self.max_slots, np.int32)
        pos = np.zeros(self.max_slots, np.int32)
        for s, st in self.slots.items():
            tokens[s] = st.generated[-1]
            pos[s] = st.pos
        if self._fused:
            logits, self.cache = fused.decode_step_fused(
                self.params, jnp.asarray(tokens), jnp.asarray(pos),
                self.cache, self.config, interpret=self.interpret,
                staged_kv=self._staged if self._flash else False,
                attn_kernel=self._attn_kernel if self._flash else "row",
                mlp_kernel=self._mlp_kernel)
        else:
            logits, self.cache = stacked.decode_step_w4a8(
                self.params, jnp.asarray(tokens), jnp.asarray(pos),
                self.cache, self.config, interpret=self.interpret)
        temps = np.zeros(self.max_slots, np.float32)
        ks = np.zeros(self.max_slots, np.int32)
        ps = np.ones(self.max_slots, np.float32)
        for s, st in self.slots.items():
            temps[s] = st.req.temperature
            ks[s] = st.req.top_k
            ps[s] = st.req.top_p
        sampled = np.asarray(self._sample(logits, temps, ks, ps))
        for s in list(self.slots):
            st = self.slots[s]
            st.generated.append(int(sampled[s]))
            st.pos += 1
            self.tokens_generated += 1
            self._maybe_finish(s)
