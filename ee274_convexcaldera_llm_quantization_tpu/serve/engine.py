"""Serving engine: continuous batching over a slotted KV cache.

The reference has no serving path at all — it rewrites dense weights and
calls HF ``model.generate`` per example (``main.py:358``). This engine is
the TPU-native serving story:

- a fixed pool of ``max_slots`` batch slots backed by one static-shape KV
  cache (shape never changes => the decode step jits exactly once);
- host-side scheduler: admit queued requests into free slots (prefill one
  sequence into its slot), then run batched decode steps over all active
  slots with per-slot positions (``models.llama.decode_step_batched``);
- greedy or temperature sampling; per-slot EOS / max-token termination;
- requests arrive and retire continuously — a finishing sequence frees its
  slot for the next queued prompt without stopping the batch.

The slot allocator is deliberately separable: the C++ runtime
(``runtime/``) provides the same interface for the paged-cache engine.
"""

from __future__ import annotations

import collections
import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models import llama


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray                  # (S,) int32
    max_new_tokens: int = 64
    temperature: float = 0.0            # 0 => greedy
    top_k: int = 0                      # 0 => disabled
    top_p: float = 1.0                  # 1 => disabled
    eos_token: Optional[int] = None
    priority: int = 0                   # higher admits first (paged engine)
    tenant: int = 0                     # fair-share accounting id


@dataclasses.dataclass
class Completion:
    uid: int
    tokens: List[int]
    prompt_len: int
    finished_reason: str                # "eos" | "length"
    latency_s: float = 0.0


@dataclasses.dataclass
class _Slot:
    req: Request
    pos: int                            # next write position in the cache
    generated: List[int]
    start_time: float


class ServingEngine:
    """Continuous-batching engine over a fixed slot pool."""

    def __init__(self, params, config: ModelConfig, max_slots: int = 8,
                 max_seq_len: Optional[int] = None,
                 use_pallas: Optional[bool] = None,
                 interpret: bool = False, seed: int = 0):
        self.params = params
        self.config = config
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len or config.max_seq_len
        if use_pallas is None:   # auto-detect: Pallas kernels on TPU
            use_pallas = jax.devices()[0].platform in ("tpu", "axon")
        self.use_pallas = use_pallas
        self.interpret = interpret
        self.cache = llama.KVCache.create(config, max_slots, self.max_seq_len)
        self.queue: collections.deque[Request] = collections.deque()
        self.slots: Dict[int, _Slot] = {}
        self.free_slots = list(range(max_slots))[::-1]
        self.completions: List[Completion] = []
        self._key = jax.random.PRNGKey(seed)
        self.steps = 0
        self.tokens_generated = 0

    # -- public API ---------------------------------------------------------

    def validate(self, req: Request) -> None:
        """Raise ValueError if the request can never be served (pure read —
        safe to call from any thread, used by the HTTP front-end for
        synchronous 400s)."""
        if len(req.prompt) + req.max_new_tokens > self.max_seq_len:
            raise ValueError(
                f"request {req.uid}: prompt {len(req.prompt)} + "
                f"{req.max_new_tokens} new tokens exceeds max_seq_len "
                f"{self.max_seq_len}")

    def submit(self, req: Request) -> None:
        self.validate(req)
        self.queue.append(req)

    def busy(self) -> bool:
        """Work pending? (generic engine interface for the HTTP runner)."""
        return bool(self.queue or self.slots or self._pending())

    def live_generated(self):
        """uid -> tokens committed so far for in-flight requests (snapshot
        source for streaming responses)."""
        return {st.req.uid: st.generated for st in self.slots.values()}

    def run(self, max_steps: Optional[int] = None) -> List[Completion]:
        """Run until every submitted request completes."""
        steps = 0
        while (self.queue or self.slots or self._pending()) and \
                (max_steps is None or steps < max_steps):
            self.step()
            steps += 1
        done, self.completions = self.completions, []
        return done

    def _pending(self) -> bool:
        """Extra in-flight work beyond queue/slots (subclass hook — e.g.
        partially prefilled chunked prompts)."""
        return False

    def step(self) -> None:
        """One scheduler tick: admit + one batched decode step."""
        self._admit()
        if self.slots:
            self._decode()
        self.steps += 1

    # -- internals ----------------------------------------------------------

    @staticmethod
    def _bucket(n: int) -> int:
        """Round a prompt length up to a power of two: the prefill step is
        jitted per sequence length, so bucketing bounds the number of
        compilations at log2(max_seq_len) instead of one per unique length."""
        b = 8
        while b < n:
            b *= 2
        return b

    def _admit(self) -> None:
        while self.queue and self.free_slots:
            req = self.queue.popleft()
            slot = self.free_slots.pop()
            n = len(req.prompt)
            bucket = min(self._bucket(n), self.max_seq_len)
            # right-pad to the bucket: pad K/V beyond the real prompt is
            # causally invisible (decode at position p attends <= p, and
            # each decode step overwrites its pad slot before exposing it);
            # logits are taken at the true last prompt position
            padded = np.zeros(bucket, np.int32)
            padded[:n] = req.prompt
            prompt = jnp.asarray(padded, jnp.int32)[None, :]
            logits, self.cache = llama.prefill_into_slot(
                self.params, prompt, jnp.asarray(slot), self.cache,
                self.config, self.use_pallas, self.interpret,
                last_pos=jnp.asarray(n - 1))
            tok = int(self._sample(logits[None, :], req.temperature,
                                   req.top_k, req.top_p)[0])
            st = _Slot(req=req, pos=len(req.prompt), generated=[tok],
                       start_time=time.time())
            self.slots[slot] = st
            self.tokens_generated += 1
            self._maybe_finish(slot)

    def _decode(self) -> None:
        """Batched decode over active slots (inactive slots run masked)."""
        tokens = np.zeros(self.max_slots, np.int32)
        pos = np.zeros(self.max_slots, np.int32)
        for s, st in self.slots.items():
            tokens[s] = st.generated[-1]
            pos[s] = st.pos
        logits, self.cache = llama.decode_step_batched(
            self.params, jnp.asarray(tokens), jnp.asarray(pos), self.cache,
            self.config, self.use_pallas, self.interpret)
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

    def _sample(self, logits, temperature, top_k=0, top_p=1.0):
        """Greedy when temperature <= 0, else temperature sampling with
        optional per-row top-k / top-p filtering (see serve.sampling)."""
        from ee274_convexcaldera_llm_quantization_tpu.serve import sampling
        temps = jnp.atleast_1d(jnp.asarray(temperature, jnp.float32))
        self._key, sub = jax.random.split(self._key)
        return sampling.sample_logits(
            sub, logits, temps, jnp.atleast_1d(jnp.asarray(top_k, jnp.int32)),
            jnp.atleast_1d(jnp.asarray(top_p, jnp.float32)))

    def _maybe_finish(self, slot: int) -> None:
        st = self.slots[slot]
        req = st.req
        reason = None
        if req.eos_token is not None and st.generated[-1] == req.eos_token:
            reason = "eos"
        elif len(st.generated) >= req.max_new_tokens:
            reason = "length"
        if reason:
            self.completions.append(Completion(
                uid=req.uid, tokens=list(st.generated),
                prompt_len=len(req.prompt), finished_reason=reason,
                latency_s=time.time() - st.start_time))
            del self.slots[slot]
            self.free_slots.append(slot)
