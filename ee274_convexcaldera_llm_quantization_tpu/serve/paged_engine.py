"""Paged serving engine: native C++ scheduler/allocator + paged decode.

Combines :mod:`serve.runtime` (C++ page allocator + admission control) with
:mod:`serve.paged` (device-side paged KV pool and steps). Compared to the
slotted :class:`serve.engine.ServingEngine`, KV memory is bounded by the
page pool, not ``max_slots * max_seq_len`` — long-context and many-slot
configurations share one pool with no per-slot reservation.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.serve import paged
from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
    Completion, Request)
from ee274_convexcaldera_llm_quantization_tpu.serve.runtime import (
    NativeScheduler, PageAllocator)


class PagedServingEngine:
    """Paged continuous batching.

    ``params`` selects the serving path:

    - :class:`models.fused.FusedStackedParams` (round 4, the headline
      step): fused W4A8 Pallas projections, int8 paged KV pool
      (:class:`serve.paged.PagedQuantKVPool`), paged flash decode
      attention with the page table as scalar prefetch, staged commits.
      The pool carries ONE extra scratch page the allocator never hands
      out (inactive batch rows' commits land there — dynamic_update_slice
      clamps instead of dropping OOB writes). Prefer ``page_size >= 128``:
      the paged flash kernel runs one grid step per (row, page).
    - plain :class:`models.llama.ModelParams`: the original XLA-gather
      bf16 path (kept for unquantized-KV serving).
    """

    def __init__(self, params, config: ModelConfig, max_slots: int = 8,
                 num_pages: int = 256, page_size: int = 16,
                 max_pages_per_seq: Optional[int] = None,
                 use_pallas: bool = False, interpret: bool = False,
                 seed: int = 0, prefix_cache: bool = False):
        from ee274_convexcaldera_llm_quantization_tpu.models.fused import (
            FusedStackedParams)
        self.params = params
        self.config = config
        self.max_slots = max_slots
        self.page_size = page_size
        self.max_pages = max_pages_per_seq or (
            config.max_seq_len + page_size - 1) // page_size
        self.fused = isinstance(params, FusedStackedParams)
        if self.fused:
            # one extra pool page as the inactive-row scratch target
            self.pool = paged.PagedQuantKVPool.create(
                config, num_pages + 1, page_size)
            self.scratch_page = num_pages
        else:
            self.pool = paged.PagedKVPool.create(config, num_pages,
                                                 page_size)
            self.scratch_page = None
        self.allocator = PageAllocator(num_pages, page_size)
        self.sched = NativeScheduler(max_slots, self.allocator)
        self.use_pallas = use_pallas
        self.interpret = interpret
        self.prefix_cache = prefix_cache
        self._key = jax.random.PRNGKey(seed)
        self._requests: Dict[int, Request] = {}
        self._slot_of: Dict[int, int] = {}
        self._last_tok: Dict[int, int] = {}
        self._generated: Dict[int, List[int]] = {}
        self._start: Dict[int, float] = {}
        self.completions: List[Completion] = []

    def validate(self, req: Request) -> None:
        total = len(req.prompt) + req.max_new_tokens
        if total > self.max_pages * self.page_size:
            raise ValueError(f"request {req.uid} needs {total} tokens > "
                             f"{self.max_pages * self.page_size} capacity")
        # admission needs prompt pages + 1 decode page; a request larger
        # than the whole pool would head-of-line block the queue forever.
        need = -(-len(req.prompt) // self.page_size) + 1
        if need > self.allocator.num_pages:
            raise ValueError(
                f"request {req.uid} needs {need} pages > pool size "
                f"{self.allocator.num_pages}")

    def submit(self, req: Request) -> None:
        self.validate(req)
        self._requests[req.uid] = req
        self.sched.submit(req.uid, len(req.prompt), req.max_new_tokens,
                          priority=getattr(req, "priority", 0),
                          tenant=getattr(req, "tenant", 0))

    def run(self) -> List[Completion]:
        while self.sched.queue_len or self.sched.active_count:
            queued, active = self.sched.queue_len, self.sched.active_count
            self.step()
            if (self.sched.active_count == 0 and active == 0
                    and self.sched.queue_len == queued and queued > 0):
                raise RuntimeError(
                    f"scheduler made no progress: {queued} queued requests "
                    f"cannot be admitted (pool has "
                    f"{self.allocator.free_pages} free pages)")
        done, self.completions = self.completions, []
        return done

    def busy(self) -> bool:
        return self.sched.queue_len > 0 or self.sched.active_count > 0

    def live_generated(self):
        return {uid: toks for uid, toks in self._generated.items()
                if uid in self._slot_of}

    def step(self) -> None:
        for uid, slot in self.sched.admit(create_seqs=not self.prefix_cache):
            req = self._requests[uid]
            self._slot_of[uid] = slot
            self._start[uid] = time.time()
            cached = 0
            if self.prefix_cache:
                # native radix/prefix cache: page-aligned prompt prefixes
                # already in the pool are shared; prefill only the suffix
                cached = self.allocator.create_seq_cached(
                    uid, np.asarray(req.prompt, np.int32))
            pt = self._padded_table(uid)
            if cached > 0:
                if self.fused:
                    logits, self.pool = paged.paged_prefill_suffix_fused(
                        self.params,
                        jnp.asarray(req.prompt[cached:], jnp.int32)[None, :],
                        jnp.asarray(cached, jnp.int32), self.pool, pt,
                        self.config, self.interpret)
                else:
                    logits, self.pool = paged.paged_prefill_suffix(
                        self.params,
                        jnp.asarray(req.prompt[cached:], jnp.int32)[None, :],
                        jnp.asarray(cached, jnp.int32), self.pool, pt,
                        self.config, self.use_pallas, self.interpret)
            elif self.fused:
                logits, self.pool = paged.paged_prefill_fused(
                    self.params, jnp.asarray(req.prompt, jnp.int32)[None, :],
                    self.pool, pt, self.config, self.interpret,
                    flash=self.use_pallas)
            else:
                logits, self.pool = paged.paged_prefill(
                    self.params, jnp.asarray(req.prompt, jnp.int32)[None, :],
                    self.pool, pt, self.config, self.use_pallas,
                    self.interpret)
            tok = int(self._sample(jnp.atleast_2d(logits)[-1:],
                                   req.temperature, req.top_k,
                                   req.top_p)[0])
            self._record(uid, tok)
        if not self._slot_of:
            return
        self._decode()

    def _padded_table(self, uid: int) -> jnp.ndarray:
        pt = self.allocator.page_table(uid, self.max_pages)
        out = np.zeros(self.max_pages, np.int32)
        out[:len(pt)] = pt
        return jnp.asarray(out)

    def _decode(self) -> None:
        uids = list(self._slot_of)
        B = self.max_slots
        tokens = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        tables = np.zeros((B, self.max_pages), np.int32)
        for uid in uids:
            s = self._slot_of[uid]
            tokens[s] = self._last_tok[uid]
            pos[s] = self.allocator.length(uid)      # next write position
            pt = self.allocator.page_table(uid, self.max_pages)
            tables[s, :len(pt)] = pt
        # reserve the write page BEFORE the device step (append allocates)
        finished = {}
        for uid in uids:
            finished[uid] = self.sched.record_token(uid, False)
            s = self._slot_of[uid]
            pt = self.allocator.page_table(uid, self.max_pages)
            tables[s, :len(pt)] = pt
        active = np.zeros(B, bool)
        for uid in uids:
            active[self._slot_of[uid]] = True
        if self.fused:
            logits, self.pool = paged.paged_decode_step_fused(
                self.params, jnp.asarray(tokens), jnp.asarray(pos),
                self.pool, jnp.asarray(tables), self.config, self.interpret,
                active=jnp.asarray(active), scratch_page=self.scratch_page)
        else:
            logits, self.pool = paged.paged_decode_step(
                self.params, jnp.asarray(tokens), jnp.asarray(pos),
                self.pool, jnp.asarray(tables), self.config,
                self.use_pallas, self.interpret, active=jnp.asarray(active))
        temps = np.zeros(B, np.float32)
        ks = np.zeros(B, np.int32)
        ps = np.ones(B, np.float32)
        for uid in uids:
            s = self._slot_of[uid]
            req = self._requests[uid]
            temps[s] = req.temperature
            ks[s] = req.top_k
            ps[s] = req.top_p
        sampled = np.asarray(self._sample(logits, temps, ks, ps))
        for uid in uids:
            req = self._requests[uid]
            s = self._slot_of[uid]
            tok = int(sampled[s])
            self._generated[uid].append(tok)
            self._last_tok[uid] = tok
            is_eos = (req.eos_token is not None and tok == req.eos_token)
            if finished[uid] or is_eos or \
                    len(self._generated[uid]) >= req.max_new_tokens:
                self._finish(uid, "eos" if is_eos else "length")

    def _sample(self, logits, temperature, top_k=0, top_p=1.0):
        from ee274_convexcaldera_llm_quantization_tpu.serve import sampling
        self._key, sub = jax.random.split(self._key)
        return sampling.sample_logits(
            sub, logits, jnp.atleast_1d(jnp.asarray(temperature,
                                                    jnp.float32)),
            jnp.atleast_1d(jnp.asarray(top_k, jnp.int32)),
            jnp.atleast_1d(jnp.asarray(top_p, jnp.float32)))

    def _record(self, uid: int, tok: int) -> None:
        """Record the token sampled from prefill logits."""
        self._generated[uid] = [tok]
        self._last_tok[uid] = tok
        req = self._requests[uid]
        if req.max_new_tokens <= 1 or (req.eos_token is not None
                                       and tok == req.eos_token):
            reason = "eos" if (req.eos_token is not None
                              and tok == req.eos_token) else "length"
            self._finish(uid, reason)

    def _finish(self, uid: int, reason: str) -> None:
        req = self._requests[uid]
        self.completions.append(Completion(
            uid=uid, tokens=self._generated[uid],
            prompt_len=len(req.prompt), finished_reason=reason,
            latency_s=time.time() - self._start[uid]))
        self.sched.finish(uid)
        del self._slot_of[uid]
        del self._requests[uid]
