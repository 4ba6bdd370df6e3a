"""Continuous-batching serving engine with speculative decoding.

Same slot scheduler as :class:`FastServingEngine`, but each decode tick is
one draft-then-verify round (``serve.speculative.spec_decode_round``): up
to ``gamma + 1`` tokens commit per target forward instead of one. Output
is distributed exactly as target-only decoding (greedy requests get the
greedy stream), so speculative serving is a pure latency/throughput knob.

The reference generates one token per full forward through HF
``model.generate`` (reference ``main.py:358``); everything here is
beyond-parity TPU serving design.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models import fused, llama
from ee274_convexcaldera_llm_quantization_tpu.serve import speculative
from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
    Request, _Slot)
from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine import (
    FastServingEngine)


class SpeculativeServingEngine(FastServingEngine):
    """Slot-pool continuous batching where decode ticks are speculative
    rounds.

    ``params`` must be fused (:func:`fused.fuse_stacked`). ``draft_params``
    may be a fused/stacked W4A8 model (e.g. the same checkpoint compressed
    harder), a dense ``llama.ModelParams``, or an early-exit truncation
    (:func:`speculative.truncate_draft`). ``draft_kv_int8`` selects an int8
    draft cache (the draft and target caches are independent).

    Per-request acceptance statistics are tracked in ``accepted_tokens`` /
    ``spec_rounds`` (mean accepted per round = ``accepted_tokens /
    spec_rounds``) — the number a deployment watches to size ``gamma``.

    ``adaptive=True`` (default) tunes gamma ONLINE from that telemetry:
    an EWMA of per-token acceptance feeds a committed-tokens-per-cost
    model (round 2 measured the break-even at 0.31 acceptance and a
    0.45x SLOWDOWN at acceptance 0 — the greedy knife edge); below
    break-even the engine falls back to plain decode ticks (keeping the
    draft cache synced at ``draft_cost`` per tick) and re-probes every
    ``probe_every`` ticks. The emitted stream is exact either way.
    """

    def __init__(self, params, draft_params, config: ModelConfig,
                 draft_config: Optional[ModelConfig] = None, gamma: int = 4,
                 draft_kv_int8: bool = False, adaptive: bool = True,
                 draft_cost: Optional[float] = None,
                 probe_every: int = 16, **kw):
        super().__init__(params, config, **kw)
        if not self._fused:
            raise ValueError("SpeculativeServingEngine requires fused "
                             "params (fused.fuse_stacked)")
        self.draft_params = draft_params
        self.draft_config = draft_config or config
        self.gamma = int(gamma)
        factory = (llama.QuantKVCache if draft_kv_int8
                   else llama.KVCache).create
        self.draft_cache = factory(self.draft_config, self.max_slots,
                                   self.max_seq_len)
        # --- adaptive gamma ------------------------------------------------
        # Round 2 measured the speedup knife edge: below ~0.31 acceptance
        # a speculative round LOSES to plain decode (down to 0.45x at
        # acceptance 0), and at temperature 0 any draft/target mismatch
        # drives acceptance to exactly 0. The engine therefore tunes gamma
        # online from its own acceptance telemetry: each round it updates
        # an EWMA of per-token acceptance and picks the gamma maximizing
        # the modeled committed-tokens-per-cost
        #     E[commit | a, g] / (1 + draft_cost * g)
        # with E[commit] = (1 - a^(g+1)) / (1 - a) (iid acceptance), over
        # g in {0..gamma}; g = 0 means a plain decode tick. When disabled
        # it re-probes with one speculative round every ``probe_every``
        # ticks so a recovering draft can re-enable itself.
        self.adaptive = bool(adaptive)
        if draft_cost is None:
            draft_cost = (self.draft_config.num_layers
                          / max(config.num_layers, 1))
        self.draft_cost = float(draft_cost)
        self.probe_every = int(probe_every)
        self.accept_ewma = None          # per-token acceptance estimate
        self.gamma_current = self.gamma
        self._ticks_since_spec = 0
        self.spec_rounds = 0
        self.accepted_tokens = 0

    def _sync_draft_positions(self) -> None:
        """Keep the draft cache current during plain-decode fallback: one
        draft decode step writes this tick's K/V at each slot's position
        (logits discarded). Costs ``draft_cost`` of a tick — the price of
        keeping the re-enable probe meaningful (a stale draft cache would
        make every probe read garbage and measure acceptance 0 forever).
        """
        tokens = np.zeros(self.max_slots, np.int32)
        pos = np.zeros(self.max_slots, np.int32)
        for s, st in self.slots.items():
            # _decode already appended this tick's token and bumped pos;
            # the draft must write K/V for the PREVIOUS token at pos - 1
            tokens[s] = st.generated[-2] if len(st.generated) > 1 \
                else st.generated[-1]
            pos[s] = max(st.pos - 1, 0)
        _, self.draft_cache = speculative._draft_decode(
            self.draft_params, jnp.asarray(tokens), jnp.asarray(pos),
            self.draft_cache, self.draft_config, self.interpret)

    def _best_gamma(self) -> int:
        """argmax_g committed-per-cost under the current acceptance EWMA."""
        if self.accept_ewma is None:
            return self.gamma
        a = min(max(self.accept_ewma, 0.0), 0.999)
        best_g, best_rate = 0, 1.0       # plain decode: 1 token / 1 cost
        for g in range(1, self.gamma + 1):
            commit = (1 - a ** (g + 1)) / (1 - a)
            rate = commit / (1.0 + self.draft_cost * g)
            if rate > best_rate * 1.02:  # hysteresis: switch on >2% gain
                best_g, best_rate = g, rate
        return best_g

    def validate(self, req: Request) -> None:
        # the verify window can write gamma positions past the last emitted
        # token, so reserve that headroom in the cache
        if (len(req.prompt) + req.max_new_tokens + self.gamma
                > self.max_seq_len):
            raise ValueError(
                f"request {req.uid}: prompt {len(req.prompt)} + "
                f"{req.max_new_tokens} new + gamma {self.gamma} headroom "
                f"exceeds max_seq_len {self.max_seq_len}")

    def _admit(self) -> None:
        while self.queue and self.free_slots:
            req = self.queue.popleft()
            slot = self.free_slots.pop()
            n = len(req.prompt)
            bucket = min(self._bucket(n), self.max_seq_len)
            padded = np.zeros(bucket, np.int32)
            padded[:n] = req.prompt
            prompt = jnp.asarray(padded, jnp.int32)[None, :]
            logits, self.cache = fused.prefill_into_slot_fused(
                self.params, prompt, jnp.asarray(slot), self.cache,
                self.config, interpret=self.interpret,
                last_pos=jnp.asarray(n - 1), flash=self._flash)
            # the draft keeps its own cache of the same prompt (pad writes
            # beyond n are causally invisible, as in the target prefill)
            _, self.draft_cache = speculative._draft_prefill(
                self.draft_params, prompt, jnp.asarray(slot),
                self.draft_cache, self.draft_config, self.interpret)
            tok = int(self._sample(logits[None, :], req.temperature,
                                   req.top_k, req.top_p)[0])
            st = _Slot(req=req, pos=n, generated=[tok],
                       start_time=time.time())
            self.slots[slot] = st
            self.tokens_generated += 1
            self._maybe_finish(slot)

    def _decode(self) -> None:
        gamma = self.gamma
        if self.adaptive:
            gamma = self.gamma_current
            if gamma == 0:
                # speculation disabled by telemetry: plain decode ticks,
                # with a periodic speculative probe to re-measure
                self._ticks_since_spec += 1
                if self._ticks_since_spec < self.probe_every:
                    # NOTE: the target cache is shared between the plain
                    # step and verify steps (same layout), so falling back
                    # is free; the draft cache goes stale and is refreshed
                    # by the probe round's draft prefix re-decode
                    super()._decode()
                    self._sync_draft_positions()
                    return
                gamma = 1                 # cheapest probe round
                self._ticks_since_spec = 0
        tokens = np.zeros(self.max_slots, np.int32)
        pos = np.zeros(self.max_slots, np.int32)
        temps = np.zeros(self.max_slots, np.float32)
        ks = np.zeros(self.max_slots, np.int32)
        ps = np.ones(self.max_slots, np.float32)
        for s, st in self.slots.items():
            tokens[s] = st.generated[-1]
            pos[s] = st.pos
            temps[s] = st.req.temperature
            ks[s] = st.req.top_k
            ps[s] = st.req.top_p
        self._key, sub = jax.random.split(self._key)
        out, n_new, _, _, self.cache, self.draft_cache = \
            speculative.spec_decode_round(
                self.params, self.draft_params, jnp.asarray(tokens),
                jnp.asarray(pos), self.cache, self.draft_cache, sub,
                jnp.asarray(temps), jnp.asarray(ks), jnp.asarray(ps),
                self.config, self.draft_config, gamma=gamma,
                interpret=self.interpret)
        out_h = np.asarray(out)
        n_h = np.asarray(n_new)
        if self.adaptive and self.slots:
            acc = float(np.mean([(int(n_h[s]) - 1) / gamma
                                 for s in self.slots]))
            beta = 0.7
            self.accept_ewma = acc if self.accept_ewma is None else \
                beta * self.accept_ewma + (1 - beta) * acc
            self.gamma_current = self._best_gamma()
        for s in list(self.slots):
            st = self.slots[s]
            req = st.req
            self.spec_rounds += 1
            self.accepted_tokens += int(n_h[s]) - 1
            for t in out_h[s, :n_h[s]]:
                st.generated.append(int(t))
                st.pos += 1
                self.tokens_generated += 1
                if req.eos_token is not None and int(t) == req.eos_token:
                    break
                if len(st.generated) >= req.max_new_tokens:
                    break
            self._maybe_finish(s)
