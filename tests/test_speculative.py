"""Speculative decoding: multi-token verify equivalence, exact greedy
equality with vanilla decode, acceptance behavior, and the rejection
sampler's distributional correctness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import (
    fused as fusedm, llama, stacked)
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.serve import (
    sampling, speculative as spec)


def _build_target(seed=0):
    params = llama.init_params(jax.random.PRNGKey(seed), TINY)
    cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=8, iters=1,
                       lplr_iters=1)
    qparams, _ = compress_model(params, cp, serving_mode="w4a8")
    return fusedm.fuse_stacked(stacked.stack_layers(qparams))


@pytest.fixture(scope="module")
def target():
    return _build_target(seed=0)


def _prompts(B, S, seed=3):
    return jax.random.randint(jax.random.PRNGKey(seed), (B, S), 1,
                              TINY.vocab_size).astype(jnp.int32)


CACHES = {
    "bf16": llama.KVCache,
    "int8": llama.QuantKVCache,
    "head_major": llama.HeadMajorQuantKVCache,
}


def _build_mixed_model():
    """4-layer [4,2,2,4]-bit mixed model (two segments, like the 13B
    flagship) plus its stacked mixed form and config."""
    import dataclasses as _dc
    from ee274_convexcaldera_llm_quantization_tpu.models import mixed
    from ee274_convexcaldera_llm_quantization_tpu.models.compressed \
        import compress_linear, DenseLinear

    CFG4 = _dc.replace(TINY, num_layers=4)
    base = llama.init_params(jax.random.PRNGKey(2), CFG4)
    rng = np.random.default_rng(17)
    bits_sched = [4, 2, 2, 4]

    def convert(lp, bits):
        fields = {}
        for name in llama.LayerParams._fields:
            lin = getattr(lp, name)
            if not isinstance(lin, DenseLinear):
                fields[name] = lin
                continue
            m, k = lin.w.shape
            L = jnp.asarray(
                rng.normal(size=(m, 4)).astype(np.float32) * 0.05)
            R = jnp.asarray(
                rng.normal(size=(4, k)).astype(np.float32) * 0.05)
            fields[name] = compress_linear(
                lin.w.astype(jnp.float32), L, R, bits,
                global_scale=1.0, bias=lin.b, mode="w4a8")
        return llama.LayerParams(**fields)

    model = llama.ModelParams(
        embed=base.embed,
        layers=[convert(lp, bits_sched[i])
                for i, lp in enumerate(base.layers)],
        final_norm=base.final_norm, lm_head=base.lm_head)
    return model, mixed.stack_layers_mixed(model), CFG4


class TestVerifyStep:
    @pytest.mark.parametrize("kind", list(CACHES))
    def test_matches_sequential_decode(self, target, kind):
        """An S-token verify step must produce the same logits and cache
        as S sequential single-token decode steps."""
        B, S0, S = 2, 6, 3
        T = 32
        factory = CACHES[kind]
        prompts = _prompts(B, S0)
        window = _prompts(B, S, seed=9)

        def prefill(cache):
            for b in range(B):
                _, cache = fusedm.prefill_into_slot_fused(
                    target, prompts[b:b + 1], jnp.asarray(b), cache, TINY,
                    interpret=True)
            return cache

        pos = jnp.full((B,), S0, jnp.int32)

        cache_a = prefill(factory.create(TINY, B, T))
        seq_logits = []
        pa = pos
        for i in range(S):
            lg, cache_a = fusedm.decode_step_fused(
                target, window[:, i], pa, cache_a, TINY, interpret=True)
            seq_logits.append(lg)
            pa = pa + 1
        seq_logits = jnp.stack(seq_logits, axis=1)          # (B, S, V)

        cache_b = prefill(factory.create(TINY, B, T))
        ver_logits, cache_b = spec.verify_step_fused(
            target, window, pos, cache_b, TINY, interpret=True)

        np.testing.assert_allclose(np.asarray(ver_logits),
                                   np.asarray(seq_logits),
                                   rtol=0, atol=2e-3)
        for la, lb in zip(jax.tree.leaves(cache_a), jax.tree.leaves(cache_b)):
            np.testing.assert_allclose(np.asarray(la, np.float32),
                                       np.asarray(lb, np.float32),
                                       rtol=0, atol=2e-2)


class TestGreedyEquivalence:
    @pytest.mark.parametrize("kind", ["bf16", "int8"])
    def test_spec_equals_vanilla_greedy(self, target, kind):
        """Greedy speculative output == vanilla greedy decode, even with a
        weak (1-layer early-exit) draft."""
        B, S0, N = 2, 5, 12
        factory = CACHES[kind]
        prompts = _prompts(B, S0, seed=11)
        draft, dconfig = spec.truncate_draft(target, TINY, 1)

        # vanilla greedy
        cache = factory.create(TINY, B, S0 + N + 16)
        logits = []
        for b in range(B):
            lg, cache = fusedm.prefill_into_slot_fused(
                target, prompts[b:b + 1], jnp.asarray(b), cache, TINY,
                interpret=True)
            logits.append(lg)
        tok = jnp.argmax(jnp.stack(logits), axis=-1).astype(jnp.int32)
        pos = jnp.full((B,), S0, jnp.int32)
        ref = [[int(t)] for t in np.asarray(tok)]
        for _ in range(N - 1):
            lg, cache = fusedm.decode_step_fused(target, tok, pos, cache,
                                                 TINY, interpret=True)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            pos = pos + 1
            for b in range(B):
                ref[b].append(int(tok[b]))

        out = spec.generate_speculative(
            target, draft, prompts, N, TINY, dconfig, gamma=3,
            temperature=0.0, cache_factory=factory.create,
            draft_cache_factory=factory.create, interpret=True)
        assert out == ref

    def test_spec_composes_with_mixed_segmented(self):
        """Round-5 (VERDICT r4 ask #7): speculative decoding composed with
        the 13B flagship's serving path — a segmented MIXED-precision
        target. Greedy spec output must equal vanilla greedy decoding
        through decode_step_mixed_segmented token-for-token."""
        from ee274_convexcaldera_llm_quantization_tpu.models import mixed
        model, mp, CFG4 = _build_mixed_model()
        assert len(mixed.mixed_segments(mp.layers, 4)) > 1

        B, S0, N = 2, 5, 10
        prompts = _prompts(B, S0, seed=13)

        # vanilla greedy through the segmented path
        cache = llama.HeadMajorQuantKVCache.create(CFG4, B, S0 + N + 16)
        logits = []
        for b in range(B):
            lg, cache = mixed.prefill_into_slot_mixed(
                mp, prompts[b:b + 1], jnp.asarray(b), cache, CFG4,
                interpret=True)
            logits.append(lg)
        tok = jnp.argmax(jnp.stack(logits), axis=-1).astype(jnp.int32)
        pos = jnp.full((B,), S0, jnp.int32)
        ref = [[int(t)] for t in np.asarray(tok)]
        for _ in range(N - 1):
            lg, cache = mixed.decode_step_mixed_segmented(
                mp, tok, pos, cache, CFG4, interpret=True)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            pos = pos + 1
            for b in range(B):
                ref[b].append(int(tok[b]))

        draft, dconfig = spec.truncate_draft(model, CFG4, 1)
        out = spec.generate_speculative(
            mp, draft, prompts, N, CFG4, dconfig, gamma=3,
            temperature=0.0,
            cache_factory=llama.HeadMajorQuantKVCache.create,
            draft_cache_factory=llama.KVCache.create, interpret=True)
        assert out == ref

    def test_spec_mixed_self_draft(self):
        """Round-5: a MIXED early-exit self-draft (truncate_mixed) drives
        speculative decoding against the mixed segmented target — the
        zero-extra-weight draft the 13B chip bench uses. Greedy output
        must equal vanilla segmented greedy token-for-token, and the
        truncated draft must preserve per-layer bit widths."""
        from ee274_convexcaldera_llm_quantization_tpu.models import mixed
        _, mp, CFG4 = _build_mixed_model()

        draft, dconfig = spec.truncate_draft(mp, CFG4, 2)
        assert isinstance(draft, mixed.MixedStackedParams)
        assert dconfig.num_layers == 2
        for n in mixed._PROJ_NAMES:
            full = mixed.num_bits_per_layer(getattr(mp.layers, n))
            trunc = mixed.num_bits_per_layer(getattr(draft.layers, n))
            assert trunc == full[:2]

        B, S0, N = 2, 5, 10
        prompts = _prompts(B, S0, seed=13)

        cache = llama.HeadMajorQuantKVCache.create(CFG4, B, S0 + N + 16)
        logits = []
        for b in range(B):
            lg, cache = mixed.prefill_into_slot_mixed(
                mp, prompts[b:b + 1], jnp.asarray(b), cache, CFG4,
                interpret=True)
            logits.append(lg)
        tok = jnp.argmax(jnp.stack(logits), axis=-1).astype(jnp.int32)
        pos = jnp.full((B,), S0, jnp.int32)
        ref = [[int(t)] for t in np.asarray(tok)]
        for _ in range(N - 1):
            lg, cache = mixed.decode_step_mixed_segmented(
                mp, tok, pos, cache, CFG4, interpret=True)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            pos = pos + 1
            for b in range(B):
                ref[b].append(int(tok[b]))

        out = spec.generate_speculative(
            mp, draft, prompts, N, CFG4, dconfig, gamma=3,
            temperature=0.0,
            cache_factory=llama.HeadMajorQuantKVCache.create,
            draft_cache_factory=llama.HeadMajorQuantKVCache.create,
            interpret=True)
        assert out == ref

    def test_adversarial_draft_still_exact(self, target):
        """A draft that never matches the target (shuffled embedding rows)
        must cost acceptance, not correctness."""
        B, S0, N = 1, 4, 8
        prompts = _prompts(B, S0, seed=21)
        perm = jax.random.permutation(jax.random.PRNGKey(5),
                                      TINY.vocab_size)
        draft = target._replace(embed=target.embed[perm])

        cache = llama.KVCache.create(TINY, B, 64)
        lg, cache = fusedm.prefill_into_slot_fused(
            target, prompts, jnp.asarray(0), cache, TINY, interpret=True)
        tok = jnp.argmax(lg, axis=-1)[None].astype(jnp.int32)
        pos = jnp.full((B,), S0, jnp.int32)
        ref = [int(tok[0])]
        for _ in range(N - 1):
            lg, cache = fusedm.decode_step_fused(target, tok, pos, cache,
                                                 TINY, interpret=True)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            pos = pos + 1
            ref.append(int(tok[0]))

        out = spec.generate_speculative(
            target, draft, prompts, N, TINY, TINY, gamma=2,
            temperature=0.0, interpret=True)
        assert out[0] == ref


class TestAcceptance:
    def test_draft_equals_target_accepts_everything(self, target):
        """p == q => every draft token accepted, n_new == gamma + 1."""
        B, S0, gamma = 2, 5, 3
        prompts = _prompts(B, S0, seed=7)
        cache = llama.KVCache.create(TINY, B, 64)
        dcache = llama.KVCache.create(TINY, B, 64)
        logits = []
        for b in range(B):
            lg, cache = fusedm.prefill_into_slot_fused(
                target, prompts[b:b + 1], jnp.asarray(b), cache, TINY,
                interpret=True)
            _, dcache = fusedm.prefill_into_slot_fused(
                target, prompts[b:b + 1], jnp.asarray(b), dcache, TINY,
                interpret=True)
            logits.append(lg)
        key = jax.random.PRNGKey(2)
        tok = sampling.sample_logits(key, jnp.stack(logits),
                                     jnp.full((B,), 0.8), jnp.zeros((B,),
                                     jnp.int32), jnp.ones((B,)))
        pos = jnp.full((B,), S0, jnp.int32)
        out, n_new, nxt, new_pos, cache, dcache = spec.spec_decode_round(
            target, target, tok, pos, cache, dcache,
            jax.random.PRNGKey(3), jnp.full((B,), 0.8),
            jnp.zeros((B,), jnp.int32), jnp.ones((B,)), TINY, TINY,
            gamma=gamma, interpret=True)
        assert np.all(np.asarray(n_new) == gamma + 1)
        assert np.all(np.asarray(new_pos) == S0 + gamma + 1)


class TestRejectionSampler:
    def test_output_marginal_matches_target(self):
        """The first emitted token of speculative_accept must be
        distributed exactly as the target distribution p_0, whatever q is
        (Leviathan et al. thm. 1) — checked empirically at B=40000."""
        V, gamma, B = 8, 2, 40000
        kp, kq, kd, ka = jax.random.split(jax.random.PRNGKey(0), 4)
        p_rows = jax.nn.softmax(
            jax.random.normal(kp, (gamma + 1, V)) * 1.5, axis=-1)
        q_rows = jax.nn.softmax(
            jax.random.normal(kq, (gamma, V)) * 1.5, axis=-1)
        p = jnp.broadcast_to(p_rows, (B, gamma + 1, V))
        q = jnp.broadcast_to(q_rows, (B, gamma, V))
        # draft tokens sampled from q per row
        d = jax.vmap(
            lambda k: jax.random.categorical(k, jnp.log(q_rows), axis=-1)
        )(jax.random.split(kd, B)).astype(jnp.int32)
        keys = jax.random.split(ka, B)
        n_acc, nxt = jax.vmap(
            lambda di, ki: spec.speculative_accept(
                di[None], q[:1], p[:1], ki),
            out_axes=(0, 0))(d, keys)
        n_acc, nxt = n_acc[:, 0], nxt[:, 0]
        first = np.where(np.asarray(n_acc) >= 1, np.asarray(d[:, 0]),
                         np.asarray(nxt))
        emp = np.bincount(first, minlength=V) / B
        tgt = np.asarray(p_rows[0])
        assert np.abs(emp - tgt).max() < 0.012, (emp, tgt)

    def test_greedy_one_hot_reduces_to_prefix_match(self):
        V, gamma = 6, 3
        tgt_tokens = jnp.asarray([2, 4, 1, 3])       # argmax chain of p
        p = jax.nn.one_hot(tgt_tokens, V)[None]      # (1, gamma+1, V)
        q_match = jax.nn.one_hot(jnp.asarray([2, 4, 0]), V)[None]
        d = jnp.asarray([[2, 4, 0]], jnp.int32)
        n_acc, nxt = spec.speculative_accept(d, q_match, p,
                                             jax.random.PRNGKey(0))
        assert int(n_acc[0]) == 2                     # first two match
        assert int(nxt[0]) == 1                       # target's token there


class TestSpecEngine:
    def _requests(self, n=3, max_new=10, seed=31, **kw):
        from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
            Request)
        key = jax.random.PRNGKey(seed)
        reqs = []
        for i in range(n):
            key, k = jax.random.split(key)
            plen = 4 + i
            reqs.append(Request(
                uid=i,
                prompt=np.asarray(jax.random.randint(
                    k, (plen,), 1, TINY.vocab_size), np.int32),
                max_new_tokens=max_new, **kw))
        return reqs

    def test_greedy_engine_matches_fast_engine(self, target):
        from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine import (
            FastServingEngine)
        from ee274_convexcaldera_llm_quantization_tpu.serve.spec_engine import (
            SpeculativeServingEngine)
        draft, dconfig = spec.truncate_draft(target, TINY, 1)
        ref = FastServingEngine(target, TINY, max_slots=2, max_seq_len=64,
                                interpret=True)
        for r in self._requests():
            ref.submit(r)
        ref_out = {c.uid: c.tokens for c in ref.run()}

        eng = SpeculativeServingEngine(target, draft, TINY, dconfig,
                                       gamma=3, max_slots=2, max_seq_len=64,
                                       interpret=True)
        for r in self._requests():
            eng.submit(r)
        out = {c.uid: c.tokens for c in eng.run()}
        assert out == ref_out
        assert eng.spec_rounds > 0

    def test_eos_mid_window(self, target):
        """An EOS accepted mid-window must terminate the request at the
        EOS token, discarding the rest of the window."""
        from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine import (
            FastServingEngine)
        from ee274_convexcaldera_llm_quantization_tpu.serve.spec_engine import (
            SpeculativeServingEngine)
        ref = FastServingEngine(target, TINY, max_slots=1, max_seq_len=64,
                                interpret=True)
        [req] = self._requests(n=1, max_new=12)
        ref.submit(req)
        [comp] = ref.run()
        # pick the 4th greedy token as a synthetic EOS (mid spec window)
        eos = comp.tokens[3]

        draft, dconfig = spec.truncate_draft(target, TINY, 1)
        eng = SpeculativeServingEngine(target, draft, TINY, dconfig,
                                       gamma=3, max_slots=1, max_seq_len=64,
                                       interpret=True)
        [req2] = self._requests(n=1, max_new=12, eos_token=int(eos))
        eng.submit(req2)
        [comp2] = eng.run()
        assert comp2.finished_reason == "eos"
        assert comp2.tokens == comp.tokens[:4]

    def test_acceptance_stats_perfect_draft(self, target):
        from ee274_convexcaldera_llm_quantization_tpu.serve.spec_engine import (
            SpeculativeServingEngine)
        eng = SpeculativeServingEngine(target, target, TINY, TINY,
                                       gamma=2, max_slots=2, max_seq_len=64,
                                       interpret=True, adaptive=False)
        for r in self._requests(n=2, max_new=9):
            eng.submit(r)
        eng.run()
        # a perfect draft accepts every proposal in every round
        assert eng.accepted_tokens == eng.spec_rounds * 2

    def test_adaptive_disables_on_zero_acceptance(self, target):
        # adversarial draft (different random weights): greedy acceptance
        # is the knife-edge 0 case that round 2 measured at 0.45x plain
        # throughput. The adaptive engine must (a) still emit the EXACT
        # greedy stream, (b) turn speculation off after the EWMA converges
        # so most ticks are plain decode steps.
        from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine \
            import FastServingEngine
        from ee274_convexcaldera_llm_quantization_tpu.serve.spec_engine \
            import SpeculativeServingEngine
        bad_target = _build_target(seed=99)
        bad_draft, dconfig = spec.truncate_draft(bad_target, TINY, 1)

        ref = FastServingEngine(target, TINY, max_slots=2, max_seq_len=64,
                                interpret=True)
        for r in self._requests(n=2, max_new=12):
            ref.submit(r)
        ref_out = {c.uid: c.tokens for c in ref.run()}

        eng = SpeculativeServingEngine(target, bad_draft, TINY, dconfig,
                                       gamma=3, max_slots=2, max_seq_len=64,
                                       interpret=True, probe_every=50)
        for r in self._requests(n=2, max_new=12):
            eng.submit(r)
        out = {c.uid: c.tokens for c in eng.run()}
        assert out == ref_out                     # exactness preserved
        assert eng.gamma_current == 0             # speculation disabled
        assert eng.accept_ewma is not None and eng.accept_ewma < 0.1
        # after disabling, ticks are plain: far fewer spec rounds than
        # tokens were generated
        assert eng.spec_rounds < eng.tokens_generated / 2

    def test_adaptive_keeps_gamma_on_good_draft(self, target):
        from ee274_convexcaldera_llm_quantization_tpu.serve.spec_engine \
            import SpeculativeServingEngine
        eng = SpeculativeServingEngine(target, target, TINY, TINY,
                                       gamma=2, max_slots=2, max_seq_len=64,
                                       interpret=True, draft_cost=0.1)
        for r in self._requests(n=2, max_new=9):
            eng.submit(r)
        eng.run()
        # perfect draft + cheap draft cost: speculation stays at max gamma
        assert eng.gamma_current == 2
        assert eng.accept_ewma > 0.9


class TestHelpers:
    def test_truncate_draft_shapes(self, target):
        draft, dconfig = spec.truncate_draft(target, TINY, 1)
        assert dconfig.num_layers == 1
        assert draft.layers.qkv.packed.shape[0] == 1
        assert draft.layers.attn_norm.shape[0] == 1
        # dense variant
        dense = llama.init_params(jax.random.PRNGKey(1), TINY)
        ddense, dcfg = spec.truncate_draft(dense, TINY, 1)
        assert len(ddense.layers) == 1 and dcfg.num_layers == 1

    def test_sampled_generation_runs(self, target):
        """Sampled speculative generation with a truncated draft produces
        the requested number of tokens (smoke: exactness is covered by the
        rejection-sampler marginal test)."""
        draft, dconfig = spec.truncate_draft(target, TINY, 1)
        prompts = _prompts(2, 4, seed=13)
        out = spec.generate_speculative(
            target, draft, prompts, 6, TINY, dconfig, gamma=2,
            temperature=0.9, top_k=20, key=jax.random.PRNGKey(7),
            interpret=True)
        assert all(len(o) == 6 for o in out)
        assert all(0 <= t < TINY.vocab_size for o in out for t in o)
