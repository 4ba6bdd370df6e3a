"""Top-k / top-p / temperature sampling: distribution-support properties
and engine integration (per-row settings in one batched call)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.serve.sampling import (
    sample_logits)
from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
    Request, ServingEngine)
from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY


def _draws(logits, temperature, top_k, top_p, n=200):
    B = logits.shape[0]
    out = []
    for i in range(n):
        out.append(np.asarray(sample_logits(
            jax.random.PRNGKey(i), jnp.asarray(logits),
            jnp.full((B,), temperature, jnp.float32),
            jnp.full((B,), top_k, jnp.int32),
            jnp.full((B,), top_p, jnp.float32))))
    return np.stack(out)                               # (n, B)


class TestSampleLogits:
    logits = np.log(np.asarray([[0.6, 0.3, 0.05, 0.04, 0.01]], np.float32))

    def test_zero_temperature_is_greedy(self):
        d = _draws(self.logits, 0.0, 0, 1.0, n=20)
        assert (d == 0).all()

    def test_top_k_one_is_greedy_at_any_temperature(self):
        d = _draws(self.logits, 5.0, 1, 1.0, n=50)
        assert (d == 0).all()

    def test_top_k_restricts_support(self):
        d = _draws(self.logits, 1.0, 2, 1.0)
        assert set(np.unique(d)) <= {0, 1}
        assert 1 in d                   # second token does get sampled

    def test_top_p_restricts_support(self):
        # cumulative-exclusive mass: tok0=0, tok1=0.6, tok2=0.9 -> p=0.7
        # keeps {0, 1}
        d = _draws(self.logits, 1.0, 0, 0.7)
        assert set(np.unique(d)) <= {0, 1}
        assert 1 in d

    def test_tiny_top_p_keeps_head(self):
        d = _draws(self.logits, 1.0, 0, 1e-8)
        assert (d == 0).all()

    def test_filters_compose(self):
        # top_k=3 allows {0,1,2}; top_p=0.7 allows {0,1}; intersection {0,1}
        d = _draws(self.logits, 1.0, 3, 0.7)
        assert set(np.unique(d)) <= {0, 1}

    def test_per_row_settings_mix(self):
        logits = np.tile(self.logits, (3, 1))
        out = []
        for i in range(100):
            out.append(np.asarray(sample_logits(
                jax.random.PRNGKey(i), jnp.asarray(logits),
                jnp.asarray([0.0, 2.0, 2.0], jnp.float32),
                jnp.asarray([0, 1, 2], jnp.int32),
                jnp.asarray([1.0, 1.0, 1.0], jnp.float32))))
        out = np.stack(out)
        assert (out[:, 0] == 0).all()                 # greedy row
        assert (out[:, 1] == 0).all()                 # top-k=1 row
        assert set(np.unique(out[:, 2])) <= {0, 1}    # top-k=2 row

    def test_temperature_sharpens(self):
        # high temperature spreads mass; low temperature concentrates
        hot = _draws(self.logits, 10.0, 0, 1.0)
        cold = _draws(self.logits, 0.2, 0, 1.0)
        assert (cold == 0).mean() > (hot == 0).mean()


class TestEngineSampling:
    @pytest.fixture(scope="class")
    def tiny_model(self):
        return llama.init_params(jax.random.PRNGKey(0), TINY)

    def test_top_k_one_matches_greedy(self, tiny_model):
        prompt = np.asarray([5, 7, 11], np.int32)
        outs = []
        for req in (Request(uid=0, prompt=prompt, max_new_tokens=6),
                    Request(uid=1, prompt=prompt, max_new_tokens=6,
                            temperature=1.5, top_k=1)):
            eng = ServingEngine(tiny_model, TINY, max_slots=1,
                                max_seq_len=32)
            eng.submit(req)
            outs.append(eng.run()[0].tokens)
        assert outs[0] == outs[1]

    def test_sampled_generation_runs(self, tiny_model):
        eng = ServingEngine(tiny_model, TINY, max_slots=2, max_seq_len=32)
        eng.submit(Request(uid=0, prompt=np.asarray([1, 2], np.int32),
                           max_new_tokens=4, temperature=0.8, top_k=50,
                           top_p=0.9))
        eng.submit(Request(uid=1, prompt=np.asarray([3], np.int32),
                           max_new_tokens=4, temperature=0.0))
        done = eng.run()
        assert sorted(c.uid for c in done) == [0, 1]
        assert all(len(c.tokens) == 4 for c in done)
