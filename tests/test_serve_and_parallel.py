"""Serving engine (continuous batching) and multi-device sharding tests.

The sharding tests run on the virtual 8-device CPU mesh from conftest —
the same GSPMD paths XLA uses on a real TPU slice."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import (
    TINY, ModelConfig)
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
    Request, ServingEngine)
from ee274_convexcaldera_llm_quantization_tpu.parallel import mesh as pm
from ee274_convexcaldera_llm_quantization_tpu.models import train


@pytest.fixture(scope="module")
def tiny_model():
    return llama.init_params(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def tiny_compressed(tiny_model):
    cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=8, iters=1,
                       lplr_iters=1)
    qparams, _ = compress_model(tiny_model, cp)
    return qparams


class TestServingEngine:
    def test_single_request_matches_generate(self, tiny_model):
        prompt = np.asarray(
            jax.random.randint(jax.random.PRNGKey(1), (6,), 0,
                               TINY.vocab_size))
        eng = ServingEngine(tiny_model, TINY, max_slots=2, max_seq_len=32)
        eng.submit(Request(uid=1, prompt=prompt, max_new_tokens=5))
        done = eng.run()
        assert len(done) == 1
        ref = llama.generate_greedy(tiny_model, jnp.asarray(prompt)[None],
                                    5, TINY)
        np.testing.assert_array_equal(np.asarray(done[0].tokens),
                                      np.asarray(ref[0, 6:]))

    def test_continuous_batching_many_requests(self, tiny_model):
        rng = np.random.default_rng(2)
        eng = ServingEngine(tiny_model, TINY, max_slots=2, max_seq_len=32)
        for uid in range(5):  # more requests than slots
            eng.submit(Request(uid=uid,
                               prompt=rng.integers(0, TINY.vocab_size,
                                                   size=4),
                               max_new_tokens=3 + uid % 3))
        done = eng.run()
        assert sorted(c.uid for c in done) == list(range(5))
        for c in done:
            assert c.finished_reason == "length"
            assert len(c.tokens) >= 3

    def test_batching_consistent_with_single(self, tiny_model):
        # two concurrent sequences must produce the same tokens as alone
        rng = np.random.default_rng(3)
        p1 = rng.integers(0, TINY.vocab_size, size=5)
        p2 = rng.integers(0, TINY.vocab_size, size=7)
        solo = []
        for p in (p1, p2):
            eng = ServingEngine(tiny_model, TINY, max_slots=1,
                                max_seq_len=32)
            eng.submit(Request(uid=0, prompt=p, max_new_tokens=4))
            solo.append(eng.run()[0].tokens)
        eng = ServingEngine(tiny_model, TINY, max_slots=2, max_seq_len=32)
        eng.submit(Request(uid=0, prompt=p1, max_new_tokens=4))
        eng.submit(Request(uid=1, prompt=p2, max_new_tokens=4))
        both = {c.uid: c.tokens for c in eng.run()}
        assert both[0] == solo[0]
        assert both[1] == solo[1]

    def test_eos_termination(self, tiny_model):
        rng = np.random.default_rng(4)
        prompt = rng.integers(0, TINY.vocab_size, size=4)
        # find what the model emits first, then use it as the EOS token
        eng = ServingEngine(tiny_model, TINY, max_slots=1, max_seq_len=32)
        eng.submit(Request(uid=0, prompt=prompt, max_new_tokens=3))
        first = eng.run()[0].tokens[0]
        eng2 = ServingEngine(tiny_model, TINY, max_slots=1, max_seq_len=32)
        eng2.submit(Request(uid=0, prompt=prompt, max_new_tokens=10,
                            eos_token=int(first)))
        done = eng2.run()
        assert done[0].finished_reason == "eos"
        assert len(done[0].tokens) == 1

    def test_compressed_model_serves(self, tiny_compressed):
        rng = np.random.default_rng(5)
        eng = ServingEngine(tiny_compressed, TINY, max_slots=2,
                            max_seq_len=32)
        eng.submit(Request(uid=0,
                           prompt=rng.integers(0, TINY.vocab_size, size=4),
                           max_new_tokens=4))
        done = eng.run()
        assert len(done[0].tokens) == 4

    def test_oversize_request_rejected(self, tiny_model):
        eng = ServingEngine(tiny_model, TINY, max_slots=1, max_seq_len=16)
        with pytest.raises(ValueError):
            eng.submit(Request(uid=0, prompt=np.zeros(10, np.int32),
                               max_new_tokens=10))


class TestSharding:
    def test_mesh_construction(self):
        mesh = pm.make_mesh(dp=2, tp=4)
        assert mesh.shape == {"dp": 2, "tp": 4}
        with pytest.raises(ValueError):
            pm.make_mesh(dp=4, tp=4)

    def test_sharded_forward_matches_single_device(self, tiny_model):
        mesh = pm.make_mesh(dp=1, tp=2)
        sharded = pm.shard_params(tiny_model, mesh)
        toks = jax.random.randint(jax.random.PRNGKey(7), (2, 8), 0,
                                  TINY.vocab_size)
        base = np.asarray(llama.forward(tiny_model, toks, TINY))
        out = np.asarray(llama.forward(sharded, toks, TINY))
        np.testing.assert_allclose(out, base, rtol=1e-2, atol=5e-2)

    def test_sharded_compressed_forward(self, tiny_compressed):
        mesh = pm.make_mesh(dp=1, tp=2)
        sharded = pm.shard_params(tiny_compressed, mesh)
        toks = jax.random.randint(jax.random.PRNGKey(8), (1, 8), 0,
                                  TINY.vocab_size)
        base = np.asarray(llama.forward(tiny_compressed, toks, TINY))
        out = np.asarray(llama.forward(sharded, toks, TINY))
        np.testing.assert_allclose(out, base, rtol=1e-2, atol=5e-2)

    def test_dp_tp_mesh_full_8_devices(self, tiny_model):
        mesh = pm.make_mesh(dp=4, tp=2)
        sharded = pm.shard_params(tiny_model, mesh)
        toks = jax.device_put(
            jax.random.randint(jax.random.PRNGKey(9), (8, 8), 0,
                               TINY.vocab_size), pm.batch_sharding(mesh))
        out = llama.forward(sharded, toks, TINY)
        assert out.shape == (8, 8, TINY.vocab_size)
        assert np.isfinite(np.asarray(out)).all()

    def test_weight_shards_actually_distributed(self, tiny_model):
        mesh = pm.make_mesh(dp=1, tp=4)
        sharded = pm.shard_params(tiny_model, mesh)
        w = sharded.layers[0].q_proj.w
        # column-parallel: output dim sharded 4 ways
        assert w.sharding.spec == P("tp", None)
        shard_shapes = {s.data.shape for s in w.addressable_shards}
        assert shard_shapes == {(TINY.q_dim // 4, TINY.hidden_size)}


class TestTrainStep:
    def test_loss_decreases(self, tiny_model):
        opt = train.make_optimizer(1e-2)
        # train_step donates its inputs — work on a copy, not the fixture
        params = jax.tree.map(jnp.copy, tiny_model)
        state = train.init_train_state(params, opt)
        toks = jax.random.randint(jax.random.PRNGKey(10), (2, 16), 0,
                                  TINY.vocab_size)
        losses = []
        for _ in range(5):
            params, state, loss = train.train_step(params, state, toks,
                                                   TINY, opt)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_sharded_train_step(self, tiny_model):
        mesh = pm.make_mesh(dp=2, tp=2)
        params = pm.shard_params(jax.tree.map(jnp.copy, tiny_model), mesh)
        opt = train.make_optimizer(1e-3)
        state = train.init_train_state(params, opt)
        toks = jax.device_put(
            jax.random.randint(jax.random.PRNGKey(11), (4, 16), 0,
                               TINY.vocab_size), pm.batch_sharding(mesh))
        params, state, loss = train.train_step(params, state, toks, TINY,
                                               opt)
        assert np.isfinite(float(loss))


class TestShardedEval:
    def test_dp_and_sp_perplexity_matches_single_device(self, tiny_model):
        from ee274_convexcaldera_llm_quantization_tpu.evalm.perplexity import (
            evaluate_perplexity)
        stream = np.random.default_rng(30).integers(
            0, TINY.vocab_size, size=8 * 64)
        base = evaluate_perplexity(tiny_model, stream, TINY, window=64,
                                   batch_size=4)
        mesh = pm.make_mesh(dp=4, tp=2)
        dp = evaluate_perplexity(tiny_model, stream, TINY, window=64,
                                 batch_size=4, mesh=mesh)
        assert abs(np.log(dp) - np.log(base)) < 1e-3
        sp = evaluate_perplexity(tiny_model, stream, TINY, window=64,
                                 batch_size=4, mesh=mesh, seq_axis="tp")
        assert abs(np.log(sp) - np.log(base)) < 1e-3

    def test_bad_batch_divisibility_raises(self, tiny_model):
        from ee274_convexcaldera_llm_quantization_tpu.evalm.perplexity import (
            evaluate_perplexity)
        mesh = pm.make_mesh(dp=4, tp=2)
        with pytest.raises(ValueError):
            evaluate_perplexity(tiny_model,
                                np.zeros(256, np.int64), TINY, window=64,
                                batch_size=3, mesh=mesh)
