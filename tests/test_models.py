"""Model tests: forward/prefill/decode consistency, CALDERA surgery with the
quality gate, Hessian calibration, and perplexity eval (SURVEY.md sections
2.7, 3.1, 3.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import (
    TINY, ModelConfig)
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, DenseLinear, apply_linear, compress_linear)
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.calibrate.hessian import (
    collect_hessians, save_hessians, load_hessians)
from ee274_convexcaldera_llm_quantization_tpu.evalm.perplexity import (
    evaluate_perplexity)


@pytest.fixture(scope="module")
def tiny_model():
    params = llama.init_params(jax.random.PRNGKey(0), TINY)
    return params


def rand_tokens(key, batch, seq):
    return jax.random.randint(key, (batch, seq), 0, TINY.vocab_size)


class TestForward:
    def test_shapes(self, tiny_model):
        toks = rand_tokens(jax.random.PRNGKey(1), 2, 16)
        logits = llama.forward(tiny_model, toks, TINY)
        assert logits.shape == (2, 16, TINY.vocab_size)
        assert np.isfinite(np.asarray(logits)).all()

    def test_causality(self, tiny_model):
        # changing a future token must not affect past logits
        toks = np.asarray(rand_tokens(jax.random.PRNGKey(2), 1, 12))
        toks2 = toks.copy()
        toks2[0, -1] = (toks2[0, -1] + 1) % TINY.vocab_size
        l1 = np.asarray(llama.forward(tiny_model, jnp.asarray(toks), TINY))
        l2 = np.asarray(llama.forward(tiny_model, jnp.asarray(toks2), TINY))
        np.testing.assert_allclose(l1[0, :-1], l2[0, :-1], atol=1e-5)
        assert not np.allclose(l1[0, -1], l2[0, -1], atol=1e-5)

    def test_prefill_decode_matches_forward(self, tiny_model):
        # autoregressive prefill+decode must reproduce the full forward
        toks = rand_tokens(jax.random.PRNGKey(3), 1, 10)
        full = np.asarray(llama.forward(tiny_model, toks, TINY))
        cache = llama.KVCache.create(TINY, 1, 16)
        logits_p, cache = llama.prefill(tiny_model, toks[:, :6], cache, TINY)
        # cache keeps K/V in bf16, so allow a bf16-accumulation tolerance
        np.testing.assert_allclose(logits_p, full[:, 5], rtol=2e-2,
                                   atol=0.05)
        for pos in range(6, 10):
            logits_d, cache = llama.decode_step(
                tiny_model, toks[:, pos], jnp.asarray(pos), cache, TINY)
            np.testing.assert_allclose(logits_d, full[:, pos], rtol=2e-2,
                                       atol=0.05)

    def test_generate_greedy(self, tiny_model):
        toks = rand_tokens(jax.random.PRNGKey(4), 2, 5)
        out = llama.generate_greedy(tiny_model, toks, 4, TINY)
        assert out.shape == (2, 9)
        np.testing.assert_array_equal(np.asarray(out[:, :5]),
                                      np.asarray(toks))


class TestCompressedLinear:
    def test_dense_vs_compressed_apply(self):
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32) * 0.1)
        L = jnp.asarray(rng.normal(size=(128, 8)).astype(np.float32) * 0.05)
        R = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32) * 0.05)
        lin = compress_linear(W, L, R, 4)
        x = jnp.asarray(rng.normal(size=(3, 128)).astype(np.float32))
        y = apply_linear(lin, x)
        y_ref = x @ lin.materialize().T
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=0.05, atol=0.05)

    def test_batched_leading_dims(self):
        rng = np.random.default_rng(1)
        W = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
        lin = DenseLinear(w=W)
        x = jnp.asarray(rng.normal(size=(2, 5, 128)).astype(np.float32))
        y = apply_linear(lin, x)
        assert y.shape == (2, 5, 128)


class TestSurgery:
    def test_compress_reduces_bits_and_keeps_function(self, tiny_model):
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=16, iters=2,
                           lplr_iters=2)
        qparams, report = compress_model(tiny_model, cp)
        # every projection of both layers compressed
        assert len(report.compressed) == 2 * 7
        assert not report.skipped
        assert report.avg_bits_per_param < 8.5
        for lp in qparams.layers:
            assert isinstance(lp.q_proj, CalderaLinear)
        # outputs stay close on the same tokens
        toks = rand_tokens(jax.random.PRNGKey(5), 1, 8)
        base = np.asarray(llama.forward(tiny_model, toks, TINY))
        comp = np.asarray(llama.forward(qparams, toks, TINY))
        base_p = jax.nn.softmax(jnp.asarray(base), axis=-1)
        comp_p = jax.nn.softmax(jnp.asarray(comp), axis=-1)
        tv = float(jnp.abs(base_p - comp_p).sum(-1).max()) / 2
        assert tv < 0.5  # 4-bit + rank-16 keeps distributions close

    def test_quality_gate_skips_bad_layers(self, tiny_model):
        # threshold 0 forces every layer through the gate
        cp = CalderaParams(Q_bits=2, L_bits=16, R_bits=16, rank=2, iters=1,
                           lplr_iters=1)
        qparams, report = compress_model(tiny_model, cp, error_threshold=0.0)
        assert len(report.skipped) == 2 * 7
        for lp in qparams.layers:
            assert isinstance(lp.q_proj, DenseLinear)

    def test_layer_range_and_filter(self, tiny_model):
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        qparams, report = compress_model(
            tiny_model, cp, layer_range=(1, 1), proj_filter=("q_proj",))
        assert report.compressed == ["layers.1.q_proj"]
        assert isinstance(qparams.layers[0].q_proj, DenseLinear)
        assert isinstance(qparams.layers[1].q_proj, CalderaLinear)

    def test_hessian_keys_consumed(self, tiny_model):
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        h = {f"layers.0.q_proj": np.ones(TINY.hidden_size)}
        qparams, report = compress_model(
            tiny_model, cp, hessians=h, layer_range=(0, 0),
            proj_filter=("q_proj",))
        assert "layers.0.q_proj" in report.errors


class TestCalibration:
    def test_collect_and_roundtrip(self, tiny_model, tmp_path):
        batches = [np.asarray(rand_tokens(jax.random.PRNGKey(i), 2, 8))
                   for i in range(2)]
        hs = collect_hessians(tiny_model, batches, TINY, diag=True)
        assert len(hs) == 2 * 7
        assert hs["layers.0.q_proj"].shape == (TINY.hidden_size,)
        assert all(np.all(v >= 0) for k, v in hs.items())
        p = str(tmp_path / "h.npz")
        save_hessians(p, hs)
        hs2 = load_hessians(p)
        np.testing.assert_allclose(hs2["layers.0.down_proj"],
                                   hs["layers.0.down_proj"])

    def test_diag_matches_full_diagonal(self, tiny_model):
        batches = [np.asarray(rand_tokens(jax.random.PRNGKey(9), 1, 8))]
        hd = collect_hessians(tiny_model, batches, TINY, diag=True)
        hf = collect_hessians(tiny_model, batches, TINY, diag=False)
        np.testing.assert_allclose(hd["layers.0.q_proj"],
                                   np.diag(hf["layers.0.q_proj"]),
                                   rtol=1e-4, atol=1e-6)

    def test_normalized_once(self, tiny_model):
        # doubling the number of identical batches must not change H
        b = np.asarray(rand_tokens(jax.random.PRNGKey(10), 1, 8))
        h1 = collect_hessians(tiny_model, [b], TINY)
        h2 = collect_hessians(tiny_model, [b, b], TINY)
        np.testing.assert_allclose(h1["layers.0.q_proj"],
                                   h2["layers.0.q_proj"], rtol=1e-6)


class TestPerplexity:
    def test_random_model_near_uniform(self, tiny_model):
        stream = np.random.default_rng(0).integers(
            0, TINY.vocab_size, size=4 * 64)
        ppl = evaluate_perplexity(tiny_model, stream, TINY, window=64,
                                  batch_size=2)
        # an untrained model on uniform tokens ~ vocab-size perplexity
        assert 0.3 * TINY.vocab_size < ppl < 3 * TINY.vocab_size

    def test_compressed_close_to_dense(self, tiny_model):
        cp = CalderaParams(Q_bits=8, L_bits=16, R_bits=16, rank=16, iters=2,
                           lplr_iters=2)
        qparams, _ = compress_model(tiny_model, cp)
        stream = np.random.default_rng(1).integers(0, TINY.vocab_size,
                                                   size=2 * 64)
        p0 = evaluate_perplexity(tiny_model, stream, TINY, window=64)
        p1 = evaluate_perplexity(qparams, stream, TINY, window=64)
        assert abs(np.log(p1) - np.log(p0)) < 0.1

    def test_short_stream_raises(self, tiny_model):
        with pytest.raises(ValueError):
            evaluate_perplexity(tiny_model, np.zeros(10, np.int32), TINY,
                                window=64)


class TestBudgetedSurgery:
    def test_budget_respected_and_sensitive_layers_favored(self, tiny_model):
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model_with_budget)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        # synthetic Hessians: layer 0 q_proj is 100x more sensitive
        h = {}
        for i in range(TINY.num_layers):
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj",
                         "gate_proj", "up_proj", "down_proj"):
                shape = getattr(tiny_model.layers[i], proj).w.shape
                h[f"layers.{i}.{proj}"] = np.ones(shape[1])
        h["layers.0.q_proj"] *= 100.0
        qp, report, alloc = compress_model_with_budget(
            tiny_model, cp, B_tot=3.0, hessians=h, menu=(2, 4, 8))
        assert alloc.budget_used <= 3.0 + 1e-9
        # the sensitive projection gets at least as many bits as any other
        assert alloc.bits["layers.0.q_proj"] == max(alloc.bits.values())
        # mixed precision actually produced and serves
        bits_used = {int(b) for b in alloc.bits.values()}
        assert len(bits_used) >= 2
        toks = rand_tokens(jax.random.PRNGKey(20), 1, 8)
        logits = llama.forward(qp, toks, TINY)
        assert np.isfinite(np.asarray(logits)).all()

    def test_per_layer_bits_match_allocation(self, tiny_model):
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model_with_budget)
        from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
            CalderaLinear)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        qp, report, alloc = compress_model_with_budget(
            tiny_model, cp, B_tot=4.0, menu=(2, 4, 8))
        for i, lp in enumerate(qp.layers):
            for proj in ("q_proj", "down_proj"):
                lin = getattr(lp, proj)
                name = f"layers.{i}.{proj}"
                if isinstance(lin, CalderaLinear):
                    assert lin.num_bits == int(alloc.bits[name])


class TestBatchedSurgery:
    def test_batched_matches_serial(self, tiny_model):
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model, compress_model_batched)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=8, iters=2,
                           lplr_iters=2)
        h = {f"layers.{i}.q_proj": np.ones(TINY.hidden_size) * (i + 1)
             for i in range(TINY.num_layers)}
        serial, rep_s = compress_model(tiny_model, cp, hessians=h)
        batched, rep_b = compress_model_batched(tiny_model, cp, hessians=h)
        assert sorted(rep_b.compressed) == sorted(rep_s.compressed)
        for name in rep_s.errors:
            assert abs(rep_b.errors[name] - rep_s.errors[name]) < 5e-3, name
        toks = rand_tokens(jax.random.PRNGKey(21), 1, 8)
        np.testing.assert_allclose(
            np.asarray(llama.forward(batched, toks, TINY)),
            np.asarray(llama.forward(serial, toks, TINY)),
            rtol=5e-2, atol=5e-2)

    def test_batched_respects_filters(self, tiny_model):
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model_batched)
        from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
            CalderaLinear, DenseLinear)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        qp, report = compress_model_batched(
            tiny_model, cp, layer_range=(1, 1),
            proj_filter=("q_proj", "down_proj"))
        assert isinstance(qp.layers[0].q_proj, DenseLinear)
        assert isinstance(qp.layers[1].q_proj, CalderaLinear)
        assert isinstance(qp.layers[1].down_proj, CalderaLinear)
        assert isinstance(qp.layers[1].up_proj, DenseLinear)
