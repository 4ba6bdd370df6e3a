"""Auxiliary subsystem tests: Hadamard surgery path, yes/no accuracy
harness, profiling utilities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    caldera_with_hadamard)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams, caldera)
from ee274_convexcaldera_llm_quantization_tpu.evalm.accuracy import (
    AccuracyResult, QAExample, evaluate_yes_no_accuracy, extract_yes_no)
from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.utils.profiling import (
    EventLog, PhaseTimer, device_trace)


class TestHadamardSurgery:
    def test_outlier_matrix_benefits_from_rotation(self):
        # a matrix with a few huge outliers: global-scale 2-bit quantization
        # wastes its range on them; Hadamard rotation spreads them out.
        # (Pure-Q config: with low-rank factors enabled the factors absorb
        # the outliers as rank-1 spikes and rotation has nothing to fix.)
        rng = np.random.default_rng(0)
        W = rng.normal(size=(96, 56)).astype(np.float32)
        W[3, 5] = 80.0
        W[60, 40] = -70.0
        W = jnp.asarray(W)
        from ee274_convexcaldera_llm_quantization_tpu.quant.quantizers import (
            QuantizerFactory)
        params = CalderaParams(
            Q_bits=2, compute_low_rank_factors=False, rank=1, iters=1,
            lplr_iters=1, update_order=("Q",),
            quant_factory_Q=QuantizerFactory(method="nf2",
                                             block_size="global"))
        plain = caldera(params, W, scale_W=False)
        err_plain = float(jnp.linalg.norm(plain.reconstruct() - W)
                          / jnp.linalg.norm(W))
        _, err_rot = caldera_with_hadamard(params, W)
        # rotation makes the matrix Gaussian-like, which the NF2 codebook is
        # tuned for; with outliers present the un-rotated scale is wrecked
        assert err_rot < 0.6 < err_plain

    def test_diag_hessian_path_finite(self):
        rng = np.random.default_rng(1)
        W = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
        h = jnp.asarray(np.abs(rng.normal(size=48)).astype(np.float32) + 0.1)
        params = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4,
                               iters=1, lplr_iters=1, sigma_reg=1e-6)
        W_hat, err = caldera_with_hadamard(params, W, H=h)
        assert np.isfinite(np.asarray(W_hat)).all()
        assert err < 1.0


class TestAccuracyHarness:
    def test_extract_yes_no(self):
        assert extract_yes_no("Yes, there is a dog.") == "yes"
        assert extract_yes_no("The answer is NO way") == "no"
        assert extract_yes_no("maybe") is None
        assert extract_yes_no("") is None

    def test_end_to_end_with_token_detokenizer(self):
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        rng = np.random.default_rng(2)
        examples = [QAExample(prompt_tokens=rng.integers(
            0, TINY.vocab_size, size=4), label="yes") for _ in range(3)]

        # detokenizer: even first token -> "yes", odd -> "no"
        def detok(ids):
            return "yes" if ids and ids[0] % 2 == 0 else "no"

        res = evaluate_yes_no_accuracy(params, examples, TINY, detok,
                                       max_new_tokens=2)
        assert res.num_evaluated == 3
        assert res.num_failed == 0
        assert 0.0 <= res.accuracy <= 1.0
        assert len(res.per_example) == 3

    def test_failures_counted_not_fatal(self):
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        examples = [QAExample(prompt_tokens=np.zeros(4, np.int64),
                              label="yes")]

        def broken_detok(ids):
            raise RuntimeError("tokenizer exploded")

        res = evaluate_yes_no_accuracy(params, examples, TINY, broken_detok,
                                       max_new_tokens=2)
        assert res.num_failed == 1
        assert res.accuracy == 0.0


class TestProfiling:
    def test_phase_timer(self):
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        with t.phase("a"):
            pass
        s = t.summary()
        assert list(s) == ["a", "b"]
        assert all(v >= 0 for v in s.values())

    def test_device_trace_noop(self):
        with device_trace(None):
            x = jnp.ones(4) + 1
        assert float(x.sum()) == 8.0

    def test_event_log(self, tmp_path):
        log = EventLog()
        log.log("outliers", layer="q_proj", count=3)
        log.log("outliers", layer="k_proj", count=0)
        log.log("gate", layer="v_proj", err=0.5)
        assert len(log.of_kind("outliers")) == 2
        p = str(tmp_path / "events.jsonl")
        log.dump(p)
        import json
        lines = [json.loads(l) for l in open(p)]
        assert lines[0]["layer"] == "q_proj"


class TestHadamardSurgeryIntegration:
    def test_use_hadamard_produces_dense_materialized_layers(self):
        import jax
        from ee274_convexcaldera_llm_quantization_tpu.models import llama
        from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model)
        from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
            DenseLinear)
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        qp, report = compress_model(params, cp, layer_range=(0, 0),
                                    proj_filter=("q_proj",),
                                    use_hadamard=True)
        # rotated path materializes dense (reference behavior) with the
        # decomposition applied
        lin = qp.layers[0].q_proj
        assert isinstance(lin, DenseLinear)
        assert not np.allclose(np.asarray(lin.w, np.float32),
                               np.asarray(params.layers[0].q_proj.w,
                                          np.float32))
        assert report.errors["layers.0.q_proj"] < 1.0
