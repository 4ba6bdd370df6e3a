"""CALDERA solver tests: convergence, numerics vs the reference trajectory,
and batched/vmapped solves (SURVEY.md sections 2.1, 3.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams, caldera, caldera_batched)
from ee274_convexcaldera_llm_quantization_tpu.decomp import lowrank as lr
from ee274_convexcaldera_llm_quantization_tpu.quant.quantizers import (
    QuantizerFactory)


def smoke_params(**kw):
    defaults = dict(Q_bits=2, L_bits=16, R_bits=16, rank=32, iters=3,
                    lplr_iters=5, update_order=("Q", "LR"))
    defaults.update(kw)
    return CalderaParams(**defaults)


def relative_frobenius(W, W_hat):
    return float(jnp.linalg.norm(W_hat - W) / jnp.linalg.norm(W))


class TestSmoke:
    def test_identity_hessian_matches_reference_trajectory(self):
        # BASELINE.md seeded smoke reference: 256x256 randn, rank-32,
        # Q=2-bit global-scale, L/R=16-bit, iters=3, H=I -> rel-fro ~ 0.762
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
        decomp = caldera(smoke_params(), W, H=None, scale_W=False)
        err = relative_frobenius(W, decomp.reconstruct())
        assert 0.70 < err < 0.80, f"rel-fro {err} outside reference band"

    def test_low_rank_helps(self):
        rng = np.random.default_rng(1)
        # planted low-rank + noise: CALDERA should beat plain 2-bit quant
        U = rng.normal(size=(128, 16)).astype(np.float32)
        V = rng.normal(size=(16, 128)).astype(np.float32)
        W = jnp.asarray(U @ V + 0.1 * rng.normal(size=(128, 128)).astype(np.float32))
        with_lr = caldera(smoke_params(rank=16), W, scale_W=False)
        no_lr = caldera(smoke_params(rank=16, compute_low_rank_factors=False),
                        W, scale_W=False)
        err_lr = relative_frobenius(W, with_lr.reconstruct())
        err_plain = relative_frobenius(W, no_lr.reconstruct())
        assert err_lr < err_plain * 0.5

    def test_error_history_monotone_best(self):
        rng = np.random.default_rng(2)
        W = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
        decomp = caldera(smoke_params(iters=4), W, scale_W=False)
        errs = decomp.errors
        assert set(errs) == {"Q", "LR"}
        assert all(len(v) == 4 for v in errs.values())
        all_errs = [e for v in errs.values() for e in v]
        # best reconstruction must be at least as good as every recorded error
        best = relative_frobenius(decomp.W, decomp.Q + decomp.L @ decomp.R)
        assert best <= min(all_errs) + 1e-5


class TestHessianAware:
    def test_diag_hessian_weights_columns(self):
        # columns with high Hessian weight should be reconstructed better
        rng = np.random.default_rng(3)
        W = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
        h = np.ones(64, dtype=np.float32)
        h[:8] = 100.0  # first 8 input dims matter much more
        decomp = caldera(smoke_params(rank=8, iters=3), W, H=jnp.asarray(h),
                         scale_W=False)
        W_hat = decomp.reconstruct()
        E = np.asarray(W_hat - W)
        err_hot = np.linalg.norm(E[:, :8]) / np.linalg.norm(np.asarray(W)[:, :8])
        err_cold = np.linalg.norm(E[:, 8:]) / np.linalg.norm(np.asarray(W)[:, 8:])
        assert err_hot < err_cold

    def test_sigma_reg_handles_singular_hessian(self):
        rng = np.random.default_rng(4)
        W = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
        X = rng.normal(size=(8, 32)).astype(np.float32)  # rank-deficient Gram
        H = jnp.asarray(X.T @ X)
        decomp = caldera(smoke_params(rank=8, iters=2, sigma_reg=1e-4), W,
                         H=H, scale_W=False)
        assert np.isfinite(np.asarray(decomp.reconstruct())).all()

    def test_host_eigh_prep_matches_device(self):
        """Round-5: above _HOST_EIGH_MIN_N the once-per-projection
        eigendecomposition runs on host LAPACK (XLA's TPU eigh temps OOM
        a 16 GB chip at n=11008, measured). The host path must solve to
        the same decomposition as the on-device eigh path."""
        from ee274_convexcaldera_llm_quantization_tpu.decomp import (
            caldera as C)
        rng = np.random.default_rng(6)
        W = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32))
        G = rng.normal(size=(64, 16)).astype(np.float32) / 4.0
        H = jnp.asarray(G @ G.T + np.diag(1.0 + rng.random(64)
                                          .astype(np.float32)))
        params = smoke_params(rank=8, iters=2, lplr_iters=2)
        gs = jnp.asarray(1.0, jnp.float32)
        key = jax.random.PRNGKey(0)
        Qd, Ld, Rd, errd = C.caldera_solve(params, W, H, gs, key,
                                           host_eigh=False)
        Qh, Lh, Rh, errh = C.caldera_solve(params, W, H, gs, key,
                                           host_eigh=True)
        # L/R individually are rotation-ambiguous; the reconstruction,
        # the quantized component, and the error trajectory are not.
        np.testing.assert_allclose(np.asarray(Qh), np.asarray(Qd),
                                   rtol=0, atol=5e-5)
        np.testing.assert_allclose(np.asarray(Qh + Lh @ Rh),
                                   np.asarray(Qd + Ld @ Rd),
                                   rtol=0, atol=5e-4)
        np.testing.assert_allclose(np.asarray(errh), np.asarray(errd),
                                   rtol=5e-4, atol=1e-5)

    def test_full_vs_diag_identity_consistent(self):
        rng = np.random.default_rng(5)
        W = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
        d1 = caldera(smoke_params(rank=4, iters=2), W, H=jnp.ones(32),
                     scale_W=False)
        d2 = caldera(smoke_params(rank=4, iters=2), W, H=None, scale_W=False)
        np.testing.assert_allclose(np.asarray(d1.reconstruct()),
                                   np.asarray(d2.reconstruct()),
                                   rtol=1e-4, atol=1e-5)


class TestConfig:
    def test_global_scale(self):
        rng = np.random.default_rng(6)
        W = jnp.asarray(10.0 * rng.normal(size=(64, 64)).astype(np.float32))
        decomp = caldera(smoke_params(iters=2), W, scale_W=True)
        rms = float(jnp.sqrt(jnp.mean(W * W)))
        assert decomp.global_scale == pytest.approx(rms, rel=1e-5)
        err = relative_frobenius(W, decomp.reconstruct())
        assert err < 1.0

    def test_quantized_factors(self):
        rng = np.random.default_rng(7)
        W = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
        decomp = caldera(smoke_params(L_bits=4, R_bits=4, iters=2), W,
                         scale_W=False)
        err = relative_frobenius(W, decomp.reconstruct())
        assert err < 1.0
        assert np.isfinite(err)

    def test_rand_svd_close_to_exact(self):
        rng = np.random.default_rng(8)
        W = jnp.asarray(rng.normal(size=(96, 64)).astype(np.float32))
        exact = caldera(smoke_params(rank=16, iters=2), W, scale_W=False)
        approx = caldera(smoke_params(rank=16, iters=2, rand_svd=True), W,
                         scale_W=False)
        e1 = relative_frobenius(W, exact.reconstruct())
        e2 = relative_frobenius(W, approx.reconstruct())
        assert abs(e1 - e2) < 0.05

    def test_update_order_lr_first(self):
        rng = np.random.default_rng(9)
        W = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
        decomp = caldera(smoke_params(update_order=("LR", "Q"), iters=2), W,
                         scale_W=False)
        assert set(decomp.errors) == {"LR", "Q"}

    def test_nf_quantizer_for_q(self):
        rng = np.random.default_rng(10)
        W = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
        params = smoke_params(
            Q_bits=2, iters=2,
            quant_factory_Q=QuantizerFactory(method="nf2", block_size=64))
        decomp = caldera(params, W, scale_W=False)
        assert relative_frobenius(W, decomp.reconstruct()) < 1.0


class TestBatched:
    def test_vmap_matches_single(self):
        rng = np.random.default_rng(11)
        Ws = jnp.asarray(rng.normal(size=(3, 48, 32)).astype(np.float32))
        hs = jnp.asarray(
            np.abs(rng.normal(size=(3, 32))).astype(np.float32) + 0.5)
        params = smoke_params(rank=8, iters=2)
        Q, L, R, errors, scales = caldera_batched(params, Ws, hs,
                                                  scale_W=False)
        assert Q.shape == (3, 48, 32) and L.shape == (3, 48, 8)
        for i in range(3):
            single = caldera(params, Ws[i], H=hs[i], scale_W=False)
            np.testing.assert_allclose(
                np.asarray(Q[i] + L[i] @ R[i]),
                np.asarray(single.reconstruct()), rtol=2e-3, atol=2e-3)


class TestLowrankHelpers:
    def test_lstsq_qr_matches_numpy(self):
        rng = np.random.default_rng(12)
        A = rng.normal(size=(64, 8)).astype(np.float32)
        B = rng.normal(size=(64, 16)).astype(np.float32)
        X = np.asarray(lr.lstsq_qr(jnp.asarray(A), jnp.asarray(B)))
        X_ref, *_ = np.linalg.lstsq(A, B, rcond=None)
        np.testing.assert_allclose(X, X_ref, rtol=1e-3, atol=1e-4)

    def test_randomized_svd_captures_spectrum(self):
        rng = np.random.default_rng(13)
        U = np.linalg.qr(rng.normal(size=(128, 16)))[0]
        V = np.linalg.qr(rng.normal(size=(64, 16)))[0]
        s = np.linspace(10, 1, 16)
        Y = jnp.asarray((U * s) @ V.T, dtype=jnp.float32)
        _, S, _ = lr.randomized_svd(Y, 16, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(S), s, rtol=1e-2)

    def test_rank_constrained_regression_optimal_identity(self):
        # with H = I it must equal the truncated SVD (Eckart-Young)
        rng = np.random.default_rng(14)
        W = jnp.asarray(rng.normal(size=(48, 32)).astype(np.float32))
        eigH = lr.EighResult(jnp.ones(32), jnp.eye(32))
        L, R = lr.rank_constrained_regression(W, jnp.eye(32), eigH, 8)
        U, S, Vh = np.linalg.svd(np.asarray(W), full_matrices=False)
        best = (U[:, :8] * S[:8]) @ Vh[:8]
        np.testing.assert_allclose(np.asarray(L @ R), best, rtol=1e-3,
                                   atol=1e-4)


class TestQuantizedCodes:
    def test_codes_round_trip_losslessly(self):
        # re-quantizing a component already on its grid is exact
        rng = np.random.default_rng(15)
        W = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
        params = smoke_params(Q_bits=2, L_bits=4, R_bits=4, rank=8, iters=2,
                              lplr_iters=2)
        decomp = caldera(params, W, scale_W=False)
        codes = decomp.quantized_codes(params)
        q = params.quant_factory_Q.get_quantizer(params.Q_bits)
        from ee274_convexcaldera_llm_quantization_tpu.quant.quantizers import (
            QuantizedTensor)
        qt = QuantizedTensor(codes=codes["Q"][0], scale=codes["Q"][1],
                             shape=decomp.Q.shape, num_bits=params.Q_bits,
                             method="uniform")
        np.testing.assert_allclose(np.asarray(q.dequantize(qt)),
                                   np.asarray(decomp.Q), rtol=1e-5,
                                   atol=1e-6)
        assert codes["L"] is not None and codes["R"] is not None

    def test_e8p_codes_round_trip_losslessly(self):
        # VERDICT r1 #7: e8p Q codes recovered exactly (not via re-running
        # the RMS-relative scale search) — lattice.e8p_recover_codes
        rng = np.random.default_rng(21)
        W = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
        params = smoke_params(
            Q_bits=2, L_bits=16, R_bits=16, rank=8, iters=2, lplr_iters=2,
            quant_factory_Q=QuantizerFactory(method="e8p", block_size=64))
        decomp = caldera(params, W, scale_W=False)
        codes, scale = decomp.quantized_codes(params)["Q"]
        assert codes.dtype == jnp.uint16
        from ee274_convexcaldera_llm_quantization_tpu.ops import (
            blockquant as bq, lattice)
        rec = bq.unblockify(
            lattice.e8p_dequantize_blocks(codes, scale), decomp.Q.shape)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(decomp.Q),
                                   rtol=1e-5, atol=1e-6)

    def test_e8p_ldlq_codes_round_trip_losslessly(self):
        # LDLQ-e8p fixes one scale per row; per-row recovery must be exact
        rng = np.random.default_rng(22)
        W = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
        params = smoke_params(
            Q_bits=2, L_bits=16, R_bits=16, rank=8, iters=2, lplr_iters=2,
            q_update="ldlq",
            quant_factory_Q=QuantizerFactory(method="e8p", block_size=64))
        decomp = caldera(params, W, scale_W=False)
        codes, scale = decomp.quantized_codes(params)["Q"]
        from ee274_convexcaldera_llm_quantization_tpu.ops import lattice
        rec = lattice.e8p_dequantize_blocks(codes, scale)   # per-row blocks
        np.testing.assert_allclose(np.asarray(rec), np.asarray(decomp.Q),
                                   rtol=1e-5, atol=1e-6)

    def test_16bit_factors_have_no_codes(self):
        rng = np.random.default_rng(16)
        W = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
        decomp = caldera(smoke_params(rank=4, iters=1), W, scale_W=False)
        codes = decomp.quantized_codes(smoke_params(rank=4, iters=1))
        assert codes["L"] is None and codes["R"] is None
