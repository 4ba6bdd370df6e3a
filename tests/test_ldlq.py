"""LDLQ error-feedback Q update: identity reduction, error improvement on
correlated Hessians, and end-to-end CALDERA integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.decomp import caldera as C

RNG = np.random.default_rng(3)


def aa_err(A, Q, H):
    E = np.asarray(A - Q)
    H = np.asarray(H)
    A = np.asarray(A)
    return np.sqrt(np.sum((E @ H) * E) / np.sum((A @ H) * A))


def correlated_hessian(n, samples=None, seed=0):
    rng = np.random.default_rng(seed)
    s = samples or 4 * n
    X = rng.normal(size=(s, n)).astype(np.float32)
    # strong column correlations
    X = X @ (np.eye(n) + 0.5 * np.tri(n, k=-1).astype(np.float32) / n ** 0.5)
    return (X.T @ X / s).astype(np.float32)


class TestLDLQ:
    def test_identity_reduces_to_per_row_rtn(self):
        A = jnp.asarray(RNG.normal(size=(32, 64)).astype(np.float32))
        U = jnp.eye(64)
        Q = C.ldlq_quantize(A, U, 4)
        maxq = 7
        absmax = np.max(np.abs(np.asarray(A)), axis=1, keepdims=True)
        scale = absmax / maxq
        rtn = np.clip(np.round(np.asarray(A) / scale), -maxq, maxq) * scale
        np.testing.assert_allclose(np.asarray(Q), rtn, rtol=1e-6, atol=1e-7)

    def test_precompute_inverse_identity(self):
        H = jnp.asarray(correlated_hessian(48))
        U = C.ldlq_precompute(H)
        # U^T U = H^{-1} (regularized)
        HinvUU = np.asarray(U.T @ U) @ np.asarray(H)
        np.testing.assert_allclose(HinvUU, np.eye(48), atol=5e-3)
        # upper triangular
        assert np.allclose(np.asarray(U), np.triu(np.asarray(U)), atol=1e-7)

    @pytest.mark.parametrize("bits", [2, 4])
    def test_beats_rtn_on_correlated_hessian(self, bits):
        n = 96
        A = jnp.asarray(RNG.normal(size=(64, n)).astype(np.float32))
        H = jnp.asarray(correlated_hessian(n, seed=1))
        U = C.ldlq_precompute(H)
        Q_ldlq = C.ldlq_quantize(A, U, bits)
        maxq = 2 ** (bits - 1) - 1
        absmax = np.max(np.abs(np.asarray(A)), axis=1, keepdims=True)
        scale = absmax / maxq
        Q_rtn = np.clip(np.round(np.asarray(A) / scale), -maxq, maxq) * scale
        e_ldlq = aa_err(A, Q_ldlq, H)
        e_rtn = aa_err(A, jnp.asarray(Q_rtn), H)
        assert e_ldlq < e_rtn * 0.95, (e_ldlq, e_rtn)

    @pytest.mark.parametrize("panel", [16, 32])
    def test_panel_blocking_matches_unblocked(self, panel):
        # round-5: the trailing update is deferred to one rank-P matmul
        # per panel (GPTQ lazy batching). panel=n runs the original
        # column-at-a-time order; any panel width must agree to f32
        # reordering tolerance.
        n = 64
        A = jnp.asarray(RNG.normal(size=(24, n)).astype(np.float32))
        H = jnp.asarray(correlated_hessian(n, seed=5))
        U = C.ldlq_precompute(H)
        Q_full = C.ldlq_quantize(A, U, 4, panel=n)
        Q_blk = C.ldlq_quantize(A, U, 4, panel=panel)
        # codes sit on a per-row grid; near-ties may flip a step, so
        # compare achieved whitened error instead of bitwise equality
        e_full = aa_err(A, Q_full, H)
        e_blk = aa_err(A, Q_blk, H)
        assert abs(e_full - e_blk) <= 0.02 * e_full + 1e-6, (e_full, e_blk)
        assert float(jnp.mean((Q_full - Q_blk) == 0)) > 0.97

    def test_panel_blocking_e8p_matches_unblocked(self):
        n = 64
        A = jnp.asarray(RNG.normal(size=(16, n)).astype(np.float32))
        H = jnp.asarray(correlated_hessian(n, seed=6))
        U = C.ldlq_precompute(H)
        Q_full = C.ldlq_quantize_e8p(A, U, panel=n)
        Q_blk = C.ldlq_quantize_e8p(A, U, panel=16)
        e_full = aa_err(A, Q_full, H)
        e_blk = aa_err(A, Q_blk, H)
        assert abs(e_full - e_blk) <= 0.02 * e_full + 1e-6, (e_full, e_blk)

    def test_caldera_ldlq_end_to_end(self):
        n = 64
        W = jnp.asarray(RNG.normal(size=(48, n)).astype(np.float32))
        H = jnp.asarray(correlated_hessian(n, seed=2))
        p_rtn = C.CalderaParams(Q_bits=2, L_bits=16, R_bits=16, rank=8,
                                iters=2, lplr_iters=2)
        p_ldlq = C.CalderaParams(Q_bits=2, L_bits=16, R_bits=16, rank=8,
                                 iters=2, lplr_iters=2, q_update="ldlq")
        d_rtn = C.caldera(p_rtn, W, H, scale_W=False)
        d_ldlq = C.caldera(p_ldlq, W, H, scale_W=False)
        e_rtn = aa_err(W, d_rtn.reconstruct(), H)
        e_ldlq = aa_err(W, d_ldlq.reconstruct(), H)
        assert e_ldlq < e_rtn, (e_ldlq, e_rtn)

    def test_caldera_ldlq_identity_hessian_runs(self):
        W = jnp.asarray(RNG.normal(size=(32, 32)).astype(np.float32))
        p = C.CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4,
                            iters=1, lplr_iters=1, q_update="ldlq")
        d = C.caldera(p, W, scale_W=False)
        assert np.isfinite(np.asarray(d.reconstruct())).all()

    def test_quantized_codes_roundtrip(self):
        n = 48
        W = jnp.asarray(RNG.normal(size=(32, n)).astype(np.float32))
        H = jnp.asarray(correlated_hessian(n, seed=3))
        p = C.CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4,
                            iters=1, lplr_iters=1, q_update="ldlq")
        d = C.caldera(p, W, H, scale_W=False)
        codes, scale = d.quantized_codes(p)["Q"]
        back = np.asarray(codes, np.float32) * np.asarray(scale)
        rel = (np.linalg.norm(back - np.asarray(d.Q))
               / np.linalg.norm(np.asarray(d.Q)))
        assert rel < 1e-3

    def test_unknown_q_update_raises(self):
        W = jnp.ones((16, 16), jnp.float32)
        p = C.CalderaParams(q_update="bogus", iters=1)
        with pytest.raises(ValueError, match="q_update"):
            C.caldera(p, W, scale_W=False)
