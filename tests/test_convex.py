"""Convex-CALDERA allocator tests: solver optimality via the duality-gap
certificate, both program forms, rounding/repair, and the full pipeline
(SURVEY.md section 2.2; the certificates here are real, unlike the
reference's relative-error proxy)."""

import numpy as np
import pytest

from ee274_convexcaldera_llm_quantization_tpu.allocate import convex as cx


RNG = np.random.default_rng(3)


def solve(W, params):
    H, Hs, ev, V, kappa, c = cx.compute_hessian_and_sensitivities(W)
    return cx.solve_convex_optimization(W, ev, V, kappa, c, params), (ev, V,
                                                                      kappa, c)


class TestSolver:
    def test_penalty_form_certified_optimal(self):
        W = RNG.normal(size=(64, 48))
        p = cx.ConvexCalderaParams(B_tot=3.0, mu=0.5, lambda_reg=0.05)
        (L, R, b, obj, status, gap), _ = solve(W, p)
        assert status == "optimal"
        assert gap <= 1e-6 * max(1.0, obj)

    def test_constrained_form_certified_optimal(self):
        W = RNG.normal(size=(64, 48))
        p = cx.ConvexCalderaParams(B_tot=3.0, tau_star=30.0, lambda_reg=0.05)
        (L, R, b, obj, status, gap), _ = solve(W, p)
        assert gap <= 1e-6 * max(1.0, obj)
        nuc = np.linalg.svd(L, compute_uv=False).sum()
        assert nuc <= 30.0 + 1e-6

    def test_mu_controls_rank(self):
        # a stronger nuclear penalty must not increase the rank of L
        W = RNG.normal(size=(48, 48))
        ranks = []
        for mu in (0.05, 5.0, 500.0):
            p = cx.ConvexCalderaParams(mu=mu, lambda_reg=0.05)
            (L, *_), _ = solve(W, p)
            ranks.append(int(np.sum(
                np.linalg.svd(L, compute_uv=False) > 1e-8)))
        assert ranks[0] >= ranks[1] >= ranks[2]

    def test_b_star_saturates_budget(self):
        W = RNG.normal(size=(32, 32))
        p = cx.ConvexCalderaParams(B_tot=3.0, b_max=16.0)
        (_, _, b, *_), _ = solve(W, p)
        assert b == pytest.approx(3.0)
        p2 = cx.ConvexCalderaParams(B_tot=100.0, b_max=8.0)
        (_, _, b2, *_), _ = solve(W, p2)
        assert b2 == pytest.approx(8.0)

    def test_hessian_weighting_enters_solution(self):
        W = RNG.normal(size=(32, 32))
        h = np.ones(32)
        h[:4] = 1000.0
        p = cx.ConvexCalderaParams(mu=1.0, lambda_reg=0.5)
        H, Hs, ev, V, kappa, c = cx.compute_hessian_and_sensitivities(
            W, np.diag(h))
        L, R, b, obj, status, gap = cx.solve_convex_optimization(
            W, ev, V, kappa, c, p)
        assert gap <= 1e-6 * max(1.0, obj)
        E = W - L - R
        # heavily weighted columns must carry less residual energy
        assert np.linalg.norm(E[:, :4]) < np.linalg.norm(E[:, 4:])

    def test_zero_matrix(self):
        res = cx.convex_caldera(np.zeros((16, 16)))
        assert np.isfinite(res.objective_value)
        assert np.allclose(res.W_compressed, 0.0)


class TestRounding:
    def test_nearest(self):
        assert cx.round_bit_allocations(3.4, [2, 3, 4, 8, 16], 16.0) == 3
        assert cx.round_bit_allocations(3.6, [2, 3, 4, 8, 16], 16.0) == 4

    def test_budget_repair(self):
        # nearest is 8 but budget only allows 4
        assert cx.round_bit_allocations(7.0, [2, 3, 4, 8, 16], 4.0) == 4
        # nothing affordable -> minimum
        assert cx.round_bit_allocations(7.0, [4, 8], 2.0) == 4


class TestFactorization:
    def test_rank_by_nuclear_budget(self):
        U = np.linalg.qr(RNG.normal(size=(32, 8)))[0]
        V = np.linalg.qr(RNG.normal(size=(24, 8)))[0]
        s = np.array([10.0, 8, 6, 4, 2, 1, 0.5, 0.25])
        L_star = (U * s) @ V.T
        Lf, Rf, rank = cx.low_rank_factorization(L_star, tau_star=20.0,
                                                 mu=None)
        # reference semantics (convex_caldera.py:301-305): searchsorted on
        # the cumulative nuclear norm (10, 18, 24, ...) plus one -> rank 3
        assert rank == 3
        Lf2, Rf2, rank2 = cx.low_rank_factorization(L_star, None, 0.1)
        assert rank2 == 8
        np.testing.assert_allclose(Lf2 @ Rf2, L_star, atol=1e-8)

    def test_factor_quantization(self):
        L_star = RNG.normal(size=(16, 16))
        Lf, Rf, _ = cx.low_rank_factorization(L_star, None, 0.1,
                                              quantize=True, factor_bits=8)
        full = Lf @ Rf
        rel = np.linalg.norm(full - L_star) / np.linalg.norm(L_star)
        assert rel < 0.05


class TestResidualQuant:
    def test_step_size_and_clamp(self):
        R = RNG.normal(size=(32, 32))
        Rq, delta = cx.quantize_residual(R, 4)
        t = np.abs(R).max()
        assert delta == pytest.approx(2 * t / 15)
        codes = Rq / delta
        assert np.all(np.abs(codes - np.round(codes)) < 1e-9)
        assert np.abs(codes).max() <= 7

    def test_zero_residual(self):
        Rq, delta = cx.quantize_residual(np.zeros((4, 4)), 4)
        assert delta == 0.0 and np.all(Rq == 0)


class TestPipeline:
    def test_full_pipeline_certificates(self):
        W = RNG.normal(size=(64, 64))
        res = cx.convex_caldera(W, params=cx.ConvexCalderaParams(
            B_tot=4.0, mu=2.0, lambda_reg=0.05))
        certs = res.group_info["certificates"]
        assert res.solver_status in ("optimal", "max_iters")
        assert res.avg_bit_width <= 4.0
        assert certs["duality_gap"] >= 0.0
        assert certs["relative_error"] < 1.0
        # reconstruction must match the factorized + quantized parts
        np.testing.assert_allclose(
            res.W_compressed,
            res.group_info["L"] @ res.group_info["R_lr"] + res.R_star,
            atol=1e-8)

    def test_calibration_data_path(self):
        W = RNG.normal(size=(32, 32))
        X = RNG.normal(size=(128, 32))
        res = cx.convex_caldera(W, calibration_data=X,
                                params=cx.ConvexCalderaParams(mu=1.0))
        assert np.isfinite(res.objective_value)

    def test_diag_hessian_input(self):
        W = RNG.normal(size=(32, 32))
        res = cx.convex_caldera(W, H=np.ones(32),
                                params=cx.ConvexCalderaParams(mu=1.0))
        assert np.isfinite(res.objective_value)
