"""Convex-CALDERA: convex low-rank + low-precision compression with
certificates (effective rank, achieved average bits, duality gap).

Re-implements the reference pipeline
(``src/convex_caldera/decomposition/convex_caldera.py``, "Algorithm 1",
steps 1-7) without an external cone solver. The reference encodes the
rate-distortion constraint ``q >= c * exp(-k b)`` with a CVXPY ``ExpCone``
whose argument order does not match CVXPY semantics
(``convex_caldera.py:191-198``), making the solve infeasible in practice and
the SVD fallback the de-facto path; its "duality gap" is just the relative
error (``convex_caldera.py:406-408``). Here the program is solved exactly:

The penalty-form problem

    min_{L,R,b,q}  1/2 ||(W - L - R) H^{1/2}||_F^2 + mu ||L||_* + lambda q
    s.t.           ||R||_F^2 <= kappa q,   q >= c e^{-k b},
                   b_min <= b <= b_max,    p b <= B_tot

has structure that eliminates (b, q) analytically: the objective is
decreasing in b through the exp-cone constraint, so the optimal bit-width is
the largest feasible ``b* = min(b_max, B_tot / p)``, and at the optimum
``q* = max(||R||_F^2 / kappa, c e^{-k b*})``. What remains is a convex
program in (L, R) only:

    min_{L,R}  F(L, R) = 1/2 ||(W - L - R) Hs||_F^2 + mu ||L||_*
                         + lambda max(||R||_F^2 / kappa, q_floor)

solved by exact alternating minimization: the R-step has a closed form in
the Hessian eigenbasis (a generalized ridge / trust-region update), the
L-step is FISTA with singular-value thresholding. The duality gap is a true
certificate: a dual-feasible point is constructed from the residual
(Lagrange multiplier of the splitting constraint E + L + R = W, scaled into
the spectral-norm ball ``||Lambda||_2 <= mu``) and the Fenchel dual

    g(Lambda) = <Lambda, W> - 1/2 tr(Lambda H^{-1} Lambda^T)
                - h*(Lambda)        [h = lambda max(.^2/kappa, q_floor)]

evaluated exactly, so ``gap = F - g >= F - F_opt`` is a sound bound.

The constrained form (``||L||_* <= tau_star``) is solved with projected
FISTA (projection = singular-value simplex projection) and certified with
the same dual where the nuclear-norm term's conjugate is the support
function ``tau_star * sigma_max(Lambda)``.
"""

from __future__ import annotations

import dataclasses
import time
import warnings
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class ConvexCalderaParams:
    """Parameters (mirrors reference ``ConvexCalderaParams``,
    ``convex_caldera.py:18-54``)."""

    B_tot: float = 2.0
    b_min: float = 2.0
    b_max: float = 16.0
    # Rank control: exactly one of (tau_star, mu) applies; mu is the penalty
    # form default, tau_star switches to the constrained form.
    tau_star: Optional[float] = None
    mu: Optional[float] = 0.1
    lambda_reg: float = 0.01
    k: float = 1.0
    discrete_bits: Tuple[int, ...] = (2, 3, 4, 8, 16)
    solver_tol: float = 1e-6
    max_outer_iters: int = 60
    fista_iters: int = 40
    tolerance: float = 0.05
    quantize_factors: bool = False
    factor_bits: int = 16


@dataclasses.dataclass
class ConvexCalderaDecomposition:
    """Result (mirrors reference ``ConvexCalderaDecomposition``,
    ``convex_caldera.py:57-82``) with honest certificates."""

    L_star: np.ndarray
    R_star: np.ndarray
    W_compressed: np.ndarray
    b_star: np.ndarray
    b_discrete: np.ndarray
    avg_bit_width: float
    effective_rank: float
    duality_gap: float
    residual_norm: float
    solve_time: float
    solver_status: str
    objective_value: float
    group_info: Dict = dataclasses.field(default_factory=dict)


# ---------------------------------------------------------------------------
# Step 1: calibration (Hessian, sensitivity, rate-distortion constant)
# ---------------------------------------------------------------------------

def compute_hessian_and_sensitivities(
    W: np.ndarray,
    H: Optional[np.ndarray] = None,
    calibration_data: Optional[np.ndarray] = None,
):
    """PSD-clamp H, return (H, H^{1/2}, eigvals, eigvecs, kappa, c).

    Matches reference step 1 (``convex_caldera.py:85-125``): H from the arg,
    else the Gram of calibration data, else identity; eigvals clamped at
    1e-8; ``kappa = ||W||_F``; ``c = 0.1 * Var(W)``.
    """
    n = W.shape[1]
    if H is None:
        if calibration_data is None:
            H = np.eye(n, dtype=np.float64)
        else:
            X = np.asarray(calibration_data, np.float64)
            H = X.T @ X
    H = np.asarray(H, np.float64)
    if H.ndim == 1:
        H = np.diag(H)
    H = (H + H.T) / 2
    eigvals, eigvecs = np.linalg.eigh(H)
    eigvals = np.clip(eigvals, 1e-8, None)
    H = (eigvecs * eigvals) @ eigvecs.T
    H_sqrt = (eigvecs * np.sqrt(eigvals)) @ eigvecs.T
    kappa = max(float(np.linalg.norm(W)), 1e-12)
    c = 0.1 * float(np.var(W))
    return H, H_sqrt, eigvals, eigvecs, kappa, c


# ---------------------------------------------------------------------------
# Step 2: the convex solve
# ---------------------------------------------------------------------------

def _h_conj(nrm: float, lam: float, kappa: float, q_floor: float) -> float:
    """Fenchel conjugate of ``h(R) = lam * max(||R||^2 / kappa, q_floor)``
    evaluated at a matrix with Frobenius norm ``nrm``.

    ``sup_r r * nrm - h(r)`` over the scalar radius r >= 0 (h is radial):
    on the flat piece the sup is at the kink ``r0 = sqrt(kappa * q_floor)``;
    on the quadratic piece at ``r = kappa * nrm / (2 lam)`` when that point
    is beyond the kink.
    """
    if lam <= 0:
        return 0.0 if nrm <= 0 else np.inf
    r0 = float(np.sqrt(max(kappa * q_floor, 0.0)))
    cand = r0 * nrm - lam * q_floor          # sup on the flat piece (at kink)
    r_quad = kappa * nrm / (2.0 * lam)        # unconstrained max, quad piece
    if r_quad >= r0:
        cand = max(cand, kappa * nrm ** 2 / (4.0 * lam))
    return cand


def _svt(X: np.ndarray, thresh: float):
    """Singular value thresholding prox: argmin_Z 1/2||Z-X||^2 + t||Z||_*."""
    U, s, Vh = np.linalg.svd(X, full_matrices=False)
    s2 = np.maximum(s - thresh, 0.0)
    r = int(np.sum(s2 > 0))
    return (U[:, :r] * s2[:r]) @ Vh[:r, :], s2


def _project_nuclear_ball(X: np.ndarray, tau: float):
    """Euclidean projection onto {Z : ||Z||_* <= tau} via simplex projection
    of the singular values."""
    U, s, Vh = np.linalg.svd(X, full_matrices=False)
    if s.sum() <= tau:
        return X, s
    # project s onto the simplex {s' >= 0, sum s' = tau}
    mu_sorted = np.sort(s)[::-1]
    cssv = np.cumsum(mu_sorted) - tau
    ind = np.arange(1, len(s) + 1)
    cond = mu_sorted - cssv / ind > 0
    rho = ind[cond][-1]
    theta = cssv[rho - 1] / rho
    s2 = np.maximum(s - theta, 0.0)
    r = int(np.sum(s2 > 0))
    return (U[:, :r] * s2[:r]) @ Vh[:r, :], s2


def _r_step(M: np.ndarray, eigvals: np.ndarray, eigvecs: np.ndarray,
            lam: float, kappa: float, q_floor: float) -> np.ndarray:
    """Exact R-step: argmin_R 1/2 tr((M-R) H (M-R)^T) + lam*max(||R||^2/kappa, q_floor).

    In the eigenbasis of H the ridge solution is
    ``R = M V diag(ev / (ev + theta)) V^T`` with ``theta = 2 lam / kappa``.
    Three candidate regimes (flat interior, ridge, kink boundary) are
    evaluated and the best feasible-regime candidate returned.
    """
    Mt = M @ eigvecs
    r0sq = kappa * q_floor

    def ridge(theta):
        return (Mt * (eigvals / (eigvals + theta))) @ eigvecs.T

    def cost(R):
        E = M - R
        Et = E @ eigvecs
        quad = 0.5 * float(np.sum((Et * Et) * eigvals))
        return quad + lam * max(float(np.sum(R * R)) / kappa, q_floor)

    candidates = []
    # flat regime: no shrinkage needed if ||M||^2 <= kappa q_floor
    if float(np.sum(M * M)) <= r0sq:
        candidates.append(M)
    # ridge regime
    R_ridge = ridge(2.0 * lam / kappa)
    if float(np.sum(R_ridge * R_ridge)) >= r0sq - 1e-12:
        candidates.append(R_ridge)
    # boundary ||R||^2 = kappa q_floor: bisection on theta
    if not candidates and r0sq > 0:
        lo, hi = 0.0, 2.0 * lam / kappa
        for _ in range(80):
            mid = (lo + hi) / 2
            if float(np.sum(ridge(mid) ** 2)) > r0sq:
                lo = mid
            else:
                hi = mid
        candidates.append(ridge((lo + hi) / 2))
    if not candidates:
        candidates.append(R_ridge)
    return min(candidates, key=cost)


def _l_step_fista(N: np.ndarray, L0: np.ndarray, eigvals: np.ndarray,
                  eigvecs: np.ndarray, mu: Optional[float],
                  tau_star: Optional[float], iters: int) -> np.ndarray:
    """L-step: argmin_L 1/2 tr((N-L) H (N-L)^T) + mu||L||_*  (penalty), or
    s.t. ||L||_* <= tau_star (constrained). FISTA with step 1/lambda_max(H)."""
    step = 1.0 / float(eigvals.max())
    L = L0.copy()
    Z = L0.copy()
    t = 1.0
    for _ in range(iters):
        grad = ((Z - N) @ eigvecs * eigvals) @ eigvecs.T
        Y = Z - step * grad
        if tau_star is not None:
            L_new, _ = _project_nuclear_ball(Y, tau_star)
        else:
            L_new, _ = _svt(Y, mu * step)
        t_new = (1 + np.sqrt(1 + 4 * t * t)) / 2
        Z = L_new + ((t - 1) / t_new) * (L_new - L)
        L, t = L_new, t_new
    return L


def solve_convex_optimization(
    W: np.ndarray,
    eigvals: np.ndarray,
    eigvecs: np.ndarray,
    kappa: float,
    c: float,
    params: ConvexCalderaParams,
    p: float = 1.0,
):
    """Step 2: solve the reduced convex program in (L, R).

    Returns (L_star, R_star, b_star, objective, status, duality_gap).
    """
    W = np.asarray(W, np.float64)
    b_star = float(min(params.b_max, params.B_tot / p))
    if b_star < params.b_min:
        warnings.warn("bit budget infeasible: B_tot/p < b_min; clamping")
        b_star = params.b_min
    q_floor = c * np.exp(-params.k * b_star)
    lam = params.lambda_reg
    mu, tau = params.mu, params.tau_star
    if tau is not None:
        mu = None

    def primal(L, R):
        E = W - L - R
        Et = E @ eigvecs
        val = 0.5 * float(np.sum((Et * Et) * eigvals))
        s = np.linalg.svd(L, compute_uv=False)
        if mu is not None:
            val += mu * float(s.sum())
        val += lam * max(float(np.sum(R * R)) / kappa, q_floor)
        return val

    # Marginalize R analytically. In the ridge regime the exact R given L is
    # ``R = (W - L) V diag(ev/(ev+theta)) V^T`` with ``theta = 2 lam/kappa``,
    # and substituting it back collapses the smooth part to a quadratic in L
    # with effective spectrum ``d_i = theta ev_i / (ev_i + theta)``:
    #
    #   F(L) = 1/2 tr((W-L) V diag(d) V^T (W-L)^T) + mu ||L||_*  [or ball]
    #
    # Solving in L directly avoids the block-coordinate pathology of
    # alternating on two blocks that couple only through their sum (BCD on
    # f(L+R) stalls at rate 1/(1+theta) per sweep for small theta).
    theta = 2.0 * lam / kappa
    d = theta * eigvals / (eigvals + theta)
    step = 1.0 / float(d.max())
    total_iters = params.max_outer_iters * params.fista_iters
    L = np.zeros_like(W)
    Z = L.copy()
    t = 1.0
    prev = np.inf
    status = "max_iters"
    for it in range(total_iters):
        grad = ((Z - W) @ eigvecs * d) @ eigvecs.T
        Y = Z - step * grad
        if tau is not None:
            L_new, _ = _project_nuclear_ball(Y, tau)
        else:
            L_new, _ = _svt(Y, mu * step)
        t_new = (1 + np.sqrt(1 + 4 * t * t)) / 2
        Z = L_new + ((t - 1) / t_new) * (L_new - L)
        L = L_new
        t = t_new
        if it % 10 == 9:
            Et = (W - L) @ eigvecs
            obj = 0.5 * float(np.sum((Et * Et) * d))
            if abs(prev - obj) <= params.solver_tol * max(1.0, abs(prev)):
                status = "optimal"
                break
            prev = obj

    # Exact R for the final L (handles the flat / boundary q regimes too),
    # plus the all-in-R candidate that is optimal when q_floor dominates.
    R = _r_step(W - L, eigvals, eigvecs, lam, kappa, q_floor)
    L0 = np.zeros_like(W)
    R0 = _r_step(W, eigvals, eigvecs, lam, kappa, q_floor)
    if primal(L0, R0) < primal(L, R):
        L, R = L0, R0

    obj = primal(L, R)
    gap = duality_gap(W, L, R, eigvals, eigvecs, kappa, lam, q_floor,
                      mu=mu, tau_star=tau, primal_value=obj)
    return L, R, b_star, obj, status, gap


def duality_gap(W, L, R, eigvals, eigvecs, kappa, lam, q_floor, *,
                mu=None, tau_star=None, primal_value=None):
    """True duality gap from a dual-feasible point.

    Splitting E + L + R = W with multiplier Lambda gives the dual

        g(Lambda) = <Lambda, W> - 1/2 tr(Lambda H^{-1} Lambda^T)
                    - f1*(Lambda) - h*(||Lambda||_F)

    where f1 = mu||.||_* has conjugate = indicator of {||.||_2 <= mu}
    (penalty form) or f1 = delta(||.||_* <= tau) has conjugate
    tau * ||Lambda||_2 (constrained form). The natural candidate is the
    gradient Lambda = (W - L - R) H, scaled into the spectral ball when
    needed. Every term is evaluated exactly, so g is a sound lower bound and
    ``gap >= primal - optimum`` is a certificate.
    """
    E = W - L - R
    Lam = (E @ eigvecs * eigvals) @ eigvecs.T
    sig_max = float(np.linalg.norm(Lam, 2))
    if mu is not None and sig_max > mu > 0:
        Lam = Lam * (mu / sig_max)
        sig_max = mu
    # dual terms
    Lt = Lam @ eigvecs
    quad = 0.5 * float(np.sum((Lt * Lt) / eigvals))
    g = float(np.sum(Lam * W)) - quad
    if tau_star is not None:
        g -= tau_star * sig_max
    g -= _h_conj(float(np.linalg.norm(Lam)), lam, kappa, q_floor)
    if primal_value is None:
        primal_value = np.inf
    return max(primal_value - g, 0.0)


# ---------------------------------------------------------------------------
# Steps 3-6: rounding, factorization, residual quantization, certificates
# ---------------------------------------------------------------------------

def round_bit_allocations(b_star: float, discrete_bits: Sequence[int],
                          B_tot: float, p: float = 1.0) -> int:
    """Step 3 (matches reference ``convex_caldera.py:244-273``): nearest
    discrete bit-width, repaired down to the largest affordable one."""
    b = min(discrete_bits, key=lambda x: abs(x - b_star))
    if p * b > B_tot:
        valid = [x for x in discrete_bits if p * x <= B_tot]
        b = max(valid) if valid else min(discrete_bits)
    return int(b)


def low_rank_factorization(L_star: np.ndarray, tau_star: Optional[float],
                           mu: Optional[float], quantize: bool = False,
                           factor_bits: int = 16):
    """Step 4 (reference ``convex_caldera.py:276-339``): SVD of L*, rank by
    nuclear-norm budget (constrained) or threshold, sqrt(S) split, optional
    uniform quantization of the factors."""
    U, S, Vh = np.linalg.svd(L_star, full_matrices=False)
    if tau_star is not None:
        rank = int(np.searchsorted(np.cumsum(S), tau_star) + 1)
        rank = min(rank, len(S))
    else:
        rank = int(np.sum(S > S[0] * 1e-6)) if S.size and S[0] > 0 else 0
    rank = max(rank, 1)
    sq = np.sqrt(S[:rank])
    Lf = U[:, :rank] * sq
    Rf = sq[:, None] * Vh[:rank, :]
    if quantize:
        maxq = 2 ** (factor_bits - 1) - 1
        for F in (Lf, Rf):
            sc = np.abs(F).max()
            if sc > 0:
                F[:] = np.round(F / sc * maxq) / maxq * sc
    return Lf, Rf, float(rank)


def quantize_residual(R_star: np.ndarray, b: int):
    """Step 5 (reference ``convex_caldera.py:342-373``): symmetric uniform
    quantization of the residual at ``b`` bits."""
    t = float(np.abs(R_star).max())
    if b < 16:
        delta = 2 * t / (2 ** b - 1)
    else:
        delta = t / 2 ** 15
    if delta == 0:
        return np.zeros_like(R_star), 0.0
    maxv = 2 ** (b - 1) - 1
    R_int = np.clip(np.round(R_star / delta), -maxv, maxv)
    return delta * R_int, delta


def compute_certificates(W, W_compressed, b_discrete, effective_rank,
                         objective_value, duality_gap_value):
    """Step 6 (reference ``convex_caldera.py:376-419``) with the real gap."""
    residual = W - W_compressed
    residual_norm = float(np.linalg.norm(residual))
    relative_error = residual_norm / max(float(np.linalg.norm(W)), 1e-12)
    return {
        "avg_bit_width": float(b_discrete),
        "effective_rank": float(effective_rank),
        "residual_norm": residual_norm,
        "relative_error": relative_error,
        "duality_gap": float(duality_gap_value),
        "objective_value": float(objective_value),
    }


# ---------------------------------------------------------------------------
# Step 7: driver
# ---------------------------------------------------------------------------

def convex_caldera(
    W,
    H=None,
    calibration_data=None,
    params: Optional[ConvexCalderaParams] = None,
) -> ConvexCalderaDecomposition:
    """Full Convex-CALDERA pipeline (reference driver
    ``convex_caldera.py:422-516``). Accepts numpy or JAX arrays."""
    t0 = time.time()
    if params is None:
        params = ConvexCalderaParams()
    W = np.asarray(W, np.float64)
    H_in = None if H is None else np.asarray(H, np.float64)
    cal = None if calibration_data is None else np.asarray(calibration_data)

    H, H_sqrt, eigvals, eigvecs, kappa, c = \
        compute_hessian_and_sensitivities(W, H_in, cal)

    L_star, R_star, b_star, obj, status, gap = solve_convex_optimization(
        W, eigvals, eigvecs, kappa, c, params)

    b_discrete = round_bit_allocations(b_star, params.discrete_bits,
                                       params.B_tot)
    Lf, Rf, eff_rank = low_rank_factorization(
        L_star, params.tau_star, params.mu, params.quantize_factors,
        params.factor_bits)
    R_quant, delta = quantize_residual(R_star, b_discrete)
    # Storage-true reconstruction: factorized L (not the raw L*, which the
    # reference adds back despite counting factor bits —
    # ``convex_caldera.py:481-485``).
    W_compressed = Lf @ Rf + R_quant

    certs = compute_certificates(W, W_compressed, b_discrete, eff_rank, obj,
                                 gap)
    return ConvexCalderaDecomposition(
        L_star=L_star,
        R_star=R_quant,
        W_compressed=W_compressed,
        b_star=np.array([b_star]),
        b_discrete=np.array([b_discrete]),
        avg_bit_width=certs["avg_bit_width"],
        effective_rank=certs["effective_rank"],
        duality_gap=certs["duality_gap"],
        residual_norm=certs["residual_norm"],
        solve_time=time.time() - t0,
        solver_status=status,
        objective_value=certs["objective_value"],
        group_info={
            "L": Lf, "R_lr": Rf, "delta": delta, "certificates": certs,
        },
    )
