"""Low-rank linear algebra helpers for the CALDERA solver.

TPU-first replacements for the reference's ``torch.linalg`` calls
(``alg.py:163-235``): least squares via QR + triangular solve instead of
SVD-based lstsq (stable, and maps onto the MXU), truncated and randomized
SVD, and the closed-form rank-constrained regression used to initialize the
low-rank factors (reference ``LR_init``, ``alg.py:201-235``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class EighResult(NamedTuple):
    eigenvalues: jax.Array   # (n,)
    eigenvectors: jax.Array  # (n, n), columns are eigenvectors


def lstsq_qr(A: jax.Array, B: jax.Array, ridge: float = 1e-10) -> jax.Array:
    """Solve ``min_X ||A @ X - B||_F`` for tall full-rank ``A`` via QR.

    ``A``: (n, r) with n >= r; ``B``: (n, k). Returns (r, k). A tiny ridge
    keeps the triangular solve finite when ``A`` is rank-deficient (the
    reference falls back to pinv on NaN, ``alg.py:164-169``; the ridge makes
    that branch unnecessary and keeps the computation jittable).
    """
    Q, R = jnp.linalg.qr(A, mode="reduced")
    r = R.shape[0]
    Rr = R + ridge * jnp.eye(r, dtype=R.dtype)
    return jax.scipy.linalg.solve_triangular(Rr, Q.T @ B, lower=False)


def truncated_svd(Y: jax.Array, rank: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Thin SVD truncated to ``rank``: returns (U_r, S_r, Vh_r)."""
    U, S, Vh = jnp.linalg.svd(Y, full_matrices=False)
    return U[:, :rank], S[:rank], Vh[:rank, :]


def randomized_svd(Y: jax.Array, rank: int, key: jax.Array,
                   oversample: int = None, n_iter: int = 2):
    """Halko-style randomized range finder + small SVD.

    Mirrors ``torch.svd_lowrank`` with ``q = 2 * rank`` oversampling as used
    by the reference when ``rand_svd=True`` (``alg.py:212-215``), with a
    couple of subspace iterations for accuracy on decaying spectra.
    """
    m, n = Y.shape
    q = min(2 * rank if oversample is None else rank + oversample, min(m, n))
    Omega = jax.random.normal(key, (n, q), dtype=Y.dtype)
    Z = Y @ Omega
    for _ in range(n_iter):
        Z = Y @ (Y.T @ Z)
    Q, _ = jnp.linalg.qr(Z, mode="reduced")
    B = Q.T @ Y
    Ub, S, Vh = jnp.linalg.svd(B, full_matrices=False)
    U = Q @ Ub
    return U[:, :rank], S[:rank], Vh[:rank, :]


def rank_constrained_regression(
    residual: jax.Array,
    H_sqrt: jax.Array,
    eigH: EighResult,
    rank: int,
    data_aware: bool = True,
    rand_svd: bool = False,
    key: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """Closed-form ``min_{L,R} ||(residual - L @ R) H^{1/2}||_F``.

    Data-aware path: SVD of ``Y = residual @ H^{1/2} @ V`` in the Hessian
    eigenbasis, then un-whiten ``R`` by ``diag(1/sqrt(eigvals)) @ V^T``
    (reference ``alg.py:207-224``). Non-data-aware: plain truncated SVD with
    a ``sqrt(S)`` split (``alg.py:227-234``).
    """
    if data_aware:
        Y = residual @ H_sqrt @ eigH.eigenvectors
        if rand_svd:
            U, S, Vh = randomized_svd(Y, rank, key)
        else:
            U, S, Vh = truncated_svd(Y, rank)
        L = U
        R = (S[:, None] * Vh) * (1.0 / jnp.sqrt(eigH.eigenvalues))[None, :]
        R = R @ eigH.eigenvectors.T
    else:
        if rand_svd:
            U, S, Vh = randomized_svd(residual, rank, key)
        else:
            U, S, Vh = truncated_svd(residual, rank)
        sq = jnp.sqrt(S)
        L = U * sq[None, :]
        R = sq[:, None] * Vh
    return L, R


def regularized_eigh(H: jax.Array, sigma_reg: float) -> Tuple[jax.Array, EighResult]:
    """Symmetrize, eigendecompose and shift to be positive definite.

    Returns the (possibly shifted) ``H`` and its eigendecomposition, matching
    reference ``alg.py:53-66``: if ``min(eigvals) < sigma_reg``, shift both
    ``H`` and the eigenvalues by ``sigma_reg - min(eigvals)``.
    """
    H = (H + H.T) / 2.0
    eigvals, eigvecs = jnp.linalg.eigh(H)
    shift = jnp.maximum(sigma_reg - eigvals.min(), 0.0)
    eigvals = eigvals + shift
    H = H + shift * jnp.eye(H.shape[0], dtype=H.dtype)
    return H, EighResult(eigvals, eigvecs)


def hessian_sqrt(eigH: EighResult) -> jax.Array:
    """Symmetric square root ``V diag(sqrt(lambda)) V^T`` (ref ``alg.py:67-68``)."""
    return (eigH.eigenvectors * jnp.sqrt(eigH.eigenvalues)[None, :]) \
        @ eigH.eigenvectors.T
