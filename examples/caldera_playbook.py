"""CALDERA playbook: seeded decomposition walkthrough on a random matrix.

Script equivalent of the reference's ``caldera_playbook.ipynb``: a rank-16
4-bit decomposition of a 1024x1024 Gaussian matrix with a Gram Hessian
``H = X X^T`` from a thin calibration matrix, printing the error trajectory.

Run: ``python examples/caldera_playbook.py``
"""

import numpy as np
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu import (
    CalderaParams, caldera)


def main():
    rng = np.random.default_rng(42)
    W = jnp.asarray(rng.normal(size=(1024, 1024)).astype(np.float32))
    X = np.eye(1024, 128, dtype=np.float32)          # thin calibration
    H = jnp.asarray(X @ X.T)

    params = CalderaParams(Q_bits=4, L_bits=4, R_bits=4, rank=16, iters=5,
                           lplr_iters=3, sigma_reg=1e-4)
    decomp = caldera(params, W, H=H, scale_W=True)

    W_hat = decomp.reconstruct()
    rel = float(jnp.linalg.norm(W_hat - W) / jnp.linalg.norm(W))
    print(f"global_scale={decomp.global_scale:.4f}")
    print(f"relative Frobenius error: {rel:.4f}")
    print("error trajectory:")
    for mtx, errs in decomp.errors.items():
        print(f"  {mtx}: " + " ".join(f"{e:.4f}" for e in errs))


if __name__ == "__main__":
    main()
