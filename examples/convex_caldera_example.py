"""Convex-CALDERA walkthrough: penalty form, constrained form, certificates,
and a bit-budget sweep.

Mirrors the reference's ``convex_caldera_example.py`` (which ships with a
broken import path, reference ``convex_caldera_example.py:13-16``): runs the
convex program on a synthetic low-rank-plus-noise matrix, prints the
certificates (effective rank, achieved bits, duality gap — here a *real*
gap, not the reference's relative-error proxy), and sweeps
``B_tot in {1.5, 2.0, 2.5, 3.0, 4.0}``.

Run: ``python examples/convex_caldera_example.py``
"""

import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.allocate.convex import (
    ConvexCalderaParams, convex_caldera)
from ee274_convexcaldera_llm_quantization_tpu.evalm import metrics as M


def make_matrix(m=256, n=256, rank=16, noise=0.1, seed=0):
    rng = np.random.default_rng(seed)
    U = rng.normal(size=(m, rank)) / np.sqrt(rank)
    V = rng.normal(size=(rank, n))
    return U @ V + noise * rng.normal(size=(m, n))


def main():
    W = make_matrix()

    print("=== Penalty form (mu controls rank) ===")
    res = convex_caldera(W, params=ConvexCalderaParams(
        B_tot=3.0, mu=2.0, lambda_reg=0.05))
    c = res.group_info["certificates"]
    print(f"status={res.solver_status}  bits={res.avg_bit_width}  "
          f"eff_rank={res.effective_rank:.0f}")
    print(f"rel_error={c['relative_error']:.4f}  "
          f"duality_gap={c['duality_gap']:.3e}  "
          f"objective={c['objective_value']:.4f}")

    print("\n=== Constrained form (nuclear-norm ball) ===")
    res = convex_caldera(W, params=ConvexCalderaParams(
        B_tot=3.0, tau_star=40.0, lambda_reg=0.05))
    c = res.group_info["certificates"]
    print(f"status={res.solver_status}  eff_rank={res.effective_rank:.0f}  "
          f"gap={c['duality_gap']:.3e}  rel_error={c['relative_error']:.4f}")

    print("\n=== Bit-budget sweep ===")
    bits, errors = [], []
    for B in (1.5, 2.0, 2.5, 3.0, 4.0):
        res = convex_caldera(W, params=ConvexCalderaParams(
            B_tot=B, mu=2.0, lambda_reg=0.05,
            discrete_bits=(2, 3, 4, 8, 16), b_min=1.0))
        c = res.group_info["certificates"]
        bits.append(res.avg_bit_width)
        errors.append(c["relative_error"])
        print(f"B_tot={B:.1f}: discrete_bits={res.avg_bit_width}  "
              f"rel_error={c['relative_error']:.4f}  "
              f"gap={c['duality_gap']:.3e}")

    M.plot_accuracy_vs_bits(bits, [1 - e for e in errors],
                            save_path="convex_caldera_sweep.png")
    print("\nwrote convex_caldera_sweep.png")


if __name__ == "__main__":
    main()
