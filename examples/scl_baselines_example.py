"""SCL classical-baseline walkthrough: scalar uniform, Lloyd-Max, K-means VQ
on a random matrix, with a rate-distortion sweep and singular-value spectra.

Mirrors the reference's ``scl_baselines_example.py``: all three methods on a
512x512 Gaussian matrix, a rate sweep over bits [1, 2, 3, 4, 6, 8], and a
spectra comparison figure.

Run: ``python examples/scl_baselines_example.py``
"""

import numpy as np
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu.quant.scl import (
    SCLQuantizationParams, scl_quantize)
from ee274_convexcaldera_llm_quantization_tpu.evalm import metrics as M


def main():
    rng = np.random.default_rng(42)
    W = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))

    print("=== Methods at 2 bits ===")
    results = {}
    for method, vd in (("scalar", 1), ("lloyd_max", 1), ("vector", 2)):
        params = SCLQuantizationParams(num_bits=2 * vd, method=method,
                                       vector_dim=vd)
        res = scl_quantize(W, params)
        results[method] = res
        print(f"{method:10s}: rate={res.rate:.2f} bits/sample  "
              f"mse={res.distortion:.5f}  ratio={res.compression_ratio:.1f}x")

    print("\n=== Rate-distortion sweep (Lloyd-Max) ===")
    rates, dists = [], []
    for bits in (1, 2, 3, 4, 6, 8):
        res = scl_quantize(W, SCLQuantizationParams(num_bits=bits,
                                                    method="lloyd_max"))
        rates.append(res.rate)
        dists.append(res.distortion)
        print(f"bits={bits}: mse={res.distortion:.6f}")

    M.plot_loss_vs_rank(rates, dists, save_path="scl_rate_distortion.png")

    spectra = {"original": M.compute_singular_values(np.asarray(W))}
    for method, res in results.items():
        spectra[method] = M.compute_singular_values(
            np.asarray(res.quantized))
    M.plot_singular_value_spectra(spectra, save_path="scl_spectra.png")
    print("\nwrote scl_rate_distortion.png, scl_spectra.png")


if __name__ == "__main__":
    main()
