"""The reference's flagship workflow on its own calibration artifact.

Reproduces ``main.py``'s pipeline shape against the *shipped* Hessians:
quantize the q/k/v/o/gate/up/down projections of layers 17-23 of a
Qwen2-0.5B-shaped language tower (the reference's exact target layer range,
``main.py:6-11``) using the real ``diag_Hessians.pt`` artifact, with the
reference's flagship configuration (Q=2-bit, rank-200 hmm — we use rank-64
for runtime; pass --rank 200 for the exact reference rank), the per-layer
relative-error quality gate, and bit accounting.

Requires the reference checkout at /root/reference (for the Hessian file).

Run: ``python examples/reference_workflow.py [--rank 64] [--layers 17-23]``
"""

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import QWEN2_0_5B
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.calibrate.hessian import (
    load_reference_hessians)

HESSIANS = "/root/reference/diag_Hessians.pt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--layers", default="17-23")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--q-update", default="rtn", choices=["rtn", "ldlq"],
                    help="ldlq: error-feedback Q update (beyond the "
                         "reference's plain RTN, alg.py:253-283)")
    ap.add_argument("--serving-quant", default="uniform",
                    choices=["uniform", "e8p"],
                    help="e8p: 2-bit E8 lattice codebook (the round-4 "
                         "local-search encode makes tower-scale runs "
                         "minutes, not hours)")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.layers.split("-"))

    if not os.path.exists(HESSIANS):
        print("reference diag_Hessians.pt not found; aborting", file=sys.stderr)
        sys.exit(1)

    hessians = load_reference_hessians(HESSIANS)
    print(f"loaded {len(hessians)} language-tower Hessians from the "
          f"reference artifact")

    # Qwen2-0.5B-shaped language tower (randomly initialized — the actual
    # checkpoint is not downloadable in this offline environment; shapes,
    # Hessians, and the full pipeline are the reference's).
    config = QWEN2_0_5B
    params = llama.init_params(jax.random.PRNGKey(0), config)

    cp = CalderaParams(Q_bits=2, L_bits=16, R_bits=16, rank=args.rank,
                       iters=args.iters, lplr_iters=5, sigma_reg=1e-8,
                       q_update=args.q_update)
    if args.serving_quant == "e8p":
        from ee274_convexcaldera_llm_quantization_tpu.quant.quantizers import (
            QuantizerFactory)
        import dataclasses
        cp = dataclasses.replace(
            cp, quant_factory_Q=QuantizerFactory(method="e8p",
                                                 block_size="global"))
    t0 = time.time()
    qparams, report = compress_model(
        params, cp, hessians=hessians, layer_range=(lo, hi),
        error_threshold=0.99,      # reference quality gate (main.py:11)
        min_dim=500,               # reference size filter (main.py:154)
        serving_mode="w4a8", serving_quant=args.serving_quant,
        progress=lambda n, e: print(f"  {n}: rel_err={e:.4f}"))
    dt = time.time() - t0

    print(f"\ncompressed {len(report.compressed)} projections, "
          f"skipped {len(report.skipped)} (quality gate), in {dt:.0f}s")
    print(f"avg bits/param over touched layers: "
          f"{report.avg_bits_per_param:.3f}")
    n_q = sum(np.prod(getattr(qparams.layers[i], p).shape)
              for i in range(lo, hi + 1)
              for p in ("q_proj", "k_proj", "v_proj", "o_proj",
                        "gate_proj", "up_proj", "down_proj"))
    print(f"quantized parameter count (layers {lo}-{hi}): {int(n_q):,} "
          f"(reference accounting, main.py:325-335)")


if __name__ == "__main__":
    main()
