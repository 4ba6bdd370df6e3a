"""2-bit quantizer comparison on the reference's flagship tower workload.

Runs the reference's layer-range compression workflow (Qwen2-0.5B-shaped
language tower, shipped ``diag_Hessians.pt``, reference ``main.py:6-11``)
under three 2-bit serving configurations and reports per-projection
relative errors and exact bit accounting:

1. ``uniform``   — 2-bit absmax per-row (the reference's quantizer family);
2. ``e8p``       — E8 lattice codebook (ops/lattice.py), served via the
                   lossless int4 repack;
3. ``e8p+rot``   — QuIP#-style: Hadamard-rotate, lattice-quantize, serve
                   rotated with runtime FWHT activation rotations.

The tower weights are randomly initialized (no checkpoint download in this
offline environment); Hessians, shapes, layer ranges, quality gate and bit
accounting are the reference's real pipeline.

Run: ``python examples/e8p_tower_comparison.py [--layers 20-23] [--rank 64]``
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import jax

from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import QWEN2_0_5B
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.quant.quantizers import (
    QuantizerFactory)
from ee274_convexcaldera_llm_quantization_tpu.calibrate.hessian import (
    load_reference_hessians)

HESSIANS = "/root/reference/diag_Hessians.pt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--layers", default="20-23")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--projs", default="q_proj,k_proj,v_proj,o_proj,"
                                       "gate_proj,up_proj,down_proj")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.layers.split("-"))
    projs = tuple(args.projs.split(","))

    hessians = None
    if os.path.exists(HESSIANS):
        hessians = load_reference_hessians(HESSIANS)
        print(f"loaded {len(hessians)} reference Hessians")
    else:
        print("reference Hessians not found; using identity", file=sys.stderr)

    params = llama.init_params(jax.random.PRNGKey(0), QWEN2_0_5B)

    configs = {
        "uniform-2bit": dict(
            caldera=CalderaParams(Q_bits=2, L_bits=16, R_bits=16,
                                  rank=args.rank, iters=args.iters),
            surgery=dict(serving_bits=2, serving_mode="w4a8",
                         serving_quant="uniform")),
        "e8p-2bit": dict(
            caldera=CalderaParams(
                Q_bits=2, L_bits=16, R_bits=16, rank=args.rank,
                iters=args.iters,
                quant_factory_Q=QuantizerFactory(method="e8p",
                                                 block_size="global")),
            surgery=dict(serving_bits=4, serving_mode="w4a8",
                         serving_quant="e8p")),
        "e8p-2bit+rot": dict(
            caldera=CalderaParams(
                Q_bits=2, L_bits=16, R_bits=16, rank=args.rank,
                iters=args.iters,
                quant_factory_Q=QuantizerFactory(method="e8p",
                                                 block_size="global")),
            surgery=dict(serving_bits=4, serving_mode="w4a8",
                         serving_quant="e8p", use_hadamard="servable")),
    }

    results = {}
    for name, cfg in configs.items():
        t0 = time.time()
        _, report = compress_model(
            params, cfg["caldera"], hessians=hessians,
            layer_range=(lo, hi), proj_filter=projs,
            error_threshold=0.99, **cfg["surgery"])
        errs = np.array(list(report.errors.values()))
        results[name] = dict(
            mean_rel_err=float(errs.mean()),
            median_rel_err=float(np.median(errs)),
            max_rel_err=float(errs.max()),
            avg_bits_per_param=report.avg_bits_per_param,
            compressed=len(report.compressed),
            skipped=len(report.skipped),
            seconds=round(time.time() - t0, 1))
        print(name, json.dumps(results[name]))

    print("\nsummary:")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
