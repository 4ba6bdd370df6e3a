"""Compress full 7B-shape transformer layers ON the chip, end to end.

Round-5 stretch (VERDICT r4 ask #1c): BASELINE config 3's shape —
4096 hidden / 11008 ffn, rank-128, 2-bit e8p + LDLQ — through the real
`models.surgery.compress_model` path (the same code `ccq compress`
runs), on synthetic weights + synthetic calibration Hessians, executing
on the TPU. Reports per-projection and per-layer wall time and the
activation-aware error per projection, plus the extrapolated full-model
(32-layer) compression time.

Usage:
  python scripts/exp_7b_compress_chip.py [--layers 1] [--rank 128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_include_full_tracebacks_in_locations", False)
jax.config.update("jax_traceback_in_locations_limit", 0)
import jax.numpy as jnp
import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.models import llama, surgery
from ee274_convexcaldera_llm_quantization_tpu.models.config import PRESETS
from ee274_convexcaldera_llm_quantization_tpu.quant.quantizers import (
    QuantizerFactory)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--lplr-iters", type=int, default=2)
    args = ap.parse_args()

    config = PRESETS["llama2-7b"]
    print(f"# device={jax.devices()[0]} hidden={config.hidden_size} "
          f"ffn={config.intermediate_size}", file=sys.stderr, flush=True)

    # synthetic model restricted to the requested layers (full 7B widths)
    import dataclasses
    cfg = dataclasses.replace(config, num_layers=args.layers)
    t0 = time.time()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params.embed)
    print(f"# init {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    # synthetic low-rank + diagonal calibration Hessians per projection
    rng = np.random.default_rng(1)
    hessians = {}
    for i in range(cfg.num_layers):
        for proj, n in (("q_proj", 4096), ("k_proj", 4096),
                        ("v_proj", 4096), ("o_proj", 4096),
                        ("gate_proj", 4096), ("up_proj", 4096),
                        ("down_proj", 11008)):
            G = rng.standard_normal((n, 128)).astype(np.float32) / 16.0
            hessians[f"layers.{i}.{proj}"] = (
                G @ G.T + np.diag(1.0 + rng.random(n).astype(np.float32)))

    cp = CalderaParams(
        Q_bits=2, L_bits=16, R_bits=16, rank=args.rank, iters=args.iters,
        lplr_iters=args.lplr_iters, q_update="ldlq",
        quant_factory_Q=QuantizerFactory(method="e8p",
                                         block_size="global"))

    times = {}

    def progress(name, err):
        now = time.time()
        dt = now - progress.last
        progress.last = now
        times[name] = round(dt, 1)
        print(f"# {name}: err={err:.4f} ({dt:.0f}s)", file=sys.stderr,
              flush=True)

    progress.last = time.time()
    t0 = time.time()
    qparams, report = surgery.compress_model(
        params, cp, hessians=hessians, serving_mode="w4a8",
        serving_quant="e8p", error_threshold=1.01)
    jax.block_until_ready(qparams.layers[0].q_proj.packed)
    total = time.time() - t0

    per_layer = total / args.layers
    print(json.dumps({
        "layers": args.layers, "rank": args.rank,
        "compressed": len(report.compressed),
        "avg_bits_per_param": round(report.avg_bits_per_param(), 3),
        "errors": {k: round(v, 4) for k, v in report.errors.items()},
        "per_projection_s": times,
        "total_s": round(total, 1),
        "per_layer_s": round(per_layer, 1),
        "full_32L_extrapolated_min": round(32 * per_layer / 60, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
