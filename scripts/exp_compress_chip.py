"""Round-5 experiment: the compression pipeline ON the TPU at 7B shapes.

VERDICT r4 ask #1: every flagship LDLQ-e8p encode so far ran on CPU —
measure per-projection encode time at true 7B shapes (4096x4096 and
4096x11008) on the chip, with the CPU-vs-TPU speedup recorded.

Times the three stages of a flagship projection compression plus the
full CALDERA solve (reference regime: rank-128, e8p + LDLQ —
reference ``main.py:168-196``):

  precompute : ldlq_precompute(H)       (cholesky pair at n)
  blocks     : e8p_quantize_blocks(W)   (scale-search lattice encode)
  ldlq       : ldlq_quantize_e8p(W, U)  (sequential error-feedback sweep)
  solve      : caldera_solve(rank-128, iters=2, lplr=2, e8p+LDLQ)

Timing: the axon relay defers execution past block_until_ready, so each
stage is timed around a host readback of a scalar that data-depends on
the result (float(sum)). Stages are seconds-scale, so the ~35 ms RPC is
noise; each stage runs twice and the second (warm) time is reported.

Usage:
  python scripts/exp_compress_chip.py --shapes 4096x4096,4096x11008 \
      --stages precompute,blocks,ldlq [--solve-iters 2] [--rank 128]

Run WITH the relay env for TPU; with JAX_PLATFORMS=cpu + env -u
PALLAS_AXON_* for the CPU baseline.
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

from ee274_convexcaldera_llm_quantization_tpu.decomp import caldera as C
from ee274_convexcaldera_llm_quantization_tpu.ops import lattice


def synth_WH(m, n, seed):
    """Weight + calibration-Hessian pair with LLaMA-like statistics."""
    rng = np.random.default_rng(seed)
    W = (rng.standard_normal((m, n)) / np.sqrt(n)).astype(np.float32)
    # low-rank + diagonal Hessian, well-conditioned like real Grams
    G = rng.standard_normal((n, 256)).astype(np.float32) / 16.0
    H = G @ G.T + np.diag(1.0 + rng.random(n).astype(np.float32))
    return jnp.asarray(W), jnp.asarray(H)


def timed(fn, *args, label="", reps=2):
    out = None
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves
                if hasattr(l, "astype"))
        _ = float(s)  # true barrier on the relay
        times.append(time.perf_counter() - t0)
        print(f"#   {label} rep{r}: {times[-1]:.2f}s", file=sys.stderr,
              flush=True)
    return out, times[-1], times[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="4096x4096,4096x11008")
    ap.add_argument("--stages", default="precompute,blocks,ldlq")
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--solve-iters", type=int, default=2)
    ap.add_argument("--lplr-iters", type=int, default=2)
    ap.add_argument("--rand-svd", action="store_true",
                    help="randomized (Halko) SVD in LR_init — required at "
                         "4096x11008 on chip: the exact QDWH-SVD's n^2 "
                         "temporaries hard-crash the 16 GB worker "
                         "(measured round 5), while the oversampled "
                         "rank-2r sketch is tall-skinny")
    args = ap.parse_args()

    plat = jax.devices()[0].platform
    print(f"# platform={plat} device={jax.devices()[0]}", file=sys.stderr,
          flush=True)
    stages = args.stages.split(",")
    rows = []

    ldlq_j = jax.jit(C.ldlq_quantize_e8p)
    pre_j = jax.jit(C.ldlq_precompute)

    for shape in args.shapes.split(","):
        m, n = (int(x) for x in shape.split("x"))
        W, H = synth_WH(m, n, seed=m + n)
        row = {"shape": f"{m}x{n}", "platform": plat}

        if "precompute" in stages:
            U, warm, cold = timed(pre_j, H, label=f"{shape} precompute")
            row["precompute_s"] = round(warm, 3)
            row["precompute_cold_s"] = round(cold, 3)
        elif "ldlq" in stages:
            # only the ldlq stage consumes U; keeping it resident during
            # a solve-only run wastes ~0.5 GB of HBM at n=11008
            U = pre_j(H)

        if "blocks" in stages:
            _, warm, cold = timed(lattice.e8p_quantize_blocks, W,
                                  label=f"{shape} blocks")
            row["blocks_s"] = round(warm, 3)
            row["blocks_cold_s"] = round(cold, 3)

        if "ldlq" in stages:
            _, warm, cold = timed(ldlq_j, W, U, label=f"{shape} ldlq")
            row["ldlq_s"] = round(warm, 3)
            row["ldlq_cold_s"] = round(cold, 3)

        if "solve" in stages:
            params = C.CalderaParams(
                Q_bits=2, L_bits=16, R_bits=16, rank=args.rank,
                iters=args.solve_iters, lplr_iters=args.lplr_iters,
                q_update="ldlq", rand_svd=args.rand_svd,
                quant_factory_Q=type(C.CalderaParams().quant_factory_Q)(
                    method="e8p", block_size="global"))
            key = jax.random.PRNGKey(0)
            gs = jnp.asarray(1.0, jnp.float32)

            def solve():
                return C.caldera_solve(params, W, H, gs, key,
                                       identity_hessian=False)

            (Q, L, R, errs), warm, cold = timed(
                solve, label=f"{shape} solve(r{args.rank})")
            row["solve_s"] = round(warm, 3)
            row["solve_cold_s"] = round(cold, 3)
            row["solve_final_err"] = round(float(np.asarray(errs)[-1, -1]), 4)

        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"rows": rows}), flush=True)


if __name__ == "__main__":
    main()
