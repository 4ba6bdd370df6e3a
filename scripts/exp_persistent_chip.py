"""Manual-DMA persistent projection kernel vs the grid-pipelined kernel.

Round-5 (VERDICT r4 ask #5): the last unexecuted single-chip idea. The
block_n curve said kernel-boundary drain/refill, not per-program cost,
bounds the headline; this measures whether taking pipelining away from
Mosaic (one persistent program per M-tile, explicit double-buffered
``make_async_copy``) beats the grid kernel on the serving projection
shapes. Slope protocol with a dependency carry (relay defers execution).

Run with the relay env (TPU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as K

SHAPES = [  # (name, N, K) — llama2-7b serving projections
    ("qkv", 12288, 4096),
    ("gateup", 22016, 4096),
    ("down", 4096, 11008),
]
L, M = 2, 8


def main():
    print(f"# device={jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    for name, N, Kd in SHAPES:
        W = rng.standard_normal((L, N, Kd)).astype(np.float32) / 16
        packs = [K.pack_rowscale(jnp.asarray(W[l]), 4) for l in range(L)]
        packed = jnp.stack([p for p, s in packs])
        scales = jnp.stack([s for p, s in packs])
        x = jnp.asarray(rng.standard_normal((M, Kd)).astype(np.float32))

        # correctness on chip first
        ref = K.quantized_matmul_w4a8_stacked(x, packed, scales,
                                              jnp.asarray(1), 4)
        got = K.quantized_matmul_w4a8_stacked_persistent(
            x, packed, scales, jnp.asarray(1), 4)
        d = float(jnp.max(jnp.abs(got - ref)))
        print(f"{name}: chip maxdiff {d}", flush=True)
        assert d == 0.0, (name, d)

        gb = packed.nbytes / L / 1e9
        for label, fn in (("grid", K.quantized_matmul_w4a8_stacked),
                          ("persistent",
                           K.quantized_matmul_w4a8_stacked_persistent)):

            @jax.jit
            def many(x, packed, scales, n):
                def body(i, carry):
                    acc, xx = carry
                    o = fn(xx, packed, scales, i % L, 4)
                    s = jnp.sum(o) * 1e-30      # dependency carry
                    return acc + s, xx + s
                acc, xx = jax.lax.fori_loop(
                    0, n, body, (jnp.float32(0.0), x))
                return acc + jnp.sum(xx)

            def run(n):
                t0 = time.perf_counter()
                _ = float(many(x, packed, scales, jnp.asarray(n, jnp.int32)))
                return time.perf_counter() - t0

            run(4)
            import statistics
            slopes = []
            for _ in range(5):
                # deltas must dwarf the ~35 ms relay RPC jitter; min() of
                # noisy slopes biases low (measured an impossible 6 TB/s
                # at 768-call deltas) — use the MEDIAN of large deltas
                t1, t2 = run(2048), run(8192)
                slopes.append((t2 - t1) / 6144)
            per = statistics.median(slopes)
            print(f"{name} {label}: {per * 1e6:.1f} us/call "
                  f"({gb / per:.0f} GB/s weights)", flush=True)


if __name__ == "__main__":
    main()
