"""Chip check + microbench for the round-5 int8 attention dots.

1. Correctness on the real chip: flash_decode_q8{,_staged} with
   dots="i8" (interpret=False) vs the f32 XLA twin at headline-like
   shapes — confirms Mosaic legalizes the batched i8 x i8 -> i32
   dot_general and bounds the int8-rounding error.
2. Isolated slope microbench of the staged kernel at B8/B32 ctx256,
   f32 vs bf16 vs i8 dots.

Run with the relay env intact (TPU).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.ops import attention as AT


def _random_cache(key, L, B, KVH, T, D):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    k = jax.random.randint(k1, (L, B, KVH, T, D), -127, 128, jnp.int8)
    v = jax.random.randint(k2, (L, B, KVH, T, D), -127, 128, jnp.int8)
    ks = jax.random.uniform(k3, (L, B, KVH, T), jnp.float32, 0.005, 0.02)
    vs = jax.random.uniform(k4, (L, B, KVH, T), jnp.float32, 0.005, 0.02)
    return k, v, ks, vs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()
    print(f"# device={jax.devices()[0]}", file=sys.stderr, flush=True)

    # --- correctness at a headline-like shape (7B MHA: KVH=32, G=1, D=128)
    L, B, KVH, G, D, T = 2, 8, 32, 1, 128, 256
    q = jax.random.normal(jax.random.PRNGKey(0), (B, KVH, G, D), jnp.float32)
    k, v, ks, vs = _random_cache(jax.random.PRNGKey(1), L, B, KVH, T, D)
    pos = jnp.asarray([17, 255, 100, 3, 250, 128, 64, 200], jnp.int32)
    ref = AT.flash_decode_q8_xla(q, k, v, ks, vs, jnp.asarray(1), pos)
    for dots in ("f32", "i8"):
        out = AT.flash_decode_q8(q, k, v, ks, vs, jnp.asarray(1), pos,
                                 block_t=128, dots=dots)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        print(f"inline dots={dots}: rel={rel:.5f}", flush=True)
        assert rel < (0.02 if dots == "i8" else 5e-3), (dots, rel)

    kf = jax.random.normal(jax.random.PRNGKey(2), (B, KVH, D)) * 0.1
    vf = jax.random.normal(jax.random.PRNGKey(3), (B, KVH, D)) * 0.1
    ref = AT.flash_decode_q8_staged_xla(q, k, v, ks, vs, kf, vf,
                                        jnp.asarray(1), pos)
    for dots in ("f32", "i8"):
        out = AT.flash_decode_q8_staged(q, k, v, ks, vs, kf, vf,
                                        jnp.asarray(1), pos,
                                        block_t=128, dots=dots)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        print(f"staged dots={dots}: rel={rel:.5f}", flush=True)
        assert rel < (0.02 if dots == "i8" else 5e-3), (dots, rel)

    if args.skip_bench:
        return

    # --- isolated slope microbench, staged kernel, 26-layer cache
    for Bb in (8, 32):
        L2, T2 = 26, 256
        k2, v2, ks2, vs2 = _random_cache(jax.random.PRNGKey(4), L2, Bb,
                                         KVH, T2, D)
        q2 = jax.random.normal(jax.random.PRNGKey(5), (Bb, KVH, G, D))
        kf2 = jax.random.normal(jax.random.PRNGKey(6), (Bb, KVH, D)) * 0.1
        vf2 = jax.random.normal(jax.random.PRNGKey(7), (Bb, KVH, D)) * 0.1
        pos2 = jnp.full((Bb,), 250, jnp.int32)

        for dots in ("f32", "bf16", "i8"):
            @jax.jit
            def many(q2, k2, v2, ks2, vs2, kf2, vf2, pos2, n):
                def body(i, carry):
                    acc, q = carry
                    o = AT.flash_decode_q8_staged(
                        q, k2, v2, ks2, vs2, kf2, vf2, i % L2, pos2,
                        block_t=256, dots=dots)
                    # dependency chain so the loop cannot collapse
                    return acc + jnp.sum(o) * 1e-30, q + o * 1e-30
                acc, q = jax.lax.fori_loop(
                    0, n, body, (jnp.float32(0.0), q2))
                return acc + jnp.sum(q)

            def run(n):
                t0 = time.perf_counter()
                _ = float(many(q2, k2, v2, ks2, vs2, kf2, vf2, pos2,
                               jnp.asarray(n, jnp.int32)))
                return time.perf_counter() - t0

            run(4)  # compile + warm
            reps = []
            for _ in range(3):
                # deltas must dwarf the ~35 ms relay RPC: 1536 extra calls
                t1, t2 = run(512), run(2048)
                reps.append((t2 - t1) / 1536)
            per = min(reps)
            kvgb = 2 * Bb * KVH * 251 * D / 1e9
            print(f"B{Bb} staged dots={dots}: {per*1e6:.1f} us/call "
                  f"({kvgb / per:.0f} GB/s KV)", flush=True)


if __name__ == "__main__":
    main()
