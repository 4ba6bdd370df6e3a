"""A/B the factor paths of the fused decode step in ONE process.

Compares ``factor_kernel`` in {"xla", "l"} (optionally "lr") on the
flagship llama2-7b decode config with the slope protocol. One process so
the second variant reuses the warm Mosaic kernel/XLA state — a fresh
process pays the multi-minute relay cold compile per variant.

Usage: python scripts/bench_factor_ab.py [--model llama2-7b] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--context", type=int, default=256)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--variants", default="xla,l")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_compressed_llama_params, weight_bytes_per_token
    from ee274_convexcaldera_llm_quantization_tpu.models import (
        fused as fusedm, llama)
    from ee274_convexcaldera_llm_quantization_tpu.models.config import PRESETS

    config = PRESETS[args.model]
    B = args.batch
    backend = jax.devices()[0].platform
    use_pallas = backend in ("tpu", "axon")

    t0 = time.time()
    base = build_compressed_llama_params(config, args.bits, args.rank,
                                         mode="w4a8")
    base = fusedm.fuse_stacked(base)
    jax.block_until_ready(base.embed)
    print(f"# params built in {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    tokens = jnp.zeros((B,), jnp.int32)
    pos0 = args.context // 2

    results = {}
    for fk in args.variants.split(","):
        params = fusedm.quantize_factors_int8_fused(base,
                                                    fuse_factor_kernel=fk)
        cache = llama.HeadMajorQuantKVCache.create(config, B, args.context)

        @jax.jit
        def multi_step(params, n, cache):
            def body(i, carry):
                cache, tok, acc = carry
                pos = jnp.full((B,), pos0 + i, jnp.int32)
                logits, cache = fusedm.decode_step_fused(
                    params, tok, pos, cache, config,
                    interpret=not use_pallas)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return cache, tok, acc + jnp.sum(logits) * jnp.float32(1e-9)
            out = jax.lax.fori_loop(0, n, body,
                                    (cache, tokens, jnp.float32(0)))
            return out[2]

        t0 = time.time()
        float(multi_step(params, 1, cache))
        print(f"# {fk}: compiled in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)

        def timed(n, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                float(multi_step(params, n, cache))
                best = min(best, time.time() - t0)
            return best

        n1 = max(args.warmup, 2)
        n2 = n1 + args.steps
        t1, t2 = timed(n1), timed(n2)
        dt = (t2 - t1) / args.steps
        results[fk] = dt * 1000
        print(f"# {fk}: {dt * 1000:.2f} ms/step "
              f"({args.batch / dt:.0f} tok/s)", file=sys.stderr, flush=True)

    hbm_bw = 819e9
    wb = weight_bytes_per_token(config, args.bits, args.rank,
                                factor_bytes=1, head_bytes=1)
    roof = hbm_bw / wb * B
    print(json.dumps({
        "step_ms": results,
        "tok_s": {k: round(B / (v / 1000), 1) for k, v in results.items()},
        "roofline_tok_s": round(roof, 1),
    }))


if __name__ == "__main__":
    main()
