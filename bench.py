"""Benchmark harness: decode throughput of the compressed flagship model.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric (BASELINE.json north star): decode tokens/sec/chip for a
Llama-2-7B-shaped model at 4-bit packed Q + bf16 rank-128 L/R factors,
served through the fused dequant-matmul path with continuous batching
shapes (batch 8, short context). The reference publishes no throughput
numbers (SURVEY.md section 6), so ``vs_baseline`` is reported against the
HBM-bandwidth roofline for the same weight footprint: a decode step must
read every live weight byte once, so

    roofline tok/s = BW_bytes_per_s / bytes_of_weights_read_per_token

with v5e HBM BW ~= 819 GB/s. vs_baseline = achieved / roofline.

Smaller variants (--model tiny) run everywhere (CPU included) for smoke
testing; the driver runs the default on the real TPU chip.
"""

import argparse
import json
import sys
import time

import numpy as np


def build_compressed_llama_params(config, num_bits=4, rank=128, seed=0,
                                  dtype_scales=None):
    """Construct CALDERA-compressed params directly in packed form.

    For throughput benchmarking the *values* don't matter, only shapes and
    dtypes — building packed codes directly avoids materializing 14 GB of
    dense bf16 weights for a 7B model on a 16 GB chip.
    """
    import jax
    import jax.numpy as jnp
    from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
        CalderaLinear, DenseLinear)
    from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
        LayerParams, ModelParams)
    from ee274_convexcaldera_llm_quantization_tpu.ops.kernels import (
        resolve_group)

    h, im = config.hidden_size, config.intermediate_size

    def qlin(key, out_d, in_d):
        G = resolve_group(num_bits, in_d, None)
        f = 8 // num_bits
        k1, k2, k3, k4 = jax.random.split(key, 4)
        packed = jax.random.randint(k1, (out_d, in_d // f), 0, 256,
                                    jnp.int32).astype(jnp.uint8)
        scales = jnp.full((out_d, in_d // G), 1.0 / (in_d ** 0.5) / 7,
                          jnp.float32)
        r = min(rank, min(out_d, in_d))
        L = (jax.random.normal(k2, (out_d, r), jnp.float32)
             * 0.02).astype(jnp.bfloat16)
        R = (jax.random.normal(k3, (r, in_d), jnp.float32)
             * 0.02).astype(jnp.bfloat16)
        return CalderaLinear(
            packed=packed, scales=scales, L=L, R=R,
            global_scale=jnp.asarray(1.0, jnp.float32), b=None,
            num_bits=num_bits, group_size=G, out_features=out_d,
            in_features=in_d)

    # One jitted program builds the whole tree — eager construction would
    # pay hundreds of tiny per-op compiles (expensive over a compile relay).
    @jax.jit
    def build():
        key = jax.random.PRNGKey(seed)
        layers = []
        for i in range(config.num_layers):
            ks = jax.random.split(jax.random.fold_in(key, i), 7)
            layers.append(LayerParams(
                attn_norm=jnp.ones((h,), jnp.float32),
                q_proj=qlin(ks[0], config.q_dim, h),
                k_proj=qlin(ks[1], config.kv_dim, h),
                v_proj=qlin(ks[2], config.kv_dim, h),
                o_proj=qlin(ks[3], h, config.q_dim),
                mlp_norm=jnp.ones((h,), jnp.float32),
                gate_proj=qlin(ks[4], im, h),
                up_proj=qlin(ks[5], im, h),
                down_proj=qlin(ks[6], h, im),
            ))
        embed = (jax.random.normal(jax.random.fold_in(key, 999),
                                   (config.vocab_size, h), jnp.float32)
                 * 0.02).astype(jnp.bfloat16)
        lm_head = DenseLinear(w=(jax.random.normal(
            jax.random.fold_in(key, 998), (config.vocab_size, h),
            jnp.float32) * 0.02).astype(jnp.bfloat16))
        return ModelParams(embed=embed, layers=layers,
                           final_norm=jnp.ones((h,), jnp.float32),
                           lm_head=lm_head)

    return build()


def weight_bytes_per_token(config, num_bits, rank):
    """Bytes of layer weights read per decoded token (per batch step the
    whole weight set is read once; per token = per step / batch)."""
    h, im = config.hidden_size, config.intermediate_size
    per_layer = 0
    shapes = [(config.q_dim, h), (config.kv_dim, h), (config.kv_dim, h),
              (h, config.q_dim), (im, h), (im, h), (h, im)]
    for (m, n) in shapes:
        r = min(rank, min(m, n))
        per_layer += m * n * num_bits // 8          # packed codes
        per_layer += r * (m + n) * 2                # bf16 factors
    total = per_layer * config.num_layers
    total += config.vocab_size * h * 2 * 2          # embed + lm_head bf16
    return total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="llama2-7b",
                        choices=["llama2-7b", "llama2-13b", "tiny"])
    parser.add_argument("--bits", type=int, default=4)
    parser.add_argument("--rank", type=int, default=128)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--context", type=int, default=256)
    parser.add_argument("--steps", type=int, default=64)
    parser.add_argument("--warmup", type=int, default=8)
    parser.add_argument("--no-pallas", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from ee274_convexcaldera_llm_quantization_tpu.models import llama
    from ee274_convexcaldera_llm_quantization_tpu.models.config import PRESETS

    config = PRESETS[args.model]
    backend = jax.devices()[0].platform
    use_pallas = (backend == "tpu" or backend == "axon") and not args.no_pallas

    params = build_compressed_llama_params(config, args.bits, args.rank)
    cache = llama.KVCache.create(config, args.batch, args.context)
    tokens = jnp.zeros((args.batch,), jnp.int32)
    pos0 = args.context // 2                         # mid-context decode

    # warmup / compile
    t0 = time.time()
    logits, cache = llama.decode_step_batched(
        params, tokens, jnp.full((args.batch,), pos0, jnp.int32), cache,
        config, use_pallas=use_pallas)
    logits.block_until_ready()
    compile_s = time.time() - t0
    for i in range(args.warmup - 1):
        logits, cache = llama.decode_step_batched(
            params, tokens, jnp.full((args.batch,), pos0 + 1 + i, jnp.int32),
            cache, config, use_pallas=use_pallas)
    logits.block_until_ready()

    t0 = time.time()
    for i in range(args.steps):
        logits, cache = llama.decode_step_batched(
            params, tokens,
            jnp.full((args.batch,), pos0 + args.warmup + i, jnp.int32),
            cache, config, use_pallas=use_pallas)
    logits.block_until_ready()
    dt = time.time() - t0

    tok_per_s = args.steps * args.batch / dt

    # Roofline: HBM bandwidth bound on weight reads per decode step.
    hbm_bw = {"tpu": 819e9, "axon": 819e9}.get(backend, 50e9)  # v5e
    wb = weight_bytes_per_token(config, args.bits, args.rank)
    roofline_steps_per_s = hbm_bw / wb
    roofline_tok_per_s = roofline_steps_per_s * args.batch
    vs = tok_per_s / roofline_tok_per_s

    print(json.dumps({
        "metric": f"decode tokens/sec/chip {args.model} "
                  f"{args.bits}-bit+rank{args.rank} batch{args.batch}",
        "value": round(tok_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 4),
    }))
    print(f"# backend={backend} use_pallas={use_pallas} "
          f"compile={compile_s:.1f}s step={dt / args.steps * 1000:.2f}ms "
          f"roofline={roofline_tok_per_s:.0f} tok/s "
          f"weight_bytes/step={wb / 1e9:.2f}GB", file=sys.stderr)


if __name__ == "__main__":
    main()
