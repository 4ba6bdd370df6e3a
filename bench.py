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
                                  mode="w4a8"):
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

    from ee274_convexcaldera_llm_quantization_tpu.models.stacked import (
        StackedModelParams)

    h, im = config.hidden_size, config.intermediate_size
    L = config.num_layers

    def qlin(key, out_d, in_d):
        """One CalderaLinear with all layers stacked on a leading axis."""
        G = in_d if mode == "w4a8" else resolve_group(num_bits, in_d, None)
        f = 8 // num_bits
        k1, k2, k3 = jax.random.split(key, 3)
        packed = jax.random.bits(k1, (L, out_d, in_d // f), jnp.uint8)
        scales = jnp.full((L, out_d, in_d // G), 1.0 / (in_d ** 0.5) / 7,
                          jnp.float32)
        r = min(rank, min(out_d, in_d))
        Lf = (jax.random.normal(k2, (L, out_d, r), jnp.float32)
              * 0.02).astype(jnp.bfloat16)
        Rf = (jax.random.normal(k3, (L, r, in_d), jnp.float32)
              * 0.02).astype(jnp.bfloat16)
        return CalderaLinear(
            packed=packed, scales=scales, L=Lf, R=Rf,
            global_scale=jnp.ones((L,), jnp.float32), b=None,
            num_bits=num_bits, group_size=G, out_features=out_d,
            in_features=in_d, mode=mode)

    # One jitted program builds the whole stacked tree in ~20 device ops —
    # eager per-layer construction would pay hundreds of tiny dispatches
    # (expensive over a compile relay).
    @jax.jit
    def build():
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 9)
        layers = LayerParams(
            attn_norm=jnp.ones((L, h), jnp.float32),
            q_proj=qlin(ks[0], config.q_dim, h),
            k_proj=qlin(ks[1], config.kv_dim, h),
            v_proj=qlin(ks[2], config.kv_dim, h),
            o_proj=qlin(ks[3], h, config.q_dim),
            mlp_norm=jnp.ones((L, h), jnp.float32),
            gate_proj=qlin(ks[4], im, h),
            up_proj=qlin(ks[5], im, h),
            down_proj=qlin(ks[6], h, im),
        )
        embed = (jax.random.normal(ks[7], (config.vocab_size, h),
                                   jnp.float32) * 0.02).astype(jnp.bfloat16)
        lm_head = DenseLinear(w=(jax.random.normal(
            ks[8], (config.vocab_size, h),
            jnp.float32) * 0.02).astype(jnp.bfloat16))
        return StackedModelParams(embed=embed, layers=layers,
                                  final_norm=jnp.ones((h,), jnp.float32),
                                  lm_head=lm_head)

    return build()


def weight_bytes_per_token(config, num_bits, rank, factor_bytes=2,
                           head_bytes=2):
    """Bytes of layer weights read per decoded token (per batch step the
    whole weight set is read once; per token = per step / batch)."""
    h, im = config.hidden_size, config.intermediate_size
    per_layer = 0
    shapes = [(config.q_dim, h), (config.kv_dim, h), (config.kv_dim, h),
              (h, config.q_dim), (im, h), (im, h), (h, im)]
    for (m, n) in shapes:
        r = min(rank, min(m, n))
        per_layer += m * n * num_bits // 8          # packed codes
        per_layer += r * (m + n) * factor_bytes     # L/R factors
    total = per_layer * config.num_layers
    # embed gather is per-token (negligible); lm_head read per step
    total += config.vocab_size * h * 2              # embed bf16
    total += config.vocab_size * h * head_bytes     # lm_head
    return total


def _bench_prefill(args, params, config, backend, use_pallas):
    """Prefill (time-to-first-token) throughput: prompt tokens/sec through
    ``prefill_into_slot_fused`` at ``--prompt-len``, slope-timed like the
    decode bench. ``--flash-attn`` selects the flash prefill kernel
    (online softmax in VMEM) vs the XLA path (materialized S^2 logits)."""
    import jax
    import jax.numpy as jnp
    from ee274_convexcaldera_llm_quantization_tpu.models import (
        fused as fusedm, llama)

    if not args.fused:
        raise SystemExit("--phase prefill requires --fused (w4a8 path)")
    S = args.prompt_len
    if args.flash_attn:
        cache = llama.HeadMajorQuantKVCache.create(config, 1, S)
    elif args.kv_int8:
        cache = llama.QuantKVCache.create(config, 1, S)
    else:
        cache = llama.KVCache.create(config, 1, S)
    tokens = jnp.zeros((1, S), jnp.int32)

    @jax.jit
    def multi_prefill(params, n, cache):
        # each iteration's tokens depend on the previous logits, so XLA
        # cannot hoist the (otherwise loop-invariant) prefill out of the
        # loop — without this the slope protocol measures an empty loop
        def body(i, carry):
            cache, acc = carry
            tok = jnp.remainder(
                tokens + jnp.asarray(acc * 1e9, jnp.int32),
                config.vocab_size)
            logits, cache = fusedm.prefill_into_slot_fused(
                params, tok, jnp.asarray(0), cache, config,
                interpret=not use_pallas, flash=args.flash_attn)
            return cache, acc + jnp.sum(logits) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, n, body, (cache, jnp.float32(0)))[1]

    t0 = time.time()
    float(multi_prefill(params, 1, cache))
    compile_s = time.time() - t0
    print(f"# multi_prefill compiled in {compile_s:.1f}s", file=sys.stderr,
          flush=True)

    def timed(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(multi_prefill(params, n, cache))
            best = min(best, time.time() - t0)
        return best

    n1 = max(args.warmup // 4, 1)
    n2 = n1 + max(args.steps // 8, 4)
    t1, t2 = timed(n1), timed(n2)
    dt = max((t2 - t1) / (n2 - n1), 1e-9)
    tok_per_s = S / dt

    # Compute-bound roofline: total matmul FLOPs per prefill vs bf16 MXU
    # peak (the int8 projections could go 2x faster, so this is generous
    # to us on projections and fair on f32 attention).
    h, im = config.hidden_size, config.intermediate_size
    proj = (config.q_dim * h + 2 * config.kv_dim * h + h * config.q_dim
            + 2 * im * h + h * im)
    r = min(args.rank, h)
    fac = r * (config.q_dim + 2 * config.kv_dim + 2 * h + 2 * im + h + im
               + 4 * h + 2 * config.q_dim)
    attn = 2 * config.num_heads * config.head_dim * S / 2  # causal half
    flops = 2 * S * (proj + fac + attn) * config.num_layers
    peak = {"tpu": 197e12, "axon": 197e12}.get(backend, 1e12)
    vs = (flops / dt) / peak

    variant = "-flash" if args.flash_attn else "-xla-attn"
    print(json.dumps({
        "metric": f"prefill tokens/sec/chip {args.model} "
                  f"{args.bits}-bit+rank{args.rank} {args.mode}"
                  f"{variant} S{S}",
        "value": round(tok_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 4),
    }))
    print(f"# backend={backend} compile={compile_s:.1f}s "
          f"prefill={dt * 1000:.1f}ms (slope n={n1}->{n2}) "
          f"matmul_flops/prefill={flops / 1e12:.2f}T "
          f"fraction_of_bf16_peak={vs:.3f}", file=sys.stderr)


def _bench_spec(args, params, config, backend, use_pallas):
    """Speculative decoding throughput: committed tokens/sec through
    ``spec_decode_round`` with a ``--draft-layers`` early-exit draft at
    window ``--gamma``. Reports measured acceptance (on the random bench
    weights this mostly exercises the mechanics; a distilled draft on a
    real checkpoint raises acceptance, not the per-round cost measured
    here). ``vs_baseline`` compares committed tokens/sec against the
    single-token-decode HBM roofline — values above 1.0 mean speculative
    decoding beats the best possible non-speculative decode step."""
    import jax
    import jax.numpy as jnp
    from ee274_convexcaldera_llm_quantization_tpu.models import llama
    from ee274_convexcaldera_llm_quantization_tpu.serve import speculative

    if not args.fused:
        raise SystemExit("--phase spec requires --fused (w4a8 path)")
    B, gamma = args.batch, args.gamma
    draft, dconfig = speculative.truncate_draft(params, config,
                                                args.draft_layers)
    T = args.context
    if args.flash_attn:
        cache = llama.HeadMajorQuantKVCache.create(config, B, T)
    elif args.kv_int8:
        cache = llama.QuantKVCache.create(config, B, T)
    else:
        cache = llama.KVCache.create(config, B, T)
    dcache = llama.KVCache.create(dconfig, B, T)
    tokens = jnp.zeros((B,), jnp.int32)
    pos0 = 8
    temps = jnp.zeros((B,), jnp.float32)          # greedy: deterministic
    tks = jnp.zeros((B,), jnp.int32)
    tps = jnp.ones((B,), jnp.float32)
    max_rounds = (T - pos0 - gamma - 2) // (gamma + 1)

    @jax.jit
    def multi_round(params, draft, n, cache, dcache):
        def body(i, carry):
            tok, pos, cache, dcache, committed = carry
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            out, n_new, nxt, new_pos, cache, dcache = \
                speculative.spec_decode_round(
                    params, draft, tok, pos, cache, dcache, key,
                    temps, tks, tps, config, dconfig, gamma=gamma,
                    interpret=not use_pallas)
            return (nxt, new_pos, cache, dcache,
                    committed + jnp.sum(n_new))
        pos = jnp.full((B,), pos0, jnp.int32)
        out = jax.lax.fori_loop(
            0, n, body, (tokens, pos, cache, dcache, jnp.int32(0)))
        return out[4]

    t0 = time.time()
    int(multi_round(params, draft, 1, cache, dcache))
    compile_s = time.time() - t0
    print(f"# multi_round compiled in {compile_s:.1f}s", file=sys.stderr,
          flush=True)

    def timed(n, reps=3):
        best, com = float("inf"), 0
        for _ in range(reps):
            t0 = time.time()
            com = int(multi_round(params, draft, n, cache, dcache))
            best = min(best, time.time() - t0)
        return best, com

    n1 = max(args.warmup // 2, 2)
    n2 = min(n1 + max(args.steps // 4, 8), max_rounds)
    (t1, c1), (t2, c2) = timed(n1), timed(n2)
    dt = max(t2 - t1, 1e-9)
    tok_per_s = (c2 - c1) / dt
    acc_per_round = (c2 - c1) / ((n2 - n1) * B) - 1

    hbm_bw = {"tpu": 819e9, "axon": 819e9}.get(backend, 50e9)
    fb = 1 if args.int8_factors else 2
    wb = weight_bytes_per_token(config, args.bits, args.rank,
                                factor_bytes=fb, head_bytes=fb)
    roofline_tok_per_s = hbm_bw / wb * B
    print(json.dumps({
        "metric": f"spec decode committed tokens/sec/chip {args.model} "
                  f"{args.bits}-bit+rank{args.rank} gamma{gamma} "
                  f"draft{args.draft_layers}L batch{B}",
        "value": round(tok_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_per_s / roofline_tok_per_s, 4),
    }))
    print(f"# backend={backend} compile={compile_s:.1f}s "
          f"round={(dt / (n2 - n1)) * 1000:.2f}ms "
          f"accepted/round={acc_per_round:.2f}/{gamma} "
          f"(slope n={n1}->{n2})", file=sys.stderr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="llama2-7b",
                        choices=["llama2-7b", "llama2-13b", "llama3-8b",
                                 "qwen2-0.5b", "tiny", "tiny-mha"])
    parser.add_argument("--bits", type=int, default=4)
    parser.add_argument("--rank", type=int, default=128)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--context", type=int, default=256)
    parser.add_argument("--steps", type=int, default=64)
    parser.add_argument("--warmup", type=int, default=8)
    parser.add_argument("--no-pallas", action="store_true")
    parser.add_argument("--mode", default="w4a8",
                        choices=["w4a8", "grouped"],
                        help="serving kernel: int8-MXU (fast) or grouped "
                             "bf16 (max fidelity)")
    # The fast serving optimizations default ON (the headline config);
    # --no-* flags isolate their individual contributions.
    parser.add_argument("--fused", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="fuse qkv and gate/up into single kernel calls "
                             "(w4a8 fast path only)")
    parser.add_argument("--kv-int8", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="int8 KV cache (half cache bandwidth)")
    parser.add_argument("--int8-factors",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="int8 low-rank factors + int8 lm_head "
                             "(halves factor/head HBM reads)")
    parser.add_argument("--factor-kernel", default="xla",
                        choices=["xla", "l", "lr"],
                        help="low-rank factor path on the fused decode "
                             "step: XLA slab dots (default — the async "
                             "slab copies overlap the Pallas kernels, "
                             "measured fastest e2e), L-half fused "
                             "in-kernel, or fully in-kernel")
    parser.add_argument("--mlp-kernel",
                        action=argparse.BooleanOptionalAction, default=False,
                        help="whole-MLP megakernel: gate/up + silu-mul + "
                             "requant + down in ONE Pallas launch per layer "
                             "(needs --int8-factors and factor-kernel l/lr)")
    parser.add_argument("--attn-dots", default="i8",
                        choices=["f32", "bf16", "i8"],
                        help="flash decode-attention dot dtype. Default "
                             "i8 (round 5): int8 q / int8 softmax probs, "
                             "i32 MXU accumulate — no KV-slab cast, "
                             "measured +3.1%% at B8 / +1.4%% at B32 over "
                             "f32, ~1%% rel attention-output deviation "
                             "(same class as the int8 KV cache itself). "
                             "f32 is the exactness twin; bf16 the "
                             "round-2 ablation.")
    parser.add_argument("--decode-path", default="fused",
                        choices=["fused", "mega", "paged"],
                        help="decode step: 'fused' (one Pallas kernel per "
                             "projection group), 'mega' (the persistent "
                             "whole-layer megakernel: the ENTIRE layer "
                             "stack in ONE pallas_call; requires MHA + "
                             "int8 'l'-layout factors), or 'paged' "
                             "(paged_decode_step_fused over a "
                             "--page-size int8 KV pool — the vLLM-style "
                             "serving mode, slope-timed like the "
                             "headline)")
    parser.add_argument("--page-size", type=int, default=256,
                        help="tokens per KV page for --decode-path paged")
    parser.add_argument("--proj-kernel", default="grid",
                        choices=["grid", "persistent"],
                        help="o/down projection kernel: 'persistent' is "
                             "the round-5 manual-DMA variant (one program "
                             "per M-tile, explicit double-buffered "
                             "async copies; +5.4%% isolated on down_proj)")
    parser.add_argument("--attn-kernel", default="auto",
                        choices=["auto", "row", "ab"],
                        help="flash decode-attention grid: 'row' (one "
                             "batch row per program) or 'ab' (all-batch "
                             "row slabs, 128-wide token blocks). 'auto' "
                             "picks the measured-best per context: row "
                             "below 1024 (8.81 vs 8.94 ms at ctx 256), "
                             "ab at long context (11.77 vs 12.38 ms at "
                             "ctx 2048)")
    parser.add_argument("--head-pallas",
                        action=argparse.BooleanOptionalAction, default=False,
                        help="serve the int8 lm_head with the Pallas "
                             "int8 MXU kernel instead of the XLA int8 dot")
    parser.add_argument("--attn-o-kernel",
                        action=argparse.BooleanOptionalAction, default=False,
                        help="fused flash-attention + o_proj megakernel "
                             "(MHA models, --flash-attn path only)")
    parser.add_argument("--staged-kv", default="uniform",
                        choices=["off", "on", "uniform"],
                        help="stage each layer's new K/V and commit to the "
                             "big cache once per step (head-major cache "
                             "only): 160 update-slice thunks instead of "
                             "1024 at B=8/L=32. 'uniform' additionally "
                             "collapses the commit to 4 full-batch column "
                             "writes (valid for lockstep batch decode, "
                             "which is what this bench measures)")
    parser.add_argument("--flash-attn",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="flash decode-attention Pallas kernel over a "
                             "head-major int8 KV cache (fused path only; "
                             "implies --kv-int8); in --phase prefill this "
                             "selects the flash prefill kernel")
    parser.add_argument("--phase", default="decode",
                        choices=["decode", "prefill", "spec"],
                        help="decode: steady-state decode throughput "
                             "(headline). prefill: prompt tokens/sec of "
                             "prefill_into_slot_fused at --prompt-len. "
                             "spec: committed tokens/sec of speculative "
                             "decoding with an early-exit draft")
    parser.add_argument("--prompt-len", type=int, default=2048)
    parser.add_argument("--gamma", type=int, default=4,
                        help="speculative window (draft tokens per round)")
    parser.add_argument("--draft-layers", type=int, default=4,
                        help="early-exit draft depth for --phase spec")
    args = parser.parse_args()

    import jax
    # Persistent compile cache: the 7B decode graph takes minutes to compile
    # through the remote-compile relay; cached runs start in seconds.
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # min_compile_time 0: the remote-compile relay can return from
        # backend.compile() quickly and pay the real compile at first
        # execution, so a >5s threshold on JAX's *measured* compile time
        # silently skips the cache write for exactly the programs that
        # most need caching (round-3 driver bench: 387s wall, no entry
        # written)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # Drop source locations from lowered modules: Pallas Mosaic
        # payloads embed MLIR loc info that survives the cache-key
        # debug-info stripping, so ANY edit that shifts line numbers on
        # the trace path (bench.py itself, models/fused.py, ...) used to
        # change the key and cold-miss the driver run (measured round 4:
        # 5 blank lines inserted above the bench loop changed the key;
        # with these two settings the key is line-shift invariant).
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
        jax.config.update("jax_traceback_in_locations_limit", 0)
    except Exception:
        pass
    import warnings as _warnings
    _warnings.simplefilter("always")
    import jax.numpy as jnp
    from ee274_convexcaldera_llm_quantization_tpu.models import (
        fused as fusedm, llama, stacked)
    from ee274_convexcaldera_llm_quantization_tpu.models.config import PRESETS

    config = PRESETS[args.model]
    backend = jax.devices()[0].platform
    use_pallas = (backend == "tpu" or backend == "axon") and not args.no_pallas

    t0 = time.time()
    params = build_compressed_llama_params(config, args.bits, args.rank,
                                           mode=args.mode)
    if args.mode != "w4a8":
        # the fast-path optimizations apply to the w4a8 serving path only
        args.fused = args.kv_int8 = args.int8_factors = False
        args.flash_attn = False
    if args.fused:
        params = fusedm.fuse_stacked(params)
        if args.int8_factors:
            params = fusedm.quantize_factors_int8_fused(
                params, fuse_factor_kernel=args.factor_kernel)
    elif args.int8_factors:
        params = stacked.quantize_model_factors_int8(params)
    jax.block_until_ready(params.embed)
    print(f"# params built in {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    if args.flash_attn and not (args.fused and use_pallas):
        # kernel path needs fused params + TPU — except the mega path,
        # whose interpret mode drives the same head-major cache on CPU
        if not (args.decode_path == "mega" and args.fused):
            args.flash_attn = False
    if args.attn_kernel == "auto":
        args.attn_kernel = "ab" if args.context >= 1024 else "row"
    if not args.flash_attn:
        # the ab kernel needs the head-major cache; decode_step_fused
        # raises (rather than silently falling back) if asked otherwise
        args.attn_kernel = "row"

    if args.phase == "prefill":
        _bench_prefill(args, params, config, backend, use_pallas)
        return
    if args.phase == "spec":
        _bench_spec(args, params, config, backend, use_pallas)
        return
    if args.flash_attn:
        cache = llama.HeadMajorQuantKVCache.create(config, args.batch,
                                                   args.context)
    elif args.kv_int8:
        cache = llama.QuantKVCache.create(config, args.batch, args.context)
    else:
        cache = llama.KVCache.create(config, args.batch, args.context)
    tokens = jnp.zeros((args.batch,), jnp.int32)
    pos0 = args.context // 2                         # mid-context decode
    B = args.batch

    # Timing protocol: the whole autoregressive loop runs inside ONE jitted
    # computation with a dynamic trip count, the output is a scalar that
    # depends on every step's logits, and timing spans a host readback of
    # that scalar. This defeats both async-dispatch illusions and
    # deferred-execution runtimes (block_until_ready alone is not a reliable
    # barrier on relayed backends). Per-step time is the SLOPE between two
    # trip counts, which cancels fixed dispatch/readback overhead.
    fast_path = args.mode == "w4a8" and use_pallas

    page_tables = None
    if args.decode_path == "paged":
        from ee274_convexcaldera_llm_quantization_tpu.serve import paged
        if not (args.fused and args.flash_attn and use_pallas):
            raise SystemExit("--decode-path paged requires --fused "
                             "--flash-attn on a TPU backend")
        psz = min(args.page_size, args.context)
        while args.context % psz:
            psz //= 2
        max_pages = args.context // psz
        # sequential page assignment; fragmented tables measured separately
        # in scripts/exp_paged_chip.py (the DMA engine fetches pages by
        # table lookup either way)
        page_tables = (jnp.arange(B * max_pages, dtype=jnp.int32)
                       .reshape(B, max_pages))
        cache = paged.PagedQuantKVPool.create(config, B * max_pages, psz)
        print(f"# paged pool: {B * max_pages} pages x {psz} tokens",
              file=sys.stderr, flush=True)

    mega_prep = None
    if args.decode_path == "mega":
        from ee274_convexcaldera_llm_quantization_tpu.models import (
            persistent)
        if not (args.fused and args.int8_factors and args.flash_attn
                and args.factor_kernel in ("l", "lr")):
            raise SystemExit("--decode-path mega requires --fused "
                             "--int8-factors --flash-attn "
                             "--factor-kernel l")
        # interleave the gate/up rows ONCE (the packed array is GB-scale;
        # letting the jitted step do it would re-gather it every step)
        mega_prep = persistent.prepare_gateup_interleaved(
            params.layers.gateup, config.intermediate_size)
        jax.block_until_ready(mega_prep.packed)

    @jax.jit
    def multi_step(params, n, cache):
        def body(i, carry):
            cache, tok, acc = carry
            pos = jnp.full((B,), pos0 + i, jnp.int32)
            if args.decode_path == "paged":
                from ee274_convexcaldera_llm_quantization_tpu.serve import (
                    paged)
                logits, cache = paged.paged_decode_step_fused(
                    params, tok, pos, cache, page_tables, config,
                    interpret=not use_pallas, attn_dots=args.attn_dots)
            elif args.decode_path == "mega":
                logits, cache = persistent.decode_step_persistent(
                    params, tok, pos, cache, config,
                    interpret=not use_pallas, prep=mega_prep)
            elif args.fused:
                staged = {"off": False, "on": True,
                          "uniform": "uniform"}[args.staged_kv]
                logits, cache = fusedm.decode_step_fused(
                    params, tok, pos, cache, config,
                    interpret=not use_pallas,
                    staged_kv=staged if args.flash_attn else False,
                    mlp_kernel=args.mlp_kernel,
                    attn_o_kernel=args.attn_o_kernel and args.flash_attn,
                    attn_dots=args.attn_dots,
                    head_pallas=args.head_pallas,
                    attn_kernel=args.attn_kernel,
                    proj_kernel=args.proj_kernel)
            elif fast_path:
                logits, cache = stacked.decode_step_w4a8(
                    params, tok, pos, cache, config)
            else:
                logits, cache = stacked.decode_step_batched(
                    params, tok, pos, cache, config, use_pallas=use_pallas)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return cache, tok, acc + jnp.sum(logits) * jnp.float32(1e-9)
        out = jax.lax.fori_loop(0, n, body, (cache, tokens, jnp.float32(0)))
        return out[2]

    # Persistent-cache instrumentation (rounds 2-3 driver benches paid
    # cold compiles while local runs were warm, with no cache entry
    # written — ROOT CAUSE, measured round 4: the remote-compile relay
    # defers the real compile to first execution, so JAX's *measured*
    # backend.compile() time is seconds even for a 6-minute compile; the
    # old min_compile_time=5.0 threshold therefore skipped the cache
    # write exactly when the relay's server-side cache made the compile
    # look fast, and the driver — hitting a cold server — re-paid the
    # full compile with nothing persisted. Fixed by min_compile_time=0
    # above; the explain_cache_misses warnings (captured here) print the
    # real cache key on miss/write so the driver log is self-explaining.
    import logging as _logging
    import re as _re

    class _CacheLogTap(_logging.Handler):
        def __init__(self):
            super().__init__(_logging.DEBUG)
            self.lines = []

        def emit(self, record):
            self.lines.append(record.getMessage())

    _tap = _CacheLogTap()
    _cache_loggers = [_logging.getLogger(n) for n in
                      ("jax._src.compiler", "jax._src.compilation_cache")]
    _old_levels = [_lg.level for _lg in _cache_loggers]
    for _lg in _cache_loggers:
        _lg.addHandler(_tap)
        _lg.setLevel(_logging.DEBUG)
    try:
        with _warnings.catch_warnings(record=True) as _wlist:
            _warnings.simplefilter("always")
            t0 = time.time()
            float(multi_step(params, 1, cache))
            compile_s = time.time() - t0
    finally:
        for _lg, _lv in zip(_cache_loggers, _old_levels):
            _lg.removeHandler(_tap)
            _lg.setLevel(_lv)
    _miss_key = _hit = None
    for _msg in _tap.lines + [str(_w.message) for _w in _wlist]:
        _m = _re.search(r"key '(jit_multi_step-[0-9a-f]+)'", _msg)
        if _m and "MISS" in _msg:
            _miss_key = _m.group(1)
        elif _m and "cache hit" in _msg:
            _hit = _m.group(1)
        if "cache" in _msg.lower() and "multi_step" in _msg:
            print(f"# [cache] {_msg}", file=sys.stderr, flush=True)
    print(f"# multi_step compiled in {compile_s:.1f}s", file=sys.stderr,
          flush=True)
    try:
        ents = [f for f in os.listdir(cache_dir) if "multi_step" in f]
        if _hit is not None:
            state = f"HIT key {_hit.split('-')[1][:16]}..."
        elif _miss_key is None:
            state = "no hit/miss record (in-process tracing cache?)"
        else:
            written = os.path.exists(
                os.path.join(cache_dir, f"{_miss_key}-cache"))
            state = (f"MISS key {_miss_key.split('-')[1][:16]}... "
                     f"written_post={written}")
        print(f"# jax_cache multi_step entries: {len(ents)} {state} "
              f"(compile {'<60s' if compile_s < 60 else 'COLD'})",
              file=sys.stderr, flush=True)
    except OSError:
        pass

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
    if dt <= 0:
        # per-step time below host-timing noise: widen the interval
        n2 = n1 + 16 * args.steps
        t2 = timed(n2)
        dt = max((t2 - t1) / (16 * args.steps), 1e-9)
    tok_per_s = args.batch / dt

    # Roofline: HBM bandwidth bound on weight reads per decode step.
    hbm_bw = {"tpu": 819e9, "axon": 819e9}.get(backend, 50e9)  # v5e
    fb = 1 if args.int8_factors else 2
    wb = weight_bytes_per_token(config, args.bits, args.rank,
                                factor_bytes=fb, head_bytes=fb)
    roofline_steps_per_s = hbm_bw / wb
    roofline_tok_per_s = roofline_steps_per_s * args.batch
    vs = tok_per_s / roofline_tok_per_s

    variant = ("-mega" if args.decode_path == "mega" else "") + \
        ("-paged" if args.decode_path == "paged" else "") + \
        ("-fused" if args.fused else "") + \
        ("-flash" if args.flash_attn else
         ("-kv8" if args.kv_int8 else "")) + \
        ("-f8" if args.int8_factors else "") + \
        ({"off": "", "on": "-staged", "uniform": "-stagedu"}[args.staged_kv]
         if args.flash_attn else "") + \
        ("-mlp" if args.mlp_kernel else "") + \
        ("-ab" if (args.attn_kernel == "ab" and args.flash_attn
                   and args.decode_path != "paged") else "") + \
        ("-attno" if (args.attn_o_kernel and args.flash_attn) else "") + \
        ("-abf16" if (args.attn_dots == "bf16" and args.flash_attn) else "") + \
        ("-ai8" if (args.attn_dots == "i8" and args.flash_attn) else "") + \
        ("-pers" if args.proj_kernel == "persistent" else "")
    print(json.dumps({
        "metric": f"decode tokens/sec/chip {args.model} "
                  f"{args.bits}-bit+rank{args.rank} {args.mode}{variant} "
                  f"batch{args.batch}",
        "value": round(tok_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 4),
    }))
    print(f"# backend={backend} use_pallas={use_pallas} "
          f"compile={compile_s:.1f}s step={dt * 1000:.2f}ms "
          f"(slope n={n1}->{n2}) roofline={roofline_tok_per_s:.0f} tok/s "
          f"weight_bytes/step={wb / 1e9:.2f}GB", file=sys.stderr)


if __name__ == "__main__":
    main()
