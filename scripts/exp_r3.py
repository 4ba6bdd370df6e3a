"""Round-3 perf experiments (single process per phase batch — the relay
charges minutes of warmup to each process's first compile).

Phases (--phases, comma-separated):
  abmicro  - attention-kernel microbench: row-grid vs all-batch flash
             decode at several (batch, context) points, dependent chain
             cycling the layer index (KV slabs always stream from HBM)
  abe2e    - decode_step_fused A/B: attn_kernel "row" vs "ab" at the
             headline config (B8 ctx256, staged uniform), incl. an
             on-chip logits cross-check
  abctx    - same A/B at ctx 2048 (attention-bound regime)
  abb32    - same A/B at batch 32, ctx 256
  megasmoke- Mosaic-compile the whole-step megakernel at tiny-mha scale
             and cross-check logits vs the fused path on chip
  mega     - decode_step_persistent (ONE pallas_call for all layers)
             vs decode_step_fused at the headline config, slope-timed
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(fn, n1, n2, reps=3):
    def timed(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn(n)
            best = min(best, time.time() - t0)
        return best
    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--phases", default="abmicro")
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from bench import build_compressed_llama_params
    from ee274_convexcaldera_llm_quantization_tpu.models import (
        fused as fusedm, llama)
    from ee274_convexcaldera_llm_quantization_tpu.models.config import PRESETS
    from ee274_convexcaldera_llm_quantization_tpu.ops import attention as AT

    config = PRESETS[args.model]
    backend = jax.devices()[0].platform
    use_pallas = backend in ("tpu", "axon")
    phases = args.phases.split(",")
    results = {}

    if "abmicro" in phases:
        # kernel-level: chain attention calls cycling the layer index so
        # every call's KV slab streams from HBM (no resident reuse)
        KVH, D, Lk = config.num_kv_heads, config.head_dim, 8
        G = config.num_heads // KVH
        for B, T in ((8, 256), (8, 2048), (32, 256)):
            key = jax.random.PRNGKey(0)
            ks_ = jax.random.split(key, 5)
            q = jax.random.normal(ks_[0], (B, KVH, G, D), jnp.float32)
            k = jax.random.randint(ks_[1], (Lk, B, KVH, T, D), -127, 128,
                                   jnp.int8)
            v = jax.random.randint(ks_[2], (Lk, B, KVH, T, D), -127, 128,
                                   jnp.int8)
            ksc = jax.random.uniform(ks_[3], (Lk, B, KVH, T), jnp.float32,
                                     0.005, 0.02)
            vsc = jax.random.uniform(ks_[4], (Lk, B, KVH, T), jnp.float32,
                                     0.005, 0.02)
            pos = jnp.full((B,), T - 2, jnp.int32)
            dummy = jnp.zeros((B, KVH, D), jnp.float32)
            kv_gb = 2 * B * KVH * T * D / 1e9    # int8 K+V bytes per call

            def make(kern):
                @jax.jit
                def many(q, n):
                    def body(i, carry):
                        q, acc = carry
                        out = kern(q, i % Lk)
                        return q + acc * 1e-30, acc + jnp.sum(out) * 1e-9
                    return jax.lax.fori_loop(
                        0, n, body, (q, jnp.float32(0)))[1]
                return many

            variants = {
                "row": lambda q, l: AT.flash_decode_q8(
                    q, k, v, ksc, vsc, l, pos, interpret=not use_pallas),
                "ab": lambda q, l: AT.flash_decode_q8_ab(
                    q, k, v, ksc, vsc, dummy, dummy, l, pos,
                    interpret=not use_pallas),
                "ab_st": lambda q, l: AT.flash_decode_q8_ab(
                    q, k, v, ksc, vsc, dummy, dummy, l, pos, staged=True,
                    interpret=not use_pallas),
            }
            for tag, kern in variants.items():
                many = make(kern)
                t0 = time.time()
                float(many(q, 1))
                cs = time.time() - t0
                dt = slope(lambda n: float(many(q, n)), 16, 80)
                gbs = kv_gb / dt
                results[f"attn_{tag}_B{B}_T{T}_us"] = round(dt * 1e6, 2)
                print(f"# attn {tag} B{B} T{T}: {dt * 1e6:.1f} us/call "
                      f"({gbs:.0f} GB/s KV)  [compile {cs:.0f}s]",
                      file=sys.stderr, flush=True)

    if "megasmoke" in phases:
        import numpy as np
        from ee274_convexcaldera_llm_quantization_tpu.models import (
            persistent)
        cfg = PRESETS["tiny-mha"]
        t0 = time.time()
        tp = build_compressed_llama_params(cfg, args.bits, args.rank,
                                           mode="w4a8")
        tp = fusedm.quantize_factors_int8_fused(
            fusedm.fuse_stacked(tp), fuse_factor_kernel="l")
        jax.block_until_ready(tp.embed)
        toks = jnp.asarray([1, 3], jnp.int32)
        pos1 = jnp.asarray([6, 6], jnp.int32)
        ca = llama.HeadMajorQuantKVCache.create(cfg, 2, 128)
        cb = llama.HeadMajorQuantKVCache.create(cfg, 2, 128)
        la, ca2 = fusedm.decode_step_fused(tp, toks, pos1, ca, cfg,
                                           staged_kv=True)
        lb, cb2 = persistent.decode_step_persistent(tp, toks, pos1, cb,
                                                    cfg, staged_kv="on")
        la, lb = np.asarray(la), np.asarray(lb)
        rel = np.linalg.norm(lb - la) / max(np.linalg.norm(la), 1e-9)
        kexact = bool((np.asarray(ca2.k[0]) == np.asarray(cb2.k[0])).all())
        results["megasmoke_logits_rel"] = float(rel)
        results["megasmoke_l0_codes_exact"] = kexact
        print(f"# megasmoke: logits rel {rel:.2e}, layer-0 codes exact "
              f"{kexact}  [{time.time() - t0:.0f}s incl compile]",
              file=sys.stderr, flush=True)
        assert rel < 0.05 and kexact

    e2e_phases = [p for p in phases
                  if p in ("abe2e", "abctx", "abb32", "mega")]
    if e2e_phases:
        t0 = time.time()
        base = build_compressed_llama_params(config, args.bits, args.rank,
                                             mode="w4a8")
        base = fusedm.fuse_stacked(base)
        params = fusedm.quantize_factors_int8_fused(base,
                                                    fuse_factor_kernel="xla")
        jax.block_until_ready(params.embed)
        print(f"# params built in {time.time() - t0:.1f}s", file=sys.stderr,
              flush=True)

        def fused_ab(tag, B, context, **kw):
            cache = llama.HeadMajorQuantKVCache.create(config, B, context)
            tokens = jnp.zeros((B,), jnp.int32)
            pos0 = context // 2

            @jax.jit
            def multi(params, n, cache):
                def body(i, carry):
                    cache, tok, acc = carry
                    pos = jnp.full((B,), pos0 + i, jnp.int32)
                    logits, cache = fusedm.decode_step_fused(
                        params, tok, pos, cache, config,
                        interpret=not use_pallas, **kw)
                    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return cache, tok, acc + jnp.sum(logits) * 1e-9
                return jax.lax.fori_loop(
                    0, n, body, (cache, tokens, jnp.float32(0)))[2]

            t0 = time.time()
            float(multi(params, 1, cache))
            cs = time.time() - t0
            dt = slope(lambda n: float(multi(params, n, cache)),
                       8, 8 + args.steps)
            results[f"decode_{tag}_ms"] = round(dt * 1000, 3)
            print(f"# {tag}: {dt * 1000:.2f} ms/step ({B / dt:.0f} tok/s)  "
                  f"[compile {cs:.0f}s]", file=sys.stderr, flush=True)

        def crosscheck(tag, B, context, **kw):
            import numpy as np
            ca = llama.HeadMajorQuantKVCache.create(config, B, context)
            cb = llama.HeadMajorQuantKVCache.create(config, B, context)
            tokens = jnp.zeros((B,), jnp.int32)
            pos1 = jnp.full((B,), context // 2, jnp.int32)
            la, _ = fusedm.decode_step_fused(params, tokens, pos1, ca,
                                             config,
                                             interpret=not use_pallas)
            lb, _ = fusedm.decode_step_fused(params, tokens, pos1, cb,
                                             config,
                                             interpret=not use_pallas, **kw)
            la, lb = np.asarray(la), np.asarray(lb)
            rel = np.linalg.norm(lb - la) / max(np.linalg.norm(la), 1e-9)
            results[f"{tag}_logits_rel"] = float(rel)
            same = (np.argmax(la, -1) == np.argmax(lb, -1)).mean()
            results[f"{tag}_argmax_match"] = float(same)
            print(f"# {tag} on-chip logits rel diff: {rel:.2e} "
                  f"argmax match {same:.3f}", file=sys.stderr, flush=True)
            assert rel < 1e-2, rel

        if "abe2e" in phases:
            crosscheck("ab", 8, 256, attn_kernel="ab")
            fused_ab("row_B8_T256", 8, 256, staged_kv="uniform")
            fused_ab("ab_B8_T256", 8, 256, staged_kv="uniform",
                     attn_kernel="ab")
        if "abctx" in phases:
            fused_ab("row_B8_T2048", 8, 2048, staged_kv="uniform")
            fused_ab("ab_B8_T2048", 8, 2048, staged_kv="uniform",
                     attn_kernel="ab")
        if "abb32" in phases:
            fused_ab("row_B32_T256", 32, 256, staged_kv="uniform")
            fused_ab("ab_B32_T256", 32, 256, staged_kv="uniform",
                     attn_kernel="ab")

        if "mega" in phases:
            import numpy as np
            from ee274_convexcaldera_llm_quantization_tpu.models import (
                persistent)
            params_l = fusedm.quantize_factors_int8_fused(
                base, fuse_factor_kernel="l")
            jax.block_until_ready(params_l.layers.qkv.L_cat)
            B, context = 8, 256
            # on-chip cross-check (one step; persistent vs fused staged)
            ca = llama.HeadMajorQuantKVCache.create(config, B, context)
            cb = llama.HeadMajorQuantKVCache.create(config, B, context)
            tokens = jnp.zeros((B,), jnp.int32)
            pos1 = jnp.full((B,), context // 2, jnp.int32)
            la, _ = fusedm.decode_step_fused(params, tokens, pos1, ca,
                                             config, staged_kv=True)
            lb, _ = persistent.decode_step_persistent(
                params_l, tokens, pos1, cb, config, staged_kv="on")
            la, lb = np.asarray(la), np.asarray(lb)
            rel = np.linalg.norm(lb - la) / max(np.linalg.norm(la), 1e-9)
            results["mega_logits_rel"] = float(rel)
            same = (np.argmax(la, -1) == np.argmax(lb, -1)).mean()
            results["mega_argmax_match"] = float(same)
            print(f"# mega on-chip logits rel {rel:.2e} argmax {same:.3f}",
                  file=sys.stderr, flush=True)

            cache = llama.HeadMajorQuantKVCache.create(config, B, context)
            pos0 = context // 2

            @jax.jit
            def multi_p(params_l, n, cache):
                def body(i, carry):
                    cache, tok, acc = carry
                    pos = jnp.full((B,), pos0 + i, jnp.int32)
                    logits, cache = persistent.decode_step_persistent(
                        params_l, tok, pos, cache, config)
                    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return cache, tok, acc + jnp.sum(logits) * 1e-9
                return jax.lax.fori_loop(
                    0, n, body, (cache, tokens, jnp.float32(0)))[2]

            t0 = time.time()
            float(multi_p(params_l, 1, cache))
            cs = time.time() - t0
            dt = slope(lambda n: float(multi_p(params_l, n, cache)),
                       8, 8 + args.steps)
            results["decode_mega_ms"] = round(dt * 1000, 3)
            print(f"# mega: {dt * 1000:.2f} ms/step ({B / dt:.0f} tok/s)  "
                  f"[compile {cs:.0f}s]", file=sys.stderr, flush=True)
            fused_ab("fused_baseline_B8_T256", 8, 256,
                     staged_kv="uniform")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
