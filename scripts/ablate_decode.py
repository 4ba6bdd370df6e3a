"""Decode-step ablation microbench: where does the 7B step time go?

Times variants of the fused W4A8 decode step with components disabled
(flash attention + KV writes, low-rank factor path, lm_head/logits, packed
kernels), using the same slope protocol as bench.py. The differences
attribute per-step milliseconds to each component; the remainder over the
weight-read roofline is launch/dispatch overhead + activation work.

Usage: python scripts/ablate_decode.py [--model llama2-7b] [--batch 8]
       [--context 256] [--variants full,-attn,...]
"""

import argparse
import functools
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
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--variants", default="full,-attn,-lowrank,-logits,"
                                          "packed_only,floor")
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
    from ee274_convexcaldera_llm_quantization_tpu.ops import (
        attention as AT, kernels as Kr)

    config = PRESETS[args.model]
    B = args.batch
    use_pallas = jax.devices()[0].platform in ("tpu", "axon")

    t0 = time.time()
    params = build_compressed_llama_params(config, args.bits, args.rank,
                                           mode="w4a8")
    params = fusedm.quantize_factors_int8_fused(fusedm.fuse_stacked(params))
    jax.block_until_ready(params.embed)
    print(f"# params built in {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    cache0 = llama.HeadMajorQuantKVCache.create(config, B, args.context)
    tokens = jnp.zeros((B,), jnp.int32)
    pos0 = args.context // 2
    kv_groups = config.num_heads // config.num_kv_heads

    def apply_fused(fp, l, y, lowrank):
        yq = Kr.quantized_matmul_w4a8_stacked(
            y, fp.packed, fp.scales, l, fp.num_bits,
            interpret=not use_pallas)
        gs_l = jax.lax.dynamic_index_in_dim(fp.global_scale, l, 0,
                                            keepdims=False)
        if lowrank:
            R_l = jax.lax.dynamic_index_in_dim(fp.R, l, 0, keepdims=False)
            xr = jnp.dot(y.astype(jnp.bfloat16), R_l.T.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            if fp.R_scale is not None:
                Rs = jax.lax.dynamic_index_in_dim(fp.R_scale, l, 0,
                                                  keepdims=False)
                xr = xr * Rs[:, 0][None, :]
        outs, off_n, off_r = [], 0, 0
        for i, (N_i, r_i) in enumerate(zip(fp.splits, fp.ranks)):
            out = yq[:, off_n:off_n + N_i]
            if lowrank:
                L_l = jax.lax.dynamic_index_in_dim(fp.Ls[i], l, 0,
                                                   keepdims=False)
                ylr = jnp.dot(xr[:, off_r:off_r + r_i].astype(jnp.bfloat16),
                              L_l.T.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
                if fp.L_scales is not None:
                    Ls_l = jax.lax.dynamic_index_in_dim(
                        fp.L_scales[i], l, 0, keepdims=False)
                    ylr = ylr * Ls_l[:, 0][None, :]
                out = out + ylr
            outs.append(out * gs_l[i])
            off_n += N_i
            off_r += r_i
        return tuple(outs)

    def apply_plain(lin, l, y, lowrank):
        from ee274_convexcaldera_llm_quantization_tpu.models import (
            stacked as st)
        yq = Kr.quantized_matmul_w4a8_stacked(
            y, lin.packed, lin.scales, l, lin.num_bits,
            interpret=not use_pallas)
        out = yq + st._low_rank_layer(lin, l, y) if lowrank else yq
        gs = jax.lax.dynamic_index_in_dim(lin.global_scale, l, 0,
                                          keepdims=False)
        return out * gs

    def make_step(attn, lowrank, logits_on, packed):
        def step(params, tok, pos, cache):
            lp = params.layers
            x = params.embed[tok].astype(jnp.float32)
            cos, sin = llama.rope_tables(config, pos[:, None])

            def body(l, carry):
                x, cache = carry
                an = jax.lax.dynamic_index_in_dim(lp.attn_norm, l, 0,
                                                  keepdims=False)
                y = llama.rms_norm(x[:, None, :], an,
                                   config.rms_norm_eps)[:, 0]
                if packed:
                    q, k, v = apply_fused(lp.qkv, l, y, lowrank)
                else:
                    q = jnp.zeros((B, config.q_dim), jnp.float32)
                    k = v = jnp.zeros((B, config.kv_dim), jnp.float32)
                q = q.reshape(B, 1, config.num_heads, config.head_dim)
                k = k.reshape(B, 1, config.num_kv_heads, config.head_dim)
                v = v.reshape(B, 1, config.num_kv_heads, config.head_dim)
                q = llama.apply_rope(q, cos, sin)
                k = llama.apply_rope(k, cos, sin)
                if attn:
                    kq, ksc = llama.quantize_kv(k[:, 0])
                    vq, vsc = llama.quantize_kv(v[:, 0])
                    ck, cv, cks, cvs = cache
                    for b in range(B):
                        ck = jax.lax.dynamic_update_slice(
                            ck, kq[b][None, None, :, None, :],
                            (l, b, 0, pos[b], 0))
                        cv = jax.lax.dynamic_update_slice(
                            cv, vq[b][None, None, :, None, :],
                            (l, b, 0, pos[b], 0))
                        cks = jax.lax.dynamic_update_slice(
                            cks, ksc[b][None, None, :, None],
                            (l, b, 0, pos[b]))
                        cvs = jax.lax.dynamic_update_slice(
                            cvs, vsc[b][None, None, :, None],
                            (l, b, 0, pos[b]))
                    cache = llama.HeadMajorQuantKVCache(ck, cv, cks, cvs)
                    qh = q[:, 0].reshape(B, config.num_kv_heads, kv_groups,
                                         config.head_dim)
                    at = AT.flash_decode_q8(
                        qh, cache.k, cache.v, cache.k_scale, cache.v_scale,
                        l, pos, interpret=not use_pallas).reshape(
                        B, config.q_dim)
                else:
                    at = q.reshape(B, config.q_dim)
                if packed:
                    x = x + apply_plain(lp.o_proj, l, at, lowrank)
                mn = jax.lax.dynamic_index_in_dim(lp.mlp_norm, l, 0,
                                                  keepdims=False)
                y = llama.rms_norm(x[:, None, :], mn,
                                   config.rms_norm_eps)[:, 0]
                if packed:
                    gate, up = apply_fused(lp.gateup, l, y, lowrank)
                    x = x + apply_plain(lp.down_proj, l,
                                        jax.nn.silu(gate) * up, lowrank)
                else:
                    x = x + y
                return x, cache

            x, cache = jax.lax.fori_loop(0, config.num_layers, body,
                                         (x, cache))
            if logits_on:
                lg = llama._logits(
                    x[:, None, :],
                    llama.ModelParams(params.embed, [], params.final_norm,
                                      params.lm_head),
                    config, False, not use_pallas)[:, 0, :]
            else:
                lg = x
            return lg, cache

        @jax.jit
        def multi_step(params, n, cache):
            def body(i, carry):
                cache, tok, acc = carry
                pos = jnp.full((B,), pos0 + i, jnp.int32)
                lg, cache = step(params, tok, pos, cache)
                if logits_on:
                    tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                return cache, tok, acc + jnp.sum(lg) * jnp.float32(1e-9)
            out = jax.lax.fori_loop(0, n, body,
                                    (cache, tokens, jnp.float32(0)))
            return out[2]
        return multi_step

    VARIANTS = {
        "full":        dict(attn=True, lowrank=True, logits_on=True,
                            packed=True),
        "-attn":       dict(attn=False, lowrank=True, logits_on=True,
                            packed=True),
        "-lowrank":    dict(attn=True, lowrank=False, logits_on=True,
                            packed=True),
        "-logits":     dict(attn=True, lowrank=True, logits_on=False,
                            packed=True),
        "packed_only": dict(attn=False, lowrank=False, logits_on=False,
                            packed=True),
        "floor":       dict(attn=False, lowrank=False, logits_on=False,
                            packed=False),
    }

    results = {}
    for name in args.variants.split(","):
        ms = make_step(**VARIANTS[name])
        t0 = time.time()
        float(ms(params, 1, cache0))
        print(f"# {name}: compiled in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)

        def timed(n, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                float(ms(params, n, cache0))
                best = min(best, time.time() - t0)
            return best

        n1 = max(args.warmup, 2)
        n2 = n1 + args.steps
        t1, t2 = timed(n1), timed(n2)
        dt = (t2 - t1) / args.steps * 1000
        results[name] = dt
        print(f"# {name}: {dt:.2f} ms/step", file=sys.stderr, flush=True)

    full = results.get("full")
    out = {"step_ms": results}
    if full is not None:
        out["attributed_ms"] = {
            k.lstrip("-"): round(full - v, 3)
            for k, v in results.items() if k.startswith("-")}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
