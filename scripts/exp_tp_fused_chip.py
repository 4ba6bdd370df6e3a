"""Mosaic-compile the FUSED (headline) TP serving path on the real chip.

Round-3 VERDICT weak #4: the TP layer wrapped the round-1-era stacked
step — no fused qkv, no flash attention, no int8 KV, no staged commits —
so multi-chip serving would run ~15% below the single-chip headline per
chip. ``parallel.tp_fused`` now shards ``decode_step_fused`` itself;
this script proves it on a 1-device mesh over the real chip:

1. correctness: a tiny fused w4a8 model decoded through the TP path must
   match the single-chip ``decode_step_fused(staged_kv="uniform")`` step
   bit-for-bit (at tp=1 the per-shard activation absmax equals the
   full-row absmax, so there is no numerical excuse for any difference);
2. tp=1 overhead at the flagship shape: slope-timed ms/step of the fused
   TP step vs the single-chip fused step on llama2-7b — the VERDICT r3
   "done" bar is within ~2% of the single-chip headline.

One process so recompiles stay in-process (relay compiles are minutes
cold). The reference has no parallelism at all (SURVEY.md section 2.10).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--context", type=int, default=256)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--skip-timing", action="store_true")
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from bench import build_compressed_llama_params
    from ee274_convexcaldera_llm_quantization_tpu.models import (
        fused as fusedm, llama)
    from ee274_convexcaldera_llm_quantization_tpu.models.config import PRESETS
    from ee274_convexcaldera_llm_quantization_tpu.parallel import (
        tp_fused as TPF)

    backend = jax.devices()[0].platform
    if backend not in ("tpu", "axon"):
        raise SystemExit(f"needs the real TPU chip, got backend={backend}")
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("tp",))
    results = {"backend": backend}

    def fuse(p):
        return fusedm.quantize_factors_int8_fused(fusedm.fuse_stacked(p))

    # --- 1. bit-exact correctness, tiny shapes, REAL Mosaic kernels ---
    TINY = PRESETS["tiny"]
    tparams = fuse(build_compressed_llama_params(TINY, 4, 8, mode="w4a8"))
    toks = jnp.asarray([1, 2], jnp.int32)
    pos = jnp.asarray([3, 3], jnp.int32)
    t0 = time.time()
    ref, cref = fusedm.decode_step_fused(
        tparams, toks, pos, llama.HeadMajorQuantKVCache.create(TINY, 2, 16),
        TINY, interpret=False, staged_kv="uniform")
    ref = np.asarray(ref)
    print(f"# single-chip tiny fused step compiled+ran in "
          f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    tp_params = TPF.shard_fused_model_tp(tparams, mesh1)
    tp_cache = TPF.shard_headmajor_cache_tp(
        llama.HeadMajorQuantKVCache.create(TINY, 2, 16), mesh1)
    t0 = time.time()
    out, tp_cache = TPF.decode_step_fused_tp(
        tp_params, toks, pos, tp_cache, TINY, mesh1, interpret=False)
    out = np.asarray(out)
    print(f"# fused TP tiny step (Mosaic, tp=1) compiled+ran in "
          f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    maxdiff = float(np.abs(out - ref).max())
    cache_diff = float(np.abs(
        np.asarray(jax.device_get(tp_cache.k), np.float32)
        - np.asarray(cref.k, np.float32)).max())
    results["tiny_logits_maxdiff"] = maxdiff
    results["tiny_cache_maxdiff"] = cache_diff
    print(f"# tp=1 vs single-chip fused: logits maxdiff={maxdiff:.3e} "
          f"KV-code maxdiff={cache_diff:.3e}", file=sys.stderr, flush=True)
    assert maxdiff == 0.0, f"fused TP tp=1 logits differ: {maxdiff}"
    assert cache_diff == 0.0, f"fused TP tp=1 cache differs: {cache_diff}"

    # prefill path too (Mosaic-compiles prefill_into_slot_fused sharded)
    ptoks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    pref, _ = fusedm.prefill_into_slot_fused(
        tparams, ptoks, jnp.asarray(0),
        llama.HeadMajorQuantKVCache.create(TINY, 1, 16), TINY,
        interpret=False)
    tp_cache = TPF.shard_headmajor_cache_tp(
        llama.HeadMajorQuantKVCache.create(TINY, 1, 16), mesh1)
    pout, _ = TPF.prefill_into_slot_fused_tp(
        tp_params, ptoks, jnp.asarray(0), tp_cache, TINY, mesh1,
        interpret=False)
    pdiff = float(np.abs(np.asarray(pout) - np.asarray(pref)).max())
    results["tiny_prefill_maxdiff"] = pdiff
    print(f"# tp=1 prefill maxdiff={pdiff:.3e}", file=sys.stderr, flush=True)
    assert pdiff == 0.0, f"fused TP tp=1 prefill differs: {pdiff}"

    # --- 2. tp=1 overhead at the flagship shape ---
    if not args.skip_timing:
        import gc
        config = PRESETS[args.model]
        B = args.batch
        t0 = time.time()
        params = fuse(build_compressed_llama_params(config, args.bits,
                                                    args.rank, mode="w4a8"))
        jax.block_until_ready(params.embed)
        print(f"# params built in {time.time() - t0:.1f}s", file=sys.stderr,
              flush=True)
        tokens = jnp.zeros((B,), jnp.int32)
        pos0 = args.context // 2

        def bench(params, step_fn, make_cache):
            cache = make_cache()

            @jax.jit
            def multi(params, n, cache):
                def body(i, carry):
                    cache, tok, acc = carry
                    p = jnp.full((B,), pos0 + i, jnp.int32)
                    logits, cache = step_fn(params, tok, p, cache)
                    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return cache, tok, acc + jnp.sum(logits) * 1e-9
                return jax.lax.fori_loop(
                    0, n, body, (cache, tokens, jnp.float32(0)))[2]

            t0 = time.time()
            float(multi(params, 1, cache))
            cs = time.time() - t0
            dt = slope(lambda n: float(multi(params, n, cache)),
                       8, 8 + args.steps)
            return dt * 1000, cs

        ms1, cs1 = bench(
            params,
            lambda p, t, ps, c: fusedm.decode_step_fused(
                p, t, ps, c, config, staged_kv="uniform"),
            lambda: llama.HeadMajorQuantKVCache.create(config, B,
                                                       args.context))
        print(f"# single-chip fused: {ms1:.2f} ms/step "
              f"({B / ms1 * 1000:.0f} tok/s) [compile {cs1:.0f}s]",
              file=sys.stderr, flush=True)

        del params
        gc.collect()
        params2 = fuse(build_compressed_llama_params(config, args.bits,
                                                     args.rank, mode="w4a8"))
        tp_big = TPF.shard_fused_model_tp(params2, mesh1)
        del params2
        gc.collect()
        jax.block_until_ready(tp_big.embed)
        ms2, cs2 = bench(
            tp_big,
            lambda p, t, ps, c: TPF.decode_step_fused_tp(
                p, t, ps, c, config, mesh1),
            lambda: TPF.shard_headmajor_cache_tp(
                llama.HeadMajorQuantKVCache.create(config, B, args.context),
                mesh1))
        print(f"# fused TP tp=1 (Mosaic): {ms2:.2f} ms/step "
              f"({B / ms2 * 1000:.0f} tok/s) [compile {cs2:.0f}s]",
              file=sys.stderr, flush=True)
        results["fused_ms"] = round(ms1, 3)
        results["tp1_ms"] = round(ms2, 3)
        results["tp1_overhead_pct"] = round((ms2 / ms1 - 1) * 100, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
