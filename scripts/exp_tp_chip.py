"""Mosaic-compile the TP serving path on the real chip (VERDICT r1 #5).

Round 1 only ever ran the tensor-parallel kernels with ``interpret=True``
(CPU-mesh dryrun + tests) — validating math, not that the Pallas kernels
*lower* through ``shard_map``. This script runs ``decode_step_w4a8_tp`` on
a 1-device Mesh over the real TPU chip with ``interpret=False``:

1. correctness: a tiny w4a8 model decoded through the TP path must match
   the single-chip ``decode_step_w4a8`` step bit-for-bit (at tp=1 the
   per-shard activation absmax equals the full-row absmax, so there is no
   numerical excuse for any difference);
2. tp=1 overhead on the flagship shape: slope-timed ms/step of the TP
   step vs the plain stacked step on llama2-7b — shard_map + repack must
   cost ~nothing at tp=1.

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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from bench import build_compressed_llama_params
    from ee274_convexcaldera_llm_quantization_tpu.models import llama, stacked
    from ee274_convexcaldera_llm_quantization_tpu.models.config import PRESETS
    from ee274_convexcaldera_llm_quantization_tpu.parallel import (
        tp_decode as TP)

    backend = jax.devices()[0].platform
    if backend not in ("tpu", "axon"):
        raise SystemExit(f"needs the real TPU chip, got backend={backend}")
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("tp",))
    results = {"backend": backend}

    # --- 1. bit-exact correctness, tiny shapes, REAL Mosaic kernels ---
    TINY = PRESETS["tiny"]
    tparams = build_compressed_llama_params(TINY, 4, 8, mode="w4a8")
    toks = jnp.asarray([1, 2], jnp.int32)
    pos = jnp.asarray([3, 5], jnp.int32)
    t0 = time.time()
    ref, cref = stacked.decode_step_w4a8(
        tparams, toks, pos, llama.KVCache.create(TINY, 2, 16), TINY,
        interpret=False)
    ref = np.asarray(ref)
    print(f"# single-chip tiny step compiled+ran in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    tp_params = TP.shard_stacked_model_tp(tparams, mesh1)
    tp_cache = TP.shard_kv_cache_tp(llama.KVCache.create(TINY, 2, 16), mesh1)
    t0 = time.time()
    out, tp_cache = TP.decode_step_w4a8_tp(
        tp_params, toks, pos, tp_cache, TINY, mesh1, interpret=False)
    out = np.asarray(out)
    print(f"# TP tiny step (Mosaic, tp=1) compiled+ran in "
          f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    # tp=1: same kernels, same per-row absmax -> bit-identical expected.
    # NOTE: lm_head materializes from embed in shard_stacked_model_tp when
    # tied; bench params carry an explicit head, so paths are identical.
    maxdiff = float(np.abs(out - ref).max())
    cache_diff = float(np.abs(
        np.asarray(jax.device_get(tp_cache.k), np.float32)
        - np.asarray(cref.k, np.float32)).max())
    results["tiny_logits_maxdiff"] = maxdiff
    results["tiny_cache_maxdiff"] = cache_diff
    print(f"# tp=1 vs single-chip: logits maxdiff={maxdiff:.3e} "
          f"cache maxdiff={cache_diff:.3e}", file=sys.stderr, flush=True)
    assert maxdiff == 0.0, f"TP tp=1 logits differ: {maxdiff}"
    assert cache_diff == 0.0, f"TP tp=1 cache differs: {cache_diff}"

    # prefill path too (Mosaic-compiles prefill_into_slot_w4a8 sharded)
    ptoks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    pref, _ = stacked.prefill_into_slot_w4a8(
        tparams, ptoks, jnp.asarray(0), llama.KVCache.create(TINY, 1, 16),
        TINY, interpret=False)
    tp_cache = TP.shard_kv_cache_tp(llama.KVCache.create(TINY, 1, 16), mesh1)
    pout, _ = TP.prefill_into_slot_w4a8_tp(
        tp_params, ptoks, jnp.asarray(0), tp_cache, TINY, mesh1,
        interpret=False)
    pdiff = float(np.abs(np.asarray(pout) - np.asarray(pref)).max())
    results["tiny_prefill_maxdiff"] = pdiff
    print(f"# tp=1 prefill maxdiff={pdiff:.3e}", file=sys.stderr, flush=True)
    assert pdiff == 0.0, f"TP tp=1 prefill differs: {pdiff}"

    # --- 2. tp=1 overhead at the flagship shape ---
    if not args.skip_timing:
        config = PRESETS[args.model]
        B = args.batch
        t0 = time.time()
        params = build_compressed_llama_params(config, args.bits, args.rank,
                                               mode="w4a8")
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
            lambda p, t, ps, c: stacked.decode_step_w4a8(
                p, t, ps, c, config),
            lambda: llama.KVCache.create(config, B, args.context))
        print(f"# single-chip stacked: {ms1:.2f} ms/step "
              f"({B / ms1 * 1000:.0f} tok/s) [compile {cs1:.0f}s]",
              file=sys.stderr, flush=True)

        # free the single-chip copy before placing the TP copy: two 7B
        # models + device_put transients exhaust the 16 GB chip (timing
        # does not need identical weight values, only identical shapes)
        del params
        import gc
        gc.collect()
        params2 = build_compressed_llama_params(config, args.bits,
                                                args.rank, mode="w4a8")
        tp_big = TP.shard_stacked_model_tp(params2, mesh1)
        del params2
        gc.collect()
        jax.block_until_ready(tp_big.embed)
        ms2, cs2 = bench(
            tp_big,
            lambda p, t, ps, c: TP.decode_step_w4a8_tp(
                p, t, ps, c, config, mesh1),
            lambda: TP.shard_kv_cache_tp(
                llama.KVCache.create(config, B, args.context), mesh1))
        print(f"# TP tp=1 (Mosaic): {ms2:.2f} ms/step "
              f"({B / ms2 * 1000:.0f} tok/s) [compile {cs2:.0f}s]",
              file=sys.stderr, flush=True)
        results["stacked_ms"] = round(ms1, 3)
        results["tp1_ms"] = round(ms2, 3)
        results["tp1_overhead_pct"] = round((ms2 / ms1 - 1) * 100, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
