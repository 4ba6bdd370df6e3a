"""Mosaic-compile the PP serving path on the real chip (VERDICT r2 #3).

PP was the last interpret-only Pallas path: ``decode_step_w4a8_pp`` had
only ever executed with ``interpret=True`` (CPU-mesh dryrun + tests) —
round 2 proved interpret mode is NOT evidence of lowering (the TP bring-up
immediately surfaced real Mosaic failures). Mirror of
``scripts/exp_tp_chip.py`` for the pipeline path:

1. correctness: a tiny w4a8 model decoded through the PP path on a
   1-device ``("pp",)`` mesh with ``interpret=False`` (the GPipe schedule
   degenerates to S=1: one microbatch, one stage — but the REAL Pallas
   kernels lower through shard_map + ppermute) must match the single-chip
   step bit-for-bit;
2. pp=1 overhead at the flagship shape, slope-timed.
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
    from ee274_convexcaldera_llm_quantization_tpu.parallel import pp as PP

    backend = jax.devices()[0].platform
    if backend not in ("tpu", "axon"):
        raise SystemExit(f"needs the real TPU chip, got backend={backend}")
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("pp",))
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
    pp_params = PP.shard_stacked_model_pp(tparams, mesh1)
    pp_cache = PP.shard_kv_cache_pp(llama.KVCache.create(TINY, 2, 16), mesh1)
    t0 = time.time()
    out, pp_cache = PP.decode_step_w4a8_pp(
        pp_params, toks, pos, pp_cache, TINY, mesh1, interpret=False)
    out = np.asarray(out)
    print(f"# PP tiny step (Mosaic, pp=1) compiled+ran in "
          f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    maxdiff = float(np.abs(out - ref).max())
    cache_diff = float(np.abs(
        np.asarray(jax.device_get(pp_cache.k), np.float32)
        - np.asarray(cref.k, np.float32)).max())
    results["tiny_logits_maxdiff"] = maxdiff
    results["tiny_cache_maxdiff"] = cache_diff
    print(f"# pp=1 vs single-chip: logits maxdiff={maxdiff:.3e} "
          f"cache maxdiff={cache_diff:.3e}", file=sys.stderr, flush=True)
    assert maxdiff == 0.0, f"PP pp=1 logits differ: {maxdiff}"
    assert cache_diff == 0.0, f"PP pp=1 cache differs: {cache_diff}"

    # int8 KV variant lowers too
    qc = PP.shard_kv_cache_pp(llama.QuantKVCache.create(TINY, 2, 16), mesh1)
    refq, crefq = stacked.decode_step_w4a8(
        tparams, toks, pos, llama.QuantKVCache.create(TINY, 2, 16), TINY,
        interpret=False)
    outq, qc = PP.decode_step_w4a8_pp(
        tparams if False else pp_params, toks, pos, qc, TINY, mesh1,
        interpret=False)
    qdiff = float(np.abs(np.asarray(outq) - np.asarray(refq)).max())
    results["tiny_q8_logits_maxdiff"] = qdiff
    print(f"# pp=1 int8-KV logits maxdiff={qdiff:.3e}", file=sys.stderr,
          flush=True)
    assert qdiff == 0.0

    # --- 2. pp=1 overhead at the flagship shape ---
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
            lambda p, t, ps, c: stacked.decode_step_w4a8(p, t, ps, c,
                                                         config),
            lambda: llama.KVCache.create(config, B, args.context))
        print(f"# single-chip stacked: {ms1:.2f} ms/step "
              f"[compile {cs1:.0f}s]", file=sys.stderr, flush=True)
        pp7 = PP.shard_stacked_model_pp(params, mesh1)
        ms2, cs2 = bench(
            pp7,
            lambda p, t, ps, c: PP.decode_step_w4a8_pp(p, t, ps, c, config,
                                                       mesh1),
            lambda: PP.shard_kv_cache_pp(
                llama.KVCache.create(config, B, args.context), mesh1))
        print(f"# pp=1: {ms2:.2f} ms/step [compile {cs2:.0f}s]",
              file=sys.stderr, flush=True)
        results["stacked_ms"] = round(ms1, 3)
        results["pp1_ms"] = round(ms2, 3)
        results["pp1_overhead_pct"] = round((ms2 - ms1) / ms1 * 100, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
