"""Honest speculative-decoding characterization (VERDICT r1 #6).

Sweeps the speculative window ``gamma``, the early-exit draft depth, and a
controlled draft-degradation knob (multiplicative noise on the draft's
quantization scales) to map committed tokens/sec against measured
acceptance — including acceptance << 1 — and find the break-even
acceptance vs plain decoding. One process so recompiles stay in-process
(the relay charges minutes for a process's first compile).

The noise knob emulates a draft that disagrees with the target (a heavily
compressed or distilled draft): the rejection sampler keeps outputs exact
regardless, only the acceptance rate (and hence speed) changes.
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
    ap.add_argument("--context", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=24)
    ap.add_argument("--configs", default=(
        "4:4:0,4:4:0.02,4:4:0.05,4:4:0.1,4:4:0.3,2:4:0.1,8:4:0.1,4:8:0.05"),
        help="comma list of gamma:draft_layers:scale_noise")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="sampling temperature: 0 = greedy (argmax-match "
                         "acceptance — knife-edge on untrained weights), "
                         ">0 = stochastic rejection sampling (acceptance "
                         "= E[min(p,q)/q], degrades smoothly with draft "
                         "divergence)")
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from jax.tree_util import keystr, tree_map_with_path
    from bench import build_compressed_llama_params, weight_bytes_per_token
    from ee274_convexcaldera_llm_quantization_tpu.models import (
        fused as fusedm, llama)
    from ee274_convexcaldera_llm_quantization_tpu.models.config import PRESETS
    from ee274_convexcaldera_llm_quantization_tpu.serve import speculative

    config = PRESETS[args.model]
    B = args.batch
    backend = jax.devices()[0].platform
    use_pallas = backend in ("tpu", "axon")

    t0 = time.time()
    params = build_compressed_llama_params(config, args.bits, args.rank,
                                           mode="w4a8")
    params = fusedm.quantize_factors_int8_fused(fusedm.fuse_stacked(params),
                                                fuse_factor_kernel="l")
    jax.block_until_ready(params.embed)
    print(f"# params built in {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)

    def degrade(draft, sigma, seed=0):
        if sigma <= 0:
            return draft
        key = jax.random.PRNGKey(seed)

        def f(path, leaf):
            name = keystr(path)
            if "scale" in name and getattr(leaf, "dtype", None) is not None:
                k = jax.random.fold_in(key, abs(hash(name)) % (2 ** 31))
                noise = 1.0 + sigma * jax.random.normal(
                    k, leaf.shape, jnp.float32)
                return (leaf.astype(jnp.float32) * noise).astype(leaf.dtype)
            return leaf

        return tree_map_with_path(f, draft)

    T = args.context
    pos0 = 8
    tokens = jnp.zeros((B,), jnp.int32)
    temps = jnp.full((B,), args.temperature, jnp.float32)
    tks = jnp.zeros((B,), jnp.int32)
    tps = jnp.ones((B,), jnp.float32)

    # plain decode baseline (same process, same weights)
    cache0 = llama.HeadMajorQuantKVCache.create(config, B, T)

    @jax.jit
    def plain(params, n, cache):
        def body(i, carry):
            cache, tok, acc = carry
            pos = jnp.full((B,), pos0 + i, jnp.int32)
            logits, cache = fusedm.decode_step_fused(
                params, tok, pos, cache, config, interpret=not use_pallas)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return cache, tok, acc + jnp.sum(logits) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, n, body, (cache0, tokens,
                                              jnp.float32(0)))[2]

    t0 = time.time()
    float(plain(params, 1, cache0))
    print(f"# plain compiled {time.time() - t0:.0f}s", file=sys.stderr,
          flush=True)

    def timeit(fn, n1, n2, reps=3):
        def t(n):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                fn(n)
                best = min(best, time.time() - t0)
            return best
        return (t(n2) - t(n1)) / (n2 - n1)

    dt = timeit(lambda n: float(plain(params, n, cache0)), 8, 72)
    plain_tok_s = B / dt
    print(f"# plain decode: {dt * 1000:.2f} ms/step "
          f"({plain_tok_s:.0f} tok/s)", file=sys.stderr, flush=True)

    rows = []
    for spec_cfg in args.configs.split(","):
        gamma, dl, noise = spec_cfg.split(":")
        gamma, dl, noise = int(gamma), int(dl), float(noise)
        draft, dconfig = speculative.truncate_draft(params, config, dl)
        draft = degrade(draft, noise)
        cache = llama.HeadMajorQuantKVCache.create(config, B, T)
        dcache = llama.KVCache.create(dconfig, B, T)
        max_rounds = (T - pos0 - gamma - 2) // (gamma + 1)

        @jax.jit
        def multi_round(params, draft, n, cache, dcache, gamma=gamma,
                        dconfig=dconfig):
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
            return jax.lax.fori_loop(
                0, n, body, (tokens, pos, cache, dcache, jnp.int32(0)))[4]

        t0 = time.time()
        int(multi_round(params, draft, 1, cache, dcache))
        compile_s = time.time() - t0

        def run(n):
            return int(multi_round(params, draft, n, cache, dcache))

        n1, n2 = 4, min(4 + args.rounds, max_rounds)
        best1 = best2 = float("inf")
        c1 = c2 = 0
        for _ in range(3):
            t0 = time.time(); c1 = run(n1)
            best1 = min(best1, time.time() - t0)
            t0 = time.time(); c2 = run(n2)
            best2 = min(best2, time.time() - t0)
        dt_round = (best2 - best1) / (n2 - n1)
        tok_s = (c2 - c1) / (best2 - best1)
        acc = (c2 - c1) / ((n2 - n1) * B) - 1     # accepted per round
        row = {"gamma": gamma, "draft_layers": dl, "scale_noise": noise,
               "round_ms": round(dt_round * 1000, 2),
               "accepted_per_round": round(acc, 2),
               "acceptance_rate": round(acc / gamma, 3),
               "committed_tok_s": round(tok_s, 1),
               "speedup_vs_plain": round(tok_s / plain_tok_s, 3)}
        rows.append(row)
        print(f"# {row}  [compile {compile_s:.0f}s]", file=sys.stderr,
              flush=True)

    hbm_bw = 819e9
    wb = weight_bytes_per_token(config, args.bits, args.rank,
                                factor_bytes=1, head_bytes=1)
    print(json.dumps({
        "plain_tok_s": round(plain_tok_s, 1),
        "roofline_tok_s": round(hbm_bw / wb * B, 1),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
