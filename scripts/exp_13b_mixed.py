"""13B mixed-precision serving end-to-end (VERDICT r1 #9, BASELINE config 5).

Composes the three pieces that existed separately in round 1:

1. ``allocate.multigroup`` — per-(layer, projection) bit allocation from
   the {2,3,4,8} menu under a global budget, with the exact greedy
   marginal-allocation optimum and its duality-gap certificate (the
   reference documents this objective but never implements it,
   ``README.md:87-93`` / ``CONVEX_CALDERA_IMPLEMENTATION.md:163-177``);
2. ``models.mixed`` — bucketed mixed-precision stacked serving (one
   compiled layer body, ``lax.switch`` over bit-width buckets, 3-bit
   grids riding the int4 container);
3. the slope-protocol decode bench on the real chip.

Sensitivity model: without a real 13B checkpoint (zero-egress image) the
rate-distortion constants use the standard ``D(b) = c 2^{-2b}`` uniform-
quantizer law with a depth-decaying sensitivity weight (early layers and
down/o projections weighted higher — the profile QuIP#/CALDERA report for
Llama-family models). The *allocation machinery and certificates* are
exact for whatever weights are supplied; only the weights are synthetic.

Prints one JSON line with the allocation histogram, achieved average bits
(grid = information rate, and container = HBM residency), the allocator's
duality gap, and measured decode throughput vs the mixed-width HBM
roofline.
"""

import argparse
import collections
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROJ_SHAPES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
               "up_proj", "down_proj")
# projection-type sensitivity multipliers (down/o amplify residual error)
PROJ_WEIGHT = {"q_proj": 1.0, "k_proj": 1.0, "v_proj": 1.2, "o_proj": 1.5,
               "gate_proj": 1.0, "up_proj": 1.0, "down_proj": 2.0}


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
    ap.add_argument("--model", default="llama2-13b")
    ap.add_argument("--budget", type=float, default=2.5,
                    help="average Q bits/param budget (grid bits)")
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--context", type=int, default=256)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--segmented", action="store_true",
                    help="decode through decode_step_mixed_segmented "
                         "(uniform-width runs, no lax.switch)")
    ap.add_argument("--fused-segments", action="store_true",
                    help="additionally fuse qkv / gate+up within "
                         "uniform-width segments (one kernel + one "
                         "activation quantization per group)")
    ap.add_argument("--attn-dots", default="i8",
                    choices=["f32", "bf16", "i8"],
                    help="decode-attention dot dtype (segmented path); "
                    "i8 matches bench.py's round-5 default so the "
                    "mixed-vs-uniform comparison stays apples-to-apples")
    ap.add_argument("--no-bench", action="store_true",
                    help="allocation + accounting only (no TPU timing)")
    ap.add_argument("--speculative", default=None, metavar="GAMMA:DL",
                    help="also time speculative decoding composed with "
                         "the segmented mixed path (VERDICT r4 ask #7): "
                         "GAMMA-token draft windows from a DL-layer mixed "
                         "early-exit self-draft (truncate_mixed). Reports "
                         "committed tok/s + acceptance. Requires "
                         "--segmented.")
    ap.add_argument("--spec-noise", type=float, default=0.0,
                    help="multiplicative noise sigma on the draft's "
                         "quantization scales (exp_spec.py's degradation "
                         "knob): output stays exact, acceptance drops — "
                         "maps committed tok/s off the self-draft's "
                         "acceptance ceiling")
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from ee274_convexcaldera_llm_quantization_tpu.allocate import (
        multigroup as MG)
    from ee274_convexcaldera_llm_quantization_tpu.models import llama, mixed
    from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
        CalderaLinear, DenseLinear)
    from ee274_convexcaldera_llm_quantization_tpu.models.config import PRESETS

    config = PRESETS[args.model]
    h, im = config.hidden_size, config.intermediate_size
    shapes = {"q_proj": (config.q_dim, h), "k_proj": (config.kv_dim, h),
              "v_proj": (config.kv_dim, h), "o_proj": (h, config.q_dim),
              "gate_proj": (im, h), "up_proj": (im, h),
              "down_proj": (h, im)}

    # --- 1. allocation: one group per (layer, projection) ---
    groups = []
    for l in range(config.num_layers):
        depth_w = math.exp(-2.0 * l / config.num_layers)   # early > late
        for name in PROJ_SHAPES:
            m, n = shapes[name]
            groups.append(MG.GroupSpec(
                name=f"layers.{l}.{name}", num_params=m * n,
                c=0.1, k=2 * math.log(2),                  # D ~ c 2^{-2b}
                weight=PROJ_WEIGHT[name] * depth_w))
    alloc = MG.allocate_bits_discrete(groups, B_tot=args.budget,
                                      menu=(2, 3, 4, 8))
    hist = collections.Counter(int(b) for b in alloc.bits.values())
    total_p = sum(g.num_params for g in groups)
    # container (HBM) bits: 3-bit grids ride the int4 container
    container = {2: 2, 3: 4, 4: 4, 8: 8}
    hbm_bits = sum(container[int(alloc.bits[g.name])] * g.num_params
                   for g in groups) / total_p
    # factor overhead (int8 L/R at --rank) in bits/param
    fac_bits = sum(8 * min(args.rank, min(shapes[n])) * (sum(shapes[n]))
                   for n in PROJ_SHAPES) * config.num_layers / total_p
    print(f"# allocation: {dict(sorted(hist.items()))}  avg grid bits "
          f"{alloc.avg_bits:.3f} (budget {args.budget}), container "
          f"{hbm_bits:.3f}, +factors {fac_bits:.3f} -> total "
          f"{alloc.avg_bits + fac_bits:.3f} bits/param, "
          f"alloc duality gap {alloc.duality_gap:.2e}",
          file=sys.stderr, flush=True)

    results = {
        "model": args.model, "budget": args.budget,
        "allocation_hist": {str(k): v for k, v in sorted(hist.items())},
        "avg_grid_bits": round(alloc.avg_bits, 4),
        "avg_container_bits": round(hbm_bits, 4),
        "factor_bits_per_param": round(fac_bits, 4),
        "alloc_duality_gap": alloc.duality_gap,
        "total_distortion_bound": alloc.total_distortion,
    }
    if args.no_bench:
        print(json.dumps(results))
        return

    # --- 2. build the bucketed mixed model directly in packed form ---
    # (values are random — throughput depends only on shapes/dtypes; a 13B
    # dense build would need 26 GB on a 16 GB chip)
    bits_of = {g.name: int(alloc.bits[g.name]) for g in groups}
    L = config.num_layers

    def build_projection(name):
        m, n = shapes[name]
        r = min(args.rank, min(m, n))
        per_layer = [bits_of[f"layers.{l}.{name}"] for l in range(L)]
        keys = [(container[b], b) for b in per_layer]
        order = []
        for k in keys:
            if k not in order:
                order.append(k)
        bucket_of = np.asarray([order.index(k) for k in keys], np.int32)
        index_in, counters = [], {k: 0 for k in order}
        for k in keys:
            index_in.append(counters[k])
            counters[k] += 1

        def make_bucket(key, members, seed):
            cont, grid = key
            f = 8 // cont
            Lb = len(members)
            k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
            packed = jax.random.bits(k1, (Lb, m, n // f), jnp.uint8)
            scales = jnp.full((Lb, m, 1), 1.0 / (n ** 0.5) / 7, jnp.float32)
            # int8 factors (the flagship serving config): codes + per-row
            # absmax scales, halving factor HBM reads vs bf16
            Lf = jax.random.randint(k2, (Lb, m, r), -127, 128, jnp.int8)
            Rf = jax.random.randint(k3, (Lb, r, n), -127, 128, jnp.int8)
            return CalderaLinear(
                packed=packed, scales=scales, L=Lf, R=Rf,
                global_scale=jnp.ones((Lb,), jnp.float32), b=None,
                L_scale=jnp.full((Lb, m, 1), 0.02 / 127, jnp.float32),
                R_scale=jnp.full((Lb, r, 1), 0.02 / 127, jnp.float32),
                num_bits=cont, group_size=n, out_features=m, in_features=n,
                mode="w4a8", grid_bits=0 if grid == cont else grid)

        buckets = tuple(
            make_bucket(k, [l for l in range(L) if keys[l] == k], j)
            for j, k in enumerate(order))
        return mixed.MixedProjection(
            buckets=buckets, bucket_of=jnp.asarray(bucket_of),
            index_in=jnp.asarray(index_in, jnp.int32),
            bucket_of_static=tuple(int(b) for b in bucket_of),
            index_in_static=tuple(index_in))

    @jax.jit
    def build_all():
        # ONE jitted program for the whole tree: eager per-bucket builds
        # (21 buckets x several ops) fragment relay HBM enough to tip a
        # 13B build into RESOURCE_EXHAUSTED
        key = jax.random.PRNGKey(7)
        k1, k2 = jax.random.split(key)
        embed = (jax.random.normal(k1, (config.vocab_size, h), jnp.float32)
                 * 0.02).astype(jnp.bfloat16)
        head = (jax.random.normal(k2, (config.vocab_size, h), jnp.float32)
                * 0.02).astype(jnp.bfloat16)
        projections = {name: build_projection(name) for name in PROJ_SHAPES}
        return mixed.MixedStackedParams(
            embed=embed,
            layers=mixed.MixedLayerStack(
                attn_norm=jnp.ones((L, h), jnp.float32),
                mlp_norm=jnp.ones((L, h), jnp.float32), **projections),
            final_norm=jnp.ones((h,), jnp.float32),
            lm_head=DenseLinear(w=head))

    t0 = time.time()
    params = build_all()
    jax.block_until_ready(params.embed)
    print(f"# params built in {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)

    # --- 3. slope-timed decode bench ---
    B = args.batch
    backend = jax.devices()[0].platform
    use_pallas = backend in ("tpu", "axon")
    cache = llama.HeadMajorQuantKVCache.create(config, B, args.context)
    tokens = jnp.zeros((B,), jnp.int32)
    pos0 = args.context // 2

    step_fn = (mixed.decode_step_mixed_segmented if args.segmented
               else mixed.decode_step_mixed)
    fused_prep = None
    if args.segmented:
        runs = mixed.mixed_segments(params.layers, L)
        results["segments"] = len(runs)
        print(f"# segmented decode: {len(runs)} uniform runs "
              f"{[(s, e) for s, e, _ in runs]}", file=sys.stderr,
              flush=True)
        if args.fused_segments:
            t0 = time.time()
            fused_prep = mixed.prepare_fused_segments(params, config)
            jax.block_until_ready(jax.tree.leaves(fused_prep))
            nfused = sum((p["qkv"] is not None) + (p["gateup"] is not None)
                         for p in fused_prep)
            results["fused_segment_groups"] = nfused
            print(f"# fused segments: {nfused}/{2 * len(runs)} groups "
                  f"fused in {time.time() - t0:.0f}s", file=sys.stderr,
                  flush=True)

    @jax.jit
    def multi_step(params, fused_prep, n, cache):
        def body(i, carry):
            cache, tok, acc = carry
            pos = jnp.full((B,), pos0 + i, jnp.int32)
            if args.segmented:
                logits, cache = step_fn(
                    params, tok, pos, cache, config,
                    interpret=not use_pallas, fused_prep=fused_prep,
                    attn_dots=args.attn_dots)
            else:
                logits, cache = step_fn(
                    params, tok, pos, cache, config,
                    interpret=not use_pallas)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return cache, tok, acc + jnp.sum(logits) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, n, body, (cache, tokens,
                                              jnp.float32(0)))[2]

    t0 = time.time()
    float(multi_step(params, fused_prep, 1, cache))
    compile_s = time.time() - t0
    print(f"# multi_step compiled in {compile_s:.1f}s", file=sys.stderr,
          flush=True)
    dt = slope(lambda n: float(multi_step(params, fused_prep, n, cache)),
               8, 8 + args.steps)
    tok_s = B / dt

    # mixed-width HBM roofline: container bytes + bf16 factors + embed/head
    wbytes = sum(container[bits_of[f"layers.{l}.{n}"]]
                 * shapes[n][0] * shapes[n][1] // 8
                 for l in range(L) for n in PROJ_SHAPES)
    wbytes += sum(1 * min(args.rank, min(shapes[n])) * sum(shapes[n])
                  for n in PROJ_SHAPES) * L
    wbytes += config.vocab_size * h * 2 * 2
    roofline = 819e9 / wbytes * B
    results.update({
        "decode_ms_per_step": round(dt * 1000, 3),
        "decode_tok_s": round(tok_s, 1),
        "weight_gb_per_step": round(wbytes / 1e9, 3),
        "roofline_tok_s": round(roofline, 1),
        "fraction_of_roofline": round(tok_s / roofline, 4),
        "compile_s": round(compile_s, 1),
    })
    print(f"# decode: {dt * 1000:.2f} ms/step ({tok_s:.0f} tok/s), "
          f"roofline {roofline:.0f}, {tok_s / roofline * 100:.0f}%",
          file=sys.stderr, flush=True)

    if args.speculative:
        # --- 4. speculative x mixed-segmented composition (r5 ask #7) ---
        from ee274_convexcaldera_llm_quantization_tpu.serve import (
            speculative)
        gamma, dl = (int(x) for x in args.speculative.split(":"))
        draft, dconfig = speculative.truncate_draft(params, config, dl)
        if args.spec_noise > 0:
            from jax.tree_util import keystr, tree_map_with_path
            nkey = jax.random.PRNGKey(3)

            def degrade(path, leaf):
                name = keystr(path)
                if "scale" in name and hasattr(leaf, "dtype"):
                    k = jax.random.fold_in(nkey, abs(hash(name)) % (2**31))
                    noise = 1.0 + args.spec_noise * jax.random.normal(
                        k, leaf.shape, jnp.float32)
                    return (leaf.astype(jnp.float32)
                            * noise).astype(leaf.dtype)
                return leaf

            draft = tree_map_with_path(degrade, draft)
        temps = jnp.zeros((B,), jnp.float32)        # greedy
        tks = jnp.zeros((B,), jnp.int32)
        tps = jnp.ones((B,), jnp.float32)
        scache = llama.HeadMajorQuantKVCache.create(config, B, args.context)
        dcache = llama.HeadMajorQuantKVCache.create(dconfig, B,
                                                    args.context)
        max_rounds = (args.context - pos0 - gamma - 2) // (gamma + 1)

        @jax.jit
        def multi_round(params, draft, n, scache, dcache):
            def body(i, carry):
                tok, pos, scache, dcache, committed = carry
                key = jax.random.fold_in(jax.random.PRNGKey(0), i)
                out, n_new, nxt, new_pos, scache, dcache = \
                    speculative.spec_decode_round(
                        params, draft, tok, pos, scache, dcache, key,
                        temps, tks, tps, config, dconfig, gamma=gamma,
                        interpret=not use_pallas)
                return (nxt, new_pos, scache, dcache,
                        committed + jnp.sum(n_new))
            pos = jnp.full((B,), pos0, jnp.int32)
            return jax.lax.fori_loop(
                0, n, body, (tokens, pos, scache, dcache, jnp.int32(0)))[4]

        t0 = time.time()
        int(multi_round(params, draft, 1, scache, dcache))
        spec_compile_s = time.time() - t0
        print(f"# spec round compiled in {spec_compile_s:.0f}s",
              file=sys.stderr, flush=True)

        def run(n):
            return int(multi_round(params, draft, n, scache, dcache))

        n1, n2 = 4, min(4 + args.steps // 2, max_rounds)
        best1 = best2 = float("inf")
        c1 = c2 = 0
        for _ in range(3):
            t0 = time.time(); c1 = run(n1)
            best1 = min(best1, time.time() - t0)
            t0 = time.time(); c2 = run(n2)
            best2 = min(best2, time.time() - t0)
        committed_tok_s = (c2 - c1) / (best2 - best1)
        acc = (c2 - c1) / ((n2 - n1) * B) - 1
        spec_row = {
            "gamma": gamma, "draft_layers": dl,
            "scale_noise": args.spec_noise,
            "round_ms": round((best2 - best1) / (n2 - n1) * 1000, 2),
            "accepted_per_round": round(acc, 2),
            "acceptance_rate": round(acc / gamma, 3),
            "committed_tok_s": round(committed_tok_s, 1),
            "speedup_vs_plain": round(committed_tok_s / tok_s, 3),
            "compile_s": round(spec_compile_s, 1),
        }
        results["speculative"] = spec_row
        print(f"# spec x mixed: {spec_row}", file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
