"""Round-2 perf experiments, batched into ONE process (the relay charges
~4 min of warmup to the first compile of each process; in-process
follow-up compiles take seconds).

Phases (select with --phases, comma-separated):
  factor   - decode step A/B: factor_kernel "xla" vs "l"
  kvwrite  - decode step with flash attention but NO cache writes
             (isolates the per-row dynamic_update_slice cost; numerics
             are garbage, timing is valid)
  blockn   - packed-kernel microbench: block_n 256 vs 512 at the
             gate/up and down shapes
  staged   - decode_step_fused A/B: staged_kv False vs True (batched
             staging-commit KV writes vs 1024 inline update-slices)
  mlp      - decode_step_fused A/B: mlp_kernel False vs True (whole-MLP
             megakernel: gate/up + silu-mul + requant + down, one launch)
             incl. an on-chip single-step logits cross-check
  attno    - decode_step_fused A/B: attn_o_kernel False vs True (fused
             flash attention + o_proj megakernel), on-chip cross-check
  combo    - decode_step_fused with ALL wins on (staged + mlp + attno):
             the candidate headline config
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--context", type=int, default=256)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--phases", default="factor,kvwrite,blockn")
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
    backend = jax.devices()[0].platform
    use_pallas = backend in ("tpu", "axon")
    phases = args.phases.split(",")
    results = {}

    t0 = time.time()
    base = build_compressed_llama_params(config, args.bits, args.rank,
                                         mode="w4a8")
    base = fusedm.fuse_stacked(base)
    jax.block_until_ready(base.embed)
    print(f"# params built in {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    tokens = jnp.zeros((B,), jnp.int32)
    pos0 = args.context // 2

    def decode_bench(params, skip_kv_writes=False):
        cache = llama.HeadMajorQuantKVCache.create(config, B, args.context)
        kv_groups = config.num_heads // config.num_kv_heads

        def step(params, tok, pos, cache):
            lp = params.layers          # from the jitted argument, NOT a
            x = params.embed[tok].astype(jnp.float32)   # closure constant
            cos, sin = llama.rope_tables(config, pos[:, None])

            def body(l, carry):
                x, cache = carry
                an = jax.lax.dynamic_index_in_dim(lp.attn_norm, l, 0,
                                                  keepdims=False)
                y = llama.rms_norm(x[:, None, :], an,
                                   config.rms_norm_eps)[:, 0]
                q, k, v = fusedm._apply_fused(lp.qkv, l, y,
                                              not use_pallas)
                q = q.reshape(B, 1, config.num_heads, config.head_dim)
                k = k.reshape(B, 1, config.num_kv_heads, config.head_dim)
                v = v.reshape(B, 1, config.num_kv_heads, config.head_dim)
                q = llama.apply_rope(q, cos, sin)
                k = llama.apply_rope(k, cos, sin)
                kq, ksc = llama.quantize_kv(k[:, 0])
                vq, vsc = llama.quantize_kv(v[:, 0])
                ck, cv, cks, cvs = cache
                if not skip_kv_writes:
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
                else:
                    # keep the quantized values alive so XLA cannot DCE
                    # the quantize work being measured
                    x = x + 1e-30 * (jnp.sum(kq) + jnp.sum(vq))
                cache = llama.HeadMajorQuantKVCache(ck, cv, cks, cvs)
                qh = q[:, 0].reshape(B, config.num_kv_heads, kv_groups,
                                     config.head_dim)
                attn = AT.flash_decode_q8(
                    qh, cache.k, cache.v, cache.k_scale, cache.v_scale,
                    l, pos, interpret=not use_pallas).reshape(
                    B, config.q_dim)
                x = x + fusedm._apply_plain(lp.o_proj, l, attn,
                                            not use_pallas,
                                            lp.qkv.factor_kernel)
                mn = jax.lax.dynamic_index_in_dim(lp.mlp_norm, l, 0,
                                                  keepdims=False)
                y = llama.rms_norm(x[:, None, :], mn,
                                   config.rms_norm_eps)[:, 0]
                gate, up = fusedm._apply_fused(lp.gateup, l, y,
                                               not use_pallas)
                x = x + fusedm._apply_plain(lp.down_proj, l,
                                            jax.nn.silu(gate) * up,
                                            not use_pallas,
                                            lp.qkv.factor_kernel)
                return x, cache

            x, cache = jax.lax.fori_loop(0, config.num_layers, body,
                                         (x, cache))
            logits = llama._logits(
                x[:, None, :],
                llama.ModelParams(params.embed, [], params.final_norm,
                                  params.lm_head),
                config, False, not use_pallas)
            return logits[:, 0, :], cache

        @jax.jit
        def multi_step(params, n, cache):
            def body(i, carry):
                cache, tok, acc = carry
                pos = jnp.full((B,), pos0 + i, jnp.int32)
                logits, cache = step(params, tok, pos, cache)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return cache, tok, acc + jnp.sum(logits) * jnp.float32(1e-9)
            return jax.lax.fori_loop(0, n, body,
                                     (cache, tokens, jnp.float32(0)))[2]

        t0 = time.time()
        float(multi_step(params, 1, cache))
        compile_s = time.time() - t0
        dt = slope(lambda n: float(multi_step(params, n, cache)),
                   8, 8 + args.steps)
        return dt * 1000, compile_s

    if "factor" in phases:
        for fk in ("xla", "l"):
            params = fusedm.quantize_factors_int8_fused(
                base, fuse_factor_kernel=fk)
            ms, cs = decode_bench(params)
            results[f"decode_factor_{fk}_ms"] = round(ms, 3)
            print(f"# factor={fk}: {ms:.2f} ms/step ({B / ms * 1000:.0f} "
                  f"tok/s)  [compile {cs:.0f}s]", file=sys.stderr,
                  flush=True)

    if "kvwrite" in phases:
        params = fusedm.quantize_factors_int8_fused(base,
                                                    fuse_factor_kernel="l")
        ms, cs = decode_bench(params, skip_kv_writes=True)
        results["decode_no_kvwrite_ms"] = round(ms, 3)
        print(f"# no-kvwrite: {ms:.2f} ms/step  [compile {cs:.0f}s]",
              file=sys.stderr, flush=True)

    def fused_ab(tag, fk="l", **kw):
        """Slope-timed decode with decode_step_fused(**kw) variants."""
        params = fusedm.quantize_factors_int8_fused(base,
                                                    fuse_factor_kernel=fk)
        cache = llama.HeadMajorQuantKVCache.create(config, B, args.context)

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

    def crosscheck(tag, **kw):
        """One real (Mosaic) step, logits vs the plain fused step."""
        import numpy as np
        params = fusedm.quantize_factors_int8_fused(base,
                                                    fuse_factor_kernel="l")
        ca = llama.HeadMajorQuantKVCache.create(config, B, args.context)
        cb = llama.HeadMajorQuantKVCache.create(config, B, args.context)
        pos1 = jnp.full((B,), pos0, jnp.int32)
        la, _ = fusedm.decode_step_fused(params, tokens, pos1, ca, config,
                                         interpret=not use_pallas)
        lb, _ = fusedm.decode_step_fused(params, tokens, pos1, cb, config,
                                         interpret=not use_pallas, **kw)
        la, lb = np.asarray(la), np.asarray(lb)
        rel = np.linalg.norm(lb - la) / max(np.linalg.norm(la), 1e-9)
        results[f"{tag}_logits_rel"] = float(rel)
        print(f"# {tag} on-chip logits rel diff: {rel:.2e}",
              file=sys.stderr, flush=True)
        assert rel < 1e-2, rel

    if "staged" in phases:
        fused_ab("staged_False")
        fused_ab("staged_True", staged_kv=True)
        fused_ab("staged_uniform", staged_kv="uniform")

    if "mlp" in phases:
        crosscheck("mlp", mlp_kernel=True)
        if "staged" not in phases:
            fused_ab("mlp_False")
        fused_ab("mlp_True", mlp_kernel=True)

    if "attno" in phases:
        crosscheck("attno", attn_o_kernel=True)
        fused_ab("attno_True", attn_o_kernel=True)

    if "anatomy" in phases:
        # Attribute the gap above the weight-read roofline by stripping
        # one subsystem at a time (numerics garbage, timing valid: every
        # variant keeps a data dependence from all live compute to the
        # readback scalar). All variants: fk=xla, head-major cache.
        import numpy as np
        params = fusedm.quantize_factors_int8_fused(base,
                                                    fuse_factor_kernel="xla")
        kv_groups = config.num_heads // config.num_kv_heads

        def step(params, tok, pos, cache, *, attn_on=True, kv_on=True,
                 norms_on=True, logits_on=True):
            lp = params.layers
            x = params.embed[tok].astype(jnp.float32)
            cos, sin = llama.rope_tables(config, pos[:, None])

            def body(l, carry):
                x, cache = carry
                if norms_on:
                    an = jax.lax.dynamic_index_in_dim(lp.attn_norm, l, 0,
                                                      keepdims=False)
                    y = llama.rms_norm(x[:, None, :], an,
                                       config.rms_norm_eps)[:, 0]
                else:
                    y = x
                q, k, v = fusedm._apply_fused(lp.qkv, l, y, not use_pallas)
                q = q.reshape(B, 1, config.num_heads, config.head_dim)
                k = k.reshape(B, 1, config.num_kv_heads, config.head_dim)
                v = v.reshape(B, 1, config.num_kv_heads, config.head_dim)
                if norms_on:
                    q = llama.apply_rope(q, cos, sin)
                    k = llama.apply_rope(k, cos, sin)
                if kv_on:
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
                else:
                    # keep k/v live without touching the cache
                    x = x + 1e-30 * (jnp.sum(k) + jnp.sum(v))
                if attn_on:
                    qh = q[:, 0].reshape(B, config.num_kv_heads, kv_groups,
                                         config.head_dim)
                    attn = AT.flash_decode_q8(
                        qh, cache.k, cache.v, cache.k_scale, cache.v_scale,
                        l, pos, interpret=not use_pallas).reshape(
                        B, config.q_dim)
                else:
                    attn = q[:, 0].reshape(B, config.q_dim)
                x = x + fusedm._apply_plain(lp.o_proj, l, attn,
                                            not use_pallas, "xla")
                if norms_on:
                    mn = jax.lax.dynamic_index_in_dim(lp.mlp_norm, l, 0,
                                                      keepdims=False)
                    y = llama.rms_norm(x[:, None, :], mn,
                                       config.rms_norm_eps)[:, 0]
                else:
                    y = x
                gate, up = fusedm._apply_fused(lp.gateup, l, y,
                                               not use_pallas)
                x = x + fusedm._apply_plain(lp.down_proj, l,
                                            jax.nn.silu(gate) * up,
                                            not use_pallas, "xla")
                return x, cache

            x, cache = jax.lax.fori_loop(0, config.num_layers, body,
                                         (x, cache))
            if logits_on:
                logits = llama._logits(
                    x[:, None, :],
                    llama.ModelParams(params.embed, [], params.final_norm,
                                      params.lm_head),
                    config, False, not use_pallas)
                return logits[:, 0, :], cache
            return x[:, :256] * 1e-9, cache      # keep x live, skip head

        def run_variant(tag, **flags):
            cache = llama.HeadMajorQuantKVCache.create(config, B,
                                                       args.context)

            @jax.jit
            def multi(params, n, cache):
                def bd(i, carry):
                    cache, tok, acc = carry
                    pos = jnp.full((B,), pos0 + i, jnp.int32)
                    out, cache = step(params, tok, pos, cache, **flags)
                    tok = jnp.remainder(
                        jnp.asarray(jnp.sum(out, axis=-1) * 1e6,
                                    jnp.int32), config.vocab_size)
                    return cache, tok, acc + jnp.sum(out) * 1e-9
                return jax.lax.fori_loop(
                    0, n, bd, (cache, tokens, jnp.float32(0)))[2]

            t0 = time.time()
            float(multi(params, 1, cache))
            cs = time.time() - t0
            dt = slope(lambda n: float(multi(params, n, cache)),
                       8, 8 + args.steps)
            results[f"anatomy_{tag}_ms"] = round(dt * 1000, 3)
            print(f"# anatomy {tag}: {dt * 1000:.2f} ms/step  "
                  f"[compile {cs:.0f}s]", file=sys.stderr, flush=True)

        run_variant("full")
        run_variant("no_attn", attn_on=False)
        run_variant("no_kv", kv_on=False)
        run_variant("no_attn_no_kv", attn_on=False, kv_on=False)
        run_variant("no_norms", norms_on=False)
        run_variant("no_logits", logits_on=False)
        run_variant("matmuls_only", attn_on=False, kv_on=False,
                    norms_on=False, logits_on=False)

    if "best" in phases:
        # headline candidates: factor path x staged-KV, measured e2e
        fused_ab("xla_inline", fk="xla")
        fused_ab("xla_staged", fk="xla", staged_kv=True)
        fused_ab("xla_staged_uniform", fk="xla", staged_kv="uniform")
        fused_ab("l_staged_direct", fk="l", staged_kv=True)
        fused_ab("xla_staged_attno", fk="xla", staged_kv=True,
                 attn_o_kernel=True)

    if "attnbf16" in phases:
        fused_ab("xla_stagedu_abf16", fk="xla", staged_kv="uniform",
                 attn_dots="bf16")

    if "launch" in phases:
        # fixed per-pallas_call overhead: trivial kernel launched in a
        # dependent chain; slope = launch floor. Also a 1 MB-DMA kernel
        # to separate fixed overhead from pipeline fill.
        from jax.experimental import pallas as pl

        def tiny_kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1.0

        for tag, shape in (("tiny", (8, 128)), ("mb1", (1024, 1024))):
            x = jnp.zeros(shape, jnp.float32)

            @jax.jit
            def many(x, n):
                def body(i, x):
                    return pl.pallas_call(
                        tiny_kernel,
                        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                    )(x)
                return jax.lax.fori_loop(0, n, body, x)

            t0 = time.time()
            float(many(x, 1)[0, 0])
            cs = time.time() - t0
            dt = slope(lambda n: float(many(x, n)[0, 0]), 64, 1064)
            results[f"launch_{tag}_us"] = round(dt * 1e6, 2)
            print(f"# launch {tag} {shape}: {dt * 1e6:.2f} us/call  "
                  f"[compile {cs:.0f}s]", file=sys.stderr, flush=True)

        # XLA-op floor for comparison: a dependent chain of trivial
        # XLA adds (fusions), same protocol
        x = jnp.zeros((8, 128), jnp.float32)

        @jax.jit
        def manyx(x, n):
            def body(i, x):
                return x * 1.0000001 + 1e-9
            return jax.lax.fori_loop(0, n, body, x)

        float(manyx(x, 1)[0, 0])
        dt = slope(lambda n: float(manyx(x, n)[0, 0]), 64, 1064)
        results["xla_op_us"] = round(dt * 1e6, 2)
        print(f"# xla trivial fusion: {dt * 1e6:.2f} us/op",
              file=sys.stderr, flush=True)

    if "projmicro" in phases:
        # per-projection stacked-kernel cost at decode shapes, dependent
        # chain over layers (cycling the layer index so weight slabs
        # always stream from HBM), vs the NON-stacked kernel at the same
        # shape — isolates any pipelining loss from scalar-prefetch
        # indexed BlockSpecs
        import numpy as np
        rng = np.random.default_rng(0)
        h, im = config.hidden_size, config.intermediate_size
        shapes = {"qkv": (config.q_dim + 2 * config.kv_dim, h),
                  "o": (h, config.q_dim),
                  "gateup": (2 * im, h),
                  "down": (h, im)}
        Lk = config.num_layers
        for name, (N, K_) in shapes.items():
            pk = jax.jit(lambda: jax.random.bits(
                jax.random.PRNGKey(0), (Lk, N, K_ // 2), jnp.uint8),
                static_argnums=())()
            sc = jnp.full((Lk, N, 1), 1e-3, jnp.float32)
            x = jnp.asarray(rng.standard_normal((B, K_)), jnp.float32)

            @jax.jit
            def many_st(x, n, pk=pk, sc=sc, K_=K_):
                def body(i, acc):
                    y = Kr.quantized_matmul_w4a8_stacked(
                        x + acc * 1e-30, pk, sc, jnp.int32(0), 4)
                    return acc + jnp.sum(y) * 1e-9
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            float(many_st(x, 1))
            dt = slope(lambda n: float(many_st(x, n)), 16, 144)
            gbs = (N * K_ // 2) / dt / 1e9
            results[f"proj_{name}_stacked_us"] = round(dt * 1e6, 2)
            print(f"# proj {name} stacked: {dt * 1e6:.1f} us "
                  f"({gbs:.0f} GB/s packed)", file=sys.stderr, flush=True)

            pk0, sc0 = pk[0], sc[0]

            @jax.jit
            def many_flat(x, n, pk0=pk0, sc0=sc0):
                def body(i, acc):
                    y = Kr.quantized_matmul_w4a8(
                        x + acc * 1e-30, pk0, sc0, 4)
                    return acc + jnp.sum(y) * 1e-9
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            float(many_flat(x, 1))
            dt2 = slope(lambda n: float(many_flat(x, n)), 16, 144)
            gbs2 = (N * K_ // 2) / dt2 / 1e9
            results[f"proj_{name}_flat_us"] = round(dt2 * 1e6, 2)
            print(f"# proj {name} flat:    {dt2 * 1e6:.1f} us "
                  f"({gbs2:.0f} GB/s packed)", file=sys.stderr, flush=True)

    if "head" in phases:
        fused_ab("xla_stagedu_abf16_head", fk="xla", staged_kv="uniform",
                 attn_dots="bf16", head_pallas=True)

    if "combo" in phases:
        crosscheck("combo", staged_kv="uniform", mlp_kernel=True,
                   attn_o_kernel=True)
        fused_ab("combo_all", staged_kv="uniform", mlp_kernel=True,
                 attn_o_kernel=True)
        fused_ab("combo_raggedpos", staged_kv=True, mlp_kernel=True,
                 attn_o_kernel=True)

    if "blockn" in phases:
        import numpy as np
        rng = np.random.default_rng(0)
        h, im = config.hidden_size, config.intermediate_size
        for (name, N, K_) in (("gateup", 2 * im, h), ("down", h, im)):
            pk = jax.device_put(jnp.asarray(
                rng.integers(0, 255, (N, K_ // 2)), jnp.uint8))
            sc = jnp.full((N, 1), 1e-3, jnp.float32)
            x = jnp.asarray(rng.standard_normal((B, K_)), jnp.float32)
            for bn in (256, 512):
                @jax.jit
                def many(x, n):
                    def body(i, acc):
                        y = Kr.quantized_matmul_w4a8(
                            x + acc * 1e-30, pk, sc, 4, block_n=bn)
                        return acc + jnp.sum(y) * 1e-9
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0))
                float(many(x, 1))
                dt = slope(lambda n: float(many(x, n)), 8, 72)
                gbs = (N * K_ // 2) / dt / 1e9
                results[f"qmm_{name}_bn{bn}_us"] = round(dt * 1e6, 2)
                print(f"# qmm {name} block_n={bn}: {dt * 1e6:.1f} us "
                      f"({gbs:.0f} GB/s packed)", file=sys.stderr,
                      flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
