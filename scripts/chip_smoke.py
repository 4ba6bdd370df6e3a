"""Compile-smoke every Pallas kernel on the REAL chip (interpret=False).

Round 2's lesson (and ADVICE r2): interpret mode validates math only —
Mosaic lowering failures (block rules, dynamic stores, dot dims,
sub-8-row concats) surface ONLY on a real compile, and two of them
CORRUPTED results silently rather than erroring. This script compiles
each kernel once at small shapes and asserts against its XLA twin /
interpret result, so lowering regressions are caught before a bench run.

Run on the chip after any kernel change:  python scripts/chip_smoke.py
(~2-6 min cold; seconds warm via the compile caches).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from ee274_convexcaldera_llm_quantization_tpu.ops import (
        attention as AT, kernels as Kr)

    backend = jax.devices()[0].platform
    if backend not in ("tpu", "axon"):
        raise SystemExit(f"needs the real chip, got {backend}")
    t_all = time.time()
    checks = []

    def check(name, got, ref, tol):
        got, ref = np.asarray(got), np.asarray(ref)
        rel = (np.linalg.norm(got - ref)
               / max(np.linalg.norm(ref), 1e-12))
        ok = rel <= tol and np.isfinite(got).all()
        checks.append((name, rel, ok))
        print(f"# {name:34s} rel={rel:.2e} {'OK' if ok else 'FAIL'}",
              file=sys.stderr, flush=True)
        assert ok, (name, rel)

    key = jax.random.PRNGKey(0)
    N, K, M = 256, 512, 8
    W = jax.random.normal(key, (N, K), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)

    # grouped bf16 kernel (per-chunk bf16 rounding differs from the
    # twin's whole-matrix cast: bf16 floor is the documented tolerance)
    pk, sc = Kr.pack_for_serving(W, 4)
    check("quantized_matmul (grouped bf16)",
          Kr.quantized_matmul(x, pk, sc, 4),
          Kr.quantized_matmul_xla(x, pk, sc, 4), 1e-2)

    # W4A8 flat + stacked (4-bit and 2-bit grids)
    for bits in (4, 2):
        pk2, rs = Kr.pack_rowscale(W, bits)
        check(f"quantized_matmul_w4a8 ({bits}-bit)",
              Kr.quantized_matmul_w4a8(x, pk2, rs, bits),
              Kr.quantized_matmul_w4a8_xla(x, pk2, rs, bits), 1e-6)
    pk2, rs = Kr.pack_rowscale(W, 4)
    pk_st = jnp.stack([pk2, pk2])
    rs_st = jnp.stack([rs, rs])
    check("quantized_matmul_w4a8_stacked",
          Kr.quantized_matmul_w4a8_stacked(x, pk_st, rs_st,
                                           jnp.int32(1), 4),
          Kr.quantized_matmul_w4a8_xla(x, pk2, rs, 4), 1e-6)

    # L-fused + LR-fused stacked kernels
    r = 128
    Lf = jax.random.randint(jax.random.PRNGKey(2), (2, N, r), -127, 128,
                            jnp.int8)
    Ls = jnp.full((2, N, 1), 3e-4, jnp.float32)
    Rf = jax.random.randint(jax.random.PRNGKey(3), (2, r, K), -127, 128,
                            jnp.int8)
    Rs = jnp.full((2, r, 1), 3e-4, jnp.float32)
    xr = jnp.dot(x.astype(jnp.bfloat16),
                 Rf[1].T.astype(jnp.float32).astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32) * Rs[1][:, 0][None, :]
    base = Kr.quantized_matmul_w4a8_xla(x, pk2, rs, 4)
    ylr = jnp.dot(xr.astype(jnp.bfloat16),
                  Lf[1].T.astype(jnp.float32).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) * Ls[1][:, 0][None, :]
    check("quantized_matmul_w4a8_l_stacked",
          Kr.quantized_matmul_w4a8_l_stacked(
              x, pk_st, rs_st, jnp.int32(1), xr, Lf, Ls, num_bits=4,
              rank=r, splits=(N,)),
          base + ylr, 2e-5)
    check("quantized_matmul_w4a8_lr_stacked",
          Kr.quantized_matmul_w4a8_lr_stacked(
              x, pk_st, rs_st, jnp.int32(1), Rf, Rs, Lf, Ls, num_bits=4,
              rank=r, splits=(N,)),
          base + ylr, 2e-5)

    # flash decode attention: row, staged, all-batch, prefill
    B, KVH, G, D, T = 4, 4, 1, 128, 256
    q = jax.random.normal(jax.random.PRNGKey(4), (B, KVH, G, D))
    kc = jax.random.randint(jax.random.PRNGKey(5), (2, B, KVH, T, D),
                            -127, 128, jnp.int8)
    vc = jax.random.randint(jax.random.PRNGKey(6), (2, B, KVH, T, D),
                            -127, 128, jnp.int8)
    ks = jax.random.uniform(jax.random.PRNGKey(7), (2, B, KVH, T),
                            jnp.float32, 0.005, 0.02)
    vs = jax.random.uniform(jax.random.PRNGKey(8), (2, B, KVH, T),
                            jnp.float32, 0.005, 0.02)
    pos = jnp.asarray([3, 100, 255, 77], jnp.int32)
    lay = jnp.asarray(1, jnp.int32)
    ref = AT.flash_decode_q8_xla(q, kc, vc, ks, vs, lay, pos)
    # attention tolerances: Mosaic's VPU exp approximation differs from
    # the XLA softmax at the ~2e-3 level (corruption shows at >=1e-1)
    check("flash_decode_q8 (row)",
          AT.flash_decode_q8(q, kc, vc, ks, vs, lay, pos), ref, 5e-3)
    kn = jax.random.normal(jax.random.PRNGKey(9), (B, KVH, D))
    vn = jax.random.normal(jax.random.PRNGKey(10), (B, KVH, D))
    staged_ref = AT.flash_decode_q8_staged_xla(q, kc, vc, ks, vs, kn, vn,
                                               lay, pos)
    check("flash_decode_q8_staged",
          AT.flash_decode_q8_staged(q, kc, vc, ks, vs, kn, vn, lay, pos),
          staged_ref, 5e-3)
    check("flash_decode_q8_ab (staged)",
          AT.flash_decode_q8_ab(q, kc, vc, ks, vs, kn, vn, lay, pos,
                                staged=True), staged_ref, 5e-3)
    check("flash_decode_q8_ab (inline)",
          AT.flash_decode_q8_ab(q, kc, vc, ks, vs, kn, vn, lay, pos),
          ref, 5e-3)
    # paged flash decode: pool (L, NP, KVH, P, D), page table prefetch
    NP, PG = 10, 128
    kpool = jax.random.randint(jax.random.PRNGKey(14), (2, NP, KVH, PG, D),
                               -127, 128, jnp.int8)
    vpool = jax.random.randint(jax.random.PRNGKey(15), (2, NP, KVH, PG, D),
                               -127, 128, jnp.int8)
    kps = jax.random.uniform(jax.random.PRNGKey(16), (2, NP, KVH, PG),
                             jnp.float32, 0.005, 0.02)
    vps = jax.random.uniform(jax.random.PRNGKey(17), (2, NP, KVH, PG),
                             jnp.float32, 0.005, 0.02)
    pt = jnp.asarray(np.random.default_rng(0).permutation(NP)[:B * 2]
                     .reshape(B, 2), jnp.int32)
    ppos = jnp.asarray([0, 60, 255, 130], jnp.int32)
    check("flash_decode_q8_paged",
          AT.flash_decode_q8_paged(q, kpool, vpool, kps, vps, kn, vn, lay,
                                   pt, ppos),
          AT.flash_decode_q8_paged_xla(q, kpool, vpool, kps, vps, kn, vn,
                                       lay, pt, ppos), 5e-3)
    S = 128
    qp = jax.random.normal(jax.random.PRNGKey(11), (1, S, KVH, D))
    kp = jax.random.normal(jax.random.PRNGKey(12), (1, S, KVH, D))
    vp = jax.random.normal(jax.random.PRNGKey(13), (1, S, KVH, D))
    from ee274_convexcaldera_llm_quantization_tpu.models import llama
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    mask = jnp.where(causal, 0.0, -1e30)[None, None, None, :, :]
    check("flash_prefill",
          AT.flash_prefill(qp, kp, vp),
          llama._attention(qp, kp, vp, mask), 5e-3)

    # whole-step megakernel: Mosaic vs interpret at tiny-mha
    from bench import build_compressed_llama_params
    from ee274_convexcaldera_llm_quantization_tpu.models import (
        fused as fusedm, persistent)
    from ee274_convexcaldera_llm_quantization_tpu.models.config import (
        PRESETS)
    cfg = PRESETS["tiny-mha"]
    tp = build_compressed_llama_params(cfg, 4, 128, mode="w4a8")
    tp = fusedm.quantize_factors_int8_fused(fusedm.fuse_stacked(tp),
                                            fuse_factor_kernel="l")
    toks = jnp.asarray([1, 3], jnp.int32)
    p2 = jnp.asarray([6, 6], jnp.int32)
    ca = llama.HeadMajorQuantKVCache.create(cfg, 2, 128)
    cb = llama.HeadMajorQuantKVCache.create(cfg, 2, 128)
    lm, cm = persistent.decode_step_persistent(tp, toks, p2, ca, cfg,
                                               staged_kv="on")
    li, ci = persistent.decode_step_persistent(tp, toks, p2, cb, cfg,
                                               staged_kv="on",
                                               interpret=True)
    check("megastep (Mosaic vs interpret)", lm, li, 1e-5)
    assert (np.asarray(cm.k) == np.asarray(ci.k)).all(), \
        "megastep staged codes diverge between Mosaic and interpret"

    n_ok = sum(1 for _, _, ok in checks if ok)
    print(f"# chip smoke: {n_ok}/{len(checks)} kernels OK in "
          f"{time.time() - t_all:.0f}s", file=sys.stderr, flush=True)
    print('{"chip_smoke_ok": %d, "total": %d}' % (n_ok, len(checks)))


if __name__ == "__main__":
    main()
