"""Round-4 unpack experiments: make the 2-bit W4A8 kernel less VPU-bound.

Round-3 measurement (MEASUREMENTS_r3.md): the 2-bit kernel reads HALF the
bytes of the 4-bit kernel in the same time (53.0 vs 57.8 us on the 13B
down_proj shape) — it is VPU-bound on the f=4 plane unpack (~11 i32-lane
ops/byte vs ~5 for f=2). This script probes cheaper unpack strategies on
the real chip:

  probe  - tiny Mosaic kernels testing (a) shifts/masks on int16 vectors,
           (b) shifts/masks on uint8 vectors directly, (c) native uint4
           array refs + astype(int8), (d) native uint2 array refs,
           (e) in-kernel bitcast uint8 -> (4x) uint2.  Each prints
           OK/FAIL + correctness; interpret mode hides Mosaic legality,
           so everything compiles interpret=False on the chip.
  micro  - slope-timed microbench of full W4A8 stacked matmuls at the
           13B down_proj shape (N=5120, K=13824) for the baseline 4-bit
           and 2-bit kernels plus each unpack variant that probed OK.

Usage: python scripts/exp_r4_unpack.py --phases probe
       python scripts/exp_r4_unpack.py --phases micro
"""

import argparse
import functools
import json
import os
import sys
import time
import traceback

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
    ap.add_argument("--phases", default="probe")
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    backend = jax.devices()[0].platform
    interpret = backend not in ("tpu", "axon")
    phases = args.phases.split(",")
    results = {}

    def report(tag, ok, detail=""):
        results[tag] = {"ok": bool(ok), "detail": str(detail)[:300]}
        print(f"# probe {tag}: {'OK' if ok else 'FAIL'} {detail}",
              file=sys.stderr, flush=True)

    if "probe" in phases:
        N, C = 256, 512
        rng = np.random.default_rng(0)
        by = rng.integers(0, 256, (N, C), dtype=np.uint8)
        by_j = jnp.asarray(by)

        # ---- (a) int16 shift/mask ----
        def k_i16(w_ref, o_ref):
            c = w_ref[:].astype(jnp.int16)
            u = ((c >> 4) & 15).astype(jnp.int8)
            o_ref[:] = u

        try:
            out = pl.pallas_call(
                k_i16, out_shape=jax.ShapeDtypeStruct((N, C), jnp.int8),
                interpret=interpret)(by_j)
            exp = ((by.astype(np.int32) >> 4) & 15).astype(np.int8)
            ok = (np.asarray(out) == exp).all()
            report("i16_shift", ok, "exact" if ok else "MISMATCH")
        except Exception as e:
            report("i16_shift", False, repr(e))

        # ---- (b) uint8 shift/mask directly ----
        def k_u8(w_ref, o_ref):
            c = w_ref[:]
            u = ((c >> 4) & 15).astype(jnp.int8)
            o_ref[:] = u

        try:
            out = pl.pallas_call(
                k_u8, out_shape=jax.ShapeDtypeStruct((N, C), jnp.int8),
                interpret=interpret)(by_j)
            exp = ((by.astype(np.int32) >> 4) & 15).astype(np.int8)
            ok = (np.asarray(out) == exp).all()
            report("u8_shift", ok, "exact" if ok else "MISMATCH")
        except Exception as e:
            report("u8_shift", False, repr(e))

        # ---- (c) native uint4 ref + astype(int8) ----
        u4 = rng.integers(0, 16, (N, C), dtype=np.uint8)
        try:
            u4_j = jnp.asarray(u4).astype(jnp.uint4)

            def k_u4(w_ref, o_ref):
                o_ref[:] = w_ref[:].astype(jnp.int8)

            out = pl.pallas_call(
                k_u4, out_shape=jax.ShapeDtypeStruct((N, C), jnp.int8),
                interpret=interpret)(u4_j)
            ok = (np.asarray(out) == u4.astype(np.int8)).all()
            report("u4_ref_astype", ok, "exact" if ok else "MISMATCH")
        except Exception as e:
            report("u4_ref_astype", False, repr(e))

        # ---- (c2) native int4 ref + astype(int8) ----
        s4 = rng.integers(-8, 8, (N, C), dtype=np.int8)
        try:
            s4_j = jnp.asarray(s4).astype(jnp.int4)

            def k_s4(w_ref, o_ref):
                o_ref[:] = w_ref[:].astype(jnp.int8)

            out = pl.pallas_call(
                k_s4, out_shape=jax.ShapeDtypeStruct((N, C), jnp.int8),
                interpret=interpret)(s4_j)
            ok = (np.asarray(out) == s4).all()
            report("s4_ref_astype", ok, "exact" if ok else "MISMATCH")
        except Exception as e:
            report("s4_ref_astype", False, repr(e))

        # ---- (c3) int4 ref fed straight to the MXU (dot vs int8) ----
        try:
            s4_j = jnp.asarray(s4).astype(jnp.int4)
            xs = rng.integers(-127, 128, (8, N), dtype=np.int8)

            def k_s4dot(x_ref, w_ref, o_ref):
                o_ref[:] = jax.lax.dot_general(
                    x_ref[:], w_ref[:].astype(jnp.int8),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

            out = pl.pallas_call(
                k_s4dot, out_shape=jax.ShapeDtypeStruct((8, C), jnp.int32),
                interpret=interpret)(jnp.asarray(xs), s4_j)
            exp = xs.astype(np.int32) @ s4.astype(np.int32)
            ok = (np.asarray(out) == exp).all()
            report("s4_dot", ok, "exact" if ok else "MISMATCH")
        except Exception as e:
            report("s4_dot", False, repr(e))

        # ---- (d) native uint2 ref + astype(int8) ----
        u2 = rng.integers(0, 4, (N, C), dtype=np.uint8)
        try:
            u2_j = jnp.asarray(u2).astype(jnp.uint2)

            def k_u2(w_ref, o_ref):
                o_ref[:] = w_ref[:].astype(jnp.int8)

            out = pl.pallas_call(
                k_u2, out_shape=jax.ShapeDtypeStruct((N, C), jnp.int8),
                interpret=interpret)(u2_j)
            ok = (np.asarray(out) == u2.astype(np.int8)).all()
            report("u2_ref_astype", ok, "exact" if ok else "MISMATCH")
        except Exception as e:
            report("u2_ref_astype", False, repr(e))

        # ---- (e) in-kernel bitcast u8 -> 4x u2 ----
        try:
            def k_bc(w_ref, o_ref):
                c = w_ref[:]                       # (N, C) u8
                v = jax.lax.bitcast_convert_type(c, jnp.uint2)  # (N, C, 4)?
                o_ref[:] = v.reshape(c.shape[0], -1).astype(jnp.int8)

            out = pl.pallas_call(
                k_bc, out_shape=jax.ShapeDtypeStruct((N, 4 * C), jnp.int8),
                interpret=interpret)(by_j)
            # expected order: bitcast of little-endian byte -> bits [0:2]
            # first (LSB-first code order)
            exp = np.stack([(by >> (2 * i)) & 3 for i in range(4)],
                           axis=-1).reshape(N, -1).astype(np.int8)
            ok = (np.asarray(out) == exp).all()
            report("u8_bitcast_u2", ok, "exact" if ok else "MISMATCH")
        except Exception as e:
            report("u8_bitcast_u2", False, repr(e))

        # ---- (f) i16 bitcast from pairs: u8 -> i16 with 2 bytes/lane ----
        try:
            def k_bc16(w_ref, o_ref):
                c = w_ref[:]
                v = jax.lax.bitcast_convert_type(c, jnp.uint4)  # (N, C, 2)
                o_ref[:] = v.reshape(c.shape[0], -1).astype(jnp.int8)

            out = pl.pallas_call(
                k_bc16, out_shape=jax.ShapeDtypeStruct((N, 2 * C), jnp.int8),
                interpret=interpret)(by_j)
            exp = np.stack([by & 15, by >> 4],
                           axis=-1).reshape(N, -1).astype(np.int8)
            ok = (np.asarray(out) == exp).all()
            report("u8_bitcast_u4", ok, "exact" if ok else "MISMATCH")
        except Exception as e:
            report("u8_bitcast_u4", False, repr(e))

    if "micro" in phases:
        from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as KK

        # 13B down_proj shape
        N, K, Lk, M = 5120, 13824, 8, 8
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)

        def bench_stacked(tag, fn, packed, scales, bytes_per_call):
            @jax.jit
            def many(x, packed, scales, n):
                def body(i, carry):
                    x, acc = carry
                    out = fn(x, packed, scales, i % Lk)
                    # dependency chain: next call's input depends on this
                    # output (forces serialization under the deferred relay)
                    return x + acc * 1e-30, acc + jnp.sum(out) * 1e-9
                return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]
            t0 = time.time()
            float(many(x, packed, scales, 1))
            cs = time.time() - t0
            dt = slope(lambda n: float(many(x, packed, scales, n)), 32, 512,
                       reps=5)
            gbs = bytes_per_call / dt / 1e9
            results[f"{tag}_us"] = round(dt * 1e6, 2)
            results[f"{tag}_gbs"] = round(gbs, 1)
            print(f"# {tag}: {dt * 1e6:.1f} us/call ({gbs:.0f} GB/s packed, "
                  f"{bytes_per_call / 1e6:.1f} MB/call) [compile {cs:.0f}s]",
                  file=sys.stderr, flush=True)

        for bits in (4, 2):
            f = 8 // bits
            W = rng.standard_normal((Lk, N, K)).astype(np.float32) * 0.02
            packed = []
            scales = []
            for l in range(Lk):
                p, s = KK.pack_rowscale(jnp.asarray(W[l]), bits)
                packed.append(p)
                scales.append(s)
            packed = jnp.stack(packed)
            scales = jnp.stack(scales)
            fn = functools.partial(
                KK.quantized_matmul_w4a8_stacked, num_bits=bits,
                interpret=interpret)
            bench_stacked(f"w{bits}_base", fn, packed, scales, N * K // f)
            fn512 = functools.partial(
                KK.quantized_matmul_w4a8_stacked, num_bits=bits,
                block_n=512, interpret=interpret)
            bench_stacked(f"w{bits}_bn512", fn512, packed, scales,
                          N * K // f)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
