"""Kernel tests: serving-layout pack/dequant, Pallas fused dequant-matmul vs
its XLA twin (interpret mode on CPU), and the fast Walsh-Hadamard transform."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as K

RNG = np.random.default_rng(7)


def rand(n, k, scale=0.1):
    return jnp.asarray(RNG.normal(size=(n, k)).astype(np.float32) * scale)


class TestServingLayout:
    @pytest.mark.parametrize("bits", [2, 4, 8])
    def test_pack_dequant_error_bounded(self, bits):
        W = rand(128, 512)
        packed, scales = K.pack_for_serving(W, bits)
        G = K.resolve_group(bits, 512, None)
        assert packed.shape == (128, 512 * bits // 8)
        assert scales.shape == (128, 512 // G)
        W_hat = K.dequant_serving_xla(packed, scales, bits).astype(jnp.float32)
        # |error| <= scale/2 per element + bf16 rounding of the dequantized
        # value (half-spacing 2^-8 relative, magnitude up to scale * maxq)
        maxq = 2 ** (bits - 1) - 1
        err = np.abs(np.asarray(W_hat - W)).reshape(128, 512 // G, G)
        bound = np.asarray(scales)[..., None] * (0.5 + maxq * 2 ** -8) + 1e-6
        assert np.all(err <= bound)

    def test_pack_8bit_high_fidelity(self):
        W = rand(64, 256)
        packed, scales = K.pack_for_serving(W, 8)
        W_hat = K.dequant_serving_xla(packed, scales, 8).astype(jnp.float32)
        rel = float(jnp.linalg.norm(W_hat - W) / jnp.linalg.norm(W))
        assert rel < 0.01

    def test_bad_group_size_raises(self):
        # 64 does not divide K/f = 50 for K=100 at 4-bit
        with pytest.raises(ValueError):
            K.pack_for_serving(rand(8, 100), 4, group_size=64)


class TestQuantizedMatmul:
    @pytest.mark.parametrize("bits", [2, 4, 8])
    def test_pallas_matches_xla_twin(self, bits):
        W = rand(128, 512)
        x = rand(16, 512, scale=1.0)
        packed, scales = K.pack_for_serving(W, bits)
        y_ref = K.quantized_matmul_xla(x, packed, scales, bits)
        y = K.quantized_matmul(x, packed, scales, bits, interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-2, atol=2e-2)

    def test_matches_dense_float_matmul(self):
        W = rand(128, 512)
        x = rand(4, 512, scale=1.0)
        packed, scales = K.pack_for_serving(W, 8)
        y = K.quantized_matmul(x, packed, scales, 8, interpret=True)
        y_dense = np.asarray(x) @ np.asarray(W).T
        # bf16 activations (rel ~2^-9) accumulated over K=512 set the floor
        np.testing.assert_allclose(np.asarray(y), y_dense, rtol=0.05,
                                   atol=0.08)

    def test_m_padding(self):
        # M not a multiple of the tile size must still work
        W = rand(128, 256)
        x = rand(3, 256, scale=1.0)
        packed, scales = K.pack_for_serving(W, 4)
        y = K.quantized_matmul(x, packed, scales, 4, interpret=True)
        y_ref = K.quantized_matmul_xla(x, packed, scales, 4)
        assert y.shape == (3, 128)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-2, atol=2e-2)

    def test_multi_k_group_accumulation(self):
        # K spanning several grid steps exercises the accumulator init/add
        W = rand(128, 1024)
        x = rand(8, 1024, scale=1.0)
        packed, scales = K.pack_for_serving(W, 4)  # 4 k-groups of 256
        y = K.quantized_matmul(x, packed, scales, 4, interpret=True)
        y_ref = K.quantized_matmul_xla(x, packed, scales, 4)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-2, atol=2e-2)


class TestFusedQLR:
    def test_fused_matches_dense_reconstruction(self):
        N, Kdim, r = 128, 512, 16
        Q = rand(N, Kdim)
        L = rand(N, r, scale=0.3)
        R = rand(r, Kdim, scale=0.3)
        x = rand(8, Kdim, scale=1.0)
        packed, scales = K.pack_for_serving(Q, 4)
        y = K.fused_qlr_matmul(x, packed, scales, L, R, 4, global_scale=2.0,
                               use_pallas=True, interpret=True)
        Q_hat = np.asarray(K.dequant_serving_xla(packed, scales, 4),
                           dtype=np.float32)
        W_dense = 2.0 * (Q_hat + np.asarray(L) @ np.asarray(R))
        y_ref = np.asarray(x) @ W_dense.T
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=0.05, atol=0.25)


class TestHadamard:
    def test_fwht_matches_dense_hadamard(self):
        from scipy.linalg import hadamard
        x = rand(4, 64, scale=1.0)
        H = hadamard(64).astype(np.float32)
        np.testing.assert_allclose(np.asarray(K.fwht(x)), np.asarray(x) @ H,
                                   rtol=1e-4, atol=1e-4)

    def test_fwht_involution(self):
        x = rand(8, 128, scale=1.0)
        y = K.fwht(K.fwht(x)) / 128.0
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4,
                                   atol=1e-5)

    def test_sandwich_round_trip_nonpow2(self):
        W = rand(96, 56, scale=1.0)  # forces padding to 128 x 64
        A, m2, n2 = K.hadamard_sandwich(W)
        assert A.shape == (128, 64)
        W_back = K.hadamard_unsandwich(A, 96, 56)
        np.testing.assert_allclose(np.asarray(W_back), np.asarray(W),
                                   rtol=1e-4, atol=1e-5)

    def test_non_pow2_raises(self):
        with pytest.raises(ValueError):
            K.fwht(jnp.ones((2, 48)))


class TestLRStackedFused:
    """quantized_matmul_w4a8_lr_stacked: packed matmul + low-rank factor
    path in ONE kernel must match the composition of the unfused pieces."""

    def _build(self, rng, layers, splits, K_, r):
        sumN, sumR = sum(splits), len(splits) * r
        W = jnp.asarray(rng.standard_normal((layers, sumN, K_)), jnp.float32)
        pk, sc = jax.vmap(lambda w: K.pack_rowscale(w, 4))(W)
        Rb = jnp.asarray(rng.standard_normal((layers, sumR, K_)) * 0.05,
                         jnp.float32)
        Lb = jnp.asarray(rng.standard_normal((layers, sumN, r)) * 0.05,
                         jnp.float32)
        R8, Rs = K.quantize_int8_rowwise(Rb)
        L8, Ls = K.quantize_int8_rowwise(Lb)
        return pk, sc, R8, Rs, L8, Ls

    def _reference(self, x, pk, sc, R8, Rs, L8, Ls, l, splits, r):
        yq = K.quantized_matmul_w4a8_stacked(x, pk, sc, l, 4, interpret=True)
        refs, offn = [], 0
        for i, N_i in enumerate(splits):
            ylr = K.low_rank_matmul(
                x, L8[l, offn:offn + N_i], R8[l, i * r:(i + 1) * r],
                Ls[l, offn:offn + N_i], Rs[l, i * r:(i + 1) * r])
            refs.append(yq[:, offn:offn + N_i] + ylr)
            offn += N_i
        return jnp.concatenate(refs, axis=1)

    def test_multi_projection_matches_unfused(self):
        rng = np.random.default_rng(0)
        splits, r, K_ = (512, 256, 256), 128, 512
        pk, sc, R8, Rs, L8, Ls = self._build(rng, 3, splits, K_, r)
        x = jnp.asarray(rng.standard_normal((8, K_)), jnp.float32)
        out = K.quantized_matmul_w4a8_lr_stacked(
            x, pk, sc, jnp.asarray(1), R8, Rs, L8, Ls, num_bits=4, rank=r,
            splits=splits, interpret=True)
        ref = self._reference(x, pk, sc, R8, Rs, L8, Ls, 1, splits, r)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 1e-5

    def test_single_projection_any_rank(self):
        rng = np.random.default_rng(1)
        splits, r, K_ = (512,), 24, 256
        pk, sc, R8, Rs, L8, Ls = self._build(rng, 2, splits, K_, r)
        x = jnp.asarray(rng.standard_normal((3, K_)), jnp.float32)
        out = K.quantized_matmul_w4a8_lr_stacked(
            x, pk, sc, jnp.asarray(0), R8, Rs, L8, Ls, num_bits=4, rank=r,
            splits=splits, interpret=True)
        ref = self._reference(x, pk, sc, R8, Rs, L8, Ls, 0, splits, r)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 1e-5

    def _xr(self, x, R8, Rs, l, splits, r):
        import jax.numpy as jnp
        xr = jnp.dot(x.astype(jnp.bfloat16), R8[l].T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        return xr * Rs[l][:, 0][None, :]

    def test_l_only_multi_projection_matches_unfused(self):
        # L-half fused, xr supplied by the caller (the "l" factor path)
        rng = np.random.default_rng(2)
        splits, r, K_ = (512, 256, 256), 128, 512
        pk, sc, R8, Rs, L8, Ls = self._build(rng, 3, splits, K_, r)
        x = jnp.asarray(rng.standard_normal((8, K_)), jnp.float32)
        xr = self._xr(x, R8, Rs, 1, splits, r)
        out = K.quantized_matmul_w4a8_l_stacked(
            x, pk, sc, jnp.asarray(1), xr, L8, Ls, num_bits=4, rank=r,
            splits=splits, interpret=True)
        ref = self._reference(x, pk, sc, R8, Rs, L8, Ls, 1, splits, r)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 1e-5

    def test_l_only_single_projection(self):
        rng = np.random.default_rng(3)
        splits, r, K_ = (512,), 24, 256
        pk, sc, R8, Rs, L8, Ls = self._build(rng, 2, splits, K_, r)
        x = jnp.asarray(rng.standard_normal((3, K_)), jnp.float32)
        xr = self._xr(x, R8, Rs, 0, splits, r)
        out = K.quantized_matmul_w4a8_l_stacked(
            x, pk, sc, jnp.asarray(0), xr, L8, Ls, num_bits=4, rank=r,
            splits=splits, interpret=True)
        ref = self._reference(x, pk, sc, R8, Rs, L8, Ls, 0, splits, r)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 1e-5

    def test_supported_predicate(self):
        assert K.lr_stacked_supported((4096, 4096, 4096), (128, 128, 128))
        assert not K.lr_stacked_supported((4096, 4096), (128, 64))
        assert not K.lr_stacked_supported((4096, 4096), (64, 64))
        assert K.lr_stacked_supported((4096,), (64,))
        assert not K.lr_stacked_supported((128, 64), (128, 128))


class TestChipSmoke:
    def test_chip_smoke_all_kernels(self):
        """Mosaic compile-smoke of EVERY Pallas kernel on real hardware.

        The CI suite pins JAX to CPU (conftest), where interpret mode
        cannot catch Mosaic lowering bugs — two of which CORRUPTED
        silently in rounds 2-3. On a machine with the TPU attached, run
        with CCQ_CHIP_SMOKE=1 (or invoke scripts/chip_smoke.py directly)
        to execute the full kernel-vs-twin matrix on chip.
        """
        import json
        import os
        import subprocess
        import sys
        if not os.environ.get("CCQ_CHIP_SMOKE"):
            pytest.skip("chip smoke needs real TPU; set CCQ_CHIP_SMOKE=1")
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS",)}
        out = subprocess.run(
            [sys.executable, os.path.join(root, "scripts",
                                          "chip_smoke.py")],
            capture_output=True, text=True, timeout=3000, env=env)
        assert out.returncode == 0, out.stderr[-2000:]
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        assert rec["chip_smoke_ok"] == rec["total"]
