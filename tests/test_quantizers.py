"""Quantizer family tests: round-trip properties, packing, and parity with
the reference quantizer semantics (SURVEY.md section 2.3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.quant.quantizers import (
    BlockQuantizer, QuantizerFactory)
from ee274_convexcaldera_llm_quantization_tpu.ops import blockquant as bq
from ee274_convexcaldera_llm_quantization_tpu.ops import packing


RNG = np.random.default_rng(42)


def rand_matrix(m=64, n=64, scale=1.0):
    return jnp.asarray(RNG.normal(size=(m, n)).astype(np.float32) * scale)


class TestUniform:
    def test_round_trip_error_bounded(self):
        W = rand_matrix()
        for bits in (2, 4, 8):
            q = BlockQuantizer(bits, "uniform", 64)
            W_hat = q.dequantize(q.quantize(W))
            # max error per element <= absmax / (2 * (2^(b-1)-1)) per block
            maxq = 2 ** (bits - 1) - 1
            blocks = np.asarray(W).reshape(-1, 64)
            absmax = np.abs(blocks).max(axis=1, keepdims=True)
            err = np.abs(np.asarray(W_hat).reshape(-1, 64) - blocks)
            assert np.all(err <= absmax / (2 * maxq) + 1e-6)

    def test_8bit_nearly_lossless(self):
        W = rand_matrix()
        q = BlockQuantizer(8, "uniform", 64)
        W_hat = q.dequantize(q.quantize(W))
        assert float(jnp.max(jnp.abs(W - W_hat))) < 0.02

    def test_matches_formula(self):
        # spec: codes = round(W / absmax * (2^(b-1)-1)); dequant inverts
        W = rand_matrix(8, 16)
        q = BlockQuantizer(4, "uniform", 16)
        qt = q.quantize(W)
        blocks = np.asarray(W).reshape(-1, 16)
        absmax = np.maximum(np.abs(blocks).max(axis=1, keepdims=True), 1e-8)
        expected = np.round(blocks / absmax * 7).astype(np.int8)
        np.testing.assert_array_equal(np.asarray(qt.codes), expected)
        W_hat = q.dequantize(qt)
        np.testing.assert_allclose(
            np.asarray(W_hat).reshape(-1, 16), expected / 7.0 * absmax,
            rtol=1e-6)

    def test_global_block_size(self):
        W = rand_matrix(32, 32)
        q = BlockQuantizer(2, "uniform", "global")
        qt = q.quantize(W)
        assert qt.scale.shape == (1, 1)
        # single global absmax scale
        assert float(qt.scale[0, 0]) == pytest.approx(
            float(jnp.max(jnp.abs(W))), rel=1e-6)

    def test_block_size_divisibility_error(self):
        with pytest.raises(ValueError):
            BlockQuantizer(2, "uniform", 7).quantize(rand_matrix(8, 8))


class TestNF:
    @pytest.mark.parametrize("method,bits", [("nf4", 4), ("nf4_true", 4),
                                             ("nf2", 2)])
    def test_round_trip_values_in_codebook(self, method, bits):
        W = rand_matrix()
        q = BlockQuantizer(bits, method, 64)
        qt = q.quantize(W)
        levels = np.asarray(bq.nf_levels(method))
        assert np.asarray(qt.codes).max() < len(levels)
        W_hat = np.asarray(q.dequantize(qt)).reshape(-1, 64)
        scale = np.asarray(qt.scale)
        normalized = W_hat / scale
        # every dequantized value must be exactly a codebook level
        dists = np.abs(normalized[..., None] - levels[None, None, :])
        assert np.all(dists.min(axis=-1) < 1e-6)

    def test_threshold_assignment_matches_nearest_level(self):
        # threshold counting == nearest level for sorted codebooks
        levels = np.asarray(bq.NF4_LEVELS_TRUE)
        x = np.linspace(-1.0, 1.0, 997).astype(np.float32).reshape(1, -1)
        idx, scale = bq.nf_quantize_blocks(jnp.asarray(x), jnp.asarray(levels))
        scaled = x / np.asarray(scale)
        nearest = np.argmin(np.abs(scaled[..., None] - levels), axis=-1)
        np.testing.assert_array_equal(np.asarray(idx), nearest)

    def test_wrong_bits_raises(self):
        with pytest.raises(ValueError):
            BlockQuantizer(2, "nf4")
        with pytest.raises(ValueError):
            BlockQuantizer(4, "nf2")


class TestBBInt:
    @pytest.mark.parametrize("method,bits", [("bbint4", 4), ("bbint2", 2)])
    def test_outliers_restored_exactly(self, method, bits):
        W = np.asarray(rand_matrix()).copy()
        W[3, 7] = 50.0   # gross outlier
        W[10, 2] = -40.0
        q = BlockQuantizer(bits, method, 64)
        qt = q.quantize(jnp.asarray(W))
        assert qt.num_outliers() >= 2
        W_hat = np.asarray(q.dequantize(qt))
        assert W_hat[3, 7] == pytest.approx(50.0)
        assert W_hat[10, 2] == pytest.approx(-40.0)

    def test_quantization_error_bounded(self):
        W = rand_matrix()
        q = BlockQuantizer(4, "bbint4", 64)
        qt = q.quantize(W)
        W_hat = q.dequantize(qt)
        # non-outliers within half a step of the affine grid
        err = np.abs(np.asarray(W_hat - W)).reshape(-1, 64)
        scales = np.asarray(qt.scale)
        assert np.all(err <= scales / 2 + 1e-5)

    def test_coo_round_trip(self):
        W = np.asarray(rand_matrix()).copy()
        W[0, 0] = 100.0
        q = BlockQuantizer(4, "bbint4", 64)
        qt = q.quantize(jnp.asarray(W))
        idx, vals = packing.mask_to_coo(qt.outlier_mask, qt.outlier_values)
        mask, values = packing.coo_to_mask(qt.outlier_mask.shape, idx, vals)
        np.testing.assert_array_equal(mask, np.asarray(qt.outlier_mask))
        np.testing.assert_allclose(values, np.asarray(qt.outlier_values))


class TestPacking:
    @pytest.mark.parametrize("bits", [2, 4])
    def test_pack_unpack_identity(self, bits):
        codes = jnp.asarray(
            RNG.integers(0, 2 ** bits, size=(16, 64)).astype(np.uint8))
        packed = packing.pack_codes(codes, bits)
        assert packed.shape == (16, 64 * bits // 8)
        np.testing.assert_array_equal(
            np.asarray(packing.unpack_codes(packed, bits)), np.asarray(codes))

    def test_byte_layout_first_code_high_bits(self):
        # two int4 codes (a, b) -> byte a*16 + b (ref quantization.py:152)
        codes = jnp.asarray(np.array([[3, 5]], dtype=np.uint8))
        packed = packing.pack_codes(codes, 4)
        assert int(packed[0, 0]) == 3 * 16 + 5
        # four int2 codes -> a*64 + b*16 + c*4 + d (ref quantization.py:217)
        codes2 = jnp.asarray(np.array([[1, 2, 3, 0]], dtype=np.uint8))
        packed2 = packing.pack_codes(codes2, 2)
        assert int(packed2[0, 0]) == 1 * 64 + 2 * 16 + 3 * 4 + 0

    @pytest.mark.parametrize("bits", [2, 4])
    def test_signed_round_trip(self, bits):
        maxq = 2 ** (bits - 1) - 1
        codes = jnp.asarray(
            RNG.integers(-maxq, maxq + 1, size=(8, 32)).astype(np.int32))
        packed = packing.pack_signed(codes, bits)
        np.testing.assert_array_equal(
            np.asarray(packing.unpack_signed(packed, bits)), np.asarray(codes))


class TestFactory:
    def test_factory(self):
        f = QuantizerFactory(method="nf4_true", block_size=128)
        q = f.get_quantizer(4)
        assert q.method == "nf4_true" and q.block_size == 128
        assert "nf4_true" in str(f)

    def test_storage_bits_exact(self):
        W = rand_matrix(64, 64)
        q = BlockQuantizer(4, "uniform", 64)
        qt = q.quantize(W)
        # 64*64 params * 4 bits + 64 blocks * 16-bit scales
        assert qt.storage_bits() == 64 * 64 * 4 + 64 * 16


class TestNFMeanStd:
    def test_round_trip_standardized(self):
        # historical variant: per-block (mean, std) standardization
        W = rand_matrix()
        q = BlockQuantizer(4, "nf4_meanstd", 64)
        qt = q.quantize(W)
        assert qt.zero is not None           # per-block means
        W_hat = np.asarray(q.dequantize(qt)).reshape(-1, 64)
        # every reconstructed value is mean + level * std for some level
        mean = np.asarray(qt.zero)
        std = np.asarray(qt.scale)
        normalized = (W_hat - mean) / std
        levels = np.asarray(bq.NF4_LEVELS_LEGACY)
        dists = np.abs(normalized[..., None] - levels[None, None, :])
        assert np.all(dists.min(axis=-1) < 1e-5)

    def test_offset_blocks_handled(self):
        # blocks with large mean offsets: absmax scaling wastes range,
        # standardization does not
        rng = np.random.default_rng(3)
        W = jnp.asarray((rng.normal(size=(8, 64)) + 50.0).astype(np.float32))
        q_std = BlockQuantizer(4, "nf4_meanstd", 64)
        q_abs = BlockQuantizer(4, "nf4", 64)
        e_std = float(jnp.linalg.norm(
            q_std.dequantize(q_std.quantize(W)) - W))
        e_abs = float(jnp.linalg.norm(
            q_abs.dequantize(q_abs.quantize(W)) - W))
        assert e_std < e_abs
