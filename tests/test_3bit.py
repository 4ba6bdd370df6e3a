"""3-bit quantization grid served in the int4 container (BASELINE config 5:
mixed 2/3/4-bit groups). The grid is 3-bit (7 levels, 3 bits/param counted),
the HBM-resident pack is int4 — the TPU trade documented at
``ops.kernels.container_bits``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as K
from ee274_convexcaldera_llm_quantization_tpu.models import (
    compressed, llama, mixed)
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY


class TestPack3Bit:
    def test_pack_rowscale_grid(self):
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
        packed, scales = K.pack_rowscale(W, 3)
        assert packed.shape == (64, 64)            # int4 container
        # dequant through the 4-bit container semantics
        Wd = np.asarray(compressed.CalderaLinear(
            packed=packed, scales=scales, L=jnp.zeros((64, 1)),
            R=jnp.zeros((1, 128)), global_scale=jnp.float32(1.0),
            num_bits=4, group_size=128, out_features=64, in_features=128,
            mode="w4a8", grid_bits=3).materialize())
        codes = Wd / np.asarray(scales)
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)
        assert np.abs(codes).max() <= 3 + 1e-4     # 3-bit grid, not 4
        # quantization error consistent with a 7-level grid
        err = np.abs(Wd - np.asarray(W)).max()
        assert err <= float(np.asarray(scales).max()) / 2 + 1e-5

    def test_w4a8_kernel_serves_3bit_grid(self):
        rng = np.random.default_rng(1)
        W = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
        packed, scales = K.pack_rowscale(W, 3)
        x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
        # container bits drive the kernel
        out = K.quantized_matmul_w4a8(x, packed, scales, 4, interpret=True)
        ref = K.quantized_matmul_w4a8_xla(x, packed, scales, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

    def test_compress_linear_3bit(self):
        rng = np.random.default_rng(2)
        W = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
        lin = compressed.compress_linear(
            W, jnp.zeros((64, 4)), jnp.zeros((4, 128)), 3, mode="w4a8")
        assert lin.num_bits == 4 and lin.grid_bits == 3
        rel = float(jnp.linalg.norm(lin.materialize() - W)
                    / jnp.linalg.norm(W))
        rel2 = float(jnp.linalg.norm(
            compressed.compress_linear(W, jnp.zeros((64, 4)),
                                       jnp.zeros((4, 128)), 2,
                                       mode="w4a8").materialize() - W)
            / jnp.linalg.norm(W))
        rel4 = float(jnp.linalg.norm(
            compressed.compress_linear(W, jnp.zeros((64, 4)),
                                       jnp.zeros((4, 128)), 4,
                                       mode="w4a8").materialize() - W)
            / jnp.linalg.norm(W))
        assert rel4 < rel < rel2                   # strictly between

    def test_3bit_grouped_mode_rejected(self):
        with pytest.raises(ValueError):
            compressed.compress_linear(
                jnp.zeros((8, 16)), jnp.zeros((8, 2)), jnp.zeros((2, 16)),
                3, mode="grouped")


class TestBudget234:
    def test_budget_menu_234_end_to_end(self):
        from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
            CalderaParams)
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model_with_budget)

        params = llama.init_params(jax.random.PRNGKey(3), TINY)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        qparams, report, alloc = compress_model_with_budget(
            params, cp, B_tot=3.0, menu=(2, 3, 4), serving_mode="w4a8")
        assert alloc.avg_bits <= 3.0 + 1e-9
        assert alloc.duality_gap >= 0
        used = sorted(set(int(b) for b in alloc.bits.values()))
        assert set(used) <= {2, 3, 4}
        mp = mixed.stack_layers_mixed(qparams)
        toks = jnp.asarray([1, 2], jnp.int32)
        pos = jnp.asarray([0, 0], jnp.int32)
        cache = llama.KVCache.create(TINY, 2, 16)
        logits, _ = mixed.decode_step_mixed(mp, toks, pos, cache, TINY,
                                            interpret=True)
        assert np.isfinite(np.asarray(logits)).all()
