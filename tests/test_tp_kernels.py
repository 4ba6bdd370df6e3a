"""Tensor-parallel kernel wrapper tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as K
from ee274_convexcaldera_llm_quantization_tpu.parallel import mesh as pm
from ee274_convexcaldera_llm_quantization_tpu.parallel import tp_kernels as tp

RNG = np.random.default_rng(21)


def rand(n, k, scale=0.1):
    return jnp.asarray(RNG.normal(size=(n, k)).astype(np.float32) * scale)


@pytest.fixture(scope="module")
def mesh():
    return pm.make_mesh(dp=1, tp=4)


class TestColumnParallel:
    def test_matches_single_device(self, mesh):
        W = rand(256, 128)
        x = rand(8, 128, scale=1.0)
        packed, rs = K.pack_rowscale(W, 4)
        y_ref = K.quantized_matmul_w4a8(x, packed, rs, 4, interpret=True)
        f = tp.column_parallel_w4a8(mesh, 4, interpret=True)
        y = f(x, packed, rs)
        # column-parallel splits rows of W; each shard quantizes x the same
        # way, so results are bit-identical
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))

    def test_output_is_sharded(self, mesh):
        W = rand(256, 128)
        x = rand(8, 128, scale=1.0)
        packed, rs = K.pack_rowscale(W, 4)
        f = jax.jit(tp.column_parallel_w4a8(mesh, 4, interpret=True))
        y = f(x, packed, rs)
        assert y.shape == (8, 256)


class TestRowParallel:
    def test_at_least_as_accurate_as_flat(self, mesh):
        # row-parallel quantizes per shard (finer scales than one row-wide
        # scale), so vs the dense truth it must be at least as accurate as
        # the single-device flat packing (up to rounding noise)
        W = rand(128, 256)
        x = rand(8, 256, scale=1.0)
        packed_flat, rs_flat = K.pack_rowscale(W, 4)
        y_flat = np.asarray(
            K.quantized_matmul_w4a8(x, packed_flat, rs_flat, 4,
                                    interpret=True))
        packed, rs = tp.pack_rowscale_sharded(W, 4, shards=4)
        f = tp.row_parallel_w4a8(mesh, 4, interpret=True)
        y = np.asarray(f(x, packed, rs))
        y_dense = np.asarray(x) @ np.asarray(W).T
        err_flat = np.linalg.norm(y_flat - y_dense)
        err_tp = np.linalg.norm(y - y_dense)
        assert err_tp <= err_flat * 1.1

    def test_psum_completes_contraction(self, mesh):
        # against the dense product, error must stay at quantization level
        W = rand(128, 256)
        x = rand(4, 256, scale=1.0)
        packed, rs = tp.pack_rowscale_sharded(W, 4, shards=4)
        f = tp.row_parallel_w4a8(mesh, 4, interpret=True)
        y = np.asarray(f(x, packed, rs))
        y_dense = np.asarray(x) @ np.asarray(W).T
        rel = np.linalg.norm(y - y_dense) / np.linalg.norm(y_dense)
        assert rel < 0.3

    def test_sharded_packing_dequants_exactly(self):
        # per-shard packing must reconstruct each k-slice like flat packing
        # of that slice
        W = rand(64, 128)
        packed, rs = tp.pack_rowscale_sharded(W, 4, shards=4)
        for s in range(4):
            Ws = W[:, s * 32:(s + 1) * 32]
            p_ref, s_ref = K.pack_rowscale(Ws, 4)
            np.testing.assert_array_equal(
                np.asarray(packed[:, s * 16:(s + 1) * 16]),
                np.asarray(p_ref))
            np.testing.assert_allclose(np.asarray(rs[:, s:s + 1]),
                                       np.asarray(s_ref))


class TestShardedPlacement:
    def test_column_and_row_placement(self, mesh):
        from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
            compress_linear)
        W = rand(256, 128)
        L = rand(256, 8, scale=0.05)
        R = rand(8, 128, scale=0.05)
        lin = compress_linear(W, L, R, 4, mode="w4a8")
        col = tp.shard_caldera_linear_column(lin, mesh)
        assert col.packed.sharding.spec == jax.sharding.PartitionSpec(
            "tp", None)
        row = tp.shard_caldera_linear_row(lin, mesh)
        assert row.packed.sharding.spec == jax.sharding.PartitionSpec(
            None, "tp")
