"""SCL baselines, multi-group allocation, and metrics tests
(SURVEY.md sections 2.4, 2.5; README multi-group objective)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.quant import scl
from ee274_convexcaldera_llm_quantization_tpu.allocate import multigroup as mg
from ee274_convexcaldera_llm_quantization_tpu.evalm import metrics as M

RNG = np.random.default_rng(5)


class TestScalarUniform:
    def test_round_trip(self):
        data = jnp.asarray(RNG.normal(size=(64, 64)).astype(np.float32))
        q, codebook, idx = scl.scalar_quantize_uniform(data, 4)
        assert codebook.shape == (16,)
        # every output is a codebook entry
        assert np.allclose(np.asarray(q),
                           np.asarray(codebook)[np.asarray(idx)])
        # error bounded by half a step
        step = float(codebook[1] - codebook[0])
        assert float(jnp.max(jnp.abs(q - data))) <= step / 2 + 1e-6

    def test_min_max_preserved(self):
        data = jnp.asarray(np.array([[0.0, 1.0], [2.0, 3.0]], np.float32))
        q, codebook, _ = scl.scalar_quantize_uniform(data, 2)
        assert float(codebook[0]) == pytest.approx(0.0)
        assert float(codebook[-1]) == pytest.approx(3.0)


class TestLloydMax:
    def test_beats_uniform_on_gaussian(self):
        data = jnp.asarray(RNG.normal(size=4096).astype(np.float32))
        qu, *_ = scl.scalar_quantize_uniform(data, 2)
        ql, cb, idx, dist = scl.lloyd_max(data, 2)
        mse_u = float(jnp.mean((qu - data) ** 2))
        mse_l = float(jnp.mean((ql - data) ** 2))
        assert mse_l < mse_u
        # 2-bit Lloyd-Max on N(0,1) converges near the known optimum ~0.1175
        assert mse_l < 0.15

    def test_codebook_sorted_centroids(self):
        data = jnp.asarray(RNG.normal(size=2048).astype(np.float32))
        _, cb, _, _ = scl.lloyd_max(data, 3)
        assert cb.shape == (8,)


class TestKMeansVQ:
    def test_vector_dim_2(self):
        data = jnp.asarray(RNG.normal(size=(32, 32)).astype(np.float32))
        q, cb, idx, dist = scl.kmeans_vq(data, 4, vector_dim=2)
        assert q.shape == data.shape
        assert cb.shape == (16, 2)
        assert float(dist) < float(jnp.var(data))

    def test_padding_path(self):
        data = jnp.asarray(RNG.normal(size=33).astype(np.float32))  # odd
        q, cb, idx, dist = scl.kmeans_vq(data, 3, vector_dim=2)
        assert q.shape == (33,)

    def test_vq_beats_scalar_at_equal_rate(self):
        # correlated data: VQ at the same bits/sample should win
        base = RNG.normal(size=(2048,)).astype(np.float32)
        data = jnp.asarray(np.stack([base, base + 0.1 * RNG.normal(
            size=2048).astype(np.float32)], axis=1).reshape(-1))
        res_s = scl.scl_quantize(data, scl.SCLQuantizationParams(
            num_bits=2, method="scalar"))
        res_v = scl.scl_quantize(data, scl.SCLQuantizationParams(
            num_bits=4, method="vector", vector_dim=2))  # same 2 bits/sample
        assert res_v.rate == pytest.approx(res_s.rate)
        assert res_v.distortion < res_s.distortion


class TestDispatcher:
    @pytest.mark.parametrize("method", ["scalar", "lloyd_max", "vector"])
    def test_rate_and_ratio(self, method):
        data = jnp.asarray(RNG.normal(size=(64, 64)).astype(np.float32))
        params = scl.SCLQuantizationParams(num_bits=2, method=method,
                                           vector_dim=2)
        res = scl.scl_quantize(data, params)
        expected_rate = 2.0 / 2 if method == "vector" else 2.0
        assert res.rate == pytest.approx(expected_rate)
        assert res.compression_ratio == pytest.approx(16.0 / expected_rate)

    def test_apply_to_params_tree(self):
        tree = {"layer0": {"w": jnp.asarray(RNG.normal(size=(16, 16)),
                                            dtype=jnp.float32),
                           "b": jnp.zeros(16)},
                "layer1": {"w": jnp.asarray(RNG.normal(size=(16, 16)),
                                            dtype=jnp.float32)}}
        new_tree, results = scl.apply_scl_baseline_to_params(
            tree, scl_params=scl.SCLQuantizationParams(num_bits=2))
        assert len(results) == 2  # only the two 2-D weights
        assert not np.allclose(np.asarray(new_tree["layer0"]["w"]),
                               np.asarray(tree["layer0"]["w"]))
        np.testing.assert_array_equal(np.asarray(new_tree["layer0"]["b"]),
                                      np.asarray(tree["layer0"]["b"]))


class TestMultigroup:
    def groups(self):
        return [
            mg.GroupSpec("sensitive", 1000, c=1.0, weight=10.0),
            mg.GroupSpec("normal", 1000, c=1.0, weight=1.0),
            mg.GroupSpec("robust", 1000, c=0.01, weight=0.1),
        ]

    def test_continuous_respects_budget(self):
        res = mg.allocate_bits_continuous(self.groups(), B_tot=4.0)
        assert res.budget_used <= 4.0 + 1e-6
        assert res.duality_gap < 1e-4

    def test_sensitive_groups_get_more_bits(self):
        res = mg.allocate_bits_continuous(self.groups(), B_tot=4.0)
        assert res.bits["sensitive"] > res.bits["normal"] > res.bits["robust"]

    def test_discrete_menu_and_budget(self):
        res = mg.allocate_bits_discrete(self.groups(), B_tot=4.0,
                                        menu=(2, 3, 4, 8))
        assert set(res.bits.values()) <= {2.0, 3.0, 4.0, 8.0}
        assert res.budget_used <= 4.0 + 1e-9
        assert res.bits["sensitive"] >= res.bits["robust"]

    def test_discrete_matches_exhaustive_small(self):
        import itertools
        groups = self.groups()
        menu = (2, 4, 8)
        res = mg.allocate_bits_discrete(groups, B_tot=5.0, menu=menu)
        p = np.array([g.num_params for g in groups], float)
        p = p / p.sum()
        best = np.inf
        for combo in itertools.product(menu, repeat=3):
            if float(p @ np.array(combo)) <= 5.0 + 1e-12:
                d = sum(g.weight * g.c * np.exp(-g.k * b)
                        for g, b in zip(groups, combo))
                best = min(best, d)
        assert res.total_distortion == pytest.approx(best, rel=1e-9)

    def test_infeasible_budget_flagged(self):
        res = mg.allocate_bits_continuous(self.groups(), B_tot=1.0,
                                          b_min=2.0)
        assert res.duality_gap == np.inf


class TestMetrics:
    def test_exact_bits_per_parameter(self):
        # 100x400 layer, rank 10, 2-bit Q, fp16 factors
        bpp = M.compute_bits_per_parameter((100, 400), 2.0, rank=10,
                                           rank_bits=16.0)
        expected = (100 * 400 * 2 + 10 * 500 * 16) / (100 * 400)
        assert bpp == pytest.approx(expected)
        # the reference's sqrt approximation would give a different number
        sqrt_mn = np.sqrt(100 * 400)
        ref_approx = (10 * 2 * sqrt_mn * 16 + 100 * 400 * 2) / (100 * 400)
        assert bpp != pytest.approx(ref_approx)

    def test_scale_overhead(self):
        bpp = M.compute_bits_per_parameter((64, 64), 4.0, block_size=64)
        assert bpp == pytest.approx(4.0 + 16.0 / 64)

    def test_evaluate_compression_aggregate(self):
        W = RNG.normal(size=(64, 64))
        W_hat = W + 0.01 * RNG.normal(size=(64, 64))
        m = M.evaluate_compression((64, 64), 2.0, rank=4, W=W, W_hat=W_hat,
                                   ppl_original=5.0, ppl_compressed=5.5,
                                   duality_gap=1e-6)
        assert m.perplexity_increase == pytest.approx(0.5)
        assert 0 < m.relative_error < 0.05
        assert m.compression_ratio == pytest.approx(16.0 / m.bits_per_parameter)

    def test_plots_write_files(self, tmp_path):
        p1 = M.plot_bit_allocation_heatmap(
            np.array([[2, 4], [8, 2]]), ["a", "b"],
            save_path=str(tmp_path / "heat.png"))
        p2 = M.plot_accuracy_vs_bits([2, 4, 8], [0.8, 0.9, 0.95],
                                     save_path=str(tmp_path / "acc.png"))
        p3 = M.plot_loss_vs_rank([16, 64], [0.5, 0.1],
                                 save_path=str(tmp_path / "loss.png"))
        p4 = M.plot_singular_value_spectra(
            {"W": np.linspace(10, 0.1, 32)},
            save_path=str(tmp_path / "svd.png"))
        for p in (p1, p2, p3, p4):
            assert os.path.exists(p) and os.path.getsize(p) > 0
