"""E8P lattice codebook quantizer (ops/lattice.py).

Beyond-parity component: the reference's 2-bit quantizers are all scalar
(reference ``quantization.py:93-243``); e8p is an 8-dim E8 lattice codebook
at the same 2 bits/weight. Tests pin down: codebook lattice membership,
Conway-Sloane nearest-point exactness, encode = brute-force argmin, the
shaping gain over scalar quantizers on Gaussian data, and the CALDERA /
Hadamard-rotation integration that motivates the method.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.ops import blockquant as bq
from ee274_convexcaldera_llm_quantization_tpu.ops import lattice as lat
from ee274_convexcaldera_llm_quantization_tpu.quant.quantizers import (
    BlockQuantizer, QuantizerFactory)


class TestCodebook:
    def test_size_and_uniqueness(self):
        cb = lat.e8p_codebook()
        assert cb.shape == (65536, 8)
        assert len(np.unique(cb.round(4), axis=0)) == 65536

    def test_lattice_membership(self):
        cb = lat.e8p_codebook()
        v = cb - 0.25
        frac = v - np.round(v)
        int_coset = np.all(np.abs(frac) < 1e-6, axis=1)
        half_coset = np.all(np.abs(np.abs(frac) - 0.5) < 1e-6, axis=1)
        assert np.all(int_coset | half_coset)
        ints = np.where(int_coset[:, None], np.round(v), np.round(v - 0.5))
        assert np.all(ints.sum(axis=1).astype(int) % 2 == 0)

    def test_norm_ordered_ball(self):
        cb = lat.e8p_codebook()
        norms = (cb * cb).sum(axis=1)
        # smallest-norm selection: every entry no larger than the radius
        assert norms.max() <= 14.0
        assert norms.min() == pytest.approx(0.5)  # all-(+-1/4) shell

    def test_hash_collision_free(self):
        _, sorted_keys, order = lat._hash_table()
        assert len(np.unique(sorted_keys)) == 65536
        assert sorted(order.tolist()) == list(range(65536))


class TestNearestPoint:
    def test_conway_sloane_optimal_vs_brute(self):
        rng = np.random.default_rng(0)
        y = (0.4 * rng.normal(size=(200, 8))).astype(np.float32)
        ne = np.asarray(lat.nearest_e8(jnp.asarray(y)))
        pts = np.concatenate([
            lat._enumerate_shifted_coset(0.0, 9.0),
            lat._enumerate_shifted_coset(0.5, 9.0)]).astype(np.float32)
        scores = -2 * y @ pts.T + (pts * pts).sum(1)[None]
        bf = pts[scores.argmin(1)]
        dn = ((y - ne) ** 2).sum(1)
        db = ((y - bf) ** 2).sum(1)
        np.testing.assert_allclose(dn, db, atol=1e-5)

    def test_results_are_lattice_points(self):
        rng = np.random.default_rng(1)
        y = rng.normal(size=(300, 8)).astype(np.float32) * 2.0
        ne = np.asarray(lat.nearest_e8(jnp.asarray(y)))
        frac = ne - np.round(ne)
        int_c = np.all(np.abs(frac) < 1e-6, axis=1)
        half_c = np.all(np.abs(np.abs(frac) - 0.5) < 1e-6, axis=1)
        assert np.all(int_c | half_c)
        s = np.where(int_c, ne.sum(1), (ne - 0.5).sum(1))
        assert np.all(np.round(s).astype(int) % 2 == 0)


class TestEncode:
    def test_self_encode_identity(self):
        cb = lat.e8p_codebook()
        sample = cb[::97]
        idx = np.asarray(lat.e8p_encode(jnp.asarray(sample), jnp.asarray(cb)))
        np.testing.assert_allclose(cb[idx.astype(int)], sample, atol=1e-6)

    def test_encode_matches_brute_force(self):
        # scale up so a fraction of vectors clip out of the codebook ball,
        # exercising both the C&S fast path and the brute-force fallback
        rng = np.random.default_rng(2)
        y = (1.3 * rng.normal(size=(256, 8))).astype(np.float32)
        cb = jnp.asarray(lat.e8p_codebook())
        idx = np.asarray(lat.e8p_encode(jnp.asarray(y), cb, exact=True))
        bf = np.asarray(lat._brute_force_encode(jnp.asarray(y), cb))
        d_idx = ((y - np.asarray(cb)[idx.astype(int)]) ** 2).sum(1)
        d_bf = ((y - np.asarray(cb)[bf.astype(int)]) ** 2).sum(1)
        np.testing.assert_allclose(d_idx, d_bf, atol=1e-5)

    def test_default_encode_near_exact(self):
        # the default (local-search) encode must return valid codewords
        # that are exact for in-ball rows and within a small MSE excess of
        # brute force overall, at every load factor the scale search uses
        rng = np.random.default_rng(5)
        cb = jnp.asarray(lat.e8p_codebook())
        cbn = np.asarray(cb)
        for scale, max_excess in ((0.5, 1e-6), (0.8, 2e-3), (1.0, 5e-3),
                                  (1.3, 1.5e-2)):
            y = (scale * rng.normal(size=(2048, 8))).astype(np.float32)
            idx = np.asarray(lat.e8p_encode(jnp.asarray(y), cb)).astype(int)
            bf = np.asarray(lat._brute_force_encode(
                jnp.asarray(y), cb)).astype(int)
            d_l = ((y - cbn[idx]) ** 2).sum(1)
            d_b = ((y - cbn[bf]) ** 2).sum(1)
            # never better than optimal, and only marginally worse
            assert (d_l >= d_b - 1e-5).all()
            excess = (d_l.sum() - d_b.sum()) / d_b.sum()
            assert excess <= max_excess, (scale, excess)
            # in-ball rows (C&S point is a codebook member) are exact
            pts = np.asarray(lat.nearest_e8(jnp.asarray(y) - 0.25)) + 0.25
            inb = (pts * pts).sum(1) <= 10.5 + 1e-6
            np.testing.assert_allclose(d_l[inb], d_b[inb], atol=1e-5)

    def test_e8_roots(self):
        roots = lat.e8_roots()
        assert roots.shape == (240, 8)
        np.testing.assert_allclose((roots ** 2).sum(1), 2.0)
        # all roots are E8 vectors: integer (even sum) or half-integer
        half = np.all(np.abs(np.abs(roots) - 0.5) < 1e-6, axis=1)
        ints = np.all(np.abs(roots - np.round(roots)) < 1e-6, axis=1)
        assert np.all(half | ints)
        s = np.where(half, (roots - 0.5).sum(1), roots.sum(1))
        assert np.all(np.round(s).astype(int) % 2 == 0)
        assert len(np.unique(roots.round(2), axis=0)) == 240


class TestBlockQuantization:
    def test_round_trip_shapes_and_rate(self):
        rng = np.random.default_rng(3)
        blocks = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
        codes, scale = lat.e8p_quantize_blocks(blocks)
        assert codes.shape == (16, 8) and codes.dtype == jnp.uint16
        assert scale.shape == (16, 1)
        rec = lat.e8p_dequantize_blocks(codes, scale)
        assert rec.shape == blocks.shape
        # 16 bits per 8 weights = exactly 2 bits/weight
        assert codes.size * 16 == blocks.size * 2

    def test_beats_scalar_quantizers_on_gaussian(self):
        rng = np.random.default_rng(4)
        blocks = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        codes, scale = lat.e8p_quantize_blocks(blocks)
        mse = float(jnp.mean(
            (lat.e8p_dequantize_blocks(codes, scale) - blocks) ** 2))
        # scalar 2-bit Lloyd-Max on a unit Gaussian bottoms out at 0.1175;
        # the E8 shaping+packing gain must beat it (measured ~0.090)
        assert mse < 0.105
        c2, a2 = bq.uniform_quantize_blocks(blocks, 2)
        mse_u = float(jnp.mean(
            (bq.uniform_dequantize_blocks(c2, a2, 2) - blocks) ** 2))
        i2, s2 = bq.nf_quantize_blocks(blocks, bq.NF2_LEVELS)
        mse_n = float(jnp.mean(
            (bq.nf_dequantize_blocks(i2, s2, bq.NF2_LEVELS) - blocks) ** 2))
        assert mse < 0.5 * mse_n < 0.5 * mse_u

    def test_block_size_must_be_multiple_of_8(self):
        with pytest.raises(ValueError, match="multiple"):
            lat.e8p_quantize_blocks(jnp.zeros((4, 12)))

    def test_quantize_dequantize_dispatcher(self):
        rng = np.random.default_rng(5)
        W = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
        out = bq.quantize_dequantize(W, 2, "e8p", 64)
        assert out.shape == W.shape
        rel = float(jnp.linalg.norm(out - W) / jnp.linalg.norm(W))
        assert rel < 0.35
        with pytest.raises(ValueError, match="2-bit"):
            bq.quantize_dequantize(W, 4, "e8p", 64)


class TestQuantizerClass:
    def test_block_quantizer_integration(self):
        rng = np.random.default_rng(6)
        W = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
        q = BlockQuantizer(num_bits=2, method="e8p", block_size=64)
        qt = q.quantize(W)
        assert qt.codes.dtype == jnp.uint16
        rec = q.dequantize(qt)
        assert rec.shape == W.shape
        # storage: 2 bits/weight + one fp16 scale per block
        assert qt.storage_bits() == W.size * 2 + (W.size // 64) * 16
        assert qt.packed_codes().dtype == jnp.uint16

    def test_rejects_wrong_bits(self):
        with pytest.raises(ValueError):
            BlockQuantizer(num_bits=4, method="e8p")


class TestServingRepack:
    """Lossless e8p -> int4 W4A8 repack (lattice.e8p_pack_rowscale)."""

    def test_repack_bit_exact(self):
        rng = np.random.default_rng(10)
        W = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
        packed, half_s, off = lat.e8p_pack_rowscale(W)
        codes, s = lat.e8p_quantize_blocks(W)
        rec = np.asarray(lat.e8p_dequantize_blocks(codes, s))
        pk = np.asarray(packed)
        u = np.stack([(pk >> 4) & 0xF, pk & 0xF], axis=1).reshape(32, 64)
        rec_int4 = ((u.astype(np.float32) - 7) * np.asarray(half_s)
                    + np.asarray(off))
        np.testing.assert_allclose(rec_int4, rec, atol=1e-5)
        # int4 codes stay inside the symmetric range the kernels assume
        assert u.min() >= 0 and u.max() <= 14

    def test_compress_linear_e8p(self):
        from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
            apply_linear, compress_linear)
        rng = np.random.default_rng(11)
        W = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        L = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32)) * 0.1
        R = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32)) * 0.1
        lin = compress_linear(W, L, R, 4, mode="w4a8", q_method="e8p")
        assert lin.L.shape == (64, 9) and lin.R.shape == (9, 128)  # +rank-1
        codes, s = lat.e8p_quantize_blocks(W)
        ref = (np.asarray(lat.e8p_dequantize_blocks(codes, s))
               + np.asarray(L) @ np.asarray(R))
        mat = np.asarray(lin.materialize())
        assert (np.linalg.norm(mat - ref) / np.linalg.norm(ref)) < 5e-3
        x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
        y = np.asarray(apply_linear(lin, x))
        y_ref = np.asarray(x) @ ref.T
        assert (np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)) < 0.02

    def test_compress_linear_e8p_requires_w4a8(self):
        from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
            compress_linear)
        W = jnp.zeros((16, 16))
        L = jnp.zeros((16, 2))
        R = jnp.zeros((2, 16))
        with pytest.raises(ValueError, match="w4a8"):
            compress_linear(W, L, R, 4, mode="grouped", q_method="e8p")

    def test_surgery_e8p_end_to_end(self):
        import jax
        from ee274_convexcaldera_llm_quantization_tpu.models import llama
        from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model)
        from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
            CalderaParams)
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        cp = CalderaParams(Q_bits=2, L_bits=16, R_bits=16, rank=8, iters=1,
                           lplr_iters=1)
        qp, report = compress_model(
            params, cp, proj_filter=("q_proj", "up_proj"),
            serving_bits=4, serving_mode="w4a8", serving_quant="e8p")
        assert len(report.compressed) == 2 * TINY.num_layers
        # 2-bit information rate + rank-1-augmented factors + row scales
        assert report.avg_bits_per_param < 4.0
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                  TINY.vocab_size)
        logits_q = llama.forward(qp, toks, TINY)
        logits_d = llama.forward(params, toks, TINY)
        assert jnp.all(jnp.isfinite(logits_q))
        # compressed model stays correlated with the dense one
        a = np.asarray(logits_q).ravel()
        b = np.asarray(logits_d).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.5


class TestCheckpointStorage:
    """2-bit e8p code storage in checkpoints (utils/checkpoint.py)."""

    def test_int4_code_round_trip(self):
        rng = np.random.default_rng(12)
        W = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
        packed, _, _ = lat.e8p_pack_rowscale(W)
        codes = lat.int4_planes_to_codes(packed)
        assert codes.shape == (16, 8) and codes.dtype == jnp.uint16
        rebuilt = lat.codes_to_int4_planes(codes, 64)
        np.testing.assert_array_equal(np.asarray(rebuilt), np.asarray(packed))

    def test_int4_code_round_trip_stacked(self):
        rng = np.random.default_rng(13)
        W = jnp.asarray(rng.normal(size=(3, 8, 32)).astype(np.float32))
        packed = jnp.stack([lat.e8p_pack_rowscale(W[i])[0] for i in range(3)])
        codes = lat.int4_planes_to_codes(packed)
        assert codes.shape == (3, 8, 4)
        rebuilt = lat.codes_to_int4_planes(codes, 32)
        np.testing.assert_array_equal(np.asarray(rebuilt), np.asarray(packed))

    def test_rejects_non_lattice_pack(self):
        # uniform RTN codes use the full int4 range incl. u=15, which maps
        # to c=17/4 — out of every codebook shell
        bad = jnp.full((4, 16), 0xFF, jnp.uint8)
        with pytest.raises(ValueError, match="lattice"):
            lat.int4_planes_to_codes(bad)

    def test_checkpoint_round_trip_e8p(self, tmp_path):
        import jax
        from ee274_convexcaldera_llm_quantization_tpu.models import llama
        from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model)
        from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
            CalderaParams)
        from ee274_convexcaldera_llm_quantization_tpu.utils.checkpoint import (
            load_params, save_params)
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        cp = CalderaParams(Q_bits=2, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        qp, _ = compress_model(params, cp, proj_filter=("q_proj",),
                               serving_mode="w4a8", serving_quant="e8p")
        save_params(str(tmp_path / "ckpt"), qp, TINY)
        # the stored artifact holds 2-bit codes, not the 4-bit pack
        z = np.load(str(tmp_path / "ckpt" / "params.npz"))
        code_keys = [k for k in z.files if k.endswith("e8p_codes")]
        assert len(code_keys) == TINY.num_layers
        assert all(z[k].dtype == np.uint16 for k in code_keys)
        assert not any(k.endswith("q_proj.packed") for k in z.files)
        loaded, _ = load_params(str(tmp_path / "ckpt"))
        for i in range(TINY.num_layers):
            a = qp.layers[i].q_proj
            b = loaded.layers[i].q_proj
            assert b.q_method == "e8p"
            np.testing.assert_array_equal(np.asarray(a.packed),
                                          np.asarray(b.packed))
            np.testing.assert_allclose(np.asarray(a.scales),
                                       np.asarray(b.scales))


class TestBudgetedE8P:
    def test_budget_2bit_groups_upgrade_to_lattice(self):
        import jax
        from ee274_convexcaldera_llm_quantization_tpu.models import llama
        from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
        from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
            CalderaLinear)
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model_with_budget)
        from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
            CalderaParams)
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=4, iters=1,
                           lplr_iters=1)
        qp, report, alloc = compress_model_with_budget(
            params, cp, B_tot=2.5, menu=(2, 4),
            proj_filter=("q_proj", "up_proj"), serving_mode="w4a8",
            use_e8p_at_2bit=True)
        two_bit = [n for n, b in alloc.bits.items() if int(b) == 2]
        assert two_bit, "budget 2.5 over menu (2,4) must assign some 2-bit"
        for i, lp in enumerate(qp.layers):
            for proj in ("q_proj", "up_proj"):
                lin = getattr(lp, proj)
                name = f"layers.{i}.{proj}"
                if not isinstance(lin, CalderaLinear):
                    continue
                if int(alloc.bits[name]) == 2:
                    assert lin.q_method == "e8p" and lin.num_bits == 4
                else:
                    assert lin.q_method == "uniform"
        toks = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0,
                                  TINY.vocab_size)
        assert np.isfinite(np.asarray(llama.forward(qp, toks, TINY))).all()

    def test_e8p_at_2bit_requires_w4a8(self):
        import jax
        from ee274_convexcaldera_llm_quantization_tpu.models import llama
        from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            compress_model_with_budget)
        from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
            CalderaParams)
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        cp = CalderaParams(Q_bits=4, rank=4, iters=1, lplr_iters=1)
        with pytest.raises(ValueError, match="w4a8"):
            compress_model_with_budget(
                params, cp, B_tot=2.0, menu=(2,),
                proj_filter=("q_proj",), serving_mode="grouped",
                use_e8p_at_2bit=True)


@pytest.fixture(scope="module")
def e8p_tiny():
    import jax
    from ee274_convexcaldera_llm_quantization_tpu.models import llama
    from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
    from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
        compress_model)
    from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
        CalderaParams)
    params = llama.init_params(jax.random.PRNGKey(0), TINY)
    cp = CalderaParams(Q_bits=2, L_bits=16, R_bits=16, rank=4, iters=1,
                       lplr_iters=1)
    qp, _ = compress_model(params, cp, serving_mode="w4a8",
                           serving_quant="e8p")
    return qp


class TestE8PServingStack:
    """The full serving stack (stacked scan + fused projections) on an
    all-e8p model: the rank-1 offset augmentation and q_method tag must
    ride through stacking and fusion unchanged."""

    def test_stack_and_fused_decode(self, e8p_tiny):
        import jax
        from ee274_convexcaldera_llm_quantization_tpu.models import (
            fused, llama, stacked)
        from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
        sp = stacked.stack_layers(e8p_tiny)
        assert sp.layers.q_proj.q_method == "e8p"
        fp = fused.fuse_stacked(sp)
        B = 2
        cache = llama.KVCache.create(TINY, B, 16)
        toks = jax.random.randint(jax.random.PRNGKey(3), (B,), 0,
                                  TINY.vocab_size)
        pos = jnp.zeros((B,), jnp.int32)
        logits, _ = fused.decode_step_fused(fp, toks, pos, cache, TINY,
                                            interpret=True)
        # reference: unrolled forward on the same params, single token
        full = llama.forward(e8p_tiny, toks[:, None], TINY)[:, 0]
        a, b = np.asarray(logits), np.asarray(full)
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel < 0.05  # int8-activation + bf16-factor tolerance


class TestLDLQE8P:
    """Block-LDLQ with the lattice codebook (decomp.caldera.ldlq_quantize_e8p)."""

    @staticmethod
    def _aa_err(W, Q, H):
        d = np.asarray(W - Q)
        Hn = np.asarray(H)
        return float(np.sqrt(np.trace(d @ Hn @ d.T)
                             / np.trace(np.asarray(W) @ Hn @ np.asarray(W).T)))

    @staticmethod
    def _correlated_hessian(n, seed):
        rng = np.random.default_rng(seed)
        X = rng.normal(size=(4 * n, n)).astype(np.float32)
        X[:, : n // 2] *= 4.0  # strongly anisotropic input statistics
        H = X.T @ X / (4 * n)
        return (H + H.T) / 2

    def test_identity_hessian_reduces_to_plain_e8p(self):
        from ee274_convexcaldera_llm_quantization_tpu.decomp import caldera as C
        rng = np.random.default_rng(20)
        A = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
        U = C.ldlq_precompute(jnp.eye(32))
        Q = C.ldlq_quantize_e8p(A, U)
        codes, s = lat.e8p_quantize_blocks(A)
        plain = lat.e8p_dequantize_blocks(codes, s)
        np.testing.assert_allclose(np.asarray(Q), np.asarray(plain),
                                   atol=2e-5)

    def test_beats_plain_e8p_on_correlated_hessian(self):
        from ee274_convexcaldera_llm_quantization_tpu.decomp import caldera as C
        rng = np.random.default_rng(21)
        n = 64
        A = jnp.asarray(rng.normal(size=(48, n)).astype(np.float32))
        H = jnp.asarray(self._correlated_hessian(n, seed=22))
        U = C.ldlq_precompute(H)
        Q_ldlq = C.ldlq_quantize_e8p(A, U)
        codes, s = lat.e8p_quantize_blocks(A)
        Q_plain = lat.e8p_dequantize_blocks(codes, s)
        e_ldlq = self._aa_err(A, Q_ldlq, H)
        e_plain = self._aa_err(A, Q_plain, H)
        assert e_ldlq < e_plain * 0.95, (e_ldlq, e_plain)

    def test_caldera_ldlq_e8p_end_to_end(self):
        from ee274_convexcaldera_llm_quantization_tpu.decomp import caldera as C
        rng = np.random.default_rng(23)
        n = 64
        W = jnp.asarray(rng.normal(size=(48, n)).astype(np.float32))
        H = jnp.asarray(self._correlated_hessian(n, seed=24))
        p = C.CalderaParams(
            Q_bits=2, L_bits=16, R_bits=16, rank=8, iters=2,
            q_update="ldlq",
            quant_factory_Q=QuantizerFactory(method="e8p",
                                             block_size="global"))
        d = C.caldera(p, W, H, scale_W=False)
        e = self._aa_err(W, np.asarray(d.reconstruct()), H)
        # uniform-LDLQ at the same rate for comparison
        p_u = C.CalderaParams(Q_bits=2, L_bits=16, R_bits=16, rank=8,
                              iters=2, q_update="ldlq")
        d_u = C.caldera(p_u, W, H, scale_W=False)
        e_u = self._aa_err(W, np.asarray(d_u.reconstruct()), H)
        assert e < e_u, (e, e_u)


class TestCalderaIntegration:
    def test_e8p_beats_uniform_in_caldera(self):
        from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
            CalderaParams, caldera)
        rng = np.random.default_rng(7)
        W = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))

        def err(method, block_size):
            p = CalderaParams(
                Q_bits=2, L_bits=16, R_bits=16, rank=4, iters=2,
                quant_factory_Q=QuantizerFactory(method=method,
                                                 block_size=block_size))
            d = caldera(p, W, scale_W=False)
            return float(jnp.linalg.norm(d.reconstruct() - W)
                         / jnp.linalg.norm(W))

        assert err("e8p", 64) < 0.6 * err("uniform", "global")

    def test_rotation_helps_heavy_tails_with_e8p(self):
        # the measured PERFORMANCE.md finding: incoherence processing pays
        # off once the quantizer is distribution-matched (lattice codebook)
        from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
            CalderaParams, caldera)
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            caldera_with_hadamard)
        rng = np.random.default_rng(8)
        W = jnp.asarray(rng.standard_t(df=3, size=(64, 64)).astype(np.float32))
        p = CalderaParams(Q_bits=2, L_bits=16, R_bits=16, rank=4, iters=2,
                          quant_factory_Q=QuantizerFactory(method="e8p",
                                                           block_size=64))
        d = caldera(p, W, scale_W=False)
        plain = float(jnp.linalg.norm(d.reconstruct() - W)
                      / jnp.linalg.norm(W))
        _, rot = caldera_with_hadamard(p, W)
        assert rot < plain + 0.02  # never hurts; typically clearly better
