"""Whole-MLP megakernel: equivalence vs the unfused composition, fused
decode integration, and support gating. (No reference counterpart — the
reference materializes dense weights and has no serving path,
``main.py:197-199``.)"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import fused as fusedm
from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as Kr


def _mk_mlp_weights(rng, L, h, im, rank, bits):
    f = 8 // bits
    return dict(
        gu_packed=jnp.asarray(rng.integers(0, 256, (L, 2 * im, h // f)),
                              jnp.uint8),
        gu_scales=jnp.asarray(rng.uniform(1e-3, 1e-2, (L, 2 * im, 1)),
                              jnp.float32),
        gu_L=jnp.asarray(rng.integers(-127, 128, (L, 2 * im, rank)),
                         jnp.int8),
        gu_Ls=jnp.asarray(rng.uniform(1e-4, 1e-3, (L, 2 * im, 1)),
                          jnp.float32),
        gu_R=jnp.asarray(rng.integers(-127, 128, (L, 2 * rank, h)),
                         jnp.int8),
        gu_Rs=jnp.asarray(rng.uniform(1e-4, 1e-3, (L, 2 * rank, 1)),
                          jnp.float32),
        gu_gs=jnp.asarray(rng.uniform(0.5, 2.0, (L, 2)), jnp.float32),
        dn_packed=jnp.asarray(rng.integers(0, 256, (L, h, im // f)),
                              jnp.uint8),
        dn_scales=jnp.asarray(rng.uniform(1e-3, 1e-2, (L, h, 1)),
                              jnp.float32),
        dn_R=jnp.asarray(rng.integers(-127, 128, (L, rank, im)), jnp.int8),
        dn_Rs=jnp.asarray(rng.uniform(1e-4, 1e-3, (L, rank, 1)),
                          jnp.float32),
        dn_L=jnp.asarray(rng.integers(-127, 128, (L, h, rank)), jnp.int8),
        dn_Ls=jnp.asarray(rng.uniform(1e-4, 1e-3, (L, h, 1)), jnp.float32),
    )


def _unfused_reference(w, x, l, im, h, rank, bits):
    """Composition the megakernel replaces: l-stacked gateup kernel, XLA
    silu/mul, dynamic int8 requant (inside the down kernel), l-stacked
    down kernel."""
    li = jnp.asarray(l)
    xr = jnp.dot(x.astype(jnp.bfloat16),
                 w["gu_R"][l].T.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32) \
        * w["gu_Rs"][l][:, 0][None, :]
    gu = Kr.quantized_matmul_w4a8_l_stacked(
        x, w["gu_packed"], w["gu_scales"], li, xr, w["gu_L"], w["gu_Ls"],
        num_bits=bits, rank=rank, splits=(im, im), interpret=True)
    m = jax.nn.silu(gu[:, :im] * w["gu_gs"][l, 0]) \
        * (gu[:, im:] * w["gu_gs"][l, 1])
    xr_d = jnp.dot(m.astype(jnp.bfloat16),
                   w["dn_R"][l].T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) \
        * w["dn_Rs"][l][:, 0][None, :]
    return Kr.quantized_matmul_w4a8_l_stacked(
        m, w["dn_packed"], w["dn_scales"], li, xr_d, w["dn_L"], w["dn_Ls"],
        num_bits=bits, rank=rank, splits=(h,), interpret=True)


class TestMlpMegakernel:
    @pytest.mark.parametrize("bits", [2, 4, 8])
    def test_matches_unfused_composition(self, bits):
        rng = np.random.default_rng(0)
        L, h, im, rank, M = 2, 128, 256, 128, 3
        w = _mk_mlp_weights(rng, L, h, im, rank, bits)
        x = jnp.asarray(rng.standard_normal((M, h)), jnp.float32)
        for l in range(L):
            ref = _unfused_reference(w, x, l, im, h, rank, bits)
            got = Kr.quantized_matmul_w4a8_mlp_stacked(
                x, w["gu_packed"], w["gu_scales"], jnp.asarray(l),
                jnp.dot(x.astype(jnp.bfloat16),
                        w["gu_R"][l].T.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                * w["gu_Rs"][l][:, 0][None, :],
                w["gu_L"], w["gu_Ls"], w["gu_gs"], w["dn_packed"],
                w["dn_scales"], w["dn_R"], w["dn_Rs"], w["dn_L"],
                w["dn_Ls"], num_bits=bits, rank=rank, interpret=True)
            ref, got = np.asarray(ref), np.asarray(got)
            rel = (np.linalg.norm(got - ref)
                   / max(np.linalg.norm(ref), 1e-9))
            assert rel < 2e-3, (bits, l, rel)

    def test_support_gating(self):
        assert Kr.mlp_stacked_supported(256, 128, 128, 4)
        assert not Kr.mlp_stacked_supported(256, 128, 8, 4)   # rank misalign


def _rank128_fused_model():
    """Bench-style TINY model with rank-128 factors (megakernel-eligible)."""
    import bench
    sp = bench.build_compressed_llama_params(TINY, num_bits=4, rank=128,
                                             mode="w4a8")
    return fusedm.quantize_factors_int8_fused(
        fusedm.fuse_stacked(sp), fuse_factor_kernel="l")


class TestFusedDecodeMlpKernel:
    def test_decode_matches_unfused_path(self):
        fp = _rank128_fused_model()
        assert fusedm._mlp_kernel_supported(fp)
        toks = jnp.asarray([1, 5], jnp.int32)
        pos = jnp.asarray([3, 6], jnp.int32)
        ca = llama.HeadMajorQuantKVCache.create(TINY, 2, 16)
        cb = llama.HeadMajorQuantKVCache.create(TINY, 2, 16)
        la, ca = fusedm.decode_step_fused(fp, toks, pos, ca, TINY,
                                          interpret=True)
        lb, cb = fusedm.decode_step_fused(fp, toks, pos, cb, TINY,
                                          interpret=True, mlp_kernel=True)
        rel = (np.linalg.norm(np.asarray(lb - la))
               / np.linalg.norm(np.asarray(la)))
        assert rel < 1e-3, rel
        np.testing.assert_array_equal(np.asarray(ca.k), np.asarray(cb.k))

    def test_generation_consistency(self):
        fp = _rank128_fused_model()
        seqs = {}
        for mlp in (False, True):
            cache = llama.HeadMajorQuantKVCache.create(TINY, 1, 32)
            tok = jnp.asarray([7], jnp.int32)
            out = []
            for step in range(5):
                pos = jnp.asarray([2 + step], jnp.int32)
                logits, cache = fusedm.decode_step_fused(
                    fp, tok, pos, cache, TINY, interpret=True,
                    mlp_kernel=mlp)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                out.append(int(tok[0]))
            seqs[mlp] = out
        assert seqs[True] == seqs[False]

    def test_rejects_unsupported_params(self):
        import bench
        sp = bench.build_compressed_llama_params(TINY, num_bits=4, rank=8,
                                                 mode="w4a8")
        fp = fusedm.fuse_stacked(sp)          # bf16 factors, rank 8
        cache = llama.HeadMajorQuantKVCache.create(TINY, 1, 16)
        with pytest.raises(ValueError, match="mlp_kernel"):
            fusedm.decode_step_fused(
                fp, jnp.asarray([1], jnp.int32), jnp.asarray([0], jnp.int32),
                cache, TINY, interpret=True, mlp_kernel=True)
