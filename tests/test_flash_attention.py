"""Flash decode attention: Pallas kernel vs XLA twin, head-major layout
equivalence vs the token-major int8 attention, and fused-path integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import fused as fusedm
from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.ops import attention as AT


def _random_cache(key, L, B, KVH, T, D):
    ks = jax.random.split(key, 4)
    k = jax.random.randint(ks[0], (L, B, KVH, T, D), -127, 128, jnp.int32)
    v = jax.random.randint(ks[1], (L, B, KVH, T, D), -127, 128, jnp.int32)
    ksc = jax.random.uniform(ks[2], (L, B, KVH, T), jnp.float32, 0.001, 0.02)
    vsc = jax.random.uniform(ks[3], (L, B, KVH, T), jnp.float32, 0.001, 0.02)
    return (k.astype(jnp.int8), v.astype(jnp.int8), ksc, vsc)


class TestFlashDecodeKernel:
    @pytest.mark.parametrize("B,KVH,G,D,T", [
        (2, 2, 1, 32, 64),      # MHA
        (2, 2, 2, 32, 64),      # GQA
        (1, 1, 4, 128, 256),    # wide group, full lanes
    ])
    def test_kernel_matches_xla_twin(self, B, KVH, G, D, T):
        L = 3
        q = jax.random.normal(jax.random.PRNGKey(0), (B, KVH, G, D),
                              jnp.float32)
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(1), L, B, KVH, T, D)
        pos = jnp.asarray(
            np.random.default_rng(2).integers(0, T, size=B), jnp.int32)
        layer = jnp.asarray(1, jnp.int32)
        ref = AT.flash_decode_q8_xla(q, k, v, ksc, vsc, layer, pos)
        out = AT.flash_decode_q8(q, k, v, ksc, vsc, layer, pos,
                                 block_t=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_single_block_and_uneven_blocks(self):
        # block_t > T collapses to one block; T not divisible halves block_t
        B, KVH, G, D, T = 1, 2, 1, 32, 48
        q = jax.random.normal(jax.random.PRNGKey(3), (B, KVH, G, D))
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(4), 2, B, KVH, T, D)
        pos = jnp.asarray([T - 1], jnp.int32)
        layer = jnp.asarray(0, jnp.int32)
        ref = AT.flash_decode_q8_xla(q, k, v, ksc, vsc, layer, pos)
        for bt in (256, 24):
            out = AT.flash_decode_q8(q, k, v, ksc, vsc, layer, pos,
                                     block_t=bt, interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-6)

    def test_pos_zero_attends_only_first_token(self):
        # with pos=0 the output must be exactly v[0] dequantized
        B, KVH, G, D, T = 1, 1, 1, 32, 64
        q = jax.random.normal(jax.random.PRNGKey(5), (B, KVH, G, D))
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(6), 1, B, KVH, T, D)
        out = AT.flash_decode_q8(q, k, v, ksc, vsc, jnp.asarray(0),
                                 jnp.asarray([0], jnp.int32),
                                 block_t=16, interpret=True)
        expect = (v[0, 0, 0, 0].astype(np.float32)
                  * float(vsc[0, 0, 0, 0]))
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expect,
                                   rtol=1e-6)

    def test_layer_selection(self):
        # answers must come from the requested layer of the stacked cache
        B, KVH, G, D, T = 1, 1, 1, 32, 32
        q = jax.random.normal(jax.random.PRNGKey(7), (B, KVH, G, D))
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(8), 4, B, KVH, T, D)
        pos = jnp.asarray([T - 1], jnp.int32)
        outs = [np.asarray(AT.flash_decode_q8(
            q, k, v, ksc, vsc, jnp.asarray(i), pos, interpret=True))
            for i in range(4)]
        refs = [np.asarray(AT.flash_decode_q8_xla(
            q, k, v, ksc, vsc, jnp.asarray(i), pos)) for i in range(4)]
        for o, r in zip(outs, refs):
            np.testing.assert_allclose(o, r, rtol=2e-5, atol=2e-6)
        assert not np.allclose(outs[0], outs[1])

    def test_xla_twin_matches_token_major_attention(self):
        # head-major attention == llama._attention_q8 on the same data
        B, KVH, G, D, T = 2, 2, 2, 16, 8
        H = KVH * G
        q = jax.random.normal(jax.random.PRNGKey(9), (B, 1, H, D))
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(10), 1, B, KVH,
                                       T, D)
        pos = jnp.asarray([3, T - 1], jnp.int32)
        mask = jnp.where(jnp.arange(T)[None, :] <= pos[:, None], 0.0,
                         -1e30)[:, None, None, None, :]
        ref = llama._attention_q8(
            q, k[0].transpose(0, 2, 1, 3), v[0].transpose(0, 2, 1, 3),
            ksc[0].transpose(0, 2, 1), vsc[0].transpose(0, 2, 1),
            mask).reshape(B, H, D)
        out = AT.flash_decode_q8_xla(
            q[:, 0].reshape(B, KVH, G, D), k, v, ksc, vsc,
            jnp.asarray(0), pos).reshape(B, H, D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


def _causal_ref(q, k, v):
    """XLA causal self-attention reference (llama._attention with the
    dense tril mask) in f32."""
    S = q.shape[1]
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    mask = jnp.where(causal, 0.0, -1e30)[None, None, None, :, :]
    return llama._attention(q.astype(jnp.float32), k.astype(jnp.float32),
                            v.astype(jnp.float32), mask)


class TestFlashDecodeStaged:
    def test_staged_matches_inline(self):
        # staged variant (current token's K/V as extra inputs, cache holds
        # tokens < pos) must equal the inline kernel whose cache already
        # contains the token at pos
        L, B, KVH, G, D, T = 3, 2, 2, 2, 32, 64
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, KVH, G, D), jnp.float32)
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(1), L, B, KVH,
                                       T, D)
        pos = jnp.asarray([17, 40], jnp.int32)
        layer = jnp.asarray(1, jnp.int32)
        # inline reference: cache[pos] is the "new" token
        ref = AT.flash_decode_q8(q, k, v, ksc, vsc, layer, pos,
                                 block_t=32, interpret=True)
        # staged: extract the at-pos entries into staging arrays; the cache
        # content at pos is then irrelevant (mask tok < pos)
        rows = jnp.arange(B)
        # staged inputs are dequantized f32 (code * scale)
        k_new = jnp.stack(
            [k[l, rows, :, pos].astype(jnp.float32)
             * ksc[l, rows, :, pos][..., None] for l in range(L)])
        v_new = jnp.stack(
            [v[l, rows, :, pos].astype(jnp.float32)
             * vsc[l, rows, :, pos][..., None] for l in range(L)])
        # poison the cache at pos to prove it is not read
        k_p = k.at[:, rows, :, pos].set(127)
        v_p = v.at[:, rows, :, pos].set(127)
        out = AT.flash_decode_q8_staged(
            q, k_p, v_p, ksc, vsc, k_new, v_new, layer,
            pos, block_t=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_staged_pos_zero(self):
        # pos == 0: no cache tokens; attention must equal softmax over the
        # single staged token (i.e. its V row, dequantized)
        L, B, KVH, G, D, T = 2, 1, 2, 2, 32, 64
        q = jax.random.normal(jax.random.PRNGKey(3), (B, KVH, G, D))
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(4), L, B, KVH,
                                       T, D)
        pos = jnp.asarray([0], jnp.int32)
        kn = jnp.full((L, B, KVH, D), 0.01, jnp.float32)
        vn = jnp.full((L, B, KVH, D), 0.03, jnp.float32)
        out = AT.flash_decode_q8_staged(
            q, k, v, ksc, vsc, kn, vn, jnp.asarray(0), pos,
            block_t=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.full((B, KVH, G, D), 0.03),
                                   rtol=1e-5, atol=1e-6)

    def test_decode_step_staged_matches_inline(self, ):
        cfg = TINY
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        from ee274_convexcaldera_llm_quantization_tpu.models import (
            compressed, stacked)
        from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
            LayerParams)

        def conv(lp):
            fields = {}
            for name in LayerParams._fields:
                lin = getattr(lp, name)
                if isinstance(lin, compressed.DenseLinear) and \
                        not name.endswith("_norm"):
                    fields[name] = compressed.compress_linear(
                        lin.w.astype(jnp.float32) * 0.9,
                        0.1 * jnp.eye(lin.w.shape[0], 8),
                        0.1 * jnp.eye(8, lin.w.shape[1]), 4, mode="w4a8",
                        bias=lin.b)
                else:
                    fields[name] = lin
            return LayerParams(**fields)

        model = llama.ModelParams(
            embed=params.embed, layers=[conv(lp) for lp in params.layers],
            final_norm=params.final_norm, lm_head=params.lm_head)
        sp = stacked.stack_layers(model)
        fp = fusedm.quantize_factors_int8_fused(fusedm.fuse_stacked(sp))
        toks = jnp.asarray([1, 5], jnp.int32)
        pos = jnp.asarray([3, 6], jnp.int32)
        ca = llama.HeadMajorQuantKVCache.create(cfg, 2, 16)
        cb = llama.HeadMajorQuantKVCache.create(cfg, 2, 16)
        la, ca2 = fusedm.decode_step_fused(fp, toks, pos, ca, cfg,
                                           interpret=True)
        lb, cb2 = fusedm.decode_step_fused(fp, toks, pos, cb, cfg,
                                           interpret=True, staged_kv=True)
        rel = (np.linalg.norm(np.asarray(lb - la))
               / np.linalg.norm(np.asarray(la)))
        assert rel < 0.05
        # committed caches identical (same int8 codes land at pos)
        np.testing.assert_array_equal(np.asarray(ca2.k), np.asarray(cb2.k))
        np.testing.assert_array_equal(np.asarray(ca2.v), np.asarray(cb2.v))


class TestFlashDecodeAllBatch:
    @pytest.mark.parametrize("B,KVH,G,D,T", [
        (4, 2, 1, 32, 64),      # MHA
        (2, 2, 2, 32, 64),      # GQA
        (8, 2, 1, 128, 256),    # full lanes, multi b-block candidates
    ])
    def test_inline_matches_xla_twin(self, B, KVH, G, D, T):
        L = 3
        q = jax.random.normal(jax.random.PRNGKey(0), (B, KVH, G, D),
                              jnp.float32)
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(1), L, B, KVH,
                                       T, D)
        pos = jnp.asarray(
            np.random.default_rng(2).integers(0, T, size=B), jnp.int32)
        layer = jnp.asarray(1, jnp.int32)
        ref = AT.flash_decode_q8_xla(q, k, v, ksc, vsc, layer, pos)
        dummy = jnp.zeros((B, KVH, D), jnp.float32)
        out = AT.flash_decode_q8_ab(q, k, v, ksc, vsc, dummy, dummy,
                                    layer, pos, staged=False,
                                    block_t=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_staged_matches_row_staged(self):
        L, B, KVH, G, D, T = 2, 4, 2, 2, 32, 64
        q = jax.random.normal(jax.random.PRNGKey(5), (B, KVH, G, D))
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(6), L, B, KVH,
                                       T, D)
        pos = jnp.asarray([0, 17, 40, 63], jnp.int32)
        kn = jax.random.normal(jax.random.PRNGKey(7), (B, KVH, D))
        vn = jax.random.normal(jax.random.PRNGKey(8), (B, KVH, D))
        layer = jnp.asarray(1, jnp.int32)
        ref = AT.flash_decode_q8_staged(q, k, v, ksc, vsc, kn, vn, layer,
                                        pos, block_t=32, interpret=True)
        out = AT.flash_decode_q8_ab(q, k, v, ksc, vsc, kn, vn, layer, pos,
                                    staged=True, block_t=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_slab_shape_picker_bounds_vmem(self):
        # the chosen (Bb, bt) must divide (B, T), satisfy the Mosaic
        # last-dim rule (bt % 128 == 0 or bt == T), and keep the int8 K
        # slab under the budget whenever any compliant shape can
        for B, KVH, D, T in [(8, 32, 128, 256), (32, 32, 128, 2048),
                             (1, 2, 64, 64), (8, 40, 128, 4096),
                             (4, 2, 32, 48)]:
            Bb, bt = AT._ab_blocks(B, KVH, D, T, 64)
            assert B % Bb == 0 and T % bt == 0
            assert bt % 128 == 0 or bt == T
            if B * KVH * max(128, bt) * D > 2 << 20:
                assert Bb * KVH * bt * D <= 2 << 20 or Bb == 1

    def test_decode_step_ab_matches_row(self):
        cfg = TINY
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        from ee274_convexcaldera_llm_quantization_tpu.models import (
            compressed, stacked)
        from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
            LayerParams)

        def conv(lp):
            fields = {}
            for name in LayerParams._fields:
                lin = getattr(lp, name)
                if isinstance(lin, compressed.DenseLinear) and \
                        not name.endswith("_norm"):
                    fields[name] = compressed.compress_linear(
                        lin.w.astype(jnp.float32) * 0.9,
                        0.1 * jnp.eye(lin.w.shape[0], 8),
                        0.1 * jnp.eye(8, lin.w.shape[1]), 4, mode="w4a8",
                        bias=lin.b)
                else:
                    fields[name] = lin
            return LayerParams(**fields)

        model = llama.ModelParams(
            embed=params.embed, layers=[conv(lp) for lp in params.layers],
            final_norm=params.final_norm, lm_head=params.lm_head)
        sp = stacked.stack_layers(model)
        fp = fusedm.quantize_factors_int8_fused(fusedm.fuse_stacked(sp))
        toks = jnp.asarray([1, 5], jnp.int32)
        pos = jnp.asarray([3, 6], jnp.int32)
        for staged in (False, True, "uniform"):
            p = jnp.full((2,), 6, jnp.int32) if staged == "uniform" else pos
            ca = llama.HeadMajorQuantKVCache.create(cfg, 2, 16)
            cb = llama.HeadMajorQuantKVCache.create(cfg, 2, 16)
            la, ca2 = fusedm.decode_step_fused(
                fp, toks, p, ca, cfg, interpret=True, staged_kv=staged)
            lb, cb2 = fusedm.decode_step_fused(
                fp, toks, p, cb, cfg, interpret=True, staged_kv=staged,
                attn_kernel="ab")
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_array_equal(np.asarray(ca2.k),
                                          np.asarray(cb2.k))
            assert (np.argmax(np.asarray(la), -1)
                    == np.argmax(np.asarray(lb), -1)).all()


class TestFlashPrefillKernel:
    @pytest.mark.parametrize("B,KVH,G,D,S,bq,bk", [
        (2, 2, 1, 32, 64, 16, 16),     # MHA, multiple k blocks per q block
        (1, 2, 2, 32, 64, 32, 16),     # GQA, block_q != block_k
        (1, 1, 4, 128, 128, 128, 128), # single block, full lanes
        (2, 1, 2, 32, 48, 16, 32),     # block_k > block_q
    ])
    def test_matches_xla_causal(self, B, KVH, G, D, S, bq, bk):
        H = KVH * G
        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, KVH, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, KVH, D), jnp.float32)
        ref = _causal_ref(q, k, v)
        out = AT.flash_prefill(q, k, v, block_q=bq, block_k=bk,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_padded_sequence(self):
        # S not divisible by the block sizes exercises the lcm padding and
        # the padded-row guard (padded rows must not produce NaN/inf that
        # leak into real rows)
        B, KVH, G, D, S = 1, 2, 2, 32, 40
        ks = jax.random.split(jax.random.PRNGKey(12), 3)
        q = jax.random.normal(ks[0], (B, S, KVH * G, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, KVH, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, KVH, D), jnp.float32)
        ref = _causal_ref(q, k, v)
        for bq, bk in [(16, 16), (16, 32), (64, 64)]:
            out = AT.flash_prefill(q, k, v, block_q=bq, block_k=bk,
                                   interpret=True)
            assert np.all(np.isfinite(np.asarray(out)))
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-6)

    def test_first_token_attends_only_itself(self):
        # row 0 of a causal prefill must equal v[0] exactly
        B, KVH, G, D, S = 1, 1, 1, 32, 32
        ks = jax.random.split(jax.random.PRNGKey(13), 3)
        q = jax.random.normal(ks[0], (B, S, KVH * G, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, KVH, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, KVH, D), jnp.float32)
        out = AT.flash_prefill(q, k, v, block_q=8, block_k=8,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                                   np.asarray(v[0, 0, 0]), rtol=1e-6)


@pytest.fixture(scope="module")
def fused_params():
    from ee274_convexcaldera_llm_quantization_tpu.models import stacked
    from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
        CalderaLinear, compress_linear)
    from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
        compress_model)
    from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
        CalderaParams)

    params = llama.init_params(jax.random.PRNGKey(0), TINY)
    cp = CalderaParams(Q_bits=4, L_bits=16, R_bits=16, rank=8, iters=1,
                       lplr_iters=1)
    qparams, _ = compress_model(params, cp)

    def convert(lp):
        fields = {}
        for name in llama.LayerParams._fields:
            lin = getattr(lp, name)
            if isinstance(lin, CalderaLinear):
                W = (lin.materialize() / lin.global_scale
                     - lin.L.astype(jnp.float32) @ lin.R.astype(jnp.float32))
                fields[name] = compress_linear(
                    W, lin.L.astype(jnp.float32), lin.R.astype(jnp.float32),
                    lin.num_bits, global_scale=float(lin.global_scale),
                    bias=lin.b, mode="w4a8")
            else:
                fields[name] = lin
        return llama.LayerParams(**fields)

    model = llama.ModelParams(embed=qparams.embed,
                              layers=[convert(lp) for lp in qparams.layers],
                              final_norm=qparams.final_norm,
                              lm_head=qparams.lm_head)
    return fusedm.fuse_stacked(stacked.stack_layers(model))


class TestFusedHeadMajor:
    def test_decode_matches_token_major_cache(self, fused_params):
        toks = jnp.asarray([1, 2], jnp.int32)
        pos = jnp.asarray([3, 5], jnp.int32)
        ctm = llama.QuantKVCache.create(TINY, 2, 16)
        chm = llama.HeadMajorQuantKVCache.create(TINY, 2, 16)
        ltm, ctm = fusedm.decode_step_fused(fused_params, toks, pos, ctm,
                                            TINY, interpret=True)
        lhm, chm = fusedm.decode_step_fused(fused_params, toks, pos, chm,
                                            TINY, interpret=True)
        assert isinstance(chm, llama.HeadMajorQuantKVCache)
        np.testing.assert_allclose(np.asarray(lhm), np.asarray(ltm),
                                   rtol=2e-4, atol=2e-5)
        # cache contents identical modulo layout transpose
        np.testing.assert_array_equal(
            np.asarray(chm.k), np.asarray(ctm.k).transpose(0, 1, 3, 2, 4))
        np.testing.assert_allclose(
            np.asarray(chm.k_scale),
            np.asarray(ctm.k_scale).transpose(0, 1, 3, 2))

    def test_prefill_matches_token_major_cache(self, fused_params):
        toks = jax.random.randint(jax.random.PRNGKey(5), (1, 8), 0,
                                  TINY.vocab_size)
        ctm = llama.QuantKVCache.create(TINY, 2, 16)
        chm = llama.HeadMajorQuantKVCache.create(TINY, 2, 16)
        ltm, ctm = fusedm.prefill_into_slot_fused(
            fused_params, toks, jnp.asarray(1), ctm, TINY, interpret=True)
        lhm, chm = fusedm.prefill_into_slot_fused(
            fused_params, toks, jnp.asarray(1), chm, TINY, interpret=True)
        np.testing.assert_array_equal(np.asarray(ltm), np.asarray(lhm))
        np.testing.assert_array_equal(
            np.asarray(chm.v), np.asarray(ctm.v).transpose(0, 1, 3, 2, 4))

    def test_prefill_flash_matches_xla_path(self, fused_params):
        toks = jax.random.randint(jax.random.PRNGKey(21), (1, 8), 0,
                                  TINY.vocab_size)
        c0 = llama.HeadMajorQuantKVCache.create(TINY, 2, 16)
        c1 = llama.HeadMajorQuantKVCache.create(TINY, 2, 16)
        l0, c0 = fusedm.prefill_into_slot_fused(
            fused_params, toks, jnp.asarray(1), c0, TINY, interpret=True)
        l1, c1 = fusedm.prefill_into_slot_fused(
            fused_params, toks, jnp.asarray(1), c1, TINY, interpret=True,
            flash=True)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=2e-4, atol=2e-5)
        # caches must agree (int8 codes: allow off-by-one rounding)
        assert np.max(np.abs(np.asarray(c1.k, np.int32)
                             - np.asarray(c0.k, np.int32))) <= 1
        np.testing.assert_allclose(np.asarray(c1.k_scale),
                                   np.asarray(c0.k_scale), rtol=2e-4)

    def test_prefill_then_decode_generation(self, fused_params):
        toks = jax.random.randint(jax.random.PRNGKey(7), (1, 6), 0,
                                  TINY.vocab_size)
        seqs = {}
        for name, cache in [
                ("tm", llama.QuantKVCache.create(TINY, 1, 16)),
                ("hm", llama.HeadMajorQuantKVCache.create(TINY, 1, 16))]:
            logits, cache = fusedm.prefill_into_slot_fused(
                fused_params, toks, jnp.asarray(0), cache, TINY,
                interpret=True)
            out = [int(jnp.argmax(logits))]
            pos = 6
            for _ in range(3):
                logits, cache = fusedm.decode_step_fused(
                    fused_params, jnp.asarray([out[-1]], jnp.int32),
                    jnp.asarray([pos], jnp.int32), cache, TINY,
                    interpret=True)
                out.append(int(jnp.argmax(logits[0])))
                pos += 1
            seqs[name] = out
        assert seqs["hm"] == seqs["tm"]

    def test_fast_engine_flash_attn(self, fused_params):
        from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
            Request)
        from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine import (
            FastServingEngine)
        rng = np.random.default_rng(5)
        prompts = [rng.integers(0, TINY.vocab_size, size=5),
                   rng.integers(0, TINY.vocab_size, size=9)]
        eng = FastServingEngine(fused_params, TINY, max_slots=2,
                                max_seq_len=32, interpret=True,
                                flash_attn=True)
        assert isinstance(eng.cache, llama.HeadMajorQuantKVCache)
        for uid, p in enumerate(prompts):
            eng.submit(Request(uid=uid, prompt=p, max_new_tokens=5))
        done = eng.run()
        assert sorted(c.uid for c in done) == [0, 1]
        assert all(len(c.tokens) == 5 for c in done)

    def test_fast_engine_decode_is_staged_step(self, fused_params):
        # A/B contract: the engine's decode tick must equal a direct
        # decode_step_fused(staged_kv=True) call EXACTLY (same code path),
        # so kernel wins plumbed through decode_step_fused reach serving
        from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
            Request)
        from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine \
            import FastServingEngine
        from ee274_convexcaldera_llm_quantization_tpu.models import fused

        rng = np.random.default_rng(7)
        eng = FastServingEngine(fused_params, TINY, max_slots=2,
                                max_seq_len=32, interpret=True,
                                flash_attn=True)
        assert eng._staged is True
        for uid in range(2):
            eng.submit(Request(uid=uid,
                               prompt=rng.integers(0, TINY.vocab_size,
                                                   size=4 + 3 * uid),
                               max_new_tokens=4, temperature=0.0))
        eng._admit()
        # snapshot pre-decode state, run one engine tick, and replay it
        # manually through the staged fused step
        tokens = np.zeros(eng.max_slots, np.int32)
        pos = np.zeros(eng.max_slots, np.int32)
        for s, st in eng.slots.items():
            tokens[s] = st.generated[-1]
            pos[s] = st.pos
        snap = jax.tree.map(jnp.array, eng.cache)
        eng._decode()
        ref_logits, ref_cache = fused.decode_step_fused(
            fused_params, jnp.asarray(tokens), jnp.asarray(pos), snap,
            TINY, interpret=True, staged_kv=True)
        exp = {s: int(t) for s, t in
               enumerate(np.argmax(np.asarray(ref_logits), -1))
               if s in eng.slots}
        got = {s: st.generated[-1] for s, st in eng.slots.items()}
        assert got == exp
        np.testing.assert_array_equal(np.asarray(eng.cache.k),
                                      np.asarray(ref_cache.k))

    def test_fast_engine_flash_requires_fused(self):
        from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine import (
            FastServingEngine)
        with pytest.raises(ValueError, match="flash_attn"):
            FastServingEngine(object(), TINY, max_slots=2, max_seq_len=16,
                              flash_attn=True)


class TestFusedAttnO:
    def _weights(self, rng, L, h, qdim, rank, bits):
        f = 8 // bits
        return (
            jnp.asarray(rng.integers(0, 256, (L, h, qdim // f)), jnp.uint8),
            jnp.asarray(rng.uniform(1e-3, 1e-2, (L, h, 1)), jnp.float32),
            jnp.asarray(rng.integers(-127, 128, (L, rank, qdim)), jnp.int8),
            jnp.asarray(rng.uniform(1e-4, 1e-3, (L, rank, 1)), jnp.float32),
            jnp.asarray(rng.integers(-127, 128, (L, h, rank)), jnp.int8),
            jnp.asarray(rng.uniform(1e-4, 1e-3, (L, h, 1)), jnp.float32))

    @pytest.mark.parametrize("staged", [False, True])
    def test_matches_unfused_composition(self, staged):
        from ee274_convexcaldera_llm_quantization_tpu.ops import (
            kernels as Kr)
        rng = np.random.default_rng(0)
        L, B, KVH, G, D, T, rank, bits, h = 2, 3, 4, 1, 128, 64, 128, 4, 128
        qdim = KVH * D
        q = jnp.asarray(rng.standard_normal((B, KVH, G, D)), jnp.float32)
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(1), L, B, KVH,
                                       T, D)
        ow, osc, oR, oRs, oL, oLs = self._weights(rng, L, h, qdim, rank,
                                                  bits)
        pos = jnp.asarray([5, 40, 63], jnp.int32)
        kf = jnp.asarray(rng.standard_normal((L, B, KVH, D)),
                         jnp.float32) * 0.1
        vf = jnp.asarray(rng.standard_normal((L, B, KVH, D)),
                         jnp.float32) * 0.1
        for l in range(L):
            li = jnp.asarray(l)
            if staged:
                attn = AT.flash_decode_q8_staged(
                    q, k, v, ksc, vsc, kf, vf, li, pos, block_t=32,
                    interpret=True)
            else:
                attn = AT.flash_decode_q8(q, k, v, ksc, vsc, li, pos,
                                          block_t=32, interpret=True)
            x = attn.reshape(B, qdim)
            xr = jnp.dot(x.astype(jnp.bfloat16),
                         oR[l].T.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) \
                * oRs[l][:, 0][None, :]
            ref = Kr.quantized_matmul_w4a8_l_stacked(
                x, ow, osc, li, xr, oL, oLs, num_bits=bits, rank=rank,
                splits=(h,), interpret=True)
            got = AT.flash_decode_attn_o(
                q, k, v, ksc, vsc, kf, vf, li, pos, ow, osc, oR, oRs,
                oL, oLs, num_bits=bits, rank=rank, staged=staged,
                block_t=32, interpret=True)
            rel = (np.linalg.norm(np.asarray(got) - np.asarray(ref))
                   / max(np.linalg.norm(np.asarray(ref)), 1e-9))
            assert rel < 2e-3, (staged, l, rel)

    def test_rejects_gqa(self):
        rng = np.random.default_rng(2)
        q = jnp.zeros((1, 2, 2, 128), jnp.float32)   # G = 2
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(3), 1, 1, 2,
                                       32, 128)
        ow = jnp.zeros((1, 128, 256), jnp.uint8)
        with pytest.raises(ValueError, match="MHA"):
            AT.flash_decode_attn_o(
                q, k, v, ksc, vsc,
                jnp.zeros((1, 1, 2, 128)), jnp.zeros((1, 1, 2, 128)),
                jnp.asarray(0), jnp.asarray([3], jnp.int32), ow,
                jnp.zeros((1, 128, 1)), jnp.zeros((1, 128, 512), jnp.int8),
                jnp.zeros((1, 128, 1)), jnp.zeros((1, 128, 128), jnp.int8),
                jnp.zeros((1, 128, 1)), num_bits=4, rank=128,
                interpret=True)


class TestDecodeStepAttnO:
    def _mha_model(self):
        import bench
        from ee274_convexcaldera_llm_quantization_tpu.models.config import (
            ModelConfig)
        cfg = ModelConfig(vocab_size=256, hidden_size=512,
                          intermediate_size=512, num_layers=2, num_heads=4,
                          num_kv_heads=4, head_dim=128, max_seq_len=64)
        sp = bench.build_compressed_llama_params(cfg, num_bits=4, rank=128,
                                                 mode="w4a8")
        fp = fusedm.quantize_factors_int8_fused(
            fusedm.fuse_stacked(sp), fuse_factor_kernel="l")
        return fp, cfg

    @pytest.mark.parametrize("staged", [False, True])
    def test_generation_matches_unfused(self, staged):
        fp, cfg = self._mha_model()
        assert fusedm._attn_o_kernel_supported(fp, cfg)
        seqs = {}
        for attno in (False, True):
            cache = llama.HeadMajorQuantKVCache.create(cfg, 2, 32)
            tok = jnp.asarray([3, 9], jnp.int32)
            out = []
            for step in range(4):
                pos = jnp.asarray([1 + step, 5 + step], jnp.int32)
                logits, cache = fusedm.decode_step_fused(
                    fp, tok, pos, cache, cfg, interpret=True,
                    staged_kv=staged, attn_o_kernel=attno)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                out.append([int(t) for t in tok])
            seqs[attno] = out
        assert seqs[True] == seqs[False], (staged, seqs)

    def test_rejects_gqa_config(self):
        import bench
        from ee274_convexcaldera_llm_quantization_tpu.models.config import (
            TINY)
        sp = bench.build_compressed_llama_params(TINY, num_bits=4, rank=128,
                                                 mode="w4a8")
        fp = fusedm.quantize_factors_int8_fused(
            fusedm.fuse_stacked(sp), fuse_factor_kernel="l")
        cache = llama.HeadMajorQuantKVCache.create(TINY, 1, 16)
        with pytest.raises(ValueError, match="attn_o_kernel"):
            fusedm.decode_step_fused(
                fp, jnp.asarray([1], jnp.int32),
                jnp.asarray([0], jnp.int32), cache, TINY, interpret=True,
                attn_o_kernel=True)


class TestBf16Dots:
    def test_bf16_close_to_f32(self):
        L, B, KVH, G, D, T = 2, 2, 2, 2, 32, 64
        q = jax.random.normal(jax.random.PRNGKey(0), (B, KVH, G, D),
                              jnp.float32)
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(1), L, B, KVH,
                                       T, D)
        pos = jnp.asarray([17, 60], jnp.int32)
        f32 = AT.flash_decode_q8(q, k, v, ksc, vsc, jnp.asarray(1), pos,
                                 block_t=32, interpret=True)
        bf = AT.flash_decode_q8(q, k, v, ksc, vsc, jnp.asarray(1), pos,
                                block_t=32, interpret=True, dots="bf16")
        rel = float(jnp.linalg.norm(bf - f32) / jnp.linalg.norm(f32))
        assert rel < 0.02, rel

    def test_i8_close_to_f32(self):
        # round-5 MXU-native attention (VERDICT r4 ask #2): int8 q and
        # int8 softmax probs, i32 accumulate — no KV slab cast at all
        L, B, KVH, G, D, T = 2, 2, 2, 2, 32, 64
        q = jax.random.normal(jax.random.PRNGKey(0), (B, KVH, G, D),
                              jnp.float32)
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(1), L, B, KVH,
                                       T, D)
        pos = jnp.asarray([17, 60], jnp.int32)
        f32 = AT.flash_decode_q8(q, k, v, ksc, vsc, jnp.asarray(1), pos,
                                 block_t=32, interpret=True)
        i8 = AT.flash_decode_q8(q, k, v, ksc, vsc, jnp.asarray(1), pos,
                                block_t=32, interpret=True, dots="i8")
        rel = float(jnp.linalg.norm(i8 - f32) / jnp.linalg.norm(f32))
        assert rel < 0.03, rel

    def test_staged_i8_close_to_f32(self):
        L, B, KVH, G, D, T = 2, 2, 2, 1, 32, 64
        rng = np.random.default_rng(3)
        q = jax.random.normal(jax.random.PRNGKey(2), (B, KVH, G, D))
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(3), L, B, KVH,
                                       T, D)
        kf = jnp.asarray(rng.standard_normal((B, KVH, D)),
                         jnp.float32) * 0.1
        vf = jnp.asarray(rng.standard_normal((B, KVH, D)),
                         jnp.float32) * 0.1
        pos = jnp.asarray([9, 40], jnp.int32)
        f32 = AT.flash_decode_q8_staged(q, k, v, ksc, vsc, kf, vf,
                                        jnp.asarray(0), pos, block_t=32,
                                        interpret=True)
        i8 = AT.flash_decode_q8_staged(q, k, v, ksc, vsc, kf, vf,
                                       jnp.asarray(0), pos, block_t=32,
                                       interpret=True, dots="i8")
        rel = float(jnp.linalg.norm(i8 - f32) / jnp.linalg.norm(f32))
        assert rel < 0.03, rel

    def test_ab_i8_close_to_f32(self):
        L, B, KVH, G, D, T = 2, 4, 2, 2, 32, 128
        q = jax.random.normal(jax.random.PRNGKey(4), (B, KVH, G, D),
                              jnp.float32)
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(5), L, B, KVH,
                                       T, D)
        pos = jnp.asarray([17, 60, 0, 127], jnp.int32)
        dummy = jnp.zeros((B, KVH, D), jnp.float32)
        f32 = AT.flash_decode_q8_ab(q, k, v, ksc, vsc, dummy, dummy,
                                    jnp.asarray(1), pos, staged=False,
                                    interpret=True)
        i8 = AT.flash_decode_q8_ab(q, k, v, ksc, vsc, dummy, dummy,
                                   jnp.asarray(1), pos, staged=False,
                                   interpret=True, dots="i8")
        rel = float(jnp.linalg.norm(i8 - f32) / jnp.linalg.norm(f32))
        assert rel < 0.03, rel

    def test_staged_bf16_close_to_f32(self):
        L, B, KVH, G, D, T = 2, 2, 2, 1, 32, 64
        rng = np.random.default_rng(3)
        q = jax.random.normal(jax.random.PRNGKey(2), (B, KVH, G, D))
        k, v, ksc, vsc = _random_cache(jax.random.PRNGKey(3), L, B, KVH,
                                       T, D)
        kf = jnp.asarray(rng.standard_normal((B, KVH, D)),
                         jnp.float32) * 0.1
        vf = jnp.asarray(rng.standard_normal((B, KVH, D)),
                         jnp.float32) * 0.1
        pos = jnp.asarray([9, 40], jnp.int32)
        f32 = AT.flash_decode_q8_staged(q, k, v, ksc, vsc, kf, vf,
                                        jnp.asarray(0), pos, block_t=32,
                                        interpret=True)
        bf = AT.flash_decode_q8_staged(q, k, v, ksc, vsc, kf, vf,
                                       jnp.asarray(0), pos, block_t=32,
                                       interpret=True, dots="bf16")
        rel = float(jnp.linalg.norm(bf - f32) / jnp.linalg.norm(f32))
        assert rel < 0.02, rel


class TestPersistentProjKernel:
    def test_persistent_matches_grid_greedy(self):
        # round-5 manual-DMA o/down projection kernel: same greedy tokens
        import bench
        from ee274_convexcaldera_llm_quantization_tpu.models.config import (
            TINY_MHA)
        sp = bench.build_compressed_llama_params(TINY_MHA, num_bits=4,
                                                 rank=16, mode="w4a8")
        fp = fusedm.fuse_stacked(sp)
        outs = {}
        for pk in ("grid", "persistent"):
            cache = llama.HeadMajorQuantKVCache.create(TINY_MHA, 2, 16)
            tok = jnp.asarray([1, 2], jnp.int32)
            seq = []
            for step in range(3):
                pos = jnp.asarray([2 + step, 4 + step], jnp.int32)
                logits, cache = fusedm.decode_step_fused(
                    fp, tok, pos, cache, TINY_MHA, interpret=True,
                    staged_kv=True, proj_kernel=pk)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                seq.append([int(t) for t in tok])
            outs[pk] = (seq, np.asarray(logits))
        assert outs["grid"][0] == outs["persistent"][0]
        np.testing.assert_array_equal(outs["grid"][1],
                                      outs["persistent"][1])
