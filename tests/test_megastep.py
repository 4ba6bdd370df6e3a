"""Persistent whole-step megakernel vs the fused per-kernel decode path.

The megakernel must reproduce decode_step_fused's staged-KV decode to
float-accumulation noise (its only intentional numerics change is the
bf16-staged, per-ROW int8 requantization of the gate/up->down
intermediate — one scale per row, absmax on the f32 values), and its
committed KV cache must match bit-exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import (
    compressed, fused as fusedm, llama, persistent, stacked)
from ee274_convexcaldera_llm_quantization_tpu.models.config import (
    TINY, TINY_MHA)
from ee274_convexcaldera_llm_quantization_tpu.models.llama import (
    LayerParams)


def _compressed_fused(cfg, num_bits=4, rank=128, seed=0):
    params = llama.init_params(jax.random.PRNGKey(seed), cfg)

    def conv(lp):
        fields = {}
        for name in LayerParams._fields:
            lin = getattr(lp, name)
            if isinstance(lin, compressed.DenseLinear) and \
                    not name.endswith("_norm"):
                m, k = lin.w.shape
                r = min(rank, m, k)
                fields[name] = compressed.compress_linear(
                    lin.w.astype(jnp.float32) * 0.9,
                    0.1 * jnp.eye(m, r), 0.1 * jnp.eye(r, k),
                    num_bits, mode="w4a8", bias=lin.b)
            else:
                fields[name] = lin
        return LayerParams(**fields)

    model = llama.ModelParams(
        embed=params.embed, layers=[conv(lp) for lp in params.layers],
        final_norm=params.final_norm, lm_head=params.lm_head)
    sp = stacked.stack_layers(model)
    return fusedm.quantize_factors_int8_fused(
        fusedm.fuse_stacked(sp), fuse_factor_kernel="l")


class TestMegastep:
    def test_supported_matrix(self):
        fp = _compressed_fused(TINY_MHA)
        assert persistent.persistent_supported(fp, TINY_MHA)
        # GQA tiny config must be rejected
        fp_gqa = _compressed_fused(TINY, rank=8)
        assert not persistent.persistent_supported(fp_gqa, TINY)

    @pytest.mark.parametrize("posvals", [(6, 6), (0, 9)])
    def test_matches_fused_staged(self, posvals):
        cfg = TINY_MHA
        fp = _compressed_fused(cfg)
        toks = jnp.asarray([3, 7], jnp.int32)
        pos = jnp.asarray(posvals, jnp.int32)
        ca = llama.HeadMajorQuantKVCache.create(cfg, 2, 128)
        cb = llama.HeadMajorQuantKVCache.create(cfg, 2, 128)
        # seed the caches with identical random history
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
        kk = jax.random.randint(k1, ca.k.shape, -127, 128, jnp.int32)
        vv = jax.random.randint(k2, ca.k.shape, -127, 128, jnp.int32)
        sck = jax.random.uniform(k3, ca.k_scale.shape, jnp.float32,
                                 0.001, 0.02)
        scv = jax.random.uniform(k4, ca.k_scale.shape, jnp.float32,
                                 0.001, 0.02)
        ca = llama.HeadMajorQuantKVCache(kk.astype(jnp.int8),
                                         vv.astype(jnp.int8), sck, scv)
        cb = llama.HeadMajorQuantKVCache(jnp.array(kk, jnp.int8),
                                         jnp.array(vv, jnp.int8),
                                         jnp.array(sck), jnp.array(scv))
        la, ca2 = fusedm.decode_step_fused(fp, toks, pos, ca, cfg,
                                           interpret=True, staged_kv=True)
        lb, cb2 = persistent.decode_step_persistent(fp, toks, pos, cb, cfg,
                                                    interpret=True,
                                                    staged_kv="on")
        # the megakernel's gate/up->down intermediate stages through bf16
        # before its per-row int8 requant (fused path requants the f32
        # values directly), so logits agree only to quantization noise
        # (~1-3% rel); the tight exactness check against the per-row spec
        # is test_mlp_matches_requant_reference
        rel = (np.linalg.norm(np.asarray(lb - la))
               / max(np.linalg.norm(np.asarray(la)), 1e-9))
        assert rel < 0.05, rel
        assert (np.argmax(np.asarray(la), -1)
                == np.argmax(np.asarray(lb), -1)).all()
        # layer 0 sees IDENTICAL inputs in both paths -> its committed
        # codes must match bit-exactly (rope/quantize/projection parity);
        # later layers' inputs differ by the layer-0 MLP quantization
        # scheme, so their codes may differ at rounding boundaries
        np.testing.assert_array_equal(np.asarray(ca2.k[0]),
                                      np.asarray(cb2.k[0]))
        np.testing.assert_array_equal(np.asarray(ca2.v[0]),
                                      np.asarray(cb2.v[0]))
        np.testing.assert_allclose(np.asarray(ca2.k_scale[0]),
                                   np.asarray(cb2.k_scale[0]), rtol=1e-6)
        mism = (np.asarray(ca2.k) != np.asarray(cb2.k)).mean()
        assert mism < 0.01, mism

    def test_mlp_matches_requant_reference(self):
        # exactness: the megakernel must reproduce ITS spec (bf16-staged
        # intermediate, per-row int8 requant) to float-accumulation noise
        import dataclasses as dc
        cfg = dc.replace(TINY_MHA, num_layers=1)
        fp = _compressed_fused(cfg)
        lp = fp.layers
        toks = jnp.asarray([3, 7], jnp.int32)
        pos = jnp.asarray([0, 0], jnp.int32)
        B = 2
        x0 = fp.embed[toks].astype(jnp.float32)
        y = llama.rms_norm(x0[:, None, :], lp.attn_norm[0],
                           cfg.rms_norm_eps)[:, 0]
        q, k, v = fusedm._apply_fused(lp.qkv, jnp.int32(0), y, True)
        cos, sin = llama.rope_tables(cfg, pos[:, None])
        vq, vsc = llama.quantize_kv(v.reshape(B, 1, 4, 128)[:, 0])
        ao = (vq.astype(jnp.float32) * vsc[..., None]).reshape(B, 512)
        x = x0 + fusedm._apply_plain(lp.o_proj, jnp.int32(0), ao, True,
                                     "l")
        y2 = llama.rms_norm(x[:, None, :], lp.mlp_norm[0],
                            cfg.rms_norm_eps)[:, 0]
        gate, up = fusedm._apply_fused(lp.gateup, jnp.int32(0), y2, True)
        # gate+up run in one interleaved program (gate stays f32); only
        # the silu-mul intermediate stages through bf16 (VMEM budget);
        # requant is per-row with the absmax taken on the f32 values
        m = jax.nn.silu(gate) * up
        amax = np.maximum(np.abs(np.asarray(m)).max(1, keepdims=True),
                          1e-12)
        s = amax / 127
        mb = np.asarray(m.astype(jnp.bfloat16).astype(jnp.float32))
        m8 = np.clip(np.round(mb / s), -127, 127)
        md = m8 * s
        dn = lp.down_proj
        pk = np.asarray(dn.packed[0]).astype(np.int32)
        codes = np.concatenate([(pk >> 4) & 0xF, pk & 0xF],
                               1).astype(np.float64) - 7
        W = codes * np.asarray(dn.scales[0]).astype(np.float64)
        yd = md.astype(np.float64) @ W.T
        xr = np.asarray(
            jnp.dot(m.astype(jnp.bfloat16),
                    dn.R[0].astype(jnp.float32).astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)
            * dn.R_scale[0][:, 0][None, :])
        ylr = np.asarray(
            jnp.dot(jnp.asarray(xr).astype(jnp.bfloat16),
                    dn.L[0].astype(jnp.float32).astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)
            * dn.L_scale[0][:, 0][None, :])
        x_ref = np.asarray(x) + (yd + ylr) * np.asarray(dn.global_scale[0])
        logits_ref = llama._logits(
            jnp.asarray(x_ref, jnp.float32)[:, None, :],
            llama.ModelParams(fp.embed, [], fp.final_norm, fp.lm_head),
            cfg, False, True)[:, 0]
        cb = llama.HeadMajorQuantKVCache.create(cfg, 2, 128)
        lb, _ = persistent.decode_step_persistent(fp, toks, pos, cb, cfg,
                                                  interpret=True,
                                                  staged_kv="on")
        rel = float(jnp.linalg.norm(lb - logits_ref)
                    / jnp.linalg.norm(logits_ref))
        assert rel < 1e-5, rel

    def test_full_batch_rows(self):
        # B = 8 (the bench batch): every row must decode correctly (the
        # Mosaic sub-8-row concat miscompile corrupted row 1 at B=2; the
        # expansion-matmul fix must hold rows 0..7)
        cfg = TINY_MHA
        fp = _compressed_fused(cfg, seed=4)
        B = 8
        toks = jnp.arange(1, B + 1, dtype=jnp.int32)
        pos = jnp.full((B,), 5, jnp.int32)
        ca = llama.HeadMajorQuantKVCache.create(cfg, B, 128)
        cb = llama.HeadMajorQuantKVCache.create(cfg, B, 128)
        la, ca2 = fusedm.decode_step_fused(fp, toks, pos, ca, cfg,
                                           interpret=True, staged_kv=True)
        lb, cb2 = persistent.decode_step_persistent(fp, toks, pos, cb, cfg,
                                                    interpret=True,
                                                    staged_kv="on")
        # random-model near-ties can flip an argmax under the documented
        # bf16 intermediate staging; require a large majority, exact
        # layer-0 codes, and a tight per-row bound for every row
        match = (np.argmax(np.asarray(la), -1)
                 == np.argmax(np.asarray(lb), -1)).mean()
        assert match >= 0.75, match
        np.testing.assert_array_equal(np.asarray(ca2.k[0]),
                                      np.asarray(cb2.k[0]))
        per_row = np.linalg.norm(np.asarray(lb - la), axis=-1) \
            / np.maximum(np.linalg.norm(np.asarray(la), axis=-1), 1e-9)
        assert (per_row < 0.05).all(), per_row

    def test_uniform_commit_guard_ragged(self):
        # "uniform" with ragged positions must still commit correctly
        cfg = TINY_MHA
        fp = _compressed_fused(cfg)
        toks = jnp.asarray([3, 7], jnp.int32)
        pos = jnp.asarray([2, 9], jnp.int32)
        ca = llama.HeadMajorQuantKVCache.create(cfg, 2, 128)
        cb = llama.HeadMajorQuantKVCache.create(cfg, 2, 128)
        _, ca2 = persistent.decode_step_persistent(fp, toks, pos, ca, cfg,
                                                   interpret=True,
                                                   staged_kv="on")
        _, cb2 = persistent.decode_step_persistent(fp, toks, pos, cb, cfg,
                                                   interpret=True,
                                                   staged_kv="uniform")
        np.testing.assert_array_equal(np.asarray(ca2.k), np.asarray(cb2.k))

    def test_multi_step_generation_matches(self):
        # several chained steps: caches diverge => tokens diverge; assert
        # greedy continuation equality across paths
        cfg = TINY_MHA
        fp = _compressed_fused(cfg, seed=2)
        B = 2
        ca = llama.HeadMajorQuantKVCache.create(cfg, B, 128)
        cb = llama.HeadMajorQuantKVCache.create(cfg, B, 128)
        ta = tb = jnp.asarray([11, 23], jnp.int32)
        outa, outb = [], []
        for i in range(4):
            pos = jnp.full((B,), i, jnp.int32)
            la, ca = fusedm.decode_step_fused(fp, ta, pos, ca, cfg,
                                              interpret=True,
                                              staged_kv="uniform")
            lb, cb = persistent.decode_step_persistent(fp, tb, pos, cb, cfg,
                                                       interpret=True)
            ta = jnp.argmax(la, -1).astype(jnp.int32)
            tb = jnp.argmax(lb, -1).astype(jnp.int32)
            outa.append(np.asarray(ta))
            outb.append(np.asarray(tb))
        np.testing.assert_array_equal(np.stack(outa), np.stack(outb))
