"""Numerical parity against the actual reference implementation.

These tests import and RUN the reference's torch code (read-only mount at
/root/reference) on the same inputs as our JAX solver and compare outcomes.
They are skipped when the reference checkout is absent, so the suite stays
self-contained; when present they are the strongest parity evidence:
identical algorithms must land at matching decomposition errors.

BASELINE.json config 1 equivalent: synthetic weight matrix + a real
diagonal Hessian from the shipped ``diag_Hessians.pt``.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/rank-constrained-regression-main"
HESSIANS = "/root/reference/diag_Hessians.pt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def reference_modules():
    sys.path.insert(0, REF)
    import importlib
    alg = importlib.import_module("src.caldera.decomposition.alg")
    dc = importlib.import_module("src.caldera.utils.dataclasses")
    qz = importlib.import_module("src.caldera.utils.quantization")
    return alg, dc, qz


def run_reference_caldera(alg, dc, W_np, H_np, rank, q_bits, iters,
                          lplr_iters):
    import torch
    params = dc.CalderaParams(
        Q_bits=q_bits, L_bits=16, R_bits=16, rank=rank, iters=iters,
        lplr_iters=lplr_iters, update_order=["Q", "LR"],
        activation_aware_LR=True, sigma_reg=1e-6)
    W = torch.from_numpy(W_np).float()
    H = None if H_np is None else torch.from_numpy(H_np).float()
    decomp = alg.caldera(params, W, H=H, device="cpu", use_tqdm=False,
                         scale_W=False)
    W_hat = (decomp.Q + decomp.L @ decomp.R) * decomp.global_scale
    return W_hat.numpy()


def run_ours(W_np, H_np, rank, q_bits, iters, lplr_iters):
    import jax.numpy as jnp
    from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
        CalderaParams, caldera)
    params = CalderaParams(Q_bits=q_bits, L_bits=16, R_bits=16, rank=rank,
                           iters=iters, lplr_iters=lplr_iters,
                           sigma_reg=1e-6)
    H = None if H_np is None else jnp.asarray(H_np)
    decomp = caldera(params, jnp.asarray(W_np), H=H, scale_W=False)
    return np.asarray(decomp.reconstruct())


def rel_err(W, W_hat):
    return float(np.linalg.norm(W_hat - W) / np.linalg.norm(W))


class TestCalderaParity:
    def test_identity_hessian_matches_reference(self, reference_modules):
        alg, dc, _ = reference_modules
        rng = np.random.default_rng(0)
        W = rng.normal(size=(256, 256)).astype(np.float32)
        ref_hat = run_reference_caldera(alg, dc, W, None, rank=32, q_bits=2,
                                        iters=3, lplr_iters=5)
        our_hat = run_ours(W, None, rank=32, q_bits=2, iters=3, lplr_iters=5)
        e_ref, e_our = rel_err(W, ref_hat), rel_err(W, our_hat)
        # identical algorithm; SVD sign/rounding ambiguity allows small drift
        assert abs(e_ref - e_our) < 0.02, (e_ref, e_our)

    def test_real_hessian_from_shipped_artifact(self, reference_modules):
        alg, dc, _ = reference_modules
        import torch
        hs = torch.load(HESSIANS, map_location="cpu", weights_only=False)
        key = next(k for k in hs
                   if "language_model.model.layers.20.self_attn.q_proj" in k)
        h = hs[key].float().numpy()                   # (896,) diagonal
        n = h.shape[0]
        rng = np.random.default_rng(1)
        W = rng.normal(size=(n, n)).astype(np.float32) * 0.02
        H = np.diag(h).astype(np.float32)
        ref_hat = run_reference_caldera(alg, dc, W, H, rank=32, q_bits=2,
                                        iters=2, lplr_iters=3)
        our_hat = run_ours(W, H, rank=32, q_bits=2, iters=2, lplr_iters=3)
        # compare in the Hessian-weighted metric the algorithm optimizes
        Hs = np.sqrt(h)[None, :]
        e_ref = np.linalg.norm((ref_hat - W) * Hs) / np.linalg.norm(W * Hs)
        e_our = np.linalg.norm((our_hat - W) * Hs) / np.linalg.norm(W * Hs)
        assert abs(e_ref - e_our) < 0.03, (e_ref, e_our)
        assert e_our < 1.0

    def test_hessian_artifact_schema(self):
        # SURVEY.md section 2.9: 325 float64 vectors, language + vision towers
        import torch
        hs = torch.load(HESSIANS, map_location="cpu", weights_only=False)
        assert len(hs) == 325
        lang = [k for k in hs if "language_model" in k]
        assert len(lang) > 0
        from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
            hessian_key_map_from_reference)
        mapping = hessian_key_map_from_reference(lang)
        assert "layers.20.q_proj" in set(mapping.values())

    def test_loader_reads_reference_hessians(self):
        from ee274_convexcaldera_llm_quantization_tpu.calibrate.hessian import (
            load_reference_hessians)
        hs = load_reference_hessians(HESSIANS)
        assert "layers.20.q_proj" in hs
        assert hs["layers.20.q_proj"].shape == (896,)
        assert np.all(hs["layers.20.q_proj"] >= 0)


class TestQuantizerParity:
    @pytest.mark.parametrize("method,bits", [("uniform", 2), ("uniform", 4),
                                             ("nf4", 4), ("nf2", 2)])
    def test_quantizer_round_trip_matches_reference(self, reference_modules,
                                                    method, bits):
        _, _, qz = reference_modules
        import torch
        import jax.numpy as jnp
        from ee274_convexcaldera_llm_quantization_tpu.quant.quantizers import (
            BlockQuantizer)
        rng = np.random.default_rng(2)
        W = rng.normal(size=(64, 64)).astype(np.float32)
        ref_q = qz.LowMemoryQuantizer(num_bits=bits, method=method,
                                      block_size=64)
        codes, params, shape = ref_q.quantize_block(torch.from_numpy(W))
        ref_hat = ref_q.dequantize_block(codes, params, shape).numpy()
        ours = BlockQuantizer(bits, method, 64)
        our_hat = np.asarray(ours.dequantize(ours.quantize(jnp.asarray(W))))
        np.testing.assert_allclose(our_hat, ref_hat, rtol=1e-5, atol=1e-6)
