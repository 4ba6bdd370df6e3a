"""End-to-end pipeline: train -> calibrate -> compress -> evaluate -> serve.

The reference's flagship workflow (``main.py``: load model, calibrate
Hessians, CALDERA-compress the language tower, evaluate accuracy) run on a
tiny model with synthetic structured data, entirely offline:

1. train a tiny Llama on a synthetic Markov language until loss drops;
2. collect per-projection diagonal Hessians on calibration batches;
3. compress with CALDERA (Hessian-aware) and, for comparison, without
   Hessians and with plain 2-bit round-to-nearest;
4. compare perplexity deltas;
5. serve a few requests from the compressed model with continuous batching.

Run: ``python examples/end_to_end_pipeline.py``
"""

import numpy as np
import jax
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu.models import llama, train
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.models.surgery import (
    compress_model)
from ee274_convexcaldera_llm_quantization_tpu.decomp.caldera import (
    CalderaParams)
from ee274_convexcaldera_llm_quantization_tpu.calibrate.hessian import (
    collect_hessians)
from ee274_convexcaldera_llm_quantization_tpu.evalm.perplexity import (
    evaluate_perplexity)
from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
    Request, ServingEngine)


def markov_stream(n, vocab, seed=0, order_bias=0.9):
    """Synthetic language: each token strongly prefers (prev + 1) mod vocab,
    giving a structure the model can learn quickly."""
    rng = np.random.default_rng(seed)
    toks = np.zeros(n, np.int32)
    for i in range(1, n):
        if rng.random() < order_bias:
            toks[i] = (toks[i - 1] + 1) % vocab
        else:
            toks[i] = rng.integers(0, vocab)
    return toks


def main():
    config = TINY
    stream = markov_stream(40_000, config.vocab_size)

    # 1. train
    params = llama.init_params(jax.random.PRNGKey(0), config)
    opt = train.make_optimizer(3e-3)
    state = train.init_train_state(params, opt)
    B, S = 8, 64
    for step in range(120):
        off = (step * B * S) % (len(stream) - B * S)
        batch = jnp.asarray(stream[off:off + B * S].reshape(B, S))
        params, state, loss = train.train_step(params, state, batch, config,
                                               opt)
        if step % 40 == 0:
            print(f"train step {step}: loss={float(loss):.3f}")

    eval_stream = markov_stream(8_000, config.vocab_size, seed=1)
    ppl_dense = evaluate_perplexity(params, eval_stream, config, window=64,
                                    batch_size=4)
    print(f"\ndense perplexity: {ppl_dense:.2f} "
          f"(uniform would be {config.vocab_size})")

    # 2. calibrate on held-out batches
    calib = [stream[i * 512:(i + 1) * 512].reshape(4, 128)
             for i in range(4)]
    hessians = collect_hessians(params, calib, config, diag=True)
    print(f"collected {len(hessians)} diagonal Hessians")

    # 3. compress: Hessian-aware vs identity-Hessian vs plain 2-bit RTN
    cp = CalderaParams(Q_bits=2, L_bits=16, R_bits=16, rank=16, iters=3,
                       lplr_iters=3, sigma_reg=1e-6)
    q_hess, rep_h = compress_model(params, cp, hessians=hessians)
    q_iden, rep_i = compress_model(params, cp)
    rtn = CalderaParams(Q_bits=2, compute_low_rank_factors=False, rank=1,
                        iters=1, lplr_iters=1, update_order=("Q",))
    q_rtn, rep_r = compress_model(params, rtn)

    # 4. evaluate — reconstruction error in the plain and Hessian-weighted
    # metrics (the objective the solver optimizes), plus perplexity. Note:
    # at 2-bit on a 2-layer 128-dim model the distortion is so large that
    # perplexity ordering is noisy; the reconstruction metrics are the
    # discriminative signal (at 4-bit all three are perplexity-lossless
    # here).
    def weighted_err(qp):
        errs = []
        for i, (lp_q, lp_d) in enumerate(zip(qp.layers, params.layers)):
            for proj in ("q_proj", "down_proj"):
                name = f"layers.{i}.{proj}"
                W = getattr(lp_d, proj).w.astype(jnp.float32)
                W_hat = getattr(lp_q, proj).materialize()
                hs = jnp.sqrt(jnp.asarray(hessians[name]))[None, :]
                errs.append(float(jnp.linalg.norm((W_hat - W) * hs)
                                  / jnp.linalg.norm(W * hs)))
        return float(np.mean(errs))

    for name, qp, rep in (("CALDERA + Hessian", q_hess, rep_h),
                          ("CALDERA identity-H", q_iden, rep_i),
                          ("2-bit RTN baseline", q_rtn, rep_r)):
        ppl = evaluate_perplexity(qp, eval_stream, config, window=64,
                                  batch_size=4)
        mean_err = float(np.mean(list(rep.errors.values())))
        print(f"{name:22s}: frob_err={mean_err:.4f}  "
              f"hessian_err={weighted_err(qp):.4f}  ppl={ppl:8.2f}")
    print(f"avg bits/param (Hessian run): {rep_h.avg_bits_per_param:.2f}")

    # 5. serve the compressed model
    eng = ServingEngine(q_hess, config, max_slots=2, max_seq_len=96)
    rng = np.random.default_rng(2)
    for uid in range(3):
        eng.submit(Request(uid=uid,
                           prompt=markov_stream(12, config.vocab_size,
                                                seed=10 + uid),
                           max_new_tokens=8))
    done = eng.run()
    print(f"\nserved {len(done)} requests; sample continuation: "
          f"{done[0].tokens}")


if __name__ == "__main__":
    main()
