"""End-to-end 2-bit quality run through the CLI on a real-format checkpoint.

Reproduces the reference's flagship flow (``main.py:135-251,340-404``:
load HF checkpoint -> quantize at 2-bit -> evaluate) entirely through this
framework's public surfaces, offline:

1. train a tiny Llama on a synthetic Markov language (so compression
   quality is measurable — an untrained model has no structure to lose);
2. export it as a standard HF checkpoint directory (safetensors +
   config.json, ``models.hf_export``);
3. ``ccq calibrate`` Hessians from the checkpoint dir;
4. ``ccq compress`` at 4-bit uniform, 2-bit uniform, and 2-bit e8p
   (the reference's flagship regime is 2-bit, ``main.py:168-196``),
   each saved as a framework checkpoint;
5. ``ccq eval --checkpoint`` perplexity on held-out streams from the same
   language, vs the dense model.

Prints a table of ppl deltas. Run time ~10-20 min on CPU.
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu import cli
from ee274_convexcaldera_llm_quantization_tpu.models import (
    hf_export, llama, train)
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY


def markov_stream(rng, n, vocab=256, order_mix=0.85):
    """Synthetic language: a sticky random Markov chain over the vocab."""
    P = rng.dirichlet(np.full(vocab, 0.05), size=vocab)
    P = order_mix * P + (1 - order_mix) / vocab
    toks = np.empty(n, np.int64)
    toks[0] = rng.integers(vocab)
    for i in range(1, n):
        toks[i] = rng.choice(vocab, p=P[toks[i - 1]])
    return toks


def main():
    rng = np.random.default_rng(0)
    print("# generating synthetic language...", file=sys.stderr, flush=True)
    train_stream = markov_stream(rng, 200_000)
    eval_stream = markov_stream(np.random.default_rng(1), 16_384)
    # same chain for eval: re-use P by seeding identically
    # (markov_stream(rng=...) above consumed rng state; regenerate properly)
    rng = np.random.default_rng(0)
    P = rng.dirichlet(np.full(256, 0.05), size=256)
    P = 0.85 * P + 0.15 / 256
    def stream_from(seed, n):
        r = np.random.default_rng(seed)
        toks = np.empty(n, np.int64)
        toks[0] = r.integers(256)
        for i in range(1, n):
            toks[i] = r.choice(256, p=P[toks[i - 1]])
        return toks
    train_stream = stream_from(10, 200_000)
    eval_stream = stream_from(11, 16_384)

    config = TINY
    params = llama.init_params(jax.random.PRNGKey(0), config)
    opt = train.make_optimizer(3e-3)
    state = train.init_train_state(params, opt)
    steps, Bt, S = 400, 16, 64
    print(f"# training tiny model ({steps} steps)...", file=sys.stderr,
          flush=True)
    for it in range(steps):
        i0 = (it * Bt * S) % (len(train_stream) - Bt * S - 1)
        batch = train_stream[i0:i0 + Bt * S].reshape(Bt, S)
        params, state, loss = train.train_step(
            params, state, jnp.asarray(batch, jnp.int32), config, opt)
        if it % 100 == 0:
            print(f"#   step {it}: loss {float(loss):.4f}", file=sys.stderr,
                  flush=True)
    print(f"#   final loss {float(loss):.4f}", file=sys.stderr, flush=True)

    with tempfile.TemporaryDirectory() as td:
        hf_dir = os.path.join(td, "hf")
        hf_export.save_hf_checkpoint(hf_dir, params, config)
        tok_path = os.path.join(td, "eval.npy")
        np.save(tok_path, eval_stream)
        hess = os.path.join(td, "hess.npz")

        import io
        from contextlib import redirect_stdout

        def run(argv):
            buf = io.StringIO()
            with redirect_stdout(buf):
                cli.main(argv)
            return json.loads(buf.getvalue().strip().splitlines()[-1])

        print("# calibrating...", file=sys.stderr, flush=True)
        run(["calibrate", "--model", hf_dir, "--num-batches", "8",
             "--batch-size", "4", "--window", "64", "--output", hess])

        results = {}
        print("# dense eval...", file=sys.stderr, flush=True)
        results["dense (bf16)"] = (16.0, run(
            ["eval", "--model", hf_dir, "--tokens", tok_path,
             "--window", "256"])["perplexity"])

        CONFIGS = [
            ("4-bit uniform rank-16", ["--q-bits", "4"], "uniform"),
            ("2-bit uniform rank-16", ["--q-bits", "2"], "uniform"),
            ("2-bit e8p rank-16", ["--q-bits", "2"], "e8p"),
        ]
        for name, bits_args, squant in CONFIGS:
            ck = os.path.join(td, name.replace(" ", "_"))
            print(f"# compress {name}...", file=sys.stderr, flush=True)
            rep = run(["compress", "--model", hf_dir, "--hessians", hess,
                       *bits_args, "--rank", "16", "--iters", "3",
                       "--lplr-iters", "3", "--serving-mode", "w4a8",
                       "--serving-quant", squant, "--output", ck])
            ev = run(["eval", "--checkpoint", ck, "--tokens", tok_path,
                      "--window", "256"])
            results[name] = (rep["avg_bits_per_param"], ev["perplexity"])

        dense_ppl = results["dense (bf16)"][1]
        print(f"\n{'config':26s} {'bits/param':>10s} {'ppl':>9s} "
              f"{'delta-ppl':>9s} {'delta-log-ppl':>13s}")
        for name, (bits, ppl) in results.items():
            print(f"{name:26s} {bits:10.3f} {ppl:9.3f} "
                  f"{ppl - dense_ppl:+9.3f} "
                  f"{np.log(ppl) - np.log(dense_ppl):+13.4f}")
        print(json.dumps({k: {"bits": b, "ppl": p}
                          for k, (b, p) in results.items()}))


if __name__ == "__main__":
    main()
