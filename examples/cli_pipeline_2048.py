"""2-bit e8p quality at 2048-dim / 16 layers / rank 64 — ON the TPU.

Round-5 quality flagship (VERDICT r4 ask #1b): a quality-table row at
>= 2048-dim / >= 16 layers / rank >= 64 and <= 3 TOTAL bits/param,
through the same public CLI pipeline as ``cli_pipeline_refscale.py``,
with the compression stage executing on the TPU (run WITH the relay env;
the LDLQ-e8p encode is jitted JAX and round-5's panel-blocked sweep +
slabbed lattice encode make chip execution practical — 4096^2 e8p sweep
13.7 s vs ~20 min CPU).

This is half the reference's own regime in width (4096-dim LLaMA-2-7B,
rank 128, 2.2 total bits — reference ``README.md:358``,
``main.py:168-196``) and matches its layer count scale (16 vs 32).

Rate accounting with w4a8 serving (int8 factors, 8 bits/factor entry):
rank-64 overhead is ``8 * 64 * (m + n) / (m * n)`` = 0.5 bit/param on
attn (2048x2048) and 0.375 on mlp (2048x4096), so the 2-bit e8p rows
land at ~2.8 TOTAL bits/param — inside the <= 3 bit target.

Flow: train a small Llama on a synthetic Markov language -> export HF
checkpoint dir -> ``ccq calibrate`` -> ``ccq compress`` (4-bit uniform /
2-bit e8p, LDLQ) -> ``ccq eval --checkpoint`` held-out perplexity.
Prints one JSON line with {config: {bits, ppl}} plus a table.
"""

import io
import json
import os
import sys
import tempfile
import time
from contextlib import redirect_stdout

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ee274_convexcaldera_llm_quantization_tpu import cli
from ee274_convexcaldera_llm_quantization_tpu.models import (
    hf_export, llama, train)
from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig

CONFIG = ModelConfig(
    vocab_size=256, hidden_size=2048, intermediate_size=4096,
    num_layers=16, num_heads=32, num_kv_heads=32, head_dim=64,
    max_seq_len=512)

VOCAB = 256
RANK = 64


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    P = rng.dirichlet(np.full(VOCAB, 0.05), size=VOCAB)
    P = 0.85 * P + 0.15 / VOCAB

    def stream_from(seed, n):
        r = np.random.default_rng(seed)
        toks = np.empty(n, np.int64)
        toks[0] = r.integers(VOCAB)
        for i in range(1, n):
            toks[i] = r.choice(VOCAB, p=P[toks[i - 1]])
        return toks

    print("# generating synthetic language...", file=sys.stderr, flush=True)
    train_stream = stream_from(10, 800_000)
    eval_stream = stream_from(11, 16_384)

    config = CONFIG
    params = llama.init_params(jax.random.PRNGKey(0), config)
    opt = train.make_optimizer(3e-3)
    state = train.init_train_state(params, opt)
    steps, Bt, S = 1100, 16, 64
    print(f"# training {config.num_layers}-layer d={config.hidden_size} "
          f"model ({steps} steps)...", file=sys.stderr, flush=True)
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
            ("4-bit uniform rank-64", ["--q-bits", "4"], "uniform"),
            ("2-bit e8p rank-64", ["--q-bits", "2"], "e8p"),
        ]
        for name, bits_args, squant in CONFIGS:
            ck = os.path.join(td, name.replace(" ", "_"))
            print(f"# compress {name}...", file=sys.stderr, flush=True)
            t0 = time.time()
            rep = run(["compress", "--model", hf_dir, "--hessians", hess,
                       *bits_args, "--rank", str(RANK), "--iters", "2",
                       "--lplr-iters", "2", "--q-update", "ldlq",
                       "--serving-mode", "w4a8",
                       "--serving-quant", squant, "--output", ck])
            print(f"#   compressed in {time.time() - t0:.0f}s "
                  f"({rep['avg_bits_per_param']:.3f} bits/param)",
                  file=sys.stderr, flush=True)
            ev = run(["eval", "--checkpoint", ck, "--tokens", tok_path,
                      "--window", "256"])
            results[name] = (rep["avg_bits_per_param"], ev["perplexity"])

        dense_ppl = results["dense (bf16)"][1]
        print(f"\n{'config':26s} {'TOTAL bits':>10s} {'ppl':>9s} "
              f"{'delta-ppl':>9s} {'delta-log-ppl':>13s}")
        for name, (bits, ppl) in results.items():
            print(f"{name:26s} {bits:10.3f} {ppl:9.3f} "
                  f"{ppl - dense_ppl:+9.3f} "
                  f"{np.log(ppl) - np.log(dense_ppl):+13.4f}")
        print(json.dumps({k: {"bits": b, "ppl": p}
                          for k, (b, p) in results.items()}))


if __name__ == "__main__":
    main()
