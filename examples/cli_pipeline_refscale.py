"""2-bit e8p quality at reference-like scale: 1024-dim, 8 layers, rank 32.

Round-3's quality flagship ran at 512-dim / 4 layers / rank 16
(``cli_pipeline_total_rate.py``); the reference's own regime is a
rank-128 decomposition of 4096-dim LLaMA-2-7B at 2.2 TOTAL bits
(reference ``README.md:358``, ``main.py:168-196``). This run moves the
offline proxy one scale step closer — 1024-dim hidden, 8 layers,
rank-32 factors — which round 3 could NOT run: the LDLQ-e8p encode was
a 2-4 h sequential loop at 512-dim. The round-4 E8 local-search encode
(ops/lattice.py) makes this a minutes-scale job.

Rate accounting: with w4a8 serving (int8 factors), rank-32 factor
overhead is ``8 * 32 * (m + n) / (m * n)`` <= 0.5 bit/param on every
projection (attn 1024x1024: 0.5; mlp 1024x2048: 0.375), so the 2-bit
rows land well under 3 TOTAL bits/param — inside the reference's
2.2-bit-total headline regime.

Flow (identical public surfaces to ``cli_pipeline_total_rate.py``,
reference ``main.py:135-251,340-404`` equivalent): train a small Llama
on a synthetic Markov language -> export HF checkpoint dir -> ``ccq
calibrate`` -> ``ccq compress`` (4-bit uniform / 2-bit uniform / 2-bit
e8p, each with LDLQ) -> ``ccq eval --checkpoint`` held-out perplexity.

Prints one JSON line with {config: {bits, ppl}} plus a table.
"""

import io
import json
import os
import sys
import tempfile
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
    vocab_size=256, hidden_size=1024, intermediate_size=2048,
    num_layers=8, num_heads=16, num_kv_heads=16, head_dim=64,
    max_seq_len=512)

VOCAB = 256
RANK = 32


def main():
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
    train_stream = stream_from(10, 600_000)
    eval_stream = stream_from(11, 16_384)

    config = CONFIG
    params = llama.init_params(jax.random.PRNGKey(0), config)
    opt = train.make_optimizer(3e-3)
    state = train.init_train_state(params, opt)
    steps, Bt, S = 900, 16, 64
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
            ("4-bit uniform rank-32", ["--q-bits", "4"], "uniform"),
            ("2-bit uniform rank-32", ["--q-bits", "2"], "uniform"),
            ("2-bit e8p rank-32", ["--q-bits", "2"], "e8p"),
        ]
        for name, bits_args, squant in CONFIGS:
            ck = os.path.join(td, name.replace(" ", "_"))
            print(f"# compress {name}...", file=sys.stderr, flush=True)
            rep = run(["compress", "--model", hf_dir, "--hessians", hess,
                       *bits_args, "--rank", str(RANK), "--iters", "2",
                       "--lplr-iters", "2", "--q-update", "ldlq",
                       "--serving-mode", "w4a8",
                       "--serving-quant", squant, "--output", ck])
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
