"""Engine-level paged continuous-batching throughput on the chip.

Round-5 (VERDICT r4 ask #3, final piece): PagedServingEngine under real
admission/eviction churn — mixed-length prompts and generation lengths,
sequences finishing and new ones admitted mid-flight, pages allocated
and freed by the C++-backed allocator — generated tokens/sec end to end
on the 7B flagship shapes.

Usage: python scripts/exp_paged_engine_chip.py [--requests 24]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--max-slots", type=int, default=8)
    ap.add_argument("--page-size", type=int, default=256)
    args = ap.parse_args()

    import bench
    from ee274_convexcaldera_llm_quantization_tpu.models import fused as fusedm
    from ee274_convexcaldera_llm_quantization_tpu.models.config import PRESETS
    from ee274_convexcaldera_llm_quantization_tpu.serve.engine import Request
    from ee274_convexcaldera_llm_quantization_tpu.serve.paged_engine import (
        PagedServingEngine)

    config = PRESETS[args.model]
    print(f"# device={jax.devices()[0]}", file=sys.stderr, flush=True)
    t0 = time.time()
    params = fusedm.fuse_stacked(
        bench.build_compressed_llama_params(config, 4, 128, mode="w4a8"))
    params = fusedm.quantize_factors_int8_fused(params)
    jax.block_until_ready(params.embed)
    print(f"# params {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    # pool sized for max_slots full-length sequences + headroom
    max_pages_per_seq = 512 // args.page_size + 1
    num_pages = args.max_slots * max_pages_per_seq * 2
    eng = PagedServingEngine(
        params, config, max_slots=args.max_slots, num_pages=num_pages,
        page_size=args.page_size, max_pages_per_seq=max_pages_per_seq,
        interpret=False)

    rng = np.random.default_rng(0)
    # fixed prompt-length buckets: prefill compiles once per distinct
    # length (minutes each over the relay), generation churn stays ragged
    PLENS = (64, 128, 192, 256)
    total_new = 0
    for uid in range(args.requests):
        plen = int(rng.choice(PLENS))
        mnew = int(rng.integers(32, 128))
        total_new += mnew
        eng.submit(Request(
            uid=uid,
            prompt=rng.integers(0, config.vocab_size, size=plen),
            max_new_tokens=mnew))

    # warm-up run (compile) with a single tiny request happens inside the
    # first run; time the whole batch then a second identical batch warm
    t0 = time.time()
    done = eng.run()
    dt = time.time() - t0
    gen = sum(len(c.tokens) for c in done)
    print(f"# cold batch: {gen} tokens in {dt:.1f}s", file=sys.stderr,
          flush=True)

    for uid in range(args.requests):
        plen = int(rng.choice(PLENS))
        mnew = int(rng.integers(32, 128))
        eng.submit(Request(
            uid=1000 + uid,
            prompt=rng.integers(0, config.vocab_size, size=plen),
            max_new_tokens=mnew))
    t0 = time.time()
    done = eng.run()
    dt = time.time() - t0
    gen = sum(len(c.tokens) for c in done)
    print(json.dumps({
        "requests": len(done), "generated_tokens": gen,
        "seconds": round(dt, 2),
        "gen_tok_per_s": round(gen / dt, 1),
        "page_size": args.page_size, "max_slots": args.max_slots,
    }), flush=True)


if __name__ == "__main__":
    main()
