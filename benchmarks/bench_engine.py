"""Serving-engine aggregate throughput at flagship scale on the real TPU.

Launches N concurrent caption requests against the continuous-batching
engine (SAM ViT-B + InternLM2-1.8B) and reports aggregate generated
tokens/s — the number that exercises prefill overlap, length-bucketed KV
attention, and multi-step decode chunks together.

Usage: python benchmarks/bench_engine.py [--n 8] [--new 64] [--image]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOKENIZER_DIR = "/root/reference/modeling/tokenizer"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--image", action="store_true",
                    help="image captions (1024 vision tokens per prompt)")
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--quant", choices=["int8"], default=None)
    ap.add_argument("--spd", type=int, default=8,
                    help="decode steps per dispatch (chunk size)")
    args = ap.parse_args()

    from ullsam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from ullsam_tpu.core.tree import cast_floating
    from ullsam_tpu.data.tokenizer import load_tokenizer
    from ullsam_tpu.models.ullsam import fusion as F
    from ullsam_tpu.serve.engine import GenerationEngine

    cfg = g._flagship_config()
    params = cast_floating(F.fusion_init(jax.random.PRNGKey(0), cfg),
                           jnp.bfloat16)
    tk = load_tokenizer(TOKENIZER_DIR)
    eng = GenerationEngine(params, cfg, tk, max_batch=args.max_batch,
                           max_len=2560, quant=args.quant,
                           steps_per_dispatch=args.spd)

    rng = np.random.RandomState(0)
    img = (rng.rand(1, 1024, 1024, 3) * 255).astype(np.uint8)
    pv = img if args.image else None

    # warmup: compile prefill bucket + decode chunk variants
    # warmup timeout covers cold-cache compile of every chunk variant
    # (relay compiles measured up to ~900 s on a bad day)
    eng.caption(pv, "Describe the image.", max_new_tokens=args.new,
                timeout=1800.0)
    eng.phase_stats.clear()

    results = [None] * args.n
    def run(i):
        results[i] = eng.caption(pv, f"Describe item {i} in detail.",
                                 max_new_tokens=args.new)
    threads = [threading.Thread(target=run, args=(i,)) for i in range(args.n)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    total = args.n * args.new  # random weights never emit EOS early
    print(f"{args.n} concurrent {'image' if args.image else 'text'} "
          f"captions x {args.new} tokens (max_batch={args.max_batch}, spd={args.spd}"
          f"{', ' + args.quant if args.quant else ''}): "
          f"{dt:.2f}s -> {total/dt:.1f} tok/s aggregate")
    ph = dict(eng.phase_stats)
    if ph:
        n = max(1, int(ph.get("chunks", 0)))
        print("  worker phases: " + ", ".join(
            f"{k}={v:.2f}s" for k, v in sorted(ph.items())
            if k != "chunks") + f"  ({n} chunks)")
    eng.shutdown()


if __name__ == "__main__":
    main()
