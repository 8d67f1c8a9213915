"""Standalone timing of the continuous-batching decode chunk
(_engine_step) at serving shapes — isolates the pure device decode rate
from the worker/admission pipeline.

Usage: python benchmarks/probe_engine_step.py [batch] [n_steps] [attend]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ullsam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    attend = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    max_len = int(sys.argv[4]) if len(sys.argv) > 4 else 2560
    import __graft_entry__ as g
    from ullsam_tpu.core.tree import cast_floating
    from ullsam_tpu.models.ullsam import fusion as F
    from ullsam_tpu.models.internlm2 import model as LLM
    from ullsam_tpu.serve.engine import _engine_step
    from ullsam_tpu.models.internlm2.generate import (
        GenerationConfig, SamplingParams)

    cfg = g._flagship_config()
    params = cast_floating(F.fusion_init(jax.random.PRNGKey(0), cfg),
                           jnp.bfloat16)
    for quant in (None, "int8"):
        p = params
        if quant == "int8":
            from ullsam_tpu.models.internlm2.quant import quantize_llm_int8
            p = dict(params, llm=quantize_llm_int8(params["llm"]))
        def fresh_cache():
            c = LLM.init_cache(cfg.llm, B, max_len)
            return LLM.KVCache(k=c.k, v=c.v,
                               mask=c.mask.at[:, :256].set(1),
                               index=jnp.asarray(256, jnp.int32))
        toks = jnp.full((B,), 11, jnp.int32)
        act = jnp.ones((B,), bool)
        samp = SamplingParams.from_configs([GenerationConfig()] * B,
                                           pad_to=B)
        rng = jax.random.PRNGKey(0)

        for label, kw in (("cache-carry", dict(window=False)),
                          ("window     ", dict(window=True))):
            def run(c):
                # thread the returned cache: _engine_step DONATES the
                # cache buffers (serve/engine.py round-5), so the
                # passed-in object is dead after the call
                return _engine_step(p, cfg, toks, c, act, samp, rng,
                                    n_steps=n_steps, dynamic_sampling=False,
                                    pad_token_id=2, attend_len=attend, **kw)
            em, c2, _ = run(fresh_cache())
            np.asarray(em)
            t0 = time.perf_counter()
            iters = 6
            for _ in range(iters):
                em, c2, _ = run(c2)
            np.asarray(em)
            dt = (time.perf_counter() - t0) / iters
            rate = B * n_steps / dt
            print(f"quant={quant} {label}: "
                  f"chunk({B}x{n_steps}, attend={attend}, max_len={max_len})"
                  f" {dt*1000:7.2f} ms -> {rate:7.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
