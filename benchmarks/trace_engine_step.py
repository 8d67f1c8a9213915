"""Profile the serving decode chunk (_engine_step) on the real TPU.

Writes a jax.profiler trace of a few steady-state int8 window-carry chunks
to /tmp/trace_engine; analyze with benchmarks/analyze_trace.py.

Usage: python benchmarks/trace_engine_step.py [batch] [n_steps] [attend]
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
    import __graft_entry__ as g
    from ullsam_tpu.core.tree import cast_floating
    from ullsam_tpu.models.ullsam import fusion as F
    from ullsam_tpu.models.internlm2 import model as LLM
    from ullsam_tpu.models.internlm2.quant import quantize_llm_int8
    from ullsam_tpu.serve.engine import _engine_step
    from ullsam_tpu.models.internlm2.generate import (
        GenerationConfig, SamplingParams)

    cfg = g._flagship_config()
    params = cast_floating(F.fusion_init(jax.random.PRNGKey(0), cfg),
                           jnp.bfloat16)
    p = dict(params, llm=quantize_llm_int8(params["llm"]))
    cache = LLM.init_cache(cfg.llm, B, 2560)
    cache = LLM.KVCache(k=cache.k, v=cache.v,
                        mask=cache.mask.at[:, :256].set(1),
                        index=jnp.asarray(256, jnp.int32))
    toks = jnp.full((B,), 11, jnp.int32)
    act = jnp.ones((B,), bool)
    samp = SamplingParams.from_configs([GenerationConfig()] * B, pad_to=B)
    rng = jax.random.PRNGKey(0)

    def run(c):
        # thread the returned cache: _engine_step DONATES the cache
        return _engine_step(p, cfg, toks, c, act, samp, rng,
                            n_steps=n_steps, dynamic_sampling=False,
                            pad_token_id=2, attend_len=attend)

    em, cache, _ = run(cache)
    np.asarray(em)
    out = "/tmp/trace_engine"
    with jax.profiler.trace(out):
        for _ in range(3):
            em, cache, _ = run(cache)
        np.asarray(em)
    t0 = time.perf_counter()
    for _ in range(6):
        em, cache, _ = run(cache)
    np.asarray(em)
    dt = (time.perf_counter() - t0) / 6
    print(f"int8 window chunk({B}x{n_steps}, attend={attend}): "
          f"{dt*1000:.2f} ms -> {B*n_steps/dt:.0f} tok/s; trace at {out}",
          flush=True)


if __name__ == "__main__":
    main()
