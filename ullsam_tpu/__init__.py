"""uLLSAM-TPU: a TPU-native multimodal segmentation + captioning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ieellee/uLLSAM
(SAM ViT image encoder + InternLM2 chat LLM fused via pixel-shuffle
projections, with LLM hidden states driving the SAM dense prompt).

Design principles:
  * Pure-function modules over plain pytree parameter dicts (pjit-friendly).
  * NHWC image layouts, bf16 compute / fp32 params, static shapes under jit.
  * Pallas kernels for the hot attention paths; XLA for everything else.
  * Parallelism via jax.sharding.Mesh + NamedSharding, never hand-rolled
    collectives in user code.
"""

__version__ = "0.1.0"
