"""text2human_tpu — a TPU-native JAX framework for text-driven human generation.

A from-scratch re-design of the capabilities of yumingj/Text2Human (SIGGRAPH'22)
for TPU hardware: flax.linen modules in NHWC layout, functional train steps under
``jax.jit``/``pjit``, ``lax.scan``-based diffusion decoding, vectorized
texture-aware vector quantization (one MXU matmul instead of an 18-way python
loop), and ``jax.sharding`` device-mesh parallelism.

Pipeline (three stages, six checkpoints — see reference models/sample_model.py:21):
  Stage I   pose -> parsing        (ShapeAttrEmbedding + ShapeUNet + FCNHead)
  Stage II  parsing -> human       (hierarchical texture-aware VQGAN: top + bottom)
  Stage III sampling               (parsing tokenizer + absorbing-diffusion
                                    transformer + index prediction net)
"""

__version__ = "0.1.0"

from text2human_tpu import config  # noqa: F401
