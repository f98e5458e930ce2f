"""TPU-native Monte Carlo Gated-Attention MIL framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
xkuubix/MonteCarlo-Gated-MIL (PyTorch, single-GPU): whole-mammogram
classification via gated-attention multiple-instance learning with
Monte Carlo Dropout uncertainty, rebuilt for TPU hardware:

- bags are padded fixed-size buckets of patches with validity masks
  (static shapes for XLA) instead of ragged ``(1, N, C, H, W)`` tensors;
- the BN-free ResNet backbone runs once per bag under XLA (NHWC, MXU);
- gated-attention pooling is a fused Pallas kernel with masked softmax;
- the T Monte-Carlo dropout passes are one ``jax.vmap`` over PRNG keys;
- scaling is SPMD via ``jax.sharding.Mesh`` + XLA collectives.
"""

__version__ = "0.1.0"

from montecarlo_gated_mil_tpu.core.bag import Bag, BucketSpec  # noqa: F401
from montecarlo_gated_mil_tpu.core.config import Config, load_config  # noqa: F401
