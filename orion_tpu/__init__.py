"""orion_tpu: a TPU-native CKKS encrypted-inference framework.

Same capabilities as the reference Orion framework (PyTorch-like encrypted NN
API, packing compiler, automatic bootstrap placement) rebuilt TPU-first:
jax/XLA for the compute path, RNS/NTT kernels on 32-bit vector lanes,
pjit/mesh sharding for scale-out.
"""

__version__ = "0.1.0"
