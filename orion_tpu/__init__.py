"""orion_tpu: a TPU-native CKKS encrypted-inference framework.

Same capabilities as the reference Orion framework (PyTorch-like encrypted
NN API, packing compiler, automatic bootstrap placement) rebuilt TPU-first:
jax/XLA for the compute path, RNS/NTT kernels on 32-bit vector lanes,
pjit/mesh sharding for scale-out.

Public API mirrors the reference (`orion/__init__.py`):
    init_scheme, delete_scheme, encode, decode, encrypt, decrypt,
    fit, compile
"""

from .runtime.scheme import scheme

init_scheme = scheme.init_scheme
delete_scheme = scheme.delete_scheme
encode = scheme.encode
decode = scheme.decode
encrypt = scheme.encrypt
decrypt = scheme.decrypt
fit = scheme.fit
compile = scheme.compile

from . import nn  # noqa: E402
from . import models  # noqa: E402

__version__ = "0.1.0"
