"""Whole-network jit: compile an encrypted forward pass to ONE XLA program.

This is the TPU-native replacement for the reference's per-op FFI dispatch
(`orion/backend/lattigo/bindings.py`): because every homomorphic op is a
pure jnp function over Ciphertext pytrees, the entire `net.he()` forward
traces into a single XLA computation (per level-signature), letting XLA
fuse NTT stages, key-switch inner products and elementwise ops across
layers.  Eager dispatch on the TPU backend is pathological (each op would
compile separately); always use this wrapper for device execution.
"""

from __future__ import annotations

import jax

from ..crypto.ciphertext import Ciphertext
from .tensors import CipherTensor


def make_jitted_forward(net, scheme):
    """Returns fn(ctensor) -> ctensor running net's he-forward under jit.

    Output metadata (levels/scales/shapes) is captured during tracing via a
    side channel — it is deterministic for a compiled network.
    """
    meta = {}

    def flat_forward(datas, levels, scales, shape, on_shape):
        cts = [Ciphertext(d, lv, sc)
               for d, lv, sc in zip(datas, levels, scales)]
        ctin = CipherTensor(scheme, cts, shape, on_shape)
        out = net(ctin)
        meta["out"] = ([ct.level for ct in out.cts],
                       [ct.scale for ct in out.cts],
                       out.shape, out.on_shape)
        return [ct.data for ct in out.cts]

    jitted = jax.jit(flat_forward,
                     static_argnames=("levels", "scales", "shape", "on_shape"))

    def run(ctensor: CipherTensor) -> CipherTensor:
        datas = [ct.data for ct in ctensor.cts]
        levels = tuple(ct.level for ct in ctensor.cts)
        scales = tuple(ct.scale for ct in ctensor.cts)
        out_datas = jitted(datas, levels, scales,
                           tuple(ctensor.shape), tuple(ctensor.on_shape))
        lv, sc, shape, on_shape = meta["out"]
        cts = [Ciphertext(d, l, s) for d, l, s in zip(out_datas, lv, sc)]
        return CipherTensor(scheme, cts, shape, on_shape)

    return run
