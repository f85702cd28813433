"""Ciphertext / plaintext pytrees.

Reference parity: replaces the opaque handle tables of
`orion/backend/lattigo/tensors.go` and `minheap.go`.  On TPU a ciphertext IS
a jax array (uint32[2, L, N], NTT domain); levels/scales are static pytree
metadata so jitted evaluator functions specialise on them at trace time and
garbage collection is XLA's problem.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Ciphertext:
    """One RNS-CKKS ciphertext in NTT (evaluation) domain.

    data: uint32[2, level+1, N]  (c0, c1 stacked)
    """
    data: jnp.ndarray
    level: int = field(metadata=dict(static=True), default=0)
    scale: float = field(metadata=dict(static=True), default=1.0)

    @property
    def c0(self):
        return self.data[0]

    @property
    def c1(self):
        return self.data[1]

    def with_(self, **kw) -> "Ciphertext":
        return replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Plaintext:
    """Encoded plaintext in NTT domain, with optional Shoup companion.

    data: uint32[level+1, N]; shoup: same shape (present iff the plaintext
    will be used as a multiplicand).
    """
    data: jnp.ndarray
    shoup: jnp.ndarray | None = None
    level: int = field(metadata=dict(static=True), default=0)
    scale: float = field(metadata=dict(static=True), default=1.0)

    def with_(self, **kw) -> "Plaintext":
        return replace(self, **kw)
