"""32-bit-lane modular arithmetic for TPU (jax/jnp, uint32).

This replaces the 64-bit modular arithmetic of the reference's native
backends (Lattigo's ring package / HEonGPU's CUDA kernels).  TPU vector lanes
are 32-bit with no native 64-bit mulhi, so all RNS primes are < 2^31 and wide
products are assembled from 16-bit limb partial products.

Conventions:
  * Residues are `uint32` in [0, p).  uint32 arithmetic in jnp wraps mod 2^32,
    which we rely on.
  * Constant multiplications (twiddles, key material, encoded plaintexts) use
    Shoup's trick: the companion `c_shoup = floor(c * 2^32 / p)` is
    precomputed on host, giving a product with a single mulhi32.
  * Variable*variable products (ct-ct multiply) use Montgomery REDC with
    R = 2^32; one operand is lifted to the Montgomery domain on the fly with a
    Shoup multiply by R.

Cost per element: shoup_mul ~6 u32 multiplies, mont_mul ~9, so a ct-ct
elementwise product is ~15 multiplies per limb - all VPU-friendly with no
cross-lane traffic.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_MASK16 = np.uint32(0xFFFF)


def mulhi32(a, b):
    """High 32 bits of the 64-bit product of two uint32 arrays."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    lo = a0 * b0
    m1 = a0 * b1
    m2 = a1 * b0
    hi = a1 * b1
    t = (lo >> 16) + (m1 & _MASK16) + (m2 & _MASK16)
    return hi + (m1 >> 16) + (m2 >> 16) + (t >> 16)


def add_mod(a, b, p):
    s = a + b  # < 2^32 since a, b < p < 2^31
    return jnp.where(s >= p, s - p, s)


def sub_mod(a, b, p):
    d = a - b  # wraps; fix by adding p when a < b
    return jnp.where(a >= b, d, d + p)


def neg_mod(a, p):
    return jnp.where(a == 0, a, p - a)


def shoup_mul(a, c, c_shoup, p):
    """a * c mod p where c is a constant with precomputed Shoup companion.

    c_shoup = floor(c << 32 / p).  Result in [0, p).
    """
    q = mulhi32(a, c_shoup)
    r = a * c - q * p  # both uint32-wrapping; r in [0, 2p)
    return jnp.where(r >= p, r - p, r)


def mont_mul(a, b, p, pinv):
    """Montgomery product: a * b * 2^-32 mod p.

    pinv = -p^-1 mod 2^32.  If b is in the Montgomery domain (b = b'*2^32
    mod p) this returns a*b' mod p in the normal domain.  Result in [0, p).
    """
    lo = a * b
    hi = mulhi32(a, b)
    m = lo * pinv
    mp_hi = mulhi32(m, p)
    carry = (lo != 0).astype(jnp.uint32)
    t = hi + mp_hi + carry  # < 2p < 2^32
    return jnp.where(t >= p, t - p, t)


def to_mont(a, r_mod, r_shoup, p):
    """Lift a to the Montgomery domain: a * 2^32 mod p (Shoup by R)."""
    return shoup_mul(a, r_mod, r_shoup, p)


def mul_mod(a, b, p, pinv, r_mod, r_shoup):
    """Generic a * b mod p for two variable operands (both normal domain)."""
    return mont_mul(a, to_mont(b, r_mod, r_shoup, p), p, pinv)


def shoup_precompute(c: int, p: int) -> int:
    """Host-side Shoup companion for constant c mod p."""
    return (int(c) << 32) // int(p)
