"""Negacyclic NTT on TPU (jnp, uint32 lanes).

Merged psi-twisted NTT: forward is Cooley-Tukey decimation-in-time taking
standard-order coefficients to bit-reversed evaluation order; inverse is
Gentleman-Sande taking bit-reversed order back to standard coefficients.
Pointwise ciphertext ops all happen in the bit-reversed evaluation order, so
no explicit bit-reversal pass ever runs (reference parity: this is the role
Lattigo's `ring` package NTT plays below `orion/backend/lattigo/*.go`).

Twiddles are per-limb tables `tw[limb, j] = psi_limb^bitrev(j)` with Shoup
companions, so each butterfly costs one `shoup_mul` (~6 u32 multiplies) plus
a mod-add/sub.  The stage loop is a static Python loop over log2(N) stages of
pure jnp ops; XLA fuses each stage into a handful of VPU loops.  A Pallas
kernel that stages butterflies through VMEM is the planned upgrade once this
is profiled (see bench history).

Shapes: `a` is (..., L, N); twiddle tables are (L, N); `p` is (L,).
"""

from __future__ import annotations

import jax.numpy as jnp

from .modops import add_mod, shoup_mul, sub_mod


def _bshape(p, a_ndim, l):
    """Reshape per-limb scalars (L,) to broadcast over (..., L, m, 2, t)."""
    return p.reshape((l, 1, 1, 1))


def ntt(a, tw, tw_shoup, p):
    """Forward negacyclic NTT over the last axis, vectorised over limbs."""
    *batch, L, N = a.shape
    pb = p.reshape((L, 1, 1, 1))
    m, t = 1, N
    while m < N:
        t //= 2
        v = a.reshape(*batch, L, m, 2, t)
        s = tw[:, m : 2 * m].reshape(L, m, 1)
        s_sh = tw_shoup[:, m : 2 * m].reshape(L, m, 1)
        even = v[..., 0, :]
        odd = shoup_mul(v[..., 1, :], s, s_sh, pb[..., 0])
        a = jnp.stack([add_mod(even, odd, pb[..., 0]),
                       sub_mod(even, odd, pb[..., 0])], axis=-2)
        a = a.reshape(*batch, L, N)
        m *= 2
    return a


def intt(a, itw, itw_shoup, ninv, ninv_shoup, p):
    """Inverse negacyclic NTT over the last axis, vectorised over limbs."""
    *batch, L, N = a.shape
    m, t = N, 1
    while m > 1:
        m //= 2
        v = a.reshape(*batch, L, m, 2, t)
        s = itw[:, m : 2 * m].reshape(L, m, 1)
        s_sh = itw_shoup[:, m : 2 * m].reshape(L, m, 1)
        pb = p.reshape((L, 1, 1))
        u = v[..., 0, :]
        w = v[..., 1, :]
        a = jnp.stack([add_mod(u, w, pb),
                       shoup_mul(sub_mod(u, w, pb), s, s_sh, pb)], axis=-2)
        a = a.reshape(*batch, L, N)
        t *= 2
    pb = p.reshape((L, 1))
    return shoup_mul(a, ninv.reshape(L, 1), ninv_shoup.reshape(L, 1), pb)


# ------------------------------------------------------------------ #
#  Conjugate-invariant ring (route through the 2n lift)              #
# ------------------------------------------------------------------ #

def ci_lift(a, p):
    """Lift CI coefficients (..., L, n) to the 2n antisymmetric standard
    representative (..., L, 2n): (a_0..a_{n-1}, 0, -a_{n-1}..-a_1) mod p.

    `p` is the per-limb modulus (L,) broadcast over the tail coefficients.
    """
    tail = jnp.flip(a[..., 1:], axis=-1)
    pb = p.reshape((-1, 1))
    neg = jnp.where(tail == 0, jnp.uint32(0), pb - tail)
    zeros = jnp.zeros(a.shape[:-1] + (1,), a.dtype)
    return jnp.concatenate([a, zeros, neg], axis=-1)


def ci_ntt(a, tw, tw_shoup, p, keep):
    """CI forward transform: lift -> 2n negacyclic NTT -> keep the n orbit
    representatives (CI eval position j = evaluation at psi^(5^j))."""
    return ntt(ci_lift(a, p), tw, tw_shoup, p)[..., keep]


def ci_intt(v, itw, itw_shoup, ninv, ninv_shoup, p, src, n):
    """CI inverse: replicate each value onto both orbit positions (CI
    elements take equal values at e and -e), 2n iNTT, project to the
    first n coefficients (the tail is the antisymmetric mirror)."""
    return intt(v[..., src], itw, itw_shoup, ninv, ninv_shoup, p)[..., :n]
