"""NTT correctness: device kernel vs host oracle vs schoolbook negacyclic."""

import numpy as np
import jax.numpy as jnp

from orion_tpu.crypto import primes as primegen
from orion_tpu.crypto.ref import PrimeRing, HostRing
from orion_tpu.crypto import ntt as dntt
from orion_tpu.crypto.modops import shoup_precompute

RNG = np.random.default_rng(7)


def _make_ring(n=256, bits=28):
    p = primegen.generate_primes([bits], 2 * n)[0]
    psi = primegen.primitive_root_2n(p, 2 * n)
    return PrimeRing(p, n, psi)


def test_host_ntt_roundtrip():
    ring = _make_ring()
    a = RNG.integers(0, ring.p, ring.n)
    np.testing.assert_array_equal(ring.intt(ring.ntt(a)), a % ring.p)


def test_host_ntt_negacyclic_mul():
    ring = _make_ring(n=64)
    a = RNG.integers(0, ring.p, ring.n)
    b = RNG.integers(0, ring.p, ring.n)
    got = ring.poly_mul(a, b)
    want = ring.negacyclic_naive(a, b)
    np.testing.assert_array_equal(got, want)


def _device_tables(rings):
    n = rings[0].n
    L = len(rings)
    p = np.array([r.p for r in rings], np.uint32)
    tw = np.stack([r.tw for r in rings]).astype(np.uint32)
    itw = np.stack([r.itw for r in rings]).astype(np.uint32)
    tw_sh = np.stack([
        ((r.tw.astype(np.uint64) << np.uint64(32)) // np.uint64(r.p)).astype(np.uint32)
        for r in rings])
    itw_sh = np.stack([
        ((r.itw.astype(np.uint64) << np.uint64(32)) // np.uint64(r.p)).astype(np.uint32)
        for r in rings])
    ninv = np.array([r.ninv for r in rings], np.uint32)
    ninv_sh = np.array([shoup_precompute(r.ninv, r.p) for r in rings], np.uint32)
    return tuple(map(jnp.asarray, (p, tw, tw_sh, itw, itw_sh, ninv, ninv_sh)))


def test_device_ntt_matches_host():
    rings = [_make_ring(256, b) for b in (26, 28, 30)]
    p, tw, tw_sh, itw, itw_sh, ninv, ninv_sh = _device_tables(rings)
    a = np.stack([RNG.integers(0, r.p, r.n) for r in rings])
    got = np.asarray(dntt.ntt(jnp.asarray(a.astype(np.uint32)), tw, tw_sh, p))
    want = np.stack([r.ntt(a[i]) for i, r in enumerate(rings)])
    np.testing.assert_array_equal(got, want.astype(np.uint32))

    back = np.asarray(dntt.intt(jnp.asarray(got), itw, itw_sh, ninv, ninv_sh, p))
    np.testing.assert_array_equal(back, a.astype(np.uint32))


def test_device_ntt_batched():
    rings = [_make_ring(128, 27), _make_ring(128, 29)]
    p, tw, tw_sh, itw, itw_sh, ninv, ninv_sh = _device_tables(rings)
    a = np.stack([
        np.stack([RNG.integers(0, r.p, r.n) for r in rings]) for _ in range(3)])
    got = np.asarray(dntt.ntt(jnp.asarray(a.astype(np.uint32)), tw, tw_sh, p))
    for b in range(3):
        want = np.stack([r.ntt(a[b, i]) for i, r in enumerate(rings)])
        np.testing.assert_array_equal(got[b], want.astype(np.uint32))


def test_automorphism_ntt_domain_permutation():
    """NTT-domain automorphism is a pure permutation; validates the exponent
    bookkeeping used by CKKSContext.automorphism_perm."""
    from orion_tpu.crypto.ref import automorphism_coeff, bit_reverse_indices
    n = 128
    ring = _make_ring(n, 28)
    brev = bit_reverse_indices(n)
    pos_to_exp = (2 * brev + 1) % (2 * n)
    a = RNG.integers(0, ring.p, n)
    for k in (5, 25, 2 * n - 1, pow(5, 7, 2 * n)):
        want = ring.ntt(automorphism_coeff(a, k, n, ring.p))
        e_src = (pos_to_exp * k) % (2 * n)
        perm = brev[(e_src - 1) // 2]
        got = ring.ntt(a)[perm]
        np.testing.assert_array_equal(got, want)
