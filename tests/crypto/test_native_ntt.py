"""Native (C++/OpenMP) host NTT vs the numpy reference path.

The native kernel (orion_tpu/native/host_ntt.cpp) must be bit-exact
against the numpy butterflies in crypto/ref.py — it serves the same
PrimeRing/HostRing API and the encode pipeline rides whichever is
available.  Skipped when no compiler/native build exists.
"""

import numpy as np
import pytest

from orion_tpu import native
from orion_tpu.crypto.context import CKKSContext

pytestmark = pytest.mark.skipif(native.lib is None,
                                reason="native kernel unavailable")


@pytest.fixture(scope="module")
def ctx():
    return CKKSContext(logn=10, logq=[29, 26, 26], logp=[29, 29],
                       logscale=26, h=64, seed=3)


def _numpy_ntt(ring, a):
    """Force the numpy butterfly path (bypass the native branch)."""
    import orion_tpu.crypto.ref as ref
    saved = ref.native.lib
    try:
        ref.native.lib = None
        return ring.ntt(a)
    finally:
        ref.native.lib = saved


def _numpy_intt(ring, a):
    import orion_tpu.crypto.ref as ref
    saved = ref.native.lib
    try:
        ref.native.lib = None
        return ring.intt(a)
    finally:
        ref.native.lib = saved


def test_prime_ring_roundtrip_bitexact(ctx):
    rng = np.random.default_rng(0)
    ring = ctx.host.rings[0]
    a = rng.integers(0, ring.p, (5, ring.n), dtype=np.int64)
    fwd_native = ring.ntt(a)
    fwd_numpy = _numpy_ntt(ring, a)
    assert np.array_equal(fwd_native, fwd_numpy)
    back = ring.intt(fwd_native)
    assert np.array_equal(back, a)
    assert np.array_equal(back, _numpy_intt(ring, fwd_numpy))


def test_host_ring_batched_bitexact(ctx):
    rng = np.random.default_rng(1)
    host = ctx.host
    nl = len(host.primes)
    a = np.stack([
        np.stack([rng.integers(0, host.rings[i].p, host.n, dtype=np.int64)
                  for i in range(nl)])
        for _ in range(3)])                      # (B, L, n)
    fwd = host.ntt(a)
    assert np.array_equal(fwd, _numpy_ntt(host, a))
    back = host.intt(fwd)
    assert np.array_equal(back, a)
    assert np.array_equal(back, _numpy_intt(host, fwd))


def test_input_not_mutated(ctx):
    rng = np.random.default_rng(2)
    ring = ctx.host.rings[0]
    a = rng.integers(0, ring.p, (2, ring.n), dtype=np.int64)
    keep = a.copy()
    ring.ntt(a)
    assert np.array_equal(a, keep)
