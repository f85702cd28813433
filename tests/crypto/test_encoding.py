"""Canonical-embedding encode/decode roundtrip precision."""

import numpy as np
import pytest

from orion_tpu.crypto import CKKSContext, Encoder

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def ctx():
    return CKKSContext(logn=10, logq=[29, 26, 26, 26], logp=[29, 29],
                       logscale=26, h=64)


def test_embedding_roundtrip(ctx):
    enc = Encoder(ctx)
    v = RNG.normal(size=ctx.slots)
    coeffs = enc.slots_to_coeffs(v.astype(np.complex128))
    back = enc.coeffs_to_slots(coeffs)
    np.testing.assert_allclose(back.real, v, atol=1e-10)
    np.testing.assert_allclose(back.imag, 0, atol=1e-10)


def test_encode_decode_roundtrip(ctx):
    enc = Encoder(ctx)
    v = RNG.normal(size=ctx.slots)
    pt, scale = enc.encode(v)
    out = enc.decode(pt, scale)
    np.testing.assert_allclose(out, v, atol=1e-5)


def test_encode_decode_short_vector(ctx):
    enc = Encoder(ctx)
    v = RNG.normal(size=37)
    pt, scale = enc.encode(v, level=2)
    out = enc.decode(pt, scale, num_values=37)
    np.testing.assert_allclose(out, v, atol=1e-5)


def test_encode_at_prime_scale(ctx):
    """Encoding at scale q_l (the errorless-rescale trick) must roundtrip."""
    enc = Encoder(ctx)
    ql = ctx.q_primes[2]
    v = RNG.uniform(-1, 1, size=ctx.slots)
    pt, scale = enc.encode(v, level=2, scale=float(ql))
    out = enc.decode(pt, scale)
    np.testing.assert_allclose(out, v, atol=1e-6)
