"""ConjugateInvariant ring ops (real slots = N).

The reference's default ring for the MLP/LoLA test configs
(`tests/configs/mlp.yml:9`, `orion/backend/lattigo/scheme.go:57-67`).
Our CI ring stores n coefficients and routes NTTs through the 2n lift
(crypto/ntt.py ci_ntt/ci_intt, crypto/ref.py CIHostRing); slots are all
real and conjugation is the identity.

Oracle: decrypt+decode must match the cleartext computation within CKKS
noise, exactly as tests/crypto/test_scheme_ops.py does on the standard ring.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orion_tpu.crypto import CKKSContext, Encoder, Evaluator, KeyChest
from orion_tpu.crypto.ciphertext import Ciphertext, Plaintext

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def scheme():
    ctx = CKKSContext(logn=10, logq=[29, 26, 26, 26], logp=[29, 29],
                      logscale=26, h=64, ring_type="conjugate_invariant")
    enc = Encoder(ctx)
    keys = KeyChest(ctx)
    ev = Evaluator(ctx, keys)
    return ctx, enc, keys, ev


def _encrypt(ctx, enc, keys, v, level=None, scale=None):
    pt, s = enc.encode(v, level=level, scale=scale)
    ct = keys.encrypt_rns(pt)
    lvl = ctx.max_level if level is None else level
    return Ciphertext(jnp.asarray(ct.astype(np.uint32)), lvl, s)


def _decrypt(ctx, enc, keys, ct, n=None):
    raw = keys.decrypt_rns(np.asarray(ct.data).astype(np.int64))
    return enc.decode(raw, ct.scale, num_values=n)


def test_slot_count(scheme):
    ctx, *_ = scheme
    assert ctx.slots == ctx.n == 1024  # CI ring: slots = N, all real


def test_encode_decode_roundtrip(scheme):
    ctx, enc, keys, ev = scheme
    v = RNG.normal(size=ctx.slots)
    coeffs = enc.slots_to_coeffs(v)
    back = enc.coeffs_to_slots(coeffs)
    np.testing.assert_allclose(back.real, v, atol=1e-9)
    assert np.max(np.abs(back.imag)) < 1e-9  # CI slots are real


def test_encrypt_decrypt(scheme):
    ctx, enc, keys, ev = scheme
    v = RNG.normal(size=ctx.slots)
    ct = _encrypt(ctx, enc, keys, v)
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, ct), v, atol=1e-3)


def test_add_mul_plain(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.normal(size=ctx.slots)
    b = RNG.normal(size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    ptd, pts, ptscale = enc.encode(b, level=ctx.max_level, with_shoup=True)
    pt = Plaintext(jnp.asarray(ptd.astype(np.uint32)), jnp.asarray(pts),
                   ctx.max_level, ptscale)
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, ev.add_plain(ca, pt)),
                               a + b, atol=1e-3)
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, ev.mul_plain(ca, pt)),
                               a * b, atol=1e-3)


def test_mul_relin(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.uniform(-1, 1, size=ctx.slots)
    b = RNG.uniform(-1, 1, size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    cb = _encrypt(ctx, enc, keys, b)
    got = ev.mul_relin(ca, cb)
    assert got.level == ctx.max_level - 1
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, got), a * b, atol=1e-3)


def test_rescale_chain(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.uniform(-1, 1, size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    c2 = ev.square(ca)
    c4 = ev.square(c2)
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, c4), a ** 4, atol=5e-3)


def test_rotate(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.normal(size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    for r in (1, 7, 100, ctx.slots - 1):
        got = _decrypt(ctx, enc, keys, ev.rotate(ca, r))
        np.testing.assert_allclose(got, np.roll(a, -r), atol=1e-3)


def test_conjugate_is_identity(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.normal(size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    got = ev.conjugate(ca)
    assert got is ca  # no key-switch spent on real slots
