"""End-to-end homomorphic op tests on small parameters (CPU backend).

Oracle: decrypt+decode must match the cleartext computation within CKKS
noise.  This is the per-kernel test pyramid the reference lacks (SURVEY §4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orion_tpu.crypto import CKKSContext, Encoder, Evaluator, KeyChest
from orion_tpu.crypto.ciphertext import Ciphertext, Plaintext

RNG = np.random.default_rng(42)


@pytest.fixture(autouse=True)
def _reseed():
    # Per-test deterministic draws: a module-shared generator makes test
    # inputs depend on execution order, which differs under pytest-xdist
    # partitioning vs a serial run.
    global RNG
    RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def scheme():
    ctx = CKKSContext(logn=10, logq=[29, 26, 26, 26], logp=[29, 29],
                      logscale=26, h=64)
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


def test_encrypt_decrypt(scheme):
    ctx, enc, keys, ev = scheme
    v = RNG.normal(size=ctx.slots)
    ct = _encrypt(ctx, enc, keys, v)
    out = _decrypt(ctx, enc, keys, ct)
    np.testing.assert_allclose(out, v, atol=1e-3)


def test_add_sub_neg(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.normal(size=ctx.slots)
    b = RNG.normal(size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    cb = _encrypt(ctx, enc, keys, b)
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, ev.add(ca, cb)),
                               a + b, atol=1e-3)
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, ev.sub(ca, cb)),
                               a - b, atol=1e-3)
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, ev.negate(ca)),
                               -a, atol=1e-3)


def test_add_plain_mul_plain(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.normal(size=ctx.slots)
    b = RNG.normal(size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    ptd, pts, ptscale = enc.encode(b, level=ctx.max_level, with_shoup=True)
    pt = Plaintext(jnp.asarray(ptd.astype(np.uint32)), jnp.asarray(pts),
                   ctx.max_level, ptscale)
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, ev.add_plain(ca, pt)),
                               a + b, atol=1e-3)
    got = ev.mul_plain(ca, pt)
    assert got.level == ctx.max_level - 1
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, got), a * b, atol=1e-3)


def test_rescale_scale_tracking(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.normal(size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    cb = ev.mul_scalar_float(ca, 1.5)
    assert cb.level == ctx.max_level - 1
    np.testing.assert_allclose(ca.scale, cb.scale)  # errorless trick
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, cb), 1.5 * a, atol=1e-3)


def test_mul_scalar_int(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.normal(size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    cb = ev.mul_scalar_int(ca, 7)
    assert cb.level == ca.level  # no level consumed
    # the integer scalar amplifies ciphertext noise 7x: base noise floor
    # ~1.5e-4 puts the worst slot near 1.05e-3; atol 2e-3 is that 7x
    # amplification plus ~2x headroom for unlucky noise draws
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, cb), 7 * a, atol=2e-3)


def test_add_scalar(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.normal(size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, ev.add_scalar(ca, 2.5)),
                               a + 2.5, atol=1e-3)


def test_mul_relin(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.uniform(-1, 1, size=ctx.slots)
    b = RNG.uniform(-1, 1, size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    cb = _encrypt(ctx, enc, keys, b)
    got = ev.mul_relin(ca, cb)
    assert got.level == ctx.max_level - 1
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, got), a * b, atol=1e-3)


def test_square_chain(scheme):
    """x -> x^2 -> x^4 consumes two levels and stays accurate."""
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
    for r in (1, 5, 100, ctx.slots - 1):
        got = _decrypt(ctx, enc, keys, ev.rotate(ca, r))
        np.testing.assert_allclose(got, np.roll(a, -r), atol=1e-3)


def test_conjugate(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.normal(size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    got = _decrypt(ctx, enc, keys, ev.conjugate(ca))
    np.testing.assert_allclose(got, a, atol=1e-3)  # real data: conj == id


def test_mod_drop_and_align(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.normal(size=ctx.slots)
    b = RNG.normal(size=ctx.slots)
    ca = _encrypt(ctx, enc, keys, a)
    cb = _encrypt(ctx, enc, keys, b, level=1)
    got = ev.add(ca, cb)
    assert got.level == 1
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, got), a + b, atol=1e-3)
