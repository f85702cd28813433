"""Homomorphic polynomial evaluation vs numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

from orion_tpu.crypto import CKKSContext, Encoder, Evaluator, KeyChest
from orion_tpu.crypto.ciphertext import Ciphertext
from orion_tpu.crypto.polyeval import Polynomial, evaluate_polynomial

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def scheme():
    # deep chain for degree-31 polys: depth 5 + headroom
    ctx = CKKSContext(logn=9, logq=[29] + [26] * 7, logp=[29, 29],
                      logscale=26, h=32)
    enc = Encoder(ctx)
    keys = KeyChest(ctx)
    ev = Evaluator(ctx, keys)
    return ctx, enc, keys, ev


def _encrypt(ctx, enc, keys, v):
    pt, s = enc.encode(v)
    ct = keys.encrypt_rns(pt)
    return Ciphertext(jnp.asarray(ct.astype(np.uint32)), ctx.max_level, s)


def _decrypt(ctx, enc, keys, ct):
    raw = keys.decrypt_rns(np.asarray(ct.data).astype(np.int64))
    return enc.decode(raw, ct.scale)


@pytest.mark.parametrize("deg", [2, 3, 7, 15])
def test_monomial(scheme, deg):
    ctx, enc, keys, ev = scheme
    coeffs = RNG.uniform(-1, 1, deg + 1)
    x = RNG.uniform(-1, 1, ctx.slots)
    ct = _encrypt(ctx, enc, keys, x)
    poly = Polynomial(list(coeffs), "monomial")
    out = evaluate_polynomial(ev, ct, poly)
    want = np.polyval(coeffs[::-1], x)
    got = _decrypt(ctx, enc, keys, out)
    np.testing.assert_allclose(got, want, atol=2e-2)
    # depth check: consumed exactly ceil(log2(#coeffs)) levels
    assert out.level >= ctx.max_level - poly.depth


@pytest.mark.parametrize("deg", [3, 8, 15, 31])
def test_chebyshev(scheme, deg):
    ctx, enc, keys, ev = scheme
    coeffs = RNG.uniform(-1, 1, deg + 1) / (deg + 1)
    x = RNG.uniform(-0.99, 0.99, ctx.slots)
    ct = _encrypt(ctx, enc, keys, x)
    poly = Polynomial(list(coeffs), "chebyshev")
    out = evaluate_polynomial(ev, ct, poly)
    want = np.polynomial.chebyshev.chebval(x, coeffs)
    got = _decrypt(ctx, enc, keys, out)
    np.testing.assert_allclose(got, want, atol=2e-2)
    assert out.level >= ctx.max_level - poly.depth - 1


def test_chebyshev_chunked_ps(scheme):
    """Degree >= 32 switches to chunked Paterson–Stockmeyer (the bootstrap
    EvalMod path): ~2*sqrt(d) ct-ct mults, one extra level."""
    ctx, enc, keys, ev = scheme
    deg = 63
    coeffs = RNG.uniform(-1, 1, deg + 1) / np.sqrt(deg + 1)
    x = RNG.uniform(-0.99, 0.99, ctx.slots)
    ct = _encrypt(ctx, enc, keys, x)
    poly = Polynomial(list(coeffs), "chebyshev")

    calls = {"n": 0}
    orig = ev.mul_relin

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    ev.mul_relin = counting
    try:
        out = evaluate_polynomial(ev, ct, poly)
    finally:
        ev.mul_relin = orig
    want = np.polynomial.chebyshev.chebval(x, coeffs)
    got = _decrypt(ctx, enc, keys, out)
    np.testing.assert_allclose(got, want, atol=3e-2)
    # babies (6) + giants (3) + recombination (7) << d/2 binary leaves
    assert calls["n"] <= 20, f"PS should use ~2sqrt(d) mults, got {calls}"
    assert out.level >= ctx.max_level - (poly.depth + 1)


def test_output_scale_pinning(scheme):
    """output_scale=q_l enables the exact-rescale trick used by _Sign."""
    ctx, enc, keys, ev = scheme
    coeffs = [0.0, 1.0, 0.5, 0.25]
    x = RNG.uniform(-1, 1, ctx.slots)
    ct = _encrypt(ctx, enc, keys, x)
    poly = Polynomial(coeffs, "chebyshev")
    out = evaluate_polynomial(ev, ct, poly)
    ql = float(ctx.q_primes[out.level])
    out2 = evaluate_polynomial(ev, ct, poly, output_scale=ql)
    np.testing.assert_allclose(out2.scale, ql)
    want = np.polynomial.chebyshev.chebval(x, coeffs)
    got = _decrypt(ctx, enc, keys, out2)
    np.testing.assert_allclose(got, want, atol=5e-3)
