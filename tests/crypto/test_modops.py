"""Unit tests: 32-bit-lane modular arithmetic vs exact python ints."""

import numpy as np
import jax.numpy as jnp

from orion_tpu.crypto import modops

RNG = np.random.default_rng(1234)


def _rand_u32(n, hi=1 << 32):
    return RNG.integers(0, hi, size=n, dtype=np.uint64).astype(np.uint32)


def test_mulhi32():
    a = _rand_u32(1000)
    b = _rand_u32(1000)
    got = np.asarray(modops.mulhi32(jnp.asarray(a), jnp.asarray(b)))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> np.uint64(32)
            ).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_shoup_mul():
    p = 2147352577  # 31-bit NTT prime
    a = _rand_u32(1000) % p
    for c in [1, 2, p - 1, 123456789, (1 << 30) + 7]:
        c = c % p
        c_shoup = modops.shoup_precompute(c, p)
        got = np.asarray(modops.shoup_mul(
            jnp.asarray(a), jnp.uint32(c), jnp.uint32(c_shoup), jnp.uint32(p)))
        want = (a.astype(object) * c % p).astype(np.uint32)
        np.testing.assert_array_equal(got, want)


def test_shoup_mul_arbitrary_a():
    # Shoup reduction is valid for any a < 2^32 (used as barrett-reduce)
    p = 536608769  # 29-ish bit prime
    a = _rand_u32(1000)  # full u32 range
    c_shoup = modops.shoup_precompute(1, p)
    got = np.asarray(modops.shoup_mul(
        jnp.asarray(a), jnp.uint32(1), jnp.uint32(c_shoup), jnp.uint32(p)))
    want = (a.astype(np.uint64) % p).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_mont_mul():
    p = 1073479681
    pinv = (-pow(p, -1, 1 << 32)) % (1 << 32)
    r = (1 << 32) % p
    r_shoup = modops.shoup_precompute(r, p)
    a = _rand_u32(1000) % p
    b = _rand_u32(1000) % p
    bm = modops.to_mont(jnp.asarray(b), jnp.uint32(r), jnp.uint32(r_shoup),
                        jnp.uint32(p))
    got = np.asarray(modops.mont_mul(jnp.asarray(a), bm, jnp.uint32(p),
                                     jnp.uint32(pinv)))
    want = (a.astype(object) * b.astype(object) % p).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_add_sub_neg():
    p = 268369921
    a = _rand_u32(1000) % p
    b = _rand_u32(1000) % p
    pj = jnp.uint32(p)
    np.testing.assert_array_equal(
        np.asarray(modops.add_mod(jnp.asarray(a), jnp.asarray(b), pj)),
        (a.astype(np.uint64) + b) % p)
    np.testing.assert_array_equal(
        np.asarray(modops.sub_mod(jnp.asarray(a), jnp.asarray(b), pj)),
        (a.astype(np.int64) - b) % p)
    np.testing.assert_array_equal(
        np.asarray(modops.neg_mod(jnp.asarray(a), pj)),
        (-a.astype(np.int64)) % p)
