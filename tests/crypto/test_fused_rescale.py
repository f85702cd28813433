"""mul_relin's fused ModDown+rescale epilogue (mod_drop_rescale).

The fused path accumulates the relin inner product in the extended basis,
folds the ciphertext part in as P*d, and divides by P*q_l in one basis
conversion.  Checks: (1) the combined divide equals ModDown-then-rescale
on a random accumulator; (2) end-to-end mul_relin decrypts identically
(same level/scale, error at the noise floor) with the flag on and off,
including batched (2, n_t, N) accumulators and a chained second multiply.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from orion_tpu.crypto import CKKSContext, Encoder, Evaluator, KeyChest
from orion_tpu.crypto.ciphertext import Ciphertext
from orion_tpu.crypto.keyswitch import (dev_level, mod_down,
                                        mod_drop_rescale, rescale_poly)

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def scheme():
    ctx = CKKSContext(logn=10, logq=[29, 26, 26, 26], logp=[29, 29],
                      logscale=26, h=64, seed=1)
    enc = Encoder(ctx)
    keys = KeyChest(ctx)
    return ctx, enc, keys, Evaluator(ctx, keys)


def _encrypt(ctx, enc, keys, v):
    pt, s = enc.encode(v)
    return Ciphertext(jnp.asarray(keys.encrypt_rns(pt).astype(np.uint32)),
                      ctx.max_level, s)


def _decrypt(ctx, enc, keys, ct):
    raw = keys.decrypt_rns(np.asarray(ct.data).astype(np.int64))
    return enc.decode(raw, ct.scale)


def test_mod_drop_rescale_equals_moddown_then_rescale(scheme):
    ctx, _, _, _ = scheme
    lvl = ctx.max_level
    dl = dev_level(ctx, lvl)
    n_sp = ctx.n_all - ctx.n_q
    primes_t = ([ctx.primes[i] for i in range(lvl + 1)]
                + [ctx.primes[i] for i in range(ctx.n_q, ctx.n_all)])
    acc = np.stack([RNG.integers(0, primes_t[i], ctx.n, dtype=np.int64)
                    for i in range(lvl + 1 + n_sp)]).astype(np.uint32)
    want = np.asarray(rescale_poly(mod_down(jnp.asarray(acc), dl), dl))
    got = np.asarray(mod_drop_rescale(jnp.asarray(acc), dl))
    np.testing.assert_array_equal(got, want)
    # batched form (the mul_relin layout)
    acc2 = np.stack([acc, acc])
    got2 = np.asarray(mod_drop_rescale(jnp.asarray(acc2), dl))
    np.testing.assert_array_equal(got2[0], want)
    np.testing.assert_array_equal(got2[1], want)


def test_mul_relin_fused_matches_unfused(scheme):
    ctx, enc, keys, ev = scheme
    a = RNG.normal(size=ctx.slots) * 0.5
    b = RNG.normal(size=ctx.slots) * 0.5
    ca, cb = (_encrypt(ctx, enc, keys, a), _encrypt(ctx, enc, keys, b))

    assert os.environ.get("ORION_TPU_FUSED_RESCALE", "1") != "0"
    m_f = ev.mul_relin(ca, cb)
    os.environ["ORION_TPU_FUSED_RESCALE"] = "0"
    try:
        m_u = ev.mul_relin(ca, cb)
    finally:
        del os.environ["ORION_TPU_FUSED_RESCALE"]

    assert m_f.level == m_u.level
    np.testing.assert_allclose(m_f.scale, m_u.scale)
    got_f = _decrypt(ctx, enc, keys, m_f)
    got_u = _decrypt(ctx, enc, keys, m_u)
    np.testing.assert_allclose(got_f, a * b, atol=1e-3)
    # the two epilogues agree to the last rounding unit: decrypted values
    # match far below the ciphertext noise floor
    np.testing.assert_allclose(got_f, got_u, atol=1e-6)

    # chained multiply on the fused output exercises the next level's
    # tables (dropdown at lvl-1)
    sq = ev.mul_relin(m_f, m_f)
    np.testing.assert_allclose(_decrypt(ctx, enc, keys, sq), (a * b) ** 2,
                               atol=2e-3)
