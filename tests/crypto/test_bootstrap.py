"""CKKS bootstrapping correctness on small parameters.

Oracle: bootstrap an exhausted ciphertext and compare decrypted values
before/after — the refreshed ciphertext must carry the same message at the
top of the user chain.
"""

import numpy as np
import os

import pytest

import orion_tpu as orion

CONFIG = {
    "ckks_params": {
        "LogN": 9,
        "LogQ": [29, 26],          # single-prime q0: l_eff = 1
        "LogP": [29, 29],
        "LogScale": 26,
        "H": 64,
        "RingType": "Standard",
    },
    "boot_params": {
        "CtSLevels": 3,
        "StCLevels": 3,
        "ModDegree": 255,
        "K": 15,
    },
    "orion": {"margin": 2, "backend": "tpu", "fuse_modules": True},
}

RNG = np.random.default_rng(23)

# Full-band parameters: a wide SPLIT q0 (55-bit across two primes) gives
# the MessageRatio prescale room — the bootstrapper lifts messages to
# Delta_boot = D*Delta ~ q0/512 with an exact integer multiply, so x spans
# the whole [-1, 1] band with no module headroom prescale, the sine
# linearisation error is ~(2pi)^2/(6*512^2) ~ 2.5e-5, and every
# EvalMod-input error is amplified only by beta = 512*(K+1) ~ 2^13.
CONFIG_FULLBAND = {
    "ckks_params": {
        "LogN": 9,
        "LogQ": [55, 26],
        "LogP": [30, 30],
        "LogScale": 26,
        "H": 64,
        "RingType": "Standard",
    },
    "boot_params": {
        "CtSLevels": 3,
        "StCLevels": 3,
        "ModDegree": 255,
        "K": 15,
        "MsgRatio": 512,
    },
    "orion": {"margin": 2, "backend": "tpu", "fuse_modules": True},
}


@pytest.fixture(scope="module")
def scheme():
    return orion.scheme.init_scheme(CONFIG)


def test_mod_raise_roundtrip(scheme):
    """ModRaise preserves the message (mod q0 values unchanged)."""
    from orion_tpu.crypto.bootstrap import Bootstrapper
    btp = scheme.bootstrapper.generate_bootstrapper(scheme.ctx.slots)
    x = RNG.uniform(-1, 1, scheme.ctx.slots)
    pt = scheme.encoder.encode(x, level=scheme.params.base_level)
    ct = scheme.encryptor.encrypt(pt)
    raised = btp.mod_raise(ct.cts[0])
    assert raised.level == scheme.ctx.max_level
    # decrypting the raised ct mod the BOTTOM prime still yields x
    raw = scheme.keys.decrypt_rns(
        np.asarray(raised.data).astype(np.int64))
    got = scheme.enc.decode(raw[: scheme.params.base_level + 1],
                            raised.scale)
    np.testing.assert_allclose(got, x, atol=1e-2)


def test_eval_mod_poly_quality():
    from orion_tpu.crypto.bootstrap import fit_eval_mod
    K = 15
    coefs = fit_eval_mod(K, 255)
    y = RNG.uniform(-1, 1, 4000)
    got = np.polynomial.chebyshev.chebval(y, coefs)
    want = np.sin(2 * np.pi * (K + 1) * y) / (2 * np.pi * (K + 1))
    assert np.max(np.abs(got - want)) < 1e-9


SLOW = pytest.mark.skipif(
    not os.environ.get("ORION_TPU_SLOW_TESTS"),
    reason="slow tier: set ORION_TPU_SLOW_TESTS=1 (covered in CI)")


@SLOW
def test_sparse_bootstrap(scheme):
    """s-point circuit on a zero-padded ciphertext: first s slots carry the
    refreshed message, upper slots its replicas (sparse packing)."""
    s = 32
    btp = scheme.bootstrapper.get_for_slots(s)
    assert btp.slots == s and btp.ratio == scheme.ctx.slots // s
    # sparse stages are strictly cheaper than the full-slot circuit
    full = scheme.bootstrapper.get_for_slots(scheme.ctx.slots)
    n_d_sparse = sum(int(tr.pts.shape[0]) for tr in
                     btp.cts_transforms + btp.stc_transforms)
    n_d_full = sum(int(tr.pts.shape[0]) for tr in
                   full.cts_transforms + full.stc_transforms)
    assert n_d_sparse < n_d_full

    x = np.zeros(scheme.ctx.slots)
    x[:s] = RNG.uniform(-0.125, 0.125, s)
    pt = scheme.encoder.encode(x, level=scheme.params.base_level)
    ct = scheme.encryptor.encrypt(pt)

    out = btp.bootstrap(ct.cts[0])
    assert out.level == scheme.params.base_level + scheme.params.l_eff

    raw = scheme.keys.decrypt_rns(np.asarray(out.data).astype(np.int64))
    got = scheme.enc.decode(raw, out.scale)
    err = float(np.max(np.abs(got[:s] - x[:s])))
    print(f"sparse bootstrap max err: {err}")
    assert err < 2e-3
    # replicated upper slots
    rep = got.reshape(-1, s)
    assert float(np.max(np.abs(rep - rep[0]))) < 2e-3


@SLOW
def test_fullband_bootstrap():
    """Full-range messages (x in [-1, 1]): wide split q0 + MessageRatio
    prescale + 2^60 EvalMod working scale (VERDICT item 3 — no headroom
    prescale, err < 1e-4)."""
    from orion_tpu.runtime.scheme import Scheme
    sch = Scheme().init_scheme(CONFIG_FULLBAND)
    btp = sch.bootstrapper.generate_bootstrapper(sch.ctx.slots)
    x = RNG.uniform(-1.0, 1.0, sch.ctx.slots)
    pt = sch.encoder.encode(x, level=sch.params.base_level)
    ct = sch.encryptor.encrypt(pt)

    out = btp.bootstrap(ct.cts[0])
    assert out.level == sch.params.base_level + sch.params.l_eff

    raw = sch.keys.decrypt_rns(np.asarray(out.data).astype(np.int64))
    got = sch.enc.decode(raw, out.scale)
    err = float(np.max(np.abs(got - x)))
    print(f"full-band bootstrap max err: {err}")
    assert err < 1e-4


def test_full_bootstrap(scheme):
    btp = scheme.bootstrapper.generate_bootstrapper(scheme.ctx.slots)
    # message range 1/8 of q0/Delta headroom: the sine linearisation
    # error stays below the noise floor (full-range messages need the
    # double-prime-scale EvalMod, tracked for round 2)
    x = RNG.uniform(-0.125, 0.125, scheme.ctx.slots)
    # encrypt at the BOTTOM of the user chain (exhausted ciphertext)
    pt = scheme.encoder.encode(x, level=scheme.params.base_level)
    ct = scheme.encryptor.encrypt(pt)

    out = btp.bootstrap(ct.cts[0])
    assert out.level == scheme.params.base_level + scheme.params.l_eff

    raw = scheme.keys.decrypt_rns(np.asarray(out.data).astype(np.int64))
    got = scheme.enc.decode(raw, out.scale)
    err = float(np.max(np.abs(got - x)))
    print(f"bootstrap max err: {err}")
    assert err < 2e-3
