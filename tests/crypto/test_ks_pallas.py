"""Fused Pallas key-switch (crypto/ks_pallas.py) bit-exactness.

Runs the fused kernels in interpreter mode on the CPU backend and asserts
bit-identical outputs vs the unfused jnp path for decompose, finish
(normal + lean + trimmed) and the combined key-switch.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orion_tpu.crypto import KeyChest
from orion_tpu.crypto.context import CKKSContext
from orion_tpu.crypto.keyswitch import (dev_level, ks_decompose, ks_finish,
                                        keyswitch)
from orion_tpu.crypto import ks_pallas


@pytest.fixture(scope="module")
def setup():
    ctx = CKKSContext(logn=8, logq=[29, 26, 26, 26], logp=[29, 29],
                      logscale=26, h=64, seed=3)
    keys = KeyChest(ctx)
    dl = dev_level(ctx, ctx.max_level)
    rng = np.random.default_rng(7)
    c = jnp.asarray(rng.integers(
        0, min(ctx.primes), (ctx.max_level + 1, ctx.n)).astype(np.uint32))
    return ctx, keys, dl, c


def test_decompose_bit_exact(setup):
    ctx, keys, dl, c = setup
    ref = np.asarray(ks_decompose(c, dl))
    got = np.asarray(ks_pallas.ks_decompose_pallas(c, dl))
    assert np.array_equal(ref, got)


def test_finish_and_keyswitch_bit_exact(setup):
    ctx, keys, dl, c = setup
    rk = keys.relin_key
    ext = ks_decompose(c, dl)
    ref = np.asarray(ks_finish(ext, dl, rk.data, rk.shoup))
    got = np.asarray(ks_pallas.ks_finish_pallas(ext, dl, rk.data, rk.shoup))
    assert np.array_equal(ref, got)
    # lean (Montgomery) path
    ref_l = np.asarray(ks_finish(ext, dl, rk.data, None))
    got_l = np.asarray(ks_pallas.ks_finish_pallas(ext, dl, rk.data, None))
    assert np.array_equal(ref_l, got_l)
    # combined kernel
    got_c = np.asarray(ks_pallas.keyswitch_pallas(c, dl, rk.data, rk.shoup))
    assert np.array_equal(ref, got_c)


def test_trimmed_finish_bit_exact(setup):
    ctx, keys, dl, c = setup
    rk = keys.relin_key
    rows = jnp.asarray(np.array(dl.ksk_rows, np.int32))
    dnum = len(dl.digits)
    kd = rk.data[:dnum][:, :, rows]
    ks = rk.shoup[:dnum][:, :, rows]
    ext = ks_decompose(c, dl)
    ref = np.asarray(ks_finish(ext, dl, kd, ks, trimmed=True))
    got = np.asarray(ks_pallas.ks_finish_pallas(ext, dl, kd, ks,
                                                trimmed=True))
    assert np.array_equal(ref, got)


def test_grid_kernels_bit_exact():
    """Grid-streaming variants (one step per digit) on a deeper chain with
    an uneven last digit."""
    ctx = CKKSContext(logn=8, logq=[29] + [26] * 8, logp=[29, 29, 29],
                      logscale=26, h=64, seed=3)
    keys = KeyChest(ctx)
    rng = np.random.default_rng(7)
    for level in (ctx.max_level, 4):
        dl = dev_level(ctx, level)
        c = jnp.asarray(rng.integers(
            0, min(ctx.primes), (level + 1, ctx.n)).astype(np.uint32))
        ref_ext = np.asarray(ks_decompose(c, dl))
        got_ext = np.asarray(ks_pallas.ks_decompose_pallas_grid(c, dl))
        assert np.array_equal(ref_ext, got_ext)
        rk = keys.relin_key
        ext = ks_decompose(c, dl)
        ref = np.asarray(ks_finish(ext, dl, rk.data, rk.shoup))
        got = np.asarray(ks_pallas.ks_finish_pallas_grid(
            ext, dl, rk.data, rk.shoup))
        assert np.array_equal(ref, got)
        ref_l = np.asarray(ks_finish(ext, dl, rk.data, None))
        got_l = np.asarray(ks_pallas.ks_finish_pallas_grid(
            ext, dl, rk.data, None))
        assert np.array_equal(ref_l, got_l)


def test_env_dispatch(setup, monkeypatch):
    """ORION_TPU_FUSED_KS=1 routes the public API through the kernel."""
    ctx, keys, dl, c = setup
    rk = keys.relin_key
    ref = np.asarray(keyswitch(c, dl, rk.data, rk.shoup))
    monkeypatch.setenv("ORION_TPU_FUSED_KS", "1")
    got = np.asarray(keyswitch(c, dl, rk.data, rk.shoup))
    assert np.array_equal(ref, got)


def test_pallas_ntt_wrappers_bit_exact(monkeypatch):
    """Standalone Pallas NTT/iNTT kernels (incl. limb-chunked) match the
    jnp four-step path bit-exactly."""
    from orion_tpu.crypto.ntt4 import intt4, ntt4

    ctx = CKKSContext(logn=8, logq=[29, 26, 26, 26, 26, 26],
                      logp=[29, 29], logscale=26, h=64, seed=1)
    t4 = {k[3:]: ctx.dev[k] for k in ctx.t4_keys}
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(
        0, min(ctx.primes), (2, ctx.n_all, ctx.n)).astype(np.uint32))
    p = ctx.dev["p"]
    ref = ntt4(a, t4, p)
    assert np.array_equal(np.asarray(ref),
                          np.asarray(ks_pallas.pallas_ntt4(a, t4, p)))
    iref = intt4(ref, t4, ctx.dev["ninv"], ctx.dev["ninv_shoup"], p)
    assert np.array_equal(np.asarray(iref), np.asarray(
        ks_pallas.pallas_intt4(ref, t4, ctx.dev["ninv"],
                               ctx.dev["ninv_shoup"], p)))
    monkeypatch.setattr(ks_pallas, "_VMEM_BUDGET", 200 * 1024)
    assert np.array_equal(np.asarray(ref),
                          np.asarray(ks_pallas.pallas_ntt4(a, t4, p)))
