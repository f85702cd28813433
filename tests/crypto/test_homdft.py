"""Special-FFT factorisation pinned against the canonical embedding."""

import numpy as np
import pytest

from orion_tpu.crypto import CKKSContext, Encoder
from orion_tpu.crypto import homdft

RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def enc():
    ctx = CKKSContext(logn=8, logq=[29, 26], logp=[29], logscale=26, h=32)
    return Encoder(ctx)


def _apply_chain(mats, v):
    for m in mats:
        v = m @ v
    return v


def test_factorisation_matches_embedding(enc):
    n = enc.ctx.slots
    stages = homdft.build_stages(n)
    fold = homdft.build_fold(n)
    c = RNG.normal(size=2 * n)
    v = fold @ c
    for B in reversed(stages):  # B_k first
        v = B @ v
    want = enc.coeffs_to_slots(c)
    np.testing.assert_allclose(v, want, atol=1e-8)


def test_inverse_chain(enc):
    n = enc.ctx.slots
    stages = homdft.build_stages(n)
    c = RNG.normal(size=2 * n)
    z = enc.coeffs_to_slots(c)
    t = z
    for B in stages:  # B_1^-1 first
        t = homdft.invert_stage(B) @ t
    want = homdft.build_fold(n) @ c  # c_a + i c_b
    np.testing.assert_allclose(t, want, atol=1e-8)
    # real/imag split recovers the coefficient halves exactly
    fold = homdft.build_fold(n).tocoo()
    # leaf order: real part = c[col where val==1], imag = c[col where val==i]
    re_cols = np.zeros(n, dtype=int)
    im_cols = np.zeros(n, dtype=int)
    for r, col, v in zip(fold.row, fold.col, fold.data):
        if v.imag == 0:
            re_cols[r] = col
        else:
            im_cols[r] = col
    np.testing.assert_allclose(t.real, c[re_cols], atol=1e-8)
    np.testing.assert_allclose(t.imag, c[im_cols], atol=1e-8)


def test_grouped_stages(enc):
    n = enc.ctx.slots
    c = RNG.normal(size=2 * n)
    z = enc.coeffs_to_slots(c)
    for groups in (1, 2, 3):
        cts = homdft.cts_matrices(n, groups, scale=1.0)
        t = _apply_chain(cts, z)
        want = homdft.build_fold(n) @ c
        np.testing.assert_allclose(t, want, atol=1e-8)
        stc = homdft.stc_matrices(n, groups, scale=1.0)
        z2 = _apply_chain(stc, t)
        np.testing.assert_allclose(z2, z, atol=1e-8)


def test_diagonal_counts(enc):
    n = enc.ctx.slots
    cts = homdft.cts_matrices(n, 3, scale=1.0)
    for m in cts:
        diags = homdft.matrix_diagonals(m)
        assert len(diags) <= 2 ** (int(np.ceil(np.log2(n) / 3)) + 1) + 1


def test_diagonals_matvec(enc):
    n = enc.ctx.slots
    mats = homdft.stc_matrices(n, 2, scale=0.5)
    v = RNG.normal(size=n) + 1j * RNG.normal(size=n)
    for m in mats:
        diags = homdft.matrix_diagonals(m)
        got = np.zeros(n, dtype=np.complex128)
        for d, vec in diags.items():
            got += vec * np.roll(v, -d)
        np.testing.assert_allclose(got, m @ v, atol=1e-10)
        v = got
