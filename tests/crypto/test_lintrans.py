"""BSGS linear transform vs cleartext matvec."""

import numpy as np
import jax.numpy as jnp
import pytest

from orion_tpu.crypto import CKKSContext, Encoder, Evaluator, KeyChest
from orion_tpu.crypto.ciphertext import Ciphertext
from orion_tpu.crypto import lintrans

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def scheme():
    ctx = CKKSContext(logn=8, logq=[29, 26, 26], logp=[29, 29],
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


def _matvec_from_diags(diags, v, slots):
    out = np.zeros(slots)
    for d, vec in diags.items():
        out += vec * np.roll(v, -d)  # rot-left by d
    return out


def test_bsgs_matvec(scheme):
    ctx, enc, keys, ev = scheme
    slots = ctx.slots
    idxs = sorted(RNG.choice(slots, size=9, replace=False))
    diags = {int(d): RNG.uniform(-1, 1, slots) for d in idxs}
    v = RNG.uniform(-1, 1, slots)

    tr = lintrans.compile_transform(enc, diags, ctx.max_level, slots)
    ct = _encrypt(ctx, enc, keys, v)
    rots = lintrans.baby_rotations(ev, ct, tr.babies)
    out_ct = ev.rescale(lintrans.eval_transform(ev, tr, rots))

    assert out_ct.level == ctx.max_level - 1
    np.testing.assert_allclose(out_ct.scale, ct.scale)  # errorless
    got = _decrypt(ctx, enc, keys, out_ct)
    want = _matvec_from_diags(diags, v, slots)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_bsgs_single_diag_zero(scheme):
    """Diagonal 0 only = elementwise product, no rotations at all."""
    ctx, enc, keys, ev = scheme
    slots = ctx.slots
    diags = {0: RNG.uniform(-1, 1, slots)}
    v = RNG.uniform(-1, 1, slots)
    tr = lintrans.compile_transform(enc, diags, ctx.max_level, slots)
    assert tr.rotations_needed() == set()
    ct = _encrypt(ctx, enc, keys, v)
    rots = lintrans.baby_rotations(ev, ct, tr.babies)
    out = _decrypt(ctx, enc, keys,
                   ev.rescale(lintrans.eval_transform(ev, tr, rots)))
    np.testing.assert_allclose(out, diags[0] * v, atol=2e-3)


def test_blocked_transform(scheme):
    """2x2 block grid: out_i = sum_j T[i,j] @ v_j."""
    ctx, enc, keys, ev = scheme
    slots = ctx.slots
    grids = {}
    mats = {}
    for i in range(2):
        for j in range(2):
            idxs = RNG.choice(slots, size=4, replace=False)
            diags = {int(d): RNG.uniform(-1, 1, slots) for d in idxs}
            mats[(i, j)] = diags
            grids[(i, j)] = lintrans.compile_transform(
                enc, diags, ctx.max_level, slots)
    v0 = RNG.uniform(-1, 1, slots)
    v1 = RNG.uniform(-1, 1, slots)
    cts = [_encrypt(ctx, enc, keys, v0), _encrypt(ctx, enc, keys, v1)]
    outs = lintrans.eval_transform_blocked(ev, grids, cts, num_rows=2)
    for i, vsrcs in enumerate([(v0, v1), (v0, v1)]):
        want = (_matvec_from_diags(mats[(i, 0)], vsrcs[0], slots)
                + _matvec_from_diags(mats[(i, 1)], vsrcs[1], slots))
        got = _decrypt(ctx, enc, keys, outs[i])
        np.testing.assert_allclose(got, want, atol=5e-3)
