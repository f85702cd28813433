"""Lean rotation keys (no Shoup companions, Montgomery lift) must match the
Shoup path and the cleartext matvec."""

import numpy as np
import jax.numpy as jnp
import pytest

from orion_tpu.crypto import CKKSContext, Encoder, Evaluator, KeyChest
from orion_tpu.crypto.ciphertext import Ciphertext
from orion_tpu.crypto import lintrans_scan as ls


@pytest.mark.parametrize("lean", [True, False])
def test_scan_transform_modes(lean):
    ctx = CKKSContext(logn=8, logq=[29, 26, 26], logp=[29, 29],
                      logscale=26, h=32)
    enc = Encoder(ctx)
    keys = KeyChest(ctx)
    ev = Evaluator(ctx, keys)
    ev.lean_keys = lean
    rng = np.random.default_rng(3)
    slots = ctx.slots
    idxs = sorted(rng.choice(slots, size=9, replace=False).tolist())
    diags = {int(d): rng.uniform(-1, 1, slots) for d in idxs}
    v = rng.uniform(-1, 1, slots)
    tr = ls.compile_transform_scan(enc, diags, ctx.max_level, slots)
    pt, s = enc.encode(v)
    ct = Ciphertext(jnp.asarray(keys.encrypt_rns(pt).astype(np.uint32)),
                    ctx.max_level, s)
    rots = ls.baby_rotation_cache(ev, ct, set(tr.babies) | {0})
    out = ev.rescale(ls.eval_transform_scan(ev, tr, ct, rots))
    got = enc.decode(
        keys.decrypt_rns(np.asarray(out.data).astype(np.int64)), out.scale)
    want = sum(vec * np.roll(v, -d) for d, vec in diags.items())
    assert np.max(np.abs(got - want)) < 5e-3
