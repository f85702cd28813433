"""Four-step NTT (crypto/ntt4.py) bit-exactness vs the stage-loop NTT.

The four-step path must produce bit-identical uint32 outputs to ntt.py's
loop (same linear map, exact modular arithmetic), including through the
DevLevel-sliced tables used by key-switching and rescale.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orion_tpu.crypto.context import CKKSContext
from orion_tpu.crypto.ntt import ntt, intt
from orion_tpu.crypto.ntt4 import build_t4_tables, ntt4, intt4


@pytest.mark.parametrize("logn", [8, 10])
def test_ntt4_bit_exact(logn):
    ctx = CKKSContext(logn=logn, logq=[29, 26, 26], logp=[29],
                      logscale=26, h=64, seed=1)
    t4 = {k[3:]: ctx.dev[k] for k in ctx.t4_keys}
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(
        0, min(ctx.primes), (2, ctx.n_all, ctx.n)).astype(np.uint32))
    p = ctx.dev["p"]
    ref = ntt(a, ctx.dev["tw"], ctx.dev["tw_shoup"], p)
    got = ntt4(a, t4, p)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    iref = intt(ref, ctx.dev["itw"], ctx.dev["itw_shoup"],
                ctx.dev["ninv"], ctx.dev["ninv_shoup"], p)
    igot = intt4(ref, t4, ctx.dev["ninv"], ctx.dev["ninv_shoup"], p)
    assert np.array_equal(np.asarray(iref), np.asarray(igot))
    assert np.array_equal(np.asarray(iref), np.asarray(a))


def test_keyswitch_matches_with_and_without_t4(monkeypatch):
    """A full hybrid key-switch is bit-identical on both NTT paths."""
    from orion_tpu.crypto import KeyChest
    from orion_tpu.crypto.keyswitch import dev_level, ks_decompose, ks_finish

    def run(disable):
        if disable:
            monkeypatch.setenv("ORION_TPU_NTT4", "0")
        else:
            monkeypatch.delenv("ORION_TPU_NTT4", raising=False)
        ctx = CKKSContext(logn=8, logq=[29, 26, 26], logp=[29, 29],
                          logscale=26, h=64, seed=3)
        keys = KeyChest(ctx)
        dl = dev_level(ctx, ctx.max_level)
        rng = np.random.default_rng(7)
        c = jnp.asarray(rng.integers(
            0, min(ctx.primes), (ctx.max_level + 1, ctx.n)
        ).astype(np.uint32))
        rk = keys.relin_key
        out = ks_finish(ks_decompose(c, dl), dl, rk.data, rk.shoup)
        return np.asarray(out)

    a = run(disable=False)
    b = run(disable=True)
    assert np.array_equal(a, b)
