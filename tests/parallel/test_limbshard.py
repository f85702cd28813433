"""Limb-sharded key-switch: bit-exact vs the single-chip path.

Runs on the 8-virtual-device CPU mesh (conftest).  The sharded evaluator
must produce EXACTLY the single-chip `keyswitch` output: both compute the
same integer arithmetic, just distributed, so equality is exact — any
drift means the row bookkeeping is wrong.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from orion_tpu.crypto import CKKSContext, KeyChest
from orion_tpu.crypto.keyswitch import dev_level, keyswitch
from orion_tpu.parallel.limbshard import make_sharded_keyswitch


@pytest.fixture(scope="module")
def setup():
    ctx = CKKSContext(logn=6, logq=[28, 26, 26, 26, 26, 26],
                      logp=[28, 28], logscale=26, h=16, seed=11)
    keys = KeyChest(ctx)
    return ctx, keys


@pytest.mark.parametrize("m", [4, 8])
def test_sharded_keyswitch_bitexact(setup, m):
    ctx, keys = setup
    level = ctx.max_level          # n_t = 6 + 2 = 8 rows
    rng = np.random.default_rng(3)
    n = 2 * ctx.slots if ctx.slots != ctx.n else ctx.n
    n = ctx.n
    c = np.stack([rng.integers(0, ctx.primes[i], n, dtype=np.int64)
                  for i in range(level + 1)]).astype(np.uint32)

    # single-chip reference
    want = np.asarray(keyswitch(c, dev_level(ctx, level),
                                keys.relin_key.data, keys.relin_key.shoup))

    devs = jax.devices()[:m]
    mesh = Mesh(np.array(devs), axis_names=("limb",))
    sks = make_sharded_keyswitch(ctx, level, mesh)
    kd, ks = sks.shard_ksk(keys.relin_key.data, keys.relin_key.shoup, ctx)
    out = np.asarray(sks.fn(sks.pad_poly(c), kd, ks))
    got = out[:, : level + 1]

    np.testing.assert_array_equal(got, want)
