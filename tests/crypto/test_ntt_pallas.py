"""Pallas NTT kernel vs the jnp reference path (interpret mode on CPU;
bit-exact on TPU hardware too, validated manually at logn 13)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orion_tpu.crypto import CKKSContext
from orion_tpu.crypto.keyswitch import dev_level
from orion_tpu.crypto.ntt import ntt as jntt, intt as jintt
from orion_tpu.crypto.ntt_pallas import PallasNTT

RNG = np.random.default_rng(9)


def test_pallas_ntt_matches_jnp():
    ctx = CKKSContext(logn=8, logq=[29, 26], logp=[29], logscale=26, h=32)
    dl = dev_level(ctx, ctx.max_level)
    pn = PallasNTT(ctx)
    L = 2
    a = jnp.asarray(np.stack(
        [RNG.integers(0, ctx.primes[i], ctx.n) for i in range(L)]
    ).astype(np.uint32))
    rows = list(range(L))
    got = pn.ntt(a, rows)
    want = jntt(a, dl.q_tw, dl.q_tw_shoup, dl.q_p)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    back = pn.intt(got, rows)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))
