"""MXU modular matmul (int8 digit decomposition) vs exact integer oracle."""

import numpy as np
import pytest

from orion_tpu.crypto.mxu_modmatmul import ModMatmulPlan

PRIMES = [536870909, 67108859, 1073741789]  # 29/26/30-bit


@pytest.mark.parametrize("p", PRIMES)
@pytest.mark.parametrize("m,n", [(64, 128), (128, 256)])
def test_mod_matmul_exact(p, m, n):
    rng = np.random.default_rng(p % 1000)
    W = rng.integers(0, p, (m, m), dtype=np.uint64)
    X = rng.integers(0, p, (m, n), dtype=np.uint64).astype(np.uint32)

    plan = ModMatmulPlan(W, p)
    got = np.asarray(plan(X))

    want = (W.astype(object) @ X.astype(object)) % p
    np.testing.assert_array_equal(got, want.astype(np.uint32))
