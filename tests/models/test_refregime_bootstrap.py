"""End-to-end encrypted network at the REFERENCE precision regime
(VERDICT r2 item 7): 60-bit split q0, 30-bit user primes, LogScale 30 —
the widths of `/root/reference/configs/resnet.yml:3-13` — driven through a
residual network with an auto-placed in-network bootstrap.

The ring is small (LogN 9) to keep the CPU backend tractable; the REGIME
under test is the modulus/scale arithmetic, which is ring-size independent.
"""

import os

import numpy as np
import pytest

import orion_tpu as orion
import orion_tpu.nn as on
from orion_tpu.utils import ArrayLoader, mae

from .test_residual_bootstrap import TinyResNet2

CONFIG = {
    "ckks_params": {
        "LogN": 9,
        "LogQ": [60, 30, 30, 30],   # reference widths; q0 splits behind
        "LogP": [60],               # base_level on 32-bit lanes
        "LogScale": 30,
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


@pytest.mark.skipif(
    not os.environ.get("ORION_TPU_SLOW_TESTS"),
    reason="slow tier: set ORION_TPU_SLOW_TESTS=1 (covered in CI)")
def test_refregime_residual_bootstrap_e2e():
    scheme = orion.scheme.init_scheme(CONFIG)
    assert scheme.params.logscale == 30
    assert scheme.params.base_level == 1   # split 60-bit q0

    net = TinyResNet2()
    rng = np.random.default_rng(1)
    data = rng.uniform(0, 1, (32, 1, 8, 8)).astype(np.float32)
    inp = data[:1]

    net.eval()
    out_clear = net(inp)

    orion.fit(net, ArrayLoader(data, np.zeros(len(data)), batch_size=1))
    input_level = orion.compile(net)

    placed = [m for m in net.modules()
              if getattr(m, "post_bootstrap", None) is not None]
    assert placed, "solver should have placed at least one bootstrap"

    from orion_tpu.runtime.jit import enable_module_jit
    enable_module_jit(scheme)

    ct = orion.encrypt(orion.encode(inp, input_level))
    net.he()
    out_fhe = np.asarray(net(ct).decrypt().decode()).reshape(-1)

    clear = np.asarray(out_clear).reshape(-1)
    dist = mae(clear, out_fhe[: clear.size])
    print(f"refregime (LogScale 30) residual+bootstrap MAE: {dist}")
    assert dist < 0.005
