"""Integration: residual fork/join + automatic bootstrap placement + an
encrypted forward that actually bootstraps mid-network.

The user chain is deliberately too short for the network depth, so the
series-parallel level solver MUST place a bootstrap; the encrypted forward
then exercises the full ModRaise/CtS/EvalMod/StC pipeline inside a network.
"""

import os

import numpy as np
import pytest

import orion_tpu as orion
import orion_tpu.nn as on
from orion_tpu.utils import ArrayLoader, mae

CONFIG = {
    "ckks_params": {
        "LogN": 9,
        "LogQ": [29, 26, 26, 26],   # l_eff = 3 < network depth => bootstrap
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


class TinyResNet2(on.Module):
    """Residual block with a 1x1-conv shortcut (BasicBlock shape)."""

    def __init__(self):
        super().__init__()
        self.conv0 = on.Conv2d(1, 2, 3, padding=1)
        self.bn0 = on.BatchNorm2d(2)
        self.act0 = on.Quad()

        self.conv1 = on.Conv2d(2, 2, 3, padding=1)
        self.bn1 = on.BatchNorm2d(2)
        self.act1 = on.Quad()
        self.conv2 = on.Conv2d(2, 2, 3, padding=1)
        self.bn2 = on.BatchNorm2d(2)
        self.add = on.Add()
        self.act2 = on.Quad()

        self.flatten = on.Flatten()
        self.fc = on.Linear(2 * 8 * 8, 4)

    def forward(self, x):
        x = self.act0(self.bn0(self.conv0(x)))
        y = self.act1(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        y = self.add(y, x)
        y = self.act2(y)
        return self.fc(self.flatten(y))


@pytest.mark.parametrize("io_mode", [
    pytest.param("none", marks=pytest.mark.skipif(
        not os.environ.get("ORION_TPU_SLOW_TESTS"),
        reason="slow tier; [stream] covers the production path")),
    "stream",
])
def test_residual_bootstrap_e2e(io_mode):
    # "stream" runs the ResNet production path: compiled buffers (keys,
    # diagonals, bootstrap circuits) stay in HOST numpy (crypto/placement)
    # and ride the per-module jit as call arguments (runtime/buffers.py)
    cfg = {**CONFIG, "orion": {**CONFIG["orion"], "io_mode": io_mode}}
    scheme = orion.scheme.init_scheme(cfg)
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

    # per-module jit keeps the encrypted forward tractable on the CPU
    # backend (eager dispatch would take ~30 min); program-signature
    # sharing means the bootstraps compile once
    from orion_tpu.runtime.jit import enable_module_jit
    enable_module_jit(scheme)

    ct = orion.encrypt(orion.encode(inp, input_level))
    net.he()
    out_fhe = np.asarray(net(ct).decrypt().decode()).reshape(-1)

    clear = np.asarray(out_clear).reshape(-1)
    dist = mae(clear, out_fhe[: clear.size])
    print(f"residual+bootstrap MAE: {dist}")  # 2.1e-5 measured
    assert dist < 0.01
