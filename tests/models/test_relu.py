"""Encrypted ReLU end-to-end: minimax sign composite + x*sign(x) under FHE.

Small net (Linear -> ReLU -> Linear) on a deep-enough chain; oracle is the
cleartext forward of the same net (reference MAE discipline).
"""

import numpy as np
import pytest

import orion_tpu as orion
import orion_tpu.nn as on
from orion_tpu.utils import ArrayLoader, mae

CONFIG = {
    "ckks_params": {
        "LogN": 9,
        "LogQ": [29] + [26] * 17,
        "LogP": [29, 29],
        "LogScale": 26,
        "H": 64,
        "RingType": "Standard",
    },
    "orion": {"margin": 2, "backend": "tpu", "fuse_modules": True},
}


class TinyReLUNet(on.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = on.Linear(16, 16)
        self.act = on.ReLU()
        self.fc2 = on.Linear(16, 4)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


def test_encrypted_relu_net():
    scheme = orion.scheme.init_scheme(CONFIG)
    net = TinyReLUNet()
    rng = np.random.default_rng(0)
    data = rng.uniform(-1, 1, (64, 16)).astype(np.float32)
    inp = data[:1]

    net.eval()
    out_clear = net(inp)

    loader = ArrayLoader(data, np.zeros(len(data)), batch_size=1)
    orion.fit(net, loader)
    input_level = orion.compile(net)

    ct = orion.encrypt(orion.encode(inp, input_level))
    net.he()
    out_fhe = np.asarray(net(ct).decrypt().decode()).reshape(-1)

    clear = np.asarray(out_clear).reshape(-1)
    dist = mae(clear, out_fhe[: clear.size])
    print(f"ReLU-net MAE: {dist}")
    assert dist < 0.005
