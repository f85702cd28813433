"""Regression: post-bootstrap scale propagation (round-3 ResNet-20 blocker).

A ReLU whose minimax sign chain is deeper than the modulus chain forces the
solver to place bootstraps MID-chain; the refreshed ciphertext then runs
above the solver-assigned levels of the layers that follow.  Two distinct
bugs lived here (resnet_r3f.log:253-254, VERDICT r3 Weak #2):

  1. downstream plaintext encodings (bias, diagonals) are chosen at the
     PLANNED level, but the runtime rescale chain divided by the primes of
     the REFRESHED trajectory -> scale drift (67256970.86 vs 2^26 at the
     first residual conv's bias add);
  2. _Sign pinned its exact-rescale modulus at min(entry, natural-output)
     level, but the final x*sign(x) rescale divides by the prime at
     mult2's solver-assigned level, which can sit below both.

Fixed by plan-authoritative level alignment at every module boundary
(nn/module.py) plus the mult2-level pin (nn/activation.py).  This test
fails with `scale mismatch in add/sub: 67073033.29 vs 67108864.0` at the
post-ReLU Linear's bias add when either fix is reverted.

Reference trajectory discipline: `orion/nn/operations.py:53-64`,
`orion/backend/heongpu/bindings.py:1491-1553` (ModDrop before every op).
"""

import numpy as np

import orion_tpu as orion
import orion_tpu.nn as on
from orion_tpu.utils import ArrayLoader, mae

CONFIG = {
    "ckks_params": {
        "LogN": 9,
        # l_eff = 8 < ReLU sign-chain depth (~15) => bootstraps land
        # MID-sign, refreshing the ct above downstream assigned levels
        "LogQ": [29] + [26] * 8,
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
    "orion": {"margin": 2, "backend": "tpu", "fuse_modules": True,
              "io_mode": "stream"},
}


class TinyReLUNet(on.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = on.Linear(16, 16)
        self.act = on.ReLU()
        self.fc2 = on.Linear(16, 4)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


def test_post_bootstrap_scale_alignment():
    scheme = orion.scheme.init_scheme(CONFIG)
    net = TinyReLUNet()
    rng = np.random.default_rng(0)
    data = rng.uniform(-1, 1, (64, 16)).astype(np.float32)
    inp = data[:1]

    net.eval()
    out_clear = net(inp)

    orion.fit(net, ArrayLoader(data, np.zeros(len(data)), batch_size=1))
    input_level = orion.compile(net)

    # the premise: at least one bootstrap must sit INSIDE the sign chain
    placed = [name for name, m in net.named_modules()
              if getattr(m, "post_bootstrap", None) is not None]
    assert any("sign.acts" in name for name in placed), (
        f"expected a mid-sign bootstrap placement, got {placed}")

    from orion_tpu.runtime.jit import enable_module_jit
    enable_module_jit(scheme)

    ct = orion.encrypt(orion.encode(inp, input_level))
    net.he()
    out_fhe = np.asarray(net(ct).decrypt().decode()).reshape(-1)
    clear = np.asarray(out_clear).reshape(-1)
    dist = mae(clear, out_fhe[: clear.size])
    print(f"post-bootstrap ReLU net MAE: {dist}")
    assert dist < 0.005
