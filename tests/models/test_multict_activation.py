"""Multi-ciphertext activation tensors take the lax.map (scan) path.

A VGG-11 feature tensor at LogN 13 is 8 ciphertexts; unrolling the BSGS
polynomial circuit per ct made sign-activation programs too large for the
remote compile helper (r5).  `PolyEvaluatorService.evaluate_polynomial`
now stacks same-metadata cts and lax.maps ONE circuit body over them; this
guards that path end-to-end: hidden width 512 over 128 slots -> 4 cts.
"""

import numpy as np

import orion_tpu as orion
import orion_tpu.nn as on
from orion_tpu.utils import ArrayLoader, mae

CONFIG = {
    "ckks_params": {
        "LogN": 8,
        "LogQ": [29] + [26] * 7,
        "LogP": [29, 29],
        "LogScale": 26,
        "H": 64,
        "RingType": "Standard",
    },
    "orion": {"margin": 2, "embedding_method": "hybrid", "backend": "tpu",
              "fuse_modules": True, "debug": False, "io_mode": "none"},
}


class WideNet(on.Module):
    def __init__(self):
        super().__init__()
        self.flatten = on.Flatten()
        self.fc1 = on.Linear(64, 512)
        self.act1 = on.SiLU(degree=31)
        self.fc2 = on.Linear(512, 8)

    def forward(self, x):
        return self.fc2(self.act1(self.fc1(self.flatten(x))))


def test_multict_activation_scan():
    scheme = orion.scheme.init_scheme(CONFIG)
    rng = np.random.default_rng(0)
    data = rng.uniform(-1, 1, (16, 64)).astype(np.float32)
    net = WideNet()
    net.eval()
    inp = data[:1]
    out_clear = np.asarray(net(inp)).reshape(-1)

    orion.fit(net, ArrayLoader(data, np.zeros(len(data)), batch_size=1))
    input_level = orion.compile(net)

    # the activation really sees a multi-ct tensor (the scan path)
    hidden_elems = int(np.prod(net.act1.fhe_input_shape))
    assert hidden_elems // scheme.ctx.slots == 4

    ct = orion.encrypt(orion.encode(inp, input_level))
    net.he()
    out = np.asarray(net(ct).decrypt().decode()).reshape(-1)
    m = mae(out_clear, out[: out_clear.size])
    assert m < 0.005, m
