"""Bootstrap over a multi-ciphertext tensor whose ct count is NOT a power
of two (AlexNet's 12-ct feature tensors, r5): the prescale/shift plaintext
grid must span exactly n_cts * slots, not the total rounded up to a power
of two (which minted 16 plaintexts against 12 ciphertexts)."""

import numpy as np

import orion_tpu as orion
import orion_tpu.nn as on
from orion_tpu.utils import ArrayLoader, mae

CONFIG = {
    "ckks_params": {
        "LogN": 9,
        "LogQ": [29, 26, 26, 26],
        "LogP": [29, 29],
        "LogScale": 26,
        "H": 64,
        "RingType": "Standard",
    },
    "boot_params": {"CtSLevels": 3, "StCLevels": 3, "ModDegree": 255,
                    "K": 15},
    "orion": {"margin": 2, "backend": "tpu", "fuse_modules": True,
              "io_mode": "stream"},
}


class WideDeep(on.Module):
    """Hidden width 3 * slots(=256) -> a 3-ciphertext activation tensor;
    the short chain forces a bootstrap on it."""

    def __init__(self):
        super().__init__()
        self.flatten = on.Flatten()
        self.fc1 = on.Linear(16, 768)
        self.act1 = on.Quad()
        self.fc2 = on.Linear(768, 8)
        self.act2 = on.Quad()
        self.fc3 = on.Linear(8, 4)

    def forward(self, x):
        x = self.act1(self.fc1(self.flatten(x)))
        x = self.act2(self.fc2(x))
        return self.fc3(x)


def test_non_pow2_multict_bootstrap():
    scheme = orion.scheme.init_scheme(CONFIG)
    net = WideDeep()
    rng = np.random.default_rng(2)
    data = rng.uniform(-1, 1, (16, 16)).astype(np.float32)
    inp = data[:1]

    net.eval()
    out_clear = np.asarray(net(inp)).reshape(-1)
    orion.fit(net, ArrayLoader(data, np.zeros(len(data)), batch_size=1))
    input_level = orion.compile(net)

    placed = [m for m in net.modules()
              if getattr(m, "post_bootstrap", None) is not None]
    multict = [m for m in placed
               if int(np.prod(m.post_bootstrap.fhe_input_shape))
               > scheme.ctx.slots]
    assert multict, "expected a bootstrap on a multi-ct tensor"
    pb = multict[0].post_bootstrap
    n_cts = -(-int(np.prod(pb.fhe_input_shape)) // scheme.ctx.slots)
    assert n_cts == 3  # non-power-of-two ciphertext count
    assert pb.slot_count == n_cts * scheme.ctx.slots

    ct = orion.encrypt(orion.encode(inp, input_level))
    net.he()
    out = np.asarray(net(ct).decrypt().decode()).reshape(-1)
    m = mae(out_clear, out[: out_clear.size])
    assert m < 0.005, m
