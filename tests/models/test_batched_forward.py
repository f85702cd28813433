"""Batched serving: B encrypted queries through ONE vmapped XLA program
(`runtime/jit.make_batched_forward`) must decrypt to the same results as
independent forwards."""

import numpy as np

import orion_tpu as orion
import orion_tpu.nn as on
from orion_tpu.runtime.jit import make_batched_forward, make_jitted_forward
from orion_tpu.utils import ArrayLoader, mae

CONFIG = {
    "ckks_params": {
        "LogN": 8,
        "LogQ": [29, 26, 26, 26],
        "LogP": [29, 29],
        "LogScale": 26,
        "H": 64,
        "RingType": "Standard",
    },
    "orion": {"margin": 2, "backend": "tpu", "fuse_modules": True},
}


class SmallNet(on.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = on.Linear(16, 16)
        self.act = on.Quad()
        self.fc2 = on.Linear(16, 4)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


def test_batched_forward_matches_serial():
    scheme = orion.scheme.init_scheme(CONFIG)
    net = SmallNet()
    rng = np.random.default_rng(3)
    data = rng.uniform(-1, 1, (64, 16)).astype(np.float32)

    net.eval()
    orion.fit(net, ArrayLoader(data, np.zeros(len(data)), batch_size=1))
    input_level = orion.compile(net)
    net.he()

    B = 4
    queries = [data[i:i + 1] for i in range(B)]
    cts = [orion.encrypt(orion.encode(q, input_level)) for q in queries]

    serial = make_jitted_forward(net, scheme)
    batched = make_batched_forward(net, scheme)

    outs_b = batched(cts)
    assert len(outs_b) == B
    for q, ct, out_b in zip(queries, cts, outs_b):
        out_s = np.asarray(serial(ct).decrypt().decode()).reshape(-1)
        got = np.asarray(out_b.decrypt().decode()).reshape(-1)
        # identical integer RNS arithmetic => bit-identical decrypts
        np.testing.assert_allclose(got, out_s, rtol=0, atol=1e-9)

        net.eval()
        clear = np.asarray(net(q)).reshape(-1)
        net.he()
        assert mae(clear, got[: clear.size]) < 0.005
