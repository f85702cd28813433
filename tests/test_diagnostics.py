"""Noise profiler (diagnostics.py): per-stage decrypt-vs-clear records on a
small bootstrapped network, in the exact multiplexed layout."""

import numpy as np

import orion_tpu as orion
import orion_tpu.nn as on
from orion_tpu.diagnostics import noise_profile, write_noise_report
from orion_tpu.utils import ArrayLoader

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
              "io_mode": "none"},
}


class TinyConvNet(on.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = on.Conv2d(1, 2, 3, padding=1, stride=2)
        self.bn0 = on.BatchNorm2d(2)
        self.act0 = on.Quad()
        self.conv1 = on.Conv2d(2, 2, 3, padding=1)
        self.act1 = on.Quad()
        self.flatten = on.Flatten()
        self.fc = on.Linear(2 * 4 * 4, 4)

    def forward(self, x):
        x = self.act0(self.bn0(self.conv0(x)))
        x = self.act1(self.conv1(x))
        return self.fc(self.flatten(x))


def test_noise_profile(tmp_path):
    scheme = orion.scheme.init_scheme(CONFIG)
    net = TinyConvNet()
    rng = np.random.default_rng(3)
    data = rng.uniform(0, 1, (16, 1, 8, 8)).astype(np.float32)
    inp = data[:1]

    net.eval()
    orion.fit(net, ArrayLoader(data, np.zeros(len(data)), batch_size=1))
    input_level = orion.compile(net)

    placed = [m for m in net.modules()
              if getattr(m, "post_bootstrap", None) is not None]
    assert placed, "expected a bootstrap in the plan"

    records = noise_profile(net, scheme, inp, input_level)
    names = [r["name"] for r in records]
    # every traced leaf appears, in execution order, plus the bootstrap
    assert names[0] == "conv0"
    assert any(n.endswith(".bootstrap") for n in names)
    assert names[-1] == "fc"

    # the multiplexed-layout comparison holds at every stage: crypto noise
    # for Quad/conv chains at these params is well under 1e-2, and any
    # layout/permutation mistake would register as O(1) error
    for r in records:
        assert np.isfinite(r["max_err"])
        assert r["max_err"] < 1e-2, r
        assert r["ct_level"] >= 0

    # a strided conv stage really was compared through the gap>1 path
    assert any(r["name"] == "conv1" for r in records)

    out = write_noise_report(records, str(tmp_path / "noise.json"),
                             meta={"model": "TinyConvNet"})
    assert out["stages"] == len(records)
    assert out["bootstraps"] >= 1
