"""Fast-tier ResNet compile: the real `models.resnet.BasicBlock` (minimax
ReLU, BN, conv shortcut) through fit -> pack -> level-solve -> compile on
tiny shapes — the default-suite counterpart of the gated production-scale
`test_resnet_compile.py` (reference flow: `examples/run_resnet.py`).
"""

import numpy as np

import orion_tpu as orion
import orion_tpu.nn as on
from orion_tpu.models.resnet import BasicBlock
from orion_tpu.utils import ArrayLoader

CONFIG = {
    "ckks_params": {
        "LogN": 10,
        "LogQ": [29, 26, 26, 26, 26, 26, 26],   # l_eff 6 < total depth => bootstraps
        "LogP": [29, 29],
        "LogScale": 26,
        "H": 128,
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


class ResNetMini(on.Module):
    """conv stem + one stride-2 BasicBlock (conv shortcut) + linear head."""

    def __init__(self):
        super().__init__()
        self.conv1 = on.Conv2d(1, 4, kernel_size=3, padding=1, bias=False)
        self.bn1 = on.BatchNorm2d(4)
        self.act = on.ReLU(degrees=[7, 7])
        self.block = BasicBlock(4, 8, stride=2)
        self.flatten = on.Flatten()
        self.fc = on.Linear(8 * 4 * 4, 4)

    def forward(self, x):
        x = self.act(self.bn1(self.conv1(x)))
        x = self.block(x)
        return self.fc(self.flatten(x))


def test_tiny_resnet_compile():
    scheme = orion.scheme.init_scheme(CONFIG)
    net = ResNetMini()
    rng = np.random.default_rng(3)
    data = rng.uniform(-1, 1, (16, 1, 8, 8)).astype(np.float32)

    net.eval()
    out_clear = net(data[:1])
    assert np.isfinite(np.asarray(out_clear)).all()

    orion.fit(net, ArrayLoader(data, np.zeros(len(data)), batch_size=1))
    input_level = orion.compile(net)
    assert input_level >= scheme.params.base_level

    # the chain is too short for ~8 multiplicative levels of depth: the
    # solver must place at least one bootstrap, and every leaf must have
    # received a consistent level assignment
    placed = sum(1 for m in net.modules()
                 if getattr(m, "post_bootstrap", None) is not None)
    assert placed >= 1
    for m in net.modules():
        if m.is_leaf():
            assert m.level is None or m.level >= 0

    # packed transforms exist for every linear layer (incl. the conv
    # shortcut) and respect the multiplexed-shape bound
    from orion_tpu.nn.linear import LinearTransform
    for m in net.modules():
        if isinstance(m, LinearTransform):
            assert m.diagonals, f"{type(m).__name__} has no packed diagonals"
