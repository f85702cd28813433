"""Reshape modules.  Reference parity: `orion/nn/reshape.py` — Flatten is
the identity under FHE because packing already flattens."""

from __future__ import annotations

import numpy as np

from .module import Module


class Flatten(Module):
    def __init__(self):
        super().__init__()
        self.set_depth(0)

    def forward(self, x):
        if self.he_mode:
            return x
        return np.asarray(x).reshape(x.shape[0], -1)


class Identity(Module):
    """Pass-through module (torch nn.Identity parity; used by YOLO to strip
    backbone heads and by ResNet's optional pool slot)."""

    def __init__(self):
        super().__init__()
        self.set_depth(0)

    def forward(self, x):
        return x
