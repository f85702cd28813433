"""Elementwise modules: Add, Mult, Bootstrap.

Reference parity: `orion/nn/operations.py`.  Bootstrap implements the
shift-scale-bootstrap-unscale-unshift recipe with the prescale encoded at
the input level and scale q_l (errorless rescale + zeroed unused slots for
sparse bootstrapping, reference `operations.py:38-95`).
"""

from __future__ import annotations

import math

import numpy as np

from .module import Module, timer


class Add(Module):
    def __init__(self):
        super().__init__()
        self.set_depth(0)

    def forward(self, x, y):
        return x + y


class Mult(Module):
    def __init__(self):
        super().__init__()
        self.set_depth(1)

    def forward(self, x, y):
        return x * y


class Bootstrap(Module):
    """Inserted by the auto-bootstrap placer (never user-constructed)."""

    def __init__(self, input_min, input_max, input_level):
        super().__init__()
        self.input_min = float(input_min)
        self.input_max = float(input_max)
        self.input_level = input_level
        self.prescale = 1.0
        self.postscale = 1
        self.constant = 0.0
        self.prescale_ptxt = None

    def fit(self):
        center = (self.input_min + self.input_max) / 2
        half_range = (self.input_max - self.input_min) / 2
        self.low = center - self.margin * half_range
        self.high = center + self.margin * half_range
        # scale into [-1/ratio, 1/ratio] by 1/integer so the return trip
        # (by the integer) consumes no level.  ratio > 1 keeps the EvalMod
        # sine linearisation error below the noise floor when q0 is a
        # single <=30-bit prime (see crypto/bootstrap.py).
        ratio = 8
        if self.scheme is not None and getattr(self.scheme.params, "boot", None):
            ratio = int(self.scheme.params.boot.get("MsgRatio", 8))
        self.postscale = max(1, math.ceil((self.high - self.low) / 2)) * ratio
        self.prescale = 1.0 / self.postscale
        self.constant = -(self.low + self.high) / 2

    def compile(self):
        elements = int(np.prod(self.fhe_input_shape))
        curr_slots = 2 ** math.ceil(math.log2(elements))
        vec = np.zeros(curr_slots)
        vec[:elements] = self.prescale
        # normalise to the level just above the modulus floor so every
        # Bootstrap shares one compiled program signature (mod-drop is free)
        self.norm_level = self.scheme.params.base_level + 1
        ql = self.scheme.encoder.get_moduli_chain()[self.norm_level]
        self.prescale_ptxt = self.scheme.encoder.encode(
            vec, level=self.norm_level, scale=float(ql))

    @timer
    def forward(self, x):
        if not self.he_mode:
            return x
        x = x.mod_drop(self.norm_level)
        if self.constant != 0:
            x = x + self.constant
        x = x * self.prescale_ptxt
        x = x.bootstrap()
        if self.postscale != 1:
            x = x * self.postscale
        if self.constant != 0:
            x = x - self.constant
        return x
