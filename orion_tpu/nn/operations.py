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
    """Inserted by the auto-bootstrap placer (never user-constructed).

    The shift constant is encoded as plaintexts (swapped jit arguments) and
    the postscale is quantised to a power of two, so every Bootstrap whose
    tensor shape and postscale match shares ONE compiled XLA program
    (runtime/jit.py program signatures) — on a ResNet that collapses ~24
    bootstrap compilations into a handful.

    `phased`: under per-module jit the circuit does NOT compile as one
    program (too large for compile services); the bootstrapper jits each
    pipeline phase separately (crypto/bootstrap.py + PhaseRunner).
    """

    phased = True

    def __init__(self, input_min, input_max, input_level):
        super().__init__()
        self.input_min = float(input_min)
        self.input_max = float(input_max)
        self.input_level = input_level
        self.prescale = 1.0
        self.postscale = 1
        self.constant = 0.0
        self.prescale_ptxt = None
        self.slot_count = None
        self.norm_level = None

    def fit(self):
        center = (self.input_min + self.input_max) / 2
        half_range = (self.input_max - self.input_min) / 2
        self.low = center - self.margin * half_range
        self.high = center + self.margin * half_range
        # Residual headroom prescale (power of two so the postscale return
        # trip consumes no level): the bootstrapper prescales messages to
        # Delta_boot = D*Delta ~ q0/MsgRatio with an exact integer D
        # (crypto/bootstrap.py); only when q0 is too narrow for D to reach
        # the target ratio does the module squeeze the message by the
        # remaining 2^gap so the EvalMod sine linearisation error stays
        # ~MsgRatio^-2 regardless of parameters.
        ratio = 1
        if self.scheme is not None and getattr(self.scheme.params, "boot", None):
            p = self.scheme.params
            R = int(p.boot.get("MsgRatio", 256))
            q0_bits = sum(p.logq[: p.base_level + 1])
            gap = p.logscale + (R - 1).bit_length() - q0_bits
            ratio = (1 << gap) if gap > 0 else 1
        post = max(1, math.ceil((self.high - self.low) / 2)) * ratio
        # quantise up to a power of two: prescale*postscale stays exactly 1
        # and bootstraps with ranges within 2x share a program signature
        self.postscale = 1 << (post - 1).bit_length()
        self.prescale = 1.0 / self.postscale
        self.constant = -(self.low + self.high) / 2

    def compile(self):
        elements = int(np.prod(self.fhe_input_shape))
        ring_slots = self.scheme.ctx.slots
        if elements >= ring_slots:
            # multi-ciphertext tensor: each member bootstraps at the full
            # slot count, so the plaintext grid must span exactly
            # n_cts * slots — rounding the TOTAL to a power of two would
            # mint more plaintexts than ciphertexts whenever n_cts is not
            # a power of two (AlexNet's 12-ct feature tensors)
            curr_slots = -(-elements // ring_slots) * ring_slots
        else:
            curr_slots = 2 ** math.ceil(math.log2(elements))
        self.slot_count = curr_slots
        self.scheme.bootstrapper.generate_bootstrapper(curr_slots)
        vec = np.zeros(curr_slots)
        vec[:elements] = self.prescale
        # normalise to the level just above the modulus floor so every
        # Bootstrap shares one compiled program signature (mod-drop is free)
        self.norm_level = self.scheme.params.base_level + 1
        ql = self.scheme.encoder.get_moduli_chain()[self.norm_level]
        self.prescale_ptxt = self.scheme.encoder.encode(
            vec, level=self.norm_level, scale=float(ql))
        # shift constants at the default scale: added before the prescale
        # mult, removed after the bootstrap (both at scale Delta)
        shift = np.full(curr_slots, self.constant)
        shift[elements:] = 0.0
        delta = self.scheme.ctx.default_scale
        btp = self.scheme.bootstrapper.get_for_slots(curr_slots)
        self.shift_in_ptxt = self.scheme.encoder.encode(
            shift, level=self.norm_level, scale=delta)
        self.shift_out_ptxt = self.scheme.encoder.encode(
            shift, level=btp.out_level, scale=delta)

    def program_signature(self):
        return ("Bootstrap", self.postscale, self.norm_level,
                self.slot_count, tuple(self.fhe_input_shape))

    def __call__(self, x):
        # mod-drop OUTSIDE the jitted program so bootstraps entered at
        # different levels still share one compiled signature (the drop is
        # a metadata slice, cheap in eager mode)
        if self.he_mode and hasattr(x, "mod_drop") and \
                self.norm_level is not None:
            x = x.mod_drop(self.norm_level)
        return super().__call__(x)

    @timer
    def forward(self, x):
        if not self.he_mode:
            return x
        x = x.mod_drop(self.norm_level)
        x = x + self.shift_in_ptxt
        x = x * self.prescale_ptxt
        x = x.bootstrap()
        if self.postscale != 1:
            x = x * self.postscale
        x = x - self.shift_out_ptxt
        return x
