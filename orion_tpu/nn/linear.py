"""Linear transform modules: Linear and Conv2d.

Reference parity: `orion/nn/linear.py`.  Cleartext forward uses jax
(lax.conv_general_dilated / dot); FHE forward evaluates compiled BSGS
diagonal transforms through the scheme's lt_evaluator, then applies the
hybrid embedding's output rotations (out += out.roll(slots/2^i)) and adds
the encoded bias — identical semantics to `linear.py:66-76`.
"""

from __future__ import annotations

import math
from abc import abstractmethod

import numpy as np

from .module import Module, Parameter, timer


def _kaiming_uniform(rng, shape, fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return rng.uniform(-bound, bound, size=shape).astype(np.float32)


_WEIGHT_RNG = np.random.default_rng(2024)


class LinearTransform(Module):
    def __init__(self, bsgs_ratio=2, level=None):
        super().__init__()
        self.bsgs_ratio = float(bsgs_ratio)
        self.set_depth(1)
        self.set_level(level)
        self.diagonals = {}          # {(row, col): {idx: vec}}
        self.compiled = {}           # {(row, col): CompiledTransform}
        self.output_rotations = 0
        self.on_bias_ptxt = None

    def init_orion_params(self):
        """Clone weights so fusing never mutates the trained network
        (reference `linear.py:34-38`)."""
        self.on_weight = self.weight.data.copy()
        self.on_bias = (self.bias.data.copy() if getattr(self, "bias", None)
                        is not None else np.zeros(self.weight.shape[0],
                                                  dtype=np.float32))

    @abstractmethod
    def compute_fhe_output_gap(self, **kwargs):
        ...

    @abstractmethod
    def compute_fhe_output_shape(self, **kwargs):
        ...

    @abstractmethod
    def generate_diagonals(self, last: bool):
        ...

    def compile(self):
        self.scheme.lt_evaluator.generate_transforms(self)

    def _try_load_diagonals(self) -> bool:
        """io_mode=load: restore packed diagonals from HDF5
        (reference `linear.py` compile-time load path)."""
        p = self.scheme.params
        if p.io_mode != "load" or not p.diags_path:
            return False
        from ..runtime.io import load_layer_diagonals
        return load_layer_diagonals(p, self, p.diags_path)

    def _maybe_save_diagonals(self):
        p = self.scheme.params
        if p.io_mode == "save" and p.diags_path:
            from ..runtime.io import save_layer_diagonals
            save_layer_diagonals(p, self, p.diags_path)

    @timer
    def evaluate_transforms(self, x):
        out = self.scheme.lt_evaluator.evaluate_transforms(self, x)
        slots = self.scheme.params.slots
        for i in range(1, self.output_rotations + 1):
            out = out + out.roll(slots // (2 ** i))
        out = out + self.on_bias_ptxt
        return out

    def program_signature(self):
        """Everything the he-forward bakes into its traced program: scan
        index arrays, BSGS geometry, levels/scales, output metadata.  Equal
        signatures (e.g. repeated ResNet blocks at the same level) share one
        compiled XLA program (runtime/jit.py)."""
        if not self.compiled:
            return id(self)
        trs = []
        for key in sorted(self.compiled):
            tr = self.compiled[key]
            trs.append((key, tr.level, tr.n1, tr.pt_scale, tr.babies_full,
                        tr.giants, tuple(tr.pts.shape),
                        np.asarray(tr.b_pos).tobytes(),
                        np.asarray(tr.g_pos).tobytes()))
        bias = None
        if self.on_bias_ptxt is not None:
            bias = tuple((pt.level, pt.scale, tuple(pt.data.shape))
                         for pt in self.on_bias_ptxt.plaintexts)
        return (type(self).__name__, tuple(trs), bias, self.output_rotations,
                getattr(self, "_pack_keys", None),
                tuple(self.output_shape), tuple(self.fhe_output_shape))


class Linear(LinearTransform):
    def __init__(self, in_features, out_features, bias=True, bsgs_ratio=2,
                 level=None):
        super().__init__(bsgs_ratio, level)
        self.in_features = in_features
        self.out_features = out_features
        self.weight = Parameter(_kaiming_uniform(
            _WEIGHT_RNG, (out_features, in_features), in_features))
        self.bias = Parameter(_kaiming_uniform(
            _WEIGHT_RNG, (out_features,), in_features)) if bias else None

    def compute_fhe_output_gap(self, **kwargs):
        return 1  # linear layers reset the multiplexed gap

    def compute_fhe_output_shape(self, **kwargs):
        return kwargs["clear_output_shape"]

    def generate_diagonals(self, last):
        from ..compiler import packing
        if self._try_load_diagonals():
            return
        self.diagonals, self.output_rotations = packing.pack_linear(self, last)
        self._maybe_save_diagonals()

    def compile(self):
        from ..compiler import packing
        bias = packing.construct_linear_bias(self)
        self.on_bias_ptxt = self.scheme.encoder.encode(
            bias, level=self.level - self.depth)
        self.scheme.lt_evaluator.generate_transforms(self)

    def forward(self, x):
        if not self.he_mode:
            if x.ndim != 2:
                extra = (" Forgot to call on.Flatten() first?"
                         if x.ndim == 4 else "")
                raise ValueError(
                    f"Expected 2D input (N, in_features) to "
                    f"{type(self).__name__}, got {x.shape}." + extra)
            out = np.asarray(x, dtype=np.float32) @ self.weight.data.T
            if self.bias is not None:
                out = out + self.bias.data
            return out
        return self.evaluate_transforms(x)


class Conv2d(LinearTransform):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True, bsgs_ratio=2,
                 level=None):
        super().__init__(bsgs_ratio, level)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = self._pair(kernel_size)
        self.stride = self._pair(stride)
        self.padding = self._pair(padding)
        self.dilation = self._pair(dilation)
        self.groups = groups
        self.is_conv = True
        fan_in = (in_channels // groups) * np.prod(self.kernel_size)
        self.weight = Parameter(_kaiming_uniform(
            _WEIGHT_RNG,
            (out_channels, in_channels // groups, *self.kernel_size), fan_in))
        self.bias = Parameter(_kaiming_uniform(
            _WEIGHT_RNG, (out_channels,), fan_in)) if bias else None

    @staticmethod
    def _pair(v):
        return (v, v) if isinstance(v, int) else tuple(v)

    def compute_fhe_output_gap(self, **kwargs):
        # strided convs increase the multiplexed gap by the stride
        return kwargs["input_gap"] * self.stride[0]

    def compute_fhe_output_shape(self, **kwargs):
        input_shape = kwargs["input_shape"]
        clear_output_shape = kwargs["clear_output_shape"]
        input_gap = kwargs["input_gap"]
        Hi, Wi = input_shape[2:]
        N, Co, Ho, Wo = clear_output_shape
        og = self.compute_fhe_output_gap(input_gap=input_gap)
        on_Co = math.ceil(Co / (og ** 2))
        on_Ho = max(Hi, Ho * og)
        on_Wo = max(Wi, Wo * og)
        return (N, on_Co, on_Ho, on_Wo)

    def generate_diagonals(self, last):
        from ..compiler import packing
        if self._try_load_diagonals():
            return
        self.diagonals, self.output_rotations = packing.pack_conv2d(self, last)
        self._maybe_save_diagonals()

    def compile(self):
        from ..compiler import packing
        bias = packing.construct_conv2d_bias(self)
        self.on_bias_ptxt = self.scheme.encoder.encode(
            bias, level=self.level - self.depth)
        self.scheme.lt_evaluator.generate_transforms(self)

    def forward(self, x):
        if not self.he_mode:
            import jax
            import jax.numpy as jnp
            from .module import host_cpu
            if x.ndim != 4:
                raise ValueError(
                    f"Expected 4D input (N, C, H, W) to "
                    f"{type(self).__name__}, got {x.shape}.")
            with host_cpu():
                out = self._clear_conv(jnp.asarray(np.asarray(x)))
            return np.asarray(out)
        return self.evaluate_transforms(x)

    def _clear_conv(self, x):
        import jax
        import jax.numpy as jnp
        out = jax.lax.conv_general_dilated(
                x, jnp.asarray(self.weight.data),
                window_strides=self.stride,
                padding=[(self.padding[0], self.padding[0]),
                         (self.padding[1], self.padding[1])],
                rhs_dilation=self.dilation,
                feature_group_count=self.groups,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
        if self.bias is not None:
            out = out + self.bias.data[None, :, None, None]
        return out
