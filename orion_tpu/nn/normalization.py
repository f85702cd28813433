"""BatchNorm modules.

Reference parity: `orion/nn/normalization.py`.  Under FHE the normalisation
constants are encoded so every rescale is errorless: mean and inverse-std at
level l with scale q_l, affine weight/bias one level lower at scale q_(l-1)
(`normalization.py:48-63`).  When fused into a preceding linear layer the
module becomes the identity.
"""

from __future__ import annotations

import numpy as np

from .module import Module, Parameter, timer


class BatchNormNd(Module):
    def __init__(self, num_features, eps=1e-5, momentum=0.1, affine=True):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.affine = affine
        self.set_depth(2 if affine else 1)
        self.running_mean = np.zeros(num_features, dtype=np.float32)
        self.running_var = np.ones(num_features, dtype=np.float32)
        if affine:
            self.weight = Parameter(np.ones(num_features, dtype=np.float32))
            self.bias = Parameter(np.zeros(num_features, dtype=np.float32))

    # ----------------- orion params / packing ----------------- #

    def init_orion_params(self):
        self.on_running_mean = self.running_mean.copy()
        self.on_running_var = self.running_var.copy()
        if self.affine:
            self.on_weight = self.weight.data.copy()
            self.on_bias = self.bias.data.copy()

    def compile(self):
        if self.fused:
            return
        from ..compiler import packing
        mean, inv_std, weight, bias = self.pack()
        chain = self.scheme.encoder.get_moduli_chain()
        ql = float(chain[self.level])
        self.mean_ptxt = self.scheme.encoder.encode(
            mean, level=self.level, scale=None)
        self.inv_std_ptxt = self.scheme.encoder.encode(
            inv_std, level=self.level, scale=ql)
        if self.affine:
            ql1 = float(chain[self.level - 1])
            self.weight_ptxt = self.scheme.encoder.encode(
                weight, level=self.level - 1, scale=ql1)
            self.bias_ptxt = self.scheme.encoder.encode(
                bias, level=self.level - 2)

    def pack(self):
        raise NotImplementedError

    # ----------------- forward ----------------- #

    def _clear_forward(self, x):
        shape = [1, self.num_features] + [1] * (x.ndim - 2)
        mean = self.running_mean.reshape(shape)
        var = self.running_var.reshape(shape)
        out = (x - mean) / np.sqrt(var + self.eps)
        if self.affine:
            out = out * self.weight.data.reshape(shape) \
                + self.bias.data.reshape(shape)
        return out.astype(np.float32)

    @timer
    def forward(self, x):
        if not self.he_mode:
            if self.training:
                raise RuntimeError(
                    "BatchNorm statistics are collected with the training "
                    "utilities; fit/inference require eval() mode")
            return self._clear_forward(np.asarray(x))
        if self.fused:
            return x
        out = x - self.mean_ptxt
        out = out * self.inv_std_ptxt
        if self.affine:
            out = out * self.weight_ptxt
            out = out + self.bias_ptxt
        return out


class BatchNorm1d(BatchNormNd):
    def _check(self, x):
        if x.ndim != 2:
            raise ValueError(
                f"BatchNorm1d expects (N, C), got {tuple(x.shape)}")

    def forward(self, x):
        if not self.he_mode:
            self._check(np.asarray(x))
        return super().forward(x)

    def pack(self):
        from ..compiler import packing
        return packing.pack_bn1d(self)


class BatchNorm2d(BatchNormNd):
    def _check(self, x):
        if x.ndim != 4:
            raise ValueError(
                f"BatchNorm2d expects (N, C, H, W), got {tuple(x.shape)}")

    def forward(self, x):
        if not self.he_mode:
            self._check(np.asarray(x))
        return super().forward(x)

    def pack(self):
        from ..compiler import packing
        return packing.pack_bn2d(self)
