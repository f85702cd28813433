"""Encrypted VGG-family coverage (VERDICT r1 weak-item 10: AlexNet/VGG were
cleartext-only claims).

A scaled-down VGG block stack — Conv+BN+SiLU(Chebyshev) twice, an "M"
AvgPool, AdaptiveAvgPool, Flatten, Linear — exercises every module class
the AlexNet/VGG zoo uses (reference `orion/models/{vgg,alexnet}.py`):
library Chebyshev activations, grouped-conv pooling, adaptive pooling with
post-trace shape resolution, and the conv->linear multiplexed interface.
Bootstrap-free (deep enough chain) so the CPU suite stays fast.
"""

import os

import numpy as np
import pytest

import orion_tpu as orion
import orion_tpu.nn as on
from orion_tpu.utils import ArrayLoader, mae

CONFIG = {
    "ckks_params": {
        "LogN": 11,
        "LogQ": [29] + [26] * 19,
        "LogP": [29, 29],
        "LogScale": 26,
        "H": 64,
        "RingType": "Standard",
    },
    "orion": {"margin": 2, "backend": "tpu", "fuse_modules": True,
              "embedding_method": "hybrid"},
}


class TinyVGG(on.Module):
    def __init__(self):
        super().__init__()
        self.features = on.Sequential(
            on.Conv2d(3, 4, kernel_size=3, padding=1),
            on.BatchNorm2d(4),
            on.SiLU(degree=15),
            on.AvgPool2d(kernel_size=2, stride=2),
            on.Conv2d(4, 8, kernel_size=3, padding=1),
            on.BatchNorm2d(8),
            on.SiLU(degree=15),
            on.AdaptiveAvgPool2d(output_size=2),
        )
        self.flatten = on.Flatten()
        self.classifier = on.Linear(8 * 2 * 2, 4)

    def forward(self, x):
        out = self.features(x)
        out = self.flatten(out)
        return self.classifier(out)


def _chebyshev_clear_fn(act):
    """The cleartext function the FHE circuit actually evaluates: the fitted
    Chebyshev series (with its affine prescale), not the exact activation.
    Separates polynomial-approximation error (a model-quality choice, the
    same under the reference) from crypto error (what this test guards)."""
    coeffs = np.asarray(act.coeffs)

    def fn(x):
        t = x * act.prescale + act.constant if act.prescale != 1 else x
        return np.polynomial.chebyshev.chebval(t, coeffs)
    return fn


@pytest.mark.skipif(
    not os.environ.get("ORION_TPU_SLOW_TESTS"),
    reason="slow tier: set ORION_TPU_SLOW_TESTS=1 (covered in CI)")
def test_vgg_tiny_encrypted():
    scheme = orion.scheme.init_scheme(CONFIG)
    net = TinyVGG()
    rng = np.random.default_rng(3)
    data = rng.uniform(0, 1, (32, 3, 8, 8)).astype(np.float32)
    inp = data[:1]

    net.eval()
    out_exact = np.asarray(net(inp)).reshape(-1)

    orion.fit(net, ArrayLoader(data, np.zeros(len(data)), batch_size=1))

    # cleartext oracle with the FITTED polynomial activations
    from orion_tpu.nn.activation import Chebyshev
    saved = []
    for m in net.modules():
        if isinstance(m, Chebyshev) and m.coeffs is not None:
            saved.append((m, m.fn))
            m.fn = _chebyshev_clear_fn(m)
    out_poly = np.asarray(net(inp)).reshape(-1)
    for m, fn in saved:
        m.fn = fn

    input_level = orion.compile(net)

    from orion_tpu.runtime.jit import enable_module_jit
    enable_module_jit(scheme)

    ct = orion.encrypt(orion.encode(inp, input_level))
    net.he()
    out_fhe = np.asarray(net(ct).decrypt().decode()).reshape(-1)

    crypto_err = mae(out_poly, out_fhe[: out_poly.size])
    approx_err = mae(out_exact, out_fhe[: out_exact.size])
    print(f"tiny-VGG crypto MAE (vs poly-activation net): {crypto_err}")
    print(f"tiny-VGG total MAE (vs exact-SiLU net): {approx_err}")
    assert crypto_err < 0.005   # the reference e2e bound, crypto-only
    assert approx_err < 0.05    # approximation sanity (degree-15, margin 2)
