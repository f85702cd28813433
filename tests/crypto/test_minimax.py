"""Composite minimax sign/step approximation quality (host-side)."""

import numpy as np

from orion_tpu.crypto.minimax import generate_minimax_sign_coeffs


def _compose(coeff_sets, x):
    y = x
    for coefs in coeff_sets:
        y = np.polynomial.chebyshev.chebval(y, np.asarray(coefs))
    return y


def test_sign_step_accuracy():
    degrees = [15, 15, 27]
    sets = generate_minimax_sign_coeffs(degrees, logalpha=6, logerr=12)
    assert len(sets) == 3
    a = 2.0 ** -6
    xs = np.concatenate([np.linspace(a, 1, 4000),
                         -np.linspace(a, 1, 4000)])
    got = _compose(sets, xs)
    want = (xs > 0).astype(np.float64)
    err = np.max(np.abs(got - want))
    assert err < 2 ** -10, f"step error {err}"


def test_intermediate_ranges_bounded():
    degrees = [15, 15, 27]
    sets = generate_minimax_sign_coeffs(degrees, logalpha=6)
    a = 2.0 ** -6
    xs = np.concatenate([np.linspace(a, 1, 2000),
                         -np.linspace(a, 1, 2000)])
    y = xs
    for coefs in sets[:-1]:
        y = np.polynomial.chebyshev.chebval(y, np.asarray(coefs))
        assert np.max(np.abs(y)) <= 1.0 + 1e-9


def test_relu_via_sign():
    """x * step-composite(x) approximates ReLU on [-1, 1] minus dead zone."""
    sets = generate_minimax_sign_coeffs([15, 15, 27], logalpha=6)
    a = 2.0 ** -6
    xs = np.concatenate([np.linspace(a, 1, 2000),
                         -np.linspace(a, 1, 2000)])
    relu = xs * _compose(sets, xs)
    want = np.maximum(xs, 0)
    assert np.max(np.abs(relu - want)) < 2 ** -9
