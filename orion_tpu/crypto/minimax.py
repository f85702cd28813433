"""Composite minimax sign approximation (host-side, compile time).

Reference parity: Lattigo's `minimax.GenMinimaxCompositePolynomial` used via
`orion/backend/lattigo/polyeval.go:90-167`: a chain of minimax polynomials
p_k(...p_1(x)) approximating sign(x) on [-1, -2^-logalpha] u [2^-logalpha, 1],
with the final polynomial mapped from sign to the step function [0, 1].

Implementation: Remez exchange per stage with numpy float64 (the reference
uses 128-bit floats; float64 suffices for logerr <= 12 targets, validated in
tests against the true sign function).
"""

from __future__ import annotations

import numpy as np


def _remez_odd(degree: int, lo: float, hi: float, fn, grid_size: int = 4000):
    """Minimax ODD polynomial approximation of fn on [lo,hi] u [-hi,-lo]
    in the Chebyshev basis over [-1, 1].

    Sign-stage polynomials are odd; we exploit symmetry and run the Remez
    exchange on the positive interval with odd Chebyshev terms only.
    """
    # odd-degree basis indices
    ks = np.arange(1, degree + 1, 2)
    n_coef = len(ks)
    # initial reference points: chebyshev-distributed on [lo, hi]
    m = n_coef + 1
    t = np.cos(np.pi * np.arange(m) / (m - 1))
    x = lo + (hi - lo) * (t + 1) / 2

    grid = np.linspace(lo, hi, grid_size)

    def cheb_mat(pts):
        return np.polynomial.chebyshev.chebvander(pts, degree)[:, ks]

    coef = None
    for _ in range(60):
        A = np.zeros((m, n_coef + 1))
        A[:, :n_coef] = cheb_mat(x)
        A[:, n_coef] = (-1.0) ** np.arange(m)
        b = fn(x)
        try:
            sol = np.linalg.solve(A, b)
        except np.linalg.LinAlgError:
            break
        coef = sol[:n_coef]
        # error on the fine grid
        err = cheb_mat(grid) @ coef - fn(grid)
        # new reference: local extrema of |err|
        idx = [0]
        for i in range(1, grid_size - 1):
            if (err[i] - err[i - 1]) * (err[i + 1] - err[i]) <= 0:
                idx.append(i)
        idx.append(grid_size - 1)
        # keep m extrema with alternating signs and largest magnitude
        extrema = sorted(set(idx))
        if len(extrema) < m:
            break
        # pick the m largest-|err| alternating points
        pts = _alternating_subset(grid[extrema], err[extrema], m)
        if pts is None:
            break
        new_x = np.array(pts)
        if np.allclose(new_x, x, rtol=0, atol=1e-12 * (hi - lo)):
            x = new_x
            break
        x = new_x

    full = np.zeros(degree + 1)
    full[ks] = coef
    return full  # chebyshev coefficients over [-1, 1]


def _alternating_subset(xs, errs, m):
    """Choose m points with alternating error signs maximising |err|."""
    groups = []  # runs of same sign
    cur = [0]
    for i in range(1, len(xs)):
        if np.sign(errs[i]) == np.sign(errs[cur[-1]]) or errs[i] == 0:
            cur.append(i)
        else:
            groups.append(cur)
            cur = [i]
    groups.append(cur)
    picks = [max(g, key=lambda i: abs(errs[i])) for g in groups]
    if len(picks) < m:
        return None
    # keep the m consecutive picks with the largest minimum |err|
    best, best_val = None, -1.0
    for s in range(len(picks) - m + 1):
        window = picks[s: s + m]
        val = min(abs(errs[i]) for i in window)
        if val > best_val:
            best_val, best = val, window
    return xs[best]


def generate_minimax_sign_coeffs(degrees, prec=128, logalpha=6, logerr=12):
    """Chebyshev coefficient sets for the composite sign -> step chain.

    Stage k approximates sign on the current uncertainty band; the band
    shrinks each stage.  The last polynomial is mapped to (p(x)+1)/2 so the
    composite approximates the step function on [0, 1]
    (reference `polyeval.go:120-160`).
    """
    alpha = 2.0 ** (-logalpha)
    coeff_sets = []
    lo = alpha
    for i, degree in enumerate(degrees):
        fn = lambda x: np.ones_like(x)  # sign(x) = 1 on the positive band
        coefs = _remez_odd(degree, lo, 1.0, fn)
        # measure the stage's max deviation to set the next band
        grid = np.linspace(lo, 1.0, 4000)
        vals = np.polynomial.chebyshev.chebval(grid, coefs)
        err = float(np.max(np.abs(vals - 1.0)))
        hi_out = float(np.max(np.abs(vals)))
        is_last = i == len(degrees) - 1
        if is_last:
            # map sign -> step: (p + 1) / 2
            coefs = coefs / 2.0
            coefs[0] += 0.5
        else:
            # normalise so outputs stay within [-1, 1] for the next stage
            coefs = coefs / hi_out
            vals = vals / hi_out
            err = float(np.max(np.abs(vals - np.mean([1.0]))))
            lo = max(1.0 - (1.0 - float(np.min(vals))), 1e-6)
            lo = float(np.min(vals))
        coeff_sets.append(coefs.tolist())
    return coeff_sets
