"""Four-step negacyclic NTT with TPU-friendly layouts (jnp, uint32).

The stage-loop NTT in ntt.py interleaves butterfly halves on the minor
(lane) dimension for every stage with pair distance < 128, which XLA:TPU
lowers to expensive sublane/lane shuffles; those relayouts dominate the
measured NTT time.  This module reorganises the SAME transform (bit-exact,
same input/output order) so that every butterfly interleave happens on a
major dimension:

  view the length-N poly as a (R, 128) tile, R = N/128, row r = high bits.

  forward (Cooley-Tukey DIT, standard order -> bit-reversed):
    1. logR "row stages": butterflies pair rows; the stage twiddle depends
       only on the row index (tw[2^s + (r >> (logR-s))]).
    2. twist: pointwise multiply by T[r, c] = psi^(2 br_R(r) c); this
       factors the row-dependence out of the remaining stages (verified
       identity: the per-row composite of stages s >= logR equals
       D . diag(T[r]) with D = the row-0 composite).
    3. transpose to (128, R) and run the 7 remaining stages as row
       butterflies there, with row-0 twiddles tw[2^s + (c >> (logn-s))]
       that depend only on the (now-sublane) lane index c.
    4. transpose back.

  inverse (Gentleman-Sande) mirrors it: lane stages with row-0 inverse
  twiddles, inverse twist T^-1, row stages, then the usual n^-1 scale.

Because modular arithmetic is exact, any regrouping that realises the same
linear map gives bit-identical outputs to ntt.py's loop (tests assert it).

Reference parity: replaces the role of Lattigo's ring.NTT beneath
`orion/backend/lattigo/evaluator.go`; the factorisation itself is the
classic four-step/Bailey decomposition adapted to the merged-psi NTT.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .modops import add_mod, shoup_mul, sub_mod

_LANE = 128


def _shoup_arr(vals: np.ndarray, p: int) -> np.ndarray:
    v = np.asarray(vals, dtype=np.uint64)
    return ((v << np.uint64(32)) // np.uint64(p)).astype(np.uint32)


def _pow_table(psi: int, p: int, count: int) -> np.ndarray:
    """psi^0..psi^(count-1) mod p via vectorised doubling (u64-safe)."""
    pw = np.ones(1, np.uint64)
    psi = int(psi) % p
    while pw.size < count:
        mult = pow(psi, int(pw.size), p)
        pw = np.concatenate([pw, pw * np.uint64(mult) % np.uint64(p)])
    return pw[:count].astype(np.uint32)


def _brev(x: np.ndarray, bits: int) -> np.ndarray:
    out = np.zeros_like(x)
    for _ in range(bits):
        out = (out << 1) | (x & 1)
        x = x >> 1
    return out


def build_t4_tables(tw: np.ndarray, itw: np.ndarray, psis, primes,
                    logn: int) -> dict[str, np.ndarray] | None:
    """Host-side four-step tables for all limbs.

    tw/itw: (n_all, N) merged-psi twiddles (tw[i, j] = psi_i^bitrev(j)).
    Returns dict of (n_all, ...) uint32 arrays, or None when N < 256
    (the transpose split needs at least 2 rows of 128 lanes).
    """
    n = 1 << logn
    if n < 2 * _LANE:
        return None
    R = n // _LANE
    logR = logn - 7
    L = tw.shape[0]

    r_idx = np.arange(R)
    c_idx = np.arange(_LANE)
    br_r = _brev(r_idx, logR)

    rowtw = np.zeros((L, logR, R), np.uint32)
    lanetw = np.zeros((L, 7, _LANE), np.uint32)
    twist = np.zeros((L, R, _LANE), np.uint32)
    i_lanetw = np.zeros((L, 7, _LANE), np.uint32)
    i_twist = np.zeros((L, R, _LANE), np.uint32)
    i_rowtw = np.zeros((L, logR, R), np.uint32)

    texp = (2 * br_r[:, None] * c_idx[None, :]) % (2 * n)

    for li in range(L):
        p = int(primes[li])
        pw = _pow_table(psis[li], p, 2 * n)
        for s in range(logR):
            rowtw[li, s] = tw[li, (1 << s) + (r_idx >> (logR - s))]
            m = R >> (s + 1)
            i_rowtw[li, s] = itw[li, m + (r_idx >> (s + 1))]
        for k in range(7):
            s = logR + k
            lanetw[li, k] = tw[li, (1 << s) + (c_idx >> (7 - k))]
            m = n >> (k + 1)
            i_lanetw[li, k] = itw[li, m + (c_idx >> (k + 1))]
        twist[li] = pw[texp]
        i_twist[li] = pw[(2 * n - texp) % (2 * n)]

    # Pallas-kernel layouts (crypto/ks_pallas.py): stage twiddles packed so
    # the kernel extracts each stage's vector with a plain lane/sublane
    # slice (Mosaic has no lane-dim reshapes).  rowstack lane s = forward
    # row-stage-s per-row twiddle, lane 16+s = inverse; lanestack sublane k
    # = forward lane-stage-k per-lane twiddle, sublane 8+k = inverse.
    rowstack = np.zeros((L, R, _LANE), np.uint32)
    lanestack = np.zeros((L, 16, _LANE), np.uint32)
    rowstack[:, :, :logR] = rowtw.transpose(0, 2, 1)
    rowstack[:, :, 16:16 + logR] = i_rowtw.transpose(0, 2, 1)
    lanestack[:, :7] = lanetw
    lanestack[:, 8:15] = i_lanetw

    out = {"rowtw": rowtw, "lanetw": lanetw, "twist": twist,
           "i_lanetw": i_lanetw, "i_twist": i_twist, "i_rowtw": i_rowtw,
           "rowstack": rowstack, "lanestack": lanestack}
    for k in list(out):
        sh = np.zeros_like(out[k])
        for li in range(L):
            sh[li] = _shoup_arr(out[k][li], int(primes[li]))
        out[k + "_sh"] = sh
    return out


def t4_rows(t4: dict, rows) -> dict:
    """Slice every table to the given limb rows (list/array/slice)."""
    if isinstance(rows, (list, np.ndarray)):
        idx = jnp.asarray(np.asarray(rows, np.int32))
        return {k: v[idx] for k, v in t4.items()}
    return {k: v[rows] for k, v in t4.items()}


def ntt4(a, t4: dict, p):
    """Forward negacyclic NTT over the last axis (bit-exact vs ntt.ntt)."""
    *batch, L, N = a.shape
    R = N // _LANE
    logR = R.bit_length() - 1
    a = a.reshape(*batch, L, R, _LANE)
    p2 = p.reshape(L, 1, 1)
    p4 = p.reshape(L, 1, 1, 1)

    for s in range(logR):
        m = 1 << s
        tr = R >> (s + 1)
        v = a.reshape(*batch, L, m, 2, tr, _LANE)
        w = t4["rowtw"][:, s].reshape(L, m, 2, tr, 1)[:, :, 1]
        wsh = t4["rowtw_sh"][:, s].reshape(L, m, 2, tr, 1)[:, :, 1]
        even = v[..., 0, :, :]
        odd = shoup_mul(v[..., 1, :, :], w, wsh, p4)
        a = jnp.stack([add_mod(even, odd, p4), sub_mod(even, odd, p4)],
                      axis=-3).reshape(*batch, L, R, _LANE)

    a = shoup_mul(a, t4["twist"], t4["twist_sh"], p2)
    a = jnp.swapaxes(a, -1, -2)  # (..., L, LANE, R)

    for k in range(7):
        t = _LANE >> (k + 1)
        gc = 1 << k
        v = a.reshape(*batch, L, gc, 2, t, R)
        w = t4["lanetw"][:, k].reshape(L, gc, 2, t, 1)[:, :, 1]
        wsh = t4["lanetw_sh"][:, k].reshape(L, gc, 2, t, 1)[:, :, 1]
        even = v[..., 0, :, :]
        odd = shoup_mul(v[..., 1, :, :], w, wsh, p4)
        a = jnp.stack([add_mod(even, odd, p4), sub_mod(even, odd, p4)],
                      axis=-3).reshape(*batch, L, _LANE, R)

    return jnp.swapaxes(a, -1, -2).reshape(*batch, L, N)


def intt4(a, t4: dict, ninv, ninv_shoup, p):
    """Inverse negacyclic NTT over the last axis (bit-exact vs ntt.intt)."""
    *batch, L, N = a.shape
    R = N // _LANE
    logR = R.bit_length() - 1
    p2 = p.reshape(L, 1, 1)
    p4 = p.reshape(L, 1, 1, 1)
    a = a.reshape(*batch, L, R, _LANE)
    a = jnp.swapaxes(a, -1, -2)  # (..., L, LANE, R)

    for k in range(7):
        t = 1 << k
        gc = _LANE >> (k + 1)
        v = a.reshape(*batch, L, gc, 2, t, R)
        w = t4["i_lanetw"][:, k].reshape(L, gc, 2, t, 1)[:, :, 1]
        wsh = t4["i_lanetw_sh"][:, k].reshape(L, gc, 2, t, 1)[:, :, 1]
        u = v[..., 0, :, :]
        x = v[..., 1, :, :]
        a = jnp.stack([add_mod(u, x, p4),
                       shoup_mul(sub_mod(u, x, p4), w, wsh, p4)],
                      axis=-3).reshape(*batch, L, _LANE, R)

    a = jnp.swapaxes(a, -1, -2)  # (..., L, R, LANE)
    a = shoup_mul(a, t4["i_twist"], t4["i_twist_sh"], p2)

    for k in range(logR):
        rk = 1 << k
        m = R >> (k + 1)
        v = a.reshape(*batch, L, m, 2, rk, _LANE)
        w = t4["i_rowtw"][:, k].reshape(L, m, 2, rk, 1)[:, :, 1]
        wsh = t4["i_rowtw_sh"][:, k].reshape(L, m, 2, rk, 1)[:, :, 1]
        u = v[..., 0, :, :]
        x = v[..., 1, :, :]
        a = jnp.stack([add_mod(u, x, p4),
                       shoup_mul(sub_mod(u, x, p4), w, wsh, p4)],
                      axis=-3).reshape(*batch, L, R, _LANE)

    a = a.reshape(*batch, L, N)
    return shoup_mul(a, ninv.reshape(L, 1), ninv_shoup.reshape(L, 1),
                     p.reshape(L, 1))
