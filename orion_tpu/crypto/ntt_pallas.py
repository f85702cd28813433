"""Pallas TPU kernel for the negacyclic NTT.

The jnp stage-loop NTT (ntt.py) issues ~log2(N) separate fused loops per
transform with HBM round-trips between them; this kernel keeps the whole
transform resident in VMEM.

Layout: the length-N poly is a (R, 128) u32 tile, R = N/128.
  * flat index j = r*128 + c: bits >= 7 live in the sublane (row) dim,
    bits < 7 in the lane dim;
  * butterfly stages pairing a bit >= 7 are plain row-group reshapes;
  * for stages pairing bits < 7 the tile is transposed once (lane bits
    become sublanes), the remaining stages run there, and a final
    transpose restores the layout;
  * per-stage twiddles are precomputed on host as full (N,)-shaped
    "twiddle of the pair containing j" arrays, stored in exactly the
    layout the kernel sees at that stage — the kernel performs no gathers.

Modular arithmetic is the same Shoup form as modops.py, re-implemented
locally so everything stays in VMEM/registers.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK16 = np.uint32(0xFFFF)
_LANE = 128


def _mulhi32(a, b):
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    lo = a0 * b0
    m1 = a0 * b1
    m2 = a1 * b0
    hi = a1 * b1
    t = (lo >> 16) + (m1 & _MASK16) + (m2 & _MASK16)
    return hi + (m1 >> 16) + (m2 >> 16) + (t >> 16)


def _shoup(a, c, c_sh, p):
    q = _mulhi32(a, c_sh)
    r = a * c - q * p
    return jnp.where(r >= p, r - p, r)


def _addm(a, b, p):
    s = a + b
    return jnp.where(s >= p, s - p, s)


def _subm(a, b, p):
    d = a - b
    return jnp.where(a >= b, d, d + p)


def _pair_twiddles(tw_row: np.ndarray, logn: int, forward: bool):
    """Per-stage (N,) arrays: W[j] = twiddle of the butterfly pair of j."""
    n = 1 << logn
    j = np.arange(n)
    out = []
    for s in range(logn):
        if forward:
            m = 1 << s                  # groups; group span 2t = n/m
            span = n // m
        else:
            t = 1 << s
            m = n // (2 * t)
            span = 2 * t
        out.append(tw_row[m + (j // span)])
    return out


def _layout(stage_t: int, arr_n: np.ndarray, n: int):
    """Store a (N,) stage array in the layout the kernel uses: (R,128) for
    row-space stages (t >= 128), transposed (128,R) for lane-space."""
    R = n // _LANE
    tile = arr_n.reshape(R, _LANE)
    return tile if stage_t >= _LANE else tile.T.copy()


def _fwd_kernel(logn, L, x_ref, p_ref, *refs):
    n = 1 << logn
    R = n // _LANE
    tw_refs = refs[:logn]
    sh_refs = refs[logn: 2 * logn]
    out_ref = refs[-1]
    limb = pl.program_id(0) % L
    p = p_ref[limb, 0]
    a = x_ref[0, 0]  # (R, 128)

    split = logn - 7  # stages [0, split): t >= 128
    for s in range(split):
        m = 1 << s
        tr = R // (2 * m)
        v = a.reshape(m, 2, tr, _LANE)
        w = tw_refs[s][0].reshape(m, 2, tr, _LANE)[:, 1]
        wsh = sh_refs[s][0].reshape(m, 2, tr, _LANE)[:, 1]
        even = v[:, 0]
        odd = _shoup(v[:, 1], w, wsh, p)
        a = jnp.stack([_addm(even, odd, p), _subm(even, odd, p)],
                      axis=1).reshape(R, _LANE)

    a = a.T  # (128, R): lane bits now sublanes
    for s in range(split, logn):
        t = n >> (s + 1)  # < 128
        g = _LANE // (2 * t)
        v = a.reshape(g, 2, t, R)
        w = tw_refs[s][0].reshape(g, 2, t, R)[:, 1]
        wsh = sh_refs[s][0].reshape(g, 2, t, R)[:, 1]
        even = v[:, 0]
        odd = _shoup(v[:, 1], w, wsh, p)
        a = jnp.stack([_addm(even, odd, p), _subm(even, odd, p)],
                      axis=1).reshape(_LANE, R)
    out_ref[0, 0] = a.T


def _inv_kernel(logn, L, x_ref, p_ref, ninv_ref, ninv_sh_ref, *refs):
    n = 1 << logn
    R = n // _LANE
    tw_refs = refs[:logn]
    sh_refs = refs[logn: 2 * logn]
    out_ref = refs[-1]
    limb = pl.program_id(0) % L
    p = p_ref[limb, 0]
    split = 7  # stages [0, split): t < 128 (t = 2^s)

    a = x_ref[0, 0].T  # start in transposed layout (128, R)
    for s in range(split):
        t = 1 << s
        g = _LANE // (2 * t)
        v = a.reshape(g, 2, t, R)
        w = tw_refs[s][0].reshape(g, 2, t, R)[:, 1]
        wsh = sh_refs[s][0].reshape(g, 2, t, R)[:, 1]
        u = v[:, 0]
        x = v[:, 1]
        a = jnp.stack([_addm(u, x, p),
                       _shoup(_subm(u, x, p), w, wsh, p)],
                      axis=1).reshape(_LANE, R)

    a = a.T  # back to (R, 128)
    for s in range(split, logn):
        t = 1 << s
        tr = t // _LANE
        m = R // (2 * tr)
        v = a.reshape(m, 2, tr, _LANE)
        w = tw_refs[s][0].reshape(m, 2, tr, _LANE)[:, 1]
        wsh = sh_refs[s][0].reshape(m, 2, tr, _LANE)[:, 1]
        u = v[:, 0]
        x = v[:, 1]
        a = jnp.stack([_addm(u, x, p),
                       _shoup(_subm(u, x, p), w, wsh, p)],
                      axis=1).reshape(R, _LANE)
    out_ref[0, 0] = _shoup(a, ninv_ref[limb, 0],
                           ninv_sh_ref[limb, 0], p)


class PallasNTT:
    """Per-context compiled Pallas NTT; grid over (batch * limb)."""

    def __init__(self, ctx):
        self.ctx = ctx
        self.logn = ctx.logn
        n = ctx.n
        if n < 2 * _LANE:
            raise ValueError("PallasNTT requires N >= 256")
        tw = np.stack([r.tw for r in ctx.host.rings]).astype(np.uint32)
        itw = np.stack([r.itw for r in ctx.host.rings]).astype(np.uint32)
        tw_sh = np.asarray(ctx.dev["tw_shoup"])
        itw_sh = np.asarray(ctx.dev["itw_shoup"])

        def build(rows, forward):
            stages = []
            for li in range(ctx.n_all):
                stages.append(_pair_twiddles(rows[li], self.logn, forward))
            out = []
            for s in range(self.logn):
                t = (n >> (s + 1)) if forward else (1 << s)
                tiles = np.stack([_layout(t, stages[li][s], n)
                                  for li in range(ctx.n_all)])
                out.append(jnp.asarray(tiles))
            return out

        self.f_tw = build(tw, True)
        self.f_sh = build(tw_sh, True)
        self.i_tw = build(itw, False)
        self.i_sh = build(itw_sh, False)
        self.p = jnp.asarray(np.array([[p] for p in ctx.primes], np.uint32))
        self.ninv = jnp.asarray(np.asarray(ctx.dev["ninv"])[:, None])
        self.ninv_sh = jnp.asarray(
            np.asarray(ctx.dev["ninv_shoup"])[:, None])

    def _call(self, kernel, a, limb_rows, extra_scalars, tw_list, sh_list,
              forward):
        import jax
        interpret = jax.default_backend() == "cpu"
        *batch, L, n = a.shape
        R = n // _LANE
        flat = a.reshape(-1, L, R, _LANE)
        B = flat.shape[0]
        rows = np.asarray(limb_rows, np.int32)

        in_specs = [
            pl.BlockSpec((1, 1, R, _LANE), lambda i: (i // L, i % L, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        args = [flat, self.p[rows]]
        for sc in extra_scalars:
            in_specs.append(pl.BlockSpec((L, 1), lambda i: (0, 0),
                                         memory_space=pltpu.SMEM))
            args.append(sc[rows])
        for s, t in enumerate(tw_list):
            shp = t.shape[1:]
            in_specs.append(pl.BlockSpec(
                (1,) + shp, lambda i: (i % L, 0, 0),
                memory_space=pltpu.VMEM))
            args.append(t[rows])
        for s, t in enumerate(sh_list):
            shp = t.shape[1:]
            in_specs.append(pl.BlockSpec(
                (1,) + shp, lambda i: (i % L, 0, 0),
                memory_space=pltpu.VMEM))
            args.append(t[rows])

        out = pl.pallas_call(
            partial(kernel, self.logn, L),
            grid=(B * L,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, R, _LANE),
                                   lambda i: (i // L, i % L, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L, R, _LANE), jnp.uint32),
            interpret=interpret,
        )(*args)
        return out.reshape(*batch, L, n)

    def ntt(self, a, limb_rows):
        return self._call(_fwd_kernel, a, limb_rows, [],
                          self.f_tw, self.f_sh, True)

    def intt(self, a, limb_rows):
        return self._call(_inv_kernel, a, limb_rows,
                          [self.ninv, self.ninv_sh],
                          self.i_tw, self.i_sh, False)
