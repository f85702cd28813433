"""Fused Pallas key-switch: the whole hybrid key-switch in one TPU kernel.

The jnp key-switch (keyswitch.py) lowers to dozens of small XLA fusions
with HBM round-trips between every NTT stage, basis conversion and the
KSK inner product; at LogN 13 the measured time was ~300x the analytical
HBM roofline.  This kernel keeps the entire working set resident in VMEM:

    iNTT(Q rows) -> per-digit fast basis conversion -> NTT(t rows)
      -> KSK inner product -> ModDown (iNTT specials, FBC, NTT, P^-1)

Everything inside computes the SAME linear maps as keyswitch.py/ntt4.py
(butterflies are re-expressed as rolls+selects because Mosaic has no
lane-dim reshapes), so outputs are bit-identical to the unfused path —
tests assert equality.

Scope: standard ring, four-step tables available (N >= 256), working set
within the VMEM budget (checked; larger levels fall back to the jnp path).
Reference parity: this plays the role of the fused CUDA key-switch kernels
HEonGPU runs under `orion/backend/heongpu/bindings.py` and of Lattigo's
ring package beneath `orion/backend/lattigo/evaluator.go:49-317`.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modops import add_mod, mul_mod, shoup_mul, sub_mod

_LANE = 128
# VMEM is 16MB/core.  Budgets below are checked against the ESTIMATED
# working set; Mosaic's real scoped-stack usage runs ~2x the estimate
# (per-stage temporaries), so the budget stays at ~1/3 of VMEM —
# a measured 10MB budget OOM'd at 18.55M scoped stack on a level-6
# single-shot kernel.
_VMEM_BUDGET = 5 * 1024 * 1024

# tables the kernels consume (stage stacks are the Pallas layouts built by
# ntt4.build_t4_tables: lane/sublane-sliceable, no lane-dim reshapes)
_T4_KEYS = ("twist", "twist_sh", "i_twist", "i_twist_sh",
            "rowstack", "rowstack_sh", "lanestack", "lanestack_sh")


def _iota_mask(shape, ndim, axis, bit):
    """(index & bit) == 0 mask along `axis` (negative) of a value."""
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, ndim + axis)
    return (idx & bit) == 0


def _roll(a, shift, axis):
    ax = a.ndim + axis
    size = a.shape[ax]
    return pltpu.roll(a, shift % size, axis=ax)


def _butterfly_fwd(a, w, wsh, p3, dist, axis):
    """One CT stage via rolls+selects: pairs (j, j+dist) along `axis`
    (-2 rows, -1 lanes).  Lower j: out = u + w*v; upper: out = u - w*v.
    Twiddle w broadcasts along the other minor dim and any batch dims.
    """
    low = _iota_mask(a.shape, a.ndim, axis, dist)
    up = _roll(a, -dist, axis)
    down = _roll(a, dist, axis)
    m = shoup_mul(jnp.where(low, up, a), w, wsh, p3)
    return jnp.where(low, add_mod(a, m, p3), sub_mod(down, m, p3))


def _butterfly_inv(a, w, wsh, p3, dist, axis):
    """One GS stage: lower out = u + v; upper out = (u - v) * w."""
    low = _iota_mask(a.shape, a.ndim, axis, dist)
    up = _roll(a, -dist, axis)
    down = _roll(a, dist, axis)
    return jnp.where(low, add_mod(a, up, p3),
                     shoup_mul(sub_mod(down, a, p3), w, wsh, p3))


def _kntt(a, t4, p3):
    """Forward four-step NTT on (..., L, R, LANE) values inside a kernel.

    Same linear map as ntt4.ntt4 (bit-exact); butterflies use rolls and
    per-stage twiddle vectors lane/sublane-sliced from the packed stacks
    (Mosaic supports rolls, selects and minor-dim broadcasts; it has no
    lane-dim reshapes, which rules out the jnp ntt4 formulation here).
    """
    R = a.shape[-2]
    logR = R.bit_length() - 1
    for s in range(logR):
        tr = R >> (s + 1)
        w = t4["rowstack"][:, :, s:s + 1]
        wsh = t4["rowstack_sh"][:, :, s:s + 1]
        a = _butterfly_fwd(a, w, wsh, p3, tr, -2)
    a = shoup_mul(a, t4["twist"], t4["twist_sh"], p3)
    for k in range(7):
        t = _LANE >> (k + 1)
        w = t4["lanestack"][:, k:k + 1, :]
        wsh = t4["lanestack_sh"][:, k:k + 1, :]
        a = _butterfly_fwd(a, w, wsh, p3, t, -1)
    return a


def _kintt(a, t4, ninv3, ninv3_sh, p3):
    """Inverse four-step NTT on (..., L, R, LANE) values inside a kernel."""
    R = a.shape[-2]
    logR = R.bit_length() - 1
    for k in range(7):
        t = 1 << k
        w = t4["lanestack"][:, 8 + k:9 + k, :]
        wsh = t4["lanestack_sh"][:, 8 + k:9 + k, :]
        a = _butterfly_inv(a, w, wsh, p3, t, -1)
    a = shoup_mul(a, t4["i_twist"], t4["i_twist_sh"], p3)
    for k in range(logR):
        rk = 1 << k
        w = t4["rowstack"][:, :, 16 + k:17 + k]
        wsh = t4["rowstack_sh"][:, :, 16 + k:17 + k]
        a = _butterfly_inv(a, w, wsh, p3, rk, -2)
    return shoup_mul(a, ninv3, ninv3_sh, p3)


def _interpret():
    return jax.default_backend() == "cpu"


class _Args:
    """Ordered (name -> array) collector for pallas_call plumbing."""

    def __init__(self):
        self.names = []
        self.arrays = []

    def add(self, name, arr):
        self.names.append(name)
        self.arrays.append(arr)

    def bytes(self):
        return sum(int(np.prod(a.shape)) * 4 for a in self.arrays)


def _dl_static(dl):
    """Static (python) metadata of a DevLevel needed to build the kernel."""
    nl = dl.level + 1
    n_sp = int(dl.s_p.shape[0])
    digits = tuple((dg.src_lo, dg.src_hi, int(dg.qhat_inv.shape[0]))
                   for dg in dl.digits)
    return nl, n_sp, digits


def _add_common(args: _Args, dl, ext_n):
    """Tables shared by decompose/finish: t4 for t rows, moduli vectors."""
    for k in _T4_KEYS:
        args.add("t4_" + k, dl.t_t4[k])
    args.add("p_t", dl.t_p.reshape(-1, 1))
    args.add("ninv_t", jnp.concatenate(
        [dl.q_ninv, dl.s_ninv]).reshape(-1, 1))
    args.add("ninv_sh_t", jnp.concatenate(
        [dl.q_ninv_shoup, dl.s_ninv_shoup]).reshape(-1, 1))


def _add_digit(args: _Args, name, dg):
    args.add(name + "_qi", dg.qhat_inv[:, :, None])
    args.add(name + "_qi_sh", dg.qhat_inv_shoup[:, :, None])
    args.add(name + "_conv", dg.conv[:, :, :, None])
    args.add(name + "_conv_sh", dg.conv_shoup[:, :, :, None])
    args.add(name + "_dmod", dg.d_mod_t[:, :, None])
    args.add(name + "_dmod_sh", dg.d_mod_t_shoup[:, :, None])
    args.add(name + "_srcq", dg.src_q_f32[:, :, None])
    args.add(name + "_srcp", dg.src_p[:, :, None])


def _fbc_k(g, name, z, tgtp, alpha):
    """In-kernel fast basis conversion; z (alpha, R, LANE) coeff domain."""
    zq = shoup_mul(z, g(name + "_qi"), g(name + "_qi_sh"), g(name + "_srcp"))
    # u32<->f32 casts route via i32 (values < 2^31, exact): Mosaic has no
    # direct unsigned<->float cast
    zf = zq.astype(jnp.int32).astype(jnp.float32)
    frac = jnp.sum(zf / g(name + "_srcq"), axis=0)
    v = jnp.round(frac).astype(jnp.int32).astype(jnp.uint32)
    acc = None
    for m in range(alpha):
        term = shoup_mul(zq[m][None], g(name + "_conv")[m],
                         g(name + "_conv_sh")[m], tgtp)
        acc = term if acc is None else add_mod(acc, term, tgtp)
    vterm = shoup_mul(v[None], g(name + "_dmod"), g(name + "_dmod_sh"), tgtp)
    return sub_mod(acc, vterm, tgtp)


def _t4_slice(g, sl):
    out = {}
    for k in _T4_KEYS:
        try:
            out[k] = g("t4_" + k)[sl]
        except KeyError:
            pass  # kernels that only run one direction pass fewer tables
    return out


def _decompose_k(g, nl, n_sp, digits, c):
    """c (nl, R, LANE) NTT domain -> ext (dnum, n_t, R, LANE) NTT domain."""
    q_sl = slice(None, nl)
    p_q = g("p_t")[q_sl][:, :, None]
    coeff = _kintt(c, _t4_slice(g, q_sl),
                   g("ninv_t")[q_sl][:, :, None],
                   g("ninv_sh_t")[q_sl][:, :, None], p_q)
    tgtp = g("p_t")[:, :, None]
    t4_t = _t4_slice(g, slice(None))
    exts = []
    for i, (lo, hi, alpha) in enumerate(digits):
        ext = _fbc_k(g, f"dg{i}", coeff[lo:hi], tgtp, alpha)
        exts.append(_kntt(ext, t4_t, tgtp))
    return jnp.stack(exts)


def _finish_k(g, nl, n_sp, dnum, ext, lean):
    """ext (dnum, n_t, R, LANE) -> key-switched (2, nl, R, LANE)."""
    n_t = nl + n_sp
    R = ext.shape[-2]
    n = R * _LANE
    tp = g("p_t")[:, :, None]
    acc0 = acc1 = None
    for j in range(dnum):
        if lean:
            pinv = g("t_pinv")[:, :, None]
            rm = g("t_rmod")[:, :, None]
            rs = g("t_rshoup")[:, :, None]
            t0 = mul_mod(ext[j], g("ksk")[j, 0], tp, pinv, rm, rs)
            t1 = mul_mod(ext[j], g("ksk")[j, 1], tp, pinv, rm, rs)
        else:
            t0 = shoup_mul(ext[j], g("ksk")[j, 0], g("ksk_sh")[j, 0], tp)
            t1 = shoup_mul(ext[j], g("ksk")[j, 1], g("ksk_sh")[j, 1], tp)
        if acc0 is None:
            acc0, acc1 = t0, t1
        else:
            acc0 = add_mod(acc0, t0, tp)
            acc1 = add_mod(acc1, t1, tp)
    acc = jnp.stack([acc0, acc1])  # (2, n_t, R, LANE)

    # ModDown both polys at once (batch dim 2)
    q_sl = slice(None, nl)
    s_sl = slice(nl, None)
    qpart = acc[:, :nl]
    ppart = acc[:, nl:]
    pp_coeff = _kintt(ppart, _t4_slice(g, s_sl),
                      g("ninv_t")[s_sl][:, :, None],
                      g("ninv_sh_t")[s_sl][:, :, None],
                      g("p_t")[s_sl][:, :, None])
    qp = g("p_t")[q_sl][:, :, None]
    lift = jnp.stack([_fbc_k(g, "md", pp_coeff[i], qp, n_sp)
                      for i in range(2)])
    lift_ntt = _kntt(lift, _t4_slice(g, q_sl), qp)
    diff = sub_mod(qpart, lift_ntt, qp)
    return shoup_mul(diff, g("pinv")[:, :, None], g("pinv_sh")[:, :, None],
                     qp)


def _make_getter(names, refs):
    table = dict(zip(names, refs))

    def g(name):
        return table[name][...]
    return g


# Re-tracing a Pallas kernel at every call site dominates program-build
# time on deep networks (a bootstrap walks ~40 key-switches).  Each
# distinct (tag, static metadata, arg shapes) signature gets ONE
# jax.jit-wrapped pallas_call whose trace jax caches process-wide.
_PCALL_CACHE: dict = {}


def _cached_call(tag, static_key, arrays, make_call):
    sig = (tag, static_key,
           tuple((a.shape, str(a.dtype)) for a in arrays),
           _interpret())
    fn = _PCALL_CACHE.get(sig)
    if fn is None:
        call = make_call()
        fn = jax.jit(lambda arrs: call(*arrs))
        _PCALL_CACHE[sig] = fn
    return fn(list(arrays))


def _call(kernel, args: _Args, out_shape, tag="", static_key=()):
    n_in = len(args.arrays)

    def make():
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
            interpret=_interpret(),
        )

    return _cached_call(tag, static_key, args.arrays, make)


def ks_supported(dl, trimmed_ksk_bytes: int) -> bool:
    """Fused path available for this level/ring within the VMEM budget?"""
    if dl.t_t4 is None or dl.ci_keep is not None:
        return False
    nl = dl.level + 1
    n_sp = int(dl.s_p.shape[0])
    n_t = nl + n_sp
    n = dl.ring_n
    dnum = len(dl.digits)
    word = 4
    tables = 4 * n_t * n * word           # twist fwd/inv + shoup
    data = (nl + 2 * dnum * n_t + 4 * n_t + 2 * nl) * n * word
    return tables + data + trimmed_ksk_bytes < _VMEM_BUDGET


def _trim_ksk(ksk, ksk_shoup, dl, trimmed):
    """Slice a full-chain KSK to this level's digits/rows (outside the
    kernel, so only the needed rows are DMA'd)."""
    if trimmed:
        return ksk, ksk_shoup
    dnum = len(dl.digits)
    nl = dl.level + 1
    n_q_total = ksk.shape[2] - int(dl.s_p.shape[0])

    def cut(k):
        return jnp.concatenate([k[:dnum, :, :nl], k[:dnum, :, n_q_total:]],
                               axis=2)
    return cut(ksk), None if ksk_shoup is None else cut(ksk_shoup)


# ------------------------------------------------------------------ #
#  Standalone Pallas NTT/iNTT: one kernel per transform bundle.       #
#  For levels whose whole key-switch exceeds VMEM, the jnp key-switch #
#  structure is kept (FBC / inner product are elementwise and fuse    #
#  fine in XLA) but every NTT bundle runs stage-fused in VMEM through #
#  these kernels — ring_ntt/ring_intt dispatch here (keyswitch.py).   #
# ------------------------------------------------------------------ #


def _limb_chunks(batch_rows: int, limbs: int, n: int):
    """Split the limb axis so each kernel call fits the VMEM budget.

    Per-limb cost: data in+out+temps (~3x batch_rows) plus tables
    (twist+shoup = 2 R*LANE rows, rowstack+shoup 2 more, lanestack small).
    """
    per_limb = (3 * batch_rows + 5) * n * 4
    c = max(1, _VMEM_BUDGET // per_limb)
    return [(lo, min(lo + c, limbs)) for lo in range(0, limbs, c)]


def pallas_ntt4(a, t4, p):
    """Forward NTT over the last axis via Pallas kernels (bit-exact vs
    ntt4.ntt4), auto-chunked over the (independent) limb axis so any
    level fits VMEM.  a: (..., L, N); t4 sliced to a's limb rows."""
    *batch, L, n = a.shape
    R = n // _LANE
    B = int(np.prod(batch)) if batch else 1
    keys = ("twist", "twist_sh", "rowstack", "rowstack_sh",
            "lanestack", "lanestack_sh")

    def one(a_c, t4_c, p_c):
        args = _Args()
        args.add("a", a_c.reshape(*batch, a_c.shape[-2], R, _LANE))
        for k in keys:
            args.add("t4_" + k, t4_c[k])
        args.add("p", p_c.reshape(-1, 1))
        names = tuple(args.names)

        def kernel(*refs):
            g = _make_getter(names, refs[:-1])
            refs[-1][...] = _kntt(g("a"), _t4_slice(g, slice(None)),
                                  g("p")[:, :, None])

        out = _call(kernel, args,
                    tuple(batch) + (a_c.shape[-2], R, _LANE), tag="ntt")
        return out.reshape(*batch, a_c.shape[-2], n)

    chunks = _limb_chunks(B, L, n)
    if len(chunks) == 1:
        return one(a, {k: t4[k] for k in keys}, p)
    outs = [one(a[..., lo:hi, :],
                {k: t4[k][lo:hi] for k in keys}, p[lo:hi])
            for lo, hi in chunks]
    return jnp.concatenate(outs, axis=-2)


def pallas_intt4(a, t4, ninv, ninv_shoup, p):
    """Inverse NTT over the last axis via Pallas kernels, limb-chunked."""
    *batch, L, n = a.shape
    R = n // _LANE
    B = int(np.prod(batch)) if batch else 1
    keys = ("i_twist", "i_twist_sh", "rowstack", "rowstack_sh",
            "lanestack", "lanestack_sh")

    def one(a_c, t4_c, ninv_c, ninv_sh_c, p_c):
        args = _Args()
        args.add("a", a_c.reshape(*batch, a_c.shape[-2], R, _LANE))
        for k in keys:
            args.add("t4_" + k, t4_c[k])
        args.add("p", p_c.reshape(-1, 1))
        args.add("ninv", ninv_c.reshape(-1, 1))
        args.add("ninv_sh", ninv_sh_c.reshape(-1, 1))
        names = tuple(args.names)

        def kernel(*refs):
            g = _make_getter(names, refs[:-1])
            refs[-1][...] = _kintt(g("a"), _t4_slice(g, slice(None)),
                                   g("ninv")[:, :, None],
                                   g("ninv_sh")[:, :, None],
                                   g("p")[:, :, None])

        out = _call(kernel, args,
                    tuple(batch) + (a_c.shape[-2], R, _LANE), tag="intt")
        return out.reshape(*batch, a_c.shape[-2], n)

    chunks = _limb_chunks(B, L, n)
    if len(chunks) == 1:
        return one(a, {k: t4[k] for k in keys}, ninv, ninv_shoup, p)
    outs = [one(a[..., lo:hi, :], {k: t4[k][lo:hi] for k in keys},
                ninv[lo:hi], ninv_shoup[lo:hi], p[lo:hi])
            for lo, hi in chunks]
    return jnp.concatenate(outs, axis=-2)


# ------------------------------------------------------------------ #
#  Grid-streaming variants: one grid step per decomposition digit     #
#  (per (digit, poly) for finish), so deep levels whose KSK/tables    #
#  exceed VMEM stream through the Pallas pipeline with double-        #
#  buffered DMA instead of falling back to the unfused jnp path.      #
# ------------------------------------------------------------------ #


def _pad_digits(dl):
    """Stack per-digit FBC constants padded to alpha_max rows.

    Padding a source row with qhat_inv = 0 zeroes its contribution exactly
    (shoup_mul by 0 is 0); src_q pads with 1.0 so the float correction adds
    0/1 = 0 for dead rows.
    """
    import jax.numpy as jnp
    amax = max(int(dg.qhat_inv.shape[0]) for dg in dl.digits)
    n_t = dl.level + 1 + int(dl.s_p.shape[0])

    def pad(a, rows, fill=0.0):
        if a.shape[0] == rows:
            return a
        padw = [(0, rows - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, padw, constant_values=fill)

    stacks = {k: [] for k in ("qi", "qi_sh", "conv", "conv_sh", "dmod",
                              "dmod_sh", "srcq", "srcp")}
    for j, dg in enumerate(dl.digits):
        # digits are contiguous alpha-sized source blocks (context.py
        # _build_level_tables), so src_lo == j * amax — no index input
        assert dg.src_lo == j * amax or dg.src_lo == 0 and j == 0
        stacks["qi"].append(pad(dg.qhat_inv[:, :, None], amax))
        stacks["qi_sh"].append(pad(dg.qhat_inv_shoup[:, :, None], amax))
        stacks["conv"].append(pad(dg.conv[:, :, :, None], amax))
        stacks["conv_sh"].append(pad(dg.conv_shoup[:, :, :, None], amax))
        stacks["dmod"].append(dg.d_mod_t[:, :, None])
        stacks["dmod_sh"].append(dg.d_mod_t_shoup[:, :, None])
        stacks["srcq"].append(pad(dg.src_q_f32[:, :, None], amax, 1.0))
        stacks["srcp"].append(pad(dg.src_p[:, :, None], amax))
    out = {k: jnp.stack(v) for k, v in stacks.items()}
    return out, amax


def _fbc_vals(qi, qi_sh, conv, conv_sh, dmod, dmod_sh, srcq, srcp,
              z, tgtp, alpha):
    zq = shoup_mul(z, qi, qi_sh, srcp)
    zf = zq.astype(jnp.int32).astype(jnp.float32)
    frac = jnp.sum(zf / srcq, axis=0)
    v = jnp.round(frac).astype(jnp.int32).astype(jnp.uint32)
    acc = None
    for m in range(alpha):
        term = shoup_mul(zq[m][None], conv[m], conv_sh[m], tgtp)
        acc = term if acc is None else add_mod(acc, term, tgtp)
    vterm = shoup_mul(v[None], dmod, dmod_sh, tgtp)
    return sub_mod(acc, vterm, tgtp)


def decompose_supported_grid(dl) -> bool:
    if dl.t_t4 is None or dl.ci_keep is not None:
        return False
    nl = dl.level + 1
    n_sp = int(dl.s_p.shape[0])
    n_t = nl + n_sp
    n = dl.ring_n
    amax = max(int(dg.qhat_inv.shape[0]) for dg in dl.digits)
    word = 4
    est = (nl + (nl + amax) + 4 * n_t + 3 * n_t) * n * word
    return est < _VMEM_BUDGET


def finish_supported_grid(dl, lean: bool) -> bool:
    if dl.t_t4 is None or dl.ci_keep is not None:
        return False
    nl = dl.level + 1
    n_sp = int(dl.s_p.shape[0])
    n_t = nl + n_sp
    n = dl.ring_n
    word = 4
    ksk_step = n_t * n * word * (1 if lean else 2) * 2   # double-buffered
    est = (2 * n_t + 2 * n_t + 2 * nl + 4 * nl + 4 * n_sp) * n * word \
        + ksk_step
    return est < _VMEM_BUDGET


def ks_decompose_pallas_grid(c_ntt, dl):
    """Grid-streaming ks_decompose: one grid step per digit."""
    nl, n_sp, digits = _dl_static(dl)
    dnum = len(digits)
    n = c_ntt.shape[-1]
    R = n // _LANE
    n_t = nl + n_sp
    dgc, amax = _pad_digits(dl)

    args = _Args()
    specs = []

    def add(name, arr, spec):
        args.add(name, arr)
        specs.append(spec)

    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda d: (0,) * len(shape), memory_space=pltpu.VMEM)

    add("c", c_ntt.reshape(nl, R, _LANE), const(nl, R, _LANE))
    for k in _T4_KEYS:
        v = dl.t_t4[k]
        add("t4_" + k, v, const(*v.shape))
    add("p_t", dl.t_p.reshape(-1, 1), const(n_t, 1))
    add("ninv_t", jnp.concatenate([dl.q_ninv, dl.s_ninv]).reshape(-1, 1),
        const(n_t, 1))
    add("ninv_sh_t",
        jnp.concatenate([dl.q_ninv_shoup, dl.s_ninv_shoup]).reshape(-1, 1),
        const(n_t, 1))
    # per-digit blocks
    for k in ("qi", "qi_sh", "conv", "conv_sh", "dmod", "dmod_sh",
              "srcq", "srcp"):
        v = dgc[k]
        shp = (1,) + v.shape[1:]
        add("dg_" + k, v, pl.BlockSpec(
            shp, lambda d, _nd=v.ndim: (d,) + (0,) * (_nd - 1),
            memory_space=pltpu.VMEM))
    names = tuple(args.names)

    def kernel(*refs):
        in_refs = refs[:len(names)]
        out_ref = refs[len(names)]
        coeff = refs[len(names) + 1]
        g = _make_getter(names, in_refs)
        d = pl.program_id(0)
        q_sl = slice(None, nl)

        @pl.when(d == 0)
        def _():
            coeff[:nl] = _kintt(
                g("c"), _t4_slice(g, q_sl),
                g("ninv_t")[q_sl][:, :, None],
                g("ninv_sh_t")[q_sl][:, :, None],
                g("p_t")[q_sl][:, :, None])
            coeff[nl:] = jnp.zeros((amax, R, _LANE), jnp.uint32)

        z = coeff[pl.ds(d * amax, amax)]
        tgtp = g("p_t")[:, :, None]
        ext = _fbc_vals(g("dg_qi")[0], g("dg_qi_sh")[0], g("dg_conv")[0],
                        g("dg_conv_sh")[0], g("dg_dmod")[0],
                        g("dg_dmod_sh")[0], g("dg_srcq")[0],
                        g("dg_srcp")[0], z, tgtp, amax)
        out_ref[0] = _kntt(ext, _t4_slice(g, slice(None)), tgtp)

    def make():
        return pl.pallas_call(
            kernel,
            grid=(dnum,),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, n_t, R, _LANE),
                                   lambda d: (d, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((dnum, n_t, R, _LANE),
                                           jnp.uint32),
            scratch_shapes=[pltpu.VMEM((nl + amax, R, _LANE), jnp.uint32)],
            interpret=_interpret(),
        )

    out = _cached_call("dec_grid", (nl, n_sp, dnum, amax), args.arrays,
                       make)
    return out.reshape(dnum, n_t, n)


def ks_finish_pallas_grid(ext, dl, ksk_data, ksk_shoup=None, trimmed=False):
    """Grid-streaming ks_finish: grid (digit, poly); KSK blocks stream
    through the pipeline, ModDown runs on the final step."""
    nl, n_sp, digits = _dl_static(dl)
    dnum = len(digits)
    n = ext.shape[-1]
    R = n // _LANE
    n_t = nl + n_sp
    lean = ksk_shoup is None
    kd, ks = _trim_ksk(ksk_data, ksk_shoup, dl, trimmed)

    args = _Args()
    specs = []

    def add(name, arr, spec):
        args.add(name, arr)
        specs.append(spec)

    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda d, q: (0,) * len(shape), memory_space=pltpu.VMEM)

    add("ext", ext.reshape(dnum, n_t, R, _LANE), pl.BlockSpec(
        (1, n_t, R, _LANE), lambda d, q: (d, 0, 0, 0),
        memory_space=pltpu.VMEM))
    add("ksk", kd.reshape(dnum, 2, n_t, R, _LANE), pl.BlockSpec(
        (1, 1, n_t, R, _LANE), lambda d, q: (d, q, 0, 0, 0),
        memory_space=pltpu.VMEM))
    if not lean:
        add("ksk_sh", ks.reshape(dnum, 2, n_t, R, _LANE), pl.BlockSpec(
            (1, 1, n_t, R, _LANE), lambda d, q: (d, q, 0, 0, 0),
            memory_space=pltpu.VMEM))
    else:
        add("t_pinv", dl.t_pinv.reshape(-1, 1), const(n_t, 1))
        add("t_rmod", dl.t_rmod.reshape(-1, 1), const(n_t, 1))
        add("t_rshoup", dl.t_rshoup.reshape(-1, 1), const(n_t, 1))
    for k in _T4_KEYS:
        v = dl.t_t4[k]
        add("t4_" + k, v, const(*v.shape))
    add("p_t", dl.t_p.reshape(-1, 1), const(n_t, 1))
    add("ninv_t", jnp.concatenate([dl.q_ninv, dl.s_ninv]).reshape(-1, 1),
        const(n_t, 1))
    add("ninv_sh_t",
        jnp.concatenate([dl.q_ninv_shoup, dl.s_ninv_shoup]).reshape(-1, 1),
        const(n_t, 1))
    md = dl.moddown
    add("md_qi", md.qhat_inv[:, :, None], const(n_sp, 1, 1))
    add("md_qi_sh", md.qhat_inv_shoup[:, :, None], const(n_sp, 1, 1))
    add("md_conv", md.conv[:, :, :, None], const(n_sp, nl, 1, 1))
    add("md_conv_sh", md.conv_shoup[:, :, :, None], const(n_sp, nl, 1, 1))
    add("md_dmod", md.d_mod_t[:, :, None], const(nl, 1, 1))
    add("md_dmod_sh", md.d_mod_t_shoup[:, :, None], const(nl, 1, 1))
    add("md_srcq", md.src_q_f32[:, :, None], const(n_sp, 1, 1))
    add("md_srcp", md.src_p[:, :, None], const(n_sp, 1, 1))
    add("pinv", dl.pinv_mod_q, const(nl, 1))
    add("pinv_sh", dl.pinv_mod_q_shoup, const(nl, 1))

    names = tuple(args.names)

    def kernel(*refs):
        in_refs = refs[:len(names)]
        out_ref = refs[len(names)]
        acc = refs[len(names) + 1]
        g = _make_getter(names, in_refs)
        d = pl.program_id(0)
        q = pl.program_id(1)
        tp = g("p_t")[:, :, None]
        e = g("ext")[0]
        if lean:
            pinv_t = g("t_pinv")[:, :, None]
            rm = g("t_rmod")[:, :, None]
            rs = g("t_rshoup")[:, :, None]
            term = mul_mod(e, g("ksk")[0, 0], tp, pinv_t, rm, rs)
        else:
            term = shoup_mul(e, g("ksk")[0, 0], g("ksk_sh")[0, 0], tp)

        @pl.when(d == 0)
        def _():
            acc[pl.ds(q, 1)] = term[None]

        @pl.when(d > 0)
        def _():
            acc[pl.ds(q, 1)] = add_mod(acc[pl.ds(q, 1)], term[None],
                                       tp[None])

        @pl.when(jnp.logical_and(d == dnum - 1, q == 1))
        def _():
            a = acc[...]
            q_sl = slice(None, nl)
            s_sl = slice(nl, None)
            qpart = a[:, :nl]
            ppart = a[:, nl:]
            pp_coeff = _kintt(
                ppart, _t4_slice(g, s_sl),
                g("ninv_t")[s_sl][:, :, None],
                g("ninv_sh_t")[s_sl][:, :, None],
                g("p_t")[s_sl][:, :, None])
            qp = g("p_t")[q_sl][:, :, None]
            lift = jnp.stack([
                _fbc_vals(g("md_qi"), g("md_qi_sh"), g("md_conv"),
                          g("md_conv_sh"), g("md_dmod"), g("md_dmod_sh"),
                          g("md_srcq"), g("md_srcp"), pp_coeff[i], qp, n_sp)
                for i in range(2)])
            lift_ntt = _kntt(lift, _t4_slice(g, q_sl), qp)
            diff = sub_mod(qpart, lift_ntt, qp)
            out_ref[...] = shoup_mul(diff, g("pinv")[:, :, None],
                                     g("pinv_sh")[:, :, None], qp)

    def make():
        return pl.pallas_call(
            kernel,
            grid=(dnum, 2),
            in_specs=specs,
            out_specs=pl.BlockSpec((2, nl, R, _LANE),
                                   lambda d, q: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, nl, R, _LANE), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((2, n_t, R, _LANE), jnp.uint32)],
            interpret=_interpret(),
        )

    out = _cached_call("fin_grid", (nl, n_sp, dnum, lean), args.arrays,
                       make)
    return out.reshape(2, nl, n)


def ks_decompose_pallas(c_ntt, dl):
    """Pallas ks_decompose: (nl, N) -> (dnum, n_t, N), bit-exact."""
    nl, n_sp, digits = _dl_static(dl)
    n = c_ntt.shape[-1]
    R = n // _LANE
    n_t = nl + n_sp
    args = _Args()
    args.add("c", c_ntt.reshape(nl, R, _LANE))
    _add_common(args, dl, n)
    for i, dg in enumerate(dl.digits):
        _add_digit(args, f"dg{i}", dg)

    names = tuple(args.names)

    def kernel(*refs):
        g = _make_getter(names, refs[:-1])
        refs[-1][...] = _decompose_k(g, nl, n_sp, digits, g("c"))

    out = _call(kernel, args, (len(digits), n_t, R, _LANE),
                tag="dec", static_key=(nl, n_sp, digits))
    return out.reshape(len(digits), n_t, n)


def ks_finish_pallas(ext, dl, ksk_data, ksk_shoup=None, trimmed=False):
    """Pallas ks_finish: inner product + ModDown, bit-exact vs ks_finish."""
    nl, n_sp, digits = _dl_static(dl)
    dnum = len(digits)
    n = ext.shape[-1]
    R = n // _LANE
    n_t = nl + n_sp
    lean = ksk_shoup is None
    kd, ks = _trim_ksk(ksk_data, ksk_shoup, dl, trimmed)

    args = _Args()
    args.add("ext", ext.reshape(dnum, n_t, R, _LANE))
    args.add("ksk", kd.reshape(dnum, 2, n_t, R, _LANE))
    if not lean:
        args.add("ksk_sh", ks.reshape(dnum, 2, n_t, R, _LANE))
    else:
        args.add("t_pinv", dl.t_pinv.reshape(-1, 1))
        args.add("t_rmod", dl.t_rmod.reshape(-1, 1))
        args.add("t_rshoup", dl.t_rshoup.reshape(-1, 1))
    _add_common(args, dl, n)
    _add_digit(args, "md", dl.moddown)
    args.add("pinv", dl.pinv_mod_q)
    args.add("pinv_sh", dl.pinv_mod_q_shoup)

    names = tuple(args.names)

    def kernel(*refs):
        g = _make_getter(names, refs[:-1])
        refs[-1][...] = _finish_k(g, nl, n_sp, dnum, g("ext"), lean)

    out = _call(kernel, args, (2, nl, R, _LANE),
                tag="fin", static_key=(nl, n_sp, dnum, lean, trimmed))
    return out.reshape(2, nl, n)


def keyswitch_pallas(c_ntt, dl, ksk_data, ksk_shoup=None):
    """Whole fused key-switch: (nl, N) -> (2, nl, N), bit-exact."""
    nl, n_sp, digits = _dl_static(dl)
    dnum = len(digits)
    n = c_ntt.shape[-1]
    R = n // _LANE
    n_t = nl + n_sp
    lean = ksk_shoup is None
    kd, ks = _trim_ksk(ksk_data, ksk_shoup, dl, trimmed=False)

    args = _Args()
    args.add("c", c_ntt.reshape(nl, R, _LANE))
    args.add("ksk", kd.reshape(dnum, 2, n_t, R, _LANE))
    if not lean:
        args.add("ksk_sh", ks.reshape(dnum, 2, n_t, R, _LANE))
    else:
        args.add("t_pinv", dl.t_pinv.reshape(-1, 1))
        args.add("t_rmod", dl.t_rmod.reshape(-1, 1))
        args.add("t_rshoup", dl.t_rshoup.reshape(-1, 1))
    _add_common(args, dl, n)
    for i, dg in enumerate(dl.digits):
        _add_digit(args, f"dg{i}", dg)
    _add_digit(args, "md", dl.moddown)
    args.add("pinv", dl.pinv_mod_q)
    args.add("pinv_sh", dl.pinv_mod_q_shoup)

    names = tuple(args.names)

    def kernel(*refs):
        g = _make_getter(names, refs[:-1])
        ext = _decompose_k(g, nl, n_sp, digits, g("c"))
        refs[-1][...] = _finish_k(g, nl, n_sp, dnum, ext, lean)

    out = _call(kernel, args, (2, nl, R, _LANE),
                tag="ksw", static_key=(nl, n_sp, digits, lean))
    return out.reshape(2, nl, n)
