"""Device-side hybrid key-switching, basis conversion, rescale (jnp/uint32).

Reference parity: the key-switch/rescale internals Lattigo provides beneath
`orion/backend/lattigo/evaluator.go` (MulRelin, Rotate, Rescale).  Algorithms
are the standard RNS-CKKS set (full-RNS HPS fast basis conversion with a
float32 correction term, hybrid gadget decomposition, ModDown by the special
primes), arranged so that:

  * every step is a pure jnp function of uint32 arrays -> the whole
    encrypted network forward can be traced into one XLA program;
  * the only cross-limb data movement is in basis conversion (a tiny
    contraction over <= alpha source limbs) — NTTs and pointwise ops are
    limb-local, which is what makes limb-sharding across a TPU mesh cheap
    (see orion_tpu/parallel/).

Float32 v-correction: the HPS correction term only needs to be within +-1 of
round(sum z_m / q_m); an off-by-one adds a multiple of the digit modulus,
which ModDown's division by P absorbs (standard approximate-FBC argument).
"""

from __future__ import annotations

from dataclasses import dataclass, fields
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .context import CKKSContext, DigitTables, LevelKSTables
from .modops import add_mod, mul_mod, shoup_mul, sub_mod
from .ntt import ci_intt, ci_ntt, intt, ntt


@dataclass
class DevDigit:
    src_lo: int                   # first source limb index (within Q rows)
    src_hi: int
    qhat_inv: jnp.ndarray         # (alpha, 1)
    qhat_inv_shoup: jnp.ndarray
    conv: jnp.ndarray             # (alpha, n_t, 1)
    conv_shoup: jnp.ndarray
    d_mod_t: jnp.ndarray          # (n_t, 1)
    d_mod_t_shoup: jnp.ndarray
    src_q_f32: jnp.ndarray        # (alpha, 1) float32
    src_p: jnp.ndarray            # (alpha, 1) uint32


@dataclass
class DevLevel:
    """All device tables needed to run ops at one ciphertext level."""
    level: int
    # Q-limb tables (rows 0..level)
    q_p: jnp.ndarray
    q_pinv: jnp.ndarray
    q_rmod: jnp.ndarray
    q_rshoup: jnp.ndarray
    q_tw: jnp.ndarray
    q_tw_shoup: jnp.ndarray
    q_itw: jnp.ndarray
    q_itw_shoup: jnp.ndarray
    q_ninv: jnp.ndarray
    q_ninv_shoup: jnp.ndarray
    # extended-basis tables (rows 0..level + specials)
    t_p: jnp.ndarray
    t_pinv: jnp.ndarray
    t_rmod: jnp.ndarray
    t_rshoup: jnp.ndarray
    t_tw: jnp.ndarray
    t_tw_shoup: jnp.ndarray
    # special-prime tables
    s_p: jnp.ndarray
    s_itw: jnp.ndarray
    s_itw_shoup: jnp.ndarray
    s_ninv: jnp.ndarray
    s_ninv_shoup: jnp.ndarray
    # digits + moddown + rescale constants
    digits: list[DevDigit]
    moddown: DevDigit
    pinv_mod_q: jnp.ndarray        # (l+1, 1)
    pinv_mod_q_shoup: jnp.ndarray
    one_shoup_q: jnp.ndarray       # (l+1, 1) floor(2^32/q_i) for barrett-reduce
    qlast_mod_t: jnp.ndarray       # (l, 1)
    qlast_inv: jnp.ndarray
    qlast_inv_shoup: jnp.ndarray
    qlast_half: jnp.ndarray        # scalar uint32 (q_l+1)//2
    ksk_rows: tuple                # global prime rows used by this level
    # conjugate-invariant ring: orbit index maps (None on the standard ring)
    ci_keep: jnp.ndarray | None = None
    ci_src: jnp.ndarray | None = None
    ring_n: int = 0                # stored coefficient count
    # four-step NTT tables (crypto/ntt4.py), sliced to this level's rows;
    # None when the ring is too small or ORION_TPU_NTT4=0
    q_t4: dict | None = None
    t_t4: dict | None = None
    s_t4: dict | None = None
    # fused ModDown+rescale (divide by P*q_l in one basis conversion);
    # None at level 0 or on the CI ring
    dropdown: "DevDigit | None" = None
    dqinv: jnp.ndarray | None = None
    dqinv_shoup: jnp.ndarray | None = None
    p_mod_q: jnp.ndarray | None = None
    p_mod_q_shoup: jnp.ndarray | None = None


# Registered as pytrees so the key-switch entry points can be jax.jit'ed
# with the level tables as ARGUMENTS: each (shape-signature, level
# structure) then traces ONCE process-wide instead of re-tracing its NTT
# chains at every call site — tracing dominated deep-network program
# builds (580k pjit dispatches for a tiny bootstrapped net before this).
jax.tree_util.register_dataclass(
    DevDigit,
    data_fields=[f.name for f in fields(DevDigit)
                 if f.name not in ("src_lo", "src_hi")],
    meta_fields=["src_lo", "src_hi"])

_DEVLEVEL_META = ("level", "ksk_rows", "ring_n")
jax.tree_util.register_dataclass(
    DevLevel,
    data_fields=[f.name for f in fields(DevLevel)
                 if f.name not in _DEVLEVEL_META],
    meta_fields=list(_DEVLEVEL_META))


def _dev_digit(dt: DigitTables, ctx: CKKSContext) -> DevDigit:
    src_p = np.array([ctx.primes[i] for i in dt.src_idx], np.uint32)
    return DevDigit(
        src_lo=dt.src_idx[0] if dt.src_idx[0] < ctx.n_q else 0,
        src_hi=(dt.src_idx[-1] + 1) if dt.src_idx[0] < ctx.n_q else 0,
        qhat_inv=jnp.asarray(dt.qhat_inv[:, None]),
        qhat_inv_shoup=jnp.asarray(dt.qhat_inv_shoup[:, None]),
        conv=jnp.asarray(dt.conv[:, :, None]),
        conv_shoup=jnp.asarray(dt.conv_shoup[:, :, None]),
        d_mod_t=jnp.asarray(dt.d_mod_t[:, None]),
        d_mod_t_shoup=jnp.asarray(dt.d_mod_t_shoup[:, None]),
        src_q_f32=jnp.asarray(dt.src_q[:, None]),
        src_p=jnp.asarray(src_p[:, None]),
    )


def dev_level(ctx: CKKSContext, level: int) -> DevLevel:
    import jax

    # When the jit wrapper (runtime/buffers.py) has swapped the context's
    # full NTT tables for tracers, build the per-level views INSIDE the
    # trace: the sliced tables become ops on traced arguments instead of
    # per-level baked constants (150+ MB of MLIR on a bootstrap program,
    # which the remote compiler kills).  Never cache tracer-built levels.
    tw = ctx.dev["tw"]
    if isinstance(tw, jax.core.Tracer):
        # per-trace cache keyed by the tracer's identity: one build per
        # level per trace (the swap installs a fresh tracer each trace)
        tcache = getattr(ctx, "_dev_levels_traced", None)
        if tcache is None or tcache[0] is not tw:
            tcache = ctx._dev_levels_traced = (tw, {})
        if level not in tcache[1]:
            tcache[1][level] = _build_dev_level(ctx, level, None)
        return tcache[1][level]

    cache = getattr(ctx, "_dev_levels", None)
    if cache is None:
        cache = ctx._dev_levels = {}
    if level in cache:
        return cache[level]

    with jax.ensure_compile_time_eval():
        return _build_dev_level(ctx, level, cache)


def _build_dev_level(ctx: CKKSContext, level: int,
                     cache: dict | None) -> DevLevel:
    d = ctx.dev
    lt: LevelKSTables = ctx.ks_tables[level]
    nq_rows = list(range(level + 1))
    sp_rows = list(range(ctx.n_q, ctx.n_all))
    t_rows = nq_rows + sp_rows

    def rows(arr, r):
        return arr[jnp.asarray(np.array(r, np.int32))]

    one_shoup = np.array(
        [(1 << 32) // ctx.primes[i] for i in nq_rows], np.uint32)

    out = DevLevel(
        level=level,
        q_p=rows(d["p"], nq_rows),
        q_pinv=rows(d["pinv"], nq_rows),
        q_rmod=rows(d["r_mod"], nq_rows),
        q_rshoup=rows(d["r_shoup"], nq_rows),
        q_tw=rows(d["tw"], nq_rows),
        q_tw_shoup=rows(d["tw_shoup"], nq_rows),
        q_itw=rows(d["itw"], nq_rows), q_itw_shoup=rows(d["itw_shoup"], nq_rows),
        q_ninv=rows(d["ninv"], nq_rows), q_ninv_shoup=rows(d["ninv_shoup"], nq_rows),
        t_p=rows(d["p"], t_rows),
        t_pinv=rows(d["pinv"], t_rows),
        t_rmod=rows(d["r_mod"], t_rows),
        t_rshoup=rows(d["r_shoup"], t_rows),
        t_tw=rows(d["tw"], t_rows),
        t_tw_shoup=rows(d["tw_shoup"], t_rows),
        s_p=rows(d["p"], sp_rows), s_itw=rows(d["itw"], sp_rows),
        s_itw_shoup=rows(d["itw_shoup"], sp_rows),
        s_ninv=rows(d["ninv"], sp_rows), s_ninv_shoup=rows(d["ninv_shoup"], sp_rows),
        digits=[_dev_digit(dt, ctx) for dt in lt.digits],
        moddown=_dev_digit(lt.moddown, ctx),
        pinv_mod_q=jnp.asarray(lt.pinv_mod_q[:, None]),
        pinv_mod_q_shoup=jnp.asarray(lt.pinv_mod_q_shoup[:, None]),
        one_shoup_q=jnp.asarray(one_shoup[:, None]),
        qlast_mod_t=jnp.asarray(lt.qlast_mod_t[:, None]),
        qlast_inv=jnp.asarray(lt.qlast_inv[:, None]),
        qlast_inv_shoup=jnp.asarray(lt.qlast_inv_shoup[:, None]),
        qlast_half=jnp.uint32((ctx.primes[level] + 1) // 2),
        ksk_rows=tuple(t_rows),
        ci_keep=d.get("ci_keep"),
        ci_src=d.get("ci_src"),
        ring_n=ctx.n,
    )
    if lt.dropdown is not None and d.get("ci_keep") is None:
        out.dropdown = _dev_digit(lt.dropdown, ctx)
        out.dqinv = jnp.asarray(lt.dqinv_mod_q[:, None])
        out.dqinv_shoup = jnp.asarray(lt.dqinv_mod_q_shoup[:, None])
        out.p_mod_q = jnp.asarray(lt.p_mod_q[:, None])
        out.p_mod_q_shoup = jnp.asarray(lt.p_mod_q_shoup[:, None])
    if getattr(ctx, "t4_keys", None):
        def t4_slice(r):
            idx = jnp.asarray(np.array(r, np.int32))
            return {k[3:]: d[k][idx] for k in ctx.t4_keys}
        out.q_t4 = t4_slice(nq_rows)
        out.t_t4 = t4_slice(t_rows)
        out.s_t4 = t4_slice(sp_rows)
    if cache is not None:
        cache[level] = out
    return out


def ring_ntt(a, tw, tw_shoup, p, dl: DevLevel, t4=None):
    """Forward NTT dispatching on ring type, four-step availability, and
    the fused Pallas kernel (stage-resident in VMEM) when it fits."""
    if t4 is not None:
        from .ntt4 import ntt4
        if dl.ci_keep is not None:
            from .ntt import ci_lift
            a = ci_lift(a, p)
        if _fused_enabled():
            from . import ks_pallas as kp
            out = kp.pallas_ntt4(a, t4, p)
        else:
            out = ntt4(a, t4, p)
        return out if dl.ci_keep is None else out[..., dl.ci_keep]
    if dl.ci_keep is None:
        return ntt(a, tw, tw_shoup, p)
    return ci_ntt(a, tw, tw_shoup, p, dl.ci_keep)


def ring_intt(a, itw, itw_shoup, ninv, ninv_shoup, p, dl: DevLevel, t4=None):
    """Inverse NTT dispatching (see ring_ntt)."""
    if t4 is not None:
        from .ntt4 import intt4
        if dl.ci_src is not None:
            a = a[..., dl.ci_src]
        if _fused_enabled():
            from . import ks_pallas as kp
            out = kp.pallas_intt4(a, t4, ninv, ninv_shoup, p)
        else:
            out = intt4(a, t4, ninv, ninv_shoup, p)
        return out if dl.ci_src is None else out[..., : dl.ring_n]
    if dl.ci_src is None:
        return intt(a, itw, itw_shoup, ninv, ninv_shoup, p)
    return ci_intt(a, itw, itw_shoup, ninv, ninv_shoup, p,
                   dl.ci_src, dl.ring_n)


# ------------------------------------------------------------------ #
#  Fast basis conversion                                             #
# ------------------------------------------------------------------ #

def fbc(z, dg: DevDigit, tgt_p):
    """Convert coeff-domain residues z (alpha, ..., N) in the digit's base to
    the target base (n_t, ..., N).  Approximate HPS with f32 v-correction."""
    zq = shoup_mul(z, dg.qhat_inv, dg.qhat_inv_shoup, dg.src_p)
    frac = jnp.sum(zq.astype(jnp.float32) / dg.src_q_f32, axis=0)
    v = jnp.round(frac).astype(jnp.uint32)  # in [0, alpha]
    alpha = zq.shape[0]
    acc = None
    for m in range(alpha):
        term = shoup_mul(zq[m][None], dg.conv[m], dg.conv_shoup[m], tgt_p)
        acc = term if acc is None else add_mod(acc, term, tgt_p)
    vterm = shoup_mul(v[None], dg.d_mod_t, dg.d_mod_t_shoup, tgt_p)
    return sub_mod(acc, vterm, tgt_p)


# ------------------------------------------------------------------ #
#  Key switching                                                     #
# ------------------------------------------------------------------ #

def _fused_enabled() -> bool:
    """Is the fused Pallas key-switch path (crypto/ks_pallas.py) on?

    ORION_TPU_FUSED_KS: "0" never, "1" always when supported (incl. CPU
    interpret mode — tests), default "auto" = only on accelerators.
    """
    import os
    mode = os.environ.get("ORION_TPU_FUSED_KS", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    import jax
    return jax.default_backend() != "cpu"


def _fused_ks(dl: DevLevel, ksk_bytes: int) -> bool:
    if not _fused_enabled():
        return False
    from .ks_pallas import ks_supported
    return ks_supported(dl, ksk_bytes)


def _ksk_bytes(dl: DevLevel, lean: bool) -> int:
    n_t = dl.level + 1 + int(dl.s_p.shape[0])
    return len(dl.digits) * 2 * n_t * dl.ring_n * 4 * (1 if lean else 2)


@partial(jax.jit, static_argnames=("fused",))
def _ks_decompose_jit(c_ntt, dl: DevLevel, *, fused):
    if fused:
        from . import ks_pallas as kp
        if kp.ks_supported(dl, 0):
            return kp.ks_decompose_pallas(c_ntt, dl)
        if kp.decompose_supported_grid(dl):
            return kp.ks_decompose_pallas_grid(c_ntt, dl)
    c_coeff = ring_intt(c_ntt, dl.q_itw, dl.q_itw_shoup,
                        dl.q_ninv, dl.q_ninv_shoup, dl.q_p, dl, dl.q_t4)
    exts = []
    for dg in dl.digits:
        z = c_coeff[dg.src_lo:dg.src_hi]
        exts.append(fbc(z, dg, dl.t_p[:, None]))
    # every digit's extension shares the target-basis tables, so ONE
    # batched NTT over (dnum, n_t, N) replaces dnum sequential launches —
    # 3x the rows per kernel at the shallow (MLP) regime where the
    # per-launch latency, not VPU throughput, bounds keyswitch/s
    return ring_ntt(jnp.stack(exts), dl.t_tw, dl.t_tw_shoup, dl.t_p, dl,
                    dl.t_t4)


def ks_decompose(c_ntt, dl: DevLevel):
    """Hoistable half of a key-switch: digit-decompose c and extend every
    digit to the full basis.  Returns (dnum, n_t, N) in NTT domain.

    Automorphisms commute with decomposition (they are coefficient
    permutations-with-signs, and FBC is coefficient-wise), so one
    decomposition serves every rotation of the same ciphertext — the
    hoisting trick behind fast BSGS (Lattigo parity).

    Jitted with the level tables as pytree arguments: one trace per
    (shape, level) signature process-wide.  The fused-kernel mode is a
    STATIC argument so flipping ORION_TPU_FUSED_KS cannot hit a stale
    cached trace.
    """
    return _ks_decompose_jit(c_ntt, dl, fused=_fused_enabled())


@partial(jax.jit, static_argnames=("trimmed", "fused", "raw"))
def _ks_finish_jit(ext, dl: DevLevel, ksk_data, ksk_shoup, *,
                   trimmed, fused, raw=False):
    if fused and not raw:
        from . import ks_pallas as kp
        lean = ksk_shoup is None
        if kp.ks_supported(dl, _ksk_bytes(dl, lean)):
            return kp.ks_finish_pallas(ext, dl, ksk_data, ksk_shoup, trimmed)
        if kp.finish_supported_grid(dl, lean):
            return kp.ks_finish_pallas_grid(ext, dl, ksk_data, ksk_shoup,
                                            trimmed)
    rows = None if trimmed else jnp.asarray(np.array(dl.ksk_rows, np.int32))
    tp = dl.t_p[:, None]
    acc0 = acc1 = None
    for j in range(len(dl.digits)):
        if trimmed:
            k0 = ksk_data[j, 0]
            k1 = ksk_data[j, 1]
        else:
            k0 = ksk_data[j, 0][rows]
            k1 = ksk_data[j, 1][rows]
        if ksk_shoup is not None:
            s0 = ksk_shoup[j, 0] if trimmed else ksk_shoup[j, 0][rows]
            s1 = ksk_shoup[j, 1] if trimmed else ksk_shoup[j, 1][rows]
            t0 = shoup_mul(ext[j], k0, s0, tp)
            t1 = shoup_mul(ext[j], k1, s1, tp)
        else:
            pinv = dl.t_pinv[:, None]
            rm, rs = dl.t_rmod[:, None], dl.t_rshoup[:, None]
            t0 = mul_mod(ext[j], k0, tp, pinv, rm, rs)
            t1 = mul_mod(ext[j], k1, tp, pinv, rm, rs)
        if acc0 is None:
            acc0, acc1 = t0, t1
        else:
            acc0 = add_mod(acc0, t0, tp)
            acc1 = add_mod(acc1, t1, tp)
    if raw:
        # pre-ModDown accumulator in the extended basis: the caller fuses
        # ModDown with rescale (mod_drop_rescale) after folding in the
        # ciphertext part
        return jnp.stack([acc0, acc1])
    out0 = mod_down(acc0, dl)
    out1 = mod_down(acc1, dl)
    return jnp.stack([out0, out1])


def ks_finish(ext, dl: DevLevel, ksk_data, ksk_shoup=None, trimmed=False):
    """Inner-product the decomposed digits with a KSK and ModDown.

    ext: (dnum, n_t, N); ksk arrays: (dnum_full, 2, n_all, N), or — with
    trimmed=True — already sliced to this level's digits and prime rows
    (dnum, 2, n_t, N), the level-aware KeyPack layout that keeps low-level
    rotation keys small in HBM.
    With ksk_shoup=None (lean-key mode) the product uses a Montgomery lift
    instead of precomputed Shoup companions — ~2.5x more multiplies in the
    inner product (a small share of a key-switch) for HALF the key HBM.
    Returns (2, level+1, N) in NTT domain.  Jitted per signature (see
    ks_decompose).
    """
    return _ks_finish_jit(ext, dl, ksk_data, ksk_shoup,
                          trimmed=trimmed, fused=_fused_enabled())


def keyswitch_lean(c_ntt, dl: DevLevel, ksk_data):
    return ks_finish(ks_decompose(c_ntt, dl), dl, ksk_data, None)


def keyswitch(c_ntt, dl: DevLevel, ksk_data, ksk_shoup):
    """Switch poly c (level+1, N, NTT domain) with a hybrid KSK."""
    if _fused_ks(dl, _ksk_bytes(dl, ksk_shoup is None)):
        from .ks_pallas import keyswitch_pallas
        return keyswitch_pallas(c_ntt, dl, ksk_data, ksk_shoup)
    # larger levels: decompose/finish dispatch to the grid-streaming
    # kernels individually when they fit
    return ks_finish(ks_decompose(c_ntt, dl), dl, ksk_data, ksk_shoup)


def ks_finish_raw(ext, dl: DevLevel, ksk_data, ksk_shoup=None,
                  trimmed=False):
    """Inner product WITHOUT ModDown: (2, n_t, N) extended-basis acc."""
    return _ks_finish_jit(ext, dl, ksk_data, ksk_shoup,
                          trimmed=trimmed, fused=False, raw=True)


def mod_drop_rescale(acc, dl: DevLevel):
    """Divide (..., n_t, N) NTT acc by P*q_l in ONE basis conversion.

    Returns (..., level, N): the fused ModDown+rescale epilogue.  One
    iNTT over the (n_sp+1) divisor rows + one FBC + one NTT over the
    (level) surviving rows replaces ModDown's full round trip followed by
    rescale's second one.  Approximation: plain HPS conversion of the
    divisor-row residues (same argument as mod_down — the error is a
    small integer over P*q_l, i.e. far below the noise floor added by
    the keyswitch itself; rescale's centered rounding is subsumed).
    """
    if acc.ndim > 2:
        # fbc contracts over a leading source-limb axis and so does not
        # broadcast over batch dims — unroll the (small) leading axis
        return jnp.stack([mod_drop_rescale(acc[i], dl)
                          for i in range(acc.shape[0])])
    lvl = dl.level
    div = jnp.concatenate([acc[..., lvl + 1:, :], acc[..., lvl:lvl + 1, :]],
                          axis=-2)          # [specials..., q_l] rows
    itw = jnp.concatenate([dl.s_itw, dl.q_itw[lvl:lvl + 1]])
    itw_sh = jnp.concatenate([dl.s_itw_shoup, dl.q_itw_shoup[lvl:lvl + 1]])
    ninv = jnp.concatenate([dl.s_ninv, dl.q_ninv[lvl:lvl + 1]])
    ninv_sh = jnp.concatenate([dl.s_ninv_shoup,
                               dl.q_ninv_shoup[lvl:lvl + 1]])
    pdiv = jnp.concatenate([dl.s_p, dl.q_p[lvl:lvl + 1]])
    t4 = None
    if dl.s_t4 is not None and dl.q_t4 is not None:
        t4 = {k: jnp.concatenate([dl.s_t4[k], dl.q_t4[k][lvl:lvl + 1]])
              for k in dl.s_t4}
    z = ring_intt(div, itw, itw_sh, ninv, ninv_sh, pdiv, dl, t4)
    lift = fbc(z, dl.dropdown, dl.q_p[:lvl, None])
    q_t4 = ({k: v[:lvl] for k, v in dl.q_t4.items()}
            if dl.q_t4 is not None else None)
    lift_ntt = ring_ntt(lift, dl.q_tw[:lvl], dl.q_tw_shoup[:lvl],
                        dl.q_p[:lvl], dl, q_t4)
    diff = sub_mod(acc[..., :lvl, :], lift_ntt, dl.q_p[:lvl, None])
    return shoup_mul(diff, dl.dqinv, dl.dqinv_shoup, dl.q_p[:lvl, None])


def mod_down(x, dl: DevLevel):
    """Divide an extended-basis poly (n_q_rows + n_p, N, NTT) by P -> Q base."""
    lvl = dl.level
    qpart = x[: lvl + 1]
    ppart = x[lvl + 1:]
    pp_coeff = ring_intt(ppart, dl.s_itw, dl.s_itw_shoup,
                         dl.s_ninv, dl.s_ninv_shoup, dl.s_p, dl, dl.s_t4)
    lift = fbc(pp_coeff, dl.moddown, dl.q_p[:, None])
    lift_ntt = ring_ntt(lift, dl.q_tw, dl.q_tw_shoup, dl.q_p, dl, dl.q_t4)
    diff = sub_mod(qpart, lift_ntt, dl.q_p[:, None])
    return shoup_mul(diff, dl.pinv_mod_q, dl.pinv_mod_q_shoup, dl.q_p[:, None])


# ------------------------------------------------------------------ #
#  Rescale                                                           #
# ------------------------------------------------------------------ #

@jax.jit
def rescale_poly(c, dl: DevLevel):
    """Drop the last limb of c (..., level+1, N, NTT) with centered rounding.

    Returns (..., level, N).  Caller adjusts level/scale metadata.
    Jitted per (shape, level) signature — see ks_decompose.
    """
    lvl = dl.level
    last_ntt = c[..., lvl: lvl + 1, :]

    def t4sl(sl):
        return ({k: v[sl] for k, v in dl.q_t4.items()}
                if dl.q_t4 is not None else None)

    # single-limb iNTT using the last Q row's tables
    last = ring_intt(last_ntt, dl.q_itw[lvl:], dl.q_itw_shoup[lvl:],
                     dl.q_ninv[lvl:], dl.q_ninv_shoup[lvl:],
                     dl.q_p[lvl:], dl, t4sl(slice(lvl, None)))[..., 0, :]
    # centered lift of `last` into each remaining modulus
    red = shoup_mul(last[..., None, :], jnp.uint32(1),
                    dl.one_shoup_q[:lvl], dl.q_p[: lvl, None])
    v = (last >= dl.qlast_half)[..., None, :]
    y = sub_mod(red, jnp.where(v, dl.qlast_mod_t, jnp.uint32(0)),
                dl.q_p[: lvl, None])
    y_ntt = ring_ntt(y, dl.q_tw[:lvl], dl.q_tw_shoup[:lvl],
                     dl.q_p[:lvl], dl, t4sl(slice(None, lvl)))
    diff = sub_mod(c[..., :lvl, :], y_ntt, dl.q_p[: lvl, None])
    return shoup_mul(diff, dl.qlast_inv, dl.qlast_inv_shoup,
                     dl.q_p[: lvl, None])
