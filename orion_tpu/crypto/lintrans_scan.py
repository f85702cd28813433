"""Scan-based BSGS linear transforms: compact XLA programs.

The naive BSGS loop (lintrans.py) inlines one key-switch per rotation into
the traced program; a ResNet-scale circuit would be millions of HLO ops
(SURVEY hard part #4).  Here the rotation loop is a `lax.scan` whose body
contains ONE key-switch; per-step inputs (automorphism permutation, stacked
rotation keys, encoded diagonals) are scanned arrays, so the program size
is O(one keyswitch) regardless of the rotation count.

Structure per transform (diag idx = g*n1 + b):
  1. baby scan   : rot_b(ct) for every needed b      (keyswitch per step)
  2. diag scan   : acc[g] += pt_d * rot[b_pos(d)]    (pure VPU)
  3. giant scan  : out += rot_{g*n1}(acc[g])         (keyswitch per step)

Rotation keys for a set of amounts are stacked once and cached per unique
amount-tuple (KeyPack) — fc-layers sharing a BSGS shape share key memory.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .ciphertext import Ciphertext, Plaintext
from .keyswitch import (dev_level, keyswitch, ks_decompose, ks_finish,
                        ks_finish_raw, mod_drop_rescale)
from .modops import add_mod, shoup_mul
from .ops import Evaluator


def _defer_moddown(dl) -> bool:
    """Blocked transforms accumulate giant rotations in the EXTENDED basis
    and ModDown+rescale once per output row (mod_drop_rescale) instead of
    running a full ModDown inside every giant step and a rescale after —
    (n_giants*n_cols + 1) NTT round trips become n_giants*0 + 1.
    ORION_TPU_DEFER_MODDOWN=0 falls back; requires the fused drop tables
    (standard ring, level >= 1)."""
    import os
    if os.environ.get("ORION_TPU_DEFER_MODDOWN", "1") == "0":
        return False
    return dl.dropdown is not None


@dataclass
class KeyPack:
    """Stacked galois keys + NTT-domain permutations for rotation amounts.

    Keys are stored PRE-PERMUTED by the inverse automorphism, so a rotation
    becomes: inner-product the (hoisted, unpermuted) decomposition with the
    pre-permuted key, ModDown, then apply ONE small permutation to the
    result:  rot_b(ct) = tau_b(c0 + MD(sum_j D_j tau_b^-1(k_j))).
    This moves the gather off the large decomposition (dnum x n_t x N) onto
    the (2 x L x N) output — the Lattigo-style hoisted-rotation layout.
    """
    amounts: tuple
    perms: jnp.ndarray       # (n, N) int32 — forward permutation tau_b
    ksk: jnp.ndarray         # (n, dnum, 2, n_all, N) uint32, tau_b^-1-applied
    ksk_shoup: jnp.ndarray
    level: int | None = None  # if set, ksk is trimmed to this level's rows
    cache_key: tuple = None


def build_key_pack(ev: Evaluator, amounts, level: int | None = None) -> KeyPack:
    """Stack keys for the given rotation amounts (cached on the evaluator).

    With `level` given, keys are TRIMMED to that level's digit count and
    prime rows — (dnum_l, 2, level+1+n_sp, N) instead of the full-chain
    (dnum, 2, n_all, N) — which is the dominant HBM saving for deep
    bootstrapped networks whose layers run far below the chain top.

    With ev.lean_keys the Shoup companions are dropped (ksk_shoup=None) and
    evaluation lifts via Montgomery — half the key HBM for deep chains.
    """
    amounts = tuple(sorted(set(int(a) % ev.ctx.slots for a in amounts)
                           - {0}))
    key = (amounts, level)
    cache = getattr(ev, "_key_packs", None)
    if cache is None:
        cache = ev._key_packs = {}
    if key in cache:
        return cache[key]
    two_n = ev.ctx.gal_mod
    lean = bool(getattr(ev, "lean_keys", False))
    if level is not None:
        from .keyswitch import dev_level
        dl = dev_level(ev.ctx, level)
        dnum_l = len(dl.digits)
        rows = np.array(dl.ksk_rows, np.int32)

    from . import placement
    if placement.HOST_COMPILE:
        # stream mode: the whole pack is assembled in host numpy — no
        # eager device gathers over the tunnel, no device residency; the
        # per-module jit receives these as call arguments (buffers.py)
        perms, ks, kss = [], [], []
        for a in amounts:
            k = ev.ctx.galois_element(a)
            gk = ev.keys.galois_key(k)
            perms.append(np.asarray(ev.ctx.automorphism_perm(k)))
            inv_perm = np.asarray(
                ev.ctx.automorphism_perm(pow(k, -1, two_n)))
            kd = np.asarray(gk.data)
            ksd = None if lean else np.asarray(gk.shoup)
            if level is not None:
                kd = np.take(kd[:dnum_l], rows, axis=2)
                if not lean:
                    ksd = np.take(ksd[:dnum_l], rows, axis=2)
            ks.append(kd[..., inv_perm])
            if not lean:
                kss.append(ksd[..., inv_perm])
        pack = KeyPack(
            amounts=amounts,
            perms=jnp.asarray(np.stack(perms)),
            ksk=np.ascontiguousarray(np.stack(ks)),
            ksk_shoup=None if lean else np.ascontiguousarray(np.stack(kss)),
            level=level,
            cache_key=key,
        )
        cache[key] = pack
        return pack

    # caches must hold concrete arrays even when first touched under jit
    with jax.ensure_compile_time_eval():
        perms, ks, kss = [], [], []
        for a in amounts:
            k = ev.ctx.galois_element(a)
            gk = ev.keys.galois_key(k)
            perms.append(ev.ctx.automorphism_perm(k))
            inv_perm = jnp.asarray(
                ev.ctx.automorphism_perm(pow(k, -1, two_n)))
            kd, ksd = gk.data, gk.shoup
            if level is not None:
                kd = jnp.take(kd[:dnum_l], rows, axis=2)
                if not lean:
                    ksd = jnp.take(ksd[:dnum_l], rows, axis=2)
            ks.append(kd[..., inv_perm])
            if not lean:
                kss.append(ksd[..., inv_perm])
        pack = KeyPack(
            amounts=amounts,
            perms=jnp.asarray(np.stack(perms)),
            ksk=jnp.stack(ks),
            ksk_shoup=None if lean else jnp.stack(kss),
            level=level,
            cache_key=key,
        )
    cache[key] = pack
    return pack


def rotate_scan(ev: Evaluator, ct: Ciphertext, pack: KeyPack):
    """All rotations of ct for the pack's amounts via one scanned keyswitch.

    The expensive digit decomposition (iNTT + basis conversion + NTTs) is
    HOISTED: computed once for the ciphertext and permuted per rotation
    inside the scan (automorphisms commute with decomposition).

    Returns uint32 (n_amounts, 2, L, N); amounts follow pack.amounts order.
    """
    if not pack.amounts:
        return jnp.zeros((0,) + ct.data.shape, jnp.uint32)
    if pack.level is not None and pack.level != ct.level:
        raise ValueError(
            f"KeyPack trimmed to level {pack.level} used at level {ct.level}")
    dl = dev_level(ev.ctx, ct.level)
    qp = dl.q_p[:, None]
    ext = ks_decompose(ct.data[1], dl)  # shared across all rotations
    lean = pack.ksk_shoup is None
    trimmed = pack.level is not None

    def body(_, inp):
        if lean:
            perm, kd = inp
            kds = None
        else:
            perm, kd, kds = inp
        # keys are pre-inverse-permuted
        ks = ks_finish(ext, dl, kd, kds, trimmed=trimmed)
        t0 = add_mod(ct.data[0], ks[0], qp)
        rot = jnp.stack([t0, ks[1]])[..., perm]
        return None, rot

    xs = ((pack.perms, pack.ksk) if lean
          else (pack.perms, pack.ksk, pack.ksk_shoup))
    _, rots = jax.lax.scan(body, None, xs)
    return rots


@dataclass
class ScanTransform:
    """One compiled (slots x slots) block in scan form."""
    level: int
    n1: int
    pt_scale: float
    pts: jnp.ndarray         # (n_d, L+1, N) uint32, pre-rotated by -g*n1
    pts_shoup: jnp.ndarray
    b_pos: jnp.ndarray       # (n_d,) int32: index into the baby-rot stack
    g_pos: jnp.ndarray       # (n_d,) int32: index into the giant accumulator
    babies_full: tuple       # distinct baby values in b_pos order (may incl 0)
    babies: tuple            # baby rotation amounts needed (excluding 0)
    giants: tuple            # giant rotation amounts per accumulator row
    n_giants: int


def compile_transform_scan(encoder, diagonals, level, slots,
                           bsgs_ratio=2.0, pt_scale=None) -> ScanTransform:
    """pt_scale overrides the plaintext encoding scale (default: q_level,
    the errorless-rescale choice).  Bootstrapping's StC stages use
    q_level / 2^(s/stages) to absorb the EvalMod scale boost."""
    from .lintrans import choose_n1
    ql = float(pt_scale) if pt_scale is not None else float(
        encoder.ctx.q_primes[level])
    n1 = choose_n1(len(diagonals), slots, bsgs_ratio)

    entries = []
    for idx, vec in diagonals.items():
        g, b = divmod(int(idx) % slots, n1)
        v = np.asarray(vec)
        dtype = np.complex128 if np.iscomplexobj(v) else np.float64
        v = v.astype(dtype)
        if v.shape[0] != slots:
            pad = np.zeros(slots, dtype=dtype)
            pad[: v.shape[0]] = v
            v = pad
        entries.append((g, b, np.roll(v, g * n1)))

    giants = sorted({g for g, _, _ in entries})
    babies = sorted({b for _, b, _ in entries})
    g_index = {g: i for i, g in enumerate(giants)}
    b_index = {b: i for i, b in enumerate(babies)}

    vecs = np.stack([v for _, _, v in entries])
    data, shoup, _ = encoder.encode_batch(vecs, level=level, scale=ql,
                                          with_shoup=True)
    b_pos = [b_index[b] for _, b, _ in entries]
    g_pos = [g_index[g] for g, _, _ in entries]

    from . import placement
    return ScanTransform(
        level=level, n1=n1, pt_scale=ql,
        pts=placement.buffer(data.astype(np.uint32)),
        pts_shoup=placement.buffer(shoup),
        b_pos=jnp.asarray(np.array(b_pos, np.int32)),
        g_pos=jnp.asarray(np.array(g_pos, np.int32)),
        babies_full=tuple(babies),
        babies=tuple(b for b in babies if b != 0),
        giants=tuple(g * n1 for g in giants),
        n_giants=len(giants),
    )


def eval_transform_scan(ev: Evaluator, tr: ScanTransform, ct: Ciphertext,
                        rots_cache: dict) -> Ciphertext:
    """Evaluate one block given a shared baby-rotation cache for this ct.

    rots_cache maps baby amount -> uint32 (2, L, N); amount 0 is the ct.
    Returns the UN-rescaled accumulated ciphertext at scale Delta*q_level.
    """
    if ct.level > tr.level:
        raise ValueError(
            f"transform compiled at level {tr.level} fed a level-{ct.level} "
            f"ciphertext; align with mod_drop first")
    dl = dev_level(ev.ctx, ct.level)
    qp = dl.q_p[:, None]
    nl = ct.level + 1

    # baby stack exactly in compile-time b_index order
    rot_stack = jnp.stack([rots_cache[b] for b in tr.babies_full])

    pts = tr.pts[:, :nl]
    pts_sh = tr.pts_shoup[:, :nl]

    def diag_body(acc, inp):
        pt, pt_sh, bp, gp = inp
        rot = rot_stack[bp]
        prod = shoup_mul(rot, pt[None], pt_sh[None], qp)
        acc = acc.at[gp].set(add_mod(acc[gp], prod, qp))
        return acc, None

    acc0 = jnp.zeros((tr.n_giants, 2, nl, ct.data.shape[-1]), jnp.uint32)
    acc, _ = jax.lax.scan(diag_body, acc0,
                          (pts, pts_sh, tr.b_pos, tr.g_pos))

    # giant rotations: rotate acc[i] by giants[i] and sum
    out = None
    nonzero_giants = [(i, a) for i, a in enumerate(tr.giants) if a != 0]
    if tr.giants and tr.giants[0] == 0:
        out = acc[0]
    if nonzero_giants:
        pack = build_key_pack(ev, [a for _, a in nonzero_giants],
                              level=ct.level)
        amount_to_slot = {a: s for s, a in enumerate(pack.amounts)}

        lean = pack.ksk_shoup is None
        trimmed = pack.level is not None

        def giant_body(carry, inp):
            if lean:
                acc_i, perm, kd = inp
                kds = None
            else:
                acc_i, perm, kd, kds = inp
            ks = ks_finish(ks_decompose(acc_i[1], dl), dl, kd, kds,
                           trimmed=trimmed)
            t0 = add_mod(acc_i[0], ks[0], qp)
            rot = jnp.stack([t0, ks[1]])[..., perm]
            return add_mod(carry, rot, qp), None

        idx = jnp.asarray(np.array(
            [amount_to_slot[a] for _, a in nonzero_giants], np.int32))
        sel = jnp.asarray(np.array([i for i, _ in nonzero_giants], np.int32))
        carry0 = out if out is not None else jnp.zeros_like(acc[0])
        xs = ((acc[sel], pack.perms[idx], pack.ksk[idx]) if lean
              else (acc[sel], pack.perms[idx], pack.ksk[idx],
                    pack.ksk_shoup[idx]))
        out, _ = jax.lax.scan(giant_body, carry0, xs)
    if out is None:
        raise ValueError("empty transform")
    return Ciphertext(out, ct.level, ct.scale * tr.pt_scale)


def baby_rotation_cache(ev: Evaluator, ct: Ciphertext,
                        amounts) -> dict:
    """rot_b(ct) for all amounts (shared across blocks in a row/column)."""
    amounts = sorted(set(int(a) for a in amounts))
    cache = {0: ct.data}
    todo = [a for a in amounts if a != 0]
    if todo:
        pack = build_key_pack(ev, todo, level=ct.level)
        rots = rotate_scan(ev, ct, pack)
        for slot, a in enumerate(pack.amounts):
            cache[a] = rots[slot]
    return cache


def eval_transform_scan_ext(ev: Evaluator, tr: ScanTransform,
                            ct: Ciphertext, rots_cache: dict):
    """eval_transform_scan with DEFERRED ModDown: returns the extended-basis
    accumulator uint32 (2, n_t, N) in NTT domain, Q-basis contributions
    folded in as P*x.  The caller sums accumulators across column blocks
    and divides ONCE by P*q_l (mod_drop_rescale) per output row.
    """
    if ct.level > tr.level:
        raise ValueError(
            f"transform compiled at level {tr.level} fed a level-{ct.level} "
            f"ciphertext; align with mod_drop first")
    dl = dev_level(ev.ctx, ct.level)
    qp = dl.q_p[:, None]
    tp = dl.t_p[:, None]
    nl = ct.level + 1
    n_t = nl + int(dl.s_p.shape[0])
    n = ct.data.shape[-1]

    rot_stack = jnp.stack([rots_cache[b] for b in tr.babies_full])
    pts = tr.pts[:, :nl]
    pts_sh = tr.pts_shoup[:, :nl]

    def diag_body(acc, inp):
        pt, pt_sh, bp, gp = inp
        rot = rot_stack[bp]
        prod = shoup_mul(rot, pt[None], pt_sh[None], qp)
        acc = acc.at[gp].set(add_mod(acc[gp], prod, qp))
        return acc, None

    acc0 = jnp.zeros((tr.n_giants, 2, nl, n), jnp.uint32)
    acc, _ = jax.lax.scan(diag_body, acc0,
                          (pts, pts_sh, tr.b_pos, tr.g_pos))

    def fold_q(x_q):
        """Q-basis (2, nl, N) value -> extended accumulator as P*x."""
        px = shoup_mul(x_q, dl.p_mod_q, dl.p_mod_q_shoup, qp)
        pad = jnp.zeros((2, n_t - nl, n), jnp.uint32)
        return jnp.concatenate([px, pad], axis=1)

    out = None
    nonzero_giants = [(i, a) for i, a in enumerate(tr.giants) if a != 0]
    if tr.giants and tr.giants[0] == 0:
        out = fold_q(acc[0])
    if nonzero_giants:
        pack = build_key_pack(ev, [a for _, a in nonzero_giants],
                              level=ct.level)
        amount_to_slot = {a: s for s, a in enumerate(pack.amounts)}
        lean = pack.ksk_shoup is None
        trimmed = pack.level is not None

        def giant_body(carry, inp):
            if lean:
                acc_i, perm, kd = inp
                kds = None
            else:
                acc_i, perm, kd, kds = inp
            raw = ks_finish_raw(ks_decompose(acc_i[1], dl), dl, kd, kds,
                                trimmed=trimmed)
            # fold the c0 part (Q basis) in as P*c0; special rows of P*c0
            # vanish (P = 0 mod each special prime)
            pc0 = shoup_mul(acc_i[0], dl.p_mod_q, dl.p_mod_q_shoup, qp)
            r0 = jnp.concatenate([add_mod(raw[0, :nl], pc0, qp),
                                  raw[0, nl:]], axis=0)
            rot = jnp.stack([r0, raw[1]])[..., perm]
            return add_mod(carry, rot, tp), None

        idx = jnp.asarray(np.array(
            [amount_to_slot[a] for _, a in nonzero_giants], np.int32))
        sel = jnp.asarray(np.array([i for i, _ in nonzero_giants], np.int32))
        carry0 = out if out is not None else jnp.zeros((2, n_t, n),
                                                       jnp.uint32)
        xs = ((acc[sel], pack.perms[idx], pack.ksk[idx]) if lean
              else (acc[sel], pack.perms[idx], pack.ksk[idx],
                    pack.ksk_shoup[idx]))
        out, _ = jax.lax.scan(giant_body, carry0, xs)
    if out is None:
        raise ValueError("empty transform")
    return out


def eval_transform_blocked_scan(ev: Evaluator, grid: dict,
                                cts: list[Ciphertext],
                                num_rows: int) -> list[Ciphertext]:
    """Blocked transform with the scan path (lt_evaluator semantics:
    accumulate column blocks, ONE rescale per output row)."""
    num_cols = len(cts)
    # align inputs to the compiled transform level (the reference's
    # backend inserts ModDrops before every op, `heongpu/bindings.py`
    # level/depth alignment); a bootstrap-refreshed ciphertext can arrive
    # above the solver-assigned layer level and the drop is free
    col_level = {}
    for (i, j), tr in grid.items():
        col_level[j] = min(col_level.get(j, tr.level), tr.level)
    cts = [ev.mod_drop(c, col_level[j]) if c.level > col_level.get(j, c.level)
           else c for j, c in enumerate(cts)]
    babies_per_col = {j: set() for j in range(num_cols)}
    for (i, j), tr in grid.items():
        babies_per_col[j] |= set(tr.babies) | {0}
    rot_caches = {
        j: baby_rotation_cache(ev, cts[j], babies_per_col[j])
        for j in range(num_cols)
    }

    levels = {c.level for c in cts}
    scales = {c.level: c.scale for c in cts}
    if len(levels) == 1:
        lvl = cts[0].level
        dl = dev_level(ev.ctx, lvl)
        if _defer_moddown(dl) and lvl >= 1:
            # deferred path: per (row, col) the giants accumulate in the
            # extended basis; column blocks sum there too; ONE fused
            # ModDown+rescale per output row replaces a ModDown inside
            # every giant step plus the final rescale
            tp = dl.t_p[:, None]
            pt_scale = next(iter(grid.values())).pt_scale
            outs = []
            for i in range(num_rows):
                acc = None
                for j in range(num_cols):
                    tr = grid.get((i, j))
                    if tr is None:
                        continue
                    part = eval_transform_scan_ext(ev, tr, cts[j],
                                                   rot_caches[j])
                    acc = part if acc is None else add_mod(acc, part, tp)
                data = mod_drop_rescale(acc, dl)
                outs.append(Ciphertext(
                    data, lvl - 1,
                    cts[0].scale * pt_scale / ev.ctx.q_primes[lvl]))
            return outs

    outs = []
    for i in range(num_rows):
        acc = None
        for j in range(num_cols):
            tr = grid.get((i, j))
            if tr is None:
                continue
            part = eval_transform_scan(ev, tr, cts[j], rot_caches[j])
            acc = part if acc is None else ev.add(acc, part)
        outs.append(ev.rescale(acc))
    return outs
