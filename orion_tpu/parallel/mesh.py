"""Multi-chip execution: mesh + shard_map over the FHE evaluator.

The reference has NO distributed execution (SURVEY §2.7) — this is
green-field TPU design.  The natural parallel axes of encrypted inference:

  * dp  — ciphertext batch (independent encrypted queries): embarrassingly
          parallel serving;
  * mp  — column blocks of a blocked linear transform (multi-ciphertext
          tensors, `lt_evaluator.py:155-197` semantics): each chip holds a
          subset of the input ciphertexts + the matching weight-diagonal
          blocks, computes partial block-row products locally (rotations and
          key-switches stay chip-local), and partial results are combined
          with an all-gather + modular reduction over ICI;
  * limb (rns) — RNS limbs are NTT-independent, so elementwise stages and
          NTTs shard freely over limbs; basis conversion needs a small
          all-gather of the per-digit z vectors (planned: round 2).

Modular accumulation across chips cannot use psum directly (integer psum
overflows the uint32 residues), so cross-chip reduction is
all_gather -> fold with add_mod.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..crypto import CKKSContext, Encoder, Evaluator, KeyChest
from ..crypto.ciphertext import Ciphertext
from ..crypto import lintrans_scan
from ..crypto.modops import add_mod
from ..crypto.keyswitch import dev_level


def build_mesh(n_devices: int):
    """Factor n devices into a (dp, mp) mesh."""
    devs = jax.devices()[:n_devices]
    mp = 1
    for cand in (4, 2):
        if n_devices % cand == 0:
            mp = cand
            break
    dp = n_devices // mp
    return Mesh(np.array(devs).reshape(dp, mp), axis_names=("dp", "mp"))


def stack_member_transforms(transforms: list):
    """Stack per-member column-block transforms for mp sharding.

    All members must share BSGS structure (same diagonal index set, n1,
    level, pt_scale) — true for the column blocks of one packed matrix —
    so only the encoded diagonal data differs per member.  Returns
    (template_transform, pts_stack (mp, n_d, L+1, N), shoup_stack).
    """
    t0 = transforms[0]
    for tr in transforms[1:]:
        if (tr.n1 != t0.n1 or tr.level != t0.level
                or tr.pt_scale != t0.pt_scale
                or tr.babies_full != t0.babies_full
                or tr.giants != t0.giants
                or tr.pts.shape != t0.pts.shape):
            raise ValueError("member transforms must share BSGS structure")
    pts = jnp.stack([tr.pts for tr in transforms])
    sh = jnp.stack([tr.pts_shoup for tr in transforms])
    return t0, pts, sh


def encrypted_dp_mp_step(ev: Evaluator, transforms: list, mesh: Mesh):
    """Build a sharded encrypted forward step.

    Input  x: uint32[B, C, 2, L, N] — B encrypted queries (dp), each a
    C-ciphertext tensor (mp).  Step: blocked matvec (one block row:
    out = sum_j T[j] @ ct_j), rescale, then an encrypted square
    (mul_relin + rescale).  Each mp member holds its OWN column block's
    encoded diagonals (sharded operand) and its column's ciphertexts;
    rotations/keyswitches are chip-local; the cross-chip combine is
    all_gather('mp') + modular fold.
    """
    from jax.experimental.shard_map import shard_map
    from dataclasses import replace

    level = transforms[0].level
    dl = dev_level(ev.ctx, level)
    qp = dl.q_p[:, None]
    scale = ev.ctx.default_scale
    template, pts_stack, sh_stack = stack_member_transforms(transforms)

    def local_block(ct_data, tr):
        ct = Ciphertext(ct_data, level, scale)
        rots = lintrans_scan.baby_rotation_cache(
            ev, ct, set(tr.babies) | {0})
        part = lintrans_scan.eval_transform_scan(ev, tr, ct, rots)
        return part.data

    def step(x, my_pts, my_sh):
        # x local shard: (B_loc, C_loc, 2, L, N); my_pts: (C_loc, ...)
        b_loc, c_loc = x.shape[0], x.shape[1]

        outs = []
        for b in range(b_loc):
            parts = []
            for c in range(c_loc):
                # each mp member applies its own column block
                tr = replace(template, pts=my_pts[c], pts_shoup=my_sh[c])
                parts.append(local_block(x[b, c], tr))
            local = parts[0]
            for p in parts[1:]:
                local = add_mod(local, p, qp)
            # combine partial block-row products across mp
            gathered = jax.lax.all_gather(local, "mp")  # (mp, 2, L, N)
            full = gathered[0]
            for i in range(1, gathered.shape[0]):
                full = add_mod(full, gathered[i], qp)
            ct = Ciphertext(full, level, scale * ev.ctx.q_primes[level])
            ct = ev.rescale(ct)
            ct = ev.mul_relin(ct, ct)  # encrypted square, relin + rescale
            outs.append(ct.data)
        return jnp.stack(outs)

    smapped = shard_map(
        step, mesh=mesh,
        in_specs=(P("dp", "mp"), P("mp"), P("mp")),
        out_specs=P("dp"),
        check_rep=False,
    )
    return lambda x: smapped(x, pts_stack, sh_stack)


def dryrun_multichip(n_devices: int) -> None:
    """Compile + run the sharded encrypted paths on tiny shapes.

    Exercises the framework's real parallel layout:
      1. dp sharding of the ciphertext batch x mp sharding of column
         blocks — each member holds ITS OWN block's encoded diagonals —
         with chip-local scanned key-switching (rotation +
         relinearisation) and an all_gather + modular-fold combine;
      2. the limb(RNS)-sharded key-switch (limbshard.py): KSK row blocks
         sharded across all chips, digit all-gather + ModDown psum,
         verified bit-exact against the single-chip path.
    """
    mesh = build_mesh(n_devices)
    dp, mp = mesh.devices.shape

    ctx = CKKSContext(logn=6, logq=[28, 26, 26], logp=[28, 28],
                      logscale=26, h=16, seed=7)
    enc = Encoder(ctx)
    keys = KeyChest(ctx)
    ev = Evaluator(ctx, keys)

    rng = np.random.default_rng(0)
    slots = ctx.slots
    # one DISTINCT column block per mp member (same diagonal index set)
    member_diags = [
        {0: rng.uniform(-0.5, 0.5, slots), 1: rng.uniform(-0.5, 0.5, slots)}
        for _ in range(mp)]
    transforms = [lintrans_scan.compile_transform_scan(
        enc, d, ctx.max_level, slots) for d in member_diags]

    # batch of dp x mp ciphertexts
    cts = []
    vals = {}
    for i in range(dp):
        row = []
        for j in range(mp):
            v = rng.uniform(-1, 1, slots)
            vals[(i, j)] = v
            pt, s = enc.encode(v)
            row.append(keys.encrypt_rns(pt).astype(np.uint32))
        cts.append(np.stack(row))
    x = jnp.asarray(np.stack(cts))  # (dp, mp, 2, L, N)

    step = encrypted_dp_mp_step(ev, transforms, mesh)
    with mesh:
        xs = jax.device_put(
            x, jax.sharding.NamedSharding(mesh, P("dp", "mp")))
        out = jax.jit(step)(xs)
        jax.block_until_ready(out)

    # correctness spot-check on the first batch element
    raw = keys.decrypt_rns(np.asarray(out[0]).astype(np.int64))
    got = enc.decode(raw, ev.ctx.default_scale)
    want = np.zeros(slots)
    for j in range(mp):
        v = vals[(0, j)]
        want += sum(vec * np.roll(v, -d)
                    for d, vec in member_diags[j].items())
    want = want ** 2
    err = float(np.max(np.abs(got - want)))
    if not np.isfinite(err) or err > 5e-2:
        raise AssertionError(f"multichip dryrun mismatch: err={err}")
    print(f"[dryrun_multichip] mesh dp={dp} mp={mp} OK, err={err:.2e}")

    # ---- limb-sharded key-switch (bit-exact vs single chip) ----
    from .limbshard import make_sharded_keyswitch
    from ..crypto.keyswitch import dev_level as _dl, keyswitch as _ks
    level = ctx.max_level          # n_t = 3 + 2 = 5 rows
    m_limb = n_devices if (3 + 2) % n_devices == 0 else (
        5 if n_devices >= 5 else 1)
    if m_limb == 1:
        # 5 rows don't split over this mesh; use a 5-limb context instead
        ctx2 = CKKSContext(logn=6, logq=[28, 26, 26, 26, 26, 26],
                           logp=[28, 28], logscale=26, h=16, seed=7)
        m_limb = n_devices if 8 % n_devices == 0 else 1
    else:
        ctx2 = ctx
    if m_limb > 1:
        keys2 = KeyChest(ctx2)
        lmesh = Mesh(np.array(jax.devices()[:m_limb]), axis_names=("limb",))
        lvl2 = ctx2.max_level
        c = np.stack([rng.integers(0, ctx2.primes[i], ctx2.n, dtype=np.int64)
                      for i in range(lvl2 + 1)]).astype(np.uint32)
        want_ks = np.asarray(_ks(c, _dl(ctx2, lvl2),
                                 keys2.relin_key.data,
                                 keys2.relin_key.shoup))
        sks = make_sharded_keyswitch(ctx2, lvl2, lmesh)
        kd, kss = sks.shard_ksk(keys2.relin_key.data,
                                keys2.relin_key.shoup, ctx2)
        got_ks = np.asarray(sks.fn(sks.pad_poly(c), kd, kss))[:, : lvl2 + 1]
        if not np.array_equal(got_ks, want_ks):
            raise AssertionError("limb-sharded keyswitch mismatch")
        print(f"[dryrun_multichip] limb-sharded keyswitch OK "
              f"(M={m_limb}, bit-exact)")
