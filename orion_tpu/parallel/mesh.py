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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
    from jax import shard_map
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
        check_vma=False,
    )
    return lambda x: smapped(x, pts_stack, sh_stack)


def dryrun_model_mesh(n_devices: int) -> None:
    """fit -> compile -> encrypt -> SHARDED forward -> decrypt on a mesh.

    Runs a real compiled network (the full pipeline of
    `runtime/scheme.py`, not a hand-assembled step) over a (dp, limb)
    mesh via `runtime.mesh.make_sharded_forward`: the encrypted-query
    batch is sharded over dp and the RNS-limb axis of every ciphertext
    over limb, so every key-switch/NTT in the circuit executes
    limb-sharded under XLA SPMD.  Asserts decrypted MAE vs cleartext.
    """
    import orion_tpu.nn as on
    from ..runtime.scheme import Scheme
    from ..runtime.mesh import make_sharded_forward, encrypt_batch

    limb = 2 if n_devices % 2 == 0 else 1
    dp = n_devices // limb
    mesh = Mesh(np.array(jax.devices()[:n_devices]).reshape(dp, limb),
                axis_names=("dp", "limb"))

    class TinyMLP(on.Module):
        def __init__(self):
            super().__init__()
            self.flatten = on.Flatten()
            self.fc1 = on.Linear(16, 8)
            self.act1 = on.Quad()
            self.fc2 = on.Linear(8, 4)

        def forward(self, x):
            return self.fc2(self.act1(self.fc1(self.flatten(x))))

    scheme = Scheme().init_scheme(dict(
        ckks_params=dict(LogN=8, LogQ=[29, 26, 26, 26], LogP=[29, 29],
                         LogScale=26, H=64),
        orion=dict(margin=2, embedding_method="hybrid", backend="tpu",
                   fuse_modules=True, debug=False, io_mode="none"),
    ))
    rng = np.random.default_rng(0)
    # list of batch-1 samples => compiled (served) batch size is 1
    fit_data = [rng.uniform(-1, 1, (1, 1, 4, 4)).astype(np.float32)
                for _ in range(32)]

    net = TinyMLP()
    net.eval()
    queries = [rng.uniform(-1, 1, (1, 1, 4, 4)).astype(np.float32)
               for _ in range(dp)]
    clear = [np.asarray(net(q)).reshape(-1) for q in queries]

    scheme.fit(net, fit_data, batch_size=16)
    input_level = scheme.compile(net)
    net.he()

    batch = encrypt_batch(scheme, queries, input_level)
    fwd = make_sharded_forward(net, scheme, mesh)
    outs = fwd(batch)
    errs = []
    for want, out in zip(clear, outs):
        got = np.asarray(out.decrypt().decode()).reshape(-1)[: want.size]
        errs.append(float(np.max(np.abs(got - want))))
    err = max(errs)
    if not np.isfinite(err) or err > 5e-3:
        raise AssertionError(f"sharded model forward mismatch: err={err}")
    print(f"[dryrun_multichip] model forward on (dp={dp}, limb={limb}) "
          f"mesh OK, max err={err:.2e}")


def dryrun_boot_mesh(n_devices: int) -> None:
    """fit -> compile -> encrypt -> SHARDED forward of a BOOTSTRAPPED net.

    The user chain (l_eff 3) is shorter than the network depth, so the
    level solver MUST place a bootstrap; the encrypted forward then runs
    the PRODUCTION path — per-module jit programs plus the bootstrap's
    phase programs (PhaseRunner: ModRaise, sparse CtS/StC stages, EvalMod,
    recombination) — with the ciphertext's RNS-limb axis sharded over the
    mesh's `limb` axis and every compiled buffer committed replicated onto
    the mesh (scheme.pin_sharding), so each phase program executes
    limb-sharded under XLA SPMD.  (A single monolithic trace of the whole
    bootstrapped circuit is deliberately NOT used: it is exactly the
    program the phase split exists to avoid.)
    """
    import orion_tpu.nn as on
    from ..runtime.scheme import Scheme
    from ..runtime.jit import enable_module_jit

    limb = 2 if n_devices % 2 == 0 else 1
    dp = n_devices // limb
    mesh = Mesh(np.array(jax.devices()[:n_devices]).reshape(dp, limb),
                axis_names=("dp", "limb"))

    class DeepMLP(on.Module):
        def __init__(self):
            super().__init__()
            self.flatten = on.Flatten()
            self.fc1 = on.Linear(16, 8)
            self.act1 = on.Quad()
            self.fc2 = on.Linear(8, 8)
            self.act2 = on.Quad()
            self.fc3 = on.Linear(8, 4)

        def forward(self, x):
            x = self.act1(self.fc1(self.flatten(x)))
            x = self.act2(self.fc2(x))
            return self.fc3(x)

    scheme = Scheme().init_scheme(dict(
        ckks_params=dict(LogN=9, LogQ=[29, 26, 26, 26], LogP=[29, 29],
                         LogScale=26, H=64),
        boot_params=dict(CtSLevels=3, StCLevels=3, ModDegree=255, K=15),
        orion=dict(margin=2, embedding_method="hybrid", backend="tpu",
                   fuse_modules=True, debug=False, io_mode="stream"),
    ))
    rng = np.random.default_rng(5)
    fit_data = [rng.uniform(-1, 1, (1, 1, 4, 4)).astype(np.float32)
                for _ in range(16)]

    net = DeepMLP()
    net.eval()
    query = rng.uniform(-1, 1, (1, 1, 4, 4)).astype(np.float32)
    want = np.asarray(net(query)).reshape(-1)

    scheme.fit(net, fit_data, batch_size=8)
    input_level = scheme.compile(net)
    placed = [m for m in net.modules()
              if getattr(m, "post_bootstrap", None) is not None]
    if not placed:
        raise AssertionError("level solver placed no bootstrap")
    net.he()

    # production runners (per-module programs + bootstrap phase programs),
    # with buffers committed replicated on the mesh and the ct's limb axis
    # sharded: every program - including each bootstrap phase - runs SPMD
    enable_module_jit(scheme)
    scheme.pin_sharding = NamedSharding(mesh, P())
    ct = scheme.encrypt(scheme.encode(query, input_level))
    limb_sh = NamedSharding(mesh, P(None, "limb", None))
    from dataclasses import replace
    ct.cts = [replace(c, data=jax.device_put(c.data, limb_sh))
              for c in ct.cts]
    out = net(ct)
    got = np.asarray(out.decrypt().decode()).reshape(-1)[: want.size]
    err = float(np.max(np.abs(got - want)))
    if not np.isfinite(err) or err > 5e-3:
        raise AssertionError(f"sharded bootstrapped forward mismatch: "
                             f"err={err}")
    scheme.pin_sharding = None
    print(f"[dryrun_multichip] bootstrapped forward ({len(placed)} "
          f"bootstrap(s), phase programs) on (dp={dp}, limb={limb}) mesh "
          f"OK, max err={err:.2e}")


def dryrun_multichip(n_devices: int) -> None:
    """Compile + run the sharded encrypted paths on tiny shapes.

    Exercises the framework's real parallel layout:
      1. a COMPILED network (full fit/compile/encrypt pipeline) running
         dp x limb sharded through `runtime.mesh.make_sharded_forward`
         — batch over dp, RNS limbs (and so every key-switch) over limb;
      2. a compiled network whose plan CONTAINS A BOOTSTRAP, its whole
         ModRaise/CtS/EvalMod/StC pipeline executing inside the same
         dp x limb SPMD program (dryrun_boot_mesh);
      3. the explicit limb(RNS)-sharded key-switch (limbshard.py): KSK
         row blocks sharded across all chips, digit all-gather + ModDown
         psum, verified bit-exact against the single-chip path.
    """
    dryrun_model_mesh(n_devices)
    dryrun_boot_mesh(n_devices)

    # ---- limb-sharded key-switch (bit-exact vs single chip) ----
    from .limbshard import make_sharded_keyswitch
    from ..crypto.keyswitch import dev_level as _dl, keyswitch as _ks
    rng = np.random.default_rng(7)
    # 6 Q limbs + 2 P limbs = 8 extended-basis rows: splits over 1/2/4/8
    ctx2 = CKKSContext(logn=6, logq=[28, 26, 26, 26, 26, 26],
                       logp=[28, 28], logscale=26, h=16, seed=7)
    m_limb = n_devices if 8 % n_devices == 0 else 1
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
