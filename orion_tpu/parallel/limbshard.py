"""Limb(RNS)-sharded hybrid key-switching over a device mesh.

Green-field TPU design (the reference has no distributed execution,
SURVEY §2.7): the extended RNS basis rows (level+1 Q limbs + the special
P limbs) are block-sharded across the mesh's `limb` axis.  Each chip holds

  * 1/M of the key-switch key — the dominant HBM object
    (dnum x 2 x n_t x N words; gigabytes for deep chains), and
  * 1/M of the per-limb iNTT/FBC/NTT/inner-product work.

Communication per key-switch (the whole point of the design):

  1. ONE all-gather of the ciphertext poly in coefficient domain
     (~(level+1) x N words) so every chip can slice every digit's source
     limbs locally — the "digit all-gather" planned in keyswitch.py;
  2. ONE psum of the special-prime rows of the accumulator in coefficient
     domain (2 x n_p x N words) for the distributed ModDown.

Everything else — iNTT, fast basis conversion, NTT, the KSK inner
product, the final P-division — is local to the chip's row block.  The
moved bytes are O(L*N) while the local compute is O(dnum*L*N*(logN +
alpha)/M), so the comm:compute ratio improves as the chain deepens; on
real hardware both collectives ride ICI.

SPMD uniformity: every chip processes exactly B = n_t/M rows.  Chips
whose block contains special-prime rows carry those rows through the
Q-side arithmetic as garbage; `Q rows = global rows [:level+1]` of the
gathered output are the valid switched poly (tests check bit-exactness
against the single-chip `keyswitch`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..crypto.context import CKKSContext
from ..crypto.keyswitch import dev_level
from ..crypto.modops import add_mod, shoup_mul, sub_mod
from ..crypto.ntt import intt, ntt


def _t_rows(ctx, level):
    return np.array(list(range(level + 1))
                    + list(range(ctx.n_q, ctx.n_all)), np.int32)


@dataclass
class ShardedKS:
    """A compiled limb-sharded key-switch at one level."""
    level: int
    m: int
    block: int
    nl: int
    n_sp: int
    mesh: Mesh
    axis: str
    fn: callable            # (c_blocks, ksk_blocks, ksk_shoup_blocks) -> out
    table_args: tuple       # sharded table operands (pass after ksk)

    def pad_poly(self, c_ntt: np.ndarray) -> np.ndarray:
        """(level+1, N) poly -> (M, B, N) row blocks (zeros in special rows)."""
        n = c_ntt.shape[-1]
        full = np.zeros((self.m * self.block, n), np.uint32)
        full[: self.nl] = np.asarray(c_ntt)
        return full.reshape(self.m, self.block, n)

    def put(self, arr: np.ndarray):
        """Host array -> global device array sharded over the limb axis.

        Required in MULTI-PROCESS meshes (each process owns only its local
        devices, so a host numpy array cannot be committed to the global
        mesh implicitly); in single-process meshes it is an optimisation
        (no reshard on entry).  Dim 0 must be the M row-block axis.
        """
        sh = NamedSharding(self.mesh, P(self.axis))
        a = np.asarray(arr)
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx: a[idx])

    def shard_ksk(self, ksk_data, ksk_shoup, ctx):
        """(dnum_l, 2, n_all, N) KSK -> (M, dnum_l, 2, B, N) row blocks."""
        rows = _t_rows(ctx, self.level)
        dnum = len(dev_level(ctx, self.level).digits)
        kd = np.asarray(ksk_data)[:dnum][:, :, rows]
        kd = kd.reshape(dnum, 2, self.m, self.block, kd.shape[-1])
        kd = kd.transpose(2, 0, 1, 3, 4).copy()
        ks = np.asarray(ksk_shoup)[:dnum][:, :, rows]
        ks = ks.reshape(dnum, 2, self.m, self.block, ks.shape[-1])
        ks = ks.transpose(2, 0, 1, 3, 4).copy()
        return kd, ks


def make_sharded_keyswitch(ctx: CKKSContext, level: int, mesh: Mesh,
                           axis: str = "limb") -> ShardedKS:
    """Compile the distributed key-switch for `level` on `mesh[axis]`."""
    from jax import shard_map

    m = int(mesh.shape[axis])
    dl = dev_level(ctx, level)
    nl = level + 1
    n_sp = int(dl.s_p.shape[0])
    n_t = nl + n_sp
    if n_t % m:
        raise ValueError(
            f"extended basis has {n_t} rows; limb mesh of {m} needs m | n_t")
    b = n_t // m

    def split(arr):
        a = np.asarray(arr)
        return a.reshape((m, b) + a.shape[1:])

    trows = _t_rows(ctx, level)
    dev = ctx.dev
    # --- sharded per-chip tables (leading M axis) ---
    tabs = dict(
        p=split(np.asarray(dl.t_p)),                       # (M, B)
        tw=split(np.asarray(dl.t_tw)),
        tw_shoup=split(np.asarray(dl.t_tw_shoup)),
        itw=split(np.asarray(dev["itw"])[trows]),
        itw_shoup=split(np.asarray(dev["itw_shoup"])[trows]),
        ninv=split(np.asarray(dev["ninv"])[trows]),
        ninv_shoup=split(np.asarray(dev["ninv_shoup"])[trows]),
    )
    # per-digit FBC conv slices: (alpha, n_t, 1) -> (M, alpha, B, 1)
    dig_meta = []
    for j, dg in enumerate(dl.digits):
        conv = np.asarray(dg.conv)        # (alpha, n_t, 1)
        convs = np.asarray(dg.conv_shoup)
        tabs[f"dg{j}_conv"] = np.asarray(
            conv.reshape(conv.shape[0], m, b, 1).transpose(1, 0, 2, 3).copy())
        tabs[f"dg{j}_conv_shoup"] = np.asarray(
            convs.reshape(conv.shape[0], m, b, 1).transpose(1, 0, 2, 3).copy())
        tabs[f"dg{j}_dmod"] = split(np.asarray(dg.d_mod_t))
        tabs[f"dg{j}_dmod_shoup"] = split(np.asarray(dg.d_mod_t_shoup))
        dig_meta.append(dict(
            src_lo=dg.src_lo, src_hi=dg.src_hi,
            qhat_inv=dg.qhat_inv, qhat_inv_shoup=dg.qhat_inv_shoup,
            src_q_f32=dg.src_q_f32, src_p=dg.src_p))
    # moddown conv targets Q rows only; pad through the t-row layout
    md = dl.moddown
    md_conv = np.zeros((n_sp, n_t, 1), np.uint32)
    md_conv[:, :nl] = np.asarray(md.conv)
    md_conv_s = np.zeros((n_sp, n_t, 1), np.uint32)
    md_conv_s[:, :nl] = np.asarray(md.conv_shoup)
    md_dmod = np.zeros((n_t, 1), np.uint32)
    md_dmod[:nl] = np.asarray(md.d_mod_t)
    md_dmod_s = np.zeros((n_t, 1), np.uint32)
    md_dmod_s[:nl] = np.asarray(md.d_mod_t_shoup)
    tabs["md_conv"] = np.asarray(
        md_conv.reshape(n_sp, m, b, 1).transpose(1, 0, 2, 3).copy())
    tabs["md_conv_shoup"] = np.asarray(
        md_conv_s.reshape(n_sp, m, b, 1).transpose(1, 0, 2, 3).copy())
    tabs["md_dmod"] = split(md_dmod)
    tabs["md_dmod_shoup"] = split(md_dmod_s)
    pinv_q = np.zeros((n_t, 1), np.uint32)
    pinv_q[:nl] = np.asarray(dl.pinv_mod_q)
    pinv_q_s = np.zeros((n_t, 1), np.uint32)
    pinv_q_s[:nl] = np.asarray(dl.pinv_mod_q_shoup)
    tabs["pinv_mod_q"] = split(pinv_q)
    tabs["pinv_mod_q_shoup"] = split(pinv_q_s)
    # special-row ownership: spec_src[i] = local row of special i (else 0)
    spec_src = np.zeros((m, n_sp), np.int32)
    own_sp = np.zeros((m, n_sp), np.bool_)
    for i in range(n_sp):
        c, loc = divmod(nl + i, b)
        spec_src[c, i] = loc
        own_sp[c, i] = True
    tabs["spec_src"] = spec_src
    tabs["own_sp"] = own_sp

    names = sorted(tabs)
    # tables are created as GLOBAL arrays sharded over the limb axis: in a
    # multi-process mesh a process-local array cannot be resharded onto
    # the global mesh implicitly, and in single-process meshes this skips
    # the on-entry reshard
    _tab_sh = NamedSharding(mesh, P(axis))

    def _put(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, _tab_sh,
                                            lambda idx, _a=a: _a[idx])

    table_args = tuple(_put(tabs[k]) for k in names)
    md_meta = dict(qhat_inv=md.qhat_inv, qhat_inv_shoup=md.qhat_inv_shoup,
                   src_q_f32=md.src_q_f32, src_p=md.src_p)

    def fbc_local(z_full, meta, conv, conv_shoup, dmod, dmod_shoup, p_loc):
        """HPS conversion of full source rows onto this chip's t-rows."""
        zq = shoup_mul(z_full, meta["qhat_inv"], meta["qhat_inv_shoup"],
                       meta["src_p"])
        frac = jnp.sum(zq.astype(jnp.float32) / meta["src_q_f32"], axis=0)
        v = jnp.round(frac).astype(jnp.uint32)
        acc = None
        for i in range(zq.shape[0]):
            term = shoup_mul(zq[i][None], conv[i], conv_shoup[i], p_loc)
            acc = term if acc is None else add_mod(acc, term, p_loc)
        vterm = shoup_mul(v[None], dmod, dmod_shoup, p_loc)
        return sub_mod(acc, vterm, p_loc)

    def body(c_blk, ksk_blk, ksk_sh_blk, *tab_vals):
        # local shards carry a leading length-1 block of the sharded axis
        c_blk, ksk_blk, ksk_sh_blk = c_blk[0], ksk_blk[0], ksk_sh_blk[0]
        tl = {k: v[0] for k, v in zip(names, tab_vals)}
        p1 = tl["p"][:, None]                    # (B, 1)
        # 1. local iNTT + all-gather the Q coefficient poly
        coeff = intt(c_blk, tl["itw"], tl["itw_shoup"],
                     tl["ninv"], tl["ninv_shoup"], tl["p"])
        full = jax.lax.all_gather(coeff, axis)   # (M, B, N)
        full = full.reshape(m * b, full.shape[-1])[:nl]
        # 2. per-digit FBC -> local NTT -> KSK inner product
        acc0 = acc1 = None
        for j, meta in enumerate(dig_meta):
            z = full[meta["src_lo"]:meta["src_hi"]]
            ext = fbc_local(z, meta, tl[f"dg{j}_conv"],
                            tl[f"dg{j}_conv_shoup"], tl[f"dg{j}_dmod"],
                            tl[f"dg{j}_dmod_shoup"], p1)
            ext = ntt(ext, tl["tw"], tl["tw_shoup"], tl["p"])
            t0 = shoup_mul(ext, ksk_blk[j, 0], ksk_sh_blk[j, 0], p1)
            t1 = shoup_mul(ext, ksk_blk[j, 1], ksk_sh_blk[j, 1], p1)
            if acc0 is None:
                acc0, acc1 = t0, t1
            else:
                acc0 = add_mod(acc0, t0, p1)
                acc1 = add_mod(acc1, t1, p1)
        acc = jnp.stack([acc0, acc1])            # (2, B, N) NTT domain
        # 3. distributed ModDown: psum the owned special rows (coeff domain)
        acc_coeff = intt(acc, tl["itw"], tl["itw_shoup"],
                         tl["ninv"], tl["ninv_shoup"], tl["p"])
        picked = acc_coeff[:, tl["spec_src"]]    # (2, n_sp, N) local rows
        contrib = jnp.where(tl["own_sp"][None, :, None], picked,
                            jnp.uint32(0))
        pp = jax.lax.psum(contrib, axis)         # (2, n_sp, N) everywhere
        lift = jnp.stack([
            fbc_local(pp[i], md_meta, tl["md_conv"], tl["md_conv_shoup"],
                      tl["md_dmod"], tl["md_dmod_shoup"], p1)
            for i in range(2)])
        lift_ntt = ntt(lift, tl["tw"], tl["tw_shoup"], tl["p"])
        diff = sub_mod(acc, lift_ntt, p1)
        out = shoup_mul(diff, tl["pinv_mod_q"], tl["pinv_mod_q_shoup"], p1)
        return out                               # (2, B, N); Q rows valid

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis),) * (3 + len(table_args)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    fn = jax.jit(lambda c, kd, ks: sharded(c, kd, ks, *table_args))
    return ShardedKS(level=level, m=m, block=b, nl=nl, n_sp=n_sp,
                     mesh=mesh, axis=axis, fn=fn, table_args=table_args)
