"""CKKS bootstrapping: ModRaise -> CoeffsToSlots -> EvalMod -> SlotsToCoeffs.

Reference parity: Lattigo's `bootstrapping.Evaluator` behind
`orion/backend/lattigo/bootstrapper.go` — the capability that dominates deep
encrypted inference (`orion/core/level_dag.py:169-171`: ~95% of latency).

TPU-native structure (all device steps are jittable jnp/scan ops):
  1. ModRaise — FBC-lift the exhausted ciphertext's bottom-modulus residues
     to the full RNS chain (pure limb-local NTTs + a tiny basis conversion),
     then boost the working scale to Delta^2 with a free integer multiply —
     every subsequent key-switch injects noise 2^logscale times further
     below the signal (the 32-bit-lane equivalent of running the bootstrap
     circuit at a double-width prime scale).
  2. CtS — the inverse special-FFT butterfly chain (homdft.py) evaluated as
     grouped BSGS scan-transforms with complex diagonals; one conjugation
     splits the coefficient halves into two real-valued ciphertexts.
  3. EvalMod — Chebyshev approximation of (1/2pi(K+1)) sin(2pi(K+1) y) via
     the depth-optimal binary-splitting evaluator in hi-scale mode (two
     rescales per multiplication at the Delta^2 working scale).
  4. StC — the forward butterfly chain; recombination u + i*v is one
     complex plaintext multiplication folded into the chain's first level.

The circuit consumes its own dedicated primes appended ABOVE the user's
LogQ chain (config `boot_params`), so a bootstrap returns the ciphertext to
the top of the user chain — matching the reference solver's "refresh to
l_eff" semantics.

Value bookkeeping (x = message values, c = Delta*x + q0*I after raise):
  CtS matrices carry alpha = 0.5 * Delta / (q0 (K+1))  => u, v hold
      y = (Delta x + q0 I) / (q0 (K+1)) in [-1, 1];
  EvalMod(y) ~ Delta x / (q0 (K+1));
  StC matrices carry beta = q0 (K+1) / Delta  => output values = x.
"""

from __future__ import annotations

import math

import numpy as np

from . import homdft
from .ciphertext import Ciphertext, Plaintext
from .keyswitch import dev_level, fbc, _dev_digit
from .lintrans_scan import (baby_rotation_cache, build_key_pack,
                            compile_transform_scan, eval_transform_scan)
from .ntt import intt, ntt
from .polyeval import Polynomial, evaluate_polynomial


def fit_eval_mod(K: int, degree: int):
    """Chebyshev coefficients of (1/(2pi(K+1))) * sin(2pi(K+1) y), y in [-1,1]."""
    fn = lambda y: np.sin(2 * np.pi * (K + 1) * y) / (2 * np.pi * (K + 1))
    return np.polynomial.chebyshev.chebinterpolate(fn, degree)


class Bootstrapper:
    def __init__(self, scheme, slots: int | None = None, cts_levels: int = 3,
                 stc_levels: int = 3, mod_degree: int = 255, K: int = 16):
        self.scheme = scheme
        self.ctx = scheme.ctx
        self.ev = scheme.evaluator
        self.enc = scheme.enc
        self.K = K
        self.cts_levels = cts_levels
        self.stc_levels = stc_levels
        self.mod_degree = mod_degree

        ctx = self.ctx
        p = scheme.params
        self.n = ctx.slots
        self.user_top = p.base_level + p.l_eff     # bootstrap output level
        self.top = ctx.max_level                   # after ModRaise
        self.q0 = float(np.prod([ctx.q_primes[i]
                                 for i in range(p.base_level + 1)],
                                dtype=np.float64))
        delta = ctx.default_scale

        # hi-scale EvalMod: two rescales per multiplication level (+1 for
        # the chunked-PS coefficient multiply at realistic degrees)
        from .polyeval import hi_scale_depth
        mod_depth = hi_scale_depth(mod_degree)
        need = cts_levels + 1 + mod_depth + 1 + stc_levels
        budget = self.top - self.user_top
        if budget < need:
            raise ValueError(
                f"bootstrap circuit needs {need} levels above the user chain "
                f"but only {budget} are available; extend boot_params")

        beta = self.q0 * (K + 1) / delta

        # Scale plan: entering CtS, the raised ciphertext's scale is simply
        # RE-DECLARED as q0*(K+1) (a free division of the values into the
        # EvalMod band), and each CtS stage GROWS the working scale via its
        # plaintext scale (pt = q * g) until EvalMod runs at ~Delta^2.
        # This keeps CtS matrix entries O(1) so their 0.5/pt_scale encoding
        # error never multiplies the large post-ModRaise values — the
        # error floor that capped earlier revisions.
        self.pre_scale = self.q0 * (K + 1)
        work_target = delta * delta
        growth = (work_target / self.pre_scale) ** (1.0 / cts_levels)

        # ---- CtS transforms (0.5 folded for the conjugation split) ----
        cts_mats = homdft.cts_matrices(self.n, cts_levels, 0.5)
        self.cts_transforms = []
        rotations = set()
        lvl = self.top
        s_track = self.pre_scale
        for mat in cts_mats:
            diags = homdft.matrix_diagonals(mat)
            tr = compile_transform_scan(
                self.enc, diags, lvl, self.n,
                pt_scale=float(self.ctx.q_primes[lvl]) * growth)
            self.cts_transforms.append(tr)
            rotations |= set(tr.babies) | {a for a in tr.giants if a}
            s_track *= growth
            lvl -= 1
        self.lvl_after_cts = lvl
        self.mod_in_scale = s_track  # ~Delta^2, exact float

        # ---- EvalMod polynomial ----
        self.mod_poly = Polynomial(
            fit_eval_mod(K, mod_degree).tolist(), "chebyshev")

        # ---- StC transforms ----
        # level plan: v-extraction costs 1 level, EvalMod mod_depth, the
        # i-recombination 1; StC then runs at lvl_stc .. user_top+1
        lvl_stc = self.lvl_after_cts - 1 - mod_depth - 1
        stc_mats = homdft.stc_matrices(self.n, stc_levels, beta)
        self.stc_transforms = []
        lvl = lvl_stc
        # shed the working-scale boost across the StC stages so the output
        # lands at exactly Delta (StC input values are tiny, so the smaller
        # pt scales cost nothing in precision)
        shed = (self.mod_in_scale / delta) ** (1.0 / stc_levels)
        for mat in stc_mats:
            diags = homdft.matrix_diagonals(mat)
            tr = compile_transform_scan(
                self.enc, diags, lvl, self.n,
                pt_scale=float(self.ctx.q_primes[lvl]) / shed)
            self.stc_transforms.append(tr)
            rotations |= set(tr.babies) | {a for a in tr.giants if a}
            lvl -= 1
        if lvl < self.user_top:
            raise ValueError("bootstrap level plan underflows the user chain")
        self.out_level = lvl

        # rotation + conjugation keys
        scheme.lt_evaluator.generate_rotation_keys(rotations)
        scheme.keys.galois_key(ctx.galois_element_conj())
        # pre-build the level-trimmed KeyPacks evaluation will use
        # (closure-free jit); record cache keys for scoped buffer collection
        self.pack_keys = set()
        for tr in self.cts_transforms + self.stc_transforms:
            babies = [a for a in tr.babies if a != 0]
            if babies:
                pk = build_key_pack(self.ev, babies, level=tr.level)
                self.pack_keys.add(pk.cache_key)
            giants = [a for a in tr.giants if a != 0]
            if giants:
                pk = build_key_pack(self.ev, giants, level=tr.level)
                self.pack_keys.add(pk.cache_key)
        self.pack_keys = tuple(sorted(
            self.pack_keys, key=lambda k: (k[0], -1 if k[1] is None else k[1])))

        # conjugation-split constants, pre-encoded so the jitted circuit
        # carries them as swapped arguments rather than baked XLA constants.
        # mod_depth is an upper BOUND on EvalMod's consumption (the chunked
        # evaluator may finish a level higher depending on which babies the
        # coefficient pattern touches); bootstrap() mod-drops to this
        # planned level so the pre-encoded constants always align.
        self.lvl_mod_out = self.lvl_after_cts - 1 - mod_depth
        self.minus_i_pt = self._make_const_pt(-1.0j, self.lvl_after_cts)
        self.plus_i_pt = self._make_const_pt(1.0j, self.lvl_mod_out)

        # ModRaise tables: FBC from the bottom block to the full chain
        base_idx = list(range(p.base_level + 1))
        full_idx = list(range(ctx.n_q))
        self._raise_digit = _dev_digit(
            ctx._digit_tables(base_idx, full_idx), ctx)

    # ------------------------------------------------------------ #

    def mod_raise(self, ct: Ciphertext) -> Ciphertext:
        """Lift residues mod q0-block to the full chain (adds q0*I)."""
        import jax.numpy as jnp
        ctx = self.ctx
        base = self.scheme.params.base_level
        dl_b = dev_level(ctx, base)
        dl_t = dev_level(ctx, self.top)
        data = ct.data[:, : base + 1]
        coeff = intt(data, dl_b.q_itw, dl_b.q_itw_shoup,
                     dl_b.q_ninv, dl_b.q_ninv_shoup, dl_b.q_p)
        lifted = jnp.stack([
            fbc(coeff[i], self._raise_digit, dl_t.q_p[:, None])
            for i in range(2)])  # (2, n_q, N) coeff domain
        raised = ntt(lifted, dl_t.q_tw, dl_t.q_tw_shoup, dl_t.q_p)
        return Ciphertext(raised, self.top, ct.scale)

    def _apply_chain(self, ct: Ciphertext, transforms) -> Ciphertext:
        ev = self.ev
        for tr in transforms:
            rots = baby_rotation_cache(ev, ct, set(tr.babies) | {0})
            ct = ev.rescale(eval_transform_scan(ev, tr, ct, rots))
        return ct

    def _make_const_pt(self, value: complex, level: int) -> Plaintext:
        """Constant complex vector encoded at scale q_l (errorless level
        consumption), built once at compile time."""
        import jax.numpy as jnp
        ql = float(self.ctx.q_primes[level])
        vec = np.full(self.n, value, dtype=np.complex128)
        data, shoup, scale = self.enc.encode(
            vec, level=level, scale=ql, with_shoup=True)
        return Plaintext(jnp.asarray(data.astype(np.uint32)),
                         jnp.asarray(shoup), level, scale)

    def bootstrap(self, ct: Ciphertext, slots: int | None = None) -> Ciphertext:
        """Refresh an exhausted ciphertext to the top of the user chain."""
        ev = self.ev
        if ct.level < self.scheme.params.base_level:
            raise ValueError(
                f"bootstrap input level {ct.level} below the modulus floor")
        raised = self.mod_raise(ct)
        # free division into the EvalMod band: re-declare the scale as
        # q0*(K+1); values become (Delta x + q0 I)/(q0 (K+1))
        raised = raised.with_(scale=self.pre_scale)

        # CoeffsToSlots: t holds c_a + i c_b (scaled into [-1,1])
        t = self._apply_chain(raised, self.cts_transforms)
        t_conj = ev.conjugate(t)
        u = ev.add(t, t_conj)                       # 2*Re = c_a terms (x0.5 folded)
        diff = ev.sub(t, t_conj)
        v = ev.mul_plain(diff, self.minus_i_pt)     # Im part (0.5 folded in CtS)

        # EvalMod on both halves at the Delta^2 working scale; align to the
        # planned output level (free drops absorb the depth-bound slack)
        u = evaluate_polynomial(ev, u, self.mod_poly, hi_scale=True)
        v = evaluate_polynomial(ev, v, self.mod_poly, hi_scale=True)
        v = ev.mod_drop(v, self.lvl_mod_out)

        # recombine a0 = u + i v and run StC
        iv = ev.mul_plain(v, self.plus_i_pt)
        a0 = ev.add(ev.mod_drop(u, iv.level), iv)
        out = self._apply_chain(a0, self.stc_transforms)
        return out.with_(scale=ct.scale)
