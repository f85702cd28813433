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
    """Full- or sparse-slot bootstrapping circuit.

    With `slots` = s < ctx.slots the circuit runs on the 2s-coefficient
    subring (reference: per-slot-count bootstrappers,
    `orion/backend/lattigo/bootstrapper.go:18-80`): after ModRaise a
    partial trace (log2(n/s) rotate-adds over the subgroup) projects the
    plaintext onto subring-supported coefficients — multiplying them by
    n/s, absorbed errorlessly into the declared scale — and CtS/StC become
    s-point special FFTs whose stage matrices have radix 2^(log2(s)/levels)
    diagonals instead of 2^(log2(n)/levels).  EvalMod is unchanged.  The
    output carries the s slots REPLICATED n/s times (exactly the sparse
    packing the reference's backend returns); downstream linear transforms
    read only the columns their packing populated, so the copies are inert.
    """

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
        if ctx.ring_type != "standard":
            raise NotImplementedError(
                "bootstrapping is implemented for the standard ring only")
        p = scheme.params
        self.n = ctx.slots
        # sparse slot count: at least one butterfly stage per grouped level
        # so the circuit consumes exactly the planned level budget
        s = int(slots) if slots else ctx.slots
        s = max(s, 1 << max(cts_levels, stc_levels))
        self.slots = min(s, ctx.slots)
        self.ratio = self.n // self.slots
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

        # MessageRatio design (Lattigo parity: `Parameters.MessageRatio`,
        # behind `orion/backend/lattigo/bootstrapper.go`): the message is
        # prescaled UP by the exact integer D = round(q0/(R*Delta)) before
        # ModRaise, so it occupies 1/R of the EvalMod band regardless of
        # how wide q0 is.  Every EvalMod-input error eps (CtS encoding
        # quantisation, keyswitch noise, sine linearisation) reaches the
        # output multiplied by beta = q0(K+1)/(D*Delta) ~ R(K+1); with
        # R=256..512 that is ~2^13 — against 2^33 if the message were left
        # at scale Delta under a 55-bit q0, which buries it under CtS
        # noise.  D=1 (narrow q0 <= R*Delta) degrades gracefully: the
        # Bootstrap module adds the residual headroom prescale (see
        # `headroom` below).
        boot_cfg = scheme.params.boot or {}
        R = int(boot_cfg.get("MsgRatio", 256))
        self.msg_ratio = R
        self.D = max(1, int(round(self.q0 / (R * delta))))
        self.delta_boot = self.D * delta
        self.beta = self.q0 * (K + 1) / self.delta_boot
        # extra message headroom the nn.Bootstrap module must provide when
        # D cannot reach the target ratio (q0 too narrow): power of two so
        # the module's postscale return trip is errorless
        self.headroom = 1
        while self.q0 / self.delta_boot * self.headroom < R * 0.75:
            self.headroom <<= 1

        # Scale plan: entering CtS, the raised ciphertext's scale is simply
        # RE-DECLARED as q0*(K+1)*ratio (a free division of the values into
        # the EvalMod band; the subring trace's coefficient-by-ratio growth
        # is absorbed the same way), and each CtS stage GROWS the working
        # scale via its plaintext scale (pt = q * g) until EvalMod runs at
        # the wide working scale W = product of two circuit primes (2^60
        # with 30-bit circuit primes), keeping rescale noise far below the
        # signal.
        #
        # CtS pt scales set the bootstrap error floor: entry quantisation
        # (0.5/pt_scale, ABSOLUTE) multiplies post-ModRaise slot values as
        # large as ~2K and reaches the output beta-amplified.  The raw
        # growth budget W/pre_scale is tiny (~2 for a wide q0), so the pt
        # scales get an extra boost of q_ext/m, shed for free through the
        # u/v-extraction level: the extraction constants (1 and -i) are
        # encoded at a small INTEGER scale m (coefficients exactly +-m:
        # zero encoding error), so the extraction multiply rescales by
        # q_ext/m and returns the working scale to exactly W.
        self.pre_scale = self.q0 * (K + 1) * self.ratio
        circuit_logq = int(boot_cfg.get("CircuitLogQ",
                                        scheme.params.logscale))
        work_target = float(2.0 ** (2 * circuit_logq))
        self.extract_m = 1 << 6
        lvl_ext = self.top - cts_levels           # u/v extraction level
        q_ext = float(ctx.q_primes[lvl_ext])
        growth = (work_target * q_ext /
                  (self.extract_m * self.pre_scale)) ** (1.0 / cts_levels)

        # ---- CtS transforms (0.5 folded for the conjugation split) ----
        cts_mats = homdft.cts_matrices(self.slots, cts_levels, 0.5)
        self.cts_transforms = []
        rotations = set()
        lvl = self.top
        s_track = self.pre_scale
        for mat in cts_mats:
            diags = self._tiled_diagonals(mat)
            tr = compile_transform_scan(
                self.enc, diags, lvl, self.n,
                pt_scale=float(self.ctx.q_primes[lvl]) * growth)
            self.cts_transforms.append(tr)
            rotations |= set(tr.babies) | {a for a in tr.giants if a}
            s_track *= growth
            lvl -= 1
        self.lvl_after_cts = lvl
        self.cts_out_scale = s_track                  # = W * q_ext / m
        # u/v extraction (constants at exact integer scale m) sheds the
        # boost: EvalMod runs at exactly the wide working scale W
        self.mod_in_scale = s_track * self.extract_m / q_ext

        # ---- EvalMod polynomial ----
        # beta = q0(K+1)/Delta (the un-division of the EvalMod band) and the
        # sparse projection's ratio are folded INTO the Chebyshev
        # coefficients: coefficient-encoding quantisation (~0.5/q_l per
        # coefficient) is ABSOLUTE, so scaling the coefficients costs no
        # relative precision — whereas re-declaring the scale after EvalMod
        # would amplify that quantisation by beta (2^33 for a 55-bit q0),
        # which is exactly the error floor that broke full-band messages.
        fold = self.beta * self.ratio
        self.mod_poly = Polynomial(
            (fit_eval_mod(K, mod_degree) * fold).tolist(), "chebyshev")

        # ---- StC transforms ----
        # level plan: v-extraction costs 1 level, EvalMod mod_depth, the
        # i-recombination 1; StC then runs at lvl_stc .. user_top+1
        lvl_stc = self.lvl_after_cts - 1 - mod_depth - 1
        # StC entries stay O(1) (beta lives in the EvalMod coefficients, see
        # above); the W -> Delta scale boost is shed through the StC stage
        # pt scales.  Each stage sheds (W/Delta)^(1/levels); keeping the pt
        # scales >= ~2^21 (entry quantisation ~2e-6) requires enough StC
        # stages — config.py auto-raises StCLevels to meet this.
        stc_mats = homdft.stc_matrices(self.slots, stc_levels, 1.0)
        self.stc_transforms = []
        lvl = lvl_stc
        shed = (self.mod_in_scale / delta) ** (1.0 / stc_levels)
        for mat in stc_mats:
            diags = self._tiled_diagonals(mat)
            tr = compile_transform_scan(
                self.enc, diags, lvl, self.n,
                pt_scale=float(self.ctx.q_primes[lvl]) / shed)
            self.stc_transforms.append(tr)
            rotations |= set(tr.babies) | {a for a in tr.giants if a}
            lvl -= 1
        if lvl < self.user_top:
            raise ValueError("bootstrap level plan underflows the user chain")
        self.out_level = lvl

        # subring trace rotations (doubling ladder): amounts s, 2s, 4s, ...
        self.trace_amounts = [self.slots * (1 << t)
                              for t in range(int(math.log2(self.ratio)))]
        rotations |= set(self.trace_amounts)

        # rotation + conjugation keys
        scheme.lt_evaluator.generate_rotation_keys(rotations)
        scheme.keys.galois_key(ctx.galois_element_conj())
        # pre-build the level-trimmed KeyPacks evaluation will use
        # (closure-free jit); record cache keys for scoped buffer collection
        self.pack_keys = set()
        self.trace_packs = []
        for amt in self.trace_amounts:
            pk = build_key_pack(self.ev, [amt], level=self.top)
            self.trace_packs.append(pk)
            self.pack_keys.add(pk.cache_key)
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
        m = float(self.extract_m)
        self.minus_i_pt = self._make_const_pt(-1.0j, self.lvl_after_cts,
                                              scale=m)
        self.one_u_pt = self._make_const_pt(1.0, self.lvl_after_cts, scale=m)
        self.plus_i_pt = self._make_const_pt(1.0j, self.lvl_mod_out)

        # ModRaise tables: FBC from the bottom block to the full chain
        base_idx = list(range(p.base_level + 1))
        full_idx = list(range(ctx.n_q))
        self._raise_digit = _dev_digit(
            ctx._digit_tables(base_idx, full_idx), ctx)

    # ------------------------------------------------------------ #

    def _tiled_diagonals(self, mat):
        """Generalised diagonals of an s-point stage matrix, tiled to the
        full slot count: an s-periodic vector rotated by k (< s) full-slot
        positions rotates identically within every period, so the s-point
        transform applied per-period IS the full-slot transform with
        period-tiled diagonals."""
        diags = homdft.matrix_diagonals(mat)
        if self.ratio == 1:
            return diags
        return {d: np.tile(v, self.ratio) for d, v in diags.items()}

    def _subring_trace(self, ct: Ciphertext) -> Ciphertext:
        """sum_t rot(ct, t*s) via the doubling ladder: kills plaintext
        coefficients outside the 2s-subring and multiplies the survivors by
        ratio (declared into the scale)."""
        from .lintrans_scan import rotate_scan
        ev = self.ev
        for pack in self.trace_packs:
            rot = rotate_scan(ev, ct, pack)[0]
            ct = ev.add(ct, Ciphertext(rot, ct.level, ct.scale))
        return ct

    def mod_raise(self, ct: Ciphertext) -> Ciphertext:
        """Lift residues mod q0-block to the full chain (adds q0*I)."""
        import jax.numpy as jnp
        ctx = self.ctx
        base = self.scheme.params.base_level
        dl_b = dev_level(ctx, base)
        dl_t = dev_level(ctx, self.top)
        data = ct.data[:, : base + 1]
        from .keyswitch import ring_intt, ring_ntt
        coeff = ring_intt(data, dl_b.q_itw, dl_b.q_itw_shoup,
                          dl_b.q_ninv, dl_b.q_ninv_shoup, dl_b.q_p,
                          dl_b, dl_b.q_t4)
        lifted = jnp.stack([
            fbc(coeff[i], self._raise_digit, dl_t.q_p[:, None])
            for i in range(2)])  # (2, n_q, N) coeff domain
        raised = ring_ntt(lifted, dl_t.q_tw, dl_t.q_tw_shoup, dl_t.q_p,
                          dl_t, dl_t.q_t4)
        return Ciphertext(raised, self.top, ct.scale)

    def _apply_chain(self, ct: Ciphertext, transforms) -> Ciphertext:
        ev = self.ev
        for tr in transforms:
            rots = baby_rotation_cache(ev, ct, set(tr.babies) | {0})
            ct = ev.rescale(eval_transform_scan(ev, tr, ct, rots))
        return ct

    def _make_const_pt(self, value: complex, level: int,
                       scale: float | None = None) -> Plaintext:
        """Constant complex vector encoded at scale q_l (errorless level
        consumption) or an explicit integer scale (exact coefficients, used
        by the u/v extraction shed), built once at compile time."""
        from . import placement
        s = float(self.ctx.q_primes[level]) if scale is None else scale
        vec = np.full(self.n, value, dtype=np.complex128)
        data, shoup, scale = self.enc.encode(
            vec, level=level, scale=s, with_shoup=True)
        return Plaintext(placement.buffer(data.astype(np.uint32)),
                         placement.buffer(shoup), level, scale)

    # ---------------- pipeline phases (shared by both paths) --------- #

    def _pre(self, ct: Ciphertext) -> Ciphertext:
        ev = self.ev
        if self.D > 1:
            # exact integer prescale to Delta_boot = D*Delta ~ q0/R: residue
            # multiply, no level consumed, no noise added (MessageRatio)
            ct = ev.mul_scalar_int(ct, self.D)
        raised = self.mod_raise(ct)
        if self.ratio > 1:
            raised = self._subring_trace(raised)
        # free division into the EvalMod band: re-declare the scale as
        # q0*(K+1)*ratio; values become (Delta_boot x + q0 I)/(q0 (K+1))
        return raised.with_(scale=self.pre_scale)

    def _one_chain(self, ct: Ciphertext, tr) -> Ciphertext:
        ev = self.ev
        rots = baby_rotation_cache(ev, ct, set(tr.babies) | {0})
        return ev.rescale(eval_transform_scan(ev, tr, ct, rots))

    def _extract(self, t: Ciphertext):
        ev = self.ev
        t_conj = ev.conjugate(t)
        # u/v extraction: exact-integer-scale constants shed the CtS pt
        # boost (scale W*q_ext/m -> W), consuming the planned level
        u = ev.mul_plain(ev.add(t, t_conj), self.one_u_pt)  # 2*Re (x.5 in)
        v = ev.mul_plain(ev.sub(t, t_conj), self.minus_i_pt)  # Im part
        return u, v

    def _evalmod(self, x: Ciphertext) -> Ciphertext:
        return evaluate_polynomial(self.ev, x, self.mod_poly, hi_scale=True)

    def _recombine(self, u: Ciphertext, v: Ciphertext) -> Ciphertext:
        ev = self.ev
        v = ev.mod_drop(v, self.lvl_mod_out)
        # a0 = u + i v (beta*ratio already folded into the EvalMod
        # coefficients, so a0 holds the refreshed coefficients directly)
        iv = ev.mul_plain(v, self.plus_i_pt)
        return ev.add(ev.mod_drop(u, iv.level), iv)

    def _phase_swaps(self):
        """Every device buffer the circuit touches (pinned resident)."""
        sw = getattr(self, "_phase_swaps_cache", None)
        if sw is None:
            from ..runtime.buffers import (_bootstrapper_swaps,
                                           _context_swaps)
            sw = _context_swaps(self.ctx) + _bootstrapper_swaps(self)
            self._phase_swaps_cache = sw
        return sw

    def bootstrap(self, ct: Ciphertext, slots: int | None = None) -> Ciphertext:
        """Refresh an exhausted ciphertext to the top of the user chain.

        With a scheme.phase_runner installed (per-module jit mode), each
        pipeline phase — ModRaise, every CtS/StC stage, u/v extraction,
        EvalMod, recombination — compiles as its OWN cached program: one
        monolithic bootstrap program is too large for compile services
        (hundreds of MB of HLO), and the 24 Bootstrap modules of a
        ResNet-20 share these phase programs.
        """
        if ct.level < self.scheme.params.base_level:
            raise ValueError(
                f"bootstrap input level {ct.level} below the modulus floor")
        pr = getattr(self.scheme, "phase_runner", None)
        if pr is None:
            t = self._pre(ct)
            for tr in self.cts_transforms:
                t = self._one_chain(t, tr)
            u, v = self._extract(t)
            u = self._evalmod(u)
            v = self._evalmod(v)
            a0 = self._recombine(u, v)
            for tr in self.stc_transforms:
                a0 = self._one_chain(a0, tr)
            return a0.with_(scale=ct.scale)

        swaps = self._phase_swaps()
        tag = ("btp", self.slots)
        t = pr.run(tag + ("pre",), swaps, self._pre, ct)
        for i, tr in enumerate(self.cts_transforms):
            t = pr.run(tag + ("cts", i), swaps,
                       lambda c, _tr=tr: self._one_chain(c, _tr), t)
        u, v = pr.run(tag + ("extract",), swaps, self._extract, t)
        u = pr.run(tag + ("evalmod",), swaps, self._evalmod, u)
        v = pr.run(tag + ("evalmod",), swaps, self._evalmod, v)
        a0 = pr.run(tag + ("recombine",), swaps, self._recombine, u, v)
        for i, tr in enumerate(self.stc_transforms):
            a0 = pr.run(tag + ("stc", i), swaps,
                        lambda c, _tr=tr: self._one_chain(c, _tr), a0)
        return a0.with_(scale=ct.scale)
