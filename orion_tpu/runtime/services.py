"""Backend service layer: encoder, encryptor, LT/poly evaluators,
bootstrapper shell.

Reference parity: `orion/backend/python/{encoder,encryptor,lt_evaluator,
poly_evaluator,bootstrapper}.py`.  These wrap the crypto layer with
multi-ciphertext semantics and compile-time key management.
"""

from __future__ import annotations

import math

import numpy as np

from ..crypto.ciphertext import Ciphertext, Plaintext
from ..crypto import lintrans
from ..crypto.polyeval import Polynomial, evaluate_polynomial
from .tensors import CipherTensor, PlainTensor


class EncoderService:
    """Splits arbitrary-length vectors into ceil(numel/slots) plaintexts
    (reference `encoder.py:14-50`)."""

    def __init__(self, scheme):
        self.scheme = scheme
        self.enc = scheme.enc  # crypto Encoder

    def encode(self, values, level=None, scale=None, on_shape=None,
               with_shoup=False) -> PlainTensor:
        import jax.numpy as jnp
        ctx = self.scheme.ctx
        values = np.asarray(values, dtype=np.float64)
        shape = values.shape
        flat = values.reshape(-1)
        slots = ctx.slots
        num_pt = max(1, math.ceil(flat.size / slots))
        padded = np.zeros(num_pt * slots)
        padded[: flat.size] = flat
        if level is None:
            level = self.scheme.input_level_default
        from ..crypto import placement
        pts = []
        for i in range(num_pt):
            chunk = padded[i * slots:(i + 1) * slots]
            if with_shoup:
                data, shoup, s = self.enc.encode(
                    chunk, level=level, scale=scale, with_shoup=True)
                pts.append(Plaintext(placement.buffer(data.astype(np.uint32)),
                                     placement.buffer(shoup), level, s))
            else:
                data, s = self.enc.encode(chunk, level=level, scale=scale)
                pts.append(Plaintext(placement.buffer(data.astype(np.uint32)),
                                     None, level, s))
        return PlainTensor(self.scheme, pts, shape, on_shape or shape)

    def decode(self, ptensor: PlainTensor) -> np.ndarray:
        vals = []
        for pt in ptensor.plaintexts:
            raw = np.asarray(pt.data).astype(np.int64)
            vals.append(self.enc.decode(raw, pt.scale))
        flat = np.concatenate(vals)
        numel = int(np.prod(ptensor.on_shape))
        return flat[:numel].reshape(ptensor.on_shape)

    def get_moduli_chain(self):
        return self.scheme.ctx.moduli_chain()


class EncryptorService:
    """Per-plaintext encrypt/decrypt loops (reference `encryptor.py`)."""

    def __init__(self, scheme):
        self.scheme = scheme

    def encrypt(self, ptensor: PlainTensor) -> CipherTensor:
        import jax.numpy as jnp
        keys = self.scheme.keys
        cts = []
        for pt in ptensor.plaintexts:
            raw = np.asarray(pt.data).astype(np.int64)
            ct = keys.encrypt_rns(raw)
            cts.append(Ciphertext(jnp.asarray(ct.astype(np.uint32)),
                                  pt.level, pt.scale))
        return CipherTensor(self.scheme, cts, ptensor.shape,
                            ptensor.on_shape)

    def decrypt(self, ctensor: CipherTensor) -> PlainTensor:
        import jax.numpy as jnp
        keys = self.scheme.keys
        pts = []
        for ct in ctensor.cts:
            raw = keys.decrypt_rns(np.asarray(ct.data).astype(np.int64))
            pts.append(Plaintext(jnp.asarray(raw.astype(np.uint32)), None,
                                 ct.level, ct.scale))
        return PlainTensor(self.scheme, pts, ctensor.shape,
                           ctensor.on_shape)


class LTEvaluatorService:
    """Compile + evaluate blocked BSGS transforms; pre-generates the
    consolidated rotation-key set (reference `lt_evaluator.py`)."""

    def __init__(self, scheme):
        self.scheme = scheme
        self.generated_rotations: set[int] = set()

    def generate_transforms(self, layer):
        from ..crypto import lintrans_scan
        ctx = self.scheme.ctx
        level = layer.level
        compiled = {}
        rotations = set()
        for (row, col), diags in layer.diagonals.items():
            tr = lintrans_scan.compile_transform_scan(
                self.scheme.enc, diags, level, ctx.slots, layer.bsgs_ratio)
            compiled[(row, col)] = tr
            rotations |= set(tr.babies) | set(a for a in tr.giants if a)
        # hybrid output rotations
        for i in range(1, layer.output_rotations + 1):
            rotations.add(ctx.slots // (2 ** i))
        self.generate_rotation_keys(rotations)
        layer.compiled = compiled
        self._prewarm_key_packs(compiled, layer)
        return compiled

    def _prewarm_key_packs(self, compiled, layer=None):
        """Build the exact level-trimmed KeyPacks evaluation will request,
        at compile time, so the jit wrapper can pass them as arguments
        (closure-free) and so eval never regenerates keys.  Records the pack
        cache keys on the layer (`_pack_keys`) for scoped buffer collection."""
        from ..crypto import lintrans_scan
        ev = self.scheme.evaluator
        pack_keys = set()
        cols = {}
        for (i, j), tr in compiled.items():
            cols.setdefault(j, set()).update(set(tr.babies) | {0})
            giants = [a for a in tr.giants if a != 0]
            if giants:
                pack = lintrans_scan.build_key_pack(ev, giants,
                                                    level=tr.level)
                pack_keys.add(pack.cache_key)
        for j, babies in cols.items():
            todo = [a for a in sorted(babies) if a != 0]
            if todo:
                level = next(tr.level for (i, jj), tr in compiled.items()
                             if jj == j)
                pack = lintrans_scan.build_key_pack(ev, todo, level=level)
                pack_keys.add(pack.cache_key)
        if layer is not None:
            layer._pack_keys = tuple(sorted(
                pack_keys, key=lambda k: (k[0], -1 if k[1] is None else k[1])))

    def generate_rotation_keys(self, rotations):
        new = set(rotations) - self.generated_rotations
        for r in sorted(new):
            self.scheme.keys.rotation_key(r)
        self.generated_rotations |= new

    def evaluate_transforms(self, layer, in_ctensor: CipherTensor):
        from ..crypto import lintrans_scan
        ev = self.scheme.evaluator
        rows = max(r for (r, c) in layer.compiled) + 1
        outs = lintrans_scan.eval_transform_blocked_scan(
            ev, layer.compiled, in_ctensor.cts, rows)
        return CipherTensor(self.scheme, outs, layer.output_shape,
                            layer.fhe_output_shape)


class PolyEvaluatorService:
    """Reference `poly_evaluator.py`: polynomial objects + evaluation +
    minimax sign coefficient generation."""

    def __init__(self, scheme):
        self.scheme = scheme
        self._minimax_cache = {}

    def generate_monomial(self, coeffs):
        return Polynomial(list(coeffs), "monomial")

    def generate_chebyshev(self, coeffs):
        return Polynomial(list(coeffs), "chebyshev")

    def evaluate_polynomial(self, ctensor: CipherTensor, poly: Polynomial,
                            output_scale=None) -> CipherTensor:
        ev = self.scheme.evaluator
        cts = ctensor.cts
        same_meta = len(cts) > 1 and all(
            c.level == cts[0].level and c.scale == cts[0].scale
            and c.data.shape == cts[0].data.shape for c in cts[1:])
        if same_meta:
            # multi-ct tensor: every member shares (level, scale), so the
            # BSGS circuit is identical — lax.map compiles ONE body and
            # runs it per ct instead of unrolling the whole power-basis +
            # key-switch graph len(cts) times into the XLA program (a VGG
            # feature tensor is 8 cts: unrolled sign programs were too
            # large for the remote compile helper)
            import jax
            import jax.numpy as jnp
            lv, sc = cts[0].level, cts[0].scale
            meta = {}

            def body(d):
                out = evaluate_polynomial(
                    ev, Ciphertext(d, lv, sc), poly, output_scale)
                meta["out"] = (out.level, out.scale)
                return out.data

            stacked = jnp.stack([c.data for c in cts])
            out_d = jax.lax.map(body, stacked)
            olv, osc = meta["out"]
            outs = [Ciphertext(out_d[i], olv, osc)
                    for i in range(len(cts))]
        else:
            outs = [evaluate_polynomial(ev, ct, poly, output_scale)
                    for ct in cts]
        return CipherTensor(self.scheme, outs, ctensor.shape,
                            ctensor.on_shape)

    def generate_minimax_sign_coeffs(self, degrees, prec=128, logalpha=6,
                                     logerr=12):
        from ..crypto.minimax import generate_minimax_sign_coeffs
        key = (tuple(degrees), prec, logalpha, logerr)
        if key not in self._minimax_cache:
            self._minimax_cache[key] = generate_minimax_sign_coeffs(
                list(degrees), prec, logalpha, logerr)
        return self._minimax_cache[key]


class BootstrapperService:
    """Per-slot-count bootstrappers (reference `bootstrapper.py`,
    `bootstrapper.go:14-58`): tensors occupying s < slots get an s-point
    circuit whose CtS/StC stages are exponentially cheaper (sparse
    bootstrapping)."""

    def __init__(self, scheme):
        self.scheme = scheme
        self._by_slots: dict[int, object] = {}

    def _slot_key(self, slot_count) -> int:
        ctx = self.scheme.ctx
        p = self.scheme.params
        if not slot_count:
            return ctx.slots
        s = min(int(slot_count), ctx.slots)
        if p.boot:
            # the circuit needs >= one butterfly stage per grouped level
            s = max(s, 1 << max(p.boot["CtSLevels"], p.boot["StCLevels"]))
        return s

    def _build(self, s: int):
        from ..crypto.bootstrap import Bootstrapper
        p = self.scheme.params
        if not p.boot:
            raise ValueError(
                "this network needs bootstrapping: add a `boot_params:` "
                "section to the config so circuit primes are provisioned")
        return Bootstrapper(
            self.scheme,
            slots=s,
            cts_levels=p.boot["CtSLevels"],
            stc_levels=p.boot["StCLevels"],
            mod_degree=p.boot["ModDegree"],
            K=p.boot["K"])

    def generate_bootstrapper(self, slot_count):
        return self.get_for_slots(slot_count)

    def get_for_slots(self, slot_count):
        """The bootstrapper instance serving a given sparse slot count."""
        s = self._slot_key(slot_count)
        if s not in self._by_slots:
            self._by_slots[s] = self._build(s)
        return self._by_slots[s]

    def bootstrap(self, ct, slots):
        return self.get_for_slots(slots).bootstrap(ct, slots)
