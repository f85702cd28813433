"""Modular matrix multiply on the MXU via int8 digit decomposition.

The candidate MXU form of the four-step NTT (STATUS r3 round-4 priority
#1): a negacyclic NTT factors into two DFT-matrix multiplies (rows m1,
lanes m2) plus a twist, and an (m x m) modular matmul can ride the MXU by
decomposing both operands into balanced radix-256 digits:

    W = sum_d 2^(8d) W_d,  X = sum_e 2^(8e) X_e,   W_d, X_e in [-128,127]
    W @ X = sum_k 2^(8k) P_k,   P_k = sum_{d+e=k} W_d @ X_e

The 16 digit-pair products are computed as ONE int8 matmul of the
stacked digit planes — (4m, m) @ (m, 4n) -> (4m, 4n) int32 blocks, MXU
native — and the k-plane recombination sum_k P_k * (2^(8k) mod p) runs
on the VPU as 7 Shoup multiplies per element.

Verdict from measurement (tools/bench_mxu_ntt.py): the MXU absorbs the
MAC work the VPU was NOT bottlenecked by, while the VPU recombination
(2 stages x 7 Shoup muls/elem) EXCEEDS the butterfly path's total
(~log2(N)/2 = 6.5 Shoup muls/elem for both stages together), so the
matmul NTT is not a win for 26..29-bit primes on this hardware
generation; the measured numbers live in BENCH_r04 `mxu` section.  The
primitive is kept (tested bit-exact) both as the evidence and for ops
whose arithmetic intensity DOES pay (e.g. future >32-bit lane packing).

No reference counterpart: Lattigo/HEonGPU NTTs are scalar/CUDA butterfly
code (`orion/backend/lattigo`), nothing matmul-shaped exists there.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .modops import add_mod, shoup_mul, sub_mod


def _balanced_digits_np(x: np.ndarray, ndig: int = 4) -> np.ndarray:
    """uint32 -> (ndig, ...) int8 balanced radix-256 digits (numpy,
    precompute path for twiddle matrices)."""
    x = x.astype(np.int64)
    digs = []
    for _ in range(ndig):
        d = x & 0xFF
        d = np.where(d > 127, d - 256, d)
        x = (x - d) >> 8
        digs.append(d.astype(np.int8))
    if not np.all(x == 0):
        raise ValueError("values need more digits")
    return np.stack(digs)


def balanced_digits(x: jnp.ndarray, ndig: int = 4) -> jnp.ndarray:
    """uint32 -> (ndig, ...) int8 balanced radix-256 digits (traced path
    for runtime data).  Values must be < 2^31 (true for RNS residues,
    p < 2^30) — int32 is used because TPUs run with x64 disabled."""
    x = x.astype(jnp.int32)
    digs = []
    for _ in range(ndig):
        d = x & 0xFF
        d = jnp.where(d > 127, d - 256, d)
        x = (x - d) >> 8
        digs.append(d.astype(jnp.int8))
    return jnp.stack(digs)


class ModMatmulPlan:
    """Precomputed per-prime tables for Y = W @ X mod p on the MXU."""

    def __init__(self, W: np.ndarray, p: int, ndig: int = 4):
        W = np.asarray(W, dtype=np.uint64) % p
        self.p = np.uint32(p)
        self.m = W.shape[0]
        self.ndig = ndig
        self.nk = 2 * ndig - 1
        # stacked digit planes: (ndig*m, m) int8
        Wd = _balanced_digits_np(W.astype(np.uint32), ndig)  # (ndig, m, m)
        self.Wd = jnp.asarray(Wd.reshape(ndig * self.m, self.m))
        # per-k recombination constants 2^(8k) mod p with Shoup companions
        ck = np.array([pow(256, k, p) for k in range(self.nk)], np.uint32)
        self.ck = jnp.asarray(ck)
        self.ck_shoup = jnp.asarray(
            ((ck.astype(np.uint64) << 32) // p).astype(np.uint32))
        # offset making P_k non-negative before the u32 Shoup mul:
        # |P_k| <= m * 128^2 * min(k+1, nk-k) <= m * 128^2 * ndig
        bound = self.m * 128 * 128 * ndig
        off = ((bound + p - 1) // p) * p
        if off + bound >= 1 << 31:
            raise ValueError("digit-product bound exceeds int32")
        self.off = np.int32(off)
        # correction: off * sum_k c_k mod p, subtracted once at the end
        corr = (int(off) % p) * int(sum(int(c) for c in ck) % p) % p
        self.corr = jnp.uint32(corr)

    def __call__(self, X: jnp.ndarray) -> jnp.ndarray:
        """X: (m, n) uint32 residues mod p -> W @ X mod p, (m, n) uint32."""
        m, n = X.shape
        ndig, nk = self.ndig, self.nk
        Xd = balanced_digits(X, ndig)                    # (ndig, m, n)
        Xs = jnp.concatenate(list(Xd), axis=1)           # (m, ndig*n)
        # ONE int8 matmul -> every digit-pair product, int32 accumulation
        P = jax.lax.dot_general(
            self.Wd, Xs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)            # (ndig*m, ndig*n)
        P = P.reshape(ndig, m, ndig, n)
        out = None
        pcol = jnp.broadcast_to(jnp.asarray(self.p), (1, 1))
        for k in range(nk):
            sk = None
            for d in range(ndig):
                e = k - d
                if 0 <= e < ndig:
                    blk = P[d, :, e, :]
                    sk = blk if sk is None else sk + blk
            u = (sk + self.off).astype(jnp.uint32)
            term = shoup_mul(u, self.ck[k], self.ck_shoup[k], pcol)
            out = term if out is None else add_mod(out, term, pcol)
        return sub_mod(out, jnp.broadcast_to(self.corr, out.shape), pcol)
