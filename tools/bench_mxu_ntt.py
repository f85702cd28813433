"""Measured comparison: butterfly (roll-based VPU) NTT vs the MXU
matmul-form NTT candidate (crypto/mxu_modmatmul.py).

VERDICT r3 item 2 asked for an MXU NTT *or* a measured analysis; this
tool produces the measurement.  The matmul form of one four-step stage
is Y = W @ X mod p with W the (m x m) DFT-mod-p block: its MXU cost is
16 int8 digit-pair matmuls (one stacked matmul in practice), and its VPU
cost is the 7-term Shoup recombination — ~7 Shoup muls/element/stage vs
the butterfly path's ~0.5 Shoup muls/element/stage-equivalent
(1 mul per butterfly, N/2 butterflies per stage, log2(N) stages
=> log2(N)/2 muls per element for the WHOLE transform).

Run on the TPU:  python tools/bench_mxu_ntt.py
Writes MXU_NTT_BENCH.json at the repo root.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from orion_tpu.crypto import CKKSContext
    from orion_tpu.crypto.keyswitch import dev_level, ring_ntt
    from orion_tpu.crypto.mxu_modmatmul import ModMatmulPlan

    level = 17
    ctx = CKKSContext(logn=13, logq=[29] + [26] * level, logp=[29, 29],
                      logscale=26, h=192, seed=9)
    dl = dev_level(ctx, level)
    n = ctx.n
    nl = level + 1
    rng = np.random.default_rng(4)
    a = np.stack([rng.integers(0, ctx.primes[i], n, dtype=np.int64)
                  for i in range(nl)]).astype(np.uint32)
    aj = jnp.asarray(a)
    reps = 20

    def timed(fn, *args):
        out = jax.block_until_ready(fn(*args))
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        return (time.time() - t0) / reps, out

    # --- butterfly path: the production ring_ntt (four-step, fused) ---
    @jax.jit
    def butterfly_chain(x):
        def body(c, _):
            return ring_ntt(c, dl.q_tw, dl.q_tw_shoup, dl.q_p, dl,
                            dl.q_t4), None
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    t_btf, _ = timed(butterfly_chain, aj)

    # --- MXU matmul stages with the SAME total work shape: each limb's
    # 8192 coefficients as a (64, 128) tile; stage A = 64x64 matmul over
    # rows, stage B = 128x128 over lanes (twist omitted: +1 VPU mul/elem,
    # identical in both paths).  Per-limb plans (per-prime twiddles). ---
    plans_a = [ModMatmulPlan(rng.integers(0, ctx.primes[i], (64, 64),
                                          dtype=np.uint64),
                             int(ctx.primes[i])) for i in range(nl)]
    plans_b = [ModMatmulPlan(rng.integers(0, ctx.primes[i], (128, 128),
                                          dtype=np.uint64),
                             int(ctx.primes[i])) for i in range(nl)]

    @jax.jit
    def mxu_chain(x):
        def one(c):
            outs = []
            for i in range(nl):
                t = c[i].reshape(64, 128)
                t = plans_a[i](t)                       # row stage
                t = plans_b[i](t.T).T                   # lane stage
                outs.append(t.reshape(-1))
            return jnp.stack(outs)
        def body(c, _):
            return one(c), None
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    t_mxu, _ = timed(mxu_chain, aj)

    out = {
        "logn": 13, "level": level, "limbs": nl,
        "butterfly_ntt_us": t_btf * 1e6,
        "mxu_ntt_us": t_mxu * 1e6,
        "mxu_over_butterfly": t_mxu / t_btf,
        "analysis": {
            "butterfly_vpu_shoup_per_elem": np.log2(n) / 2,
            "mxu_vpu_shoup_per_elem": 2 * 7,
            "note": ("the MXU absorbs MAC work the VPU is not bottlenecked "
                     "by, while the digit recombination RAISES the VPU "
                     "Shoup-mul count per element above the butterfly "
                     "path's total; with 26..30-bit primes and 8-bit MXU "
                     "lanes no digit decomposition beats 4x4 pairs"),
        },
    }
    Path(__file__).parent.parent.joinpath("MXU_NTT_BENCH.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
