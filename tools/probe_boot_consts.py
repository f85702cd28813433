"""Diagnose trace-baked constants in the Bootstrap program.

Builds the resnet-config bootstrapper on CPU, traces the same function the
per-module jit runs (buffers swapped to arguments), and reports every
constant the jaxpr still captures, largest first — the source of the
255 MB MLIR program the remote compiler rejects.
"""

import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import orion_tpu as orion
from orion_tpu.crypto.ciphertext import Ciphertext
from orion_tpu.runtime.buffers import (_bootstrapper_swaps, _context_swaps,
                                       _ksk_swaps)

cfg = sys.argv[1] if len(sys.argv) > 1 else "configs/resnet.yml"
slots = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

scheme = orion.init_scheme(cfg)
print("generating bootstrapper...", flush=True)
btp = scheme.bootstrapper.get_for_slots(slots)
swaps = (_context_swaps(scheme.ctx) + _bootstrapper_swaps(btp)
         + _ksk_swaps(scheme.keys.relin_key))

level = scheme.params.base_level + 1
rng = np.random.default_rng(0)
n = scheme.ctx.n
data = np.stack([
    np.stack([rng.integers(0, scheme.ctx.primes[i], n, dtype=np.int64)
              for i in range(level + 1)]) for _ in range(2)]).astype(np.uint32)
scale = scheme.ctx.default_scale


def fn(d, bufs):
    for sw, v in zip(swaps, bufs):
        sw.save_and_set(v)
    try:
        ct = Ciphertext(d, level, scale)
        out = btp.bootstrap(ct)
    finally:
        for sw in swaps:
            sw.restore()
    return out.data


print("tracing...", flush=True)
cj = jax.make_jaxpr(fn)(data, [sw.getter() for sw in swaps])
consts = cj.consts
sizes = sorted(((getattr(c, "nbytes", 0), getattr(c, "shape", ()),
                 str(getattr(c, "dtype", type(c)))) for c in consts),
               reverse=True)
total = sum(s[0] for s in sizes)
print(f"n_consts={len(consts)} total_bytes={total/1e6:.1f} MB")
for nb, shape, dt in sizes[:40]:
    print(f"  {nb/1e6:9.3f} MB  {shape}  {dt}")
import collections
hist = collections.Counter((s[1], s[2]) for s in sizes)
print("\nby (shape,dtype) count:")
for (shape, dt), cnt in hist.most_common(20):
    print(f"  x{cnt:5d}  {shape}  {dt}")
