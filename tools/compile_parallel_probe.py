"""Does the XLA compile path parallelize across threads? (VERDICT r4 #10)

Cold-start on a deep net is dominated by per-module XLA compiles (~50 s
each over the axon remote-compile tunnel).  If concurrent compiles from
one process overlap, scheme.compile() can AOT-build module programs in a
thread pool; if the tunnel serializes them, that's the documented answer.

Method: build K structurally-distinct keyswitch-like programs (distinct
constants force distinct cache keys), compile them serially, then compile
K fresh ones from K threads; report the speedup.  Run on the TPU backend
with the chip idle.
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    print(f"backend: {jax.default_backend()}; K={K}", flush=True)

    def make_fn(tag):
        # distinct constant -> distinct program hash; big enough body that
        # compile time dominates dispatch
        c = np.float32(1.0 + tag * 1e-3)

        def fn(x):
            y = x
            for i in range(24):
                y = jnp.tanh(y @ x.T @ x * c + i)
            return y
        return jax.jit(fn)

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(256, 256)).astype(np.float32))

    def compile_one(fn):
        t0 = time.time()
        fn.lower(x).compile()
        return time.time() - t0

    serial_fns = [make_fn(100 + i) for i in range(K)]
    t0 = time.time()
    times = [compile_one(f) for f in serial_fns]
    serial = time.time() - t0
    print(f"serial: {serial:.1f}s (each: "
          f"{', '.join(f'{t:.1f}' for t in times)})", flush=True)

    par_fns = [make_fn(200 + i) for i in range(K)]
    t0 = time.time()
    with ThreadPoolExecutor(K) as ex:
        list(ex.map(compile_one, par_fns))
    parallel = time.time() - t0
    print(f"parallel ({K} threads): {parallel:.1f}s", flush=True)
    print(f"speedup: {serial / parallel:.2f}x", flush=True)
    import json
    print(json.dumps({"k": K, "serial_s": round(serial, 2),
                      "parallel_s": round(parallel, 2),
                      "speedup": round(serial / parallel, 2)}), flush=True)


if __name__ == "__main__":
    main()
