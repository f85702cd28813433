"""Measure the persistent-compile-cache win across processes (CPU backend).

Runs the jitted encrypted-MLP forward in two child processes sharing one
XLA compilation cache dir: the first pays every XLA compile, the second
should find them in the cache.  Prints one JSON line with both
first-forward times.  This demonstrates the AOT strategy production runs
get from `init_scheme`'s cache enablement (ORION_TPU_COMPILE_CACHE).
"""

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import orion_tpu as orion
import orion_tpu.models as models
from orion_tpu.utils import get_mnist_datasets
from orion_tpu.runtime.scheme import scheme as _scheme

orion.init_scheme(str(%(repo)r) + "/configs/mlp.yml")
train, test = get_mnist_datasets(batch_size=1)
net = models.MLP()
inp, _ = next(iter(test))
net.eval(); net(inp)
orion.fit(net, train)
lvl = orion.compile(net)
ct = orion.encrypt(orion.encode(inp, lvl))
net.he()
from orion_tpu.runtime.jit import make_jitted_forward
fwd = make_jitted_forward(net, _scheme)
t0 = time.time()
out = fwd(ct)
jax.block_until_ready(out.cts[0].data)
print("FIRST_FORWARD_S", time.time() - t0)
"""


def run_once(cache_dir: str) -> float:
    env = dict(os.environ, ORION_TPU_COMPILE_CACHE=cache_dir)
    out = subprocess.run([sys.executable, "-c", CHILD % {"repo": str(REPO)}],
                         capture_output=True, text=True, env=env, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("FIRST_FORWARD_S"):
            return float(line.split()[1])
    raise RuntimeError(f"child failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    with tempfile.TemporaryDirectory() as cache:
        cold = run_once(cache)
        warm = run_once(cache)
    rec = {"first_forward_cold_s": round(cold, 3),
           "first_forward_warm_process_s": round(warm, 3),
           "speedup": round(cold / warm, 2),
           "backend": "cpu",
           "note": "two separate processes sharing one persistent XLA "
                   "compilation cache dir (init_scheme enablement); warm "
                   "process loads every program from the cache"}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
