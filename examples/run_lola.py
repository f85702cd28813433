"""Encrypted LoLA inference end-to-end (reference `examples/run_mlp.py`).

Run from the repo root:  python examples/run_mlp.py [--config configs/lola.yml]
"""

import argparse
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import orion_tpu as orion
import orion_tpu.models as models
from orion_tpu.runtime.jit import make_jitted_forward
from orion_tpu.utils import get_mnist_datasets, mae


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=str(
        Path(__file__).parent.parent / "configs" / "lola.yml"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    scheme = orion.init_scheme(args.config)
    trainloader, testloader = get_mnist_datasets(batch_size=1)
    net = models.LoLA()

    inp, _ = next(iter(testloader))

    net.eval()
    out_clear = net(inp)

    orion.fit(net, trainloader)
    input_level = orion.compile(net)

    vec_ptxt = orion.encode(inp, input_level)
    vec_ctxt = orion.encrypt(vec_ptxt)
    net.he()

    print("\nStarting FHE inference", flush=True)
    forward = make_jitted_forward(net, scheme)
    start = time.time()
    out_ctxt = forward(vec_ctxt)
    import jax
    jax.block_until_ready(out_ctxt.cts[0].data)
    compile_and_run = time.time() - start

    start = time.time()
    out_ctxt = forward(vec_ctxt)
    jax.block_until_ready(out_ctxt.cts[0].data)
    steady = time.time() - start

    out_ptxt = out_ctxt.decrypt()
    out_fhe = np.asarray(out_ptxt.decode()).reshape(-1)
    out_clear = np.asarray(out_clear).reshape(-1)

    print()
    print("clear:", out_clear)
    print("fhe:  ", out_fhe[: out_clear.size])

    dist = mae(out_clear, out_fhe[: out_clear.size])
    print(f"\nMAE: {dist:.6f}")
    print(f"Precision: {-math.log2(dist):.4f} bits")
    print(f"Compile+first run: {compile_and_run:.4f} s")
    print(f"Steady-state FHE forward: {steady:.4f} s")
    return dist


if __name__ == "__main__":
    main()
