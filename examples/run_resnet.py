"""ResNet-20/CIFAR-10 encrypted-inference pipeline (reference
`examples/run_resnet.py`).

By default runs fit + compile (packing, level assignment, bootstrap
placement and bootstrapper generation).  Pass --fhe to also run the
encrypted forward — practical on the TPU backend via the jitted wrapper;
expect a long first compile.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import orion_tpu as orion
import orion_tpu.models as models
from orion_tpu.runtime.jit import make_jitted_forward
from orion_tpu.utils import get_cifar_datasets, mae


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=str(
        Path(__file__).parent.parent / "configs" / "resnet.yml"))
    ap.add_argument("--fhe", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--aot", type=int, default=0, metavar="N",
                    help="AOT-compile all forward programs with N "
                         "parallel threads before the first forward")
    ap.add_argument("--whole-jit", action="store_true",
                    help="trace the full net into one XLA program "
                         "(only viable for shallow nets; default is "
                         "per-module jit, required for ResNet depth)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    scheme = orion.init_scheme(args.config)
    trainloader, testloader = get_cifar_datasets(batch_size=1)
    net = models.ResNet20()

    inp, _ = next(iter(testloader))
    net.eval()
    out_clear = net(inp)

    orion.fit(net, trainloader)
    t0 = time.time()
    input_level = orion.compile(net)
    print(f"compile done in {time.time()-t0:.1f}s; input_level={input_level}")

    if not args.fhe:
        return

    ct = orion.encrypt(orion.encode(inp, input_level))
    net.he()
    if args.whole_jit:
        forward = make_jitted_forward(net, scheme)
    else:
        from orion_tpu.runtime.jit import enable_module_jit
        enable_module_jit(scheme)
        forward = net
    if args.aot and not args.whole_jit:
        from orion_tpu.runtime.jit import aot_precompile_forward
        t0 = time.time()
        nprog = aot_precompile_forward(net, scheme, ct, workers=args.aot)
        print(f"AOT: {nprog} programs compiled in {time.time()-t0:.1f}s "
              f"({args.aot} threads)")
    start = time.time()
    out = forward(ct)
    import jax
    jax.block_until_ready(out.cts[0].data)
    print(f"first encrypted forward: {time.time()-start:.1f}s")
    # steady state: repeated modules hit the per-signature program cache
    ct2 = orion.encrypt(orion.encode(inp, input_level))
    start = time.time()
    out2 = forward(ct2)
    jax.block_until_ready(out2.cts[0].data)
    print(f"steady-state encrypted forward: {time.time()-start:.1f}s")
    out_fhe = np.asarray(out.decrypt().decode()).reshape(-1)
    clear = np.asarray(out_clear).reshape(-1)
    print("MAE:", mae(clear, out_fhe[: clear.size]))


if __name__ == "__main__":
    main()
