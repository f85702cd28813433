"""Per-stage noise budget of an encrypted model forward (VERDICT r4 #7).

Runs fit -> compile -> noise_profile (decrypt-and-compare at every leaf
module, in the exact multiplexed slot layout — orion_tpu/diagnostics.py)
and writes NOISE_<tag>.json with the per-stage curve and headroom vs the
MAE<0.005 bound.

Usage:
  python tools/noise_profile.py --model resnet20 --out NOISE_r05_resnet.json
  python tools/noise_profile.py --model vgg11   --out NOISE_r05_vgg.json
  python tools/noise_profile.py --model lenet --cpu       # small, CPU-fast
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

MODELS = {
    "mlp": ("mlp.yml", "MLP", "mnist"),
    "lola": ("lola.yml", "LoLA", "mnist"),
    "lenet": ("lenet.yml", "LeNet", "mnist"),
    "resnet20": ("resnet.yml", "ResNet20", "cifar"),
    "vgg11": ("vgg.yml", "VGG11", "cifar"),
    "alexnet": ("alexnet.yml", "AlexNet", "cifar"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, choices=sorted(MODELS))
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the profiled forward N times and report the "
                         "LAST pass — pass 2+ is compile-warm, so the "
                         "per-stage seconds are the steady-state "
                         "per-module breakdown")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import orion_tpu as orion
    import orion_tpu.models as models
    from orion_tpu.diagnostics import noise_profile, write_noise_report
    from orion_tpu.utils import get_cifar_datasets, get_mnist_datasets

    cfg_name, cls_name, dataset = MODELS[args.model]
    config = args.config or str(
        Path(__file__).parent.parent / "configs" / cfg_name)
    scheme = orion.init_scheme(config)
    loader_fn = (get_cifar_datasets if dataset == "cifar"
                 else get_mnist_datasets)
    trainloader, testloader = loader_fn(batch_size=1)
    net = getattr(models, cls_name)()

    inp, _ = next(iter(testloader))
    net.eval()
    orion.fit(net, trainloader)
    t0 = time.time()
    input_level = orion.compile(net)
    print(f"compile done in {time.time()-t0:.1f}s; "
          f"input_level={input_level}", flush=True)

    from orion_tpu.runtime.jit import enable_module_jit
    enable_module_jit(scheme)

    for rep_i in range(max(1, args.repeat)):
        t0 = time.time()
        records = noise_profile(net, scheme, np.asarray(inp), input_level)
        print(f"pass {rep_i}: forward+profile {time.time()-t0:.1f}s",
              flush=True)
    out_path = args.out or f"NOISE_{args.model}.json"
    rep = write_noise_report(records, out_path, meta={
        "model": args.model, "config": config,
        "bound": 0.005,
        "note": ("per-stage error = crypto noise + polynomial-"
                 "approximation error vs the exact cleartext forward, "
                 "compared elementwise in the multiplexed slot layout"),
    })
    print(f"stages={rep['stages']} bootstraps={rep['bootstraps']} "
          f"final_max_err={rep['final_max_err']:.3e} "
          f"worst={rep['worst_stage']}", flush=True)
    for r in records:
        print(f"  {r['name']:32s} {r['kind']:14s} L{r['ct_level']:>2} "
              f"max={r['max_err']:.2e} rms={r['rms_err']:.2e} "
              f"[{r['seconds']:.2f}s]", flush=True)


if __name__ == "__main__":
    main()
