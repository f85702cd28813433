"""Host-side HBM residency analysis for the encrypted ResNet-20 forward.

Compiles the full pipeline on the CPU backend and prints, per leaf module,
the device-buffer bytes its scoped jit program receives (runtime/buffers.py
hbm_report) plus the global key/plaintext totals — the planning tool for
the TPU HBM budget (v5e: 16 GiB).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

import orion_tpu as orion
import orion_tpu.models as models
from orion_tpu.utils import get_cifar_datasets


def fmt(b):
    return f"{b / 2**30:.2f} GiB" if b > 2**28 else f"{b / 2**20:.1f} MiB"


def main():
    cfg = str(Path(__file__).parent.parent / "configs" / "resnet.yml")
    scheme = orion.init_scheme(cfg)
    trainloader, _ = get_cifar_datasets(batch_size=1)
    net = models.ResNet20()
    net.eval()
    orion.fit(net, trainloader)
    t0 = time.time()
    orion.compile(net)
    print(f"compile: {time.time() - t0:.1f}s")

    from orion_tpu.runtime.buffers import hbm_report, collect_swappables

    rep = hbm_report(scheme, net)
    print(f"\nTOTAL unique buffer bytes: {fmt(rep['total'])}")
    mods = sorted(rep["per_module"].items(), key=lambda kv: -kv[1])
    for name, b in mods[:20]:
        print(f"  {name:45s} {fmt(b)}")

    # largest single-module argument list (worst-case per-program residency)
    worst = 0
    worst_name = None
    for name, module in net.named_modules():
        if not module.is_leaf():
            continue
        try:
            swaps = collect_swappables(scheme, module)
        except Exception as e:
            print(f"  [skip {name}: {e}]")
            continue
        tot = sum(int(sw.getter().nbytes) for sw in swaps
                  if sw.getter() is not None
                  and hasattr(sw.getter(), "nbytes"))
        if tot > worst:
            worst, worst_name = tot, name
    print(f"\nworst single-module args: {worst_name} = {fmt(worst)}")

    # key-chest totals
    keys = scheme.keys
    kb = sum(int(g.data.nbytes) + (int(g.shoup.nbytes) if g.shoup is not None else 0)
             for g in keys.galois_keys.values())
    rb = int(keys.relin_key.data.nbytes) + (
        int(keys.relin_key.shoup.nbytes)
        if keys.relin_key.shoup is not None else 0)
    pb = 0
    for pack in getattr(scheme.evaluator, "_key_packs", {}).values():
        pb += int(pack.ksk.nbytes)
        if pack.ksk_shoup is not None:
            pb += int(pack.ksk_shoup.nbytes)
    print(f"original galois keys: {fmt(kb)} ({len(keys.galois_keys)})")
    print(f"relin key: {fmt(rb)}")
    print(f"key packs: {fmt(pb)} "
          f"({len(getattr(scheme.evaluator, '_key_packs', {}))})")

    # distinct program signatures (compile count forecast)
    sigs = {}
    for name, module in net.named_modules():
        if not module.is_leaf():
            continue
        sig_fn = getattr(module, "program_signature", None)
        s = sig_fn() if sig_fn else id(module)
        sigs.setdefault(s if isinstance(s, int) else hash(s),
                        []).append(name)
    n_shared = sum(1 for v in sigs.values() if len(v) > 1)
    print(f"\nprogram signatures: {len(sigs)} distinct for "
          f"{sum(len(v) for v in sigs.values())} leaf modules "
          f"({n_shared} shared)")


if __name__ == "__main__":
    main()
