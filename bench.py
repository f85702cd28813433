"""Benchmark: encrypted MLP forward latency on the current backend.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's flagship pipeline (`examples/run_mlp.py`,
MLP/MNIST at LogN 13, L_eff 5 — `configs/mlp.yml`) run end-to-end, timing
the steady-state encrypted forward pass as one jitted XLA program.

vs_baseline: the reference publishes no measured numbers (BASELINE.md); its
own analytical CPU latency model (`orion/core/level_dag.py:190-194`,
t = 0.001 * n_diagonals * level per linear transform) evaluated on THIS
compiled network is the baseline.  vs_baseline = model_seconds / ours
(>1 means faster than the reference's model of itself, which also excludes
activation/BN cost, so the comparison is conservative in the reference's
favor).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def main():
    import jax
    import orion_tpu as orion
    import orion_tpu.models as models
    from orion_tpu.nn.linear import LinearTransform
    from orion_tpu.runtime.jit import make_jitted_forward
    from orion_tpu.utils import get_mnist_datasets, mae

    cfg = str(Path(__file__).parent / "configs" / "mlp.yml")
    scheme = orion.init_scheme(cfg)
    trainloader, testloader = get_mnist_datasets(batch_size=1)
    net = models.MLP()
    inp, _ = next(iter(testloader))
    net.eval()
    out_clear = np.asarray(net(inp)).reshape(-1)

    orion.fit(net, trainloader)
    input_level = orion.compile(net)

    # reference analytical model on this compiled net (CPU/Lattigo fit)
    base = scheme.params.base_level
    model_s = 0.0
    for m in net.modules():
        if isinstance(m, LinearTransform) and m.diagonals:
            ndiags = sum(len(d) for d in m.diagonals.values())
            model_s += 0.001 * ndiags * max(m.level - base, 1)

    vec = orion.encode(inp, input_level)
    ct = orion.encrypt(vec)
    net.he()
    forward = make_jitted_forward(net, scheme)

    out = forward(ct)
    jax.block_until_ready(out.cts[0].data)  # compile + warm

    times = []
    for _ in range(5):
        t0 = time.time()
        out = forward(ct)
        jax.block_until_ready(out.cts[0].data)
        times.append(time.time() - t0)
    steady = float(np.median(times))

    # sanity: decrypted output must match cleartext
    out_fhe = np.asarray(out.decrypt().decode()).reshape(-1)
    dist = mae(out_clear, out_fhe[: out_clear.size])
    assert dist < 0.005, f"accuracy regression: MAE={dist}"

    print(json.dumps({
        "metric": "mlp_fhe_forward_latency",
        "value": steady,
        "unit": "s",
        "vs_baseline": model_s / steady,
    }))


if __name__ == "__main__":
    main()
