"""End-to-end encrypted LoLA: exercises conv Toeplitz packing, multiplexed
gap propagation, BN2d packing, and the conv->linear multiplexed interface."""

from pathlib import Path

import numpy as np

import orion_tpu as orion
import orion_tpu.models as models
from orion_tpu.utils import get_mnist_datasets, mae


def get_config_path(name):
    return str(Path(__file__).parent.parent / "configs" / name)


def test_lola():
    orion.init_scheme(get_config_path("mlp.yml"))
    trainloader, testloader = get_mnist_datasets(batch_size=1)
    net = models.LoLA()

    inp, _ = next(iter(testloader))
    net.eval()
    out_clear = net(inp)

    orion.fit(net, trainloader)
    input_level = orion.compile(net)

    vec_ctxt = orion.encrypt(orion.encode(inp, input_level))
    net.he()
    out_fhe = net(vec_ctxt).decrypt().decode()

    dist = mae(np.asarray(out_clear).reshape(-1),
               np.asarray(out_fhe).reshape(-1)[: np.asarray(out_clear).size])
    print(f"LoLA MAE: {dist}")
    assert dist < 0.005
