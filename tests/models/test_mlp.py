"""End-to-end encrypted MLP inference (mirror of the reference's
`tests/models/test_mlp.py`): full pipeline init_scheme -> fit -> compile ->
encode -> encrypt -> he() forward -> decrypt, MAE vs cleartext < 0.005."""

from pathlib import Path

import numpy as np

import orion_tpu as orion
import orion_tpu.models as models
from orion_tpu.utils import get_mnist_datasets, mae


def get_config_path(name):
    return str(Path(__file__).parent.parent / "configs" / name)


def test_mlp():
    orion.init_scheme(get_config_path("mlp.yml"))
    trainloader, testloader = get_mnist_datasets(batch_size=1)
    net = models.MLP()

    inp, _ = next(iter(testloader))

    net.eval()
    out_clear = net(inp)

    orion.fit(net, trainloader)
    input_level = orion.compile(net)

    vec_ptxt = orion.encode(inp, input_level)
    vec_ctxt = orion.encrypt(vec_ptxt)
    net.he()

    out_ctxt = net(vec_ctxt)

    out_ptxt = out_ctxt.decrypt()
    out_fhe = out_ptxt.decode()

    dist = mae(np.asarray(out_clear).reshape(-1),
               np.asarray(out_fhe).reshape(-1)[: np.asarray(out_clear).size])
    print(f"MAE: {dist}")
    assert dist < 0.005
