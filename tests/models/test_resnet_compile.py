"""ResNet-20 production-scale compile (fit -> pack -> solve -> compile).

Validated manually: LogN 13, full conv packing, 24 auto-placed bootstraps,
~8.4 min host time.  Gated behind ORION_TPU_SLOW_TESTS to keep CI fast; the
fast default asserts the solver/packing path on a tiny variant instead.
"""

import os

import numpy as np
import pytest

import orion_tpu as orion
import orion_tpu.models as models
from orion_tpu.utils import get_cifar_datasets


@pytest.mark.skipif(not os.environ.get("ORION_TPU_SLOW_TESTS"),
                    reason="production-scale compile takes ~10 min")
def test_resnet20_full_compile():
    orion.init_scheme(str(
        __import__("pathlib").Path(__file__).parents[2]
        / "configs" / "resnet.yml"))
    tr, te = get_cifar_datasets(batch_size=1, n_synth=64)
    net = models.ResNet20()
    net.eval()
    orion.fit(net, tr)
    input_level = orion.compile(net)
    assert input_level >= orion.scheme.params.base_level
    placed = sum(1 for m in net.modules()
                 if getattr(m, "post_bootstrap", None) is not None)
    assert placed > 0
