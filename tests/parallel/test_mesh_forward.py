"""A compiled network running sharded on a device mesh (runtime/mesh.py).

Exercises the full pipeline — fit -> compile -> encrypt -> SHARDED
forward -> decrypt — over a (dp, limb) mesh: the encrypted-query batch is
sharded over dp and the RNS-limb axis of every ciphertext over limb, so
the circuit's key-switches execute limb-sharded under XLA SPMD.
Green-field vs the reference (SURVEY §2.7: no distributed execution).
"""

import numpy as np

import jax
from jax.sharding import Mesh

import orion_tpu.nn as on
from orion_tpu.runtime.mesh import encrypt_batch, make_sharded_forward
from orion_tpu.runtime.scheme import Scheme


class TinyMLP(on.Module):
    def __init__(self):
        super().__init__()
        self.flatten = on.Flatten()
        self.fc1 = on.Linear(16, 8)
        self.act1 = on.Quad()
        self.fc2 = on.Linear(8, 4)

    def forward(self, x):
        return self.fc2(self.act1(self.fc1(self.flatten(x))))


def test_sharded_model_forward():
    n = min(8, len(jax.devices()))
    dp, limb = (n // 2, 2) if n % 2 == 0 else (n, 1)
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(dp, limb),
                axis_names=("dp", "limb"))

    scheme = Scheme().init_scheme(dict(
        ckks_params=dict(LogN=8, LogQ=[29, 26, 26, 26], LogP=[29, 29],
                         LogScale=26, H=64),
        orion=dict(margin=2, embedding_method="hybrid", backend="tpu",
                   fuse_modules=True, debug=False, io_mode="none"),
    ))
    rng = np.random.default_rng(1)
    fit_data = [rng.uniform(-1, 1, (1, 1, 4, 4)).astype(np.float32)
                for _ in range(32)]

    net = TinyMLP()
    net.eval()
    queries = [rng.uniform(-1, 1, (1, 1, 4, 4)).astype(np.float32)
               for _ in range(dp)]
    clear = [np.asarray(net(q)).reshape(-1) for q in queries]

    scheme.fit(net, fit_data, batch_size=16)
    input_level = scheme.compile(net)
    net.he()

    batch = encrypt_batch(scheme, queries, input_level)
    fwd = make_sharded_forward(net, scheme, mesh)
    outs = fwd(batch)
    for want, out in zip(clear, outs):
        got = np.asarray(out.decrypt().decode()).reshape(-1)[: want.size]
        assert float(np.max(np.abs(got - want))) < 5e-3
