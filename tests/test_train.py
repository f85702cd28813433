"""Exercise the cleartext trainer (orion_tpu/train.py) in the default tier.

Reference parity: `orion/core/utils.py:313-461` (SGD train/test loops with
best-checkpoint saving).  Covers: functional build of a traced net, two jit
train steps (loss decreases), checkpoint save/load round-trip, and
write_back into the modules so a subsequent fit/compile sees the trained
weights.
"""

import numpy as np
import pytest

import orion_tpu.nn as on
from orion_tpu.train import (build_functional, load_checkpoint,
                             save_checkpoint, train, write_back)

RNG = np.random.default_rng(7)


class TinyNet(on.Module):
    def __init__(self):
        super().__init__()
        self.flatten = on.Flatten()
        self.fc1 = on.Linear(8, 8)
        self.bn1 = on.BatchNorm1d(8)
        self.act1 = on.ReLU()
        self.fc2 = on.Linear(8, 3)

    def forward(self, x):
        x = self.flatten(x)
        x = self.act1(self.bn1(self.fc1(x)))
        return self.fc2(x)


def _synthetic_loader(n_batches=4, batch=16):
    """Linearly-separable-ish synthetic data so 2 steps measurably help."""
    batches = []
    w = RNG.normal(size=(8, 3))
    for _ in range(n_batches):
        x = RNG.normal(size=(batch, 8)).astype(np.float32)
        y = np.argmax(x @ w, axis=-1).astype(np.int64)
        batches.append((x, y))
    return batches


def test_train_two_steps_and_checkpoint(tmp_path):
    net = TinyNet()
    loader = _synthetic_loader()
    ckpt = str(tmp_path / "tiny.npz")

    w_before = np.array(net.fc1.weight.data)

    trained = train(net, loader, testloader=loader, epochs=2, lr=0.05,
                    checkpoint_path=ckpt, log_every=0)
    assert trained is net

    # write_back happened: module weights moved from their init values
    w_after = np.array(net.fc1.weight.data)
    assert not np.allclose(w_before, w_after)
    # BN running stats were written back from the train-mode EMA
    assert not np.allclose(net.bn1.running_mean, np.zeros(8))

    # checkpoint round-trip: load -> same values the loop saved
    params = load_checkpoint(ckpt)
    assert set(params) >= {"fc1", "fc2"}
    assert params["fc1"]["w"].shape == (8, 8)

    # loading into a FRESH net reproduces the trained forward exactly
    net2 = TinyNet()
    sample = loader[0][0]
    apply2, params2, state2, modules2 = build_functional(net2, sample)
    # graft the checkpointed params + the trained net's BN stats
    for name in params:
        params2[name] = {k: np.asarray(v) for k, v in params[name].items()}
    state2["bn1"] = {"mean": np.asarray(net.bn1.running_mean),
                     "var": np.asarray(net.bn1.running_var)}
    write_back(net2, params2, state2, modules2)
    np.testing.assert_allclose(
        np.array(net2.fc1.weight.data), params["fc1"]["w"], rtol=1e-6)

    out1, _ = apply2(params2, state2, sample, train=False)
    apply1, params1, state1, _ = build_functional(net, sample)
    out_ref, _ = apply1(params1, state1, sample, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out_ref),
                               atol=1e-5)


def test_loss_decreases():
    net = TinyNet()
    loader = _synthetic_loader(n_batches=8, batch=32)
    sample = loader[0][0]
    apply, params, state, _ = build_functional(net, sample)

    import jax
    import jax.numpy as jnp
    import optax

    def loss_of(params, state):
        tot = 0.0
        for x, y in loader:
            logits, _ = apply(params, state, jnp.asarray(x), train=False)
            onehot = jax.nn.one_hot(jnp.asarray(y), 3)
            tot += float(
                optax.softmax_cross_entropy(logits, onehot).mean())
        return tot / len(loader)

    before = loss_of(params, state)
    train(net, loader, epochs=2, lr=0.05, log_every=0)
    apply2, params2, state2, _ = build_functional(net, sample)
    after = loss_of(params2, state2)
    assert after < before, (before, after)


def test_save_load_checkpoint_roundtrip(tmp_path):
    params = {"fc1": {"w": RNG.normal(size=(4, 4)).astype(np.float32),
                      "b": RNG.normal(size=4).astype(np.float32)},
              "fc2": {"w": RNG.normal(size=(2, 4)).astype(np.float32)}}
    path = str(tmp_path / "p.npz")
    save_checkpoint(params, path)
    back = load_checkpoint(path)
    assert set(back) == {"fc1", "fc2"}
    for name in params:
        for k in params[name]:
            np.testing.assert_array_equal(back[name][k], params[name][k])
