"""Cleartext training for orion_tpu networks (jax/optax).

Reference parity: `orion/core/utils.py:313-461` (SGD train/test loops with
best-checkpoint saving).  FHE is inference-only in both stacks; training
runs in cleartext.  TPU-native twist: the module graph is traced once, then
compiled into a pure jax function over a parameter pytree, so the whole
train step jits (and data-parallelises over a mesh — see parallel/).

Gradients: reference models' cleartext forwards are differentiable a.e.
(ReLU = x*step(x) has the usual subgradient; polynomial activations use
their smooth source functions during training, exactly like the reference
which fits polynomials only afterwards).
"""

from __future__ import annotations

import math

import numpy as np

from .compiler.tracer import Tracer
from .nn import (Add, AdaptiveAvgPool2d, AvgPool2d, BatchNormNd, Chebyshev,
                 Conv2d, Flatten, Identity, Linear, Mult, Quad, ReLU)
from .nn.activation import _Sign, Activation
from .nn.module import Module


# ------------------------------------------------------------------ #
#  Functional compilation                                            #
# ------------------------------------------------------------------ #

def _leaf_apply(module):
    """Returns (param_init, state_init, fn(params, state, xs, train))."""
    import jax
    import jax.numpy as jnp

    if isinstance(module, Linear):
        params = {"w": jnp.asarray(module.weight.data)}
        if module.bias is not None:
            params["b"] = jnp.asarray(module.bias.data)

        def fn(p, s, xs, train):
            out = xs[0].reshape(xs[0].shape[0], -1) @ p["w"].T
            if "b" in p:
                out = out + p["b"]
            return out, s
        return params, {}, fn

    if isinstance(module, AdaptiveAvgPool2d):
        ho, wo = module.output_size

        def fn(p, s, xs, train):
            x = xs[0]
            n, c, h, w = x.shape
            return x.reshape(n, c, ho, h // ho, wo, w // wo).mean(
                axis=(3, 5)), s
        return {}, {}, fn

    if isinstance(module, AvgPool2d):
        kh, kw = module.kernel_size
        stride = module.stride
        pad = module.padding

        def fn(p, s, xs, train):
            x = xs[0]
            c = x.shape[1]
            w = jnp.full((c, 1, kh, kw), 1.0 / (kh * kw), dtype=x.dtype)
            out = jax.lax.conv_general_dilated(
                x, w, window_strides=stride,
                padding=[(pad[0], pad[0]), (pad[1], pad[1])],
                feature_group_count=c,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return out, s
        return {}, {}, fn

    if isinstance(module, Conv2d):
        params = {"w": jnp.asarray(module.weight.data)}
        if module.bias is not None:
            params["b"] = jnp.asarray(module.bias.data)
        stride, pad, dil, groups = (module.stride, module.padding,
                                    module.dilation, module.groups)

        def fn(p, s, xs, train):
            out = jax.lax.conv_general_dilated(
                xs[0], p["w"], window_strides=stride,
                padding=[(pad[0], pad[0]), (pad[1], pad[1])],
                rhs_dilation=dil, feature_group_count=groups,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            if "b" in p:
                out = out + p["b"][None, :, None, None]
            return out, s
        return params, {}, fn

    if isinstance(module, BatchNormNd):
        params = {}
        if module.affine:
            params = {"g": jnp.asarray(module.weight.data),
                      "b": jnp.asarray(module.bias.data)}
        state = {"mean": jnp.asarray(module.running_mean),
                 "var": jnp.asarray(module.running_var)}
        eps, mom = module.eps, module.momentum

        def fn(p, s, xs, train):
            x = xs[0]
            shape = (1, -1) + (1,) * (x.ndim - 2)
            if train:
                axes = (0,) + tuple(range(2, x.ndim))
                mean = x.mean(axis=axes)
                var = x.var(axis=axes)
                new_s = {"mean": (1 - mom) * s["mean"] + mom * mean,
                         "var": (1 - mom) * s["var"] + mom * var}
            else:
                mean, var = s["mean"], s["var"]
                new_s = s
            out = (x - mean.reshape(shape)) * jax.lax.rsqrt(
                var.reshape(shape) + eps)
            if p:
                out = out * p["g"].reshape(shape) + p["b"].reshape(shape)
            return out, new_s
        return params, state, fn

    if isinstance(module, Quad):
        return {}, {}, lambda p, s, xs, train: (xs[0] * xs[0], s)

    if isinstance(module, ReLU):
        return {}, {}, lambda p, s, xs, train: (
            jax.nn.relu(xs[0]), s)

    if isinstance(module, Chebyshev):
        from .nn.activation import (ELU, GELU, SELU, Hardshrink, Mish,
                                    Sigmoid, SiLU, Softplus)
        if isinstance(module, SiLU):
            g = jax.nn.silu
        elif isinstance(module, GELU):
            g = jax.nn.gelu
        elif isinstance(module, Sigmoid):
            g = jax.nn.sigmoid
        elif isinstance(module, SELU):
            g = jax.nn.selu
        elif isinstance(module, Softplus):
            g = jax.nn.softplus
        elif isinstance(module, Mish):
            g = lambda x: x * jnp.tanh(jax.nn.softplus(x))
        elif isinstance(module, ELU):
            alpha = module.alpha
            g = lambda x: jax.nn.elu(x, alpha)
        elif isinstance(module, Hardshrink):
            lam = module.lambd
            g = lambda x: jnp.where((x > lam) | (x < -lam), x, 0.0)
        else:
            raise NotImplementedError(
                f"no jax form for {type(module).__name__}; training uses the "
                "smooth source function")
        return {}, {}, lambda p, s, xs, train: (g(xs[0]), s)

    if isinstance(module, Activation):
        coeffs = list(module.coeffs)

        def fn(p, s, xs, train):
            out = jnp.zeros_like(xs[0])
            for c in coeffs:
                out = c + xs[0] * out
            return out, s
        return {}, {}, fn

    if isinstance(module, Add):
        return {}, {}, lambda p, s, xs, train: (xs[0] + xs[1], s)

    if isinstance(module, Mult):
        return {}, {}, lambda p, s, xs, train: (xs[0] * xs[1], s)

    if isinstance(module, Flatten):
        return {}, {}, lambda p, s, xs, train: (
            xs[0].reshape(xs[0].shape[0], -1), s)

    if isinstance(module, (Identity, _Sign)):
        return {}, {}, lambda p, s, xs, train: (xs[0], s)

    raise NotImplementedError(
        f"no functional form for {type(module).__name__}")


def build_functional(net: Module, sample: np.ndarray):
    """Trace the net and return (apply, params, state, modules_by_name).

    apply(params, state, x, train) -> (logits, new_state); pure/jittable.
    """
    # ReLU sub-structure (mult/sign) must not be traced as separate leaves
    # during TRAINING functionalisation: treat ReLU itself as a leaf.
    orig = Module.is_leaf

    def patched(self):
        if isinstance(self, (ReLU,)):
            return True
        if isinstance(self, _Sign):
            return True
        return orig(self)

    Module.is_leaf = patched
    try:
        tracer = Tracer(net)
        net.eval()
        tracer.propagate(sample)
    finally:
        Module.is_leaf = orig

    order = [n for n in tracer.order if n != "_input"]
    nodes = tracer.nodes
    params, state, fns = {}, {}, {}
    for name in order:
        module = nodes[name].module
        p, s, fn = _leaf_apply(module)
        if p:
            params[name] = p
        if s:
            state[name] = s
        fns[name] = fn

    out_node = tracer.output_node

    def apply(params, state, x, train=False):
        vals = {"_input": x}
        new_state = dict(state)
        for name in order:
            parents = nodes[name].parents
            xs = [vals[p] for p in parents]
            y, ns = fns[name](params.get(name, {}),
                              new_state.get(name, {}), xs, train)
            if ns:
                new_state[name] = ns
            vals[name] = y
        return vals[out_node], new_state

    modules = {name: nodes[name].module for name in order}
    return apply, params, state, modules


def write_back(net: Module, params, state, modules):
    """Copy trained parameters/statistics back into the modules."""
    for name, module in modules.items():
        p = params.get(name, {})
        if isinstance(module, (Linear, Conv2d)) and "w" in p:
            module.weight.data = np.asarray(p["w"], dtype=np.float32)
            if module.bias is not None and "b" in p:
                module.bias.data = np.asarray(p["b"], dtype=np.float32)
        if isinstance(module, BatchNormNd):
            s = state.get(name)
            if s is not None:
                module.running_mean = np.asarray(s["mean"], np.float32)
                module.running_var = np.asarray(s["var"], np.float32)
            if module.affine and p:
                module.weight.data = np.asarray(p["g"], np.float32)
                module.bias.data = np.asarray(p["b"], np.float32)


# ------------------------------------------------------------------ #
#  Train / test loops                                                #
# ------------------------------------------------------------------ #

def save_checkpoint(params, path):
    """Flatten a params pytree ({layer: {k: array}}) into one .npz file.

    Reference parity: `orion/core/utils.py:380-389` (torch.save of the best
    state_dict during training) — ours is a numpy archive keyed
    "layer/param" so it round-trips without torch.
    """
    flat = {}
    for name, p in params.items():
        for k, v in p.items():
            flat[f"{name}/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_checkpoint(path):
    """Inverse of save_checkpoint: returns the nested params dict."""
    params: dict = {}
    with np.load(path) as data:
        for key in data.files:
            name, k = key.rsplit("/", 1)
            params.setdefault(name, {})[k] = np.asarray(data[key])
    return params


def train(net: Module, trainloader, testloader=None, epochs: int = 1,
          lr: float = 0.05, momentum: float = 0.9, weight_decay: float = 5e-4,
          checkpoint_path: str | None = None, log_every: int = 50):
    """SGD training loop (reference `utils.py` train/train_epoch parity)."""
    import jax
    import jax.numpy as jnp
    import optax

    sample = next(iter(trainloader))[0]
    apply, params, state, modules = build_functional(
        net, np.asarray(sample))

    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, x, y):
        def loss_fn(p):
            logits, new_s = apply(p, state, x, train=True)
            onehot = jax.nn.one_hot(y, logits.shape[-1])
            loss = optax.softmax_cross_entropy(logits, onehot).mean()
            return loss, new_s
        (loss, new_s), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_s, opt_state, loss

    @jax.jit
    def eval_step(params, state, x):
        logits, _ = apply(params, state, x, train=False)
        return jnp.argmax(logits, axis=-1)

    best_acc = -1.0
    for epoch in range(epochs):
        losses = []
        for i, (x, y) in enumerate(trainloader):
            params, state, opt_state, loss = step(
                params, state, opt_state,
                jnp.asarray(np.asarray(x)), jnp.asarray(np.asarray(y)))
            losses.append(float(loss))
            if log_every and i % log_every == 0:
                print(f"epoch {epoch} step {i}: loss {float(loss):.4f}")
        acc = None
        if testloader is not None:
            correct = total = 0
            for x, y in testloader:
                pred = eval_step(params, state, jnp.asarray(np.asarray(x)))
                correct += int((np.asarray(pred) == np.asarray(y)).sum())
                total += len(np.asarray(y))
            acc = correct / max(total, 1)
            print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
                  f"test acc {acc:.4f}")
            if checkpoint_path and acc > best_acc:
                best_acc = acc
                save_checkpoint(params, checkpoint_path)
    write_back(net, params, state, modules)
    return net


def train_on_mnist(net, data_dir="./data", epochs=1, batch_size=128, **kw):
    from .utils import get_mnist_datasets
    tr, te = get_mnist_datasets(data_dir, batch_size=batch_size)
    return train(net, tr, te, epochs=epochs, **kw)


def train_on_cifar(net, data_dir="./data", epochs=1, batch_size=128, **kw):
    from .utils import get_cifar_datasets
    tr, te = get_cifar_datasets(data_dir, batch_size=batch_size)
    return train(net, tr, te, epochs=epochs, **kw)
