"""Torch-free module system for encrypted networks.

Reference parity: `orion/nn/module.py` (Module with scheme/margin class
attrs, level/depth/fused/he_mode instance attrs, train/eval/he mode
switches, @timer debug tracer).  The reference subclasses torch.nn.Module;
here modules are plain Python objects whose cleartext math is jax/numpy —
torch exists in this stack only as an optional weight-import path.

Submodules and parameters register automatically via __setattr__ (the
familiar ergonomics), and `named_modules()` drives the tracer/compiler.
"""

from __future__ import annotations

import functools
import time
from abc import ABC, abstractmethod

import numpy as np


class Parameter:
    """A mutable named array (numpy float32) — cleartext weights."""

    __slots__ = ("data",)

    def __init__(self, data):
        self.data = np.asarray(data, dtype=np.float32)

    @property
    def shape(self):
        return self.data.shape


class Module(ABC):
    scheme = None
    margin = None
    # optional observer fired with (module, output) after every leaf call,
    # in clear AND he mode — the noise profiler (diagnostics.py) uses it to
    # decrypt-and-compare at every module boundary without changing the
    # execution path (per-module jit outputs are concrete here)
    output_hook = None

    def __init__(self):
        object.__setattr__(self, "_modules", {})
        object.__setattr__(self, "_params", {})
        self.level = None
        self.depth = None
        self.fused = False
        self.he_mode = False
        self.training = True
        self.name = None

    # ----------------- registration ----------------- #

    def __setattr__(self, key, value):
        if isinstance(value, Module):
            self._modules[key] = value
        elif isinstance(value, Parameter):
            self._params[key] = value
        object.__setattr__(self, key, value)

    def children(self):
        return list(self._modules.values())

    def modules(self):
        """All modules in the tree, self first (reference .modules())."""
        out = [self]
        for m in self._modules.values():
            out.extend(m.modules())
        return out

    def named_modules(self, prefix: str = ""):
        yield prefix, self
        for name, m in self._modules.items():
            sub = f"{prefix}.{name}" if prefix else name
            yield from m.named_modules(sub)

    def is_leaf(self) -> bool:
        if isinstance(self, (Sequential, ModuleList)):
            return False
        # an auto-placed Bootstrap (module.post_bootstrap = ...) registers
        # as a child, but it runs AFTER the module in __call__, outside the
        # module's own program — it must not demote its host from leaf
        # status (a non-leaf host would silently skip the per-module jit
        # runner and execute its linear transform eagerly: on ResNet-20
        # that was 24 hosts running unjitted)
        return not any(k != "post_bootstrap" for k in self._modules)

    # ----------------- scheme / modes ----------------- #

    @staticmethod
    def set_scheme(scheme):
        Module.scheme = scheme

    @staticmethod
    def set_margin(margin):
        Module.margin = margin

    def _set_mode_for_all(self, he_mode=False, training=True):
        for m in self.modules():
            m.training = training
            m.he_mode = he_mode

    def train(self, mode=True):
        self._set_mode_for_all(he_mode=False, training=mode)

    def eval(self):
        self._set_mode_for_all(he_mode=False, training=False)

    def he(self):
        self._set_mode_for_all(he_mode=True, training=False)

    def set_depth(self, depth):
        self.depth = depth

    def set_level(self, level):
        self.level = level

    # ----------------- call / trace ----------------- #

    def __call__(self, *args):
        from ..compiler.tracer import active_tracer
        tr = active_tracer()
        if tr is not None and self.is_leaf():
            return tr.run_leaf(self, args)
        if self.he_mode and self.level is not None:
            # Align ciphertext inputs DOWN to the solver-assigned input
            # level: a bootstrap can refresh a ciphertext above the level
            # the compile-time plan assumed for the layers that follow, and
            # every compile-time scale choice (plaintext encodings at q_l,
            # _Sign's exact-rescale pin) is made against the PLANNED level
            # trajectory.  Dropping here makes runtime trajectory == plan by
            # construction — the TPU analog of the reference backend's
            # ModDrop insertion before every op
            # (`orion/backend/heongpu/bindings.py:1491-1553`).  The drop is
            # eager metadata (a limb slice), so shared jit programs also see
            # identical level signatures.
            args = tuple(
                a.mod_drop(self.level)
                if hasattr(a, "mod_drop") and hasattr(a, "level")
                and callable(getattr(a, "level", None))
                and a.level() > self.level else a
                for a in args)
        runner = (getattr(self.scheme, "module_runner", None)
                  if self.he_mode and self.scheme is not None else None)
        if runner is not None and self.is_leaf() and \
                any(hasattr(a, "cts") for a in args):
            out = runner(self, args)
        else:
            out = self.forward(*args)
        pb = getattr(self, "post_bootstrap", None)
        if pb is not None and self.he_mode:
            out = pb(out)
        hook = Module.output_hook
        if hook is not None and self.is_leaf():
            hook(self, out)
        return out

    @abstractmethod
    def forward(self, *x):
        raise NotImplementedError

    def __repr__(self):
        inner = ", ".join(f"{k}" for k in self._modules)
        return f"{type(self).__name__}(level={self.level}{', ' + inner if inner else ''})"


class Sequential(Module):
    """Container executing submodules in order (reference nn.Sequential)."""

    def __init__(self, *mods):
        super().__init__()
        for i, m in enumerate(mods):
            setattr(self, str(i), m)

    def __iter__(self):
        return iter(self._modules.values())

    def __len__(self):
        return len(self._modules)

    def __getitem__(self, idx):
        return list(self._modules.values())[idx]

    def forward(self, x):
        for m in self._modules.values():
            x = m(x)
        return x


class ModuleList(Module):
    def __init__(self, mods=()):
        super().__init__()
        for i, m in enumerate(mods):
            setattr(self, str(i), m)

    def __iter__(self):
        return iter(self._modules.values())

    def __len__(self):
        return len(self._modules)

    def __getitem__(self, idx):
        return list(self._modules.values())[idx]

    def append(self, m):
        setattr(self, str(len(self._modules)), m)

    def forward(self, *x):
        raise RuntimeError("ModuleList is not callable")


def host_cpu():
    """Context manager pinning eager cleartext math to the host CPU device.

    Under the TPU backend, eager per-op dispatch round-trips the device for
    every tiny op — statistics fitting is client-side host work.
    """
    import jax
    return jax.default_device(jax.devices("cpu")[0])


def timer(func):
    """Debug tracer: per-layer wall time + clear-vs-FHE ranges
    (reference `orion/nn/module.py:67-104`)."""

    def _is_traced(x):
        # debug decrypt/min/max is only possible on CONCRETE ciphertexts;
        # under per-module jit the forward runs on tracers and the FHE
        # range printout must be skipped (the wall time still prints)
        import jax
        cts = getattr(x, "cts", None)
        return bool(cts) and isinstance(cts[0].data, jax.core.Tracer)

    @functools.wraps(func)
    def wrapper(self, *args, **kwargs):
        if not self.he_mode or self.scheme is None:
            return func(self, *args, **kwargs)
        debug = self.scheme.params.debug
        if debug:
            name = self.name or type(self).__name__
            print(f"\n{name}:")
            if hasattr(self, "input_min"):
                print(f"Clear input min/max: {self.input_min:.3f} / "
                      f"{self.input_max:.3f}")
            if args and hasattr(args[0], "min") and not _is_traced(args[0]):
                print(f"FHE input min/max: {args[0].min():.3f} / "
                      f"{args[0].max():.3f}")
            start = time.time()
        result = func(self, *args, **kwargs)
        if debug:
            omin = getattr(self, "output_min", getattr(self, "input_min", 0.0))
            omax = getattr(self, "output_max", getattr(self, "input_max", 0.0))
            elapsed = time.time() - start
            print(f"Clear output min/max: {omin:.3f} / {omax:.3f}")
            if hasattr(result, "min") and not _is_traced(result):
                print(f"FHE output min/max: {result.min():.3f} / "
                      f"{result.max():.3f}")
            print(f"done! [{elapsed:.3f} secs.]")
        return result

    return wrapper
