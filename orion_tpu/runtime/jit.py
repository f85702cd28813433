"""Whole-network jit: compile an encrypted forward pass to ONE XLA program.

This is the TPU-native replacement for the reference's per-op FFI dispatch
(`orion/backend/lattigo/bindings.py`): because every homomorphic op is a
pure jnp function over Ciphertext pytrees, the entire `net.he()` forward
traces into a single XLA computation (per level-signature), letting XLA
fuse NTT stages, key-switch inner products and elementwise ops across
layers.  Eager dispatch on the TPU backend is pathological (each op would
compile separately); always use this wrapper for device execution.
"""

from __future__ import annotations

import jax

from ..crypto.ciphertext import Ciphertext
from .tensors import CipherTensor


def make_jitted_forward(net, scheme):
    """Returns fn(ctensor) -> ctensor running net's he-forward under jit.

    Output metadata (levels/scales/shapes) is captured during tracing via a
    side channel — it is deterministic for a compiled network.
    """
    meta = {}

    def flat_forward(datas, levels, scales, shape, on_shape):
        cts = [Ciphertext(d, lv, sc)
               for d, lv, sc in zip(datas, levels, scales)]
        ctin = CipherTensor(scheme, cts, shape, on_shape)
        out = net(ctin)
        meta["out"] = ([ct.level for ct in out.cts],
                       [ct.scale for ct in out.cts],
                       out.shape, out.on_shape)
        return [ct.data for ct in out.cts]

    jitted = jax.jit(flat_forward,
                     static_argnames=("levels", "scales", "shape", "on_shape"))

    def run(ctensor: CipherTensor) -> CipherTensor:
        datas = [ct.data for ct in ctensor.cts]
        levels = tuple(ct.level for ct in ctensor.cts)
        scales = tuple(ct.scale for ct in ctensor.cts)
        out_datas = jitted(datas, levels, scales,
                           tuple(ctensor.shape), tuple(ctensor.on_shape))
        lv, sc, shape, on_shape = meta["out"]
        cts = [Ciphertext(d, l, s) for d, l, s in zip(out_datas, lv, sc)]
        return CipherTensor(scheme, cts, shape, on_shape)

    return run


def make_module_runner(scheme):
    """Per-leaf-module jit: each layer compiles to its own cached XLA
    program keyed by (program signature, ciphertext signature).

    For deep bootstrapped networks a single whole-network program would be
    millions of HLO ops; per-module programs stay bounded, and REPEATED
    structures share one compiled program: a module may define
    `program_signature()` returning a hashable that captures every value its
    forward BAKES into the trace (levels, scales, scan index arrays, poly
    coefficients...).  Two modules with equal signatures and equal buffer
    shapes reuse the same XLA executable with their own buffer values —
    e.g. the 24 Bootstrap modules of a ResNet compile ~once per tensor
    shape, not 24 times.  Default signature is id(module) (no sharing).

    All large device buffers (packed diagonals, key material, module
    plaintexts) are passed as jit ARGUMENTS via swap-during-trace
    (runtime/buffers.py) so programs carry shapes, not gigabytes of
    constants — required by the remote-compile transport and healthy
    everywhere.
    """
    import os
    import time

    from .buffers import collect_swappables

    cache = {}
    swaps_by_module = {}
    log = os.environ.get("ORION_TPU_JIT_LOG", "") not in ("", "0")

    def run(module, args):
        spec = []
        flat = []
        for a in args:
            if isinstance(a, CipherTensor):
                spec.append(("ct",
                             tuple((c.level, c.scale) for c in a.cts),
                             tuple(a.shape), tuple(a.on_shape)))
                flat.extend(c.data for c in a.cts)
            else:
                spec.append(("static", a))
        if id(module) not in swaps_by_module:
            swaps_by_module[id(module)] = collect_swappables(scheme, module)
        swaps = swaps_by_module[id(module)]
        sig_fn = getattr(module, "program_signature", None)
        if sig_fn is not None:
            bufsig = tuple(
                (v.shape, str(v.dtype)) if hasattr(v, "shape") else None
                for v in (sw.getter() for sw in swaps))
            sig = (sig_fn(), bufsig)
        else:
            sig = id(module)
        key = (sig, tuple(spec))
        if key not in cache:
            side = {}

            def fn(flat_datas, bufs, _spec=tuple(spec), _module=module,
                   _side=side, _swaps=swaps):
                for sw, v in zip(_swaps, bufs):
                    sw.save_and_set(v)
                try:
                    it = iter(flat_datas)
                    rebuilt = []
                    for s in _spec:
                        if s[0] == "ct":
                            cts = [Ciphertext(next(it), lv, sc)
                                   for (lv, sc) in s[1]]
                            rebuilt.append(
                                CipherTensor(scheme, cts, s[2], s[3]))
                        else:
                            rebuilt.append(s[1])
                    out = _module.forward(*rebuilt)
                finally:
                    for sw in _swaps:
                        sw.restore()
                _side["meta"] = ([c.level for c in out.cts],
                                 [c.scale for c in out.cts],
                                 out.shape, out.on_shape)
                return [c.data for c in out.cts]

            cache[key] = (jax.jit(fn), side)
            if log:
                bufs = [sw.getter() for sw in swaps]
                mb = sum(getattr(b, "nbytes", 0) for b in bufs) / 1e6
                name = getattr(module, "_orion_name", None) or \
                    type(module).__name__
                print(f"[jit] NEW program for {name} "
                      f"(bufs {mb:.0f} MB, {len(cache)} programs so far)",
                      flush=True)
                t0 = time.time()
                outs = cache[key][0](flat, bufs)
                jax.block_until_ready(outs)
                print(f"[jit] {name}: compile+run {time.time()-t0:.1f}s",
                      flush=True)
                lv, sc, shape, on_shape = cache[key][1]["meta"]
                return CipherTensor(
                    scheme,
                    [Ciphertext(d, l, s)
                     for d, l, s in zip(outs, lv, sc)], shape, on_shape)
        jf, side = cache[key]
        outs = jf(flat, [sw.getter() for sw in swaps])
        lv, sc, shape, on_shape = side["meta"]
        cts = [Ciphertext(d, l, s) for d, l, s in zip(outs, lv, sc)]
        return CipherTensor(scheme, cts, shape, on_shape)

    return run


def enable_module_jit(scheme):
    """Switch the scheme's encrypted forwards to per-module jit."""
    scheme.module_runner = make_module_runner(scheme)
    return scheme.module_runner
