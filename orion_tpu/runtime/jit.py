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

import os
import time

import jax
import jax.numpy as jnp

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


def make_batched_forward(net, scheme):
    """Serve a BATCH of encrypted queries as ONE vmapped XLA program.

    The per-op microbench shows the VPU runs ~7x more ct-ct mults/s when
    ciphertexts are stacked on a leading axis (wide arrays amortise
    per-op overhead and fill the 8x128 vector lanes); this wrapper is the
    serving-path integration: B queries' ciphertext data is stacked on a
    new leading axis and the whole network forward is `jax.vmap`ped over
    it, so every kernel in the circuit — NTT stages, key-switch inner
    products, diagonal scans — sees the batch as one wide operation.

    All queries must share the compiled network's input level/scale
    (always true for a served model).  Returns
    ``run(list[CipherTensor]) -> list[CipherTensor]``.

    The reference has no counterpart (its evaluator dispatches one
    ciphertext per FFI call, `orion/backend/lattigo/evaluator.go:49-317`);
    this is MXU/VPU-era batching applied to FHE serving.
    """
    meta = {}

    def one(datas, levels, scales, shape, on_shape):
        cts = [Ciphertext(d, lv, sc)
               for d, lv, sc in zip(datas, levels, scales)]
        out = net(CipherTensor(scheme, cts, shape, on_shape))
        meta["out"] = ([ct.level for ct in out.cts],
                       [ct.scale for ct in out.cts],
                       out.shape, out.on_shape)
        return [ct.data for ct in out.cts]

    import functools

    @functools.partial(
        jax.jit, static_argnames=("levels", "scales", "shape", "on_shape"))
    def batched(stacked, levels, scales, shape, on_shape):
        return jax.vmap(
            lambda ds: one(ds, levels, scales, shape, on_shape))(stacked)

    import jax.numpy as jnp

    def run(ctensors):
        t0 = ctensors[0]
        levels = tuple(ct.level for ct in t0.cts)
        scales = tuple(ct.scale for ct in t0.cts)
        stacked = [jnp.stack([t.cts[i].data for t in ctensors])
                   for i in range(len(t0.cts))]
        outs = batched(stacked, levels, scales,
                       tuple(t0.shape), tuple(t0.on_shape))
        lv, sc, shape, on_shape = meta["out"]
        return [CipherTensor(
            scheme,
            [Ciphertext(o[b], l, s) for o, l, s in zip(outs, lv, sc)],
            shape, on_shape) for b in range(len(ctensors))]

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
    # Steady-state residency policy: in stream mode buffers live in host
    # numpy and ride each call as jit arguments — correct for bounding
    # compile-time HBM, but a served model pays a host->device transfer of
    # every diagonal/KeyPack on EVERY inference.  Promote buffers to
    # device residency greedily (first-touch order — network order, which
    # is also reuse order) under an HBM byte budget; whatever exceeds the
    # budget keeps streaming.  Shared buffers (KeyPacks reused across
    # layers, bootstrap circuits) promote once — later modules see a
    # device array and skip.  ORION_TPU_RESIDENT_MB=0 disables.
    resident_budget = float(os.environ.get(
        "ORION_TPU_RESIDENT_MB", "4096")) * 1e6
    resident = {"bytes": 0}

    def _put(v):
        # mesh execution (runtime/mesh, parallel dryruns): buffers must be
        # committed REPLICATED onto the same mesh as the sharded ct args —
        # a single-device committed array mixed with mesh-sharded args is
        # an error.  scheme.pin_sharding (a NamedSharding) opts in.
        sh = getattr(scheme, "pin_sharding", None)
        return jax.device_put(v, sh) if sh is not None else jax.device_put(v)

    def _promote(swaps):
        import numpy as _np
        for sw in swaps:
            v = sw.getter()
            if isinstance(v, _np.ndarray) and \
                    resident["bytes"] + v.nbytes <= resident_budget:
                sw.setter(_put(v))
                resident["bytes"] += v.nbytes

    def run(module, args):
        if getattr(module, "phased", False):
            # Bootstrap modules: a single program spanning the whole
            # circuit is too large to compile; the bootstrapper jits its
            # pipeline phases itself (PhaseRunner), and the module's small
            # pre/post plaintext ops run as cached eager programs
            return module.forward(*args)
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
            swaps = collect_swappables(scheme, module)
            # shared buffers (bootstrapper circuit, relin key, context
            # tables) are pinned: move them to the device ONCE so stream
            # mode doesn't re-upload them on every invocation
            import numpy as _np
            for sw in swaps:
                if sw.pin_device:
                    v = sw.getter()
                    if isinstance(v, _np.ndarray):
                        sw.setter(_put(v))
            swaps_by_module[id(module)] = swaps
        swaps = swaps_by_module[id(module)]
        if resident_budget > 0:
            _promote(swaps)
        sig_fn = getattr(module, "program_signature", None)
        if sig_fn is not None:
            bufsig = tuple(
                (v.shape, str(v.dtype)) if hasattr(v, "shape") else None
                for v in (sw.getter() for sw in swaps))
            sig = (sig_fn(), bufsig)
        else:
            sig = id(module)
        key = (sig, tuple(spec))
        aot = getattr(scheme, "aot_pending", None)

        def fake_out(side):
            # discovery pass: return zero ciphertexts with the real
            # metadata/shapes so downstream modules trace their own
            # programs without executing this one
            lv, sc, shape, on_shape = side["meta"]
            cts = [Ciphertext(jnp.zeros(shp, dt), l, s)
                   for (shp, dt), l, s in zip(side["out_shapes"], lv, sc)]
            return CipherTensor(scheme, cts, shape, on_shape)

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

            jitted = jax.jit(fn)
            name = getattr(module, "_orion_name", None) or \
                type(module).__name__
            if aot is not None:
                # discovery pass: LOWER (traces fn, filling side["meta"])
                # but don't compile/execute — the pool compiles all
                # pending programs concurrently afterwards
                bufs = [sw.getter() for sw in swaps]
                lowered = jitted.lower(flat, bufs)
                side["out_shapes"] = [
                    (tuple(x.shape), x.dtype)
                    for x in jax.tree_util.tree_leaves(lowered.out_info)]
                cache[key] = (jitted, side)
                aot.append((key, cache, lowered, side, name))
                return fake_out(side)
            cache[key] = (jitted, side)
            if log:
                bufs = [sw.getter() for sw in swaps]
                mb = sum(getattr(b, "nbytes", 0) for b in bufs) / 1e6
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
        if aot is not None and "out_shapes" in side:
            # discovery pass over an already-lowered (possibly not yet
            # compiled) program: never execute, just propagate metadata
            return fake_out(side)
        outs = jf(flat, [sw.getter() for sw in swaps])
        lv, sc, shape, on_shape = side["meta"]
        cts = [Ciphertext(d, l, s) for d, l, s in zip(outs, lv, sc)]
        return CipherTensor(scheme, cts, shape, on_shape)

    return run


class PhaseRunner:
    """Jit sub-module pipeline phases (the bootstrap circuit) as separate
    cached programs.

    A whole bootstrap traced into one program is too large for compile
    services (it walks ~40 key-switches across the full chain); phases —
    ModRaise, each CtS/StC stage, extraction, EvalMod, recombination —
    compile independently and are shared by every Bootstrap module with
    the same circuit.  Buffers ride as call arguments via the same
    swap-during-trace mechanism as the module runner; pinned buffers are
    promoted to device residency once (they are shared across all 24
    bootstraps of a ResNet-20, so re-uploading host numpy per call would
    dominate).
    """

    def __init__(self, scheme):
        self.scheme = scheme
        self.cache = {}

    def run(self, tag, swaps, fn, *cts):
        import numpy as _np

        from ..crypto.ciphertext import Ciphertext

        pin_sh = getattr(self.scheme, "pin_sharding", None)
        for sw in swaps:
            v = sw.getter()
            if sw.pin_device and isinstance(v, _np.ndarray):
                sw.setter(jax.device_put(v) if pin_sh is None
                          else jax.device_put(v, pin_sh))
        bufsig = tuple(
            (getattr(v, "shape", None), str(getattr(v, "dtype", "")))
            for v in (sw.getter() for sw in swaps))
        meta_in = tuple((c.level, c.scale, c.data.shape) for c in cts)
        key = (tag, meta_in, bufsig)
        if key not in self.cache:
            side = {}

            def wrapped(datas, bufs, _fn=fn, _side=side, _swaps=swaps,
                        _meta=tuple((c.level, c.scale) for c in cts)):
                for sw, v in zip(_swaps, bufs):
                    sw.save_and_set(v)
                try:
                    ins = [Ciphertext(d, lv, sc)
                           for d, (lv, sc) in zip(datas, _meta)]
                    out = _fn(*ins)
                finally:
                    for sw in _swaps:
                        sw.restore()
                outs = out if isinstance(out, tuple) else (out,)
                _side["meta"] = tuple((o.level, o.scale) for o in outs)
                _side["single"] = not isinstance(out, tuple)
                return [o.data for o in outs]

            jitted = jax.jit(wrapped)
            aot = getattr(self.scheme, "aot_pending", None)
            if aot is not None:
                lowered = jitted.lower([c.data for c in cts],
                                       [sw.getter() for sw in swaps])
                side["out_shapes"] = [
                    (tuple(x.shape), x.dtype)
                    for x in jax.tree_util.tree_leaves(lowered.out_info)]
                self.cache[key] = (jitted, side)
                aot.append((key, self.cache, lowered, side,
                            f"phase {tag}"))
                res = [Ciphertext(jnp.zeros(shp, dt), lv, sc)
                       for (shp, dt), (lv, sc) in zip(side["out_shapes"],
                                                      side["meta"])]
                return res[0] if side["single"] else tuple(res)
            self.cache[key] = (jitted, side)
            if os.environ.get("ORION_TPU_JIT_LOG", "") not in ("", "0"):
                print(f"[jit] NEW phase program {tag} "
                      f"({len(self.cache)} phases so far)", flush=True)
                t0 = time.time()
                outs = self.cache[key][0](
                    [c.data for c in cts], [sw.getter() for sw in swaps])
                jax.block_until_ready(outs)
                print(f"[jit] phase {tag}: compile+run "
                      f"{time.time()-t0:.1f}s", flush=True)
                s = self.cache[key][1]
                res = [Ciphertext(d, lv, sc)
                       for d, (lv, sc) in zip(outs, s["meta"])]
                return res[0] if s["single"] else tuple(res)
        jf, side = self.cache[key]
        if getattr(self.scheme, "aot_pending", None) is not None and \
                "out_shapes" in side:
            res = [Ciphertext(jnp.zeros(shp, dt), lv, sc)
                   for (shp, dt), (lv, sc) in zip(side["out_shapes"],
                                                  side["meta"])]
            return res[0] if side["single"] else tuple(res)
        outs = jf([c.data for c in cts], [sw.getter() for sw in swaps])
        res = [Ciphertext(d, lv, sc)
               for d, (lv, sc) in zip(outs, side["meta"])]
        return res[0] if side["single"] else tuple(res)


def aot_precompile_forward(net, scheme, ct, workers: int = 4):
    """AOT-compile every program of net's encrypted forward, in parallel.

    Pass 1 (discovery) runs the forward with the module/phase runners in
    LOWER-only mode: each program is traced (metadata propagates through
    zero-filled stand-in ciphertexts) but not compiled.  Pass 2 compiles
    all pending programs in a thread pool — the XLA compile path (incl.
    the axon remote-compile service) parallelizes across threads
    (tools/compile_parallel_probe.py measured 3.1x with 3 threads), so a
    deep net's cold start drops from sum(compiles) to roughly
    max-chain/workers.  Requires enable_module_jit(scheme) first.

    Returns the number of programs compiled.
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    if getattr(scheme, "module_runner", None) is None:
        raise RuntimeError("call enable_module_jit(scheme) first")
    log = os.environ.get("ORION_TPU_JIT_LOG", "") not in ("", "0")
    scheme.aot_pending = []
    try:
        net(ct)
    finally:
        pending = scheme.aot_pending
        del scheme.aot_pending
    if log:
        print(f"[aot] discovered {len(pending)} programs; compiling with "
              f"{workers} threads", flush=True)
    t0 = time.time()

    def compile_one(item):
        key, cache, lowered, side, name = item
        t1 = time.time()
        compiled = lowered.compile()
        cache[key] = (compiled, side)
        if log:
            print(f"[aot] compiled {name} in {time.time()-t1:.1f}s",
                  flush=True)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(compile_one, pending))
    if log:
        print(f"[aot] {len(pending)} programs compiled in "
              f"{time.time()-t0:.1f}s", flush=True)
    return len(pending)


def enable_module_jit(scheme):
    """Switch the scheme's encrypted forwards to per-module jit."""
    scheme.module_runner = make_module_runner(scheme)
    scheme.phase_runner = PhaseRunner(scheme)
    return scheme.module_runner
