"""Scheme orchestrator: init_scheme / fit / compile / encode / encrypt.

Reference parity: `orion/core/orion.py` (the Scheme singleton driving the
whole pipeline).  The compile pipeline follows `orion.py:196-316` step for
step: build DAG -> clone orion params -> resolve pooling -> fuse ->
pack diagonals (last linear forced to the square embedding) -> find
residuals -> bootstrap solve/place -> per-module compile.
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Dict, Union

import numpy as np
import yaml

from ..crypto import CKKSContext, Encoder, Evaluator, KeyChest
from ..nn.module import Module
from ..nn.linear import LinearTransform
from ..compiler.tracer import Tracer
from ..compiler.dag import NetworkDAG
from ..compiler.fuser import Fuser
from ..compiler.level_dag import BootstrapSolver, BootstrapPlacer
from .config import Params, parse_config
from .services import (BootstrapperService, EncoderService, EncryptorService,
                       LTEvaluatorService, PolyEvaluatorService)


class Scheme:
    def __init__(self):
        self.ctx = None
        self.tracer = None
        self.params: Params | None = None

    # ----------------- lifecycle ----------------- #

    def init_scheme(self, config: Union[str, Dict[str, Any]]):
        if isinstance(config, str):
            with open(config) as f:
                config = yaml.safe_load(f)
        elif not isinstance(config, dict):
            raise TypeError("config must be a YAML path or a dict")
        self.params = parse_config(config)
        p = self.params

        # Persistent XLA compilation cache for example/production runs: the
        # first encrypted forward of a deep net is dominated by per-module
        # XLA compiles (resnet_r4.log: 6216 s first vs 219 s steady), and
        # without a cache dir every process re-pays all of it.
        # ORION_TPU_COMPILE_CACHE=0 disables; ORION_TPU_COMPILE_CACHE_DIR
        # overrides the location (the old one-variable form, where a
        # directory path rode in ORION_TPU_COMPILE_CACHE itself, is still
        # honored for compatibility; an empty value means "default").
        import jax
        cache_flag = os.environ.get("ORION_TPU_COMPILE_CACHE", "")
        if cache_flag != "0" and jax.config.jax_compilation_cache_dir is None:
            cache_dir = os.environ.get("ORION_TPU_COMPILE_CACHE_DIR", "")
            if not cache_dir and cache_flag not in ("", "1"):
                cache_dir = cache_flag  # legacy: flag carried the path
            if not cache_dir:
                # source checkout -> repo-local dir (shared across the
                # repo's processes); installed package -> per-user cache
                # (site-packages may be read-only or shared)
                pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
                if os.path.exists(os.path.join(pkg_root, "pyproject.toml")):
                    cache_dir = os.path.join(pkg_root, ".jax_cache_tpu")
                else:
                    cache_dir = os.path.join(
                        os.path.expanduser("~"), ".cache", "orion_tpu", "jax")
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            print(f"[orion_tpu] persistent compile cache: {cache_dir} "
                  "(ORION_TPU_COMPILE_CACHE=0 disables)")

        # stream mode: compiled buffers (keys, diagonals, circuits) are
        # built and held in host numpy — nothing crosses the TPU tunnel at
        # compile time; the per-module jit passes them as call arguments
        from ..crypto import placement
        placement.set_host_compile(p.io_mode == "stream")

        self.ctx = CKKSContext(
            logn=p.logn, logq=p.split_logq, logp=p.logp,
            logscale=p.logscale, h=p.h, ring_type=p.ring_type, seed=p.seed)
        self.enc = Encoder(self.ctx)
        self.keys = KeyChest(self.ctx)
        if p.io_mode == "load" and p.keys_path:
            from .io import load_rotation_keys, load_secret_key
            load_secret_key(self, p.keys_path)
            load_rotation_keys(self, p.keys_path)
        elif p.io_mode == "save" and p.keys_path:
            from .io import save_secret_key
            save_secret_key(self, p.keys_path)
        self.evaluator = Evaluator(self.ctx, self.keys)
        # deep bootstrapped chains: halve rotation-key HBM (Montgomery lift
        # in the key inner product instead of stored Shoup companions)
        self.evaluator.lean_keys = bool(p.boot)
        self.input_level_default = self.ctx.max_level

        self.encoder = EncoderService(self)
        self.encryptor = EncryptorService(self)
        self.lt_evaluator = LTEvaluatorService(self)
        self.poly_evaluator = PolyEvaluatorService(self)
        self.bootstrapper = BootstrapperService(self)
        return self

    def delete_scheme(self):
        self.ctx = None

    # ----------------- user data path ----------------- #

    def encode(self, tensor, level=None, scale=None):
        self._check_init()
        return self.encoder.encode(tensor, level=level, scale=scale)

    def decode(self, ptxt):
        self._check_init()
        return self.encoder.decode(ptxt)

    def encrypt(self, ptxt):
        self._check_init()
        return self.encryptor.encrypt(ptxt)

    def decrypt(self, ctxt):
        self._check_init()
        return self.encryptor.decrypt(ctxt)

    # ----------------- fit ----------------- #

    def fit(self, net: Module, input_data, batch_size: int = 128):
        self._check_init()
        net.set_scheme(self)
        net.set_margin(self.params.margin)
        net.eval()

        tracer = Tracer(net)
        self.tracer = tracer

        print("\n{1} Finding per-layer input/output ranges and shapes...",
              flush=True)
        start = time.time()
        batches, user_batch = self._as_batches(input_data, batch_size)
        for batch in batches:
            tracer.propagate(batch)
        if user_batch is not None:
            tracer.update_batch_size(user_batch)
        print(f"done! [{time.time() - start:.3f} secs.]")

        print("\n{2} Fitting polynomials... ", end="", flush=True)
        start = time.time()
        for module in net.modules():
            if hasattr(module, "fit") and callable(module.fit):
                module.fit()
        print(f"done! [{time.time() - start:.3f} secs.]")

    @staticmethod
    def _as_batches(input_data, batch_size):
        """Accept an ndarray, a list of arrays, or (x, y) batch iterables.

        Loader inputs are re-batched to `batch_size` for the statistics
        pass and the layer shapes are reset to the loader's own batch size
        afterwards (reference `orion.py:147-173`).
        Returns (batches, user_batch_size or None).
        """
        if isinstance(input_data, np.ndarray) or hasattr(input_data, "shape"):
            return [np.asarray(input_data)], None
        xs = []
        user_batch = None
        for item in input_data:
            x = item[0] if isinstance(item, (tuple, list)) else item
            x = np.asarray(x)
            if user_batch is None:
                user_batch = x.shape[0]
            xs.append(x)
        user_batch = getattr(input_data, "batch_size", user_batch)
        all_x = np.concatenate(xs, axis=0)
        big = max(batch_size, user_batch)
        batches = [all_x[i:i + big] for i in range(0, len(all_x), big)]
        return batches, user_batch

    # ----------------- compile ----------------- #

    def compile(self, net: Module):
        self._check_init()
        if self.tracer is None:
            raise ValueError(
                "Network has not been fit yet! Run fit(net, input_data) "
                "before compile(net).")

        dag = NetworkDAG(self.tracer).build_dag()

        for name, module in net.named_modules():
            module._orion_name = name   # debug/trace labels (runtime/jit.py)
        for module in net.modules():
            if hasattr(module, "init_orion_params"):
                module.init_orion_params()
        for module in net.modules():
            if hasattr(module, "update_params"):
                module.update_params()

        if self.params.fuse_modules:
            fuser = Fuser(dag)
            fuser.fuse_modules()
            dag.remove_fused_batchnorms()

        # pack diagonals; the last linear layer uses the square embedding so
        # no replicated partials leak (reference `orion.py:253-268`)
        topo = list(dag.topological_sort())
        last_linear = None
        for node in reversed(topo):
            if isinstance(dag.nodes[node]["module"], LinearTransform):
                last_linear = node
                break
        print("\n{3} Generating matrix diagonals...", flush=True)
        for node in topo:
            module = dag.nodes[node]["module"]
            if isinstance(module, LinearTransform):
                print(f"packing {node}...", flush=True)
                module.generate_diagonals(last=(node == last_linear))

        # bootstrap placement / level assignment
        print("\n{4} Running bootstrap placement... ", end="", flush=True)
        start = time.time()
        solver = BootstrapSolver(net, dag, l_eff=self.params.l_eff,
                                 slots=self.ctx.slots,
                                 base_level=self.params.base_level)
        input_level, num_btp, btp_slots = solver.solve()
        print(f"done! [{time.time() - start:.3f} secs.]")
        print(f"network requires {num_btp} bootstrap operation(s)")
        stream = self.params.io_mode == "stream"
        for slot_count in btp_slots:
            btp = self.bootstrapper.generate_bootstrapper(slot_count)
            if stream:
                from .buffers import _bootstrapper_swaps, spill_swaps_to_host
                spill_swaps_to_host(_bootstrapper_swaps(btp))
        BootstrapPlacer(net, dag, solver).place_bootstraps()

        # per-module compile in topological order.  With io_mode `stream`,
        # each module's device buffers are spilled to host right after its
        # compile — the TPU analog of the reference's io_mode eviction
        # (`lt_evaluator.py:176-189`) — bounding compile-time HBM by one
        # module instead of the whole network (the round-1 ResNet OOM).
        print("\n{5} Compiling network layers...", flush=True)
        spilled = 0
        for node in topo:
            if node not in dag.nodes:
                continue  # removed fused BN
            module = dag.nodes[node]["module"]
            if isinstance(module, Module):
                print(f"|-- {node} @ level={module.level}", flush=True)
                if hasattr(module, "compile") and callable(module.compile):
                    module.compile()
                pb = getattr(module, "post_bootstrap", None)
                if pb is not None:
                    pb.compile()
                if stream:
                    from .buffers import spill_module_to_host
                    spilled += spill_module_to_host(self, module)
                    if pb is not None:
                        spilled += spill_module_to_host(self, pb)
        if spilled:
            print(f"|-- streamed {spilled / 1e9:.2f} GB of compiled buffers "
                  "to host (io_mode: stream)", flush=True)

        # save BEFORE trimming: trimmed originals live on only inside
        # KeyPacks, and a future `load` run rebuilds its packs from the
        # saved originals
        if self.params.io_mode == "save" and self.params.keys_path:
            from .io import save_rotation_keys
            save_rotation_keys(self, self.params.keys_path)
        self._trim_key_memory(net)
        self.input_level = input_level
        return input_level

    def _trim_key_memory(self, net):
        """Free original galois keys whose rotations live on inside
        pre-permuted KeyPacks (SURVEY hard part #3: rotation-key HBM).

        Keys still needed in original form: conjugation and the hybrid
        embedding's output rotations (CipherTensor.roll path).  Anything
        else is evaluated through KeyPacks; if an unexpected rotation shows
        up later the KeyChest simply regenerates the key lazily.
        """
        keep = {self.ctx.galois_element_conj()}
        for module in net.modules():
            for i in range(1, getattr(module, "output_rotations", 0) + 1):
                amt = self.ctx.slots // (2 ** i)
                keep.add(self.ctx.galois_element(amt))
        packed = set()
        for pack in getattr(self.evaluator, "_key_packs", {}).values():
            for a in pack.amounts:
                packed.add(self.ctx.galois_element(a))
        dropped = 0
        for k in list(self.keys.galois_keys):
            if k in packed and k not in keep:
                del self.keys.galois_keys[k]
                dropped += 1
        if dropped:
            print(f"|-- freed {dropped} original rotation keys "
                  "(retained in pre-permuted packs)", flush=True)

    def _check_init(self):
        if self.ctx is None:
            raise ValueError(
                "Scheme not initialized. Call init_scheme() first.")


scheme = Scheme()
