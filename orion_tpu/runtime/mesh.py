"""Mesh-aware execution of compiled encrypted networks.

Green-field TPU design (the reference, SURVEY §2.7, has no distributed
execution of any kind).  This module wires `jax.sharding.Mesh` into the
model runtime so a *compiled* network — the output of the real
fit -> compile pipeline — runs sharded:

  * ``dp``   — the ciphertext-batch axis: independent encrypted queries.
               The whole-network forward is vmapped over the batch and the
               batch axis is sharded over ``dp``; XLA partitions every op
               of the circuit trivially along it (zero collectives).
  * ``limb`` — the RNS-limb axis of every ciphertext/plaintext.  Each
               ciphertext is ``uint32[2, level+1, N]``; annotating the
               ``level+1`` axis with a mesh axis makes XLA's SPMD
               partitioner run NTTs/elementwise stages limb-local and
               insert the all-gathers/reductions that key-switching's
               basis conversion genuinely requires (the explicit
               hand-scheduled variant with exactly one all-gather + one
               psum per key-switch lives in ``parallel/limbshard.py``;
               this path is the `jit`-native integration of the same
               sharding into the full model forward).

Usage (also exercised by ``__graft_entry__.dryrun_multichip``)::

    mesh = Mesh(np.array(jax.devices()).reshape(dp, limb), ("dp", "limb"))
    fwd = make_sharded_forward(net, scheme, mesh)       # after compile()
    outs = fwd(batch_of_ciphertensors)                  # len == B

The reference has no counterpart: its ciphertexts are opaque handles in a
single-process native heap (`orion/backend/lattigo/minheap.go`), so nothing
like this is expressible there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..crypto.ciphertext import Ciphertext
from .tensors import CipherTensor


def make_sharded_forward(net, scheme, mesh: Mesh, dp_axis: str = "dp",
                         limb_axis: str | None = "limb"):
    """Compile net's he-forward into one SPMD program over `mesh`.

    Returns ``run(batch: list[CipherTensor]) -> list[CipherTensor]``.
    Each query's ciphertext data is stacked on a new leading batch axis
    sharded over `dp_axis`; the RNS-limb axis is sharded over `limb_axis`
    (pass None to replicate limbs).  Levels/scales/shapes must agree across
    the batch (same compiled network, same input level — always true for a
    served model).
    """
    if dp_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {dp_axis!r}: {mesh.axis_names}")
    if limb_axis is not None and limb_axis not in mesh.axis_names:
        limb_axis = None

    meta = {}
    cache = {}

    def run(batch):
        if isinstance(batch, CipherTensor):
            batch = [batch]
        t0 = batch[0]
        n_cts = len(t0.cts)
        levels = tuple(c.level for c in t0.cts)
        scales = tuple(c.scale for c in t0.cts)
        shape = tuple(t0.shape)
        on_shape = tuple(t0.on_shape)
        for t in batch[1:]:
            if (tuple(c.level for c in t.cts) != levels
                    or tuple(c.scale for c in t.cts) != scales):
                raise ValueError("batch members must share level/scale")
        key = (levels, scales, shape, on_shape, len(batch))

        # stack: per-ct (B, 2, level+1, N)
        datas = [jnp.stack([t.cts[i].data for t in batch])
                 for i in range(n_cts)]

        if key not in cache:
            def flat_forward(ds):
                cts = [Ciphertext(d, lv, sc)
                       for d, lv, sc in zip(ds, levels, scales)]
                out = net(CipherTensor(scheme, cts, shape, on_shape))
                meta["out"] = ([c.level for c in out.cts],
                               [c.scale for c in out.cts],
                               out.shape, out.on_shape)
                return [c.data for c in out.cts]

            vf = jax.vmap(flat_forward)
            in_spec = (P(dp_axis, None, limb_axis, None) if limb_axis
                       else P(dp_axis))
            in_sh = [NamedSharding(mesh, in_spec)] * n_cts
            out_sh = NamedSharding(mesh, P(dp_axis))
            cache[key] = jax.jit(vf, in_shardings=(in_sh,),
                                 out_shardings=out_sh)

        out_datas = cache[key](datas)
        lv, sc, oshape, o_on = meta["out"]
        outs = []
        for b in range(len(batch)):
            cts = [Ciphertext(d[b], l, s)
                   for d, l, s in zip(out_datas, lv, sc)]
            outs.append(CipherTensor(scheme, cts, oshape, o_on))
        return outs

    return run


def encrypt_batch(scheme, inputs, level=None):
    """Encode+encrypt a batch of queries -> list[CipherTensor]."""
    return [scheme.encrypt(scheme.encode(x, level)) for x in inputs]
