"""Multi-host (multi-process) mesh construction for encrypted serving.

Green-field TPU design (SURVEY §2.7 — the reference has no distributed
execution of any kind; its ciphertexts live in a single-process native
heap).  This module builds the production mesh topology for a TPU pod
slice spanning several hosts:

  * ``dp``   (data-parallel, independent encrypted queries) is laid out
    ACROSS hosts — its only communication is request/response, so it can
    ride the slow DCN links between hosts;
  * ``limb`` (RNS-limb sharding of each ciphertext) is laid out WITHIN a
    host — key-switching's digit all-gather + ModDown reduction are
    latency-critical and must ride ICI, never DCN
    (`parallel/limbshard.py` for the collective schedule).

`jax.distributed.initialize` + `Mesh` make the same program run on 1
process (tests, virtual devices) or N hosts unchanged — XLA inserts the
collectives; only the device matrix layout differs.  Tested with two
spawned CPU processes in `tests/parallel/test_multihost.py`.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Join (or start) a multi-process JAX cluster.

    On TPU pods with the standard launcher every argument is discovered
    from the environment and ``jax.distributed.initialize()`` is a no-arg
    call; explicit arguments support CPU test clusters and bespoke
    launchers.  Idempotent: re-initialisation errors are swallowed so
    library users can call this unconditionally.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_dcn_mesh(dp: int | None = None, limb: int = 1,
                  devices=None) -> Mesh:
    """Build a (dp, limb) mesh with dp spanning hosts and limb host-local.

    ``devices`` defaults to all global devices.  The device matrix is laid
    out so that each ROW (fixed dp index, varying limb) stays within one
    process/host — collectives over ``limb`` then ride ICI, while the
    ``dp`` axis crosses host boundaries (DCN) where the model forward
    needs no communication at all.

    Constraints: ``limb`` must divide the per-host device count (a limb
    group must not straddle hosts) and dp*limb must equal the device
    count.  With ``dp=None`` it is derived.
    """
    devices = list(jax.devices() if devices is None else devices)
    n = len(devices)
    if dp is None:
        if n % limb:
            raise ValueError(f"{n} devices not divisible by limb={limb}")
        dp = n // limb
    if dp * limb != n:
        raise ValueError(f"dp*limb = {dp}*{limb} != {n} devices")

    # stable order: group by process, keep driver order within a process
    by_proc: dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    per_host = [len(v) for v in by_proc.values()]
    if len(set(per_host)) > 1:
        raise ValueError(f"uneven devices per host: {per_host}")
    if per_host[0] % limb:
        raise ValueError(
            f"limb={limb} must divide the per-host device count "
            f"{per_host[0]} so limb collectives never cross DCN")

    rows = []
    for pid in sorted(by_proc):
        local = by_proc[pid]
        for i in range(0, len(local), limb):
            rows.append(local[i:i + limb])
    matrix = np.array(rows).reshape(dp, limb)
    return Mesh(matrix, ("dp", "limb"))


def mesh_report(mesh: Mesh) -> dict:
    """Topology summary: which mesh axes cross host boundaries."""
    dev = np.asarray(mesh.devices)
    out = {"shape": dict(zip(mesh.axis_names, dev.shape)),
           "num_processes": len({d.process_index for d in dev.flat})}
    for ax, name in enumerate(mesh.axis_names):
        moved = np.moveaxis(dev, ax, 0)
        crosses = any(
            len({d.process_index for d in moved[:, *idx].flat}) > 1
            for idx in np.ndindex(*moved.shape[1:]))
        out[f"{name}_crosses_hosts"] = bool(crosses)
    return out
