"""Compile-time buffer placement policy.

With `orion: io_mode: stream` the runtime bounds device HBM by one
module's working set: compiled buffers (encoded diagonals, KeyPacks,
bootstrap circuits, key-switch keys) are held on HOST and passed to the
per-module jitted program as call arguments (runtime/buffers.py).

Round-2 lesson: building those buffers on device and spilling them back
(device->host) costs every byte TWO trips over the axon TPU tunnel, and
the per-rotation key gathers in `build_key_pack` each ran as an eager
remote program — minutes of compile wall-clock.  With HOST_COMPILE set,
creation sites keep the arrays as numpy from the start and the pack
gathers run natively on host; nothing touches the device until the jitted
forward actually calls with them.

The reference's analogous mechanism is io_mode save/load streaming of
serialized keys/diagonals (`orion/backend/python/lt_evaluator.py:176-189`).
"""

from __future__ import annotations

import numpy as np

HOST_COMPILE = False


def set_host_compile(on: bool) -> None:
    global HOST_COMPILE
    HOST_COMPILE = bool(on)


def buffer(x):
    """Large-buffer materialisation: host numpy under HOST_COMPILE,
    device jnp otherwise."""
    if HOST_COMPILE:
        return np.ascontiguousarray(np.asarray(x))
    import jax.numpy as jnp
    return jnp.asarray(x)
