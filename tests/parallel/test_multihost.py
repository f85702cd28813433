"""Multi-host mesh: two REAL processes joined via jax.distributed.

Each spawned worker owns 4 virtual CPU devices; the pair forms an
8-device cluster.  The test validates the production topology invariants
(`parallel/multihost.py`): the dp axis crosses the host boundary, the
limb axis never does, and a cross-process collective plus a sharded
modular op over the mesh compute correct values.

Green-field vs the reference (SURVEY §2.7): no distributed execution
exists there at all.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]

WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]

sys.path.insert(0, os.environ["ORION_REPO"])
from orion_tpu.parallel.multihost import (init_multihost, make_dcn_mesh,
                                          mesh_report)

init_multihost(coordinator_address=f"127.0.0.1:{port}",
               num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

mesh = make_dcn_mesh(limb=4)
rep = mesh_report(mesh)
assert rep["shape"] == {"dp": 2, "limb": 4}, rep
assert rep["dp_crosses_hosts"] is True, rep
assert rep["limb_crosses_hosts"] is False, rep
assert rep["num_processes"] == 2, rep

# cross-process collective over the mesh: psum along BOTH axes touches
# DCN (dp) and intra-host (limb) links
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

x = np.arange(16, dtype=np.uint32).reshape(2, 8) % 97
xs = jax.device_put(x, NamedSharding(mesh, P("dp", "limb")))


@jax.jit
def modsum(a):
    def body(blk):
        s = jax.lax.psum(blk.astype(np.uint64), axis_name=("dp", "limb"))
        return (s % 97).astype(np.uint32)
    return jax.shard_map(
        body, mesh=mesh, in_specs=P("dp", "limb"),
        out_specs=P("dp", "limb"))(a)


out = modsum(xs)
# each (1, 2) shard holds the positional modular sum across all 8 shards;
# a globally-sharded array can't be fetched whole, so check local shards
blocks = x.reshape(2, 4, 2)
want = (blocks.astype(np.uint64).sum(axis=(0, 1)) % 97).astype(np.uint32)
for shard in out.addressable_shards:
    assert (np.asarray(shard.data).reshape(2) == want).all(), (
        np.asarray(shard.data), want)

# sharded framework op: modular add over a limb-sharded ciphertext-like
# array computes identically to the single-process path
from orion_tpu.crypto.modops import add_mod
q = np.array([536870909] * 8, np.uint32)[:, None]
a = np.random.default_rng(0).integers(0, 536870909, (8, 64)).astype(np.uint32)
b = np.random.default_rng(1).integers(0, 536870909, (8, 64)).astype(np.uint32)
sh = NamedSharding(mesh, P("limb", None))
av, bv = jax.device_put(a, sh), jax.device_put(b, sh)
got = jax.jit(add_mod)(av, bv, jnp.asarray(q))
ref = ((a.astype(np.uint64) + b) % 536870909).astype(np.uint32)
for shard in got.addressable_shards:
    rows = shard.index[0]
    assert (np.asarray(shard.data) == ref[rows]).all()

# ---- the real claim of multihost.py's design: a limb-sharded hybrid
# key-switch on the DCN mesh.  KSK row blocks + tables shard over the
# limb axis (intra-host: the digit all-gather and ModDown psum never
# cross DCN); the dp axis replicates.  Bit-exact vs the single-process
# keyswitch computed locally from the same deterministic KeyChest.
from orion_tpu.crypto.context import CKKSContext
from orion_tpu.crypto.keys import KeyChest
from orion_tpu.crypto.keyswitch import dev_level as _dl, keyswitch as _ks
from orion_tpu.parallel.limbshard import make_sharded_keyswitch

ctx = CKKSContext(logn=6, logq=[28, 26, 26, 26, 26, 26], logp=[28, 28],
                  logscale=26, h=16, seed=7)
keys = KeyChest(ctx)   # deterministic from ctx.seed -> identical per process
lvl = ctx.max_level    # 6 Q limbs + 2 P limbs = 8 rows over limb=4 -> B=2
rng = np.random.default_rng(11)
c = np.stack([rng.integers(0, ctx.primes[i], ctx.n, dtype=np.int64)
              for i in range(lvl + 1)]).astype(np.uint32)
want = np.asarray(_ks(c, _dl(ctx, lvl), keys.relin_key.data,
                      keys.relin_key.shoup))          # local, process-private

sks = make_sharded_keyswitch(ctx, lvl, mesh)          # dp x limb DCN mesh
kd, kss = sks.shard_ksk(keys.relin_key.data, keys.relin_key.shoup, ctx)
got_ks = sks.fn(sks.put(sks.pad_poly(c)), sks.put(kd), sks.put(kss))
# globally-sharded output: check this process's addressable row blocks
nl = lvl + 1
for shard in got_ks.addressable_shards:
    rows = range(*shard.index[1].indices(sks.m * sks.block))
    data = np.asarray(shard.data)
    for k, r in enumerate(rows):
        if r < nl:  # Q rows are the valid switched poly
            assert (data[:, k] == want[:, r]).all(), (pid, r)

print(f"worker {pid}: OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_mesh(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {**os.environ,
           "ORION_REPO": str(REPO),
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "TF_CPP_MIN_LOG_LEVEL": "3"}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"worker {i}: OK" in out
