"""Benchmark: encrypted MLP forward latency on the current backend.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's flagship pipeline (`examples/run_mlp.py`,
MLP/MNIST at LogN 13, L_eff 5 — `configs/mlp.yml`) run end-to-end, timing
the steady-state encrypted forward pass as one jitted XLA program.

vs_baseline: the reference publishes no measured numbers (BASELINE.md); its
own analytical CPU latency model (`orion/core/level_dag.py:190-194`,
t = 0.001 * n_diagonals * level per linear transform) evaluated on THIS
compiled network is the baseline.  vs_baseline = model_seconds / ours
(>1 means faster than the reference's model of itself, which also excludes
activation/BN cost, so the comparison is conservative in the reference's
favor).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def _ks_shoup_muls(dl, n):
    """Analytic shoup-multiply count of one hybrid key-switch at dl."""
    nl = dl.level + 1
    n_sp = int(dl.s_p.shape[0])
    n_t = nl + n_sp
    dnum = len(dl.digits)
    alphas = [dg.src_hi - dg.src_lo for dg in dl.digits]
    btf = np.log2(n) / 2                            # butterfly muls/elem
    muls = nl * n * (btf + 1)                       # decompose iNTT (+ninv)
    for a in alphas:
        muls += a * n + a * n_t * n + n_t * n       # FBC qhat/conv/vterm
        muls += n_t * n * btf                       # per-digit NTT
    muls += dnum * 2 * n_t * n                      # KSK inner product
    muls += 2 * (n_sp * n * (btf + 1)               # ModDown iNTT
                 + n_sp * n + n_sp * nl * n + nl * n  # ModDown FBC
                 + nl * n * btf                     # ModDown NTT
                 + nl * n)                          # ModDown pinv mul
    return float(muls)


def microbench():
    """Per-op throughput on the current backend (BASELINE.md north star:
    ct-ct mults/s and key-switches/s per chip, with roofline context).

    Ops are chained through a lax.scan so one XLA program amortises
    dispatch; the roofline figures are analytical bytes-moved per op
    against the v5e HBM peak (819 GB/s) — key-switching is
    bandwidth-bound on the KSK reads, so bytes/s vs peak is the honest
    utilisation metric.
    """
    import jax
    import jax.numpy as jnp
    from orion_tpu.crypto import CKKSContext, Encoder, Evaluator, KeyChest
    from orion_tpu.crypto.ciphertext import Ciphertext
    from orion_tpu.crypto.keyswitch import dev_level, ks_decompose, ks_finish
    from orion_tpu.crypto.ntt import ntt as ntt_fn

    # the MLP workload's ring: LogN 13, 6-prime chain + 2 specials
    ctx = CKKSContext(logn=13, logq=[29, 26, 26, 26, 26, 26],
                      logp=[29, 29], logscale=26, h=8192, seed=5)
    enc = Encoder(ctx)
    keys = KeyChest(ctx)
    ev = Evaluator(ctx, keys)
    level = ctx.max_level
    nl = level + 1
    n = ctx.n
    dl = dev_level(ctx, level)
    n_sp = int(dl.s_p.shape[0])
    n_t = nl + n_sp
    dnum = len(dl.digits)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, ctx.slots)
    pt, s = enc.encode(x)
    ct = Ciphertext(jnp.asarray(keys.encrypt_rns(pt).astype(np.uint32)),
                    level, s)
    reps = 20

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    # --- ct-ct multiply (tensor + relinearise, no rescale: fixed level) ---
    @jax.jit
    def mult_chain(data):
        def body(c, _):
            out = ev.mul_relin(Ciphertext(c, level, s),
                               Ciphertext(data, level, s), rescale=False)
            return out.data, None
        out, _ = jax.lax.scan(body, data, None, length=reps)
        return out

    t_mult = timed(mult_chain, ct.data)

    # --- raw hybrid key-switch (decompose + inner product + ModDown);
    # auto-dispatch picks the fused Pallas kernel on accelerators ---
    import os
    rk = keys.relin_key

    @jax.jit
    def ks_chain(c1):
        def body(c, _):
            out = ks_finish(ks_decompose(c, dl), dl, rk.data, rk.shoup)
            return out[1], None
        out, _ = jax.lax.scan(body, c1, None, length=reps)
        return out

    t_ks = timed(ks_chain, ct.data[1])

    # unfused jnp path for comparison (same workload)
    os.environ["ORION_TPU_FUSED_KS"] = "0"

    @jax.jit
    def ks_chain_jnp(c1):
        def body(c, _):
            out = ks_finish(ks_decompose(c, dl), dl, rk.data, rk.shoup)
            return out[1], None
        out, _ = jax.lax.scan(body, c1, None, length=reps)
        return out

    t_ks_jnp = timed(ks_chain_jnp, ct.data[1])
    del os.environ["ORION_TPU_FUSED_KS"]

    # --- ciphertext-batched ct-ct multiply (serving layout: vmap B cts
    # through the same op so the VPU sees wide arrays) ---
    B = 8
    batch = jnp.broadcast_to(ct.data, (B,) + ct.data.shape)

    @jax.jit
    def mult_batched(data):
        def one(c):
            return ev.mul_relin(Ciphertext(c, level, s),
                                Ciphertext(c, level, s),
                                rescale=False).data
        def body(c, _):
            return jax.vmap(one)(c), None
        out, _ = jax.lax.scan(body, data, None, length=reps)
        return out

    t_mult_b = timed(mult_batched, batch) / B

    # --- PRODUCTION ct-ct multiply: tensor + relin + RESCALE (the op a
    # network actually runs; exercises the fused ModDown+rescale
    # epilogue).  A level-descending chain L->0 inside one program
    # amortises dispatch; per-op time = chain time / level. ---
    @jax.jit
    def mult_rescale_chain(data):
        c = Ciphertext(data, level, s)
        for _ in range(level):
            c = ev.mul_relin(c, c)  # rescale=True: drops one level
        return c.data

    out = mult_rescale_chain(ct.data)
    jax.block_until_ready(out)
    t0 = time.time()
    inner = 8
    for _ in range(inner):
        out = mult_rescale_chain(ct.data)
    jax.block_until_ready(out)
    t_mult_rs = (time.time() - t0) / (inner * level)

    # --- blocked linear transform (the ResNet/VGG hot path): 2x2 grid,
    # 16 diagonals per block — deferred-ModDown vs per-giant ModDown ---
    from orion_tpu.crypto import lintrans_scan as lts

    def build_grid():
        grid = {}
        for (i, j) in [(0, 0), (0, 1), (1, 0), (1, 1)]:
            diags = {int(d): rng.uniform(-0.3, 0.3, ctx.slots)
                     for d in range(0, 64, 4)}
            grid[(i, j)] = lts.compile_transform_scan(
                enc, diags, level, ctx.slots)
        return grid

    grid = build_grid()
    cts_in = [ct, Ciphertext(ct.data, level, s)]

    def timed_lt():
        @jax.jit
        def lt_once(d0, d1):
            c0 = Ciphertext(d0, level, s)
            c1 = Ciphertext(d1, level, s)
            outs = lts.eval_transform_blocked_scan(ev, grid, [c0, c1], 2)
            return [o.data for o in outs]

        o = lt_once(ct.data, ct.data)
        jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(8):
            o = lt_once(ct.data, ct.data)
        jax.block_until_ready(o)
        return (time.time() - t0) / 8

    t_lt = timed_lt()
    os.environ["ORION_TPU_DEFER_MODDOWN"] = "0"
    t_lt_nodefer = timed_lt()
    del os.environ["ORION_TPU_DEFER_MODDOWN"]

    # --- forward NTT over a full ciphertext (2 x L x N) ---
    @jax.jit
    def ntt_chain(c):
        def body(a, _):
            return ntt_fn(a, dl.q_tw, dl.q_tw_shoup, dl.q_p), None
        out, _ = jax.lax.scan(body, c, None, length=reps)
        return out

    t_ntt = timed(ntt_chain, ct.data)

    # --- measured VPU integer peak: a pure chained Shoup-multiply kernel
    # (1 mulhi + 2 mullo + compare/select per element) is the exact op mix
    # the crypto kernels are made of; its throughput is the DEMONSTRATED
    # achievable ceiling for this workload on the VPU ---
    from orion_tpu.crypto.modops import shoup_mul

    # the array must be big enough that launch/loop overhead vanishes:
    # 128 rows x N lanes x 64 chained muls per step
    rows = 128
    big = jnp.tile(ct.data[1][:1], (rows, 1)).astype(jnp.uint32)
    prow = jnp.tile(dl.t_p[:1], (rows,))[:, None]
    wv = jnp.asarray(rng.integers(1, 1 << 25, (rows, 1)).astype(np.uint32))
    wsh = jnp.asarray(
        ((wv.astype(np.uint64) << 32) //
         np.asarray(prow).astype(np.uint64)).astype(np.uint32))
    chain = 64

    @jax.jit
    def shoup_chain(x):
        def body(c, _):
            for _i in range(chain):
                c = shoup_mul(c, wv, wsh, prow)
            return c, None
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    t_shoup = timed(shoup_chain, big)
    shoup_per_s_peak = chain * rows * n / t_shoup  # shoup-muls/s achieved

    ks_shoup_muls = _ks_shoup_muls(dl, n)
    vpu_frac = (ks_shoup_muls / t_ks) / shoup_per_s_peak

    # --- analytical roofline: bytes touched per op (uint32 words) ---
    word = 4
    ksk_bytes = dnum * 2 * n_t * n * word          # key read dominates
    ks_bytes = ksk_bytes + (dnum * n_t + 4 * nl + 2 * n_t) * n * word
    mult_bytes = ks_bytes + 6 * nl * n * word      # + tensoring traffic
    ntt_bytes = 2 * nl * n * word * 2              # read + write
    hbm_peak = 819e9                               # v5e HBM GB/s

    return {
        "ct_mult_per_s": 1.0 / t_mult,
        "ct_mult_rescale_per_s": 1.0 / t_mult_rs,
        "ct_mult_rescale_ms": t_mult_rs * 1e3,
        "lt_block2x2_ms": t_lt * 1e3,
        "lt_block2x2_ms_nodefer": t_lt_nodefer * 1e3,
        "lt_defer_moddown_speedup": t_lt_nodefer / t_lt,
        "ct_mult_batched_per_s": 1.0 / t_mult_b,
        "keyswitch_per_s": 1.0 / t_ks,
        "keyswitch_jnp_per_s": 1.0 / t_ks_jnp,
        "ntt_per_s": 1.0 / t_ntt,
        "ct_mult_ms": t_mult * 1e3,
        "keyswitch_ms": t_ks * 1e3,
        "keyswitch_jnp_ms": t_ks_jnp * 1e3,
        "ntt_us": t_ntt * 1e6,
        "keyswitch_hbm_frac": (ks_bytes / t_ks) / hbm_peak,
        "ct_mult_hbm_frac": (mult_bytes / t_mult) / hbm_peak,
        "ct_mult_batched_hbm_frac": (mult_bytes / t_mult_b) / hbm_peak,
        "ntt_hbm_frac": (ntt_bytes / t_ntt) / hbm_peak,
        # VPU integer roofline: key-switch shoup-mul rate vs the measured
        # pure-shoup-kernel ceiling (VERDICT r3 weak #1: make "VPU-bound"
        # a number)
        "vpu_shoup_mul_per_s_peak": shoup_per_s_peak,
        "keyswitch_shoup_muls": ks_shoup_muls,
        "keyswitch_vpu_frac": vpu_frac,
        "params": {"logn": 13, "level": level, "dnum": dnum, "n_t": n_t},
    }


def microbench_deep(level=17):
    """Depth-regime key-switch (LogN 13, ResNet/bootstrap levels): the
    STATUS r3 claims (2.90 ms fused vs 3.03 ms jnp, trace seconds)
    captured as artifacts (VERDICT r3 weak #6)."""
    import os
    import jax
    import jax.numpy as jnp
    from orion_tpu.crypto import CKKSContext, Encoder, KeyChest
    from orion_tpu.crypto.ciphertext import Ciphertext
    from orion_tpu.crypto.keyswitch import dev_level, ks_decompose, ks_finish

    ctx = CKKSContext(logn=13, logq=[29] + [26] * level, logp=[29, 29],
                      logscale=26, h=8192, seed=6)
    enc = Encoder(ctx)
    keys = KeyChest(ctx)
    dl = dev_level(ctx, level)
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, ctx.slots)
    pt, s = enc.encode(x, level=level)
    ct = Ciphertext(jnp.asarray(keys.encrypt_rns(pt).astype(np.uint32)),
                    level, s)
    rk = keys.relin_key
    reps = 10

    out = {"level": level}
    for tag, env in (("fused", None), ("jnp", "0")):
        if env is not None:
            os.environ["ORION_TPU_FUSED_KS"] = env

        def fn(c1):
            def body(c, _):
                o = ks_finish(ks_decompose(c, dl), dl, rk.data, rk.shoup)
                return o[1], None
            o, _ = jax.lax.scan(body, c1, None, length=reps)
            return o

        t0 = time.time()
        jf = jax.jit(fn)
        lowered = jf.lower(ct.data[1])
        out[f"keyswitch_deep_trace_s_{tag}"] = time.time() - t0
        o = jf(ct.data[1])
        jax.block_until_ready(o)
        t0 = time.time()
        o = jf(ct.data[1])
        jax.block_until_ready(o)
        out[f"keyswitch_deep_ms_{tag}"] = (time.time() - t0) / reps * 1e3
        if env is not None:
            del os.environ["ORION_TPU_FUSED_KS"]
    # depth-regime VPU roofline fraction (vs the peak measured in
    # microbench — pass it in via out by the caller merging)
    out["keyswitch_deep_shoup_muls"] = _ks_shoup_muls(dl, ctx.n)
    return out


def main():
    import jax
    import orion_tpu as orion
    import orion_tpu.models as models
    from orion_tpu.nn.linear import LinearTransform
    from orion_tpu.runtime.jit import make_jitted_forward
    from orion_tpu.utils import get_mnist_datasets, mae

    cfg = str(Path(__file__).parent / "configs" / "mlp.yml")
    scheme = orion.init_scheme(cfg)
    trainloader, testloader = get_mnist_datasets(batch_size=1)
    net = models.MLP()
    inp, _ = next(iter(testloader))
    net.eval()
    out_clear = np.asarray(net(inp)).reshape(-1)

    orion.fit(net, trainloader)
    input_level = orion.compile(net)

    # reference analytical model on this compiled net (CPU/Lattigo fit)
    base = scheme.params.base_level
    model_s = 0.0
    for m in net.modules():
        if isinstance(m, LinearTransform) and m.diagonals:
            ndiags = sum(len(d) for d in m.diagonals.values())
            model_s += 0.001 * ndiags * max(m.level - base, 1)

    vec = orion.encode(inp, input_level)
    ct = orion.encrypt(vec)
    net.he()
    forward = make_jitted_forward(net, scheme)

    out = forward(ct)
    jax.block_until_ready(out.cts[0].data)  # compile + warm

    times = []
    for _ in range(5):
        t0 = time.time()
        out = forward(ct)
        jax.block_until_ready(out.cts[0].data)
        times.append(time.time() - t0)
    steady = float(np.median(times))

    # sanity: decrypted output must match cleartext
    out_fhe = np.asarray(out.decrypt().decode()).reshape(-1)
    dist = mae(out_clear, out_fhe[: out_clear.size])
    assert dist < 0.005, f"accuracy regression: MAE={dist}"

    # --- batched serving: B queries through ONE vmapped program
    # (VERDICT r3 item 5: exploit the 7x batched-op advantage) ---
    from orion_tpu.runtime.jit import make_batched_forward
    B = 8
    cts = [orion.encrypt(orion.encode(inp, input_level)) for _ in range(B)]
    batched = make_batched_forward(net, scheme)
    outs = batched(cts)                       # compile + warm
    jax.block_until_ready(outs[0].cts[0].data)
    times = []
    for _ in range(5):
        t0 = time.time()
        outs = batched(cts)
        jax.block_until_ready(outs[0].cts[0].data)
        times.append(time.time() - t0)
    t_batch = float(np.median(times))
    out_b = np.asarray(outs[0].decrypt().decode()).reshape(-1)
    dist_b = mae(out_clear, out_b[: out_clear.size])
    assert dist_b < 0.005, f"batched accuracy regression: MAE={dist_b}"

    micro = microbench()
    deep = microbench_deep()
    deep["keyswitch_deep_vpu_frac"] = (
        deep["keyswitch_deep_shoup_muls"]
        / (deep["keyswitch_deep_ms_fused"] * 1e-3)
        / micro["vpu_shoup_mul_per_s_peak"])

    print(json.dumps({
        "metric": "mlp_fhe_forward_latency",
        "value": steady,
        "unit": "s",
        "vs_baseline": model_s / steady,
        "serving": {
            "serial_inf_per_s": 1.0 / steady,
            "batched_inf_per_s": B / t_batch,
            "batch": B,
            "batched_speedup": (B / t_batch) * steady,
        },
        "micro": micro,
        "deep": deep,
    }))


if __name__ == "__main__":
    main()
