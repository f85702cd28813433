"""Property tests for the packing stage against an INDEPENDENT oracle.

The multiplexed layout is reproduced here with torch.pixel_shuffle and the
convolutions with torch.conv2d — none of the orion_tpu index arithmetic is
reused — so these tests pin the packed matrices/diagonals to the layout
spec itself (random conv configs: packed matvec == multiplexed conv
output; diagonal reconstruction == block matvec).
"""

import math
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from orion_tpu.compiler import packing  # noqa: E402


def mux_oracle(x: np.ndarray, gap: int, grid) -> np.ndarray:
    """Flat multiplexed vector of logical (C, H, W) via torch.pixel_shuffle."""
    C, H, W = x.shape
    Cm, Hm, Wm = grid
    t = torch.zeros(1, Cm * gap * gap, H, W, dtype=torch.float64)
    t[0, :C] = torch.from_numpy(x)
    ps = F.pixel_shuffle(t, gap)[0].numpy()  # (Cm, H*gap, W*gap)
    out = np.zeros(grid)
    out[:, : H * gap, : W * gap] = ps
    return out.reshape(-1)


CONV_CASES = [
    # Ci, Co, k, stride, pad, dilation, groups, Hi, iG
    (1, 4, 3, 1, 1, 1, 1, 8, 1),
    (3, 8, 3, 1, 1, 1, 1, 8, 1),
    (4, 8, 3, 2, 1, 1, 1, 8, 1),     # strided: gap doubles
    (8, 8, 3, 1, 1, 1, 1, 8, 2),     # already-multiplexed input
    (4, 4, 1, 1, 0, 1, 1, 6, 1),     # 1x1
    (2, 6, 5, 1, 2, 1, 1, 9, 1),     # 5x5, odd image
    (4, 4, 3, 1, 2, 2, 1, 8, 1),     # dilated
    (4, 4, 2, 2, 0, 1, 4, 8, 2),     # grouped (pool-style), strided
]


def make_conv_layer(Ci, Co, k, stride, pad, dil, groups, Hi, iG, rng):
    Ho = (Hi + 2 * pad - dil * (k - 1) - 1) // stride + 1
    oG = iG * stride
    on_Hi = Hi * iG
    in_grid = (math.ceil(Ci / iG**2), on_Hi, on_Hi)
    out_grid = (math.ceil(Co / oG**2),
                max(on_Hi, Ho * oG), max(on_Hi, Ho * oG))
    w = rng.standard_normal((Co, Ci // groups, k, k))
    return SimpleNamespace(
        on_weight=w, in_channels=Ci, out_channels=Co, groups=groups,
        padding=(pad, pad), dilation=(dil, dil), stride=(stride, stride),
        input_gap=iG, output_gap=oG,
        input_shape=(1, Ci, Hi, Hi),
        output_shape=(1, Co, Ho, Ho),
        fhe_input_shape=(1,) + in_grid,
        fhe_output_shape=(1,) + out_grid,
    ), Ho


@pytest.mark.parametrize("case", CONV_CASES)
def test_conv_matrix_matches_torch(case):
    Ci, Co, k, stride, pad, dil, groups, Hi, iG = case
    rng = np.random.default_rng(hash(case) % 2**31)
    layer, Ho = make_conv_layer(*case, rng)

    weight = (packing.grouped_weight(layer) if groups > 1
              else np.asarray(layer.on_weight, np.float64))
    mat = packing.conv_matrix(layer, weight)

    x = rng.standard_normal((Ci, Hi, Hi))
    y = F.conv2d(torch.from_numpy(x[None]),
                 torch.from_numpy(layer.on_weight),
                 stride=stride, padding=pad, dilation=dil,
                 groups=groups)[0].numpy()

    got = mat @ mux_oracle(x, iG, layer.fhe_input_shape[1:])
    want = mux_oracle(y, layer.output_gap, layer.fhe_output_shape[1:])
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_conv_matrix_batched():
    case = CONV_CASES[1]
    rng = np.random.default_rng(0)
    layer, Ho = make_conv_layer(*case, rng)
    layer.fhe_input_shape = (2,) + layer.fhe_input_shape[1:]
    layer.fhe_output_shape = (2,) + layer.fhe_output_shape[1:]
    layer.input_shape = (2,) + layer.input_shape[1:]
    layer.output_shape = (2,) + layer.output_shape[1:]
    mat = packing.conv_matrix(
        layer, np.asarray(layer.on_weight, np.float64))
    Ci, Hi = case[0], case[7]
    xs = [rng.standard_normal((Ci, Hi, Hi)) for _ in range(2)]
    vec = np.concatenate(
        [mux_oracle(x, layer.input_gap, layer.fhe_input_shape[1:])
         for x in xs])
    got = mat @ vec
    outs = []
    for x in xs:
        y = F.conv2d(torch.from_numpy(x[None]),
                     torch.from_numpy(layer.on_weight),
                     stride=case[3], padding=case[4])[0].numpy()
        outs.append(mux_oracle(y, layer.output_gap,
                               layer.fhe_output_shape[1:]))
    np.testing.assert_allclose(got, np.concatenate(outs), atol=1e-10)


def test_linear_matrix_from_spatial():
    rng = np.random.default_rng(3)
    Ci, Hi, iG, out_f = 4, 8, 2, 10
    grid = (1, Hi * iG, Hi * iG)
    layer = SimpleNamespace(
        on_weight=rng.standard_normal((out_f, Ci * Hi * Hi)),
        input_shape=(1, Ci, Hi, Hi), input_gap=iG,
        fhe_input_shape=(1,) + grid)
    mat = packing.linear_matrix(layer)
    x = rng.standard_normal((Ci, Hi, Hi))
    got = mat @ mux_oracle(x, iG, grid)
    want = layer.on_weight @ x.reshape(-1)
    np.testing.assert_allclose(got, want, atol=1e-10)


def _reconstruct(blocks, out_rots, slots, x, mh):
    """Evaluate the diagonal form exactly as the encrypted path does:
    rotate-mul-accumulate per block then fold replicas with rotations."""
    n_brow = max(r for r, _ in blocks) + 1
    n_bcol = max(c for _, c in blocks) + 1
    xpad = np.zeros(n_bcol * slots)
    xpad[: x.size] = x
    out = np.zeros(n_brow * slots)
    for (bi, bj), diags in blocks.items():
        xin = xpad[bj * slots:(bj + 1) * slots]
        acc = np.zeros(slots)
        for d, vec in diags.items():
            acc += vec * np.roll(xin, -d)
        out[bi * slots:(bi + 1) * slots] += acc
    for i in range(1, out_rots + 1):
        out += np.roll(out, -(slots // 2 ** i))
    return out[:mh]


@pytest.mark.parametrize("shape,slots,method,last", [
    ((13, 64), 64, "hybrid", False),   # hybrid: short single block row
    ((13, 64), 64, "hybrid", True),    # last layer: square
    ((13, 64), 64, "square", False),
    ((130, 64), 64, "hybrid", False),  # multiple block rows: square
    ((40, 150), 64, "hybrid", False),  # multiple block cols
    ((64, 64), 64, "hybrid", False),   # exact fit
])
def test_diagonal_reconstruction(shape, slots, method, last):
    rng = np.random.default_rng(shape[0] * 1000 + shape[1])
    dense = rng.standard_normal(shape) * (rng.random(shape) < 0.3)
    import scipy.sparse as sp
    blocks, out_rots = packing.extract_diagonals(
        sp.csr_matrix(dense), slots, method, last)
    x = rng.standard_normal(shape[1])
    got = _reconstruct(blocks, out_rots, slots, x, shape[0])
    np.testing.assert_allclose(got, dense @ x, atol=1e-9)


def test_bn2d_embedding():
    rng = np.random.default_rng(7)
    Ci, Hi, iG = 4, 8, 2
    grid = (1, Hi * iG, Hi * iG)
    bn = SimpleNamespace(
        input_shape=(1, Ci, Hi, Hi), fhe_input_shape=(1,) + grid,
        input_gap=iG, eps=1e-5, affine=True,
        on_running_mean=rng.standard_normal(Ci),
        on_running_var=rng.random(Ci) + 0.5,
        on_weight=rng.standard_normal(Ci),
        on_bias=rng.standard_normal(Ci))
    mean, inv_std, weight, bias = packing.pack_bn2d(bn)
    x = rng.standard_normal((Ci, Hi, Hi))
    vec = mux_oracle(x, iG, grid)
    got = (vec - mean) * inv_std * weight + bias * (inv_std != 0)
    want_l = ((x - bn.on_running_mean[:, None, None])
              / np.sqrt(bn.on_running_var + bn.eps)[:, None, None]
              * bn.on_weight[:, None, None] + bn.on_bias[:, None, None])
    want = mux_oracle(want_l, iG, grid)
    occupied = mux_oracle(np.ones((Ci, Hi, Hi)), iG, grid) > 0
    np.testing.assert_allclose(got[occupied], want[occupied], atol=1e-10)
    # gap slots must ZERO stray values (inv_std == 0 outside the tensor)
    assert np.all(inv_std[~occupied] == 0)
