"""Packing: weight matrices -> SIMD slot diagonals.

Reference parity: `orion/core/packing.py`.  Re-implemented in numpy/scipy
(no torch): convolutions become sparse Toeplitz matrices with multiplexed
channel packing (gap logic + row-interchange permutation), linear layers
pack directly; batch is folded into slots via kron with the identity; each
(slots x slots) block yields generalised diagonals, with the "hybrid"
embedding shrinking block height to the next power of two and emitting
log2(slots/height) output rotations.

The algorithms below follow the behaviors documented in the reference (gap
propagation `orion/nn/linear.py:241-260`, pixel-shuffle multiplexing
`packing.py:159-166`, diagonal layout `packing.py:182-300`) — the actual
diagonal semantics are validated by tests against cleartext layer outputs.
"""

from __future__ import annotations

import math

import numpy as np
import scipy.sparse as sp


# ------------------------------------------------------------------ #
#  Multiplexing (pixel-shuffle packing)                              #
# ------------------------------------------------------------------ #

def pixel_shuffle(x: np.ndarray, gap: int) -> np.ndarray:
    """numpy F.pixel_shuffle: (N, C*g^2, H, W) -> (N, C, H*g, W*g)."""
    n, c2, h, w = x.shape
    c = c2 // (gap * gap)
    x = x.reshape(n, c, gap, gap, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # N, C, H, g, W, g
    return x.reshape(n, c, h * gap, w * gap)


def multiplex(matrix: np.ndarray, gap: int) -> np.ndarray:
    """Pad channels to a multiple of gap^2 then pixel-shuffle
    (reference `packing.py:159-166`)."""
    n, ci, hi, wi = matrix.shape
    co = math.ceil(ci / (gap ** 2))
    padded = np.zeros((n, co * gap ** 2, hi, wi), dtype=matrix.dtype)
    padded[:, :ci] = matrix
    return pixel_shuffle(padded, gap)


# ------------------------------------------------------------------ #
#  Conv2d -> Toeplitz                                                #
# ------------------------------------------------------------------ #

def resolve_grouped_conv(conv_layer) -> np.ndarray:
    """Expand grouped-conv weights to full-channel weights with a mask
    (reference `packing.py:168-180`)."""
    w = np.tile(conv_layer.on_weight, (1, conv_layer.groups, 1, 1))
    mask = np.zeros_like(w)
    ci_per = conv_layer.in_channels // conv_layer.groups
    co_per = conv_layer.out_channels // conv_layer.groups
    for g in range(conv_layer.groups):
        mask[g * co_per:(g + 1) * co_per, g * ci_per:(g + 1) * ci_per] = 1
    return w * mask


def construct_conv2d_toeplitz(conv_layer, weight: np.ndarray) -> sp.csr_matrix:
    """Sparse multiplexed Toeplitz matrix of a conv layer."""
    N, on_Ci, on_Hi, on_Wi = conv_layer.fhe_input_shape
    on_Co, on_Ho, on_Wo = conv_layer.fhe_output_shape[1:]
    Ho, Wo = conv_layer.output_shape[2:]

    P = conv_layer.padding[0]
    D = conv_layer.dilation[0]
    iG = conv_layer.input_gap
    oG = conv_layer.output_gap
    kH, kW = weight.shape[2:]

    hi_pad = on_Hi + 2 * P * iG
    wi_pad = on_Wi + 2 * P * iG

    n_rows = on_Co * on_Ho * on_Wo
    n_cols = on_Ci * hi_pad * wi_pad
    img_idx = np.arange(n_cols).reshape(on_Ci, hi_pad, wi_pad)

    # kernel padded to channel multiples of gap^2
    kernel = np.zeros((on_Co * oG ** 2, on_Ci * iG ** 2, kH, kW),
                      dtype=np.float64)
    kernel[: weight.shape[0], : weight.shape[1]] = weight
    kernel_flat = kernel.reshape(kernel.shape[0], -1)

    # indices the kernel touches at its first placement: one anchor per
    # multiplexed sub-pixel, kernel taps offset by D*iG
    mpx_anchors = img_idx[:, :iG, :iG].reshape(-1, 1)
    row_off = np.arange(0, kH * D * iG, D * iG).reshape(-1, 1)
    col_off = np.arange(0, kW * D * iG, D * iG)
    kernel_offsets = img_idx[0, row_off, col_off].flatten()
    initial_pos = (mpx_anchors + kernel_offsets).flatten()

    # row-interchange map: multiplexed output ordering
    out_idx = np.arange(on_Ho * on_Wo).reshape(on_Ho, on_Wo)
    start_indices = out_idx[:oG, :oG].flatten()
    corner_rows = out_idx[0:(Ho * oG):oG, 0:(Wo * oG):oG].reshape(-1, 1)
    row_map = corner_rows + start_indices

    corner_indices = img_idx[0, 0:(Ho * oG):oG, 0:(Wo * oG):oG].flatten()
    out_channels = (np.arange(on_Co) * (on_Ho * on_Wo)).reshape(on_Co, 1)

    toeplitz = sp.lil_matrix((n_rows, n_cols), dtype=np.float64)
    for i, start in enumerate(corner_indices):
        rows = (row_map[i] + out_channels).reshape(-1, 1)
        cols = initial_pos + start
        toeplitz[rows, cols] = kernel_flat

    # keep only the unpadded input columns
    rsel = np.arange(P * iG, P * iG + on_Hi).reshape(-1, 1)
    csel = np.arange(P * iG, P * iG + on_Wi)
    image_cols = img_idx[:, rsel, csel].flatten()
    toeplitz = toeplitz.tocsc()[:, image_cols]

    # batch support: fold N into slots
    return sp.kron(sp.eye(N, dtype=np.float64), toeplitz, format="csr")


def construct_conv2d_bias(conv_layer) -> np.ndarray:
    N, Co, Ho, Wo = conv_layer.output_shape
    on_Co, on_Ho, on_Wo = conv_layer.fhe_output_shape[1:]
    bias = np.repeat(conv_layer.on_bias, Ho * Wo).reshape(1, Co, Ho, Wo)
    bias_m = multiplex(bias, conv_layer.output_gap)[0]
    out = np.zeros((on_Co, on_Ho, on_Wo))
    mc, mh, mw = bias_m.shape
    out[:mc, :mh, :mw] = bias_m
    return np.tile(out.flatten(), N)


# ------------------------------------------------------------------ #
#  Linear                                                            #
# ------------------------------------------------------------------ #

def construct_linear_matrix(linear_layer) -> sp.csr_matrix:
    if len(linear_layer.input_shape) == 2:
        N = linear_layer.input_shape[0]
        matrix = np.asarray(linear_layer.on_weight, dtype=np.float64)
    else:
        # prior layer was spatial: un-multiplex the weight columns
        out_features = linear_layer.out_features
        input_gap = linear_layer.input_gap
        N, Ci, Hi, Wi = linear_layer.input_shape
        on_Ci, on_Hi, on_Wi = linear_layer.fhe_input_shape[1:]
        reshaped = linear_layer.on_weight.reshape(out_features, Ci, Hi, Wi)
        reshaped = multiplex(reshaped.astype(np.float64), input_gap)
        matrix = np.zeros((out_features, on_Ci, on_Hi, on_Wi))
        matrix[..., : Hi * input_gap, : Wi * input_gap] = reshaped
        matrix = matrix.reshape(out_features, -1)
    full = sp.kron(sp.eye(N, dtype=np.float64), sp.csr_matrix(matrix),
                   format="csr")
    return full


def construct_linear_bias(linear_layer) -> np.ndarray:
    N = linear_layer.input_shape[0]
    return np.tile(np.asarray(linear_layer.on_bias, dtype=np.float64), N)


# ------------------------------------------------------------------ #
#  Diagonal extraction                                               #
# ------------------------------------------------------------------ #

def diagonalize(matrix: sp.csr_matrix, num_slots: int, embed_method: str,
                is_last_layer: bool):
    """Extract generalised diagonals per (slots x slots) block.

    Returns ({(block_row, block_col): {diag_idx: np.ndarray}}, out_rots).
    Hybrid embedding (single block row, not last layer): block height
    shrinks to 2^ceil(log2(rows)) and the caller must fold the replicated
    partial sums with log2(slots/height) rotations.
    """
    mh, mw = matrix.shape
    nbr = math.ceil(mh / num_slots)
    nbc = math.ceil(mw / num_slots)

    if nbr == 1 and embed_method == "hybrid" and not is_last_layer:
        block_height = 2 ** math.ceil(math.log2(mh))
        output_rotations = int(math.log2(num_slots // block_height))
    else:
        block_height = num_slots
        output_rotations = 0

    matrix = matrix.copy()
    matrix.resize(nbr * block_height, nbc * num_slots)

    row_idx = np.tile(np.arange(block_height), num_slots // block_height)
    col_idx = (np.arange(block_height)[:, None]
               + np.arange(num_slots)[None, :]) % num_slots

    diagonals_by_block = {}
    total = 0
    for br in range(nbr):
        for bc in range(nbc):
            rs = num_slots * br
            cs = num_slots * bc
            block = np.asarray(matrix[rs: rs + block_height,
                                      cs: cs + num_slots].todense())
            # diag d of the block: diag[j] = block[j % height, (d + j) % slots]
            diags = block[row_idx[None, :], col_idx]
            nonzero = {}
            for d in range(block_height):
                if np.any(diags[d]):
                    nonzero[d] = diags[d].astype(np.float64)
            total += len(nonzero)
            diagonals_by_block[(br, bc)] = (
                nonzero or {0: np.zeros(num_slots)})
    return diagonals_by_block, output_rotations


# ------------------------------------------------------------------ #
#  Layer-level entry points                                          #
# ------------------------------------------------------------------ #

def pack_linear(linear_layer, last: bool):
    slots = linear_layer.scheme.params.slots
    method = linear_layer.scheme.params.embedding_method
    weight = construct_linear_matrix(linear_layer)
    return diagonalize(weight, slots, method, last)


def pack_conv2d(conv_layer, last: bool):
    slots = conv_layer.scheme.params.slots
    method = conv_layer.scheme.params.embedding_method
    weight = conv_layer.on_weight.astype(np.float64)
    if conv_layer.groups > 1:
        weight = resolve_grouped_conv(conv_layer)
    toeplitz = construct_conv2d_toeplitz(conv_layer, weight)
    return diagonalize(toeplitz, slots, method, last)


# ------------------------------------------------------------------ #
#  BatchNorm packing                                                 #
# ------------------------------------------------------------------ #

def pack_bn1d(bn):
    N = bn.input_shape[0]
    mean = np.tile(bn.on_running_mean.flatten(), N)
    inv_std = np.tile(1.0 / np.sqrt(bn.on_running_var + bn.eps), N)
    weight = np.tile(bn.on_weight.flatten(), N) if bn.affine else None
    bias = np.tile(bn.on_bias.flatten(), N) if bn.affine else None
    return mean, inv_std, weight, bias


def pack_bn2d(bn):
    N, Ci, Hi, Wi = bn.input_shape
    on_Ci, on_Hi, on_Wi = bn.fhe_input_shape[1:]
    mean4 = np.broadcast_to(bn.on_running_mean.reshape(1, Ci, 1, 1),
                            (1, Ci, Hi, Wi))
    var4 = np.broadcast_to(bn.on_running_var.reshape(1, Ci, 1, 1),
                           (1, Ci, Hi, Wi))
    mean_m = multiplex(np.asarray(mean4, np.float64), bn.input_gap)[0]
    var_m = multiplex(np.asarray(var4, np.float64), bn.input_gap)[0]

    mean = np.zeros((on_Ci, on_Hi, on_Wi))
    inv_std = np.zeros((on_Ci, on_Hi, on_Wi))
    mc, mh, mw = mean_m.shape
    mean[:mc, :mh, :mw] = mean_m
    with np.errstate(divide="ignore"):
        inv = 1.0 / np.sqrt(var_m + bn.eps)
    inv_std[:mc, :mh, :mw] = inv

    weight = bias = None
    if bn.affine:
        w4 = np.broadcast_to(bn.on_weight.reshape(1, Ci, 1, 1),
                             (1, Ci, Hi, Wi))
        b4 = np.broadcast_to(bn.on_bias.reshape(1, Ci, 1, 1),
                             (1, Ci, Hi, Wi))
        w_m = multiplex(np.asarray(w4, np.float64), bn.input_gap)[0]
        b_m = multiplex(np.asarray(b4, np.float64), bn.input_gap)[0]
        weight = np.zeros((on_Ci, on_Hi, on_Wi))
        bias = np.zeros((on_Ci, on_Hi, on_Wi))
        weight[:mc, :mh, :mw] = w_m
        bias[:mc, :mh, :mw] = b_m
        weight = np.tile(weight.flatten(), N)
        bias = np.tile(bias.flatten(), N)
    return (np.tile(mean.flatten(), N), np.tile(inv_std.flatten(), N),
            weight, bias)
