"""io_mode: save/load of secret keys and packed diagonals (HDF5).

Reference parity: the io_mode system (`orion/backend/python/
key_generator.py:17-31` sk HDF5 save/load; `lt_evaluator.py:93-153,203-321`
per-layer diagonal + metadata streaming with compatibility verification).

`io_mode: save` writes artifacts during compile; `load` reads them back
instead of re-packing, with a parameter-compatibility check.  Unlike the
reference (which evicts per-transform to bound RAM on CPU), device
plaintexts live in HBM; eviction policies come with the serving work.
"""

from __future__ import annotations

import os

import h5py
import numpy as np


def _params_fingerprint(params) -> str:
    return (f"logn={params.logn};logq={params.logq};logp={params.logp};"
            f"logscale={params.logscale};h={params.h};"
            f"embed={params.embedding_method}")


# ----------------------------- secret key ----------------------------- #

def save_secret_key(scheme, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "a") as f:
        if "secret_key" in f:
            del f["secret_key"]
        ds = f.create_dataset("secret_key", data=scheme.keys.s_coeff)
        ds.attrs["fingerprint"] = _params_fingerprint(scheme.params)


def load_secret_key(scheme, path: str) -> bool:
    if not os.path.exists(path):
        return False
    with h5py.File(path, "r") as f:
        if "secret_key" not in f:
            return False
        ds = f["secret_key"]
        if ds.attrs.get("fingerprint") != _params_fingerprint(scheme.params):
            raise ValueError(
                "saved secret key was generated under different parameters; "
                "delete the keys file or fix the config "
                f"({ds.attrs.get('fingerprint')!r})")
        s = np.asarray(ds)
    from ..crypto.keys import KeyChest
    scheme.keys = KeyChest.from_secret(scheme.ctx, s)
    return True


# --------------------------- rotation keys --------------------------- #

def _sk_digest(scheme) -> str:
    import hashlib
    return hashlib.sha256(
        np.ascontiguousarray(scheme.keys.s_coeff)).hexdigest()[:16]


def save_rotation_keys(scheme, path: str):
    """Persist the evaluation keys surviving compile (reference parity:
    `orion/backend/python/lt_evaluator.py:283-321` rotation-key HDF5).

    Only raw key data is stored; Shoup companions are recomputed on load
    (they are a pure function of the data — half the file size).  Keys are
    bound to the generating secret key via a digest so a stale file cannot
    silently decrypt to noise.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fp = _params_fingerprint(scheme.params) + ";sk=" + _sk_digest(scheme)
    with h5py.File(path, "a") as f:
        if "rotation_keys" in f:
            del f["rotation_keys"]
        g = f.create_group("rotation_keys")
        g.attrs["fingerprint"] = fp
        g.create_dataset("relin", data=np.asarray(scheme.keys.relin_key.data))
        for k, ksk in scheme.keys.galois_keys.items():
            g.create_dataset(f"galois_{int(k)}", data=np.asarray(ksk.data))


def load_rotation_keys(scheme, path: str) -> bool:
    """Fill the KeyChest's lazy caches from a saved key file; any rotation
    not present simply regenerates on first use."""
    if not os.path.exists(path):
        return False
    from ..crypto.keys import KeySwitchKey
    fp = _params_fingerprint(scheme.params) + ";sk=" + _sk_digest(scheme)
    with h5py.File(path, "r") as f:
        if "rotation_keys" not in f:
            return False
        g = f["rotation_keys"]
        if g.attrs.get("fingerprint") != fp:
            raise ValueError(
                "saved rotation keys belong to different parameters or a "
                "different secret key; regenerate with io_mode: save")
        for name, ds in g.items():
            data = np.asarray(ds)
            if name == "relin":
                scheme.keys.relin_key = KeySwitchKey(data, scheme.ctx)
            elif name.startswith("galois_"):
                k = int(name.split("_", 1)[1])
                scheme.keys.galois_keys[k] = KeySwitchKey(data, scheme.ctx)
    return True


# ----------------------------- diagonals ----------------------------- #

def save_layer_diagonals(params, layer, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "a") as f:
        name = layer.name or type(layer).__name__
        if name in f:
            del f[name]
        g = f.create_group(name)
        g.attrs["fingerprint"] = _params_fingerprint(params)
        g.attrs["output_rotations"] = layer.output_rotations
        g.attrs["input_shape"] = list(layer.input_shape)
        g.attrs["output_shape"] = list(layer.output_shape)
        g.create_dataset("on_bias", data=np.asarray(layer.on_bias))
        dg = g.create_group("diagonals")
        for (row, col), diags in layer.diagonals.items():
            block = dg.create_group(f"{row}_{col}")
            for idx, vec in diags.items():
                block.create_dataset(str(int(idx)), data=np.asarray(vec))


def load_layer_diagonals(params, layer, path: str) -> bool:
    if not os.path.exists(path):
        return False
    name = layer.name or type(layer).__name__
    with h5py.File(path, "r") as f:
        if name not in f:
            return False
        g = f[name]
        if g.attrs.get("fingerprint") != _params_fingerprint(params):
            raise ValueError(
                f"saved diagonals for {name} use different parameters; "
                "regenerate with io_mode: save")
        layer.output_rotations = int(g.attrs["output_rotations"])
        layer.on_bias = np.asarray(g["on_bias"])
        diagonals = {}
        for key, block in g["diagonals"].items():
            row, col = map(int, key.split("_"))
            diagonals[(row, col)] = {
                int(idx): np.asarray(vec) for idx, vec in block.items()}
        layer.diagonals = diagonals
    return True
