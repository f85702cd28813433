"""Native (C++/OpenMP) host kernels, built on first import.

The crypto compute path is jax/XLA/Pallas on the TPU; these kernels cover
the *host* side of the pipeline — compile-time plaintext encoding (tens of
thousands of diagonal NTTs when packing a deep net) and client-side
encrypt/decrypt — mirroring where the reference keeps its host crypto
native (Lattigo's Go ring package, `orion/backend/lattigo/encoder.go`).

Build model: a single translation unit compiled with the system g++ into
`~/.cache/orion_tpu/host_ntt-<hash>.so` (no pip/cmake needed), loaded via
ctypes.  Any failure — no compiler, sandboxed cache dir, missing OpenMP —
degrades silently to the numpy path in `crypto/ref.py`; `lib` is None then.
Set ORION_TPU_NO_NATIVE=1 to force the numpy path (used by the
equivalence test to cross-check both).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "host_ntt.cpp"

lib = None


def _build():
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache = Path(os.environ.get("ORION_TPU_NATIVE_CACHE",
                                Path.home() / ".cache" / "orion_tpu"))
    so = cache / f"host_ntt-{tag}.so"
    if not so.exists():
        cache.mkdir(parents=True, exist_ok=True)
        with tempfile.TemporaryDirectory(dir=cache) as td:
            tmp = Path(td) / "host_ntt.so"
            cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
                   "-o", str(tmp), str(_SRC)]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            tmp.replace(so)
    return ctypes.CDLL(str(so))


if not os.environ.get("ORION_TPU_NO_NATIVE"):
    try:
        lib = _build()
        _i64p = ctypes.POINTER(ctypes.c_int64)
        _u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.ntt_rows.argtypes = [_i64p, ctypes.c_int64, ctypes.c_int64,
                                 _i64p, _i64p, _i64p, _u64p]
        lib.ntt_rows.restype = None
        lib.intt_rows.argtypes = [_i64p, ctypes.c_int64, ctypes.c_int64,
                                  _i64p, _i64p, _i64p, _u64p, _i64p, _u64p]
        lib.intt_rows.restype = None
    except Exception:  # pragma: no cover - degraded environments
        lib = None


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


def ntt_rows(a: np.ndarray, prime_idx: np.ndarray, primes: np.ndarray,
             tw: np.ndarray, tw_shoup: np.ndarray) -> None:
    """In-place forward NTT of int64[rows, n]; tables are (nprimes, n)."""
    rows, n = a.shape
    lib.ntt_rows(_ptr(a, _i64p), rows, n, _ptr(prime_idx, _i64p),
                 _ptr(primes, _i64p), _ptr(tw, _i64p), _ptr(tw_shoup, _u64p))


def intt_rows(a: np.ndarray, prime_idx: np.ndarray, primes: np.ndarray,
              itw: np.ndarray, itw_shoup: np.ndarray,
              ninv: np.ndarray, ninv_shoup: np.ndarray) -> None:
    """In-place inverse NTT of int64[rows, n]."""
    rows, n = a.shape
    lib.intt_rows(_ptr(a, _i64p), rows, n, _ptr(prime_idx, _i64p),
                  _ptr(primes, _i64p), _ptr(itw, _i64p),
                  _ptr(itw_shoup, _u64p), _ptr(ninv, _i64p),
                  _ptr(ninv_shoup, _u64p))
