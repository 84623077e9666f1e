"""ctypes bindings for the native (C++) host IPM backend.

The reference toolbox hands every convex subproblem to the ECOS C solver
(SCPToolbox.jl Project.toml:11, src/parser/program.jl:419-424); this module
is our native counterpart: `native/ipm.cpp` implements the same HSDE
Mehrotra predictor-corrector conic IPM as the TPU-path JAX solver
(ops/ipm.py) in dependency-free f64 C++. It serves two roles:

  * cross-check oracle in the test suite — two independent implementations
    of the same method must agree on (x, obj, status);
  * host backend for small problems where a device round trip costs more
    than the solve (scaling LPs, golden-search inner solves).

The shared library is built on demand with g++ (no pybind11 in the image;
plain ctypes over an `extern "C"` API). Build products live in
native/build/ and are rebuilt when ipm.cpp is newer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import NamedTuple, Optional

import numpy as np

from scptoolbox_tpu.ops.cones import ConeSpec
from scptoolbox_tpu.ops.ipm import IPMStatus

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "ipm.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libscptipm.so")
_STAMP = _LIB + ".sha256"  # content hash of the ipm.cpp the .so was built from

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _src_digest() -> str:
    import hashlib

    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


class NativeSolution(NamedTuple):
    x: np.ndarray
    s: np.ndarray
    z: np.ndarray
    status: IPMStatus
    iters: int
    pres: float
    dres: float
    gap: float
    obj: float


def _build(force: bool = False) -> Optional[str]:
    """Compile the shared library if missing/stale. Returns error or None.

    Staleness is keyed on a content hash of ipm.cpp recorded next to the
    .so (never on mtimes: after a fresh clone both files carry checkout
    time, which would make any committed binary look permanently fresh)."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    digest = _src_digest()
    if not force and os.path.exists(_LIB) and os.path.exists(_STAMP):
        try:
            with open(_STAMP) as f:
                if f.read().strip() == digest:
                    return None
        except OSError:
            pass
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", _SRC, "-o", _LIB]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as exc:  # g++ missing etc.
        return f"{type(exc).__name__}: {exc}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    with open(_STAMP, "w") as f:
        f.write(digest)
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err is not None:
            _build_error = err
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as exc:
            # ABI-incompatible or corrupt committed binary: rebuild once
            err = _build(force=True)
            if err is not None:
                _build_error = f"load failed ({exc}); rebuild failed: {err}"
                return None
            try:
                lib = ctypes.CDLL(_LIB)
            except OSError as exc2:
                _build_error = f"load failed after rebuild: {exc2}"
                return None
        dptr = ctypes.POINTER(ctypes.c_double)
        iptr = ctypes.POINTER(ctypes.c_int)
        lib.scpt_ipm_solve.restype = ctypes.c_int
        lib.scpt_ipm_solve.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, iptr, dptr, dptr, dptr,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            dptr, dptr, dptr, dptr,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native backend could be built and loaded."""
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def solve(A, b, c, spec: ConeSpec, *, tol: float = 1e-8,
          tol_almost: float = 1e-5, max_iter: int = 50) -> NativeSolution:
    """Solve min c'x s.t. Ax + s = b, s in K on the host (f64).

    Same problem form and status semantics as ops/ipm.py `solve`.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native backend unavailable: {_build_error}")
    A = np.ascontiguousarray(np.asarray(A, np.float64))
    b = np.ascontiguousarray(np.asarray(b, np.float64))
    c = np.ascontiguousarray(np.asarray(c, np.float64))
    m, n = A.shape
    assert m == spec.m and b.shape == (m,) and c.shape == (n,)
    socs = np.asarray(spec.socs, np.int32)
    x = np.zeros(n)
    s = np.zeros(m)
    z = np.zeros(m)
    info = np.zeros(6)
    dptr = ctypes.POINTER(ctypes.c_double)
    iptr = ctypes.POINTER(ctypes.c_int)
    rc = lib.scpt_ipm_solve(
        m, n, spec.nz, spec.nl, len(spec.socs),
        socs.ctypes.data_as(iptr),
        A.ctypes.data_as(dptr), b.ctypes.data_as(dptr),
        c.ctypes.data_as(dptr),
        max_iter, tol, tol_almost,
        x.ctypes.data_as(dptr), s.ctypes.data_as(dptr),
        z.ctypes.data_as(dptr), info.ctypes.data_as(dptr),
    )
    if rc != 0:
        raise RuntimeError(f"scpt_ipm_solve failed with code {rc}")
    return NativeSolution(
        x=x, s=s, z=z, status=IPMStatus(int(info[0])), iters=int(info[1]),
        pres=float(info[2]), dres=float(info[3]), gap=float(info[4]),
        obj=float(info[5]),
    )
