"""Native (C++) runtime components, loaded via ctypes.

``grumpkin_native.cc`` provides Montgomery BN254-Fr arithmetic and Grumpkin
group operations (the host-side replacement for the reference's barretenberg
C++/WASM FFI).  The library is compiled on first use with g++ -O3 into the
package directory; all callers fall back to the pure-Python implementations if
no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "grumpkin_native.cc")
_LIB = os.path.join(_DIR, "libacvm_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _lib_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.grumpkin_mul.argtypes = [u8p, u8p, u8p]
        lib.grumpkin_msm.argtypes = [u8p, u8p, ctypes.c_size_t, u8p]
        lib.grumpkin_mul_batch.argtypes = [u8p, u8p, ctypes.c_size_t, u8p]
        lib.grumpkin_add.argtypes = [u8p, u8p, u8p]
        lib.bn254fr_mul_batch.argtypes = [u8p, u8p, ctypes.c_size_t, u8p]
        lib.bn254fr_inv_batch.argtypes = [u8p, ctypes.c_size_t, u8p]
        lib.acvm_native_abi_version.restype = ctypes.c_int
        assert lib.acvm_native_abi_version() == 1
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _buf(data: bytes):
    return (ctypes.c_uint8 * len(data)).from_buffer_copy(data)


def _point_bytes(point: Optional[Tuple[int, int]]) -> bytes:
    if point is None:
        return b"\x00" * 64
    return point[0].to_bytes(32, "big") + point[1].to_bytes(32, "big")


def _bytes_point(data: bytes) -> Optional[Tuple[int, int]]:
    x = int.from_bytes(data[:32], "big")
    y = int.from_bytes(data[32:64], "big")
    if x == 0 and y == 0:
        return None
    return (x, y)


def grumpkin_mul(point, scalar: int):
    lib = load()
    out = (ctypes.c_uint8 * 64)()
    lib.grumpkin_mul(
        _buf(_point_bytes(point)), _buf(scalar.to_bytes(32, "big")), out
    )
    return _bytes_point(bytes(out))


def grumpkin_add(p1, p2):
    lib = load()
    out = (ctypes.c_uint8 * 64)()
    lib.grumpkin_add(_buf(_point_bytes(p1)), _buf(_point_bytes(p2)), out)
    return _bytes_point(bytes(out))


def grumpkin_msm(points: List, scalars: List[int]):
    lib = load()
    assert len(points) == len(scalars)
    pts = b"".join(_point_bytes(p) for p in points)
    ss = b"".join(int(s).to_bytes(32, "big") for s in scalars)
    out = (ctypes.c_uint8 * 64)()
    lib.grumpkin_msm(_buf(pts), _buf(ss), len(points), out)
    return _bytes_point(bytes(out))


def grumpkin_mul_batch(point, scalars: List[int]):
    lib = load()
    ss = b"".join(int(s).to_bytes(32, "big") for s in scalars)
    out = (ctypes.c_uint8 * (64 * len(scalars)))()
    lib.grumpkin_mul_batch(_buf(_point_bytes(point)), _buf(ss), len(scalars), out)
    raw = bytes(out)
    return [_bytes_point(raw[64 * i : 64 * (i + 1)]) for i in range(len(scalars))]
