"""ctypes binding to the first-party C++ rANS range coder.

Replaces the reference's torchac dependency
(reference: src/real_life/bitstream.py:10,281,454,482) with a first-party
backend: the shared library is compiled on first use from
``aivc_tpu/native/range_coder.cpp`` (g++ -O3), and a bit-identical pure
Python implementation serves as a fallback / differential-test oracle.

All CDFs are integer-quantized uint32 rows (see aivc_tpu.coding.cdf);
elements address rows through an int32 index array, so the host only ever
receives a small table plus one index per element.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

PROB_BITS = 16
PROB_SCALE = 1 << PROB_BITS
_RANS_L = 1 << 23

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SRC = _NATIVE_DIR / "range_coder.cpp"

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_library() -> Optional[Path]:
    so_path = _NATIVE_DIR / "librange_coder.so"
    if so_path.exists() and so_path.stat().st_mtime >= _SRC.stat().st_mtime:
        return so_path
    try:
        # Build into a temp file then atomically rename, so concurrent
        # importers never load a half-written .so.
        with tempfile.NamedTemporaryFile(
            dir=_NATIVE_DIR, suffix=".so", delete=False
        ) as tmp:
            tmp_path = Path(tmp.name)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(tmp_path), str(_SRC)],
            check=True, capture_output=True,
        )
        os.replace(tmp_path, so_path)
        return so_path
    except (subprocess.CalledProcessError, OSError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    so = _build_library()
    if so is None:
        _lib_failed = True
        return None
    lib = ctypes.CDLL(str(so))
    lib.rans_encode.restype = ctypes.c_long
    lib.rans_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
    ]
    lib.rans_decode.restype = ctypes.c_long
    lib.rans_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_long, ctypes.POINTER(ctypes.c_uint16),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _check_inputs(symbols, cdf, row_idx):
    symbols = np.ascontiguousarray(symbols, dtype=np.uint16)
    cdf = np.ascontiguousarray(cdf, dtype=np.uint32)
    row_idx = np.ascontiguousarray(row_idx, dtype=np.int32)
    if cdf.ndim != 2:
        raise ValueError("cdf must be [n_rows, Lp]")
    if symbols.shape != row_idx.shape or symbols.ndim != 1:
        raise ValueError("symbols and row_idx must be 1-D and equal length")
    if row_idx.size and (row_idx.min() < 0 or row_idx.max() >= cdf.shape[0]):
        raise ValueError("row_idx out of range")
    return symbols, cdf, row_idx


def encode(symbols: np.ndarray, cdf: np.ndarray, row_idx: np.ndarray) -> bytes:
    """rANS-encode symbols (uint16, each in [0, Lp-2]) against CDF rows."""
    symbols, cdf, row_idx = _check_inputs(symbols, cdf, row_idx)
    n = symbols.size
    if n == 0:
        return b""
    lib = _load()
    if lib is None:
        return _py_encode(symbols, cdf, row_idx)
    capacity = 4 * n + 64  # worst case ~16 bits/symbol + flush slack
    while True:
        out = np.empty(capacity, dtype=np.uint8)
        nbytes = lib.rans_encode(
            symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n,
            cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cdf.shape[1],
            row_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), capacity,
        )
        if nbytes == -1:
            capacity *= 2
            continue
        if nbytes < 0:
            raise ValueError(f"rans_encode failed with code {nbytes}")
        return out[:nbytes].tobytes()


def decode(data: bytes, n: int, cdf: np.ndarray, row_idx: np.ndarray) -> np.ndarray:
    """Decode n symbols from a byte string against CDF rows."""
    if n == 0:
        return np.empty(0, dtype=np.uint16)
    dummy = np.zeros(n, dtype=np.uint16)
    _, cdf, row_idx = _check_inputs(dummy, cdf, row_idx)
    lib = _load()
    if lib is None:
        return _py_decode(data, n, cdf, row_idx)
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint16)
    rc = lib.rans_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cdf.shape[1],
        row_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    if rc != 0:
        raise ValueError(f"rans_decode failed with code {rc}")
    return out


# ---------------------------------------------------------------------------
# Pure-Python mirror (bit-identical; fallback + differential-test oracle)
# ---------------------------------------------------------------------------

def _py_encode(symbols: np.ndarray, cdf: np.ndarray, row_idx: np.ndarray) -> bytes:
    out = bytearray()
    x = _RANS_L
    for i in range(symbols.size - 1, -1, -1):
        row = cdf[row_idx[i]]
        s = int(symbols[i])
        start = int(row[s])
        freq = int(row[s + 1]) - start
        if freq == 0:
            raise ValueError("zero-frequency symbol")
        x_max = ((_RANS_L >> PROB_BITS) << 8) * freq
        while x >= x_max:
            out.append(x & 0xFF)
            x >>= 8
        x = ((x // freq) << PROB_BITS) + (x % freq) + start
    for _ in range(4):
        out.append(x & 0xFF)
        x >>= 8
    return bytes(reversed(out))


def _py_decode(data: bytes, n: int, cdf: np.ndarray, row_idx: np.ndarray) -> np.ndarray:
    x = int.from_bytes(data[0:4], "big")
    pos = 4
    out = np.empty(n, dtype=np.uint16)
    for i in range(n):
        row = cdf[row_idx[i]]
        dv = x & (PROB_SCALE - 1)
        s = int(np.searchsorted(row, dv, side="right")) - 1
        start = int(row[s])
        freq = int(row[s + 1]) - start
        out[i] = s
        x = freq * (x >> PROB_BITS) + dv - start
        while x < _RANS_L:
            if pos < len(data):
                x = (x << 8) | data[pos]
                pos += 1
            else:
                x <<= 8
    return out
