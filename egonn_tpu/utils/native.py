"""Loader for the framework's native (C++) components.

Shared libraries are built on demand with g++ into egonn_tpu/native/build/ and
loaded via ctypes (pybind11 is not available in this image). Each native piece has
a pure-python fallback so the framework degrades gracefully without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")


def _build_shared(name: str, sources: list[str], extra_flags: Optional[list[str]] = None) -> Optional[str]:
    """Compile sources into build/lib<name>.so if absent or stale. Returns the
    path, or None if no toolchain is available."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    srcs = [os.path.join(_NATIVE_DIR, s) for s in sources]
    if os.path.exists(out) and all(os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *(extra_flags or []),
           "-o", out, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import warnings

        warnings.warn(f"native build of {name} failed ({e}); using python fallback")
        return None
    return out


_lzf_lib = None
_lzf_tried = False


def lzf_decompress(data: bytes, expected_size: int) -> bytes:
    """LZF-decompress `data` into exactly `expected_size` bytes.

    Uses the C++ decoder (native/lzf.cpp) when buildable, else a pure-python
    fallback. Raises ValueError on corrupt input or size mismatch.
    """
    global _lzf_lib, _lzf_tried
    if not _lzf_tried:
        _lzf_tried = True
        path = _build_shared("egonn_lzf", ["lzf.cpp"])
        if path is not None:
            lib = ctypes.CDLL(path)
            lib.lzf_decompress.restype = ctypes.c_size_t
            lib.lzf_decompress.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_char_p,
                ctypes.c_size_t,
            ]
            _lzf_lib = lib
    if _lzf_lib is not None:
        out = ctypes.create_string_buffer(expected_size)
        n = _lzf_lib.lzf_decompress(data, len(data), out, expected_size)
        if n != expected_size:
            raise ValueError(
                f"lzf_decompress: got {n} bytes, expected {expected_size}"
            )
        return out.raw
    return _lzf_decompress_py(data, expected_size)


def _lzf_decompress_py(data: bytes, expected_size: int) -> bytes:
    """Pure-python LZF decoder (fallback)."""
    out = bytearray()
    ip, n = 0, len(data)
    while ip < n:
        ctrl = data[ip]
        ip += 1
        if ctrl < 32:
            run = ctrl + 1
            out += data[ip : ip + run]
            ip += run
        else:
            length = ctrl >> 5
            if length == 7:
                length += data[ip]
                ip += 1
            ref = len(out) - ((ctrl & 0x1F) << 8) - 1 - data[ip]
            ip += 1
            if ref < 0:
                raise ValueError("lzf: corrupt back-reference")
            for _ in range(length + 2):
                out.append(out[ref])
                ref += 1
    if len(out) != expected_size:
        raise ValueError(f"lzf: got {len(out)} bytes, expected {expected_size}")
    return bytes(out)


def lzf_compress_py(data: bytes) -> bytes:
    """Minimal valid LZF encoder (literal runs only) — used by tests and PCD
    writing; decompresses with any conformant decoder."""
    out = bytearray()
    for i in range(0, len(data), 32):
        chunk = data[i : i + 32]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)
