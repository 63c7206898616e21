"""Native (C++) codec loading: compile-on-demand + ctypes bindings.

The trajectory bit-codecs (XTC today; the GROMACS TPR/CPT plugin interface
later) are serial host work and live in C++ (SURVEY §2.2 plan). The shared
library is built from the bundled sources with g++ on first use and cached
next to the sources (falling back to ~/.cache/molar_tpu when the package dir
is read-only).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import sys

_DIR = pathlib.Path(__file__).parent
_SOURCES = ["xtc_codec.cpp"]
_LIB_NAME = "libmolar_native.so"


class NativeBuildError(RuntimeError):
    pass


def _build(out: pathlib.Path) -> None:
    srcs = [str(_DIR / s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *srcs, "-o", str(out)]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeBuildError(f"native build failed:\n{proc.stderr}")


def _lib_path() -> pathlib.Path:
    candidates = [_DIR / _LIB_NAME]
    cache = pathlib.Path(
        os.environ.get("XDG_CACHE_HOME", pathlib.Path.home() / ".cache")
    ) / "molar_tpu"
    candidates.append(cache / _LIB_NAME)
    newest_src = max((_DIR / s).stat().st_mtime for s in _SOURCES)
    for cand in candidates:
        if cand.exists() and cand.stat().st_mtime >= newest_src:
            return cand
    for cand in candidates:
        try:
            cand.parent.mkdir(parents=True, exist_ok=True)
            _build(cand)
            return cand
        except (OSError, NativeBuildError) as e:
            last = e
            continue
    raise NativeBuildError(f"could not build native library: {last}")


_lib = None


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_lib_path()))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        longp = ctypes.POINTER(ctypes.c_long)

        lib.xtc_parse_header.restype = ctypes.c_int
        lib.xtc_parse_header.argtypes = [
            u8p, ctypes.c_long, i32p, i32p, f32p, f32p, longp,
        ]
        lib.xtc_decode_frame_buf.restype = ctypes.c_int
        lib.xtc_decode_frame_buf.argtypes = [
            u8p, ctypes.c_long, f32p, f32p, i32p, f32p, f32p,
        ]
        lib.xtc_decode_frame_detect.restype = ctypes.c_int
        lib.xtc_decode_frame_detect.argtypes = [
            u8p, ctypes.c_long, f32p, f32p, i32p, f32p, f32p, i32p,
        ]
        lib.xtc_decode_frame_prefix.restype = ctypes.c_int
        lib.xtc_decode_frame_prefix.argtypes = [
            u8p, ctypes.c_long, f32p, ctypes.c_int32, f32p, i32p, f32p,
            ctypes.c_int32,
        ]
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.xtc_decode_frame_buf_i16.restype = ctypes.c_int
        lib.xtc_decode_frame_buf_i16.argtypes = [
            u8p, ctypes.c_long, i16p, f32p, i32p, f32p, f32p,
        ]
        lib.xtc_decode_frame_prefix_i16.restype = ctypes.c_int
        lib.xtc_decode_frame_prefix_i16.argtypes = [
            u8p, ctypes.c_long, i16p, ctypes.c_int32, f32p, i32p, f32p,
            f32p, ctypes.c_int32,
        ]
        lib.xtc_encode_frame.restype = ctypes.c_long
        lib.xtc_encode_frame.argtypes = [
            f32p, ctypes.c_int, f32p, ctypes.c_int32, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(u8p),
        ]
        lib.xtc_free.restype = None
        lib.xtc_free.argtypes = [u8p]
        lib.xtc_index.restype = ctypes.c_long
        lib.xtc_index.argtypes = [
            u8p, ctypes.c_long, longp, i32p, f32p, ctypes.c_long, i32p,
        ]
        _lib = lib
    return _lib
