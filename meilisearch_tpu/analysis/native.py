"""ctypes bridge to the native tokenizer (native/tokenizer.cpp).

The native path handles ASCII/Latin text (the indexing hot path); anything it
can't fold byte-for-byte identically to the Python pipeline returns -1 and
the caller falls back, so the two implementations cannot diverge on accepted
input. Built on demand by native/build.sh; absence of the .so is fine.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_LIB = None
_LIB_TRIED = False

_MAX_TOKENS = 4096
_NORM_CAP = 1 << 16


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    so_path = os.path.join(root, "native", "libmstpu.so")
    if not os.path.exists(so_path):
        src = os.path.join(root, "native", "tokenizer.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["sh", os.path.join(root, "native", "build.sh")],
                    capture_output=True,
                    timeout=120,
                    check=True,
                )
            except Exception:
                return None
    if not os.path.exists(so_path):
        return None
    try:
        lib = ctypes.CDLL(so_path)
        lib.mstpu_tokenize.restype = ctypes.c_int32
        lib.mstpu_tokenize.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


class _Buffers:
    def __init__(self):
        self.raw_starts = (ctypes.c_int32 * _MAX_TOKENS)()
        self.raw_lens = (ctypes.c_int32 * _MAX_TOKENS)()
        self.positions = (ctypes.c_int32 * _MAX_TOKENS)()
        self.norm_lens = (ctypes.c_int32 * _MAX_TOKENS)()
        self.norm_buf = ctypes.create_string_buffer(_NORM_CAP)


_BUFS: Optional[_Buffers] = None


def native_indexed_words(text: str, stop_words) -> Optional[list[tuple[str, int]]]:
    """Native (word, position) extraction; None -> use the Python path."""
    lib = _load()
    if lib is None:
        return None
    global _BUFS
    if _BUFS is None:
        _BUFS = _Buffers()
    data = text.encode("utf-8")
    if len(data) > _NORM_CAP // 2:
        return None
    b = _BUFS
    n = lib.mstpu_tokenize(
        data,
        len(data),
        b.raw_starts,
        b.raw_lens,
        b.positions,
        b.norm_lens,
        b.norm_buf,
        _NORM_CAP,
        _MAX_TOKENS,
    )
    if n < 0:
        return None
    out = []
    norm_off = 0
    raw = data
    for i in range(n):
        nl = b.norm_lens[i]
        word = b.norm_buf.raw[norm_off : norm_off + nl].decode("ascii")
        norm_off += nl
        if stop_words:
            raw_tok = raw[b.raw_starts[i] : b.raw_starts[i] + b.raw_lens[i]].decode(
                "utf-8"
            )
            if raw_tok in stop_words:
                continue
        if word:
            out.append((word, b.positions[i]))
    return out
