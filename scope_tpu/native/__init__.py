"""Native (C++) runtime components, loaded via ctypes.

Currently: the LongGenBench answer-extraction scorer (evaluator hot path,
scorer.cpp).  The library is built on demand with the system compiler
(``make -C scope_tpu/native`` or automatically on first use); callers fall
back to the pure-Python implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libscope_scorer.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_HERE, "scorer.cpp")
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_scorer():
    """Returns the ctypes library or None (pure-Python fallback)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        for name in ("scope_extract_gsm8k", "scope_extract_mmlu",
                     "scope_extract_csqa"):
            fn = getattr(lib, name)
            fn.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
            fn.restype = ctypes.c_int
        _lib = lib
        return _lib


def _call(fn, pred: str) -> Optional[List[str]]:
    data = pred.encode("utf-8", errors="replace")
    cap = max(4096, len(data) + 16)
    buf = ctypes.create_string_buffer(cap)
    n = fn(data, buf, cap)
    if n < 0:
        return None
    out, off = [], 0
    raw = buf.raw
    for _ in range(n):
        end = raw.index(b"\0", off)
        out.append(raw[off:end].decode("utf-8", errors="replace"))
        off = end + 1
    return out


def extract_gsm8k(pred: str) -> Optional[List[str]]:
    lib = load_scorer()
    if lib is None:
        return None
    return _call(lib.scope_extract_gsm8k, pred)


def extract_mmlu(pred: str) -> Optional[List[str]]:
    lib = load_scorer()
    if lib is None:
        return None
    return _call(lib.scope_extract_mmlu, pred)


def extract_csqa(pred: str) -> Optional[List[str]]:
    lib = load_scorer()
    if lib is None:
        return None
    return _call(lib.scope_extract_csqa, pred)
