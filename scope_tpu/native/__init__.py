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
_SCHED_LIB_PATH = os.path.join(_HERE, "libscope_scheduler.so")
_lock = threading.Lock()
_lib = None
_tried = False
_sched_lib = None
_sched_tried = False


def _build_lib(src_name: str, out_path: str) -> bool:
    src = os.path.join(_HERE, src_name)
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src,
             "-o", out_path],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _build() -> bool:
    return _build_lib("scorer.cpp", _LIB_PATH)


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


def load_scheduler():
    """Returns the slot-scheduler ctypes library or None."""
    global _sched_lib, _sched_tried
    with _lock:
        if _sched_lib is not None or _sched_tried:
            return _sched_lib
        _sched_tried = True
        if not os.path.exists(_SCHED_LIB_PATH):
            if not _build_lib("scheduler.cpp", _SCHED_LIB_PATH):
                return None
        try:
            lib = ctypes.CDLL(_SCHED_LIB_PATH)
        except OSError:
            return None
        c = ctypes
        lib.scope_sched_create.argtypes = [c.c_int32, c.c_int64, c.c_int32]
        lib.scope_sched_create.restype = c.c_void_p
        lib.scope_sched_destroy.argtypes = [c.c_void_p]
        lib.scope_sched_submit.argtypes = [c.c_void_p, c.c_int32, c.c_int32]
        lib.scope_sched_submit.restype = c.c_int64
        lib.scope_sched_admit.argtypes = [
            c.c_void_p, c.POINTER(c.c_int64), c.POINTER(c.c_int32),
            c.POINTER(c.c_int32)]
        lib.scope_sched_admit.restype = c.c_int32
        lib.scope_sched_step.argtypes = [c.c_void_p, c.c_int32]
        lib.scope_sched_step.restype = c.c_int32
        lib.scope_sched_finish.argtypes = [c.c_void_p, c.c_int32]
        lib.scope_sched_finish.restype = c.c_int64
        for name in ("scope_sched_active", "scope_sched_queued"):
            getattr(lib, name).argtypes = [c.c_void_p]
            getattr(lib, name).restype = c.c_int32
        lib.scope_sched_live_tokens.argtypes = [c.c_void_p]
        lib.scope_sched_live_tokens.restype = c.c_int64
        lib.scope_sched_slot_id.argtypes = [c.c_void_p, c.c_int32]
        lib.scope_sched_slot_id.restype = c.c_int64
        for name, res in (("scope_sched_snapshot", c.c_int64),
                          ("scope_sched_restore", c.c_int32)):
            if hasattr(lib, name):
                getattr(lib, name).argtypes = [c.c_void_p, c.c_char_p,
                                               c.c_int64]
                getattr(lib, name).restype = res
        _sched_lib = lib
        return _sched_lib


class SlotScheduler:
    """Pythonic wrapper over the native continuous-batching scheduler,
    with a pure-Python fallback when no C++ toolchain exists."""

    def __init__(self, max_slots: int, token_budget: int,
                 queue_cap: int = 4096):
        self._lib = load_scheduler()
        self.max_slots = max_slots
        if self._lib is not None:
            self._h = self._lib.scope_sched_create(max_slots, token_budget,
                                                   queue_cap)
        else:                               # fallback
            self._h = None
            self._budget = token_budget
            self._queue: List[tuple] = []
            self._slots: List[Optional[tuple]] = [None] * max_slots
            self._live = 0
            self._next = 1

    def submit(self, prompt_len: int, max_new: int) -> int:
        if self._lib is not None:
            return int(self._lib.scope_sched_submit(self._h, prompt_len,
                                                    max_new))
        rid = self._next
        self._next += 1
        self._queue.append((rid, prompt_len, max_new))
        return rid

    def admit(self):
        """Returns (slot, request_id, prompt_len, max_new) or None."""
        if self._lib is not None:
            rid = ctypes.c_int64()
            pl = ctypes.c_int32()
            mn = ctypes.c_int32()
            slot = self._lib.scope_sched_admit(
                self._h, ctypes.byref(rid), ctypes.byref(pl),
                ctypes.byref(mn))
            if slot < 0:
                return None
            return int(slot), int(rid.value), int(pl.value), int(mn.value)
        if not self._queue:
            return None
        rid, pl, mn = self._queue[0]
        if self._live + pl + mn > self._budget:
            return None
        for i, s in enumerate(self._slots):
            if s is None:
                self._queue.pop(0)
                self._slots[i] = (rid, pl, mn, 0)
                self._live += pl + mn
                return i, rid, pl, mn
        return None

    def step(self, slot: int) -> bool:
        """Count one generated token; True if the slot hit max_new."""
        if self._lib is not None:
            return bool(self._lib.scope_sched_step(self._h, slot))
        s = self._slots[slot]
        if s is None:
            return False
        rid, pl, mn, g = s
        self._slots[slot] = (rid, pl, mn, g + 1)
        return g + 1 >= mn

    def finish(self, slot: int) -> int:
        if self._lib is not None:
            return int(self._lib.scope_sched_finish(self._h, slot))
        s = self._slots[slot]
        if s is None:
            return -1
        rid, pl, mn, g = s
        self._slots[slot] = None
        self._live -= pl + mn
        return rid

    @property
    def active(self) -> int:
        if self._lib is not None:
            return int(self._lib.scope_sched_active(self._h))
        return sum(1 for s in self._slots if s is not None)

    @property
    def queued(self) -> int:
        if self._lib is not None:
            return int(self._lib.scope_sched_queued(self._h))
        return len(self._queue)

    @property
    def live_tokens(self) -> int:
        if self._lib is not None:
            return int(self._lib.scope_sched_live_tokens(self._h))
        return self._live

    def snapshot(self):
        """Opaque state blob for fail-stop recovery (engine.snapshot)."""
        if self._lib is not None and hasattr(self._lib,
                                             "scope_sched_snapshot"):
            need = self._lib.scope_sched_snapshot(self._h, None, 0)
            buf = ctypes.create_string_buffer(int(need))
            got = self._lib.scope_sched_snapshot(self._h, buf, need)
            assert got == need
            return ("native", buf.raw)
        return ("py", (self._budget, list(self._queue), list(self._slots),
                       self._live, self._next))

    def restore(self, snap):
        kind, data = snap
        if self._lib is not None and kind == "native":
            rc = self._lib.scope_sched_restore(self._h, data, len(data))
            if rc != 0:
                raise ValueError("scheduler snapshot mismatch")
            return
        if kind != "py" or self._lib is not None:
            raise ValueError("scheduler snapshot kind mismatch "
                             f"({kind!r} vs lib={self._lib is not None})")
        (self._budget, q, slots, self._live, self._next) = data
        self._queue = list(q)
        self._slots = list(slots)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.scope_sched_destroy(self._h)
            self._h = None
