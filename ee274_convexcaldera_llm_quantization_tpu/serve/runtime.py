"""ctypes bindings for the native serving runtime (``runtime/ccq_runtime.cpp``).

Builds the shared library on first use (cached next to the source; rebuilt
when the source is newer). The C++ side owns page tables and admission
control; Python owns device arrays and the jitted steps.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "runtime", "ccq_runtime.cpp")
_LIB = os.path.join(_REPO_ROOT, "runtime", "libccq_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.check_call(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB])


def load_library() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        c_i32 = ctypes.c_int32
        c_p = ctypes.c_void_p
        pi32 = ctypes.POINTER(c_i32)
        c_i64 = ctypes.c_int64
        pi64 = ctypes.POINTER(c_i64)
        sigs = {
            "ccq_alloc_create": ([c_i32, c_i32], c_p),
            "ccq_alloc_destroy": ([c_p], None),
            "ccq_alloc_free_pages": ([c_p], c_i32),
            "ccq_seq_create": ([c_p, c_i32, c_i32], c_i32),
            "ccq_seq_create_cached": ([c_p, c_i32, pi32, c_i32], c_i32),
            "ccq_alloc_cache_stats": ([c_p, pi64, pi64], None),
            "ccq_seq_append": ([c_p, c_i32], c_i32),
            "ccq_seq_length": ([c_p, c_i32], c_i32),
            "ccq_seq_page_table": ([c_p, c_i32, pi32, c_i32], c_i32),
            "ccq_seq_free": ([c_p, c_i32], c_i32),
            "ccq_sched_create": ([c_i32], c_p),
            "ccq_sched_destroy": ([c_p], None),
            "ccq_sched_submit": ([c_p, c_i32, c_i32, c_i32], None),
            "ccq_sched_submit_pri": ([c_p, c_i32, c_i32, c_i32, c_i32,
                                      c_i32], None),
            "ccq_sched_queue_len": ([c_p], c_i32),
            "ccq_sched_active_count": ([c_p], c_i32),
            "ccq_sched_admit": ([c_p, c_p, pi32, pi32, c_i32], c_i32),
            "ccq_sched_admit_nocreate": ([c_p, c_p, pi32, pi32, c_i32],
                                         c_i32),
            "ccq_sched_record_token": ([c_p, c_p, c_i32, c_i32], c_i32),
            "ccq_sched_finish": ([c_p, c_p, c_i32], c_i32),
        }
        for name, (argtypes, restype) in sigs.items():
            fn = getattr(lib, name)
            fn.argtypes = argtypes
            fn.restype = restype
        _lib = lib
        return lib


class PageAllocator:
    """Python handle over the native page allocator."""

    def __init__(self, num_pages: int, page_size: int):
        self._lib = load_library()
        self._ptr = self._lib.ccq_alloc_create(num_pages, page_size)
        self.num_pages = num_pages
        self.page_size = page_size

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.ccq_alloc_destroy(self._ptr)
            self._ptr = None

    @property
    def free_pages(self) -> int:
        return self._lib.ccq_alloc_free_pages(self._ptr)

    def create_seq(self, seq_id: int, prompt_len: int) -> bool:
        return self._lib.ccq_seq_create(self._ptr, seq_id, prompt_len) == 0

    def create_seq_cached(self, seq_id: int, tokens: np.ndarray) -> int:
        """Create a sequence with prefix-cache reuse.

        Page-aligned prompt prefixes seen before share their KV pages
        (refcounted, never rewritten). Returns the number of prompt tokens
        whose KV is already in the pool — the caller prefills only the
        remainder. Raises on OOM / duplicate id.
        """
        toks = np.ascontiguousarray(tokens, np.int32)
        r = self._lib.ccq_seq_create_cached(
            self._ptr, seq_id,
            toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(toks))
        if r == -1:
            raise MemoryError("KV page pool exhausted")
        if r == -2:
            raise KeyError(f"duplicate sequence {seq_id}")
        return r

    @property
    def cache_stats(self) -> Tuple[int, int]:
        """(tokens served from prefix cache, tokens eligible)."""
        hits = ctypes.c_int64()
        lookups = ctypes.c_int64()
        self._lib.ccq_alloc_cache_stats(self._ptr, ctypes.byref(hits),
                                        ctypes.byref(lookups))
        return hits.value, lookups.value

    def append(self, seq_id: int) -> int:
        """Append a token; returns the page index (raises on OOM)."""
        page = self._lib.ccq_seq_append(self._ptr, seq_id)
        if page == -1:
            raise MemoryError("KV page pool exhausted")
        if page == -2:
            raise KeyError(f"unknown sequence {seq_id}")
        return page

    def length(self, seq_id: int) -> int:
        return self._lib.ccq_seq_length(self._ptr, seq_id)

    def page_table(self, seq_id: int, max_pages: Optional[int] = None
                   ) -> np.ndarray:
        cap = max_pages or self.num_pages
        buf = np.zeros(cap, np.int32)
        n = self._lib.ccq_seq_page_table(
            self._ptr, seq_id,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
        if n == -2:
            raise KeyError(f"unknown sequence {seq_id}")
        return buf[:n]

    def free_seq(self, seq_id: int) -> None:
        self._lib.ccq_seq_free(self._ptr, seq_id)


class NativeScheduler:
    """Python handle over the native continuous-batching scheduler."""

    def __init__(self, max_slots: int, allocator: PageAllocator):
        self._lib = load_library()
        self._ptr = self._lib.ccq_sched_create(max_slots)
        self.allocator = allocator
        self.max_slots = max_slots

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.ccq_sched_destroy(self._ptr)
            self._ptr = None

    def submit(self, uid: int, prompt_len: int, max_new_tokens: int,
               priority: int = 0, tenant: int = 0) -> None:
        """Queue a request. Admission order: priority desc, then tenants
        with fewer generated tokens (fair share), then FIFO age."""
        if priority or tenant:
            self._lib.ccq_sched_submit_pri(self._ptr, uid, prompt_len,
                                           max_new_tokens, priority, tenant)
        else:
            self._lib.ccq_sched_submit(self._ptr, uid, prompt_len,
                                       max_new_tokens)

    @property
    def queue_len(self) -> int:
        return self._lib.ccq_sched_queue_len(self._ptr)

    @property
    def active_count(self) -> int:
        return self._lib.ccq_sched_active_count(self._ptr)

    def admit(self, create_seqs: bool = True) -> List[Tuple[int, int]]:
        """Admit as many queued requests as slots/pages allow.
        Returns [(uid, slot), ...]. With ``create_seqs=False`` the caller
        must create each allocator sequence itself (e.g. with
        ``PageAllocator.create_seq_cached`` for prefix reuse)."""
        uids = np.zeros(self.max_slots, np.int32)
        slots = np.zeros(self.max_slots, np.int32)
        fn = (self._lib.ccq_sched_admit if create_seqs
              else self._lib.ccq_sched_admit_nocreate)
        n = fn(self._ptr, self.allocator._ptr,
               uids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
               slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
               self.max_slots)
        return list(zip(uids[:n].tolist(), slots[:n].tolist()))

    def record_token(self, uid: int, is_eos: bool = False) -> bool:
        """Returns True if the sequence just finished."""
        r = self._lib.ccq_sched_record_token(self._ptr, self.allocator._ptr,
                                             uid, int(is_eos))
        if r == -1:
            raise MemoryError("KV page pool exhausted")
        if r == -2:
            raise KeyError(f"unknown uid {uid}")
        return r == 1

    def finish(self, uid: int) -> int:
        """Free the sequence; returns the released slot."""
        slot = self._lib.ccq_sched_finish(self._ptr, self.allocator._ptr,
                                          uid)
        if slot == -2:
            raise KeyError(f"unknown uid {uid}")
        return slot
