"""ctypes bindings for the native C++ KV runtime (native/kv_runtime.cpp).

The binding layer of the framework's native runtime — the role
`include/pybind.cpp` plays in the reference, done with ctypes because this
environment ships no pybind11.  The .so is built on demand with g++ and
cached next to the source keyed by a content hash, so `pip install`-less
checkouts work and editing the C++ rebuilds automatically.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "kv_runtime.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "build")
_LOCK = threading.Lock()
_LIB = None


def _build_lib() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"libkv_runtime_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = so_path + f".tmp{os.getpid()}"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp],
        check=True, capture_output=True, text=True)
    os.replace(tmp, so_path)  # atomic: concurrent builders race benignly
    return so_path


def _load():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_lib())
            i32, i64, p = ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p
            I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.cf_pool_create.restype = p
            lib.cf_pool_create.argtypes = [i32, i32, i32]
            lib.cf_pool_destroy.argtypes = [p]
            lib.cf_pool_free_pages.restype = i32
            lib.cf_pool_free_pages.argtypes = [p]
            lib.cf_pool_num_requests.restype = i32
            lib.cf_pool_num_requests.argtypes = [p]
            lib.cf_pool_set_window.restype = i32
            lib.cf_pool_set_window.argtypes = [p, i32]
            lib.cf_request_add.restype = i32
            lib.cf_request_add.argtypes = [p, i64, i32]
            lib.cf_request_release.restype = i32
            lib.cf_request_release.argtypes = [p, i64]
            lib.cf_request_len.restype = i32
            lib.cf_request_len.argtypes = [p, i64]
            lib.cf_request_pages.restype = i32
            lib.cf_request_pages.argtypes = [p, i64, I32P]
            lib.cf_prepare_batch.restype = i32
            lib.cf_prepare_batch.argtypes = [p, i32, I64P, I32P, I32P, I32P,
                                             I32P]
            lib.cf_commit_batch.restype = i32
            lib.cf_commit_batch.argtypes = [p]
            lib.cf_discard_batch.restype = i32
            lib.cf_discard_batch.argtypes = [p]
            _LIB = lib
    return _LIB


class PagedKVScheduler:
    """Page allocator + continuous-batching scheduler over the native pool.

    Produces exactly the (block_table, seq_lens, positions) operands of
    ``llama_decoder_layer_paged``; page 0 is the reserved NULL page for
    batch-padding rows.
    """

    def __init__(self, num_pages: int, page_size: int,
                 max_pages_per_req: int):
        self._lib = _load()
        self._h = self._lib.cf_pool_create(num_pages, page_size,
                                           max_pages_per_req)
        if not self._h:
            raise ValueError("bad pool geometry")
        self.num_pages = num_pages
        self.page_size = page_size
        self.max_pages_per_req = max_pages_per_req
        # last decodable token index: one page slot is always reserved for
        # the token being decoded
        self.max_tokens = max_pages_per_req * page_size - 1

    def set_window(self, window_tokens: int) -> int:
        """Rolling-buffer mode for a TOKEN window: computes and installs the
        minimal safe page cap, ``ceil(window/page_size) + 1`` (the +1 is the
        filling tail page), and returns it.  This is the API serving code
        should use — it guarantees the recycle-safety invariant
        ``window_tokens <= (window_pages - 1)·page_size + 1`` by
        construction (a too-small cap would let ``grow_slot`` recycle a
        page that still holds in-window KV, silently corrupting attention;
        see the C contract at ``native/kv_runtime.cpp:cf_pool_set_window``).
        """
        if window_tokens <= 0:
            raise ValueError(f"window_tokens must be > 0, got "
                             f"{window_tokens}")
        window_pages = -(-window_tokens // self.page_size) + 1
        self.set_window_pages(window_pages, _window_tokens=window_tokens)
        return window_pages

    def set_window_pages(self, window_pages: int,
                         _window_tokens: int | None = None) -> None:
        """Rolling-buffer mode (sliding-window attention): cap each
        request's REAL pages at ``window_pages``; below-window block-table
        slots become the NULL page (masked by the kernels).  Must be set
        before any request is added.

        SAFETY CONTRACT: the attention window (in tokens) must satisfy
        ``window <= (window_pages - 1)·page_size + 1``, or page recycling
        overwrites still-in-window KV with no error.  Prefer
        :meth:`set_window`, which derives the cap from the token window;
        when calling this low-level form directly, pass ``_window_tokens``
        to have the invariant checked."""
        if _window_tokens is not None and \
                _window_tokens > (window_pages - 1) * self.page_size + 1:
            raise ValueError(
                f"window_pages={window_pages} unsafe for a "
                f"{_window_tokens}-token window at page_size="
                f"{self.page_size}: recycling would overwrite in-window KV "
                f"(need >= {-(-_window_tokens // self.page_size) + 1})")
        rc = self._lib.cf_pool_set_window(self._h, window_pages)
        if rc != 0:
            raise ValueError("set_window_pages: bad value or pool in use")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.cf_pool_destroy(self._h)
            self._h = None

    @property
    def free_pages(self) -> int:
        return self._lib.cf_pool_free_pages(self._h)

    @property
    def num_requests(self) -> int:
        return self._lib.cf_pool_num_requests(self._h)

    def add(self, req_id: int, prompt_len: int) -> None:
        rc = self._lib.cf_request_add(self._h, req_id, prompt_len)
        if rc == -2:
            raise ValueError(
                f"prompt of {prompt_len} tokens exceeds request capacity "
                f"{self.max_tokens}")
        if rc != 0:
            raise ValueError(f"duplicate or invalid request {req_id}")

    def release(self, req_id: int) -> None:
        self._lib.cf_request_release(self._h, req_id)

    def request_len(self, req_id: int) -> int:
        return self._lib.cf_request_len(self._h, req_id)

    def request_pages(self, req_id: int) -> np.ndarray:
        out = np.zeros(self.max_pages_per_req, np.int32)
        n = self._lib.cf_request_pages(self._h, req_id, out)
        if n < 0:
            raise KeyError(req_id)
        return out[:n]

    def prepare_batch(self, max_batch: int) -> Tuple[
            np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """-> (req_ids [B], block_table [B, max_pages], seq_lens [B],
        positions [B], newly_admitted [B] bool).  B may be 0."""
        ids = np.zeros(max_batch, np.int64)
        table = np.zeros((max_batch, self.max_pages_per_req), np.int32)
        lens = np.zeros(max_batch, np.int32)
        poss = np.zeros(max_batch, np.int32)
        fresh = np.zeros(max_batch, np.int32)
        B = self._lib.cf_prepare_batch(self._h, max_batch, ids,
                                       table.reshape(-1), lens, poss, fresh)
        assert B >= 0
        return (ids[:B], table[:B], lens[:B], poss[:B],
                fresh[:B].astype(bool))

    def commit_batch(self) -> None:
        self._lib.cf_commit_batch(self._h)

    def discard_batch(self) -> None:
        """Abandon the last prepared batch without advancing lengths."""
        self._lib.cf_discard_batch(self._h)
