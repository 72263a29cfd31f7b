"""ctypes bindings to the native dynamic micro-batcher (libbatcher.so).

The C++ side (`native/batcher.cc`) owns the serving scheduler: a thread-safe
request queue, size-or-deadline batch formation, and completion signaling.
Python threads submit ids and block in `wait`; one executor thread drains
`next_batch` and runs the jitted model.  Falls back to a pure-Python
implementation with identical semantics when the library is not built.
"""

from __future__ import annotations

import ctypes
import os
import threading
import time
from collections import deque
from typing import List

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "native", "libbatcher.so"
)


def _load():
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sb_create.restype = ctypes.c_void_p
    lib.sb_create.argtypes = [ctypes.c_int32, ctypes.c_int64]
    lib.sb_destroy.argtypes = [ctypes.c_void_p]
    lib.sb_shutdown.argtypes = [ctypes.c_void_p]
    lib.sb_submit.restype = ctypes.c_int32
    lib.sb_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.sb_next_batch.restype = ctypes.c_int32
    lib.sb_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int64
    ]
    lib.sb_complete.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32
    ]
    lib.sb_wait.restype = ctypes.c_int32
    lib.sb_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.sb_pending.restype = ctypes.c_int32
    lib.sb_pending.argtypes = [ctypes.c_void_p]
    return lib


_lib = _load()


def native_available() -> bool:
    return _lib is not None


class NativeBatcher:
    """Thin wrapper over the C++ batcher."""

    def __init__(self, max_batch: int, max_delay_us: int):
        assert _lib is not None, "libbatcher.so not built (native/build.sh)"
        self._h = _lib.sb_create(max_batch, max_delay_us)
        self.max_batch = max_batch

    def submit(self, request_id: int) -> None:
        rc = _lib.sb_submit(self._h, request_id)
        if rc != 0:
            raise RuntimeError("batcher is shut down")

    def next_batch(self, poll_timeout_us: int = 100_000) -> List[int]:
        buf = (ctypes.c_int64 * self.max_batch)()
        n = _lib.sb_next_batch(self._h, buf, self.max_batch, poll_timeout_us)
        if n < 0:
            raise StopIteration
        return [buf[i] for i in range(n)]

    def complete(self, ids: List[int]) -> None:
        arr = (ctypes.c_int64 * len(ids))(*ids)
        _lib.sb_complete(self._h, arr, len(ids))

    def wait(self, request_id: int, timeout_us: int) -> None:
        rc = _lib.sb_wait(self._h, request_id, timeout_us)
        if rc == -2:
            raise TimeoutError(f"request {request_id} timed out")
        if rc == -1:
            raise RuntimeError("batcher is shut down")

    def pending(self) -> int:
        return _lib.sb_pending(self._h)

    def shutdown(self) -> None:
        _lib.sb_shutdown(self._h)

    def close(self) -> None:
        """Shut down and free the native handle (drains blocked waiters)."""
        h, self._h = self._h, None
        if h:
            _lib.sb_destroy(h)

    def __del__(self):  # last-resort cleanup; close() is the real API
        try:
            self.close()
        except Exception:
            pass


class PyBatcher:
    """Pure-Python fallback with the same semantics (condition variables)."""

    def __init__(self, max_batch: int, max_delay_us: int):
        self.max_batch = max_batch
        self.max_delay = max_delay_us / 1e6
        self._lock = threading.Condition()
        self._queue: deque = deque()  # (id, arrival time)
        self._done = set()
        self._shutdown = False

    def submit(self, request_id: int) -> None:
        with self._lock:
            if self._shutdown:
                raise RuntimeError("batcher is shut down")
            self._queue.append((request_id, time.monotonic()))
            self._lock.notify_all()

    def next_batch(self, poll_timeout_us: int = 100_000) -> List[int]:
        with self._lock:
            deadline = time.monotonic() + poll_timeout_us / 1e6
            while not self._queue and not self._shutdown:
                if not self._lock.wait(timeout=deadline - time.monotonic()):
                    if not self._queue:
                        if self._shutdown:
                            raise StopIteration
                        return []
            if self._shutdown and not self._queue:
                raise StopIteration
            close_at = self._queue[0][1] + self.max_delay
            while len(self._queue) < self.max_batch and not self._shutdown:
                remaining = close_at - time.monotonic()
                if remaining <= 0 or not self._lock.wait(timeout=remaining):
                    break
            out = []
            while self._queue and len(out) < self.max_batch:
                out.append(self._queue.popleft()[0])
            return out

    def complete(self, ids: List[int]) -> None:
        with self._lock:
            self._done.update(ids)
            self._lock.notify_all()

    def wait(self, request_id: int, timeout_us: int) -> None:
        with self._lock:
            deadline = time.monotonic() + timeout_us / 1e6
            while request_id not in self._done:
                if self._shutdown:
                    raise RuntimeError("batcher is shut down")
                if not self._lock.wait(timeout=deadline - time.monotonic()):
                    if request_id in self._done:
                        break
                    raise TimeoutError(f"request {request_id} timed out")
            self._done.discard(request_id)

    def pending(self) -> int:
        with self._lock:
            return len(self._queue)

    def shutdown(self) -> None:
        with self._lock:
            self._shutdown = True
            self._lock.notify_all()

    def close(self) -> None:
        self.shutdown()


def make_batcher(max_batch: int, max_delay_us: int):
    cls = NativeBatcher if native_available() else PyBatcher
    return cls(max_batch, max_delay_us)
