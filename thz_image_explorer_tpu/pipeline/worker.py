"""Asynchronous pipeline worker with latest-wins command coalescing.

Host-threading equivalent of the reference's two-thread architecture: the
GUI thread sends ``ConfigCommand``s over a bounded(1) crossbeam channel
with drop-oldest semantics (``config.rs:41-51``) to ``main_thread``
(``data_thread.rs:148``), which owns all compute. Here a worker thread
owns the :class:`Explorer`; callers enqueue commands through a
single-slot latest-wins queue backed by the native C slot
(``native/thznative.c``), falling back to a pure-Python equivalent.

Abort semantics follow the reference: a raised abort flag cancels the
in-flight stage and drains the pending command
(``data_thread.rs:163-172``).
"""

from __future__ import annotations

import ctypes
import threading
from typing import Any, Callable, Optional

from thz_image_explorer_tpu import native
from thz_image_explorer_tpu.pipeline.explorer import Explorer


class LatestWinsSlot:
    """Single-command slot: putting replaces any pending command."""

    def __init__(self):
        self._lib = native.load()
        self._payloads: dict[int, Any] = {}
        self._seq = 0
        self._py_lock = threading.Lock()
        if self._lib is not None:
            self._handle = self._lib.thz_cmd_slot_new()
        else:
            self._handle = None
            self._cv = threading.Condition()
            self._pending: Optional[int] = None
            self._closed = False

    def put(self, command: Any):
        with self._py_lock:
            self._seq += 1
            seq = self._seq
            self._payloads.clear()  # drop-oldest
            self._payloads[seq] = command
        if self._handle is not None:
            self._lib.thz_cmd_slot_put(self._handle, seq)
        else:
            with self._cv:
                self._pending = seq
                self._cv.notify()

    def take(self, timeout: Optional[float] = None) -> Optional[Any]:
        """Blocking take; returns None on timeout or close."""
        if self._handle is not None:
            seq = ctypes.c_uint64()
            ms = -1 if timeout is None else int(timeout * 1000)
            res = self._lib.thz_cmd_slot_take(self._handle, ms, ctypes.byref(seq))
            if res != 1:
                return None
            with self._py_lock:
                return self._payloads.pop(seq.value, None)
        with self._cv:
            if self._pending is None and not self._closed:
                self._cv.wait(timeout)
            if self._pending is None:
                return None
            seq, self._pending = self._pending, None
        with self._py_lock:
            return self._payloads.pop(seq, None)

    def empty(self) -> bool:
        with self._py_lock:
            return not self._payloads

    def drain(self) -> bool:
        # drop the payloads too — an orphaned payload would keep empty()
        # false forever and wedge the worker's idle detection
        with self._py_lock:
            self._payloads.clear()
        if self._handle is not None:
            return bool(self._lib.thz_cmd_slot_drain(self._handle))
        with self._cv:
            had = self._pending is not None
            self._pending = None
            return had

    def close(self):
        if self._handle is not None:
            self._lib.thz_cmd_slot_close(self._handle)
        else:
            with self._cv:
                self._closed = True
                self._cv.notify_all()


class ExplorerWorker:
    """Worker thread owning an Explorer; commands are (method, args)."""

    def __init__(self, explorer: Optional[Explorer] = None):
        self.explorer = explorer or Explorer()
        self.slot = LatestWinsSlot()
        self.abort_flag = threading.Event()
        self.explorer.pipeline.cancelled = self.abort_flag.is_set
        self._on_update: list[Callable[[Explorer], None]] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._idle = threading.Event()
        self._idle.set()
        # Guards idle transitions against in-flight sends: clearing idle and
        # publishing the command happen atomically w.r.t. the worker's
        # "queue empty -> idle" decision, so join_idle can never observe
        # idle while a command is mid-enqueue.
        self._idle_lock = threading.Lock()
        self._thread.start()

    def send(self, method: str, *args, **kwargs):
        """Enqueue a command; only the most recent pending command runs
        (``send_latest_config``)."""
        with self._idle_lock:
            self._idle.clear()
            self.slot.put((method, args, kwargs))

    def abort(self):
        """Abort in-flight work and drain pending commands
        (``data_thread.rs:163-172``)."""
        self.abort_flag.set()
        self.slot.drain()

    def on_update(self, callback: Callable[[Explorer], None]):
        self._on_update.append(callback)

    def join_idle(self, timeout: Optional[float] = None) -> bool:
        """Wait until the queue is empty and the worker is idle."""
        return self._idle.wait(timeout)

    def close(self):
        self._stop.set()
        self.slot.close()
        self._thread.join(timeout=5)

    def _run(self):
        while not self._stop.is_set():
            cmd = self.slot.take(timeout=0.1)
            if cmd is None:
                with self._idle_lock:
                    if self.slot.empty():
                        self._idle.set()
                continue
            self._idle.clear()
            self.abort_flag.clear()
            method, args, kwargs = cmd
            try:
                getattr(self.explorer, method)(*args, **kwargs)
                for cb in self._on_update:
                    cb(self.explorer)
            except Exception:  # noqa: BLE001 — worker must survive bad commands
                import traceback

                traceback.print_exc()
            finally:
                with self._idle_lock:
                    if self.slot.empty():
                        self._idle.set()
