"""Asynchronous pipeline worker with two-lane command routing.

Host-threading equivalent of the reference's two-thread architecture: the
GUI thread sends ``ConfigCommand``s to ``main_thread``
(``data_thread.rs:148``), which owns all compute. The reference uses TWO
channels with different loss semantics (``config.rs:41-51`` vs
``config.rs:296-299``):

* a **bounded(1) latest-wins** channel for config commands — a newer
  slider value replaces a stale pending one;
* a **dedicated unbounded** channel for ROI operations, consumed
  losslessly (``gui/left_panel.rs:111-120``), precisely so that one-shot
  commands can never be coalesced away.

Here both lanes live in ONE native FIFO (``thz_cmd_queue`` in
``native/thznative.c``) with **per-key coalescing** layered on top: a
command with a coalescing key (slider moves, pixel clicks, per-filter
updates) replaces any still-queued command with the same key *in place*
(keeping its queue position), while one-shot commands (ROI add/delete,
open/save, Apply) get unique keys and are never dropped. This is a strict
superset of the reference's split — distinct commands are lossless AND a
slider drag coalesces against itself only, never against an unrelated
pending command (the reference's bounded(1) channel can drop a *different*
command type; see ``send_latest_config``'s drop-oldest).

Abort semantics follow the reference: a raised abort flag cancels the
in-flight stage and drains pending commands (``data_thread.rs:163-172``).
"""

from __future__ import annotations

import ctypes
import threading
import time as _time
from collections import deque
from typing import Any, Callable, Optional

from thz_image_explorer_tpu import native
from thz_image_explorer_tpu.pipeline.explorer import Explorer

#: Explorer methods that coalesce per method name — continuous controls
#: where only the latest value matters (the reference's latest-wins set,
#: ``config.rs:58-164`` ConfigCommand variants driven by sliders/toggles).
COALESCE_BY_METHOD = frozenset(
    {
        "set_fft_window_low",
        "set_fft_window_high",
        "set_fft_window_type",
        "set_fft_log_plot",
        "set_avg_in_fourier_space",
        "set_fft_resolution",
        "set_downscaling",
        "set_selected_pixel",
        "set_reference",
        "set_sample",
        "set_material_thickness",
        "update_material_calculation",
        "set_3d_contrast",
        "set_kernel_sigma",
        "set_kernel_radius",
        "set_opacity_threshold",
        "publish",
    }
)

#: Explorer methods that coalesce per (method, first positional arg) —
#: per-filter parameter drags (``UpdateFilter(uuid)`` spam) and per-name
#: metadata edits (latest value wins while a text field is typed into)
COALESCE_BY_METHOD_AND_ARG = frozenset(
    {"update_filter", "set_filter_active",
     "set_metadata_field", "set_metadata_attr"}
)

#: per (method, first two args) — one pending value per
#: (filter uuid, param name) while a filter slider drags
COALESCE_BY_METHOD_AND_TWO_ARGS = frozenset({"set_filter_param"})


def coalesce_key(method: str, args: tuple, kwargs: Optional[dict] = None
                 ) -> Optional[tuple]:
    """Coalescing key for a command, or None for lossless one-shots.

    A command sent with kwargs is always a one-shot: the key is derived
    from positional args only, so two kwarg-sent commands with different
    payloads would otherwise collapse onto one key and the first would
    be silently dropped."""
    if kwargs:
        return None
    if method in COALESCE_BY_METHOD:
        return (method,)
    if method in COALESCE_BY_METHOD_AND_ARG:
        return (method, args[0] if args else None)
    if method in COALESCE_BY_METHOD_AND_TWO_ARGS:
        return (method,) + tuple(args[:2])
    return None  # open/save/ROI/apply commands are never dropped


class CommandQueue:
    """Unbounded FIFO with per-key latest-wins coalescing.

    Payloads stay in Python, keyed by a u64 sequence number that rides the
    native condvar'd FIFO; coalescing replaces a queued key's payload in
    place (same seq, same queue position), so the queue length is bounded
    by the number of *distinct* pending commands.
    """

    def __init__(self):
        self._lib = native.load()
        self._py_lock = threading.Lock()
        #: abort bookkeeping, both mutated ONLY under ``_py_lock``:
        #: ``abort_epoch`` counts drains; ``pop_epoch`` records the epoch
        #: at the instant take() committed its payload (the same critical
        #: section a concurrent drain would have removed it in). A popped
        #: command with ``pop_epoch == abort_epoch`` was provably enqueued
        #: AFTER the last abort's drain; anything less escaped a drain
        #: in flight and must still honor that abort (ExplorerWorker._run)
        self.abort_epoch = 0
        self.pop_epoch = 0
        self._seq = 0
        self._by_key: dict[Any, list] = {}  # key -> [seq, payload]
        self._seq2key: dict[int, Any] = {}
        if self._lib is not None:
            self._handle = self._lib.thz_cmd_queue_new()
        else:
            self._handle = None
            self._cv = threading.Condition(self._py_lock)
            self._fifo: deque[int] = deque()
            self._closed = False

    def put(self, command: Any, key: Optional[Any] = None):
        """Enqueue; a non-None ``key`` coalesces against a queued command
        with the same key (the newer payload wins, position kept)."""
        with self._py_lock:
            if key is not None and key in self._by_key:
                self._by_key[key][1] = command  # in-place: lossless for others
                return
            self._seq += 1
            seq = self._seq
            if key is None:
                key = ("#oneshot", seq)
            self._by_key[key] = [seq, command]
            self._seq2key[seq] = key
            if self._handle is not None:
                if not self._lib.thz_cmd_queue_push(self._handle, seq):
                    # allocation failure: the seq never entered the native
                    # FIFO — leaving the payload behind would wedge
                    # empty()/idle forever and blackhole this coalesce key
                    del self._by_key[key]
                    del self._seq2key[seq]
                    raise MemoryError("native command queue push failed")
            else:
                self._fifo.append(seq)
                self._cv.notify()

    def take(self, timeout: Optional[float] = None) -> Optional[Any]:
        """Blocking FIFO take; returns None on timeout or close."""
        if self._handle is not None:
            seq = ctypes.c_uint64()
            ms = -1 if timeout is None else int(timeout * 1000)
            res = self._lib.thz_cmd_queue_pop(self._handle, ms, ctypes.byref(seq))
            if res != 1:
                return None
            with self._py_lock:
                key = self._seq2key.pop(seq.value, None)
                if key is None:  # drained between pop and lookup
                    return None
                self.pop_epoch = self.abort_epoch
                return self._by_key.pop(key)[1]
        with self._cv:
            if not self._fifo and not self._closed:
                self._cv.wait(timeout)
            if not self._fifo:
                return None
            seq = self._fifo.popleft()
            key = self._seq2key.pop(seq, None)
            if key is None:
                return None
            self.pop_epoch = self.abort_epoch
            return self._by_key.pop(key)[1]

    def empty(self) -> bool:
        with self._py_lock:
            return not self._by_key

    def drain(self) -> int:
        """Drop every pending command (abort). The native drain runs under
        the Python lock so a concurrent ``put`` cannot land its payload
        between the two clears (it would orphan the payload and wedge
        ``empty()``/idle detection forever)."""
        with self._py_lock:
            had = len(self._by_key)
            self._by_key.clear()
            self._seq2key.clear()
            if self._handle is not None:
                self._lib.thz_cmd_queue_drain(self._handle)
            else:
                self._fifo.clear()
            self.abort_epoch += 1
            return had

    def close(self):
        if self._handle is not None:
            self._lib.thz_cmd_queue_close(self._handle)
        else:
            with self._cv:
                self._closed = True
                self._cv.notify_all()

    def release(self):
        """Free the native queue (mutex/cond/nodes). Only safe once no
        thread can still be inside take() on this handle — callers must
        close() and join the consumer first. Late put()/take() calls
        after release degrade to the closed pure-Python fallback."""
        with self._py_lock:
            if self._handle is not None:
                h = self._handle
                self._handle = None
                self._cv = threading.Condition(self._py_lock)
                self._fifo = deque()
                self._closed = True
                self._lib.thz_cmd_queue_free(h)


class ExplorerWorker:
    """Worker thread owning an Explorer; commands are (method, args)."""

    def __init__(self, explorer: Optional[Explorer] = None):
        self.explorer = explorer or Explorer()
        self.queue = CommandQueue()
        self.abort_flag = threading.Event()
        # Serializes abort() against _run's stale-flag clear. Correctness
        # hinges on the drain-vs-pop order recorded by the queue's epoch
        # counters: a command whose payload lookup committed BEFORE the
        # drain (pop_epoch < abort_epoch) was in flight when the user hit
        # abort and must stay cancelled; one that survived the drain was
        # enqueued after it, so the flag it observes is stale. Holding
        # this lock across both the (drain, flag.set) pair and the
        # (epoch compare, flag.clear) pair makes the decision atomic —
        # no interleaving can clear a fresh abort or cancel a post-abort
        # command (data_thread.rs:163-172 gets this for free from its
        # single-threaded recv loop).
        self._abort_lock = threading.Lock()
        self.explorer.pipeline.cancelled = self._cancelled
        # progressive open: the Explorer defers its device phase through
        # the queue so state polls between phases serve the preview
        self.explorer.defer = self._defer
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
        #: monotonic time of the last mutating send(); the idle
        #: housekeeping quiet period is measured from here
        self._last_send = 0.0
        self._thread.start()

    def send(self, method: str, *args, **kwargs):
        """Enqueue a command. Slider-type commands coalesce against a
        pending command of the same kind; everything else (ROI ops,
        open/save, Apply) is lossless FIFO — the reference's two-channel
        split (``config.rs:41-51`` vs ``:296-299``)."""
        with self._idle_lock:
            self._idle.clear()
            # mutations (not call() reads) restart the idle-housekeeping
            # quiet period: the debounce must track user interaction
            # cadence, and a UI polling state via call() must not starve
            # the timing refresh forever
            self._last_send = _time.monotonic()
            self.queue.put(
                (method, args, kwargs), key=coalesce_key(method, args, kwargs)
            )

    def call(self, fn: Callable[[Explorer], Any], *, timeout: float = 2.0):
        """Run ``fn(explorer)`` ON the worker thread and return its result.

        The single-writer discipline for HTTP/state readers: instead of
        touching the Explorer from a request thread (the latent race the
        round-2 review flagged — the reference is strict about this,
        ``config.rs:219-304``), readers enqueue a closure and wait. On
        timeout — e.g. a long deconvolution Apply owns the worker — raises
        ``TimeoutError``; callers fall back to their last snapshot,
        mirroring the reference GUI's ``try_read`` + skip-a-frame behavior
        (``center_panel.rs:32``)."""
        done = threading.Event()
        box: dict[str, Any] = {}

        def run(ex):
            try:
                box["result"] = fn(ex)
            except Exception as e:  # noqa: BLE001
                box["error"] = e
            finally:
                done.set()

        with self._idle_lock:
            self._idle.clear()
            self.queue.put((run, (), {}))
        if not done.wait(timeout):
            raise TimeoutError("worker busy")
        if "error" in box:
            raise box["error"]
        return box["result"]

    def _defer(self, method: str, *args):
        """Enqueue a follow-up command from INSIDE a running command
        (the Explorer's progressive open): a lossless one-shot, ordered
        after anything already queued — so state-reading ``call()``
        closures enqueued during phase 1 are served the preview before
        the device phase blocks the worker."""
        self.queue.put((method, args, {}))

    def _cancelled(self) -> bool:
        return self.abort_flag.is_set()

    def abort(self):
        """Abort in-flight work and drain pending commands
        (``data_thread.rs:163-172``). Drain first (bumping the queue's
        abort epoch inside its lock), THEN raise the flag: a command that
        escaped the drain by being popped concurrently carries a
        pre-drain pop_epoch, so _run's stale check keeps the flag set and
        the escapee is cancelled anyway."""
        with self._abort_lock:
            self.queue.drain()
            self.abort_flag.set()

    def on_update(self, callback: Callable[[Explorer], None]):
        self._on_update.append(callback)

    def join_idle(self, timeout: Optional[float] = None) -> bool:
        """Wait until the queue is empty and the worker is idle."""
        return self._idle.wait(timeout)

    def close(self):
        self._stop.set()
        self.queue.close()
        self._thread.join(timeout=5)
        if not self._thread.is_alive():
            # the consumer is provably out of take(): reclaim the native
            # queue (mutex/cond/nodes) instead of leaking it per worker
            self.queue.release()

    #: idle housekeeping quiet period: no mutating command for this long
    #: before the shadow timing refresh may run. Chosen above human
    #: click-stepping cadence (~200-500 ms between discrete slider
    #: clicks) so a user stepping a slider never pays a shadow chain
    #: pass between clicks — only after they stop.
    IDLE_QUIET_S = 0.5

    def _run(self):
        while not self._stop.is_set():
            cmd = self.queue.take(timeout=0.1)
            if cmd is not None:
                self._idle.clear()
                # Clear only a provably STALE abort: equal epochs mean no
                # drain ran after this command's payload lookup, i.e. the
                # command was enqueued after the last abort completed. An
                # abort racing this check either already bumped the epoch
                # (mismatch -> flag survives, command cancelled) or is
                # blocked on _abort_lock until the clear decision is done.
                with self._abort_lock:
                    if self.queue.pop_epoch == self.queue.abort_epoch:
                        self.abort_flag.clear()
                method, args, kwargs = cmd
                try:
                    if callable(method):  # closure from call()
                        method(self.explorer)
                    else:
                        if method not in ("_finalize_open", "open_file"):
                            # single-phase open ordering for MUTATING
                            # commands: finalize a pending progressive
                            # open BEFORE the command, or the deferred
                            # finalize's reset_filters would later revert
                            # e.g. a queued set_filter_param (the old
                            # one-phase open completed before any queued
                            # command). call() closures above stay on the
                            # preview; open_file supersedes the pending
                            # open itself. A finalize failure rolls back
                            # and consumes the pending open, so the
                            # command still runs — against the previous
                            # scan, exactly the old failure contract.
                            try:
                                ensure = getattr(
                                    self.explorer,
                                    "_ensure_open_finalized", None,
                                )
                                if ensure is not None:
                                    ensure()
                            except Exception:  # noqa: BLE001
                                import traceback

                                traceback.print_exc()
                        getattr(self.explorer, method)(*args, **kwargs)
                        for cb in self._on_update:
                            cb(self.explorer)
                except Exception:  # noqa: BLE001 — survive bad commands
                    import traceback

                    traceback.print_exc()
            if self._stop.is_set():
                continue  # close() woke the take(): exit, never start
                # device work the 5 s join could not outwait
            # Idle evaluation runs after EVERY iteration — both on the
            # take timeout and right after a processed command. Doing it
            # only on the timeout starves join_idle under a state reader
            # polling call() faster than the 0.1 s take window (the queue
            # then never looks empty long enough to reach the timeout).
            if not self._idle.is_set() and self.queue.empty():
                try:
                    on_idle = getattr(self.explorer, "on_idle", None)
                    probe = getattr(
                        self.explorer, "idle_housekeeping_pending", None
                    )
                    needs = on_idle is not None and (
                        probe() if probe is not None else True
                    )
                    if needs:
                        if (_time.monotonic() - self._last_send
                                < self.IDLE_QUIET_S):
                            # user may still be interacting: idle (and
                            # the refresh) wait for the quiet period
                            continue
                        # the burst has genuinely settled. Idle
                        # housekeeping (per-stage timing refresh) runs
                        # HERE, debounced, BEFORE idle is signalled so
                        # join_idle observers see fresh timings, and
                        # outside the idle lock — it dispatches device
                        # work and must not block send(). When nothing
                        # is pending, idle is signalled immediately —
                        # no quiet-period tax on fast commands.
                        on_idle()
                except Exception:  # noqa: BLE001
                    import traceback

                    traceback.print_exc()
            with self._idle_lock:
                if self.queue.empty():
                    self._idle.set()
