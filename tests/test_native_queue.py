"""Native command-primitive timing/race regressions (native/thznative.c).

The condvar'd slot and FIFO back the worker's two-lane command routing
(pipeline/worker.py); these tests pin the timed-wait contract at the
ctypes seam: a timeout is a DEADLINE (not restarted by wakeups), and an
expiry that races a producer still delivers the pending command.
"""

import ctypes
import threading
import time

import pytest

from thz_image_explorer_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no C compiler in this environment")
    return lib


def test_slot_take_roundtrip_and_close(lib):
    s = lib.thz_cmd_slot_new()
    try:
        seq = ctypes.c_uint64(0)
        lib.thz_cmd_slot_put(s, 7)
        lib.thz_cmd_slot_put(s, 9)  # drop-oldest
        assert lib.thz_cmd_slot_take(s, 0, ctypes.byref(seq)) == 1
        assert seq.value == 9
        assert lib.thz_cmd_slot_take(s, 0, ctypes.byref(seq)) == 0
        # closed with a pending command: the command still drains first
        lib.thz_cmd_slot_put(s, 11)
        lib.thz_cmd_slot_close(s)
        assert lib.thz_cmd_slot_take(s, 0, ctypes.byref(seq)) == 1
        assert seq.value == 11
        assert lib.thz_cmd_slot_take(s, 0, ctypes.byref(seq)) == -1
    finally:
        lib.thz_cmd_slot_free(s)


def test_queue_pop_timeout_is_a_deadline_not_restarted_by_wakeups(lib):
    """A pop(timeout=300ms) under a condvar wakeup storm (push+drain
    leaves the queue empty at every wake) must return ~at the deadline.
    The pre-fix code recomputed the deadline from 'now' on every wakeup,
    so the storm kept the pop blocked until the storm ended."""
    q = lib.thz_cmd_queue_new()
    stop = threading.Event()

    def storm():
        while not stop.is_set():
            lib.thz_cmd_queue_push(q, 1)
            lib.thz_cmd_queue_drain(q)
            time.sleep(0.05)

    th = threading.Thread(target=storm, daemon=True)
    th.start()
    try:
        seq = ctypes.c_uint64(0)
        t0 = time.monotonic()
        rc = lib.thz_cmd_queue_pop(q, 300, ctypes.byref(seq))
        dt = time.monotonic() - t0
        # rc may be 1 if a push landed between storm iterations; the
        # invariant under test is the DEADLINE, not the outcome
        assert dt < 2.0, f"pop blocked {dt:.2f}s past its 0.3s deadline"
        assert rc in (0, 1)
    finally:
        stop.set()
        th.join(timeout=5)
        lib.thz_cmd_queue_close(q)
        lib.thz_cmd_queue_free(q)


def test_slot_take_timeout_is_a_deadline(lib):
    """Same deadline contract for the bounded(1) slot (put+drain storm)."""
    s = lib.thz_cmd_slot_new()
    stop = threading.Event()

    def storm():
        while not stop.is_set():
            lib.thz_cmd_slot_put(s, 1)
            lib.thz_cmd_slot_drain(s)
            time.sleep(0.05)

    th = threading.Thread(target=storm, daemon=True)
    th.start()
    try:
        seq = ctypes.c_uint64(0)
        t0 = time.monotonic()
        rc = lib.thz_cmd_slot_take(s, 300, ctypes.byref(seq))
        dt = time.monotonic() - t0
        assert dt < 2.0, f"take blocked {dt:.2f}s past its 0.3s deadline"
        assert rc in (0, 1)
    finally:
        stop.set()
        th.join(timeout=5)
        lib.thz_cmd_slot_close(s)
        lib.thz_cmd_slot_free(s)


def test_queue_lossless_under_timed_pops(lib):
    """Every pushed seq comes out exactly once through 1 ms timed pops
    racing the producer (the lossless one-shot lane contract)."""
    q = lib.thz_cmd_queue_new()
    got = []

    def producer():
        for i in range(200):
            lib.thz_cmd_queue_push(q, i)
            if i % 7 == 0:
                time.sleep(0.001)
        lib.thz_cmd_queue_close(q)

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    seq = ctypes.c_uint64(0)
    while True:
        rc = lib.thz_cmd_queue_pop(q, 1, ctypes.byref(seq))
        if rc == 1:
            got.append(seq.value)
        elif rc == -1:
            break
    th.join(timeout=5)
    lib.thz_cmd_queue_free(q)
    assert got == list(range(200))
