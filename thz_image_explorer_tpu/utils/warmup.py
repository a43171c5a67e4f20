"""Transfer-path warmup: pay the backend's first-d2h stall off-path.

The first device→host transfer of a fresh process is where remote/tunneled
TPU backends finish bringing up their data plane, and on the axon tunnel
that init is **bimodal**: 0.2–2.3 s normally, but sporadically 249–476 s
when the tunnel-side service has gone cold (measured across fresh
processes, ``scripts/probe_tunnel.py``, 2026-08-19; h2d and the control
plane never stall). That stall was the entire "warm-open nondeterminism"
of rounds 3–4: the first open's publish performs the process's first d2h,
so a 7 s warm open and a 54 s warm open were the SAME repo work behind
different tunnel moods.

The fix is to issue one tiny h2d+d2h as early as possible — at Explorer
construction, on a background thread — so the init overlaps scan reading,
host-preview publishing and XLA compiles instead of serializing in front
of the first result. ``bench.py`` calls it blocking and reports the
measured stall per run (``tunnel_first_d2h_s``) so the artifact shows
where the variance lives.

The reference app has no analogue: it is CPU-local (``io.rs:496-631``
paints directly from process memory). This cost is 100 % environment.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

_lock = threading.Lock()
_started = False
_done = threading.Event()
_secs: Optional[float] = None


def _work() -> None:
    global _secs
    t0 = time.perf_counter()
    try:
        import jax
        import numpy as np

        x = jax.device_put(np.zeros(8, np.float32))
        np.asarray(x)  # first d2h of the process: the init we're paying
    except Exception:  # warmup is an optimization, never a failure
        pass
    _secs = time.perf_counter() - t0
    _done.set()


def warm_transfer_paths(block: bool = False) -> Optional[float]:
    """Start (once per process) the tiny h2d+d2h warmup.

    ``block=True`` waits for it and returns the measured seconds — the
    backend's first-d2h init cost, 0.2–476 s bimodal on the axon tunnel
    (see module docstring). Non-blocking callers get ``None`` back
    immediately; the warmup thread is a daemon so it never holds up
    interpreter exit.
    """
    global _started
    with _lock:
        if not _started:
            _started = True
            threading.Thread(
                target=_work, daemon=True, name="thz-d2h-warmup"
            ).start()
    if block:
        _done.wait()
        return _secs
    return None
