"""First-open persistent-cache forensics (VERDICT r4 task 2).

One process = one open: builds (or reuses) a synthetic scan, opens it in
the Explorer with ``THZ_XLA_CACHE`` pointed at ``--cache``, and prints a
JSON line with the wall time plus a per-program table of persistent-cache
HITs and compile events captured from jax's own loggers
(``jax._src.compiler`` emits "Persistent compilation cache hit/miss";
``jax_log_compiles`` emits "Finished XLA compilation of <name> in <s>").

Usage (the driver-realistic loop is cold + N warm fresh processes):

    python scripts/diag_firstopen.py --cache /tmp/c --scan /tmp/s.thzimg \
        --shape 150x130x768

The warm-open nondeterminism this diagnosed (2026-08-19): see README
"first open" section and bench.py:bench_firstopen.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import re
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True)
    ap.add_argument("--scan", required=True)
    ap.add_argument("--shape", default="150x130x768")
    ap.add_argument("--slider", action="store_true",
                    help="also time one fft-window slider update")
    ap.add_argument("--timeline", action="store_true",
                    help="print every captured compile/cache event with "
                    "its offset — the GAPS between events localize stalls "
                    "the per-program compile times don't account for "
                    "(e.g. a remote compile-service queue)")
    args = ap.parse_args()

    os.environ["THZ_XLA_CACHE"] = args.cache
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.join(here, "tests"))

    w, h, nt = (int(v) for v in args.shape.split("x"))
    if not os.path.exists(args.scan):
        import numpy as np  # noqa: F401

        from make_sample import synthetic_scan, write_scan_thz

        t, cube = synthetic_scan(width=w, height=h, n_time=nt)
        write_scan_thz(args.scan, t, cube, dx=0.5, dy=0.5)

    # capture jax's compile/cache log stream with timestamps
    events: list[tuple[float, str]] = []
    t_ref = time.perf_counter()

    class _H(logging.Handler):
        def emit(self, r: logging.LogRecord) -> None:
            events.append((time.perf_counter(), r.getMessage()))

    def mark(label: str) -> None:
        """Synthetic phase-boundary event for the --timeline view."""
        events.append((time.perf_counter(), f"PHASE {label}"))

    handler = _H()
    for name in ("jax._src.compiler", "jax._src.compilation_cache"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        lg.addHandler(handler)

    t0 = time.perf_counter()
    import jax

    jax.config.update("jax_log_compiles", True)
    lg = logging.getLogger("jax._src.dispatch")
    lg.setLevel(logging.DEBUG)
    lg.addHandler(handler)

    from thz_image_explorer_tpu.pipeline import Explorer

    import_s = time.perf_counter() - t0

    # Pay + time the backend's first-d2h init separately (0.2-476 s
    # bimodal on the axon tunnel, scripts/probe_tunnel.py) so the open
    # phases below measure repo work, not the environment's data-plane
    # cold start.
    from thz_image_explorer_tpu.utils.warmup import warm_transfer_paths

    tunnel_s = warm_transfer_paths(block=True)
    mark("tunnel warm done")

    # phase-level split of open_file (explorer.py:186-202): scan load +
    # device put + first image, pipeline set_input, first publish
    phases = {}
    t0 = time.perf_counter()
    ex = Explorer()
    phases["explorer_init_s"] = round(time.perf_counter() - t0, 2)
    mark("explorer_init done")
    t0 = time.perf_counter()
    from thz_image_explorer_tpu import io as thzio

    cube, img, metadata = thzio.open_scan(args.scan)
    phases["open_scan_s"] = round(time.perf_counter() - t0, 2)
    mark("open_scan done")
    t0 = time.perf_counter()
    ex.metadata = metadata
    ex.file_path = args.scan
    ex.image = img
    ex.rois = {}
    ex._datasets = {}
    ex.pixel_selected = [0, 0]
    valid_wh = (img.shape[0], img.shape[1])
    from thz_image_explorer_tpu.pipeline.explorer import HouseKeeping

    ex.housekeeping = HouseKeeping.from_cube(cube, valid_wh)
    ex.housekeeping.apply_metadata(metadata.md)
    ex.pipeline.set_input(cube, valid_wh=valid_wh)
    phases["set_input_s"] = round(time.perf_counter() - t0, 2)
    mark("set_input done")
    t0 = time.perf_counter()
    ex.publish()
    phases["publish_s"] = round(time.perf_counter() - t0, 2)
    mark("publish done")
    open_s = sum(v for k, v in phases.items() if k != "explorer_init_s")

    slider_s = None
    if args.slider:
        t0 = time.perf_counter()
        ex.set_fft_window_low(1.1)
        slider_s = time.perf_counter() - t0

    hits, misses, compiles = [], [], []
    for ts, msg in events:
        m = re.search(r"cache hit for '([^']+)'", msg)
        if m:
            hits.append(m.group(1))
            continue
        m = re.search(r"CACHE MISS for '([^']+)'", msg)
        if m:
            misses.append(m.group(1))
            continue
        m = re.search(
            r"Finished XLA compilation of (\S+) in ([0-9.]+) sec", msg
        )
        if m:
            compiles.append({"name": m.group(1)[:60],
                             "secs": round(float(m.group(2)), 2)})
    out = {
        "import_s": round(import_s, 2),
        "tunnel_s": None if tunnel_s is None else round(tunnel_s, 2),
        "open_s": round(open_s, 2),
        "phases": phases,
        "slider_s": None if slider_s is None else round(slider_s, 3),
        "n_hits": len(hits),
        "n_misses": len(misses),
        "hits": hits,
        "misses": misses,
        "compiles": compiles,
    }
    if args.timeline:
        out["timeline"] = [
            [round(ts - t_ref, 2), msg.splitlines()[0][:90]]
            for ts, msg in events
        ]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
