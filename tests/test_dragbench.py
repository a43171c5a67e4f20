"""Sustained slider-drag throughput at the product seam (round-5 task 8).

A real ThreadingHTTPServer + worker, a replayed drag through the HTTP
API with the per-key coalescing queue live, and a concurrent state
poller — the latest-wins contract (``config.rs:41-51``) under actual
load: every event's value is eventually visible or superseded, the
final value is lossless, latency stays bounded (no queue blowup), and
coalescing keeps executed chain updates below the offered event rate.
"""

import json
import threading

import numpy as np

from make_sample import synthetic_scan, write_scan_thz


def test_drag_replay_coalesces_and_settles(tmp_path):
    from http.server import ThreadingHTTPServer

    from thz_image_explorer_tpu.utils.dragbench import replay_drag
    from thz_image_explorer_tpu.web import WebApp, make_handler

    t, cube = synthetic_scan(width=24, height=20, n_time=128)
    path = tmp_path / "scan.thzimg"
    write_scan_thz(str(path), t, cube, dx=1.0, dy=1.0)

    app = WebApp()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        app.worker.send("open_file", str(path))
        app.worker.join_idle()
        # warmup: compile the from-fft program once so the drag measures
        # steady-state dispatch, not the first compile
        app.command("set_fft_window_low", [0.99], {})
        app.worker.join_idle()

        n = 30
        res = replay_drag(
            port, n_events=n, lo=1.0, hi=1.3, interval_s=0.005, app=app,
        )
        assert res["drag_events"] == n
        # every event satisfied (observed or superseded) within the run
        assert res["drag_unsatisfied_events"] == 0
        assert res["drag_p50_ms"] is not None
        assert res["drag_p50_ms"] <= res["drag_p99_ms"]
        # bounded latency: one in-flight + one pending + a state build,
        # NOT n_events * update cost — the no-queue-blowup contract.
        # CPU chain updates here run ~100-300 ms; 20 of them would be
        # >= 4000 ms, the coalesced bound stays far under it
        assert res["drag_p99_ms"] < 4000
        # coalescing executed fewer chain updates than offered events,
        # but the pipeline did make progress
        assert 1 <= res["drag_chain_updates"] < n
        assert res["drag_updates_per_s"] > 0
        # lossless final value: the LAST event's exact value landed
        app.worker.join_idle()
        s = app.state()
        assert abs(s["config"]["fft_window"][0] - 1.3) < 1e-6
    finally:
        server.shutdown()
        app.worker.close()
