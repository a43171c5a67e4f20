"""Where does the pixel-click fast path's time go? (round-5 task 6)

The one-pixel publish-view program (`executor._build_click`) is
gather-sized — a (1, 1, T) DFT matvec plus gathers — yet the bench
measured 11.7 ms per dispatch over a 40-dispatch single-barrier window
(BENCH_FULL.json 2026-08-19, `click_device_ms`), i.e. WORSE than the
full 6 ms merged chain program. This script A/Bs the dispatch loop to
split program time from operand-transfer and host-tracing overhead:

  A `fresh_numpy`  — new host numpy operands every call (what
                      `_click_dispatch` and the bench do today)
  B `preput_rotate` — the small per-click operands pre-`device_put`,
                      rotated among 8 pre-staged pixel choices
  C `same_args`    — identical pre-put operands every call (pure
                      program + dispatch cost, maximum pipelining)

Each variant: 40 dispatches, ONE barrier (CLAUDE.md timing discipline).

Measured 2026-08-19 on the tunnelled v5e (this script, two runs):
  fresh_numpy       8.69-8.96 ms/dispatch
  preput_rotate     2.63-2.82 ms/dispatch
  same_args         2.40-2.60 ms/dispatch
  noop_dispatch     1.29 ms/dispatch   (trivial program, same loop)
  vmap64_per_click  0.171 ms           (floor amortized in-program)
so ~6 ms/dispatch was per-call `device_put` of the 10 small host
operands, ~1.3 ms is this tunnel's per-dispatch enqueue floor (a
trivial program pays it too; it varies with tunnel load — 2.6-10.7 ms
observed for the same pre-put loop across bench runs), and the click
program's own device work is ~0.17-0.31 ms. Fixes: `_click_dispatch`
pre-stages the 7 view-constant operands (only the 3 pixel-index arrays
transfer per click), and `bench.py` reports `click_device_ms` from the
vmap window, `click_dispatch_ms` from the pre-put single-click loop,
and `click_wall_p50_ms` end-to-end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)
sys.path.insert(0, os.path.join(here, "tests"))

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    import bench
    from thz_image_explorer_tpu.pipeline import Explorer

    t, data = bench._make_data()
    d = tempfile.mkdtemp()
    path = os.path.join(d, "bench.thzimg")
    try:
        bench._write_bench_scan(path, t, data)
        ex = Explorer()
        ex.open_file(path)
        for uuid in ("time_band_pass_before_fft", "frequency_band_pass",
                     "water_vapor_notch", "time_band_pass_after_fft"):
            ex.pipeline.filters[uuid].active = True
        ex.update_filters()
        ex.set_fft_window_low(1.0)
        p = ex.pipeline
        p._timer.drain()
        p.record_timings = False

        plan = p._lean_plan
        clk = plan.get("click") if plan else None
        if clk is None or p._pub_out is None:
            print(json.dumps({"error": "no click program in the plan"}))
            return 1
        ex.publish()
        pub, _ = p.pub_provider(plan["spec"])
        small = {
            k: pub[k]
            for k in ("rxy", "fxy", "gxy", "ref_mode", "samp_mode",
                      "ref_idx", "samp_idx", "ref_pseudo", "samp_pseudo",
                      "thickness")
        }
        final = p.slots[plan["end"] - 1]
        inp = plan["inp"]
        wl, wh = plan["window"]
        out0 = p._pub_out
        w_grid = final.data.shape[0]
        _sum = jax.jit(jnp.sum)

        def barrier(upd):
            float(_sum(upd["filtered_signal"]))

        def run(call, n=40):
            call(0)  # compile / warm
            t0 = time.perf_counter()
            last = None
            for i in range(1, n + 1):
                last = call(i)
            barrier(last)
            return round((time.perf_counter() - t0) / n * 1e3, 3)

        big = (p.slots[0].data, inp.data, inp.time, inp.valid_wh,
               final.data, final.freq)

        # A: fresh numpy small operands per call (the production pattern)
        def call_numpy(i):
            sm = dict(small)
            xy = np.asarray([i % w_grid, (i * 7) % w_grid], np.int32)
            sm["rxy"] = sm["fxy"] = sm["gxy"] = xy
            return clk(*big, wl, wh, plan["stage_params"], sm,
                       out0["roi_amp"], out0["roi_ph"])

        # B: pre-put small operands, rotating pixels
        sm_dev = []
        for j in range(8):
            sm = dict(small)
            xy = np.asarray([j % w_grid, (j * 7) % w_grid], np.int32)
            sm["rxy"] = sm["fxy"] = sm["gxy"] = xy
            sm_dev.append(jax.device_put(sm))
        jax.block_until_ready([s["rxy"] for s in sm_dev])

        def call_preput(i):
            return clk(*big, wl, wh, plan["stage_params"], sm_dev[i % 8],
                       out0["roi_amp"], out0["roi_ph"])

        # C: identical pre-put operands every call
        def call_same(i):
            return clk(*big, wl, wh, plan["stage_params"], sm_dev[0],
                       out0["roi_amp"], out0["roi_ph"])

        # D: dispatch-floor control — a trivial program dispatched the
        # same way; per-dispatch wall minus this is the click program's
        # marginal device cost on this runtime
        tiny = jax.device_put(np.zeros((8, 128), np.float32))
        noop = jax.jit(lambda x: x + 1.0)

        def call_noop(i):
            return noop(tiny)

        def run_noop(n=40):
            call_noop(0)
            t0 = time.perf_counter()
            last = None
            for i in range(n):
                last = call_noop(i)
            jax.block_until_ready(last)
            return round((time.perf_counter() - t0) / n * 1e3, 3)

        # E: device time per click with the dispatch floor amortized
        # INSIDE the program: vmap the click over 64 pixel choices and
        # divide the per-dispatch time by 64
        V = 64
        xys = jax.device_put(np.stack([
            np.asarray([j % w_grid, (j * 7) % w_grid], np.int32)
            for j in range(V)
        ]))
        sm_axes = {k: (0 if k in ("rxy", "fxy", "gxy") else None)
                   for k in small}
        vclk = jax.jit(jax.vmap(
            clk,
            in_axes=(None,) * 6 + (None, None, None, sm_axes, None, None),
        ))
        sm_v = dict(sm_dev[0])
        sm_v["rxy"] = sm_v["fxy"] = sm_v["gxy"] = xys

        def call_vmap(i):
            return vclk(*big, wl, wh, plan["stage_params"], sm_v,
                        out0["roi_amp"], out0["roi_ph"])

        result = {
            "fresh_numpy_ms": run(call_numpy),
            "preput_rotate_ms": run(call_preput),
            "same_args_ms": run(call_same),
            "noop_dispatch_ms": run_noop(),
            "vmap64_per_dispatch_ms": run(call_vmap),
            "vmap64_per_click_ms": None,  # filled below
            "n_dispatches": 40,
            "shape": f"{bench.WIDTH}x{bench.HEIGHT}x{bench.NTIME}",
        }
        result["vmap64_per_click_ms"] = round(
            result["vmap64_per_dispatch_ms"] / V, 4
        )
        print(json.dumps(result))
        return 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
