#!/usr/bin/env python
"""PSF-tool device-seam measurements backing the perf claims in
``ops/firapply.py`` (round-4 advisor: numbers must name their script).

What it measures, per call, on the attached TPU (warm, one completion
barrier per timing — the ~30 ms tunnel RTT is part of every wall number):

* ``fused_ms``       — the production seam ``fir_correlate_bands_device``:
                       windowing + banded matmul + knife-edge intensity
                       as ONE program, (B, P) intensities fetched, the
                       (B, P, T) filtered cube left on device.
* ``full_d2h_ms``    — ``fir_correlate_bands``: same filtering but the
                       full (B, P, T) float cube shipped to the host
                       (the pre-round-4 behavior; the link runs ~28 MB/s).
* ``eager_steps``    — ``window_input``'s pad/slice/stack executed
                       EAGERLY (no jit), as a naive port would: on the
                       axon backend eager ops raise — recorded as the
                       error string; on backends where eager works this
                       is half a dozen dispatches instead of one.
* ``gblks_rebuild_ms`` / ``gblks_cached_ms`` — building + uploading the
                       block tap-bank constant vs the LRU hit
                       (``_g_blks_device``); the bank is identical across
                       the tool's left/right x x/y calls.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_psf.py
Prints one JSON line; recorded numbers are cited in ops/firapply.py
docstrings.
"""

import glob
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, n=5):
    fn()  # warm/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)) * 1e3, 1)


def main():
    import jax
    import jax.numpy as jnp

    from thz_image_explorer_tpu.ops import firapply
    from thz_image_explorer_tpu.ops.firdesign import create_filter_bank
    from thz_image_explorer_tpu.psf_tool.app import FilterParams
    from thz_image_explorer_tpu.psf_tool.data_loader import (
        KnifeEdgeMeasurement,
    )

    base = "/root/reference/sample_data/example_beam_width"
    fx = sorted(glob.glob(f"{base}/measurement_x/data/*.thz"))
    mx = KnifeEdgeMeasurement.from_thz_file(fx[0])
    fp = FilterParams()  # reference defaults: 20 bands, 0.15-5 THz
    taps, _ = create_filter_bank(
        fp.n_filters, fp.start_freq, fp.end_freq, fp.win_width, mx.times,
        low_cut=fp.low_cut, high_cut=fp.high_cut,
        spacing=fp.frequency_spacing,
    )
    traces = np.asarray(mx.time_traces, np.float32)
    p, t = traces.shape
    b, l = taps.shape
    out = {"workload": f"{p}x{t} traces x {b} bands x {l} taps"}

    def note(k, v):
        # incremental progress lines: remote compiles can take minutes
        # each under service load, so partial data must survive a kill
        out[k] = v
        print(f"# {k} = {v}", file=sys.stderr, flush=True)

    def fused():
        filt, inten = firapply.fir_correlate_bands_device(traces, taps)
        jax.block_until_ready(filt)
        return inten

    note("fused_ms", timed(fused))

    note("full_d2h_ms", timed(
        lambda: firapply.fir_correlate_bands(traces, taps)
    ))

    # the naive eager decomposition of window_input (pad/slice/stack,
    # no jit) — half a dozen separate dispatches, or a hard error on
    # backends without eager support (axon)
    mid = l // 2
    shift = l - 1 - mid
    block = firapply.FIR_BLOCK

    def eager_steps():
        flat = jnp.asarray(traces)
        padded = jnp.pad(flat, ((0, 0), (shift, l - 1 - shift)))
        n_blocks = -(-t // block)
        total = n_blocks * block + l - 1
        padded = jnp.pad(padded, ((0, 0), (0, total - padded.shape[1])))
        cols = [
            padded[:, i * block: i * block + block + l - 1]
            for i in range(n_blocks)
        ]
        stacked = jnp.stack(cols, axis=1)
        jax.block_until_ready(stacked)
        return stacked

    try:
        note("eager_steps_ms", timed(eager_steps))
    except Exception as e:  # noqa: BLE001 — the failure IS the datum
        note("eager_steps",
             f"unsupported: {type(e).__name__}: {str(e)[:120]}")

    flipped = np.ascontiguousarray(np.asarray(taps, np.float64)[:, ::-1])

    def rebuild():
        firapply._G_CACHE.clear()
        g = firapply._g_blks_device(flipped, block)
        jax.block_until_ready(g)

    note("gblks_rebuild_ms", timed(rebuild, n=3))

    firapply._g_blks_device(flipped, block)  # prime

    def cached():
        g = firapply._g_blks_device(flipped, block)
        jax.block_until_ready(g)

    note("gblks_cached_ms", timed(cached))
    gb = firapply._g_blks_device(flipped, block)
    out["gblks_mb"] = round(gb.size * gb.dtype.itemsize / 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
