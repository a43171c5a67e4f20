#!/usr/bin/env python
"""Benchmark: full-image interactive update latency on a 200x200x1024 cube.

Measures the fused interactive chain (window + FFT + FD band-pass +
water-vapor notch + iFFT + TD band-passes + intensity image) — the
operation behind every slider interaction in the reference app — and
compares against a multithreaded CPU (torch) implementation of the same
chain as the stand-in for the reference's rayon/all-cores Rust pipeline
(the reference publishes no numbers of its own — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The banked Richardson-Lucy deconvolution is timed BY DEFAULT (reported
in "extra"); ``--no-deconv`` skips only that. ``THZ_BENCH_FIRSTOPEN=0``
skips the minutes-long cold-open measurement.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

WIDTH, HEIGHT, NTIME = 200, 200, 1024
DT = 0.05  # ps
RUNS = 10
# pipelined windows amortize ONE completion-barrier round-trip (~27 ms
# tunnel RTT) across the window; at 10 runs that inflates per-update
# device time by ~2.7 ms, at 80 by ~0.35 ms (scripts/micro_matmul.py
# calibration) — use the longer window wherever device time is the claim
PIPE_RUNS = 80


def _make_data():
    rng = np.random.default_rng(0)
    t = (np.arange(NTIME) * DT).astype(np.float32)
    pulse = np.exp(-((t - 8.0) ** 2) / 0.6) * np.sin(2 * np.pi * 1.0 * (t - 8.0))
    data = (
        pulse[None, None, :] * rng.uniform(0.3, 1.0, (WIDTH, HEIGHT, 1))
        + 0.01 * rng.normal(size=(WIDTH, HEIGHT, NTIME))
    ).astype(np.float32)
    return t, data


def bench_tpu(t, data):
    import jax
    import jax.numpy as jnp

    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig,
        StepParams,
        lean_update,
    )

    print("bench: h2d...", file=sys.stderr, flush=True)
    cube = make_cube(jnp.asarray(t), jnp.asarray(data), dx=0.5, dy=0.5)
    params = StepParams.defaults()
    cfg = StepConfig(
        fd_active=True,
        notch_active=True,
        td_before_active=True,
        td_after_active=True,
        avg_in_fourier_space=False,
    )
    # the product-shaped update: chain + publish reductions in one
    # program (round-4 leaf-level sparse materialization); 4 zero ROI
    # masks = the provider's bucketed minimum
    masks = jnp.zeros((4, WIDTH, HEIGHT), jnp.float32)
    pix = jnp.asarray([17, 23], jnp.int32)
    _sum = jax.jit(jnp.sum)

    def run_once(p):
        out = lean_update(cube, p, cfg, masks, pix)
        # On remote-tunnelled devices block_until_ready can return at
        # enqueue time; a scalar device->host read is the only reliable
        # completion barrier. (Jitted sum: an eager sum on axon pays a
        # remote per-primitive compile, ~370 ms+ cold.)
        return float(_sum(out["img"])), out

    # warmup / compile
    print("bench: compile+warmup...", file=sys.stderr, flush=True)
    run_once(params)
    print("bench: timing...", file=sys.stderr, flush=True)

    import dataclasses

    times = []
    for i in range(RUNS):
        # nudge a traced param each run like a slider drag (no recompile)
        params = dataclasses.replace(params, fd_low=np.float32(0.2 + 0.001 * i))
        t0 = time.perf_counter()
        run_once(params)
        times.append(time.perf_counter() - t0)
    p50_single = float(np.median(times))

    # pipelined throughput: dispatch updates back-to-back, one barrier
    # at the end — measures device execution without the per-update
    # host<->device round-trip (which over a tunnelled device dominates);
    # best-of-3 long windows so the barrier RTT amortizes to <0.4 ms
    pipelined = None
    for w in range(3):
        t0 = time.perf_counter()
        out = None
        for i in range(PIPE_RUNS):
            params = dataclasses.replace(
                params, fd_low=np.float32(0.3 + 0.0005 * (w * PIPE_RUNS + i))
            )
            out = lean_update(cube, params, cfg, masks, pix)
        float(_sum(out["img"]))
        dt = (time.perf_counter() - t0) / PIPE_RUNS
        pipelined = dt if pipelined is None else min(pipelined, dt)

    # roofline: XLA's own FLOP + bytes-accessed count of the compiled
    # chain (the AOT lower/compile hits the persistent cache the jit
    # path just wrote)
    chain_flops = chain_bytes = None
    try:
        from thz_image_explorer_tpu.parallel.step import lean_update_lowered

        ca = lean_update_lowered(
            cube, params, cfg, masks, pix
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        chain_flops = float(ca["flops"])
        chain_bytes = float(ca.get("bytes accessed", 0)) or None
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass
    return p50_single, pipelined, cube, chain_flops, chain_bytes


def bench_hbm_stream():
    """Measured ACHIEVABLE streaming bandwidth, overhead-corrected.

    The nominal v5e HBM figure (819 GB/s) is not reachable by real fused
    programs on this runtime: a pure a*c+b stream measures 614 GB/s
    asymptotically with ~0.49 ms fixed per-dispatch overhead
    (size-slope fit over 88 MB..1.4 GB of traffic, 2026-08-17, this
    script + scripts/micro_matmul.py). The roofline fraction against
    THIS number is the honest "how much is left" metric — against it
    the fused chain sits at ~80%, i.e. the remaining gap to the nominal
    roofline is runtime/DMA efficiency, not program fat."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    _sum = jax.jit(lambda y: jnp.sum(jnp.ravel(y)[:128]))
    stream = jax.jit(lambda a: a * 1.0000001 + 1.0)

    def t_of(mb, n=40):
        x = jnp.asarray(
            rng.normal(size=(mb * 1024 * 1024 // 4,)).astype(np.float32)
        )
        r = stream(x)
        float(_sum(r))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                r = stream(x)
            float(_sum(r))
            dt = (time.perf_counter() - t0) / n
            best = dt if best is None else min(best, dt)
        return best

    t_small, t_big = t_of(177), t_of(708)
    bw = 2 * (708 - 177) * 1024 * 1024 / (t_big - t_small) / 1e9
    overhead_ms = (t_small - 2 * 177 * 1024 * 1024 / (bw * 1e9)) * 1e3
    return {
        "hbm_bw_measured_gbps": round(bw, 0),
        "dispatch_overhead_ms": round(overhead_ms, 3),
        "note": "two-point size-slope of a fused a*c+b stream "
                "(354 MB vs 1416 MB of traffic), cancelling the fixed "
                "per-dispatch cost; nominal v5e is 819 GB/s",
    }


def bench_cpu_torch(t, data):
    """Same chain in torch on CPU (multithreaded — the stand-in for the
    reference's rayon all-cores execution)."""
    import torch

    from thz_image_explorer_tpu.assets.water_lines import WATER_LINES_THZ

    import os as _os

    # all physical cores, explicitly — the rayon stand-in must never
    # silently under-use the host and inflate vs_baseline
    torch.set_num_threads(_os.cpu_count() or 1)
    data_t = torch.from_numpy(data.copy())
    t_t = torch.from_numpy(t)

    def chain():
        # adapted-Blackman window [1, 7] ps
        lower, upper = 1.0, 7.0
        t0, t_end = t_t[0], t_t[-1]
        head = t_t <= lower + t0
        tail = t_t >= t_end - upper
        bw = lambda n, m: torch.clamp(
            0.42
            - 0.5 * torch.cos(2 * np.pi * n / m)
            + 0.08 * torch.cos(4 * np.pi * n / m),
            0.0,
            1.0,
        )
        w = torch.where(
            head,
            bw(t_t - t0, 2 * lower),
            torch.where(tail, bw(t_t - (t_end - 2 * upper), 2 * upper), torch.ones(())),
        )
        x = data_t * w
        spec = torch.fft.rfft(x, dim=-1)
        amp = spec.abs()
        phase = torch.angle(spec)
        d = phase[..., 1:] - phase[..., :-1]
        d_adj = d - 2 * np.pi * (d > np.pi) + 2 * np.pi * (d < -np.pi)
        phase = torch.cat(
            [phase[..., :1], phase[..., :1] + torch.cumsum(d_adj, dim=-1)], dim=-1
        )
        freq = torch.arange(spec.shape[-1]) / (t_t[-1] - t_t[0])
        # FD band-pass mask 0.2..5.0
        mask = ((freq >= 0.2) & (freq <= 5.0)).to(spec.dtype)
        spec = spec * mask
        amp = amp * mask.real
        # water notch comb
        lines = torch.tensor(WATER_LINES_THZ)
        width = 0.05
        inn = (freq[None, :] - lines[:, None]).abs() <= width
        bump = 0.42 - 0.5 * torch.cos(
            2 * np.pi * (freq[None, :] - (lines[:, None] - width)) / (2 * width)
        ) + 0.08 * torch.cos(
            4 * np.pi * (freq[None, :] - (lines[:, None] - width)) / (2 * width)
        )
        notch = torch.where(inn, 1.0 - bump.clamp(0, 1), torch.ones(()))
        nw = notch.prod(dim=0)
        spec = spec * nw
        amp = amp * nw
        # means + inverse + intensity
        avg_fft = spec.mean(dim=(0, 1))
        avg_amp = amp.mean(dim=(0, 1))
        avg_phase = phase.mean(dim=(0, 1))
        y = torch.fft.irfft(spec, n=NTIME, dim=-1)
        img = (y * y).sum(dim=-1)
        return img, avg_fft, avg_amp, avg_phase

    print("bench: torch cpu...", file=sys.stderr, flush=True)
    chain()  # warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        chain()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_large():
    """Scaling data point: pipelined update throughput on the largest
    comfortable single-chip cube (the 1000x1000x4096 ceiling config is a
    multi-chip mesh workload — see tests/test_parallel.py and
    __graft_entry__.dryrun_multichip for the sharded path)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig,
        StepParams,
        interactive_update,
    )

    W, H, T = 512, 512, 1024
    rng = np.random.default_rng(1)
    t = (np.arange(T) * DT).astype(np.float32)
    data = rng.normal(size=(W, H, T)).astype(np.float32)
    cube = make_cube(jnp.asarray(t), jnp.asarray(data), dx=0.5, dy=0.5)
    params = StepParams.defaults()
    cfg = StepConfig(
        fd_active=True, notch_active=True,
        td_before_active=True, td_after_active=True,
    )
    _sum = jax.jit(jnp.sum)
    out = interactive_update(cube, params, cfg)
    float(_sum(out[1]))
    t0 = time.perf_counter()
    n = 4
    for i in range(n):
        params = dataclasses.replace(params, fd_low=np.float32(0.2 + 0.001 * i))
        out = interactive_update(cube, params, cfg)
    float(_sum(out[1]))
    per = (time.perf_counter() - t0) / n
    return {
        "cube": f"{W}x{H}x{T}",
        "update_ms": round(per * 1e3, 1),
        "traces_per_sec": round(W * H / per, 1),
    }


def bench_ceiling():
    """BASELINE config 5 (1000x1000x4096 sharded): XLA's per-chip memory
    analysis of the mesh-sharded program, via scripts/scale_ceiling.py in
    a subprocess on the virtual 8-device CPU mesh (multi-chip hardware is
    not attached here; the executed sharded proof lives in that script
    and tests/test_parallel.py)."""
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + ":" + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(here, "scripts", "scale_ceiling.py"),
         "--skip-exec"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    if r.returncode != 0 or not r.stdout.strip():
        raise RuntimeError(
            f"scale_ceiling rc={r.returncode}: {r.stderr.strip()[-200:]}"
        )
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


def bench_mesh_exec():
    """Executed sharded update on the virtual 8-device CPU mesh with the
    measured-vs-predicted memory comparison (scripts/scale_ceiling.py
    run_exec). The bench runs a 512x512x512 live; the full-scale
    1000x1000x512 + sharded deconvolution run (tens of minutes on this
    1-core host) is recorded once in SCALE_EXEC.json with its
    reproduction command and embedded below."""
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + ":" + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(here, "scripts", "scale_ceiling.py"),
         "--skip-aot", "--exec-shape", "512,512,512"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    out = {}
    if r.returncode == 0 and r.stdout.strip():
        out["live_512"] = json.loads(r.stdout.strip().splitlines()[-1]).get(
            "executed"
        )
    else:
        out["live_512_error"] = r.stderr.strip()[-200:]
    rec = os.path.join(here, "SCALE_EXEC.json")
    if os.path.exists(rec):
        with open(rec) as f:
            out["recorded_full_scale"] = json.load(f)
    return out


def bench_hbm_limit():
    """Single-chip run near the HBM limit (VERDICT r2 #6): execute the
    donated-buffer batch chain at 512x512x2048 (XLA-predicted peak
    11.1 GB of the v5e's 16 GB) and report the predicted peaks of the
    next sizes up — 576x576x2048 (predicted 14.98 GB) was OBSERVED to
    ResourceExhaust on this chip, so the measured usable limit sits
    between the two predictions (runtime reserves + fragmentation)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig,
        StepParams,
        _step,
        interactive_update,
    )

    GB = 1 << 30
    cfg = StepConfig(
        fd_active=True, notch_active=True,
        td_before_active=True, td_after_active=True,
    )
    params = StepParams.defaults()
    T = 2048

    # Predict with the SAME program the exec runs: the donated batch
    # chain WITHOUT the raw_fd output (the interactive publish's
    # raw-spectrum source; kept as a jit output it materializes a whole
    # extra spectrum cube, +5 GB at this shape — that growth from the
    # round-5 lean-publish rework, not fragmentation, is what turned
    # BENCH_r04's in-process 11.1 GB run into hbm_limit_error).
    stepd = jax.jit(lambda c, p: _step(c, p, cfg)[:2], donate_argnums=0)

    def predict(w, h):
        t = (np.arange(T) * DT).astype(np.float32)
        small = make_cube(
            jnp.asarray(t), np.zeros((8, 8, T), np.float32), dx=1.0, dy=1.0
        )

        def widen(x):
            if isinstance(x, jax.Array) and x.ndim == 3:
                return jax.ShapeDtypeStruct((w, h, x.shape[2]), x.dtype)
            if isinstance(x, jax.Array) and x.ndim == 2:
                return jax.ShapeDtypeStruct((w, h), x.dtype)
            return x

        abs_cube = jtu.tree_map(widen, small)
        ma = stepd.lower(abs_cube, params).compile().memory_analysis()
        return round(ma.peak_memory_in_bytes / GB, 2)

    pred = {f"{w}x{w}x{T}": predict(w, w) for w in (512, 576)}

    # Execute each shape in a FRESH process (clean HBM heap, no residue
    # from earlier in-process benches) and record run-vs-OOM per shape —
    # the pair brackets the chip's usable limit empirically.
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + ":" + env.get("PYTHONPATH", "")
    out = {
        "predicted_peak_gb": pred,
        "note": "donated-buffer batch chain (img output only; the "
                "interactive path additionally holds the raw slot cube "
                "and raw_fd). Each shape executed in a fresh process; "
                "run-vs-OOM brackets the usable single-chip HBM.",
    }
    for w in (512, 576):
        key = f"{w}x{w}x{T}"
        r = subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {here!r}); "
             f"import bench; bench._hbm_limit_exec({w}, {w}, {T})"],
            capture_output=True, text=True, timeout=900, env=env,
        )
        if r.returncode == 0 and r.stdout.strip():
            out[f"executed_{key}"] = json.loads(
                r.stdout.strip().splitlines()[-1])
        elif "RESOURCE_EXHAUSTED" in (r.stderr or ""):
            out[f"executed_{key}"] = {
                "oom": True, "predicted_gb": pred.get(key)}
        else:
            out[f"executed_{key}"] = {
                "error": (r.stderr or "no output")[-200:]}
    return out


def _hbm_limit_exec(W, H, T):
    """Subprocess body of :func:`bench_hbm_limit`'s execution half: the
    donated-buffer batch chain (cube+img outputs) at ``WxHxT`` on a
    clean HBM heap. Prints one JSON line."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig,
        StepParams,
        _step,
    )

    cfg = StepConfig(
        fd_active=True, notch_active=True,
        td_before_active=True, td_after_active=True,
    )
    params = StepParams.defaults()
    stepd = jax.jit(lambda c, p: _step(c, p, cfg)[:2], donate_argnums=0)
    t = (np.arange(T) * DT).astype(np.float32)
    mk = jax.jit(lambda key: jax.random.normal(key, (W, H, T), jnp.float32))
    cube = make_cube(jnp.asarray(t), mk(jax.random.PRNGKey(0)), dx=0.5, dy=0.5)
    _sum = jax.jit(jnp.sum)
    cube, img = stepd(cube, params)
    float(_sum(img))
    t0 = time.perf_counter()
    n = 4
    for i in range(n):
        params = dataclasses.replace(params, fd_low=np.float32(0.2 + 0.001 * i))
        cube, img = stepd(cube, params)
    float(_sum(img))
    per = (time.perf_counter() - t0) / n
    print(json.dumps({
        "cube_gb": round(W * H * T * 4 / (1 << 30), 2),
        "update_ms": round(per * 1e3, 1),
        "traces_per_sec": round(W * H / per),
    }))


def _write_bench_scan(path, t, data):
    """Minimal dotTHz writer for the bench cubes (ONE copy — the
    explorer and voxel benches previously each inlined a drifting one)."""
    import h5py

    with h5py.File(path, "w") as f:
        g = f.create_group("Image")
        md = {
            "width": str(data.shape[0]),
            "height": str(data.shape[1]),
            "dx [mm]": "0.5",
            "dy [mm]": "0.5",
        }
        g.attrs["mdDescription"] = ",".join(md.keys())
        for i, v in enumerate(md.values()):
            g.attrs[f"md{i + 1}"] = v
        g.attrs["dsDescription"] = "time,dataset"
        g.create_dataset("ds1", data=t)
        g.create_dataset("ds2", data=data)


def bench_explorer(t, data):
    """The PRODUCT interactive path (VERDICT r2 #1): a real Explorer —
    loader (bucket-padded grid), fused dirty-range executor, single-
    dispatch publish — driven like a slider drag. Reports the fused chain
    program's honest device ms (completion-probe) and the end-to-end wall
    p50 including the publish transfer (1 tunnel round-trip here)."""
    import os
    import shutil
    import tempfile

    from thz_image_explorer_tpu.pipeline import Explorer

    d = tempfile.mkdtemp()
    path = os.path.join(d, "bench.thzimg")
    _write_bench_scan(path, t, data)

    import jax
    import jax.numpy as jnp

    try:
        return _bench_explorer_body(path, Explorer, jax, jnp)
    finally:
        shutil.rmtree(d, ignore_errors=True)  # the 164 MB cube must not
        # accumulate in /tmp across bench runs


def _bench_explorer_body(path, Explorer, jax, jnp):
    ex = Explorer()
    ex.open_file(path)
    for uuid in ("time_band_pass_before_fft", "frequency_band_pass",
                 "water_vapor_notch", "time_band_pass_after_fft"):
        ex.pipeline.filters[uuid].active = True
    ex.update_filters()  # activate + exact-mode warmup
    ex.set_fft_window_low(1.0)  # compile the fused from-fft program
    ex.pipeline._timer.drain()

    # device time of the PRODUCT fused program, measured like the
    # pipelined headline: N back-to-back dispatches of the executor's
    # fused dirty-range run (no publish), ONE completion barrier at the
    # end — comparable 1:1 with pipelined_update_ms
    p = ex.pipeline
    lean = p.output is not None and p.output.amplitudes is None
    _sum = jax.jit(jnp.sum)
    p.record_timings = False  # no probe dispatches between runs
    windows = []
    for w in range(3):  # best-of-3: the tunnelled worker has transient stalls
        t0 = time.perf_counter()
        for i in range(PIPE_RUNS):
            p.config.fft_window[0] = 1.0 + 0.0005 * (w * PIPE_RUNS + i)
            p.run_from(p.fft_index)
        float(_sum(p.output.data))
        windows.append((time.perf_counter() - t0) / PIPE_RUNS)
    device_s = min(windows)
    p.record_timings = True

    # full product update wall p50: slider command incl. the one-transfer
    # publish (pays the tunnel round-trip per update in this harness)
    walls = []
    for i in range(RUNS):
        t0 = time.perf_counter()
        ex.set_fft_window_low(1.05 + 0.001 * i)
        walls.append(time.perf_counter() - t0)
    ex.pipeline._timer.drain()

    # pixel-click fast path (round-5 task 6), three honest tiers
    # (methodology + floor calibration: scripts/profile_click.py):
    #  - click_device_ms: per-click DEVICE time, measured with the
    #    dispatch floor amortized inside the program (vmap over 64 pixel
    #    choices, N dispatches, ONE barrier). The first methodology
    #    (fresh host operands per dispatch) reported 11.7 ms — all of it
    #    per-call device_put of small host operands (~6 ms) plus this
    #    tunnel's ~1.3 ms per-dispatch enqueue floor, not device work.
    #  - click_dispatch_ms: per-dispatch wall of single-click dispatches
    #    with pre-staged operands (what the runtime can actually sustain
    #    back-to-back here; includes the harness enqueue floor).
    #  - click_wall_p50_ms: end-to-end set_selected_pixel incl. the
    #    publish transfer and tunnel RTT.
    click_device_ms = None
    click_dispatch_ms = None
    click_wall_p50_ms = None
    plan = p._lean_plan
    clk = plan.get("click") if plan else None
    if clk is not None and p._pub_out is not None:
        ex.publish()  # ensure fresh pub epoch + outputs
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
        big = (p.slots[0].data, inp.data, inp.time, inp.valid_wh,
               final.data, final.freq)

        sm_dev = []
        for j in range(8):
            sm = dict(small)
            xy = np.asarray([j % w_grid, (j * 7) % w_grid], np.int32)
            sm["rxy"] = sm["fxy"] = sm["gxy"] = xy
            sm_dev.append(jax.device_put(sm))
        jax.block_until_ready([s["rxy"] for s in sm_dev])

        def click_once(i):
            return clk(*big, wl, wh, plan["stage_params"], sm_dev[i % 8],
                       out0["roi_amp"], out0["roi_ph"])

        click_once(0)  # compile
        t0 = time.perf_counter()
        last = None
        for i in range(1, 41):
            last = click_once(i)
        float(_sum(last["filtered_signal"]))
        click_dispatch_ms = round((time.perf_counter() - t0) / 40 * 1e3, 3)

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
        vclk(*big, wl, wh, plan["stage_params"], sm_v,
             out0["roi_amp"], out0["roi_ph"])  # compile
        t0 = time.perf_counter()
        for _ in range(10):
            vlast = vclk(*big, wl, wh, plan["stage_params"], sm_v,
                         out0["roi_amp"], out0["roi_ph"])
        float(_sum(vlast["filtered_signal"]))
        click_device_ms = round(
            (time.perf_counter() - t0) / 10 / V * 1e3, 4
        )

        cwalls = []
        for i in range(10):
            t0 = time.perf_counter()
            ex.set_selected_pixel(3 + i, 5 + i)
            cwalls.append(time.perf_counter() - t0)
        click_wall_p50_ms = round(float(np.median(cwalls)) * 1e3, 2)

    padded = ex.pipeline.input.data.shape
    px = padded[0] * padded[1]
    return {
        "click_device_ms": click_device_ms,
        "click_dispatch_ms": click_dispatch_ms,
        "click_wall_p50_ms": click_wall_p50_ms,
        "click_dispatches": p.click_dispatches,
        "explorer_update_ms": round(device_s * 1e3, 3),
        "explorer_update_p50_wall_ms": round(float(np.median(walls)) * 1e3, 2),
        "padded_grid": f"{padded[0]}x{padded[1]}x{padded[2]}",
        "padded_overhead": round(px / (WIDTH * HEIGHT) - 1.0, 3),
        "lean_publish": lean,
        "note": "explorer_update_ms = per-update device time of the product "
                "executor's merged lean chain+publish program (N async "
                "dispatches, one barrier), on the bucket-padded grid; the "
                "publish reductions are computed in-program and the final "
                "slot's spectral cubes are never materialized; wall p50 "
                "adds the one-transfer publish + one tunnel round-trip",
    }


def bench_voxel(t, data):
    """The live 3-D view's full fetch through the PRODUCT seam
    (``WebApp.voxels`` -> device top-k compaction -> one transfer),
    at the bench cube size = 41M voxels (round-4 task 5)."""
    import os
    import shutil
    import tempfile

    from thz_image_explorer_tpu.web import WebApp

    d = tempfile.mkdtemp()
    path = os.path.join(d, "bench_vox.thzimg")
    _write_bench_scan(path, t, data)

    app = WebApp()
    try:
        app.worker.send("open_file", path)
        app.worker.join_idle(600)
        # compile + warm; a cold remote compile can outlast the 30 s
        # worker-call timeout, which returns {'busy': true} — retry until
        # the program is genuinely built or give up loudly, so the timed
        # medians never absorb compile time and n is never a bogus 0
        for _ in range(20):
            v = app.voxels(threshold=0.001)
            if not v.get("busy"):
                break
            time.sleep(5.0)
        if v.get("busy"):
            raise TimeoutError("voxel program still compiling after 10 min")
        walls = []
        for i in range(5):
            t0 = time.perf_counter()
            v = app.voxels(threshold=0.001, contrast=2.0 + 0.001 * i)
            walls.append(time.perf_counter() - t0)
        return {
            "voxel_ms": round(float(np.median(walls)) * 1e3, 2),
            "voxel_points": int(v.get("n", 0)),
            "note": "wall time of the product /api/voxels fetch at "
                    "200x200x1024 (41M voxels): device envelope + top-k "
                    "compaction (cap threshold = k-th largest, replacing "
                    "the 19.5 ms histogram passes) + ONE ~0.5 MB packed-"
                    "u32 transfer (idx<<6 | 6-bit alpha; THZ_VOXEL_PACKED"
                    "=0 restores f16+i32); the round-3 path shipped the "
                    "164 MB opacity volume in two round-trips (~82 ms); "
                    "the dense-volume product fetch measured 4633 ms",
        }
    finally:
        app.worker.close()
        shutil.rmtree(d, ignore_errors=True)


def bench_drag(t, data):
    """Sustained slider-drag throughput at the PRODUCT seam (round-5
    task 8): a 100-event window-slider drag at ~125 Hz mouse cadence
    replayed through the REAL HTTP API against the live worker (per-key
    coalescing on), with a concurrent /api/state poller playing the
    browser. Reports the end-to-end latest-wins staleness p50/p99 and
    the chain updates/s the worker actually executed — the
    config.rs:41-51 contract under real load (utils/dragbench)."""
    import os
    import shutil
    import tempfile
    import threading
    from http.server import ThreadingHTTPServer

    from thz_image_explorer_tpu.utils.dragbench import replay_drag
    from thz_image_explorer_tpu.web import WebApp, make_handler

    d = tempfile.mkdtemp()
    path = os.path.join(d, "bench.thzimg")
    _write_bench_scan(path, t, data)
    app = WebApp()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        app.worker.send("open_file", path)
        for uuid in ("time_band_pass_before_fft", "frequency_band_pass",
                     "water_vapor_notch", "time_band_pass_after_fft"):
            app.worker.send("set_filter_active", uuid, True)
        app.worker.join_idle()
        # warmup: compile the from-fft lean program before the clock runs
        app.command("set_fft_window_low", [0.99], {})
        app.worker.join_idle()
        return replay_drag(
            port, n_events=100, lo=1.0, hi=1.5, interval_s=0.008, app=app,
        )
    finally:
        server.shutdown()
        app.worker.close()
        shutil.rmtree(d, ignore_errors=True)


def bench_psf():
    """PSF-tool fit timing on the reference's real knife-edge fixtures
    (round-4 task 6): full compute wall, the batched device-filtering
    split, and a numpy/scipy host-only run of the same fit."""
    import glob

    from thz_image_explorer_tpu.ops.firdesign import create_filter_bank
    from thz_image_explorer_tpu.psf_tool import fitting
    from thz_image_explorer_tpu.psf_tool.app import FilterParams, compute_psf
    from thz_image_explorer_tpu.psf_tool.data_loader import KnifeEdgeMeasurement

    base = "/root/reference/sample_data/example_beam_width"
    fx = sorted(glob.glob(f"{base}/measurement_x/data/*.thz"))
    fy = sorted(glob.glob(f"{base}/measurement_y/data/*.thz"))
    if not fx or not fy:
        return {"error": "knife-edge fixtures not found"}
    mx = KnifeEdgeMeasurement.from_thz_file(fx[0])
    my = KnifeEdgeMeasurement.from_thz_file(fy[0])
    fp = FilterParams()  # reference defaults: 20 bands, 0.15-5 THz, log

    def timed(fn, n=3):
        fn()  # warm/compile
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # the one batched device program: all bands x all traces FIR filtering
    taps, _ = create_filter_bank(
        fp.n_filters, fp.start_freq, fp.end_freq, fp.win_width, mx.times,
        low_cut=fp.low_cut, high_cut=fp.high_cut, spacing=fp.frequency_spacing,
    )
    import jax

    def device_filter():
        # the production seam: one program returning the filtered cube
        # (stays on device) + the (B, P) intensities the fits consume
        filt, inten = fitting.filter_and_intensity_all_bands(
            np.asarray(mx.time_traces), taps
        )
        jax.block_until_ready(filt)
        return inten

    filter_dev_s = timed(device_filter)

    full_s = timed(lambda: compute_psf(mx, my, fp), n=1)

    # host-only comparison: scipy 'same' correlation, same fit loop
    from scipy.signal import fftconvolve

    def host_fir(traces, taps_):
        traces = np.asarray(traces, np.float64)
        return np.stack([
            fftconvolve(traces, k[::-1][None, :], mode="same")
            for k in np.asarray(taps_, np.float64)
        ])

    def host_fai(traces, taps_):
        f = host_fir(traces, taps_)
        inten = np.stack([fitting.compute_intensity(f[b])
                          for b in range(f.shape[0])])
        return f, inten

    real = fitting.filter_and_intensity_all_bands
    fitting.filter_and_intensity_all_bands = host_fai
    try:
        host_s = timed(lambda: compute_psf(mx, my, fp), n=1)
    finally:
        fitting.filter_and_intensity_all_bands = real
    return {
        "psf_fit_ms": round(full_s * 1e3, 1),
        "psf_filter_device_ms": round(filter_dev_s * 1e3, 2),
        "psf_fit_hostonly_ms": round(host_s * 1e3, 1),
        "workload": f"{len(mx.positions)}x{mx.time_traces.shape[1]} traces "
                    f"x {fp.n_filters} bands x 2 axes, real knife-edge "
                    "fixtures (example_beam_width)",
        "note": "psf_fit_ms = full compute (device band-filter+intensity "
                "program, filtered cube left on device, + sequential "
                "warm-started host erf fits); hostonly swaps the device "
                "program for scipy fftconvolve + numpy intensities",
    }


def bench_firstopen():
    """Cold/warm first-open regression numbers (round-4 task 2, reworked
    round 5 per VERDICT r4 tasks 2+4): wall time of Explorer() +
    open_file (preview point AND full device results) + one slider
    update in a FRESH process against (a) an empty XLA cache at a novel
    bucket shape, (b..d) the same cache, three more processes. Warm is
    reported as the MEDIAN of the three runs with every run recorded —
    no best-of-N — plus a per-program persistent-cache hit/miss table
    (jax's own compiler logs). Gate: THZ_BENCH_FIRSTOPEN=0 skips (the
    cold compile costs minutes of bench budget)."""
    import os
    import subprocess
    import tempfile

    if os.environ.get("THZ_BENCH_FIRSTOPEN", "1") == "0":
        # skip must not ERASE: carry the previous artifact's measured
        # first-open record forward (marked carried) so a quick headline
        # rerun can't lose the durable first-open evidence
        try:
            import json as _json

            here = os.path.dirname(os.path.abspath(__file__))
            with open(os.path.join(here, "BENCH_FULL.json")) as f:
                prev = _json.load(f)["extra"]["first_open"]
            if "first_open_cold_s" in prev:
                prev.setdefault("carried_from_previous_run", True)
                prev["skipped"] = True
                return prev
        except Exception:  # noqa: BLE001 — no previous record
            pass
        return {"skipped": True}

    cache = tempfile.mkdtemp(prefix="thz_cold_cache_")
    scan_dir = tempfile.mkdtemp(prefix="thz_cold_scan_")
    # a shape the persistent caches have never seen (odd bucket + T)
    w, h, nt = 150, 130, 768
    here = os.path.dirname(os.path.abspath(__file__))
    script = f"""
import sys, time, json, logging, re
sys.path.insert(0, {here!r}); sys.path.insert(0, {os.path.join(here, "tests")!r})
import numpy as np
from make_sample import synthetic_scan, write_scan_thz
t, cube = synthetic_scan(width={w}, height={h}, n_time={nt})
path = "{scan_dir}/cold.thzimg"
write_scan_thz(path, t, cube, dx=0.5, dy=0.5)

events = []
class _H(logging.Handler):
    def emit(self, r):
        events.append(r.getMessage())
import jax
jax.config.update("jax_log_compiles", True)
for name in ("jax._src.compiler", "jax._src.dispatch"):
    lg = logging.getLogger(name); lg.setLevel(logging.DEBUG); lg.addHandler(_H())

# Pay the backend's first-d2h init up front and TIME it: on the axon
# tunnel it is 0.2-476 s bimodal (scripts/probe_tunnel.py) and was the
# whole round-3/4 warm-open nondeterminism. The product pays it in the
# background at Explorer construction (utils/warmup.py); here it must
# complete before the clock so open_s measures repo-controlled work and
# the stall is attributed per run.
from thz_image_explorer_tpu.utils.warmup import warm_transfer_paths
tunnel_s = warm_transfer_paths(block=True)

t0 = time.perf_counter()
from thz_image_explorer_tpu.pipeline import Explorer
ex = Explorer()
# defer the device phase exactly as the worker would, so the PREVIEW
# point (host image + trace published) is separately timestamped
fin = []
ex.defer = lambda m, e: fin.append(e)
ex.open_file(path)
assert ex.image is not None and ex.plot.signal.size
preview_s = time.perf_counter() - t0
ex._finalize_open(fin[0])
assert not ex.preview_pending and ex.plot.signal_fft.size
open_s = time.perf_counter() - t0
t1 = time.perf_counter()
ex.set_fft_window_low(1.1)
slider_s = time.perf_counter() - t1

hits, misses, compiles = [], [], []
for msg in events:
    m = re.search(r"cache hit for '([^']+)'", msg, re.I)
    if m: hits.append(m.group(1)[:48]); continue
    m = re.search(r"cache miss for '([^']+)'", msg, re.I)
    if m: misses.append(m.group(1)[:48]); continue
    m = re.search(r"Finished XLA compilation of (\\S+) in ([0-9.]+) sec", msg)
    if m: compiles.append([m.group(1)[:48], round(float(m.group(2)), 2)])
print(json.dumps({{"preview_s": preview_s, "open_s": open_s,
                   "tunnel_s": round(tunnel_s, 2),
                   "slider_s": slider_s, "n_hits": len(hits),
                   "n_misses": len(misses), "misses": misses[:20],
                   "compiles": compiles[:20]}}))
"""
    env = dict(os.environ, THZ_XLA_CACHE=cache)
    env.pop("JAX_PLATFORMS", None)

    def run_once():
        t0 = time.perf_counter()
        try:
            out = subprocess.run(
                [sys.executable, "-c", script], env=env, capture_output=True,
                text=True, timeout=1200,
            )
        except subprocess.TimeoutExpired:
            # A degraded remote compile service can push a cold open past
            # the budget (observed: a trivial matmul compile at 102 s).
            # Report the timeout and let the warm runs proceed against the
            # partially-populated cache instead of aborting everything.
            return {"error": "timeout (>1200 s)",
                    "process_wall_s": round(time.perf_counter() - t0, 1)}
        wall = time.perf_counter() - t0
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        try:
            d = json.loads(line)
        except Exception:  # noqa: BLE001
            d = {"error": (out.stderr or "")[-200:]}
        d["process_wall_s"] = round(wall, 1)
        return d

    import shutil

    try:
        cold = run_once()
        warm_runs = [run_once() for _ in range(3)]
    finally:
        shutil.rmtree(scan_dir, ignore_errors=True)
        shutil.rmtree(cache, ignore_errors=True)
    # median over SUCCESSFUL runs only: a failed run has no open_s, and
    # an inf sentinel would serialize as bare `Infinity` — invalid JSON,
    # the exact parsed=null artifact class VERDICT r4 #1b fixed. Failed
    # runs stay visible as -1 in first_open_warm_runs_s + the details.
    warm_opens = sorted(
        r["open_s"] for r in warm_runs if "open_s" in r
    )
    warm_median = warm_opens[len(warm_opens) // 2] if warm_opens else -1
    return {
        "first_open_cold_s": round(cold.get("open_s", -1), 1),
        "first_open_preview_s": round(cold.get("preview_s", -1), 2),
        "first_open_cold_detail": cold,
        # median of 3 independent fresh-process warm opens; every run is
        # recorded so spread (tunnel/data-plane variance, see README) is
        # in the artifact, not hidden by best-of-N (VERDICT r4 task 4)
        "first_open_warm_s": round(warm_median, 1),
        "first_open_warm_runs_s": [
            round(r.get("open_s", -1), 1) for r in warm_runs
        ],
        "first_open_warm_preview_runs_s": [
            round(r.get("preview_s", -1), 2) for r in warm_runs
        ],
        # the backend's first-d2h init per fresh process, paid BEFORE the
        # open clock (mirrors the product's background warmup at Explorer
        # construction). 0.2-476 s bimodal on the axon tunnel — this, not
        # cache misses, was the round-3/4 warm-open spread
        # (scripts/probe_tunnel.py).
        "first_open_tunnel_runs_s": [
            round(r.get("tunnel_s", -1), 2) for r in [cold] + warm_runs
        ],
        "first_open_warm_detail": warm_runs,
        "shape": f"{w}x{h}x{nt} (novel bucket, fresh cache dir)",
        "note": "cold = empty XLA cache (remote compiles); warm = fresh "
                "process, same persistent cache. preview_s = host image+"
                "trace published (progressive open); open_s = full device "
                "results; tunnel_s = the environment's first-d2h init, "
                "timed separately. hit/miss per program in the details.",
    }


def bench_deconv(cube):
    """Deconvolution alone AND the combined full update (window + FFT +
    filters + iFFT + intensity + deconvolution at reference defaults) with
    a single completion barrier — the north-star metric of BASELINE.json."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from thz_image_explorer_tpu.io import load_psf
    from thz_image_explorer_tpu.ops.deconvolution import (
        DeconvolutionParams,
        deconvolve_cube,
        plan_bands,
    )
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig,
        StepParams,
        interactive_update,
    )

    psf = load_psf("/root/reference/sample_data/psf.npz")
    params = DeconvolutionParams()  # defaults: 25 bands, <=500 RL iters
    geo = plan_bands(
        params,
        psf,
        np.asarray(cube.time),
        (cube.width, cube.height),
        cube.dx,
        cube.dy,
    )
    if geo is None:
        return None

    _sum = jax.jit(jnp.sum)

    def timed(rl_impl, n=5):
        out = deconvolve_cube(cube.data, geo, chunk_size=25, rl_impl=rl_impl)
        float(_sum(out))  # completion barrier (see bench_tpu)
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = deconvolve_cube(cube.data, geo, chunk_size=25,
                                  rl_impl=rl_impl)
            float(_sum(out))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    # the HEADLINE is the production auto-dispatch (what a user's Apply
    # actually runs); scan/pallas are timed separately so the dispatch
    # choice stays data-backed (VMEM-resident pallas vs HBM-roundtrip
    # XLA scan)
    deconv_s = timed(None)  # auto
    scan_s = timed("scan")
    try:
        pallas_s = timed("pallas")
    except Exception:  # noqa: BLE001 — e.g. non-TPU backend
        pallas_s = None

    # per-run DEVICE time: a window of back-to-back dispatches sharing ONE
    # completion barrier, so the ~30 ms tunnel RTT is amortized across the
    # window instead of billed to every run (the wall number above is what
    # THIS harness delivers per Apply; the device number is what a
    # production-local chip delivers). Phase breakdown (each phase timed
    # with its own barrier): prepare_spectra ~4 ms, band energies ~4 ms,
    # RL ~7 ms, spectral band sum ~3 ms (scripts/profile_deconv.py,
    # 2026-08-17).
    n_win = 8
    out = deconvolve_cube(cube.data, geo, chunk_size=25)
    float(_sum(out))
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_win):
            out = deconvolve_cube(cube.data, geo, chunk_size=25)
        float(_sum(out))
        windows.append((time.perf_counter() - t0) / n_win)
    deconv_device_s = float(np.median(windows))

    try:
        from thz_image_explorer_tpu.ops.deconvolution import deconv_cost_analysis

        deconv_flops = deconv_cost_analysis(cube.data, geo, chunk_size=25)
    except Exception:  # noqa: BLE001
        deconv_flops = None

    # combined: one full interactive update followed by deconvolution of
    # its output, one barrier at the end (the Apply-button path)
    sparams = StepParams.defaults()
    scfg = StepConfig(
        fd_active=True, notch_active=True,
        td_before_active=True, td_after_active=True,
    )
    chain_out = interactive_update(cube, sparams, scfg)
    float(_sum(chain_out[1]))
    combined = []
    for i in range(5):
        sparams = dataclasses.replace(sparams, fd_low=np.float32(0.2 + 0.001 * i))
        t0 = time.perf_counter()
        chain_out = interactive_update(cube, sparams, scfg)
        out = deconvolve_cube(chain_out[0].data, geo, chunk_size=25)
        float(_sum(out))
        combined.append(time.perf_counter() - t0)
    return {
        "deconv_s": deconv_s,
        "deconv_device_s": deconv_device_s,
        "scan_s": scan_s,
        "pallas_s": pallas_s,
        "combined_s": float(np.median(combined)),
        "deconv_flops": deconv_flops,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--deconv", action="store_true")  # kept for compat
    parser.add_argument("--no-deconv", action="store_true")
    parser.add_argument("--no-cpu", action="store_true")
    args = parser.parse_args()

    # persistent compilation cache: the first process on a machine pays the
    # (remote) XLA compiles, every later run reuses them
    from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache
    from thz_image_explorer_tpu.utils.warmup import warm_transfer_paths

    enable_compile_cache()
    # pay + record the tunnel's first-d2h init (0.2-476 s bimodal,
    # scripts/probe_tunnel.py) so no sub-bench absorbs it into a number
    print("bench: transfer-path warmup...", file=sys.stderr, flush=True)
    tunnel_s = warm_transfer_paths(block=True)
    print(f"bench: first d2h took {tunnel_s:.2f} s", file=sys.stderr,
          flush=True)

    t, data = _make_data()
    # the remote tunnelled TPU worker occasionally crashes/restarts; one
    # retry keeps the headline metric alive through a transient fault
    try:
        tpu_s, pipelined_s, cube, chain_flops, chain_bytes = bench_tpu(t, data)
    except Exception as e:  # noqa: BLE001
        print(f"bench: TPU attempt failed ({str(e)[:80]}); retrying...",
              file=sys.stderr, flush=True)
        time.sleep(10)
        tpu_s, pipelined_s, cube, chain_flops, chain_bytes = bench_tpu(t, data)
    cpu_s = None if args.no_cpu else bench_cpu_torch(t, data)

    # pinned denominator (VERDICT r2 #4): best-of-8 torch-CPU runs on a
    # quiet host, recorded with the raw run list in BASELINE_CPU.json —
    # the live cpu_torch_ms stays reported but no longer moves the ratio
    pinned_ms = None
    try:
        import os

        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BASELINE_CPU.json")) as f:
            pinned_ms = float(json.load(f)["best_ms"])
    except Exception:  # noqa: BLE001
        pass

    PEAK_BF16_FLOPS = 197e12  # v5e bf16 matmul peak
    HBM_BW = 819e9  # v5e HBM bandwidth
    extra = {
        "traces_per_sec_pipelined": round(WIDTH * HEIGHT / pipelined_s, 1),
        "pipelined_update_ms": round(pipelined_s * 1e3, 3),
        # the environment's first-d2h init, paid before any timing
        # (0.2-476 s bimodal on the axon tunnel, scripts/probe_tunnel.py)
        "tunnel_first_d2h_s": round(tunnel_s, 2),
        "cube": f"{WIDTH}x{HEIGHT}x{NTIME}",
        "cpu_torch_ms": None if cpu_s is None else round(cpu_s * 1e3, 2),
        "note": "p50 includes the host<->device round-trip of the remote "
                "tunnelled TPU; pipelined_update_ms is per-update device time",
    }
    if pinned_ms is not None:
        extra["cpu_pinned_ms"] = pinned_ms
        # two bases, both honest: device time (what a production-local TPU
        # delivers) and wall p50 including this harness's ~30 ms tunnel RTT
        extra["vs_baseline_pinned"] = round(pinned_ms / 1e3 / pipelined_s, 1)
        extra["vs_baseline_pinned_incl_rtt"] = round(pinned_ms / 1e3 / tpu_s, 1)
        extra["vs_baseline_note"] = (
            "pinned = best-of-8 quiet-host torch denominator "
            "(BASELINE_CPU.json); vs_baseline_pinned is the device basis "
            "(what a production-local TPU delivers per update); the "
            "incl_rtt basis additionally carries this harness's ~27 ms "
            "tunnel round-trip per update, absent on a local chip"
        )
    if chain_flops is not None:
        extra["chain_gflops_per_update"] = round(chain_flops / 1e9, 2)
        extra["mfu"] = round(chain_flops / pipelined_s / PEAK_BF16_FLOPS, 4)
        # the chain's matmuls run bf16x3 (Precision.HIGH): the ACHIEVABLE
        # matmul ceiling is peak/3 — utilization against it is the honest
        # "how much headroom is left" number (round-4 roofline task)
        extra["mfu_bf16x3"] = round(
            chain_flops / pipelined_s / (PEAK_BF16_FLOPS / 3.0), 4
        )
    if chain_bytes is not None:
        extra["chain_bytes_accessed_gb"] = round(chain_bytes / 1e9, 3)
        extra["hbm_roofline_frac"] = round(
            chain_bytes / pipelined_s / HBM_BW, 3
        )
        try:
            stream = bench_hbm_stream()
            extra["hbm_stream"] = stream
            extra["hbm_roofline_frac_measured"] = round(
                chain_bytes
                / pipelined_s
                / (stream["hbm_bw_measured_gbps"] * 1e9),
                3,
            )
        except Exception as e:  # noqa: BLE001
            extra["hbm_stream_error"] = str(e)[:160]
    if chain_flops is not None or chain_bytes is not None:
        extra["roofline_note"] = (
            "XLA cost-analysis FLOPs / bytes-accessed of the fused chain "
            "over best-of-3 pipelined device windows; mfu_bf16x3 divides "
            "by the ~65.7 TFLOP/s bf16x3 ceiling the DFT matmuls actually "
            "run at, hbm_roofline_frac by 819 GB/s NOMINAL v5e HBM and "
            "hbm_roofline_frac_measured by the overhead-corrected "
            "streaming bandwidth a real program can reach on this "
            "runtime (hbm_stream). Phase split and methodology: "
            "scripts/profile_roofline.py, scripts/micro_matmul.py, "
            "scripts/micro_twostage.py (factored-DFT dead end)"
        )
    try:
        extra["explorer"] = bench_explorer(t, data)
        eu = extra["explorer"].get("explorer_update_ms")
        if eu is not None:
            extra["explorer_update_ms"] = eu
            extra["explorer_vs_pipelined"] = round(eu / (pipelined_s * 1e3), 2)
        for ck in ("click_device_ms", "click_dispatch_ms"):
            cu = extra["explorer"].get(ck)
            if cu is not None:
                extra[ck] = cu
    except Exception as e:  # noqa: BLE001
        extra["explorer_error"] = str(e)[:160]
    try:
        extra["voxel"] = bench_voxel(t, data)
        if "voxel_ms" in extra["voxel"]:
            extra["voxel_ms"] = extra["voxel"]["voxel_ms"]
    except Exception as e:  # noqa: BLE001
        extra["voxel_error"] = str(e)[:160]
    try:
        extra["drag"] = bench_drag(t, data)
        for k in ("drag_p50_ms", "drag_p99_ms", "drag_updates_per_s"):
            if k in extra["drag"]:
                extra[k] = extra["drag"][k]
    except Exception as e:  # noqa: BLE001
        extra["drag_error"] = str(e)[:160]
    try:
        extra["psf_tool"] = bench_psf()
        if "psf_fit_ms" in extra["psf_tool"]:
            extra["psf_fit_ms"] = extra["psf_tool"]["psf_fit_ms"]
    except Exception as e:  # noqa: BLE001
        extra["psf_error"] = str(e)[:160]
    if not args.no_deconv:
        try:
            dres = bench_deconv(cube)
        except Exception as e:  # keep the headline result robust
            extra["deconv_error"] = str(e)[:120]
            dres = None
        if dres is not None:
            extra["deconv_ms"] = round(dres["deconv_s"] * 1e3, 2)
            extra["deconv_device_ms"] = round(
                dres["deconv_device_s"] * 1e3, 2)
            extra["deconv_note"] = (
                "deconv_ms = wall per Apply on this harness (includes the "
                "~30 ms tunnel RTT of the completion barrier); "
                "deconv_device_ms = per-run device time from an 8-run "
                "single-barrier window (what a production-local chip "
                "delivers); phase split in scripts/profile_deconv.py"
            )
            extra["deconv_impl"] = "auto dispatch (production path)"
            extra["deconv_workload"] = "25 Kaiser bands x <=500 RL iters (defaults)"
            extra["matmul_rl_ms"] = round(dres["scan_s"] * 1e3, 2)
            if dres["pallas_s"] is not None:
                extra["pallas_rl_ms"] = round(dres["pallas_s"] * 1e3, 2)
            extra["combined_chain_plus_deconv_ms"] = round(
                dres["combined_s"] * 1e3, 2)
            extra["north_star"] = "combined < 100 ms"
            if dres.get("deconv_flops"):
                extra["deconv_tflops_per_run"] = round(
                    dres["deconv_flops"] / 1e12, 3)
                extra["deconv_mfu"] = round(
                    dres["deconv_flops"] / dres["deconv_device_s"]
                    / PEAK_BF16_FLOPS,
                    4,
                )
    # these benches are independent of the deconvolution flag: --no-deconv
    # must skip ONLY the RL deconvolution timing
    try:
        extra["large_cube"] = bench_large()
    except Exception as e:
        extra["large_cube_error"] = str(e)[:120]
    try:
        extra["hbm_limit"] = bench_hbm_limit()
    except Exception as e:
        extra["hbm_limit_error"] = str(e)[:160]
    try:
        extra["scale_ceiling"] = bench_ceiling()
    except Exception as e:
        extra["scale_ceiling_error"] = str(e)[:160]
    try:
        extra["mesh_exec"] = bench_mesh_exec()
    except Exception as e:
        extra["mesh_exec_error"] = str(e)[:160]
    try:
        extra["first_open"] = bench_firstopen()
    except Exception as e:
        extra["first_open_error"] = str(e)[:160]

    result = {
        "metric": "full-image update latency p50 (window+FFT+FD filter+notch+iFFT+intensity, 200x200x1024)",
        "value": round(tpu_s * 1e3, 3),
        "unit": "ms",
        "vs_baseline": None if cpu_s is None else round(cpu_s / tpu_s, 1),
        "extra": extra,
    }
    # The driver's artifact keeps only a ~2000-char tail of this line:
    # BENCH_r03/r04 both recorded `parsed: null` because the full extras
    # blew that budget (VERDICT r4 #1b). Print a COMPACT headline-only
    # line and write the complete record to BENCH_FULL.json next to it.
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
            json.dump(result, f, indent=1)
    except Exception as e:  # noqa: BLE001 — the headline must still print
        print(f"bench: BENCH_FULL.json write failed: {e}", file=sys.stderr)
    print(headline_line(result))


#: extras promoted into the one-line driver headline (everything else
#: lives in BENCH_FULL.json)
HEADLINE_KEYS = (
    "pipelined_update_ms",
    "explorer_update_ms",
    "click_device_ms",
    "click_dispatch_ms",
    "chain_bytes_accessed_gb",
    "mfu_bf16x3",
    "hbm_roofline_frac_measured",
    "deconv_device_ms",
    "combined_chain_plus_deconv_ms",
    "voxel_ms",
    "psf_fit_ms",
    "drag_p50_ms",
    "drag_p99_ms",
    "drag_updates_per_s",
    "cpu_pinned_ms",
    "vs_baseline_pinned",
    "vs_baseline_pinned_incl_rtt",
    "tunnel_first_d2h_s",
)

HEADLINE_FIRSTOPEN_KEYS = (
    "first_open_cold_s",
    "first_open_warm_s",
    "first_open_warm_runs_s",
    "first_open_preview_s",
    "first_open_tunnel_runs_s",
)


def headline_line(result: dict) -> str:
    """Compact single-line JSON the driver can always parse (<1900 chars;
    the r03/r04 artifacts kept only a 2000-char tail, VERDICT r4 #1b)."""
    extra = result.get("extra", {})
    headline = {k: result[k] for k in ("metric", "value", "unit",
                                       "vs_baseline")}
    for k in HEADLINE_KEYS:
        if k in extra:
            headline[k] = extra[k]
    fo = extra.get("first_open") or {}
    for k in HEADLINE_FIRSTOPEN_KEYS:
        if k in fo:
            headline[k] = fo[k]
    headline["full_record"] = "BENCH_FULL.json"
    line = json.dumps(headline)
    if len(line) > 1900:  # hard guard: never outgrow the driver's parser
        headline["metric"] = headline["metric"][:40]
        line = json.dumps(headline)
    return line


if __name__ == "__main__":
    sys.exit(main())
