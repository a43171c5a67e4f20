#!/usr/bin/env python
"""Bytes/FLOP roofline for the fused interactive chain (round-4 task 1).

Answers the round-3 review question — "done, or 2x left?" — with data:

* XLA cost analysis (FLOPs + bytes accessed) and output-buffer sizes for
  the fused chain program;
* phase ablations (window+rfft / +amp+unwrap / +masks / +irfft /
  +intensity) timed on the real chip, so each chain phase has a measured
  device cost;
* output-materialization variants: the full ScanCube return (fft + amp +
  ph cubes, 656 MB of outputs at the bench shape) vs a LEAN return that
  emits only what the publisher actually reads (final data cube + small
  reductions/slices) — quantifying the review's "~2x the useful traffic"
  hypothesis before the executor is redesigned around it.

Ceilings used (v5e): 197 TFLOP/s bf16; DFT matmuls run bf16x3
(Precision.HIGH, ~65.7 TFLOP/s achievable); the unwrap cumsum matmul runs
bf16x6 (HIGHEST, ~32.8 TFLOP/s); HBM ~819 GB/s.

Run: PYTHONPATH=/root/repo python scripts/profile_roofline.py
Prints one JSON line; results recorded in the module docstring of
parallel/step.py and bench extras.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_BF16 = 197e12
PEAK_BF16X3 = PEAK_BF16 / 3.0
PEAK_BF16X6 = PEAK_BF16 / 6.0
HBM_BW = 819e9  # v5e

W, H, T = 208, 208, 1024
VALID = (200, 200)


def main():
    import jax
    import jax.numpy as jnp

    from thz_image_explorer_tpu.data import make_cube, masked_pixel_mean
    from thz_image_explorer_tpu.ops import bandpass as bp
    from thz_image_explorer_tpu.ops.fourier import (
        forward_fft,
        inverse_fft,
        unwrap,
    )
    from thz_image_explorer_tpu.ops import mxufft
    from thz_image_explorer_tpu.ops.intensity import intensity_image
    from thz_image_explorer_tpu.ops.roi import masked_mean_stack
    from thz_image_explorer_tpu.ops.windows import WindowType, window_array
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig,
        StepParams,
        interactive_update,
    )
    from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    t = (np.arange(T) * 0.05).astype(np.float32)
    pulse = np.exp(-((t - 8.0) ** 2) / 0.6) * np.sin(2 * np.pi * (t - 8.0))
    data = (pulse[None, None, :] * rng.uniform(0.3, 1.0, (W, H, 1))).astype(
        np.float32
    )
    data[VALID[0]:, :, :] = 0.0
    data[:, VALID[1]:, :] = 0.0
    cube = make_cube(
        jnp.asarray(t), jnp.asarray(data), dx=0.5, dy=0.5, valid_wh=VALID
    )
    params = StepParams.defaults()
    cfg = StepConfig(
        fd_active=True, notch_active=True,
        td_before_active=True, td_after_active=True,
    )
    masks = np.zeros((4, W, H), np.float32)
    masks[0, 10:40, 10:40] = 1.0
    masks[1, 50:90, 20:60] = 1.0
    masks_d = jnp.asarray(masks)
    pix = jnp.asarray([17, 23], jnp.int32)

    _sum = jax.jit(jnp.sum)
    out = {"shape": [W, H, T], "valid": list(VALID)}

    def barrier(x):
        leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "shape")]
        return float(_sum(jnp.ravel(leaves[0])[:128]))

    import dataclasses

    def timeit(fn, *args, n=40, reps=3, nudge=None):
        """Pipelined device ms/iter: n dispatches, ONE completion barrier,
        best of `reps` windows (the tunnel has stall windows)."""
        r = fn(*args)
        barrier(r)  # compile+warm
        best = None
        for _ in range(reps):
            a = args
            t0 = time.perf_counter()
            r = None
            for i in range(n):
                if nudge is not None:
                    a = nudge(a, i)
                r = fn(*a)
            barrier(r)
            dt = (time.perf_counter() - t0) / n
            best = dt if best is None else min(best, dt)
        return best * 1e3

    def nudge_params(args, i):
        # vary a traced scalar so runs aren't no-op cached
        p = args[1]
        p = dataclasses.replace(p, fd_low=np.float32(0.2 + 0.0001 * i))
        return (args[0], p) + args[2:]

    def analyze(jitted, *args):
        c = jitted.lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        ma = c.memory_analysis()
        d = {
            "gflop": None if ca is None else round(float(ca.get("flops", 0)) / 1e9, 1),
            "bytes_gb": None
            if ca is None
            else round(float(ca.get("bytes accessed", 0)) / 1e9, 3),
        }
        if ma is not None:
            d["out_mb"] = round(ma.output_size_in_bytes / 1e6, 1)
            d["temp_mb"] = round(ma.temp_size_in_bytes / 1e6, 1)
        return d

    # ---------------------------------------------------------------- full
    full_ms = timeit(interactive_update, cube, params, cfg, nudge=nudge_params)
    out["full_step"] = {"ms": round(full_ms, 2)}
    out["full_step"].update(analyze(interactive_update, cube, params, cfg))

    # ---------------------------------------------------------------- lean
    @jax.jit
    def lean_step(cube, params, masks, pix):
        from thz_image_explorer_tpu.parallel.step import _step

        c, img = _step(cube, params, cfg)
        roi_amp = masked_mean_stack(c.amplitudes, masks)
        roi_ph = masked_mean_stack(c.phases, masks)
        roi_trace = masked_mean_stack(c.data, masks)
        avg_signal = masked_pixel_mean(c.data, c.valid_wh)
        return dict(
            data=c.data,
            img=img,
            avg_fft=c.avg_fft,
            avg_amp=c.avg_signal_fft,
            avg_ph=c.avg_phase_fft,
            avg_signal=avg_signal,
            roi_amp=roi_amp,
            roi_ph=roi_ph,
            roi_trace=roi_trace,
            pix_sig=c.data[pix[0], pix[1]],
            pix_amp=c.amplitudes[pix[0], pix[1]],
            pix_ph=c.phases[pix[0], pix[1]],
        )

    lean_ms = timeit(lean_step, cube, params, masks_d, pix, nudge=nudge_params)
    out["lean_step"] = {"ms": round(lean_ms, 2)}
    out["lean_step"].update(analyze(lean_step, cube, params, masks_d, pix))

    # lean WITHOUT the final data cube either (everything the publisher
    # reads, nothing else): the floor for a publish-only dispatch
    @jax.jit
    def lean_nodata(cube, params, masks, pix):
        d = lean_step(cube, params, masks, pix)
        d.pop("data")
        return d

    nod_ms = timeit(lean_nodata, cube, params, masks_d, pix, nudge=nudge_params)
    out["lean_nodata"] = {"ms": round(nod_ms, 2)}
    out["lean_nodata"].update(analyze(lean_nodata, cube, params, masks_d, pix))

    # ------------------------------------------------------------ ablations
    def phase(name, fn, *args, nudge=None):
        ms = timeit(fn, *args, nudge=nudge)
        out[name] = {"ms": round(ms, 2)}
        out[name].update(analyze(fn, *args))

    @jax.jit
    def p_rfft(data, time, lo, hi):
        w = window_array(time, WindowType.ADAPTED_BLACKMAN, lo, hi)
        return mxufft.rfft_ri(data * w)

    nud = lambda a, i: a[:2] + (np.float32(1.0 + 1e-4 * i), a[3])
    phase("rfft_only", p_rfft, cube.data, cube.time,
          np.float32(1.0), np.float32(7.0), nudge=nud)

    @jax.jit
    def p_amp_unwrap(data, time, lo, hi):
        ri = p_rfft(data, time, lo, hi)
        spec = jax.lax.complex(ri[0], ri[1])
        amp = jnp.abs(spec)
        ph = unwrap(jnp.angle(spec))
        return amp, ph

    phase("rfft_amp_unwrap", p_amp_unwrap, cube.data, cube.time,
          np.float32(1.0), np.float32(7.0), nudge=nud)

    @jax.jit
    def p_irfft(data, time, lo, hi):
        ri = p_rfft(data, time, lo, hi)
        spec = jax.lax.complex(ri[0], ri[1])
        return mxufft.irfft_c64(spec, T)

    phase("rfft_irfft", p_irfft, cube.data, cube.time,
          np.float32(1.0), np.float32(7.0), nudge=nud)

    # ------------------------------------------------------------ ceilings
    for k in ("full_step", "lean_step", "lean_nodata"):
        d = out[k]
        if d.get("gflop"):
            s = d["ms"] / 1e3
            d["mfu_bf16"] = round(d["gflop"] * 1e9 / s / PEAK_BF16, 3)
            d["mfu_bf16x3"] = round(d["gflop"] * 1e9 / s / PEAK_BF16X3, 3)
        if d.get("bytes_gb"):
            d["hbm_frac"] = round(d["bytes_gb"] * 1e9 / (d["ms"] / 1e3) / HBM_BW, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
