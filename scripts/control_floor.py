#!/usr/bin/env python
"""Control program for the product-update floor (round-5 task 5).

The README's ~3.6-4.0 ms floor model for the 5.8 ms product update was
extrapolated from a PURE streaming kernel's size slope (bench_hbm_stream)
plus a fixed dispatch constant — not from a program with the chain's
actual dispatch pattern and operand mix. This script builds that control:
the two fused DFT-shaped bf16x3 matmuls (mxufft.rfft_wide / irfft_wide,
the exact product kernels) over dummy data of the bench shape
(208 x 208 x 1024, the padded product grid), in three tiers:

  mm    — forward + inverse matmul only, final cube materialized;
  elem  — + the amp / atan2 / phase-increments elementwise epilogues
          (kept live by scalar sums);
  full  — + the REAL publish reductions over the temporaries
          (masked_mean_stack ROI matmuls, masked_pixel_mean means,
          intensity image, pixel gathers) — the lean program's output
          set without the chain plumbing.

Timing discipline per CLAUDE.md: N >= 40 async dispatches with a traced
epsilon nudged per dispatch (no caching), ONE completion barrier; plus
XLA cost-analysis FLOPs / bytes for a like-for-like roofline against the
chain's 169 GFLOP / 1.99 GB.

Verdict (measured 2026-08-19 on the real v5e, this script, n=60 x 3
windows, spread < 1%):
  mm   3.59 ms  (181.9 GFLOP, 0.77 GB accessed)
  elem 4.02 ms  (182.1 GFLOP, 1.31 GB)
  full 5.21 ms  (183.0 GFLOP, 2.15 GB)
vs the product's merged lean program: judge-measured 5.15 ms / 1.99 GB
at 200x200x1024, 5.83 ms on this same padded 208 grid. The control's
`full` tier reproduces the product program's cost within ~0.6 ms — the
README's old 3.6-4.0 ms "floor" was the `mm` tier only: the elementwise
spectral epilogues (+0.43 ms) and the publish reductions' extra HBM
traffic (+1.19 ms, 0.85 GB more accessed) are REAL work the product
output set requires, not program fat. The floor model is corrected in
the README; the remaining ~0.6 ms product-vs-control delta is the chain
plumbing the control omits (folded TD/FD weight vectors, optical
properties, raw-slot publish slices, roi_trace on the time cube).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/control_floor.py
Prints one JSON line.
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

X, Y, T = 208, 208, 1024
M = T // 2 + 1
R = 4
N_DISPATCH = 60


def build():
    from thz_image_explorer_tpu.ops import mxufft
    from thz_image_explorer_tpu.ops.fourier import phase_increments
    from thz_image_explorer_tpu.ops.intensity import intensity_image
    from thz_image_explorer_tpu.ops.roi import masked_mean_stack
    from thz_image_explorer_tpu.data import masked_pixel_mean

    @partial(jax.jit, static_argnames=("mode",))
    def control(x, masks, valid_wh, eps, *, mode):
        x = x * (1.0 + eps)
        spec = mxufft.rfft_wide(x)  # (X, Y, 2m) wide [real | imag]
        out = {}
        if mode != "mm":
            m = spec.shape[-1] // 2
            yr, yi = spec[..., :m], spec[..., m:]
            amp = jnp.sqrt(yr * yr + yi * yi)
            inc = phase_increments(jnp.arctan2(yi, yr))
        data = mxufft.irfft_wide(spec, x.shape[-1])  # (X, Y, T)
        out["data"] = data
        if mode == "elem":
            # keep the elementwise temporaries live without the full
            # reduction set (scalar sums are the cheapest consumers)
            out["amp_s"] = amp.sum()
            out["inc_s"] = inc.sum()
        elif mode == "full":
            out["roi_amp"] = masked_mean_stack(amp, masks)
            out["roi_ph"] = masked_mean_stack(inc, masks)
            out["roi_tr"] = masked_mean_stack(data, masks)
            out["avg_amp"] = masked_pixel_mean(amp, valid_wh)
            out["avg_ph"] = masked_pixel_mean(inc, valid_wh)
            out["avg_fft"] = masked_pixel_mean(spec, valid_wh)
            out["image"] = intensity_image(data)
            out["px"] = data[11, 13]
            out["pa"] = amp[11, 13]
            out["pp"] = inc[11, 13]
        return out

    return control


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((X, Y, T)).astype(np.float32))
    masks_np = np.zeros((R, X, Y), np.float32)
    for r in range(R):  # realistic sparse polygons
        masks_np[r, 10 + 20 * r : 60 + 20 * r, 15 : 70 + 10 * r] = 1.0
    masks = jnp.asarray(masks_np)
    vwh = jnp.asarray([200, 200], jnp.int32)
    control = build()
    _sum = jax.jit(jnp.sum)

    result = {"shape": f"{X}x{Y}x{T}", "n_dispatch": N_DISPATCH}
    for mode in ("mm", "elem", "full"):
        f = lambda i: control(  # noqa: E731
            x, masks, vwh, np.float32(1e-6 * i), mode=mode
        )
        r0 = f(0)
        float(_sum(r0["data"]))  # compile + settle, one barrier
        windows = []
        for w in range(3):
            t0 = time.perf_counter()
            last = None
            for i in range(1, N_DISPATCH + 1):
                last = f(w * N_DISPATCH + i)
            float(_sum(last["data"]))  # ONE barrier for the window
            windows.append((time.perf_counter() - t0) / N_DISPATCH)
        result[f"{mode}_ms"] = round(min(windows) * 1e3, 3)
        result[f"{mode}_ms_windows"] = [round(v * 1e3, 3) for v in windows]
        try:
            lowered = jax.jit(
                lambda x, m, v, e: control(x, m, v, e, mode=mode)
            ).lower(x, masks, vwh, np.float32(0.0))
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            result[f"{mode}_gflop"] = round(ca.get("flops", 0.0) / 1e9, 2)
            result[f"{mode}_gb"] = round(
                ca.get("bytes accessed", 0.0) / 1e9, 3
            )
        except Exception as e:  # noqa: BLE001
            result[f"{mode}_cost_error"] = str(e)[:80]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
