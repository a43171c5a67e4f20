#!/usr/bin/env python
"""A/B of the one-pass spectral-reduction kernel (ops/pallas_specred).

Times the bench-shaped lean program (200x200x1024, FD band-pass + notch
active, 4 ROI masks) with THZ_SPECRED=1 (pallas kernel over the raw
spectrum) vs =0 (XLA mask-matmul reductions over materialized amp /
increment cubes), reports XLA bytes-accessed for both, and checks the
published reductions agree.

Timing follows the repo rules: best-of-3 windows of 80 back-to-back
dispatches sharing ONE completion barrier (the ~30 ms tunnel RTT
amortizes to <0.4 ms; scripts/micro_matmul.py calibration).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_specred.py
Prints one JSON line.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    sys.argv = ["bench"]
    import bench

    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig,
        StepParams,
        lean_update,
        lean_update_lowered,
    )

    t, data = bench._make_data()
    cube = make_cube(jnp.asarray(t), jnp.asarray(data), dx=0.5, dy=0.5)
    params = StepParams.defaults()
    cfg = StepConfig(
        fd_active=True, notch_active=True,
        td_before_active=True, td_after_active=True,
    )
    masks = np.zeros((4, 200, 200), np.float32)
    masks[0, 20:60, 20:60] = 1.0
    masks_d = jnp.asarray(masks)
    pix = jnp.asarray([17, 23], jnp.int32)
    _sum = jax.jit(jnp.sum)

    out = {}

    def run(flag, label):
        os.environ["THZ_SPECRED"] = flag
        r = lean_update(cube, params, cfg, masks_d, pix)
        float(_sum(r["img"]))  # compile + warm
        best = None
        p = params
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(80):
                p = dataclasses.replace(
                    p, fd_low=np.float32(0.3 + 0.0005 * (w * 80 + i))
                )
                r = lean_update(cube, p, cfg, masks_d, pix)
            float(_sum(r["img"]))
            dt = (time.perf_counter() - t0) / 80
            best = dt if best is None else min(best, dt)
        ca = lean_update_lowered(
            cube, params, cfg, masks_d, pix
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out[f"{label}_ms"] = round(best * 1e3, 3)
        out[f"{label}_bytes_gb"] = round(
            float(ca.get("bytes accessed", 0)) / 1e9, 3
        )
        print(f"# {label}: {out[f'{label}_ms']} ms, "
              f"{out[f'{label}_bytes_gb']} GB", file=sys.stderr, flush=True)
        return r

    a = run("1", "specred")
    b = run("0", "xla_reductions")
    errs = {}
    # complex64 d2h fails on this runtime (CLAUDE.md) — diff on device,
    # transfer one f32 scalar per key
    _maxdiff = jax.jit(lambda u, v: jnp.max(jnp.abs(u - v)))
    for k in ("avg_fft", "avg_amp", "avg_ph", "roi_amp", "roi_ph"):
        errs[k] = float(_maxdiff(a[k], b[k]))
    out["max_abs_diff"] = errs
    out["speedup"] = round(out["xla_reductions_ms"] / out["specred_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
