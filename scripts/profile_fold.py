#!/usr/bin/env python
"""A/B the lean-chain DFT-matrix fold (THZ_FOLD_FD) on the real TPU.

Times the benchmark lean step (parallel/step.lean_update — the merged
chain+publish program of the headline metric) with the window/FD-weight
fold ON vs OFF at the 200x200x1024 bench shape, and reports each
variant's XLA cost analysis (bytes accessed, FLOPs) from the AOT-lowered
program, so the wall-clock delta can be checked against the predicted
HBM-traffic delta (~3x164 MB of windowed-cube + masked-spectrum passes).

Run: PYTHONPATH=/root/repo python scripts/profile_fold.py
Prints one JSON line. Timing amortizes ONE completion barrier over 40
dispatches (CLAUDE.md timing rule).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    if "--small" in sys.argv:
        # genuine offline smoke: the JAX_PLATFORMS env var is overridden
        # by the axon sitecustomize (CLAUDE.md) — pin before first use
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig,
        StepParams,
        lean_update,
        lean_update_lowered,
    )
    from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    small = "--small" in sys.argv  # CPU smoke: tiny shape, 4 dispatches
    W, H, T = (32, 30, 128) if small else (200, 200, 1024)
    reps = 4 if small else 40
    rng = np.random.default_rng(0)
    t = (np.arange(T) * 0.05).astype(np.float32)
    pulse = np.exp(-((t - 8.0) ** 2) / 0.6) * np.sin(2 * np.pi * (t - 8.0))
    data = (
        pulse[None, None, :] * rng.uniform(0.3, 1.0, (W, H, 1))
    ).astype(np.float32)
    cube = make_cube(jnp.asarray(t), jnp.asarray(data), dx=0.5, dy=0.5)
    jax.block_until_ready(cube.data)

    params = StepParams.defaults()
    cfg = StepConfig(fd_active=True, notch_active=True)
    masks = np.zeros((4, W, H), np.float32)
    masks[0, 20:60, 20:60] = 1.0
    masks_d = jnp.asarray(masks)
    pix = jnp.asarray([100, 100], jnp.int32)
    _sum = jax.jit(jnp.sum)

    out = {}
    for flag, label in (("1", "fold"), ("0", "mask_passes")):
        os.environ["THZ_FOLD_FD"] = flag
        lowered = lean_update_lowered(cube, params, cfg, masks_d, pix)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # per-device list on some jax
            ca = ca[0]
        out[f"{label}_bytes_gb"] = round(
            float(ca.get("bytes accessed", 0.0)) / 1e9, 3
        )
        out[f"{label}_gflops"] = round(float(ca.get("flops", 0.0)) / 1e9, 1)

        r = lean_update(cube, params, cfg, masks_d, pix)  # warm/compile
        float(_sum(r["data"]))
        best = None
        for _w in range(1 if small else 3):
            t0 = time.perf_counter()
            for _i in range(reps):
                r = lean_update(cube, params, cfg, masks_d, pix)
            float(_sum(r["data"]))
            dt = (time.perf_counter() - t0) / reps
            best = dt if best is None else min(best, dt)
        out[f"{label}_ms"] = round(best * 1e3, 3)
    os.environ.pop("THZ_FOLD_FD", None)
    out["speedup"] = round(out["mask_passes_ms"] / out["fold_ms"], 3)
    out["note"] = (
        "fold = window + FD weights folded into the DFT matrices "
        "(THZ_FOLD_FD=1, default); mask_passes = cube-sized window "
        "multiply + FD mask passes (=0); same published values "
        "(tests/test_lean_publish.py::test_fold_fd_toggle_equivalent)"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
