"""Recorded DEAD END: folding the valid-region pixel means into the ROI
mask-matmuls as an extra all-ones row.

Hypothesis (round 4, 2026-08-18): in the lean program each published
valid-region mean (`masked_pixel_mean` over the amplitude, phase-
increment and data cubes, plus the complex spectrum mean) looked like a
SECOND full HBM pass over a cube the ROI `masked_mean_stack` einsum had
just read as a matmul operand — ~3 x 164 MB of savings at the bench
shape if the means could share the einsum's read by riding along as one
extra all-ones mask row (exact math: padded pixels are zero through the
whole chain, so the ones-row total over the padded grid equals the
valid-region total after rescaling the denominator).

Measured on the real v5e (this script, same chip minutes apart, stash
A/B at commit cb91f11; 40-dispatch windows, best of 3):

  step/bench seam (lean_update, bench cfg, 200x200x1024, 4 masks):
    pre-fold  5.446 ms / 1.993 GB cost-analysis bytes
    post-fold 5.201 ms / 2.200 GB   -> time within the +-0.3 ms session
    noise (bench.py the same morning measured 5.166 pre-fold), model
    bytes UP 0.21 GB
  PRODUCT seam (bench_explorer, 208x208 padded grid):
    pre-fold  5.842 ms device (bench.py same morning: 5.862)
    post-fold 6.223 ms device   -> ~0.4 ms REGRESSION

Conclusion: XLA already multi-output-fuses the standalone pixel-mean
reduces with the cubes' producer fusions (and the spectrum mean as a
dot epilogue) — they were NOT second passes. Forcing them through the
mask-matmul row space instead breaks that fusion and pushes the means
onto the MXU operand path. The fold was reverted; the lean program
keeps `masked_pixel_mean` + the final-slot avg leaves as-is. Kept as a
runnable probe of the lean program's bytes/ms at the bench config.

Run ON the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_foldmeans.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from thz_image_explorer_tpu.data import make_cube
from thz_image_explorer_tpu.parallel.step import (
    StepConfig,
    StepParams,
    lean_update,
    lean_update_lowered,
)

X, Y, T, R = 200, 200, 1024, 4
WINDOW = 40  # dispatches per timed window (amortize ONE barrier RTT)


def main():
    rng = np.random.default_rng(0)
    t = np.linspace(0.0, 100.0, T).astype(np.float32)
    data = rng.standard_normal((X, Y, T), np.float32)
    cube = make_cube(t, data, dx=0.5, dy=0.5)
    params = StepParams.defaults()
    # the bench.py headline config (bench_tpu)
    cfg = StepConfig(
        fd_active=True,
        notch_active=True,
        td_before_active=True,
        td_after_active=True,
        avg_in_fourier_space=False,
    )
    masks = np.zeros((R, X, Y), np.float32)
    masks[0, 20:80, 20:80] = 1.0
    masks[1, 100:150, 40:90] = 1.0  # rows 2-3 stay zero (provider minimum)
    masks_d = jnp.asarray(masks)
    pix = jnp.asarray([50, 60], jnp.int32)

    low = lean_update_lowered(cube, params, cfg, masks_d, pix)
    cost = low.compile().cost_analysis()
    gb = float(cost.get("bytes accessed", 0.0)) / 1e9
    flops = float(cost.get("flops", 0.0)) / 1e9

    out = lean_update(cube, params, cfg, masks_d, pix)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(WINDOW):
            out = lean_update(cube, params, cfg, masks_d, pix)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / WINDOW)
    print(
        {
            "update_ms": round(best * 1e3, 3),
            "bytes_accessed_gb": round(gb, 3),
            "gflop": round(flops, 1),
            "shape": f"{X}x{Y}x{T}",
            "rois": R,
        }
    )


if __name__ == "__main__":
    main()
