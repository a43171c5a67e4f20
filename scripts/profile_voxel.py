#!/usr/bin/env python
"""Voxel-extraction kernel measurements (threed_plot.rs equivalent) at the
bench cube size (200x200x1024 -> 41M voxels), on the attached TPU.

What was measured and why the production path looks the way it does
(v5e, 2026-08-16; timings include the ~30 ms tunnel round-trip):

  original (XLA conv + exact top_k)            ~207-220 ms
  -> top_k alone                               ~150 ms   (sort-bound)
  histogram threshold (two scanned passes)     replaces top_k at ~1/4096
                                               opacity precision
  XLA envelope + histogram threshold           86.9 ms  (~26 ms device)
  fused pallas envelope + histogram threshold  81.7 ms  (~21 ms device)
  (each run pays two ~30 ms tunnel round-trips: the opacity-sum barrier
  and the threshold readback; thresholds agree exactly, envelope maxerr
  6e-3 from the bf16 banded matrix — display-path only)

Round-4 (2026-08-17): the PRODUCT fetch comparison. The dense path's
honest end-to-end cost (164 MB opacity d2h + threshold read + host
np.nonzero harvest + subsample) measured 4633 ms at 41M voxels; the
device top-k compaction (approx_max_k, values+indices+threshold in ONE
device_get, ~1 MB) measured 104.8 ms — 44x. Breakdown (each number
includes one ~27 ms RTT): envelope+threshold 51.1 ms, +approx_max_k
67.7 ms, approx_max_k alone over 41M raw 33.9 ms.

Round-4 follow-up (scripts/probe_voxel_fetch.py): the product seam was
paying a hidden ~40 ms tap-kernel d2h (band-cache key read a device
array back) and 19.5 ms device for the two histogram-threshold passes;
with host-side taps and the cap threshold taken from the top-k tail
(f16 values), extract_instances_topk measured 63.6 ms wall (~34 ms of
it the tunnel RTT).

Run: python scripts/profile_voxel.py  (prints one JSON line)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from thz_image_explorer_tpu.ops.voxel import (
        gaussian_kernel1d,
        voxel_opacities,
    )
    from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(200, 200, 1024)).astype(np.float32))
    k = jnp.asarray(gaussian_kernel1d(3.0, 9))
    _sum = jax.jit(jnp.sum)

    def bench(impl):
        def run():
            o, t = voxel_opacities(
                data, k, np.float32(2.0), np.float32(0.1), 9, impl=impl
            )
            return float(_sum(o)) + float(t)

        run()
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        return round(float(np.median(ts)) * 1e3, 2)

    out = {"xla_ms": bench("xla")}

    # product seam (round-4): the live view's full fetch — dense path
    # (full 164 MB opacity volume d2h + threshold read + host np.nonzero
    # harvest + subsample) vs the single-transfer device top-k compaction
    # (~1 MB: values + indices + threshold in ONE device_get)
    from thz_image_explorer_tpu.ops.voxel import (
        extract_instances,
        extract_instances_topk,
    )

    def bench_wall(fn):
        fn()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(float(np.median(ts)) * 1e3, 2)

    kw = dict(time_span=51.2, scaling=1, original_dims=(200, 200, 1024),
              opacity_threshold=0.1, contrast=2.0, kernel_sigma=3.0,
              kernel_radius=9)
    out["dense_fetch_ms"] = bench_wall(
        lambda: extract_instances(data, **kw)
    )
    out["topk_fetch_ms"] = bench_wall(
        lambda: extract_instances_topk(data, max_points=120_000, **kw)
    )
    try:
        out["pallas_ms"] = bench("pallas")
        ox, tx = voxel_opacities(data, k, np.float32(2.0), np.float32(0.1),
                                 9, impl="xla")
        op, tp = voxel_opacities(data, k, np.float32(2.0), np.float32(0.1),
                                 9, impl="pallas")
        out["pallas_vs_xla_maxerr"] = float(
            jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(ox, op)
        )
        out["thr_xla"] = round(float(tx), 5)
        out["thr_pallas"] = round(float(tp), 5)
    except Exception as e:  # noqa: BLE001
        out["pallas_error"] = str(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
