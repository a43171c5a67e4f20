#!/usr/bin/env python
"""Measure the deconvolution RL inner loop: XLA banded-matmul scan (the
production path) vs alternatives, at the REAL band geometry (psf.npz,
200x200x1024 cube, reference defaults: 25 bands x <=500 RL iters).

Breakdown method: run `_gains_chunk` with the true per-band iteration
counts and with all-zero counts; the difference isolates the RL loop from
the energy images / padding / cropping around it.

Usage: python scripts/profile_pallas.py
Prints one JSON line with the measured ms per phase.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def barrier(x):
    import jax
    import jax.numpy as jnp

    return float(jax.jit(jnp.sum)(x))


def timeit(fn, n=5):
    fn()  # compile/warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax.numpy as jnp

    from thz_image_explorer_tpu.io import load_psf
    from thz_image_explorer_tpu.ops.deconvolution import (
        DeconvolutionParams,
        deconvolve_cube,
        plan_bands,
    )
    from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()

    rng = np.random.default_rng(0)
    t = (np.arange(1024) * 0.05).astype(np.float32)
    pulse = np.exp(-((t - 8.0) ** 2) / 0.6) * np.sin(2 * np.pi * (t - 8.0))
    data = (
        pulse[None, None, :] * rng.uniform(0.3, 1.0, (200, 200, 1))
        + 0.01 * rng.normal(size=(200, 200, 1024))
    ).astype(np.float32)

    psf = load_psf("/root/reference/sample_data/psf.npz")
    geo = plan_bands(DeconvolutionParams(), psf, t, (200, 200), 0.5, 0.5)
    cube = jnp.asarray(data)

    out = {}
    out["full_deconv_scan_ms"] = timeit(
        lambda: barrier(deconvolve_cube(cube, geo, chunk_size=25,
                                        rl_impl="scan"))
    )
    try:
        ref = np.asarray(deconvolve_cube(cube, geo, chunk_size=25,
                                         rl_impl="scan"))
        pal = np.asarray(deconvolve_cube(cube, geo, chunk_size=25,
                                         rl_impl="pallas"))
        m = np.isfinite(ref) & np.isfinite(pal)
        err = float(np.max(np.abs(ref[m] - pal[m]) /
                           (np.abs(ref[m]) + 1e-3)))
        out["pallas_vs_scan_relerr"] = err
        out["full_deconv_pallas_ms"] = timeit(
            lambda: barrier(deconvolve_cube(cube, geo, chunk_size=25,
                                            rl_impl="pallas"))
        )
    except Exception as e:  # noqa: BLE001
        out["pallas_error"] = str(e)[:200]
    out["full_deconv_ms"] = out.get("full_deconv_pallas_ms",
                                    out["full_deconv_scan_ms"])

    # zero-iteration geometry: same program, RL trip count 0
    import copy

    geo0 = copy.copy(geo)
    geo0.n_iter = np.zeros_like(geo.n_iter)
    geo0._device_chunks = {}
    out["deconv_no_rl_ms"] = timeit(
        lambda: barrier(deconvolve_cube(cube, geo0, chunk_size=25))
    )
    out["rl_only_ms"] = round(out["full_deconv_ms"] - out["deconv_no_rl_ms"], 2)
    out["sum_n_iter"] = int(geo.n_iter.sum())
    out["max_n_iter"] = int(geo.n_iter.max())
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
