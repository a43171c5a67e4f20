"""Device mesh over the pixel grid.

The reference's only parallelism is rayon data-parallelism over pixels
(SURVEY.md §2.7); its TPU-native equivalent is a 2-D ``jax.sharding.Mesh``
laid over the scan's ``(x, y)`` pixel grid. Every per-pixel transform
(window, rfft, band-pass masks, irfft, intensity) is embarrassingly
parallel across pixels, so the cube shards cleanly with the time/frequency
axis unsharded; the *only* collectives are the pixel-mean reductions in the
iFFT stage and ROI masked means — ``psum``s that XLA inserts automatically
and that ride ICI.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thz_image_explorer_tpu.data import ScanCube


def make_mesh(devices: Optional[list] = None, axis_names=("x", "y")) -> Mesh:
    """2-D mesh over the given devices (default: all), shaped as close to
    square as the device count allows so both pixel axes shard."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    a = int(math.sqrt(n))
    while n % a:
        a -= 1
    mesh_devices = np.asarray(devices).reshape(a, n // a)
    return Mesh(mesh_devices, axis_names)


def cube_sharding(mesh: Mesh) -> dict[str, NamedSharding]:
    """Shardings for each ScanCube array: pixel-grid arrays shard over
    ``(x, y)``, 1-D axes and means are replicated."""
    grid = NamedSharding(mesh, P("x", "y", None))
    rep1 = NamedSharding(mesh, P())
    return {
        "time": rep1,
        "data": grid,
        "freq": rep1,
        "fft": grid,
        "amplitudes": grid,
        "phases": grid,
        "avg_data": rep1,
        "avg_fft": rep1,
        "avg_signal_fft": rep1,
        "avg_phase_fft": rep1,
        "valid_wh": rep1,
    }


def shard_cube(cube: ScanCube, mesh: Mesh) -> ScanCube:
    """Place a cube onto the mesh with pixel-grid sharding."""
    sh = cube_sharding(mesh)
    return cube.replace(
        **{
            name: jax.device_put(getattr(cube, name), sharding)
            for name, sharding in sh.items()
        }
    )
