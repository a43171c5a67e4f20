"""Synthetic dotTHz sample generator.

The reference's ``sample_data/*.thzimg`` are git-LFS pointer stubs in this
checkout, so integration tests use synthetic files written in the same
HDF5 layout (first group, 1-D time dataset + 3-D cube dataset, string
metadata attrs — see ``io.rs:496-631``).
"""

from __future__ import annotations

import numpy as np
import h5py


def synthetic_scan(
    width=24, height=20, n_time=256, dt=0.05, seed=0, with_sample_disc=True
):
    """A plausible THz-TDS scan: per-pixel pulse with position-dependent
    amplitude/delay plus noise. Returns (time, cube)."""
    rng = np.random.default_rng(seed)
    t = (np.arange(n_time) * dt).astype(np.float32)  # ps
    xx, yy = np.meshgrid(np.arange(width), np.arange(height), indexing="ij")
    amp = 0.6 + 0.4 * np.exp(
        -(((xx - width / 2) ** 2 + (yy - height / 2) ** 2) / (width * height / 8))
    )
    if with_sample_disc:
        disc = ((xx - width / 2) ** 2 + (yy - height / 2) ** 2) < (width / 4) ** 2
        amp = np.where(disc, amp * 0.5, amp)
    delay = 3.0 + 0.02 * xx
    t0 = delay[..., None]
    carrier = np.sin(2 * np.pi * 1.0 * (t[None, None, :] - t0))
    envelope = np.exp(-((t[None, None, :] - t0) ** 2) / 0.5)
    cube = amp[..., None] * envelope * carrier
    cube = cube + 0.01 * rng.normal(size=cube.shape)
    cube = cube + 0.03  # DC bias, removed by the loader
    return t, cube.astype(np.float32)


def write_scan_thz(path, time, cube, dx=0.5, dy=0.5, x_min=0.0, y_min=0.0,
                   extra_md=None):
    width, height, _ = cube.shape
    with h5py.File(path, "w") as f:
        g = f.create_group("Image")
        g.attrs["description"] = "synthetic test scan"
        g.attrs["date"] = "2026-01-01"
        g.attrs["time"] = "00:00:00"
        g.attrs["instrument"] = "synthetic"
        g.attrs["mode"] = "THz-TDS/Transmission"
        g.attrs["thzVer"] = "1.00"
        g.attrs["user"] = "///"
        md = {
            "width": str(width),
            "height": str(height),
            "dx [mm]": str(dx),
            "dy [mm]": str(dy),
            "x_min [mm]": str(x_min),
            "y_min [mm]": str(y_min),
        }
        md.update(extra_md or {})
        g.attrs["mdDescription"] = ",".join(md.keys())
        for i, v in enumerate(md.values()):
            g.attrs[f"md{i + 1}"] = v
        g.attrs["dsDescription"] = "time,dataset"
        g.create_dataset("ds1", data=np.asarray(time, np.float32))
        g.create_dataset("ds2", data=np.asarray(cube, np.float32))
    return path


def write_pulse_thz(path, time, signal):
    with h5py.File(path, "w") as f:
        g = f.create_group("Reference")
        g.attrs["description"] = "synthetic reference pulse"
        g.attrs["dsDescription"] = "reference"
        arr = np.stack([time, signal], axis=1).astype(np.float32)
        g.create_dataset("ds1", data=arr)
    return path
