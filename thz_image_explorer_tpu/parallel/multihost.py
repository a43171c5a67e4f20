"""Multi-host (DCN) input pipeline: per-process partial scan reads.

On a multi-host mesh, loading the whole cube on every host and then
resharding would move the full scan over DCN once per host. Instead each
process reads ONLY the pixel block its local devices own straight out of
the dotTHz HDF5 file (h5py partial reads — the file on a shared
filesystem is the distribution medium), zero-fills its part of the
bucket padding, and the global sharded cube is assembled with
``jax.make_array_from_single_device_arrays`` — no cross-host array
movement at all. DC-offset subtraction and the intensity image then run
as ONE sharded SPMD program (both are per-pixel local, so no collectives
until the pipeline's mean/ROI reductions).

The reference is single-host (SURVEY.md §2.7 — rayon pixel parallelism);
this is the TPU-native scale-out of its loader
(``/root/reference/src/io.rs:496-631``), keeping that loader's semantics:
first group, first 1-D dataset = time, first 3-D dataset = cube, DC
offset from sample 0, bucket-padded pixel grid with the true size riding
the cube as ``valid_wh``.

Exercised for real by ``tests/test_multihost.py``: two coordinated CPU
processes (``jax.distributed`` + gloo collectives) load disjoint halves
of one scan and run the sharded update step; every published reduction
matches the single-process loader bit-for-bit shape-wise and to float
tolerance value-wise. The same entry point also works single-process on
a local mesh (then it is simply a sharded-read ``open_scan``).
"""

from __future__ import annotations

import functools
from typing import Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from thz_image_explorer_tpu.data import ScanCube, _load_kernel, frequency_axis
from thz_image_explorer_tpu.io.dotthz import (
    DotthzMetadata,
    _first_group,
    _shape_bucket,
    read_group_metadata,
)
from thz_image_explorer_tpu.parallel.mesh import cube_sharding


@functools.lru_cache(maxsize=64)
def _zeros_program(shape, dtype, sharding):
    """One compiled allocation program per (shape, dtype, sharding) —
    a fresh ``jit(lambda ...)`` per call would recompile on every scan
    open (jit caches on the function object; cf. data.device_zeros)."""
    return jax.jit(functools.partial(jnp.zeros, shape, dtype),
                   out_shardings=sharding)


def _locate_datasets(group: h5py.Group) -> tuple[Optional[str], Optional[str]]:
    """First 1-D dataset name (time) and first 3-D dataset name (cube) in
    sorted order — the reference's selection rule (``io.rs:520-543``)."""
    time_name = data_name = None
    for name in sorted(group.keys()):
        d = group[name]
        if not isinstance(d, h5py.Dataset):
            continue
        if time_name is None and d.ndim == 1:
            time_name = name
        if data_name is None and d.ndim == 3:
            data_name = name
    return time_name, data_name


def open_scan_sharded(
    path: str, mesh: Mesh
) -> tuple[ScanCube, jax.Array, DotthzMetadata]:
    """Open a scan as a globally-sharded cube with per-process partial
    reads; returns ``(cube, intensity_image, metadata)``.

    The intensity image is a *sharded device array* over the padded grid
    (crop to ``cube.valid_wh`` for display); unlike
    :func:`thz_image_explorer_tpu.io.dotthz.open_scan` it is not pulled
    to the host here — on a multi-host mesh no single process can
    address all of it.
    """
    sh = cube_sharding(mesh)
    grid3 = sh["data"]
    proc = jax.process_index()

    with h5py.File(path, "r") as f:
        gname = _first_group(f)
        if gname is None:
            raise ValueError(f"no groups in {path}")
        group = f[gname]
        metadata = read_group_metadata(group)
        time_name, data_name = _locate_datasets(group)
        if time_name is None or data_name is None:
            raise ValueError(
                "multi-host loader needs a 1-D time and a 3-D cube dataset "
                f"(single-pulse files go through open_scan): {path}"
            )
        time = np.asarray(group[time_name][()], np.float32)
        dset = group[data_name]
        vw, vh, n_time = dset.shape
        if vw * vh == 1:
            # a 1x1 "cube" has no pixel grid to distribute (open_scan pins
            # it to bucket 1); a size-1 axis cannot shard over the mesh
            raise ValueError(
                "multi-host loader needs a real pixel grid "
                f"(got a 1x1 cube — use open_scan): {path}"
            )

        def _meta_int(key):
            try:
                return int(metadata.md[key])
            except (KeyError, ValueError):
                return None

        width, height = _meta_int("width"), _meta_int("height")
        reshaped = None
        if (
            width is not None
            and height is not None
            and (vw, vh) != (width, height)
            and width * height == vw * vh
        ):
            # metadata-driven reshape (io.rs metadata wins): the on-disk
            # row layout no longer matches the pixel grid, so a partial
            # row read is impossible — degrade to a full read + reshape
            # on every process (rare: disagreeing metadata)
            reshaped = np.asarray(dset[()], np.float32).reshape(
                width, height, n_time
            )
            vw, vh = width, height

        b = max(_shape_bucket(), 1)
        pw, ph = -(-vw // b) * b, -(-vh // b) * b

        global_shape = (pw, ph, n_time)
        imap = grid3.devices_indices_map(global_shape)
        arrs = []
        for dev, idx in imap.items():
            if dev.process_index != proc:
                continue
            xs, ys, _ = idx
            x0 = xs.start or 0
            x1 = pw if xs.stop is None else xs.stop
            y0 = ys.start or 0
            y1 = ph if ys.stop is None else ys.stop
            block = np.zeros((x1 - x0, y1 - y0, n_time), np.float32)
            rx1, ry1 = min(x1, vw), min(y1, vh)
            if rx1 > x0 and ry1 > y0:
                src = (
                    reshaped[x0:rx1, y0:ry1, :]
                    if reshaped is not None
                    else dset[x0:rx1, y0:ry1, :]
                )
                block[: rx1 - x0, : ry1 - y0] = src
            arrs.append(jax.device_put(block, dev))

    data_g = jax.make_array_from_single_device_arrays(
        global_shape, grid3, arrs
    )
    # DC offset + intensity as one sharded SPMD program (per-pixel local;
    # _load_kernel donates the raw cube — it is dead after this)
    data_g, img_g = _load_kernel(data_g)

    def _f(key):
        try:
            return float(metadata.md[key])
        except (KeyError, ValueError):
            return None

    nf = n_time // 2 + 1
    # the canonical parity-sensitive formula (io.rs:614-621) — evaluated
    # locally, then replicated below
    freq = np.asarray(frequency_axis(time))

    _zeros = lambda shape, dtype, sharding: _zeros_program(
        shape, dtype, sharding
    )()
    rep = sh["time"]
    # replicated host leaves: device_put with a process-spanning sharding
    # (every process passes the identical host value)
    cube = ScanCube(
        time=jax.device_put(time, rep),
        data=data_g,
        freq=jax.device_put(freq, rep),
        fft=_zeros((pw, ph, nf), np.complex64, sh["fft"]),
        amplitudes=_zeros((pw, ph, nf), np.float32, sh["amplitudes"]),
        phases=_zeros((pw, ph, nf), np.float32, sh["phases"]),
        avg_data=_zeros((n_time,), np.float32, rep),
        avg_fft=_zeros((nf,), np.complex64, rep),
        avg_signal_fft=_zeros((nf,), np.float32, rep),
        avg_phase_fft=_zeros((nf,), np.float32, rep),
        valid_wh=jax.device_put(np.asarray([vw, vh], np.int32), rep),
        dx=_f("dx [mm]"),
        dy=_f("dy [mm]"),
        x_min=_f("x_min [mm]"),
        y_min=_f("y_min [mm]"),
        scaling=1,
    )
    return cube, img_g, metadata
