"""Tilt compensation: per-pixel time shifts for misaligned samples.

Equivalent of ``/root/reference/src/filters/tilt_compensation.rs:97-226``.
The reference extends the time axis symmetrically and inserts each pixel's
(adapted-Blackman-windowed) trace at a per-pixel offset. Under XLA the
extension length must be static: it is computed on the host from the tilt
parameters (recompiling only when the *extension step count* changes —
the analogue of the reference's FFT re-planning), while the per-pixel
shifts stay traced and become one batched gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from thz_image_explorer_tpu.data import ScanCube
from thz_image_explorer_tpu.ops.windows import adapted_blackman_window

C_MM_PER_PS = 0.299792458  # speed of light (tilt_compensation.rs:119)
DT_PS = 0.05  # hard-coded extension step (tilt_compensation.rs:122)


def extension_steps(
    width: int, height: int, dx: float, dy: float, tilt_x_deg: float, tilt_y_deg: float
) -> int:
    """Host-side extension step count (``tilt_compensation.rs:104-143``)."""
    tsx = np.float32(tilt_x_deg) / 180.0 * np.pi
    tsy = np.float32(tilt_y_deg) / 180.0 * np.pi
    center_x = np.float32(width) / 2.0 * np.float32(dx)
    center_y = np.float32(height) / 2.0 * np.float32(dy)
    max_off_x = np.float32(float(center_x) * abs(float(tsx)) / C_MM_PER_PS)
    max_off_y = np.float32(float(center_y) * abs(float(tsy)) / C_MM_PER_PS)
    extension = np.float32(
        np.floor((max_off_x + max_off_y) / np.float32(DT_PS)) * np.float32(DT_PS)
    )
    return int(np.round(extension / np.float32(DT_PS)))


@partial(jax.jit, static_argnames=("num_steps",))
def _tilt_kernel(data, time, valid_wh, tilt_x_deg, tilt_y_deg, dx, dy,
                 num_steps: int):
    width, height, n_time = data.shape
    tsx = tilt_x_deg / 180.0 * jnp.pi
    tsy = tilt_y_deg / 180.0 * jnp.pi

    extension = num_steps * DT_PS
    first, last = time[0], time[-1]
    if num_steps > 0:
        front = jnp.linspace(first - extension, first - DT_PS, num_steps)
        back = jnp.linspace(last + DT_PS, last + extension, num_steps)
        new_time = jnp.concatenate([front, time, back]).astype(time.dtype)
    else:
        new_time = time
    ext_t = n_time + 2 * num_steps

    # per-pixel shift in ps -> discrete steps (tilt_compensation.rs:156-175).
    # The tilt center is the TRUE scan center (``valid_wh``, traced), not
    # the bucket-padded grid's — the reference uses the real scan dims
    # (tilt_compensation.rs:104-143), so output must not depend on
    # THZ_SHAPE_BUCKET. Padded pixels are zero and stay zero (zero
    # head-fill below), whatever shift they get.
    vw = valid_wh[0].astype(jnp.float32)
    vh = valid_wh[1].astype(jnp.float32)
    i = jnp.arange(width, dtype=jnp.float32)[:, None]
    j = jnp.arange(height, dtype=jnp.float32)[None, :]
    x_off = (i - vw / 2.0) * dx * tsx / C_MM_PER_PS
    y_off = (j - vh / 2.0) * dy * tsy / C_MM_PER_PS
    delta_steps = jnp.floor((x_off + y_off) / DT_PS).astype(jnp.int32)
    insert = jnp.maximum(num_steps + delta_steps, 0)  # (W, H)

    # window the trace (bounds [0, 7] ps, tilt_compensation.rs:188),
    # head-fill with the *raw* first sample, tail zeros
    win = adapted_blackman_window(time, 0.0, 7.0).astype(data.dtype)
    wdata = data * win

    k = jnp.arange(ext_t)[None, None, :]
    idx = k - insert[:, :, None]
    gathered = jnp.take_along_axis(
        wdata, jnp.clip(idx, 0, n_time - 1), axis=2
    )
    out = jnp.where(
        idx < 0,
        data[:, :, :1],
        jnp.where(idx < n_time, gathered, jnp.asarray(0.0, data.dtype)),
    )
    return out, new_time


def tilt_compensate(
    cube: ScanCube,
    tilt_x_deg: float,
    tilt_y_deg: float,
    valid_wh=None,
) -> ScanCube:
    """Apply tilt compensation; a no-op when dx/dy are unknown
    (``tilt_compensation.rs:111``). ``valid_wh`` is the host-known true
    scan size of a bucket-padded cube — the geometry (tilt center, time
    extension) is derived from it, never from the padded grid."""
    if cube.dx is None or cube.dy is None:
        return cube
    vw, vh = valid_wh if valid_wh is not None else (cube.width, cube.height)
    num_steps = extension_steps(
        vw, vh, cube.dx, cube.dy, tilt_x_deg, tilt_y_deg
    )
    data, new_time = _tilt_kernel(
        cube.data,
        cube.time,
        cube.valid_wh,
        np.float32(tilt_x_deg),
        np.float32(tilt_y_deg),
        np.float32(cube.dx),
        np.float32(cube.dy),
        num_steps,
    )
    return cube.replace(data=data, time=new_time)
