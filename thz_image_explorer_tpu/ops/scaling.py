"""Spatial downscaling of the scan cube by block averaging.

Equivalent of ``scaling()`` (``/root/reference/src/math_tools.rs:242-310``)
as a reshape-mean: crop to a multiple of the scale factor, reshape
``(X/s, s, Y/s, s, T)`` and average axes 1 and 3. Because the reference's
block loop never reads out of bounds for ``nx < W/s`` (``math_tools.rs:283-
296``), the crop-reshape-mean reads exactly the same elements; results
are numerically equivalent up to f32 summation order (the reference
accumulates the s*s block sequentially, XLA's block sum makes no
ordering guarantee — last-ulp differences are possible).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from thz_image_explorer_tpu.data import ScanCube


def _block_mean(arr: jnp.ndarray, s: int) -> jnp.ndarray:
    x, y, t = arr.shape
    nx, ny = x // s, y // s
    cropped = arr[: nx * s, : ny * s, :]
    blocks = cropped.reshape(nx, s, ny, s, t)
    if jnp.issubdtype(arr.dtype, jnp.complexfloating):
        return blocks.sum(axis=(1, 3)) / (s * s)
    return blocks.sum(axis=(1, 3)) / jnp.asarray(s * s, arr.dtype)


@partial(jax.jit, static_argnames=("scale",))
def _scale_impl(cube: ScanCube, scale: int) -> ScanCube:
    """Downscale ``data``, ``amplitudes``, ``phases`` and ``fft`` by ``scale``.

    ``scale`` is static (changing it changes output shapes → recompile, same
    as the reference re-allocating). A no-op for ``scale <= 1`` or when the
    result would be empty (``math_tools.rs:244-256``).

    On a bucket-padded grid whose valid size is NOT a multiple of
    ``scale``, the boundary block mixes valid pixels with padded zeros and
    block-means to a NONZERO value outside the scaled valid region — that
    would break the padded-pixels-are-exactly-zero invariant
    ``masked_pixel_mean`` relies on (data.py) and corrupt every published
    average. Such blocks are explicitly zeroed (the reference crops to a
    multiple of ``scale``, so they don't exist there).
    """
    dx = cube.dx * scale if cube.dx is not None else None
    dy = cube.dy * scale if cube.dy is not None else None
    valid = jnp.maximum(cube.valid_wh // scale, 1)
    out = cube.replace(
        data=_block_mean(cube.data, scale),
        amplitudes=_block_mean(cube.amplitudes, scale),
        phases=_block_mean(cube.phases, scale),
        fft=_block_mean(cube.fft, scale),
        valid_wh=valid,
        dx=dx,
        dy=dy,
        scaling=scale,
    )
    nx, ny = out.data.shape[0], out.data.shape[1]
    w = jnp.arange(nx, dtype=jnp.int32)[:, None] < valid[0]
    h = jnp.arange(ny, dtype=jnp.int32)[None, :] < valid[1]
    m = (w & h)[:, :, None]
    return out.replace(
        data=jnp.where(m, out.data, 0.0),
        amplitudes=jnp.where(m, out.amplitudes, 0.0),
        phases=jnp.where(m, out.phases, 0.0),
        fft=jnp.where(m, out.fft, 0.0),
    )


def scale_cube(cube: ScanCube, scale: int, valid_wh=None) -> ScanCube:
    """Public entry: no-op (same object) for ``scale <= 1`` or when the
    result would be empty; otherwise one jitted block-mean program.

    ``valid_wh`` is the host-known TRUE scan size of a bucket-padded
    grid: the no-op check must use it (the reference no-ops on true
    ``width // scale == 0``, ``math_tools.rs:244-256``) — otherwise a
    valid region smaller than the scale factor on a large-enough padded
    grid would publish a zero-diluted boundary-block mean."""
    if scale <= 1:
        return cube
    if cube.width // scale == 0 or cube.height // scale == 0:
        return cube
    if valid_wh is not None and (
        valid_wh[0] // scale == 0 or valid_wh[1] // scale == 0
    ):
        return cube
    return _scale_impl(cube, scale)
