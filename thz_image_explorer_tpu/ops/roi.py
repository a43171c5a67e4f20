"""Polygon ROI masks and masked-mean reductions.

The reference rasterizes each ROI polygon per query with a ray cast and
averages pixels inside (``/root/reference/src/math_tools.rs:574-661``). The
TPU-native split: rasterize **once on the host** into a boolean mask (native
C, exact reference semantics — including the Rust release build's wrapping
``usize`` arithmetic, the x/y swap and the vertical flip), then compute ROI
traces on device as a masked mean (one small ``einsum`` — a ``psum`` over ICI
when the cube is sharded).
"""

from __future__ import annotations

import ctypes
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from thz_image_explorer_tpu import native

_M64 = 1 << 64


def _point_in_polygon_py(x: int, y: int, poly: list[tuple[int, int]]) -> bool:
    """Pure-Python fallback with u64 wrap-around semantics
    (``math_tools.rs:574-591``)."""
    inside = False
    j = len(poly) - 1
    for i in range(len(poly)):
        xi, yi = poly[i]
        xj, yj = poly[j]
        if (yi > y) != (yj > y):
            den = (yj - yi) % _M64
            t = (((xj - xi) % _M64) * ((y - yi) % _M64)) % _M64
            val = (t // den + xi) % _M64
            if x < val:
                inside = not inside
        j = i
    return inside


def polygon_mask(
    polygon: list[tuple[int, int]],
    shape: tuple[int, int],
    scaling: int = 1,
) -> np.ndarray:
    """Boolean mask over the data grid for a polygon ROI.

    ``shape`` is ``data.shape[:2]``; ``mask[y_size-1-y, x]`` is set for
    in-polygon pixels, reproducing ``average_polygon_roi``'s swapped/flipped
    indexing (``math_tools.rs:611-648``). Polygon coords are divided by
    ``scaling`` with integer division first (``math_tools.rs:604-609``).
    """
    shape0, shape1 = int(shape[0]), int(shape[1])
    mask = np.zeros((shape0, shape1), np.uint8)
    if not polygon or shape0 == 0 or shape1 == 0:
        return mask.astype(bool)

    lib = native.load()
    if lib is not None:
        n = len(polygon)
        px = (ctypes.c_uint64 * n)(*[int(p[0]) % _M64 for p in polygon])
        py = (ctypes.c_uint64 * n)(*[int(p[1]) % _M64 for p in polygon])
        count = lib.thz_polygon_mask(
            px,
            py,
            n,
            shape0,
            shape1,
            int(scaling),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if count >= 0:
            return mask.astype(bool)

    # Pure-Python fallback, identical semantics — including the u64 wrap
    # of negative coordinates (a vertex dragged past the image edge wraps
    # to ~2^64 in the Rust release build, so the min/max clamp below pins
    # it to size-1 instead of indexing out of bounds; the C path and
    # math_tools.rs:604-609 divide the WRAPPED value).
    if int(scaling) == 0:
        # the C path guards scaling==0 with an empty mask
        # (thznative.c:76); the fallback must not diverge into a
        # ZeroDivisionError on the same input
        return mask.astype(bool)
    poly = [
        ((int(x) % _M64) // int(scaling), (int(y) % _M64) // int(scaling))
        for x, y in polygon
    ]
    x_size, y_size = shape1, shape0
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    x_min = min(min(xs), x_size - 1)
    y_min = min(min(ys), y_size - 1)
    x_max = min(max(xs), x_size - 1)
    y_max = min(max(ys), y_size - 1)
    for y in range(y_min, y_max + 1):
        for x in range(x_min, x_max + 1):
            if _point_in_polygon_py(x, y, poly):
                mask[y_size - y - 1, x] = 1
    return mask.astype(bool)


def masked_mean_trace(data: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """ROI-averaged trace: mean over masked pixels for each t/f bin.

    Equivalent of the accumulation loop in ``average_polygon_roi``
    (``math_tools.rs:640-659``); an empty mask yields zeros, matching the
    reference's untouched zero result array. One-ROI view of
    :func:`masked_mean_stack` — a single source of truth for the
    masked-mean semantics.
    """
    return masked_mean_stack(data, mask[None])[0]


@jax.jit
def masked_mean_stack(arr: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Batched ROI means: ``(R, X, Y)`` masks x ``(X, Y, T)`` array ->
    ``(R, T)``; empty masks yield zeros. The canonical masked-mean used by
    the publish program and tests.

    HIGHEST precision: at the default the TPU MXU rounds the OPERANDS to
    bf16, costing ~3e-3 rad on ROI mean phases (measured against a
    HIGH-precision dot at the bench shape, 2026-08-18 /tmp/probe_wide.py
    run) — these means feed the optical-property phase differences. The
    einsum is ~0.2 GFLOP at the bench shape, so exactness here is free
    next to the chain's DFT matmuls."""
    m = masks.astype(arr.dtype)
    counts = jnp.sum(masks.astype(jnp.float32), axis=(1, 2))
    totals = jnp.einsum(
        "rxy,xyt->rt", m, arr, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.where(counts[:, None] > 0, totals / counts[:, None], 0.0)
