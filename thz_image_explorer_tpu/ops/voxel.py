"""3-D voxel-view extraction: the fused envelope/threshold kernel.

Device-side equivalent of ``instance_from_data``
(``/root/reference/src/gui/threed_plot.rs:132-270``): square the traces,
convolve each with a 1-D Gaussian envelope raised to a contrast exponent,
min-max normalize each surviving trace, and derive the dynamic opacity
threshold that caps the view at 2 million instances. Everything up to the
sparse instance extraction is one jitted program; only the (threshold,
opacities) leave the device, and the host builds the sparse instance list.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_INSTANCES = 2_000_000  # threed_plot.rs:207
C_M_PER_S = 300_000_000.0  # threed_plot.rs:153
BASE_CUBE_SIZE = 0.25  # threed_plot.rs:149


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    """Normalized Gaussian taps (``threed_plot.rs:82-102``)."""
    x = np.arange(2 * radius + 1, dtype=np.float32) - radius
    k = np.exp(-x * x / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("radius",))
def voxel_opacities(
    data: jnp.ndarray,  # (X, Y, T)
    kernel: jnp.ndarray,  # (2*radius+1,)
    contrast,
    opacity_threshold,
    radius: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Opacity volume + dynamic threshold.

    Pipeline per trace (``threed_plot.rs:166-218``):
    ``v -> v²``, envelope = zero-boundary correlation of ``(v²)^contrast``
    with the Gaussian kernel, zero the trace if its max is below
    ``opacity_threshold`` else min-max normalize; then the threshold that
    keeps at most 2M instances (the value of the 2M-th largest opacity).
    """
    sq = data * data
    powed = jnp.power(sq, contrast)
    # zero-boundary 'same' correlation along t for all pixels at once
    x, y, t = data.shape
    env = jax.lax.conv_general_dilated(
        powed.reshape(x * y, 1, t),
        kernel.reshape(1, 1, -1),
        (1,),
        [(radius, radius)],
        dimension_numbers=("NCH", "IOH", "NCH"),
        preferred_element_type=jnp.float32,
    ).reshape(x, y, t)

    line_max = env.max(axis=-1, keepdims=True)
    line_min = env.min(axis=-1, keepdims=True)
    rng = line_max - line_min
    normalized = jnp.where(
        (line_max >= opacity_threshold) & (jnp.abs(rng) > 1e-6),
        (env - line_min) / rng,
        0.0,
    )

    n = x * y * t
    if n > MAX_INSTANCES:
        flat = normalized.reshape(-1)
        top = jax.lax.top_k(flat, MAX_INSTANCES)[0]
        threshold = top[-1]
    else:
        threshold = jnp.asarray(0.0, jnp.float32)
    return normalized, threshold


def jet_colormap(value: np.ndarray) -> np.ndarray:
    """(N,) opacity -> (N, 3) rgb (``threed_plot.rs:123-130``)."""
    v4 = 4.0 * np.asarray(value)
    r = np.clip(v4 - 1.5, 0.0, 1.0)
    g = np.clip(v4 - 0.5, 0.0, 1.0) - np.clip(v4 - 2.5, 0.0, 1.0)
    b = 1.0 - np.clip(v4 - 1.5, 0.0, 1.0)
    return np.stack([r, g, b], axis=-1)


def extract_instances(
    data: jnp.ndarray,
    time_span: float,
    scaling: int,
    original_dims: tuple[int, int, int],
    *,
    opacity_threshold: float = 0.1,
    contrast: float = 2.0,
    kernel_sigma: float = 3.0,
    kernel_radius: int = 9,
) -> tuple[np.ndarray, np.ndarray, float, float, float, float]:
    """Full voxel extraction: returns ``(positions (N,3), rgba (N,4),
    cube_width, cube_height, cube_depth, threshold)``.

    Geometry (spacing computed from the *original* dims so downscaled data
    keeps the plot size, ``threed_plot.rs:156-162``; z depth scaled by the
    round-trip time-of-flight ``threed_plot.rs:153-154``); jet colors with
    the opacity re-normalized above the dynamic threshold.
    """
    kernel = jnp.asarray(gaussian_kernel1d(kernel_sigma, kernel_radius))
    opac, thr = voxel_opacities(
        data, kernel, np.float32(contrast), np.float32(opacity_threshold),
        kernel_radius,
    )
    opac = np.asarray(opac)
    thr = float(thr)

    gx, gy, gz = opac.shape
    ox, oy, oz = original_dims
    cube_width = cube_height = BASE_CUBE_SIZE
    cube_depth = BASE_CUBE_SIZE / (time_span * C_M_PER_S / 1.0e9 * 2.0)
    spacing_w = (ox * cube_width) / gx
    spacing_h = (oy * cube_height) / gy
    spacing_d = (oz * cube_depth) / gz
    half_w = ox * BASE_CUBE_SIZE / 2.0
    half_h = oy * BASE_CUBE_SIZE / 2.0
    half_d = oz * cube_depth / 2.0

    keep = opac >= thr
    xs, ys, zs = np.nonzero(keep)
    opacity = opac[xs, ys, zs]

    positions = np.stack(
        [
            ys * spacing_h - half_h,
            half_w - xs * spacing_w,
            half_d - zs * spacing_d,
        ],
        axis=-1,
    ).astype(np.float32)
    rgb = jet_colormap((opacity - thr) / (1.0 - thr))
    rgba = np.concatenate([rgb, opacity[:, None]], axis=-1).astype(np.float32)
    return positions, rgba, cube_width, cube_height, cube_depth, thr
