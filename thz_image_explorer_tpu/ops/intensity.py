"""Intensity image: ``img[x, y] = sum_t data[x, y, t]^2``.

Equivalent of the rayon loops at ``/root/reference/src/data_thread.rs:1288-
1308`` (native resolution) and the block-upscaled display variant at
``data_thread.rs:1244-1285`` used when the cube was spatially downscaled.
On TPU this is a fused reduction epilogue of whatever stage produced
``data``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def intensity_image(data: jnp.ndarray) -> jnp.ndarray:
    """Sum of squares along the time axis."""
    return jnp.sum(data * data, axis=-1)


@partial(jax.jit, static_argnames=("scale",))
def upscaled_intensity_image(data: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Intensity image block-upscaled for display after downscaling.

    Mirrors ``data_thread.rs:1244-1285``: the output grid is
    ``(scaled_w * scale, scaled_h * scale)`` with each downscaled pixel's
    intensity replicated over its ``scale x scale`` block.
    """
    img_small = intensity_image(data)
    return jnp.repeat(jnp.repeat(img_small, scale, axis=0), scale, axis=1)
