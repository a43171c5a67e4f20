"""Single-dispatch plot publication.

The reference publishes plot traces by writing many small arrays into
``data_lock`` (``/root/reference/src/data_thread.rs:1336-1560``); a naive
port issues one device read per series, and on a remote-tunnelled TPU each
read pays a full round-trip (~30 ms), making every slider drag ~10 RTTs.
This module gathers EVERY published slice — selected-pixel traces from
three pipeline slots, pixel-mean spectra, all ROI reductions, and the
intensity image — in ONE jit-compiled program followed by ONE
``jax.device_get``, so a full publish costs a single round-trip.

Pixel indices are traced (clicks never recompile); the ROI-mask stack
shape and the avg-in-Fourier flag are static (recompile only when the ROI
count or that toggle changes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from thz_image_explorer_tpu.ops.intensity import (
    intensity_image,
    upscaled_intensity_image,
)
from thz_image_explorer_tpu.ops.mxufft import irfft_ri


def _masked_means(arr, masks, weights):
    """Per-ROI masked mean over pixels: (R, X, Y) x (X, Y, T) -> (R, T)."""
    sums = jnp.einsum("rxy,xyt->rt", masks, arr)
    return sums / weights[:, None]


@partial(jax.jit, static_argnames=("avg_fourier", "scaling"))
def _publish_program(
    raw_data,  # (X0, Y0, T0) — slot 0
    rf_amp,  # raw spectrum slot (fft_index + 1)
    rf_ph,
    f_data,  # final slot
    f_amp,
    f_ph,
    f_avg_data,
    f_avg_amp,
    f_avg_ph,
    masks,  # (R, Xf, Yf) f32 ROI masks on the final slot's grid
    rxy,  # (2,) int32 pixel index per slot (pre-divided by its scaling)
    fxy,
    gxy,
    *,
    avg_fourier: bool,
    scaling: int,
):
    n_time = f_data.shape[-1]
    weights = jnp.maximum(masks.sum(axis=(1, 2)), 1e-12)

    roi_amp = _masked_means(f_amp, masks, weights)
    roi_ph = _masked_means(f_ph, masks, weights)
    if avg_fourier:
        # reconstruct ROI traces from polar means (math_tools.rs:496-529)
        spec_ri = jnp.stack(
            [roi_amp * jnp.cos(roi_ph), roi_amp * jnp.sin(roi_ph)]
        )
        roi_trace = irfft_ri(spec_ri, n_time)
        avg_signal = f_avg_data
    else:
        roi_trace = _masked_means(f_data, masks, weights)
        avg_signal = jnp.mean(f_data, axis=(0, 1))

    if scaling > 1:
        image = upscaled_intensity_image(f_data, scaling)
    else:
        image = intensity_image(f_data)

    return dict(
        signal=raw_data[rxy[0], rxy[1]],
        signal_fft=rf_amp[fxy[0], fxy[1]],
        phase_fft=rf_ph[fxy[0], fxy[1]],
        filtered_signal=f_data[gxy[0], gxy[1]],
        filtered_signal_fft=f_amp[gxy[0], gxy[1]],
        filtered_phase_fft=f_ph[gxy[0], gxy[1]],
        avg_signal=avg_signal,
        avg_signal_fft=f_avg_amp,
        avg_phase_fft=f_avg_ph,
        roi_amp=roi_amp,
        roi_ph=roi_ph,
        roi_trace=roi_trace,
        image=image,
    )


def gather_publish(raw, raw_fd, filtered, masks, pixel, avg_fourier: bool):
    """Run the publish program and fetch everything in one transfer.

    ``masks`` is a host (R, Xf, Yf) f32 stack (R may be 0); ``pixel`` the
    un-scaled selected pixel. Returns a dict of host numpy arrays.
    """
    import numpy as np

    px, py = pixel

    def idx(cube):
        return np.asarray(
            [
                min(px // cube.scaling, cube.width - 1),
                min(py // cube.scaling, cube.height - 1),
            ],
            np.int32,
        )

    out = _publish_program(
        raw.data,
        raw_fd.amplitudes,
        raw_fd.phases,
        filtered.data,
        filtered.amplitudes,
        filtered.phases,
        filtered.avg_data,
        filtered.avg_signal_fft,
        filtered.avg_phase_fft,
        jnp.asarray(masks),
        idx(raw),
        idx(raw_fd),
        idx(filtered),
        avg_fourier=avg_fourier,
        scaling=filtered.scaling,
    )
    return jax.device_get(out)
