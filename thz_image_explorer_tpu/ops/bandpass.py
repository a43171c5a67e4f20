"""Time- and frequency-domain band-pass filters as masked multiplies.

The reference slices the array, windows the slice, and zero-pads back
(``band_pass_td_before_fft.rs:124-182``, ``band_pass_fd.rs:122-220``) —
shape-changing operations. Under XLA these become *fixed-shape masked
multiplies* with **traced** cutoffs: dragging a slider never recompiles, and
the whole filter fuses into the surrounding program. The FD band-pass'
slice-then-pad is exactly equivalent to masking because it pads back to the
original length.

Also here: the water-vapor notch filter (a comb of Blackman-shaped notches
at the H2O line frequencies) — in the reference the lines are only plot
overlays (``center_panel.rs:477-485``); BASELINE.json asks for them as a
frequency-domain filter, a strict superset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thz_image_explorer_tpu.ops.windows import _blackman_value


def _adapted_blackman_slice_window(
    axis: jnp.ndarray, t0, t_end, width
) -> jnp.ndarray:
    """Adapted-Blackman taper of a [t0, t_end] slice of ``axis`` with equal
    lower/upper bound ``width`` (how both band-passes smooth their edges)."""
    head = axis <= width + t0
    tail = axis >= t_end - width
    head_w = _blackman_value(axis - t0, 2.0 * width)
    tail_w = _blackman_value(axis - (t_end - 2.0 * width), 2.0 * width)
    return jnp.where(head, head_w, jnp.where(tail, tail_w, 1.0))


@jax.jit
def td_bandpass_weights(time: jnp.ndarray, low, high, window_width) -> jnp.ndarray:
    """Weight vector of the time-domain band-pass.

    Index selection mirrors ``band_pass_td_before_fft.rs:136-155``:
    ``lower`` = first index with ``t >= low`` (0 if none), ``upper`` = first
    index with ``t >= high`` (len-1 if none), then
    ``upper = min(max(upper, lower+1), len)``; cutoffs are pre-clamped to
    the time range.
    """
    n = time.shape[0]
    t_min, t_max = time[0], time[-1]
    low = jnp.clip(jnp.asarray(low, time.dtype), t_min, None)
    high = jnp.minimum(jnp.asarray(high, time.dtype), t_max)

    ge_low = time >= low
    lower = jnp.argmax(ge_low)  # all-False -> 0, same as unwrap_or(0)
    ge_high = time >= high
    upper = jnp.where(jnp.any(ge_high), jnp.argmax(ge_high), n - 1)
    upper = jnp.minimum(jnp.maximum(upper, lower + 1), n)

    k = jnp.arange(n)
    inside = (k >= lower) & (k < upper)
    t0 = time[lower]
    t_end = time[upper - 1]
    win = _adapted_blackman_slice_window(time, t0, t_end, window_width)
    return jnp.where(inside, win, 0.0)


@jax.jit
def td_bandpass(data: jnp.ndarray, time: jnp.ndarray, low, high, window_width):
    """Apply the TD band-pass to the cube's time traces. Only ``data``
    changes; spectra pass through (matching the reference stage)."""
    return data * td_bandpass_weights(time, low, high, window_width).astype(
        data.dtype
    )


@jax.jit
def fd_bandpass_weights(freq: jnp.ndarray, low, high, window_width) -> jnp.ndarray:
    """Weight vector of the frequency-domain band-pass
    (``band_pass_fd.rs:134-220``).

    ``lower`` = first index with ``f >= max(low, 0)``; ``upper`` = one past
    the last index with ``f <= min(high, f[-1])`` (len if none); weights are
    the adapted-Blackman taper inside ``[lower, upper)`` and 0 outside
    (equivalent to the reference's slice→window→zero-pad).
    """
    n = freq.shape[0]
    safe_low = jnp.maximum(jnp.asarray(low, freq.dtype), 0.0)
    safe_high = jnp.minimum(jnp.asarray(high, freq.dtype), freq[-1])

    ge_low = freq >= safe_low
    lower = jnp.argmax(ge_low)
    le_high = freq <= safe_high
    upper = jnp.where(
        jnp.any(le_high), n - jnp.argmax(le_high[::-1]), n
    )

    k = jnp.arange(n)
    inside = (k >= lower) & (k < upper)
    f0 = freq[lower]
    f_end = freq[jnp.maximum(upper - 1, 0)]
    win = _adapted_blackman_slice_window(freq, f0, f_end, window_width)
    return jnp.where(inside, win, 0.0)


@jax.jit
def fd_bandpass(fft, amplitudes, freq, low, high, window_width):
    """Apply the FD band-pass: complex spectrum and amplitudes are
    windowed/zeroed; phases are untouched (the reference leaves them)."""
    w = fd_bandpass_weights(freq, low, high, window_width)
    return fft * w.astype(fft.dtype), amplitudes * w.astype(amplitudes.dtype)


@jax.jit
def water_notch_weights(freq: jnp.ndarray, lines: jnp.ndarray, width, depth) -> jnp.ndarray:
    """Comb of Blackman-shaped notches of half-width ``width`` (THz) and
    depth ``depth`` (1 = full suppression) at the given line frequencies.

    ``depth`` is clamped to [0, 1], so the weights are an attenuation in
    [0, 1] by construction — over-suppression flipping the spectrum's
    sign is physically meaningless, and downstream amplitude math relies
    on ``|spec * w| == |spec| * w`` (w >= 0)."""
    f = freq[None, :]
    centers = lines[:, None]
    depth = jnp.clip(depth, 0.0, 1.0)
    in_notch = jnp.abs(f - centers) <= width
    bump = _blackman_value(f - (centers - width), 2.0 * width)
    notch = jnp.where(in_notch, 1.0 - depth * bump, 1.0)
    return jnp.prod(notch, axis=0)


@jax.jit
def water_notch(fft, amplitudes, freq, lines, width, depth):
    w = water_notch_weights(freq, lines, width, depth)
    return fft * w.astype(fft.dtype), amplitudes * w.astype(amplitudes.dtype)
