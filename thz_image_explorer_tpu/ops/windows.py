"""FFT apodization windows.

TPU-native rethink of ``/root/reference/src/math_tools.rs:35-198``: instead of
mutating each pixel's trace in a rayon loop, every window is a single ``(T,)``
weight vector computed from the time axis, broadcast-multiplied into the whole
``(X, Y, T)`` cube (XLA fuses the multiply into the surrounding program).

Window bounds are *traced* scalars so interactive slider changes never
recompile.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class WindowType(enum.Enum):
    """Window kinds supported by the reference (``math_tools.rs:35-46``)."""

    ADAPTED_BLACKMAN = "adapted_blackman"
    BLACKMAN = "blackman"
    HANNING = "hanning"
    HAMMING = "hamming"
    FLAT_TOP = "flat_top"


_TWO_PI = 2.0 * jnp.pi


def _blackman_value(n, m):
    """Blackman formula with the reference's NaN→1 and [0,1] clamp
    (``math_tools.rs:81-90``). ``m == 0`` yields NaN → 1.0, which is what
    makes bounds of ``[0, 0]`` disable the adapted window entirely."""
    res = (
        0.42
        - 0.5 * jnp.cos(_TWO_PI * n / m)
        + 0.08 * jnp.cos(2.0 * _TWO_PI * n / m)
    )
    return jnp.where(jnp.isnan(res), 1.0, jnp.clip(res, 0.0, 1.0))


def adapted_blackman_window(time: jnp.ndarray, lower, upper) -> jnp.ndarray:
    """Adapted Blackman: tapers only the first ``lower`` / last ``upper``
    picoseconds, leaving the centre at exactly 1
    (``math_tools.rs:102-122``). ``time`` may be any monotonically increasing
    axis (the FD band-pass reuses this on the frequency axis)."""
    t0 = time[0]
    t_end = time[-1]
    lower = jnp.asarray(lower, time.dtype)
    upper = jnp.asarray(upper, time.dtype)
    head = time <= lower + t0
    tail = time >= t_end - upper
    head_w = _blackman_value(time - t0, 2.0 * lower)
    tail_w = _blackman_value(time - (t_end - 2.0 * upper), 2.0 * upper)
    # Reference applies head first, tail in the *elif* branch.
    return jnp.where(head, head_w, jnp.where(tail, tail_w, 1.0))


def _normalized_time(time: jnp.ndarray) -> jnp.ndarray:
    tmin = jnp.min(time)
    tmax = jnp.max(time)
    return (time - tmin) / (tmax - tmin)


def blackman_window(time: jnp.ndarray) -> jnp.ndarray:
    """Full Blackman over normalized time (``math_tools.rs:174-180``)."""
    t = _normalized_time(time)
    return 0.42 - 0.5 * jnp.cos(_TWO_PI * t) + 0.08 * jnp.cos(2 * _TWO_PI * t)


def hanning_window(time: jnp.ndarray) -> jnp.ndarray:
    """Hann window (``math_tools.rs:160-165``)."""
    t = _normalized_time(time)
    return 0.5 * (1.0 - jnp.cos(_TWO_PI * t))


def hamming_window(time: jnp.ndarray) -> jnp.ndarray:
    """Hamming window (``math_tools.rs:145-150``)."""
    t = _normalized_time(time)
    return 0.54 - 0.46 * jnp.cos(_TWO_PI * t)


def flat_top_window(time: jnp.ndarray) -> jnp.ndarray:
    """Flat-top window (``math_tools.rs:190-197``)."""
    t = _normalized_time(time)
    return (
        1.0
        - 1.93 * jnp.cos(_TWO_PI * t)
        + 1.29 * jnp.cos(2 * _TWO_PI * t)
        - 0.388 * jnp.cos(3 * _TWO_PI * t)
        + 0.028 * jnp.cos(4 * _TWO_PI * t)
    )


def window_array(
    time: jnp.ndarray,
    window_type: WindowType,
    lower=0.0,
    upper=0.0,
) -> jnp.ndarray:
    """Build the ``(T,)`` window for a given type. ``lower``/``upper`` only
    apply to the adapted Blackman (bounds in the same unit as ``time``)."""
    if window_type == WindowType.ADAPTED_BLACKMAN:
        return adapted_blackman_window(time, lower, upper)
    if window_type == WindowType.BLACKMAN:
        return blackman_window(time)
    if window_type == WindowType.HANNING:
        return hanning_window(time)
    if window_type == WindowType.HAMMING:
        return hamming_window(time)
    if window_type == WindowType.FLAT_TOP:
        return flat_top_window(time)
    raise ValueError(f"unknown window type: {window_type}")
