"""Window-function tests, ported from the reference's
``test_window_functions_apply`` (``math_tools.rs:757-840``)."""

import numpy as np
import jax.numpy as jnp

from thz_image_explorer_tpu.ops.windows import (
    WindowType,
    adapted_blackman_window,
    window_array,
)


def _windows(size=128):
    time = jnp.linspace(0.0, 1.0, size)
    return {
        "blackman": np.asarray(window_array(time, WindowType.BLACKMAN)),
        "hanning": np.asarray(window_array(time, WindowType.HANNING)),
        "hamming": np.asarray(window_array(time, WindowType.HAMMING)),
        "flattop": np.asarray(window_array(time, WindowType.FLAT_TOP)),
        "adapted": np.asarray(
            window_array(time, WindowType.ADAPTED_BLACKMAN, 0.1, 0.1)
        ),
    }


def test_endpoints():
    w = _windows()
    for name in ("blackman", "hanning", "flattop", "adapted"):
        assert w[name][0] <= 1e-5, name
        assert w[name][-1] <= 1e-5, name
    # Hamming: ~0.08 at the ends
    np.testing.assert_allclose(w["hamming"][0], 0.08, atol=1e-5)
    np.testing.assert_allclose(w["hamming"][-1], 0.08, atol=1e-5)


def test_symmetry():
    w = _windows()
    for name, arr in w.items():
        np.testing.assert_allclose(arr, arr[::-1], atol=1e-5, err_msg=name)


def test_center_dominance_and_adapted_unity():
    w = _windows()
    mid = 64
    for name, arr in w.items():
        assert arr[mid] >= arr[mid - 1] and arr[mid] >= arr[mid + 1], name
    np.testing.assert_allclose(w["adapted"][mid], 1.0, atol=1e-5)


def test_adapted_blackman_zero_bounds_is_identity():
    """Bounds [0, 0] disable the window (NaN -> 1 path), the trick the
    reference's FFT-roundtrip test relies on (``math_tools.rs:879-881``)."""
    time = jnp.linspace(0.0, 1.0, 64)
    w = np.asarray(adapted_blackman_window(time, 0.0, 0.0))
    np.testing.assert_allclose(w, np.ones(64), atol=0)


def test_blackman_matches_numpy():
    """The reference documents its Blackman as numpy's
    (``math_tools.rs:81-84``)."""
    n = 128
    time = jnp.linspace(0.0, 1.0, n)
    ours = np.asarray(window_array(time, WindowType.BLACKMAN))
    theirs = np.blackman(n)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
