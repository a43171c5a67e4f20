"""Tilt compensation vs the reference's analytic unit tests
(``tilt_compensation.rs:302-389``): extension-step arithmetic, impulse
shift index, and the no-tilt no-op."""

import numpy as np
import jax.numpy as jnp

from thz_image_explorer_tpu.data import make_cube
from thz_image_explorer_tpu.ops.tilt import (
    C_MM_PER_PS,
    DT_PS,
    extension_steps,
    tilt_compensate,
)


def _cube(w=8, h=6, n=64, dx=1.0, dy=1.0):
    t = (np.arange(n) * DT_PS).astype(np.float32)
    data = np.zeros((w, h, n), np.float32)
    return make_cube(jnp.asarray(t), jnp.asarray(data), dx=dx, dy=dy)


def test_extension_steps_analytic():
    # expected: floor((cx*|tx| + cy*|ty|)/c / dt) steps
    w, h, dx, dy = 10, 8, 1.0, 1.0
    tx = np.deg2rad(5.0)
    max_off = (w / 2 * dx * abs(tx)) / C_MM_PER_PS
    expected = int(np.round(np.floor(max_off / DT_PS) * DT_PS / DT_PS))
    got = extension_steps(w, h, dx, dy, 5.0, 0.0)
    assert got == expected
    assert extension_steps(w, h, dx, dy, 0.0, 0.0) == 0


def test_no_tilt_is_identity():
    cube = _cube()
    rng = np.random.default_rng(0)
    cube = cube.replace(data=jnp.asarray(rng.normal(size=(8, 6, 64)).astype(np.float32)))
    out = tilt_compensate(cube, 0.0, 0.0)
    assert out.time.shape == cube.time.shape
    # zero tilt leaves only the [0, 7] ps adapted-Blackman window applied
    from thz_image_explorer_tpu.ops.windows import adapted_blackman_window

    win = np.asarray(adapted_blackman_window(cube.time, 0.0, 7.0))
    np.testing.assert_allclose(
        np.asarray(out.data), np.asarray(cube.data) * win, atol=1e-6
    )


def test_impulse_lands_at_shifted_index():
    w, h, n = 16, 6, 128
    cube = _cube(w, h, n, dx=2.0, dy=1.0)
    data = np.zeros((w, h, n), np.float32)
    spike_idx = 60
    data[:, :, spike_idx] = 1.0
    cube = cube.replace(data=jnp.asarray(data))

    tilt_x = 8.0
    out = tilt_compensate(cube, tilt_x, 0.0)
    steps = extension_steps(w, h, 2.0, 1.0, tilt_x, 0.0)
    assert out.data.shape[-1] == n + 2 * steps

    got = np.asarray(out.data)
    tsx = np.deg2rad(tilt_x)
    for i in [0, w // 2, w - 1]:
        x_off = (i - w / 2.0) * 2.0 * tsx / C_MM_PER_PS
        delta = int(np.floor(x_off / DT_PS))
        insert = max(steps + delta, 0)
        # the impulse should sit at spike_idx + insert in the extended trace
        peak = int(np.argmax(np.abs(got[i, 0])))
        assert peak == spike_idx + insert, (i, peak, spike_idx + insert)


def test_unknown_pixel_spacing_is_noop():
    cube = _cube()
    cube = cube.replace(dx=None, dy=None)
    out = tilt_compensate(cube, 5.0, 5.0)
    assert out is cube
