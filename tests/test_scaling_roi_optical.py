"""Tests for spatial scaling, ROI masks/means and optical properties."""

import numpy as np
import jax.numpy as jnp

from thz_image_explorer_tpu.data import make_cube
from thz_image_explorer_tpu.ops.scaling import scale_cube
from thz_image_explorer_tpu.ops.intensity import (
    intensity_image,
    upscaled_intensity_image,
)
from thz_image_explorer_tpu.ops.optical import calculate_optical_properties, C
from thz_image_explorer_tpu.ops import roi


def _cube(x=6, y=4, t=16, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(x, y, t)).astype(np.float32)
    time = np.linspace(0.0, 10.0, t, dtype=np.float32)
    return make_cube(time, data, dx=0.5, dy=0.5)


def _oracle_scale(data, s):
    """Direct port of the reference's block loop (math_tools.rs:273-301)."""
    nx, ny = data.shape[0] // s, data.shape[1] // s
    out = np.zeros((nx, ny, data.shape[2]), data.dtype)
    for i in range(nx):
        for j in range(ny):
            out[i, j] = data[i * s : (i + 1) * s, j * s : (j + 1) * s].sum(
                axis=(0, 1)
            ) / (s * s)
    return out


def test_scale_cube_matches_oracle():
    cube = _cube()
    out = scale_cube(cube, 2)
    np.testing.assert_allclose(
        np.asarray(out.data), _oracle_scale(np.asarray(cube.data), 2), atol=1e-6
    )
    assert out.width == 3 and out.height == 2
    assert out.dx == 1.0 and out.dy == 1.0 and out.scaling == 2


def test_scale_noop():
    cube = _cube()
    assert scale_cube(cube, 1) is cube
    # scale too large -> no-op (math_tools.rs:253-256)
    assert scale_cube(cube, 100) is cube


def test_intensity_image():
    cube = _cube()
    img = np.asarray(intensity_image(cube.data))
    expected = (np.asarray(cube.data) ** 2).sum(axis=-1)
    np.testing.assert_allclose(img, expected, rtol=1e-5)


def test_upscaled_intensity_image():
    cube = _cube()
    small = scale_cube(cube, 2)
    up = np.asarray(upscaled_intensity_image(small.data, 2))
    assert up.shape == (6, 4)
    img_small = (np.asarray(small.data) ** 2).sum(axis=-1)
    np.testing.assert_allclose(up[0, 0], img_small[0, 0], rtol=1e-5)
    np.testing.assert_allclose(up[1, 1], img_small[0, 0], rtol=1e-5)


def _oracle_roi(data, polygon, scaling=1):
    """Direct float-free port of average_polygon_roi (math_tools.rs:599-661)."""
    poly = [(x // scaling, y // scaling) for x, y in polygon]
    x_size, y_size, z = data.shape[1], data.shape[0], data.shape[2]
    result = np.zeros(z)
    count = 0
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    x_min, y_min = min(min(xs), x_size - 1), min(min(ys), y_size - 1)
    x_max, y_max = min(max(xs), x_size - 1), min(max(ys), y_size - 1)
    for yy in range(y_min, y_max + 1):
        for xx in range(x_min, x_max + 1):
            if roi._point_in_polygon_py(xx, yy, poly):
                result += data[y_size - yy - 1, xx, :]
                count += 1
    if count:
        result /= count
    return result.astype(np.float32)


def test_polygon_mask_and_mean_match_oracle():
    cube = _cube(x=8, y=8)
    polygon = [(1, 1), (6, 1), (6, 5), (1, 5)]
    mask = roi.polygon_mask(polygon, (8, 8))
    data = np.asarray(cube.data)
    expected = _oracle_roi(data, polygon)
    got = np.asarray(roi.masked_mean_trace(cube.data, jnp.asarray(mask)))
    np.testing.assert_allclose(got, expected, atol=1e-5)
    assert mask.sum() > 0


def test_polygon_mask_native_matches_python(monkeypatch):
    polygon = [(0, 0), (7, 2), (5, 7), (2, 6)]
    native_mask = roi.polygon_mask(polygon, (8, 8))
    monkeypatch.setattr(roi.native, "load", lambda: None)
    py_mask = roi.polygon_mask(polygon, (8, 8))
    np.testing.assert_array_equal(native_mask, py_mask)


def test_polygon_mask_negative_coords_fallback_matches_native(monkeypatch):
    """A vertex dragged past the image edge goes negative; the Rust
    release build wraps it mod 2^64 (math_tools.rs:574-609) so the bbox
    clamp pins it to size-1. The pure-Python fallback must reproduce the
    wrap instead of indexing out of bounds (round-4 review finding)."""
    polygon = [(-2, -2), (5, -2), (5, 5), (-2, 5)]
    native_mask = roi.polygon_mask(polygon, (8, 8))
    # with scaling: the wrapped value is divided, not the signed one
    native_s = roi.polygon_mask(polygon, (8, 8), scaling=2)
    monkeypatch.setattr(roi.native, "load", lambda: None)
    py_mask = roi.polygon_mask(polygon, (8, 8))
    py_s = roi.polygon_mask(polygon, (8, 8), scaling=2)
    np.testing.assert_array_equal(native_mask, py_mask)
    np.testing.assert_array_equal(native_s, py_s)


def test_polygon_mask_scaling_division():
    polygon = [(2, 2), (12, 2), (12, 10), (2, 10)]
    m1 = roi.polygon_mask(polygon, (8, 8), scaling=2)
    m2 = roi.polygon_mask([(1, 1), (6, 1), (6, 5), (1, 5)], (8, 8), scaling=1)
    np.testing.assert_array_equal(m1, m2)


def test_roi_click_to_mask_selects_drawn_pixels():
    """End-to-end orientation regression (round-4 review finding): a ROI
    drawn on the canvas around a hot stripe must average exactly those
    data pixels.

    The canvas shows ``screen[(r, c)] = data[(r, c)]``
    (``viz.colormap.intensity_image_rgba``), clicks become PLOT coords via
    ``jslogic.display_to_plot`` (mirroring the page JS), and
    ``polygon_mask`` consumes plot coords with the reference's swap/flip
    (``math_tools.rs:611-648``). Before the fix the page emitted DATA
    coords, so the rasterized mask selected transposed pixels — for this
    stripe, an all-zero trace instead of the hot value."""
    from thz_image_explorer_tpu.viz import jslogic as jl
    from thz_image_explorer_tpu.viz.colormap import intensity_image_rgba

    X, Y, T = 5, 3, 4
    data = np.zeros((X, Y, T), np.float32)
    data[2, :, :] = 7.0  # hot stripe at data x=2, every y

    # the user sees the stripe on canvas row 2 (screen row = data x)
    rgba = intensity_image_rgba(data[:, :, 0])
    red_rows = np.unique(np.nonzero(rgba[:, :, 0] == 255)[0])
    np.testing.assert_array_equal(red_rows, [2])

    # shift-clicks around the stripe: canvas (col, row) px at scale 1;
    # display_to_plot(image_h = canvas pixel rows = X)
    clicks = [(0.5, 2.5), (3.5, 2.5), (3.5, 1.5), (0.5, 1.5)]
    polygon = [jl.display_to_plot(cx, cy, 1.0, X) for cx, cy in clicks]
    assert polygon == [(0, 2), (3, 2), (3, 3), (0, 3)]

    mask = roi.polygon_mask(polygon, (X, Y))
    expected = np.zeros((X, Y), bool)
    expected[2, :] = True  # exactly the hot stripe
    np.testing.assert_array_equal(mask, expected)

    trace = np.asarray(
        roi.masked_mean_trace(jnp.asarray(data), jnp.asarray(mask))
    )
    np.testing.assert_allclose(trace, 7.0)


def test_optical_properties_formulas():
    f = np.array([0.5, 1.0, 2.0], np.float32)
    samp_amp = np.array([0.5, 0.4, 0.3], np.float32)
    ref_amp = np.array([1.0, 1.0, 1.0], np.float32)
    samp_ph = np.array([10.0, 20.0, 40.0], np.float32)
    ref_ph = np.array([8.0, 16.0, 32.0], np.float32)
    d = 1e-3
    n, alpha, kappa = calculate_optical_properties(
        jnp.asarray(samp_amp),
        jnp.asarray(samp_ph),
        jnp.asarray(ref_amp),
        jnp.asarray(ref_ph),
        jnp.asarray(f),
        d,
    )
    f_hz = f * 1e12
    omega = 2 * np.pi * f_hz
    n_exp = 1 + C * (samp_ph - ref_ph) / (omega * d)
    alpha_exp = -2 / d * np.log(
        (n_exp + 1) ** 2 / (4 * n_exp) * samp_amp / ref_amp
    )
    kappa_exp = alpha_exp * C / (4 * np.pi * f_hz)
    np.testing.assert_allclose(np.asarray(n), n_exp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), alpha_exp, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(kappa), kappa_exp, rtol=1e-4)
