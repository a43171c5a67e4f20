"""Band-pass op tests mirroring the reference's in-module suites
(``band_pass_td_before_fft.rs:389``, ``band_pass_td_after_fft.rs:389``,
``band_pass_fd.rs:474-567``): zeros outside the band, energy preserved
inside, shapes unchanged. Plus the water-vapor notch (BASELINE superset)."""

import numpy as np
import jax.numpy as jnp

from thz_image_explorer_tpu.assets.water_lines import WATER_LINES_THZ
from thz_image_explorer_tpu.ops import bandpass as bp
from thz_image_explorer_tpu.data import make_cube
from thz_image_explorer_tpu.ops.fourier import forward_fft
from thz_image_explorer_tpu.ops.windows import WindowType


def _sine_cube(freq_thz=1.0, n=256, dt=0.05):
    t = (np.arange(n) * dt).astype(np.float32)
    sig = np.sin(2 * np.pi * freq_thz * t).astype(np.float32)
    return t, sig[None, None, :].copy()


def test_td_bandpass_zeroes_outside_keeps_inside():
    t, data = _sine_cube()
    low, high, width = 3.0, 9.0, 0.5
    out = np.asarray(
        bp.td_bandpass(jnp.asarray(data), jnp.asarray(t), low, high, width)
    )
    assert out.shape == data.shape
    trace = out[0, 0]
    assert np.all(trace[t < low - 1e-6] == 0.0)
    assert np.all(trace[t > high + 1e-6] == 0.0)
    center = (t > low + width) & (t < high - width)
    np.testing.assert_allclose(trace[center], data[0, 0][center], atol=1e-6)


def test_fd_bandpass_zeroes_outside_band():
    # build a real spectrum with the project fft (as the reference test does)
    t, data = _sine_cube(freq_thz=1.0)
    cube = make_cube(jnp.asarray(t), jnp.asarray(data))
    cube = forward_fft(cube, WindowType.ADAPTED_BLACKMAN, 0.0, 0.0)
    freq = np.asarray(cube.freq)
    low, high, width = 0.7, 1.4, 0.05

    fft_out, amp_out = bp.fd_bandpass(
        cube.fft, cube.amplitudes, cube.freq, low, high, width
    )
    fft_out = np.asarray(fft_out)
    amp_out = np.asarray(amp_out)
    assert fft_out.shape == np.asarray(cube.fft).shape
    outside = (freq < low - 1e-6) | (freq >= high)
    assert np.all(fft_out[0, 0][outside] == 0.0)
    assert np.all(amp_out[0, 0][outside] == 0.0)
    # the 1 THz peak survives
    peak_bin = int(np.argmin(np.abs(freq - 1.0)))
    assert np.abs(fft_out[0, 0][peak_bin]) > 0.5 * np.asarray(cube.amplitudes)[0, 0].max()


def test_fd_bandpass_preserves_passband_center():
    t, data = _sine_cube(freq_thz=1.0)
    cube = make_cube(jnp.asarray(t), jnp.asarray(data))
    cube = forward_fft(cube, WindowType.ADAPTED_BLACKMAN, 0.0, 0.0)
    freq = np.asarray(cube.freq)
    fft_out, _ = bp.fd_bandpass(cube.fft, cube.amplitudes, cube.freq, 0.2, 5.0, 0.1)
    center = (freq > 0.5) & (freq < 4.5)
    np.testing.assert_allclose(
        np.asarray(fft_out)[0, 0][center],
        np.asarray(cube.fft)[0, 0][center],
        atol=1e-5,
    )


def test_water_notch_suppresses_lines_only():
    t, data = _sine_cube(freq_thz=1.0)
    cube = make_cube(jnp.asarray(t), jnp.asarray(data))
    cube = forward_fft(cube, WindowType.ADAPTED_BLACKMAN, 0.0, 0.0)
    freq = np.asarray(cube.freq)
    lines = jnp.asarray(np.asarray(WATER_LINES_THZ, np.float32))
    # notch half-width must exceed the bin spacing (1/t_range ~ 0.078 THz)
    # for the nearest bin to sit inside the notch
    width, depth = 0.15, 1.0
    fft_out, amp_out = bp.water_notch(
        cube.fft, cube.amplitudes, cube.freq, lines, width, depth
    )
    amp_in = np.asarray(cube.amplitudes)[0, 0]
    amp_out = np.asarray(amp_out)[0, 0]
    # at each line within range, amplitude attenuated to ~0
    for line in np.asarray(WATER_LINES_THZ):
        if line < freq[-1]:
            b = int(np.argmin(np.abs(freq - line)))
            assert amp_out[b] <= amp_in[b] * 0.25 + 1e-9
    # far from all lines: untouched
    dist = np.min(np.abs(freq[:, None] - np.asarray(WATER_LINES_THZ)[None, :]), axis=1)
    far = dist > 5 * width
    np.testing.assert_allclose(amp_out[far], amp_in[far], atol=1e-6)
