"""FFT / iFFT / unwrap tests, including the reference's roundtrip test
(``math_tools.rs:842-897``)."""

import numpy as np
import jax.numpy as jnp

from thz_image_explorer_tpu.data import make_cube
from thz_image_explorer_tpu.ops.fourier import (
    forward_fft,
    inverse_fft,
    polar_irfft,
    unwrap,
)
from thz_image_explorer_tpu.ops.windows import WindowType


def test_unwrap_matches_numpy():
    rng = np.random.default_rng(0)
    phase = np.cumsum(rng.uniform(-0.5, 0.9, size=(4, 257)), axis=-1)
    wrapped = np.angle(np.exp(1j * phase)).astype(np.float32)
    ours = np.asarray(unwrap(jnp.asarray(wrapped)))
    theirs = np.unwrap(wrapped, axis=-1).astype(np.float32)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def _multi_tone_cube(n=128, k1=3, k2=7):
    t = np.arange(n) / n
    sig = np.sin(2 * np.pi * k1 * t) + 0.5 * np.cos(2 * np.pi * k2 * t)
    data = sig[None, None, :].astype(np.float32)
    time = np.linspace(0.0, 1.0, n, dtype=np.float32)
    return make_cube(time, data)


def test_fft_roundtrip():
    """ifft(fft(x)) == x within 1e-4, window disabled via [0, 0] bounds —
    the reference's ``test_fft_roundtrip``."""
    cube = _multi_tone_cube()
    after_fft = forward_fft(cube, WindowType.ADAPTED_BLACKMAN, 0.0, 0.0)
    expected = np.asarray(after_fft.data)
    after_ifft = inverse_fft(after_fft, avg_in_fourier_space=False)
    np.testing.assert_allclose(np.asarray(after_ifft.data), expected, atol=1e-4)


def test_fft_amplitude_phase_vs_numpy():
    cube = _multi_tone_cube()
    out = forward_fft(cube, WindowType.ADAPTED_BLACKMAN, 0.0, 0.0)
    ref_spec = np.fft.rfft(np.asarray(cube.data), axis=-1)
    np.testing.assert_allclose(np.asarray(out.fft), ref_spec, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.amplitudes), np.abs(ref_spec), atol=1e-3)
    # Phase: compare the unwrap against numpy's on *our own* f32 spectrum —
    # near-zero bins have numerically unstable angles, so an f64 oracle
    # spectrum would diverge for reasons unrelated to the unwrap.
    own_spec = np.asarray(out.fft)
    np.testing.assert_allclose(
        np.asarray(out.phases), np.unwrap(np.angle(own_spec), axis=-1), atol=1e-3
    )


def test_window_mutates_downstream_data():
    """After the FFT stage, the cube's time-domain data is the *windowed*
    data — observable behavior the reference relies on
    (``math_tools.rs:349-371``)."""
    cube = _multi_tone_cube()
    out = forward_fft(cube, WindowType.BLACKMAN, 0.0, 0.0)
    w = np.blackman(cube.n_time)
    np.testing.assert_allclose(
        np.asarray(out.data), np.asarray(cube.data) * w, atol=1e-5
    )


def test_avg_in_fourier_space_reconstruction():
    cube = _multi_tone_cube()
    out = inverse_fft(
        forward_fft(cube, WindowType.ADAPTED_BLACKMAN, 0.0, 0.0),
        avg_in_fourier_space=True,
    )
    # Single pixel: polar-mean reconstruction == the original trace.
    np.testing.assert_allclose(
        np.asarray(out.avg_data), np.asarray(cube.data)[0, 0], atol=1e-3
    )


def test_polar_irfft_matches_irfft():
    spec = np.fft.rfft(np.random.default_rng(1).normal(size=64))
    out = polar_irfft(
        jnp.asarray(np.abs(spec), jnp.float32),
        jnp.asarray(np.angle(spec), jnp.float32),
        64,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.fft.irfft(spec, 64), atol=1e-4
    )


def test_unwrap_matmul_cumsum_matches_numpy(monkeypatch):
    """The MXU cumsum-as-triangular-matmul path is exact vs np.unwrap."""
    monkeypatch.setenv("THZ_FFT_IMPL", "matmul")
    from thz_image_explorer_tpu.ops.fourier import unwrap

    rng = np.random.default_rng(5)
    phases = np.cumsum(rng.uniform(-2.0, 2.0, (7, 129)), axis=-1)
    wrapped = np.angle(np.exp(1j * phases)).astype(np.float32)
    got = np.asarray(unwrap(jnp.asarray(wrapped)))
    expected = np.unwrap(wrapped.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_phase_increments_commute_with_reductions():
    """The lean encoding's contract: cumsum(increments) == unwrap, and
    because cumsum is linear it commutes with pixel means / masked means
    / slices — reduce-then-finish equals unwrap-then-reduce (the fused
    lean program relies on this, ops/fourier.phase_increments)."""
    from thz_image_explorer_tpu.ops.fourier import (
        finish_unwrap,
        phase_increments,
        unwrap,
    )

    rng = np.random.default_rng(3)
    # phases with genuine wraps: random walk pushed past +-pi repeatedly
    phase = np.float32(rng.uniform(-np.pi, np.pi, (7, 5, 33)))
    inc = np.asarray(phase_increments(jnp.asarray(phase)))
    unw = np.asarray(unwrap(jnp.asarray(phase)))

    # 1) cumsum of increments IS the unwrap
    np.testing.assert_allclose(np.cumsum(inc, axis=-1), unw, atol=1e-5)
    # 2) mean over pixels commutes
    np.testing.assert_allclose(
        np.asarray(finish_unwrap(jnp.asarray(inc.mean(axis=(0, 1))))),
        unw.mean(axis=(0, 1)),
        atol=1e-5,
    )
    # 3) weighted (masked) mean commutes
    w = np.float32(rng.uniform(0, 1, (7, 5)) > 0.5)
    wsum = max(w.sum(), 1.0)
    np.testing.assert_allclose(
        np.asarray(finish_unwrap(
            jnp.asarray((inc * w[..., None]).sum(axis=(0, 1)) / wsum))),
        (unw * w[..., None]).sum(axis=(0, 1)) / wsum,
        atol=1e-5,
    )
    # 4) pixel slice commutes
    np.testing.assert_allclose(
        np.asarray(finish_unwrap(jnp.asarray(inc[3, 2]))),
        unw[3, 2], atol=1e-5,
    )
