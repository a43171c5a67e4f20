"""MXU matmul FFT vs numpy's FFT (the f64-planned oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from thz_image_explorer_tpu.ops import mxufft


@pytest.mark.parametrize("n", [32, 256, 1024, 2048, 4096])
def test_rfft_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.normal(size=(3, 5, n)).astype(np.float32)
    got = np.asarray(mxufft.rfft_ri(jnp.asarray(x)))
    exp = np.fft.rfft(x.astype(np.float64), axis=-1)
    scale = np.abs(exp).max()
    np.testing.assert_allclose(got[0] / scale, exp.real / scale, atol=2e-6)
    np.testing.assert_allclose(got[1] / scale, exp.imag / scale, atol=2e-6)


@pytest.mark.parametrize("n", [256, 1024, 2048])
def test_rfft_zero_padding(n):
    rng = np.random.default_rng(7)
    t = n - 150
    x = rng.normal(size=(4, t)).astype(np.float32)
    got = np.asarray(mxufft.rfft_ri(jnp.asarray(x), n=n))
    exp = np.fft.rfft(x.astype(np.float64), n=n, axis=-1)
    scale = np.abs(exp).max()
    np.testing.assert_allclose(got[0] / scale, exp.real / scale, atol=2e-6)
    np.testing.assert_allclose(got[1] / scale, exp.imag / scale, atol=2e-6)


@pytest.mark.parametrize("n", [32, 1024, 2048])
def test_irfft_roundtrip(n):
    rng = np.random.default_rng(n + 1)
    x = rng.normal(size=(2, 7, n)).astype(np.float32)
    ri = mxufft.rfft_ri(jnp.asarray(x))
    back = np.asarray(mxufft.irfft_ri(ri, n))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_irfft_matches_numpy():
    n = 2048
    rng = np.random.default_rng(5)
    m = n // 2 + 1
    spec = (rng.normal(size=(3, m)) + 1j * rng.normal(size=(3, m))).astype(
        np.complex64
    )
    ri = jnp.asarray(np.stack([spec.real, spec.imag]).astype(np.float32))
    got = np.asarray(mxufft.irfft_ri(ri, n))
    exp = np.fft.irfft(spec.astype(np.complex128), n=n, axis=-1)
    scale = np.abs(exp).max()
    np.testing.assert_allclose(got / scale, exp / scale, atol=2e-6)


def test_non_pow2_fallback():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 100)).astype(np.float32)
    got = np.asarray(mxufft.rfft_ri(jnp.asarray(x)))
    exp = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(got[0], exp.real, atol=1e-3)
    np.testing.assert_allclose(got[1], exp.imag, atol=1e-3)
    back = np.asarray(
        mxufft.irfft_ri(jnp.asarray(np.stack([exp.real, exp.imag])), 100)
    )
    np.testing.assert_allclose(back, x, atol=1e-4)
