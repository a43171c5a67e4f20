"""MXU DFT-matmul FFT vs numpy's FFT (the f64-planned oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from thz_image_explorer_tpu.ops import mxufft

ATOL = 5e-5  # HIGH (bf16x3) matmul precision


@pytest.mark.parametrize("n", [32, 100, 256, 1024, 2048, 4096])
def test_rfft_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.normal(size=(3, 5, n)).astype(np.float32)
    got = np.asarray(mxufft.rfft_ri(jnp.asarray(x)))
    exp = np.fft.rfft(x.astype(np.float64), axis=-1)
    scale = np.abs(exp).max()
    np.testing.assert_allclose(got[0] / scale, exp.real / scale, atol=ATOL)
    np.testing.assert_allclose(got[1] / scale, exp.imag / scale, atol=ATOL)


@pytest.mark.parametrize("n", [256, 1024, 2048])
def test_rfft_zero_padding(n):
    rng = np.random.default_rng(7)
    t = n - 150
    x = rng.normal(size=(4, t)).astype(np.float32)
    got = np.asarray(mxufft.rfft_ri(jnp.asarray(x), n=n))
    exp = np.fft.rfft(x.astype(np.float64), n=n, axis=-1)
    scale = np.abs(exp).max()
    np.testing.assert_allclose(got[0] / scale, exp.real / scale, atol=ATOL)
    np.testing.assert_allclose(got[1] / scale, exp.imag / scale, atol=ATOL)


@pytest.mark.parametrize("n", [32, 101, 1024, 2048])
def test_irfft_roundtrip(n):
    rng = np.random.default_rng(n + 1)
    x = rng.normal(size=(2, 7, n)).astype(np.float32)
    ri = mxufft.rfft_ri(jnp.asarray(x))
    back = np.asarray(mxufft.irfft_ri(ri, n))
    np.testing.assert_allclose(back, x, atol=5e-4)


@pytest.mark.parametrize("n", [100, 2048])
def test_irfft_matches_numpy(n):
    rng = np.random.default_rng(5)
    m = n // 2 + 1
    spec = (rng.normal(size=(3, m)) + 1j * rng.normal(size=(3, m))).astype(
        np.complex64
    )
    if n % 2 == 0:
        spec[:, 0] = spec[:, 0].real  # hermitian endpoints
        spec[:, -1] = spec[:, -1].real
    else:
        spec[:, 0] = spec[:, 0].real
    ri = jnp.asarray(np.stack([spec.real, spec.imag]).astype(np.float32))
    got = np.asarray(mxufft.irfft_ri(ri, n))
    exp = np.fft.irfft(spec.astype(np.complex128), n=n, axis=-1)
    scale = np.abs(exp).max()
    np.testing.assert_allclose(got / scale, exp / scale, atol=ATOL)


def test_large_n_falls_back_to_native():
    rng = np.random.default_rng(2)
    n = mxufft.MAX_MATMUL_N * 2
    x = rng.normal(size=(2, n)).astype(np.float32)
    got = np.asarray(mxufft.rfft_ri(jnp.asarray(x)))
    exp = np.fft.rfft(x, axis=-1)
    scale = np.abs(exp).max()
    np.testing.assert_allclose(got[0] / scale, exp.real / scale, atol=1e-5)
    back = np.asarray(mxufft.irfft_ri(jnp.asarray(got), n))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_rfft_time_weight_fold_matches_explicit_multiply():
    """rfft_ri(time_weight=w) == rfft(w * x) on the MATMUL path (the
    production fold — mxufft always takes the matmul branch at these
    lengths, so this covers the DFT-matrix row scaling the CPU-forced
    suite would otherwise never execute). Covers same-length, padded
    (n > t) and truncated (n < t) transforms."""
    rng = np.random.default_rng(7)
    t = 96
    x = rng.normal(size=(4, t)).astype(np.float32)
    w = rng.uniform(0.0, 1.0, t).astype(np.float32)
    for n in (t, 160, 64):
        got = np.asarray(
            mxufft.rfft_ri(jnp.asarray(x), n, time_weight=jnp.asarray(w))
        )
        exp = np.fft.rfft((x * w).astype(np.float64), n=n, axis=-1)
        scale = max(np.abs(exp).max(), 1e-30)
        np.testing.assert_allclose(
            got[0] / scale, exp.real / scale, atol=ATOL, err_msg=f"n={n}"
        )
        np.testing.assert_allclose(
            got[1] / scale, exp.imag / scale, atol=ATOL, err_msg=f"n={n}"
        )


def test_irfft_freq_weight_fold_matches_explicit_multiply():
    """irfft_ri(freq_weight=w) == irfft(w * spec) on the MATMUL path,
    including a sliced output window (out_start/out_len)."""
    rng = np.random.default_rng(8)
    n = 128
    m = n // 2 + 1
    spec = (rng.normal(size=(3, m)) + 1j * rng.normal(size=(3, m)))
    spec[:, 0] = spec[:, 0].real
    spec[:, -1] = spec[:, -1].real
    w = rng.uniform(0.0, 1.0, m).astype(np.float32)
    ri = jnp.asarray(np.stack([spec.real, spec.imag]).astype(np.float32))
    exp_full = np.fft.irfft(spec * w, n=n, axis=-1)
    got = np.asarray(mxufft.irfft_ri(ri, n, freq_weight=jnp.asarray(w)))
    scale = max(np.abs(exp_full).max(), 1e-30)
    np.testing.assert_allclose(got / scale, exp_full / scale, atol=ATOL)
    got_win = np.asarray(
        mxufft.irfft_ri(ri, n, out_start=10, out_len=40,
                        freq_weight=jnp.asarray(w))
    )
    np.testing.assert_allclose(
        got_win / scale, exp_full[:, 10:50] / scale, atol=ATOL
    )


def test_irfft_out_weight_fold_matches_explicit_multiply():
    """irfft_ri(out_weight=w) == w * irfft(spec) on the MATMUL path
    (column scaling — the folded TD-after mask), composed with a
    freq_weight and an output window."""
    rng = np.random.default_rng(9)
    n = 128
    m = n // 2 + 1
    spec = (rng.normal(size=(3, m)) + 1j * rng.normal(size=(3, m)))
    spec[:, 0] = spec[:, 0].real
    spec[:, -1] = spec[:, -1].real
    wf = rng.uniform(0.0, 1.0, m).astype(np.float32)
    wo = rng.uniform(0.0, 1.0, n).astype(np.float32)
    ri = jnp.asarray(np.stack([spec.real, spec.imag]).astype(np.float32))
    exp = np.fft.irfft(spec * wf, n=n, axis=-1) * wo
    got = np.asarray(
        mxufft.irfft_ri(ri, n, freq_weight=jnp.asarray(wf),
                        out_weight=jnp.asarray(wo))
    )
    scale = max(np.abs(exp).max(), 1e-30)
    np.testing.assert_allclose(got / scale, exp / scale, atol=ATOL)
    got_win = np.asarray(
        mxufft.irfft_ri(ri, n, out_start=16, out_len=32,
                        freq_weight=jnp.asarray(wf),
                        out_weight=jnp.asarray(wo[16:48]))
    )
    np.testing.assert_allclose(
        got_win / scale, exp[:, 16:48] / scale, atol=ATOL
    )
