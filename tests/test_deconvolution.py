"""Deconvolution tests: FIR design parity, band planning guards, and the
device program vs a numpy/scipy oracle using the real psf.npz fixture."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from thz_image_explorer_tpu.io import load_psf
from thz_image_explorer_tpu.models.psf import PSF
from thz_image_explorer_tpu.ops import firdesign
from thz_image_explorer_tpu.ops.deconvolution import (
    DeconvolutionParams,
    deconvolve_cube,
    plan_bands,
)

from oracle_deconv import deconvolve_oracle

REF_PSF = "/root/reference/sample_data/psf.npz"
needs_psf = pytest.mark.skipif(not os.path.exists(REF_PSF), reason="no fixture")


# ---------------------------------------------------------------- FIR design
def test_lowpass_dc_gain_and_symmetry():
    taps = firdesign.firwin_lowpass(499, 1.0, 14.0, 20.0)
    assert abs(taps.sum() - 1.0) < 1e-12  # unit DC gain
    np.testing.assert_allclose(taps, taps[::-1], atol=1e-15)  # linear phase
    assert taps[0] == 0.0 and taps[-1] == 0.0  # forced-zero endpoints


def test_highpass_response():
    fs = 20.0
    taps = firdesign.firwin_highpass(499, 2.0, 14.0, fs)
    freqs, mags = firdesign.frequency_response(taps, 256, fs)
    # blocks DC, passes high frequencies
    assert mags[0] < 1e-6
    assert mags[np.searchsorted(freqs, 8.0)] > 0.9


def test_bandpass_bank_partition_of_unity():
    """Band edges at geometric means with lowpass/highpass ends: the bank
    should sum to ~allpass inside the band range (the property the
    reconstruction-by-summing-bands relies on)."""
    t = np.arange(512) * 0.05
    bank, centers = firdesign.create_filter_bank(8, 0.25, 4.0, 0.5, t)
    total = bank.sum(axis=0)
    fs = 20.0
    freqs, mags = firdesign.frequency_response(total, 512, fs)
    inside = (freqs > 0.05) & (freqs < 9.0)
    np.testing.assert_allclose(mags[inside], 1.0, atol=0.02)
    assert len(centers) == 8
    np.testing.assert_allclose(centers[0], 0.25)
    np.testing.assert_allclose(centers[-1], 4.0)


def test_even_ntaps_appends_zero():
    taps = firdesign.firwin_lowpass(10, 1.0, 5.0, 20.0)
    assert len(taps) == 10 and taps[-1] == 0.0


def test_bessel_i0_matches_scipy():
    from scipy.special import i0 as scipy_i0

    x = np.linspace(0.0, 25.0, 50)
    np.testing.assert_allclose(firdesign.bessel_i0(x), scipy_i0(x), rtol=1e-10)


def test_energy_gram_factorization_is_exact():
    """The truncated eigenfactors of _energy_matrices reproduce the exact
    f64 head/tail Gram quadratic forms at the REFERENCE bank geometry
    (25 log-spaced bands, 499 taps): the rank cut must stay below f32
    noise of the energies it feeds (ops/deconvolution._factor_gram)."""
    from thz_image_explorer_tpu.ops.deconvolution import _energy_matrices

    n_time = 1024
    t = np.arange(n_time) * 0.05
    taps, _ = firdesign.create_filter_bank(25, 0.1, 10.0, 4.0, t)
    shift = (taps.shape[1] - 1) // 2

    _, lh, lt = _energy_matrices(np.asarray(taps), 1536, n_time)
    assert lh.shape[0] == 25 and lh.shape[1] == shift
    # the whole point: the factor rank is a small fraction of the segment
    assert lh.shape[2] <= shift // 4

    rng = np.random.default_rng(7)
    x = rng.normal(size=(32, shift))

    # exact f64 Grams of the head/tail segment matrices
    idx = np.arange(shift)[:, None] - np.arange(shift)[None, :]
    mh = np.where((idx >= 0) & (idx < taps.shape[1]),
                  taps[:, np.clip(idx, 0, taps.shape[1] - 1)], 0.0)
    gh = np.einsum("bkt,bks->bts", mh, mh)
    ltail = taps.shape[1] - 1 - shift
    idx_t = (shift + shift + np.arange(ltail)[:, None]
             - np.arange(shift)[None, :])
    mt = np.where((idx_t >= 0) & (idx_t < taps.shape[1]),
                  taps[:, np.clip(idx_t, 0, taps.shape[1] - 1)], 0.0)
    gt = np.einsum("bkt,bks->bts", mt, mt)

    for L, G in ((lh, gh), (lt, gt)):
        exact = np.einsum("nt,bts,ns->nb", x, G, x)  # (32, 25)
        y = np.einsum("nt,btr->nbr", x, L.astype(np.float64))
        got = (y * y).sum(-1)
        scale = exact.max()
        np.testing.assert_allclose(got / scale, exact / scale, atol=1e-6)


# ---------------------------------------------------------------- planning
def _small_cube(n=64, w=20, h=18, seed=3):
    rng = np.random.default_rng(seed)
    t = (np.arange(n) * 0.05).astype(np.float32)
    x = np.zeros((w, h, n), np.float32)
    x[:, :, 12] = rng.uniform(0.5, 1.0, (w, h))
    x += 0.01 * rng.normal(size=x.shape).astype(np.float32)
    return t, x


@needs_psf
def test_plan_bands_geometry():
    psf = load_psf(REF_PSF)
    t, _ = _small_cube()
    params = DeconvolutionParams(
        n_iterations=10, n_filters=5, start_freq=0.25, end_freq=4.0
    )
    geo = plan_bands(params, psf, t, (20, 18), 1.0, 1.0)
    assert geo is not None
    assert geo.taps.shape == (5, 499)
    assert geo.psfs.shape[1] % 2 == 1 and geo.psfs.shape[2] % 2 == 1
    # iteration counts span [1, n_iterations] monotonically-ish in wx
    assert geo.n_iter.min() >= 1 and geo.n_iter.max() <= 10
    # canvases hold the centred PSFs: centre cell is the PSF max for a
    # centred Gaussian-ish kernel
    b = 0
    c = geo.psfs[b]
    assert c[c.shape[0] // 2, c.shape[1] // 2] > 0


@needs_psf
def test_plan_bands_guards():
    psf = load_psf(REF_PSF)
    t, _ = _small_cube()
    params = DeconvolutionParams(n_filters=4)
    # image too small
    assert plan_bands(params, psf, t, (8, 8), 1.0, 1.0) is None
    # PSF not loaded
    assert plan_bands(params, PSF.empty(), t, (20, 18), 1.0, 1.0) is None
    # PSF too large for the image (tiny dx -> huge pixel extent)
    assert plan_bands(params, psf, t, (20, 18), 0.01, 0.01) is None


class _ConstFit:
    def __init__(self, v):
        self.v = np.float32(v)

    def eval(self, f):
        return np.full(np.asarray(f).shape, self.v, np.float32)

    eval_const_extrap = eval


def test_plan_bands_psf_canvas_must_fit_the_axis_it_pads():
    """The reference caps a band's x spatial range against img_COLS
    (deconvolution.rs:920-951), so on a strongly asymmetric scan the
    regridded canvas pad (k//2, in integer mm) can reach the ROW axis it
    actually pads; the reference then panics out of bounds in its
    reflective pad (deconvolution.rs:646-648). plan_bands must refuse
    (pass-through) instead of silently clipping the reflect-pad matrix."""
    wide = type(
        "StubPSF", (), {
            "is_loaded": True,
            "wx_fit": _ConstFit(7.0),  # 7 mm beam -> ~21 mm spatial range
            "wy_fit": _ConstFit(1.0),
            "x0_spline": _ConstFit(0.0),
            "y0_spline": _ConstFit(0.0),
        },
    )()
    t, _ = _small_cube(n=128)
    params = DeconvolutionParams(n_filters=3, n_iterations=4)
    # 20 rows: pad_r = floor(21 mm) = 21 >= 20 -> refused
    assert plan_bands(params, wide, t, (20, 200), 0.5, 0.5) is None
    # the same beam on a tall-enough image plans fine
    geo = plan_bands(params, wide, t, (64, 200), 0.5, 0.5)
    assert geo is not None
    assert int(geo.pad_r.max()) < 64 and int(geo.pad_c.max()) < 200


# ---------------------------------------------------------------- device vs oracle
@needs_psf
def test_deconvolve_matches_oracle():
    psf = load_psf(REF_PSF)
    t, cube = _small_cube()
    params = DeconvolutionParams(
        n_iterations=5, n_filters=3, start_freq=0.25, end_freq=4.0
    )
    geo = plan_bands(params, psf, t, cube.shape[:2], 1.0, 1.0)
    assert geo is not None

    got = deconvolve_cube(jnp.asarray(cube), geo)
    expected = deconvolve_oracle(cube, geo)

    got = np.asarray(got)
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got / scale, expected / scale, atol=5e-3)


@needs_psf
def test_deconvolve_cancellation():
    psf = load_psf(REF_PSF)
    t, cube = _small_cube()
    params = DeconvolutionParams(
        n_iterations=3, n_filters=3, start_freq=0.25, end_freq=4.0
    )
    geo = plan_bands(params, psf, t, cube.shape[:2], 1.0, 1.0)
    calls = {"n": 0}

    def cancelled():
        calls["n"] += 1
        return calls["n"] > 1  # cancel after the first chunk

    out = deconvolve_cube(
        jnp.asarray(cube), geo, cancelled=cancelled, chunk_size=1
    )
    assert out is None


# -------------------------------------------- realistic-geometry parity
def _vectorized_convolve1d_oracle(data, taps):
    """Batched version of oracle_deconv.convolve1d_oracle (same math:
    f64 FFT convolution, pow2 padding, centre extraction) so the
    realistic-geometry case stays affordable."""
    w, h, n = data.shape
    conv_size = n + len(taps) - 1
    fft_size = 1
    while fft_size < conv_size:
        fft_size *= 2
    shift = (len(taps) - 1) // 2
    a = np.fft.fft(data.reshape(-1, n).astype(np.float64), fft_size, axis=-1)
    b = np.fft.fft(taps.astype(np.float64), fft_size)
    full = np.fft.ifft(a * b[None, :], axis=-1).real
    return full[:, shift : n + shift].astype(np.float32).reshape(w, h, n)


def _realistic_case(n_filters=10, n_iterations=12, w=64, h=64, n=256):
    """VERDICT r2 #5: >=10 bands, 499 taps, 64x64 image, mixed
    direct+FFT-conv bands, skewed per-band iteration counts, and a band
    count that is NOT a multiple of the dispatch chunk (exercising the
    inert-band padding)."""
    psf = load_psf(REF_PSF)
    rng = np.random.default_rng(11)
    t = (np.arange(n) * 0.05).astype(np.float32)
    cube = np.zeros((w, h, n), np.float32)
    cube[:, :, 20] = rng.uniform(0.5, 1.0, (w, h))
    cube[:, :, 60] = 0.4 * rng.uniform(0.2, 1.0, (w, h))
    cube += 0.01 * rng.normal(size=cube.shape).astype(np.float32)
    params = DeconvolutionParams(
        n_iterations=n_iterations, n_filters=n_filters,
        start_freq=0.25, end_freq=4.0,
    )
    geo = plan_bands(params, psf, t, (w, h), 1.0, 1.0)
    assert geo is not None
    assert geo.taps.shape == (n_filters, 499)
    return t, cube, geo


@needs_psf
def test_deconvolve_matches_oracle_realistic_geometry():
    import oracle_deconv as od

    t, cube, geo = _realistic_case()
    # the case genuinely mixes the reference's two convolution regimes
    # (direct correlation for small kernels, FFT convolution for large,
    # deconvolution.rs:472-545) ...
    assert geo.use_fft_conv.any() and (~geo.use_fft_conv).any()
    # ... and the per-band iteration counts are skewed (deconvolution.rs:
    # 969-971 scales by relative beam width)
    assert int(geo.n_iter.min()) < int(geo.n_iter.max())

    # chunk_size=4 with 10 bands -> padded to 12 with 2 inert bands
    got = np.asarray(deconvolve_cube(jnp.asarray(cube), geo, chunk_size=4))

    # oracle with the vectorized FIR stage (identical numerics)
    acc = np.zeros_like(cube, np.float64)
    for b in range(geo.taps.shape[0]):
        filtered = _vectorized_convolve1d_oracle(cube, geo.taps[b])
        img = (filtered.astype(np.float64) ** 2).sum(axis=-1).astype(np.float32)
        pad_r, pad_c = int(geo.pad_r[b]), int(geo.pad_c[b])
        canvas = geo.psfs[b]
        r0 = (canvas.shape[0] - (2 * pad_r + 1)) // 2
        c0 = (canvas.shape[1] - (2 * pad_c + 1)) // 2
        psf_k = canvas[r0 : r0 + 2 * pad_r + 1, c0 : c0 + 2 * pad_c + 1]
        u = od.richardson_lucy_oracle(img, psf_k, int(geo.n_iter[b]))
        gains = np.sqrt(np.maximum(u, 0.0) / img)
        acc += (filtered * gains[:, :, None]).astype(np.float64)
    expected = acc.astype(np.float32)

    scale = np.abs(expected).max()
    np.testing.assert_allclose(got / scale, expected / scale, atol=5e-3)


@needs_psf
def test_pallas_matches_scan_realistic_geometry(monkeypatch):
    """The production pallas RL kernel agrees with the SPMD scan path on
    the same realistic geometry (interpret mode on CPU)."""
    t, cube, geo = _realistic_case(n_filters=6, n_iterations=5)
    scan = np.asarray(
        deconvolve_cube(jnp.asarray(cube), geo, chunk_size=4, rl_impl="scan")
    )
    monkeypatch.setenv("THZ_PALLAS_INTERPRET", "1")
    pallas = np.asarray(
        deconvolve_cube(jnp.asarray(cube), geo, chunk_size=4, rl_impl="pallas")
    )
    scale = np.abs(scan).max()
    np.testing.assert_allclose(pallas / scale, scan / scale, atol=2e-3)
