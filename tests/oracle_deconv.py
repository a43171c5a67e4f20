"""Numpy/scipy oracle of the reference's deconvolution numerics.

Independently re-implements the band pipeline of ``deconvolution.rs`` in
plain numpy/scipy (f64 FIR convolution, zero-boundary 'same' correlation
for small kernels / true FFT convolution for large ones, reflect-padded
Richardson-Lucy) so the TPU program in
``thz_image_explorer_tpu.ops.deconvolution`` can be checked against it on
small cubes.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import correlate2d, fftconvolve


def convolve1d_oracle(signal: np.ndarray, taps: np.ndarray) -> np.ndarray:
    """f64 FFT convolution with pow2 padding and centre extraction
    (``deconvolution.rs:266-317``)."""
    n = len(signal)
    conv_size = n + len(taps) - 1
    fft_size = 1
    while fft_size < conv_size:
        fft_size *= 2
    shift = (len(taps) - 1) // 2
    a = np.fft.fft(signal.astype(np.float64), fft_size)
    b = np.fft.fft(taps.astype(np.float64), fft_size)
    full = np.fft.ifft(a * b).real
    return full[shift : n + shift].astype(np.float32)


def conv2d_oracle(a: np.ndarray, k: np.ndarray) -> np.ndarray:
    """The reference's ``convolve2d``: direct (correlation!) for small
    kernels, true FFT convolution otherwise (``deconvolution.rs:472-545``)."""
    if k.size <= 256:
        return correlate2d(a, k, mode="same", boundary="fill").astype(np.float32)
    return fftconvolve(a, k, mode="same").astype(np.float32)


def richardson_lucy_oracle(image, psf, n_iter):
    pad_r, pad_c = psf.shape[0] // 2, psf.shape[1] // 2
    padded = np.pad(image, ((pad_r, pad_r), (pad_c, pad_c)), mode="reflect")
    psf_mirror = psf[::-1, ::-1]
    u = padded.copy()
    for _ in range(n_iter):
        ustarp = conv2d_oracle(u, psf)
        rel = padded / (ustarp + 1e-12)
        u = u * conv2d_oracle(rel, psf_mirror)
    return u[pad_r : pad_r + image.shape[0], pad_c : pad_c + image.shape[1]]


def deconvolve_oracle(data: np.ndarray, geometry) -> np.ndarray:
    """Full band loop using the planned geometry (taps/psfs/n_iter from
    ``plan_bands``), numerics independent of the device code."""
    acc = np.zeros_like(data, np.float64)
    n_bands = geometry.taps.shape[0]
    for b in range(n_bands):
        taps = geometry.taps[b]
        filtered = np.stack(
            [
                np.stack(
                    [convolve1d_oracle(data[i, j], taps) for j in range(data.shape[1])]
                )
                for i in range(data.shape[0])
            ]
        ).astype(np.float32)
        img = (filtered.astype(np.float64) ** 2).sum(axis=-1).astype(np.float32)

        pad_r = int(geometry.pad_r[b])
        pad_c = int(geometry.pad_c[b])
        canvas = geometry.psfs[b]
        r0 = (canvas.shape[0] - (2 * pad_r + 1)) // 2
        c0 = (canvas.shape[1] - (2 * pad_c + 1)) // 2
        psf = canvas[r0 : r0 + 2 * pad_r + 1, c0 : c0 + 2 * pad_c + 1]

        u = richardson_lucy_oracle(img, psf, int(geometry.n_iter[b]))
        deconvolved = np.maximum(u, 0.0)
        gains = np.sqrt(deconvolved / img)
        acc += (filtered * gains[:, :, None]).astype(np.float64)
    return acc.astype(np.float32)
