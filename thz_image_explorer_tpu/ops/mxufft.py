"""Batched pow2 FFTs as MXU matmul stages (Cooley-Tukey by DFT matmuls).

XLA's native FFT lowering on TPU runs far below the chip's matmul
throughput for the shapes this framework lives on (tens of thousands of
independent 1-D transforms of length 2^10..2^12, the batched per-pixel
FFTs of ``math_tools.rs:330-571`` / the deconvolution FIR bank of
``deconvolution.rs:574-609``): measured ~20 ms for a 40k x 2048 c2r on a
v5e where the equivalent matmul work is <2 ms. This module implements the
same transforms as two Cooley-Tukey stages of small DFT matrices applied
with the MXU (``N = N1*N2``; stage 1 contracts N1, twiddle, stage 2
contracts N2), in float32 throughout:

    X[k1 + N1*k2] = sum_{n2} W_N2[n2,k2] * ( tw[k1,n2] *
                    sum_{n1} x[N2*n1 + n2] * W_N1[n1,k1] )

All complex arithmetic is explicit real/imag f32 pairs — TPUs have no
native complex type, and complex64 arrays at program boundaries trigger
layout bugs on some runtimes, so spectra stay as stacked ``(2, ...)`` f32
arrays end to end.

Accuracy: DFT-matrix matmuls in f32 give ~1e-6 relative error vs numpy's
f64-planned FFT at these lengths (tested in ``tests/test_mxufft.py``),
well inside the framework's float32 parity tolerances.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@lru_cache(maxsize=None)
def _plan(n: int):
    """DFT factor matrices for N = N1*N2 (pow2, near-square split).

    Matrices are f32 numpy constants; they embed into jit programs as
    literals (a few 10s of KB) and land in VMEM.
    """
    n1 = 1
    while n1 * n1 < n:
        n1 *= 2
    n2 = n // n1  # n1 >= n2, both pow2
    j1 = np.arange(n1)
    w1 = np.exp(-2j * np.pi * np.outer(j1, j1) / n1)
    j2 = np.arange(n2)
    w2 = np.exp(-2j * np.pi * np.outer(j2, j2) / n2)
    tw = np.exp(-2j * np.pi * np.outer(j1, j2) / n)  # (k1, n2)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    return (
        n1,
        n2,
        f32(w1.real), f32(w1.imag),
        f32(w2.real), f32(w2.imag),
        f32(tw.real), f32(tw.imag),
    )


def _dft_pow2(xr, xi, n: int, inverse: bool):
    """Full c2c DFT along the last axis (length n, pow2) as MXU matmuls.

    ``xi`` may be None for real input. Returns (re, im). The inverse is
    unnormalized (caller scales by 1/n), matching the unnormalized c2r of
    the reference's ``realfft`` usage (``math_tools.rs:545-569``)."""
    n1, n2, w1r, w1i, w2r, w2i, twr, twi = _plan(n)
    if inverse:
        w1i, w2i, twi = -w1i, -w2i, -twi
    dot = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

    x_r = xr.reshape(xr.shape[:-1] + (n1, n2))
    # stage 1: contract n1 -> (..., k1, n2)
    ar = dot("...ij,ik->...kj", x_r, w1r)
    ai = dot("...ij,ik->...kj", x_r, w1i)
    if xi is not None:
        x_i = xi.reshape(xi.shape[:-1] + (n1, n2))
        ar = ar - dot("...ij,ik->...kj", x_i, w1i)
        ai = ai + dot("...ij,ik->...kj", x_i, w1r)
    # twiddle (k1, n2)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # stage 2: contract n2 -> (..., k1, k2)
    cr = dot("...kj,jl->...kl", br, w2r) - dot("...kj,jl->...kl", bi, w2i)
    ci = dot("...kj,jl->...kl", br, w2i) + dot("...kj,jl->...kl", bi, w2r)
    # flat index k = k1 + n1*k2 -> transpose to (..., k2, k1) before reshape
    cr = jnp.swapaxes(cr, -1, -2).reshape(xr.shape[:-1] + (n,))
    ci = jnp.swapaxes(ci, -1, -2).reshape(xr.shape[:-1] + (n,))
    return cr, ci


def rfft_ri(x: jnp.ndarray, n: int | None = None):
    """Real-to-complex FFT along the last axis; returns a stacked
    ``(2, ..., n//2+1)`` f32 real/imag pair. Matches ``jnp.fft.rfft``."""
    t = x.shape[-1]
    if n is None:
        n = t
    if not _is_pow2(n):  # fall back for exotic lengths
        s = jnp.fft.rfft(x, n=n, axis=-1)
        return jnp.stack([jnp.real(s), jnp.imag(s)]).astype(jnp.float32)
    if n != t:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - t)] if n > t else None
        x = jnp.pad(x, pad) if n > t else x[..., :n]
    cr, ci = _dft_pow2(x.astype(jnp.float32), None, n, inverse=False)
    m = n // 2 + 1
    return jnp.stack([cr[..., :m], ci[..., :m]])


def irfft_ri(spec_ri: jnp.ndarray, n: int) -> jnp.ndarray:
    """Complex-to-real inverse FFT of a stacked ``(2, ..., n//2+1)`` pair
    along the last axis. Matches ``jnp.fft.irfft`` (normalized by 1/n)."""
    if not _is_pow2(n):
        spec = jax.lax.complex(spec_ri[0], spec_ri[1])
        return jnp.fft.irfft(spec, n=n, axis=-1).astype(jnp.float32)
    xr, xi = spec_ri[0], spec_ri[1]
    m = n // 2 + 1
    xr = xr[..., :m]
    xi = xi[..., :m]
    # hermitian extension to length n (even n: bins 1..n/2-1 mirrored)
    tail_r = xr[..., 1:-1][..., ::-1]
    tail_i = -xi[..., 1:-1][..., ::-1]
    fr = jnp.concatenate([xr, tail_r], axis=-1)
    fi = jnp.concatenate([xi, tail_i], axis=-1)
    yr, _yi = _dft_pow2(fr, fi, n, inverse=True)
    return (yr / n).astype(jnp.float32)


def rfft_c64(x: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Convenience complex64 wrapper (for in-program use only — keep
    complex off program boundaries)."""
    ri = rfft_ri(x, n)
    return jax.lax.complex(ri[0], ri[1])


def irfft_c64(spec: jnp.ndarray, n: int) -> jnp.ndarray:
    return irfft_ri(jnp.stack([jnp.real(spec), jnp.imag(spec)]), n)
