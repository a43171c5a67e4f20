"""Batched FFTs as MXU DFT matmuls.

XLA's native FFT lowering on TPU runs far below the chip's matmul
throughput for the shapes this framework lives on (tens of thousands of
independent 1-D transforms of length 2^8..2^12 — the batched per-pixel
FFTs of ``math_tools.rs:330-571``): measured ~6.4 ms device time for a
40k x 1024 r2c on a v5e vs ~0.4 ms for the same transform as two dense
DFT matmuls (cos/sin matrices), despite the matmul doing ~10x the FLOPs —
the MXU at ~60 TFLOP/s (bf16x3) simply crushes the FFT kernel's VPU
schedule at these batch sizes. Two-stage Cooley-Tukey factorizations
lose across the whole radix range, not just at 32x32: measured at the
bench shape (43264 x 1024, scripts/micro_twostage.py, 2026-08-17) the
dense fused matmul runs 3.3 ms while 64x16 / 128x8 / 256x4 / 512x2
factored variants run 7.7 / 8.8 / 9.5 / 11.1 ms — every factorization
leaves one reshaped axis far below the 128-lane register width, and the
relayout + padding waste exceeds the 4-16x FLOP saving. So this module
uses single-stage dense DFT matrices up to ``MAX_MATMUL_N`` and falls
back to ``jnp.fft`` above.

All complex arithmetic is explicit real/imag f32 pairs — TPUs have no
native complex type, and complex64 arrays at program boundaries trigger
layout bugs on some runtimes (see ``ops/deconvolution.py``), so spectra
stay as stacked ``(2, ...)`` f32 arrays.

Accuracy: f32 DFT matmuls at HIGH (bf16x3) precision give ~1e-5 relative
error vs numpy's f64-planned FFT at these lengths (``tests/test_mxufft.py``),
inside the framework's float32 parity tolerances.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGH

# Above this length the n x (n/2+1) DFT matrices get large (and FLOPs grow
# quadratically per trace); fall back to the native FFT.
MAX_MATMUL_N = 8192


@lru_cache(maxsize=None)
def _fwd_matrices(n: int):
    """cos/sin DFT matrices (n, n//2+1) for r2c: ``X = x @ (C + iS)``."""
    m = n // 2 + 1
    nk = np.outer(np.arange(n), np.arange(m)) * (2.0 * np.pi / n)
    return (
        np.cos(nk).astype(np.float32),
        (-np.sin(nk)).astype(np.float32),
    )


@lru_cache(maxsize=None)
def _fwd_matrix_fused(n: int):
    """``[C | S]`` as ONE (n, 2(n//2+1)) matrix: the forward DFT as a
    single MXU matmul. Two separate (n, m) dots measured 30 TFLOP/s on a
    v5e — XLA schedules them as independent matmuls that each re-stream
    ``x`` and pad the odd m=n/2+1 output to lanes — while the fused dot
    runs at ~65 TFLOP/s, the bf16x3 (Precision.HIGH) ceiling
    (scripts/micro_matmul.py, 2026-08-17: 3.03 ms vs 1.91 ms for the
    43264x1024 bench-shape transform)."""
    c, s = _fwd_matrices(n)
    return np.concatenate([c, s], axis=1)


@lru_cache(maxsize=None)
def _inv_matrices(n: int):
    """Inverse matrices (n//2+1, n) with hermitian weights and 1/n folded:
    ``y = Xr @ A + Xi @ B`` reconstructs the real irfft."""
    m = n // 2 + 1
    w = np.full(m, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    kn = np.outer(np.arange(m), np.arange(n)) * (2.0 * np.pi / n)
    a = (w[:, None] * np.cos(kn) / n).astype(np.float32)
    b = (-w[:, None] * np.sin(kn) / n).astype(np.float32)
    return a, b


@lru_cache(maxsize=None)
def _inv_matrix_fused(n: int, out_start: int, out_len: int):
    """``[A; B]`` as ONE (2(n//2+1), n-slice) matrix:
    ``concat(Xr, Xi) @ [A; B]`` == ``Xr@A + Xi@B`` as a single MXU matmul
    (same two-dots-vs-one finding as :func:`_fwd_matrix_fused`)."""
    a, b = _inv_matrices(n)
    ab = np.concatenate([a, b], axis=0)
    if out_start != 0 or out_len != n:
        ab = ab[:, out_start : out_start + out_len]
    return ab


def use_matmul_fft() -> bool:
    """Whether the batched FFT ops should take the DFT-matmul path: on by
    default on TPU, off elsewhere (CPU FFTs beat CPU matmul DFTs);
    override with ``THZ_FFT_IMPL=matmul|native``."""
    import os

    impl = os.environ.get("THZ_FFT_IMPL", "auto")
    if impl == "matmul":
        return True
    if impl == "native":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def rfft_ri(x: jnp.ndarray, n: int | None = None,
            time_weight: jnp.ndarray | None = None):
    """Real-to-complex FFT along the last axis; returns a stacked
    ``(2, ..., n//2+1)`` f32 real/imag pair. Matches ``jnp.fft.rfft``.

    ``time_weight`` (traced, length = ``x.shape[-1]`` — it weights the
    INPUT samples, truncated with ``x`` when ``n < t``) computes
    ``rfft(w * x)`` by scaling the DFT matrix ROWS — the window is
    diagonal in exactly the contracted axis, so folding it into the
    (t, 2m) matrix (a ~4 MB temporary) lets the matmul read the RAW cube
    instead of materializing a windowed copy in HBM (the round-4
    lean-chain fold, mirror of ``irfft_ri``'s ``freq_weight``; A/B
    measurement: ``scripts/profile_fold.py``)."""
    t = x.shape[-1]
    if n is None:
        n = t
    if n > MAX_MATMUL_N:
        if time_weight is not None:
            x = x * time_weight.astype(x.dtype)
        s = jnp.fft.rfft(x, n=n, axis=-1)
        return jnp.stack([jnp.real(s), jnp.imag(s)]).astype(jnp.float32)
    if n < t:
        x = x[..., :n]
    m = n // 2 + 1
    cs = _fwd_matrix_fused(n)
    if n > t:
        # zero-padding contributes nothing: drop those DFT-matrix rows
        # instead of materialising a padded input (exact, and halves the
        # matmul FLOPs for the typical conv padding n ~ 2t)
        cs = cs[:t]
    if time_weight is not None:
        # cs now has min(n, t) rows; the weight tracks x's truncation
        cs = cs * time_weight.astype(jnp.float32)[: cs.shape[0], None]
    x = x.astype(jnp.float32)
    y = jnp.dot(x, cs, precision=_PREC)  # ONE fused [C|S] matmul
    return jnp.stack([y[..., :m], y[..., m:]])


def irfft_ri(
    spec_ri: jnp.ndarray,
    n: int,
    out_start: int = 0,
    out_len: int | None = None,
    freq_weight: jnp.ndarray | None = None,
    out_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Complex-to-real inverse FFT of a stacked ``(2, ..., m)`` pair along
    the last axis. Matches ``jnp.fft.irfft`` (normalized by 1/n) — i.e.
    ``realfft``'s unnormalized c2r with the explicit 1/N of
    ``math_tools.rs:545-569``.

    ``out_start``/``out_len`` select a window of the length-``n`` output
    (equivalent to ``[..., out_start : out_start + out_len]`` afterwards)
    by slicing the inverse DFT matrix columns — exact, and proportionally
    cheaper when the caller only keeps the centre of a padded transform.

    ``freq_weight`` (traced (m,) f32) computes ``irfft(w * spec)`` by
    scaling the inverse DFT matrix ROWS instead of the spectrum: the
    weight is diagonal in exactly the contracted axis, so folding it into
    the (2m, out) matrix (a ~4 MB temporary) deletes the cube-sized
    elementwise pass that a ``w * spec`` operand would materialize in HBM
    before the matmul (the round-4 lean-chain fold; A/B measurement:
    ``scripts/profile_fold.py``).

    ``out_weight`` (traced, length ``out_len``) additionally scales the
    OUTPUT samples — ``w_out * irfft(w_f * spec)[out_start:...]`` — by
    scaling the matrix COLUMNS: the same fold for time-domain masks
    applied after the inverse transform (TD band-pass after iFFT)."""
    if out_len is None:
        out_len = n - out_start
    m = n // 2 + 1
    if n > MAX_MATMUL_N:
        spec = jax.lax.complex(spec_ri[0], spec_ri[1])
        if freq_weight is not None:
            spec = spec * freq_weight.astype(spec_ri.dtype)
        out = jnp.fft.irfft(spec, n=n, axis=-1).astype(jnp.float32)
        out = out[..., out_start : out_start + out_len]
        if out_weight is not None:
            out = out * out_weight.astype(jnp.float32)
        return out
    ab = _inv_matrix_fused(n, out_start, out_len)
    if freq_weight is not None:
        w = freq_weight.astype(jnp.float32)
        ab = ab * jnp.concatenate([w, w])[:, None]
    if out_weight is not None:
        ab = ab * out_weight.astype(jnp.float32)[None, :]
    xr = spec_ri[0][..., :m].astype(jnp.float32)
    xi = spec_ri[1][..., :m].astype(jnp.float32)
    x = jnp.concatenate([xr, xi], axis=-1)
    return jnp.dot(x, ab, precision=_PREC)


def rfft_wide(x: jnp.ndarray,
              time_weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """r2c FFT in the WIDE layout: returns the raw ``(..., 2m)``
    ``[real | imag]`` output of the fused ``x @ [C | S]`` matmul with NO
    relayout — exactly the operand layout :func:`irfft_wide` contracts,
    so a forward -> inverse round trip moves zero extra HBM bytes. The
    round-4 lean chain carries this layout end-to-end (the complex
    spectrum is never assembled): the stack/complex/stack/concat chain
    between the two DFT matmuls survived XLA's fusion as ~0.27 GB of
    relayout traffic at the bench shape (measured 2026-08-18,
    /tmp/probe_wide.py: 5.51 -> 5.13 ms, 2.20 -> 1.93 GB). Same
    ``time_weight`` fold as :func:`rfft_ri`. Matmul lengths only."""
    t = x.shape[-1]
    if t > MAX_MATMUL_N:
        raise ValueError("rfft_wide is matmul-path only")
    cs = _fwd_matrix_fused(t)
    if time_weight is not None:
        cs = cs * time_weight.astype(jnp.float32)[:, None]
    return jnp.dot(x.astype(jnp.float32), cs, precision=_PREC)


def irfft_wide(
    y: jnp.ndarray,
    n: int,
    freq_weight: jnp.ndarray | None = None,
    out_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """c2r inverse FFT of a WIDE ``(..., 2m)`` ``[real | imag]`` spectrum
    (:func:`rfft_wide`'s layout): ONE ``y @ [A; B]`` matmul, no concat.
    Same ``freq_weight``/``out_weight`` folds as :func:`irfft_ri`."""
    if n > MAX_MATMUL_N:
        raise ValueError("irfft_wide is matmul-path only")
    ab = _inv_matrix_fused(n, 0, n)
    if freq_weight is not None:
        w = freq_weight.astype(jnp.float32)
        ab = ab * jnp.concatenate([w, w])[:, None]
    if out_weight is not None:
        ab = ab * out_weight.astype(jnp.float32)[None, :]
    return jnp.dot(y.astype(jnp.float32), ab, precision=_PREC)


def wide_to_complex(y: jnp.ndarray) -> jnp.ndarray:
    """Assemble a complex64 spectrum from the WIDE layout (for tiny
    post-reduction vectors — never call this on a cube-sized array)."""
    m = y.shape[-1] // 2
    return jax.lax.complex(y[..., :m], y[..., m:]).astype(jnp.complex64)


def rfft_c64(x: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Convenience complex64 wrapper (for in-program use only — keep
    complex off program boundaries)."""
    ri = rfft_ri(x, n)
    return jax.lax.complex(ri[0], ri[1])


def irfft_c64(spec: jnp.ndarray, n: int) -> jnp.ndarray:
    return irfft_ri(jnp.stack([jnp.real(spec), jnp.imag(spec)]), n)
