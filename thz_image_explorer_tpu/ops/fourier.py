"""Batched forward / inverse FFT over the scan cube.

TPU-native replacement for the rayon-parallel per-pixel loops in
``/root/reference/src/math_tools.rs:330-571``: a single ``jnp.fft.rfft`` over
the whole ``(X, Y, T)`` cube, with amplitude / unwrapped-phase extraction
fused by XLA, and a parallel-friendly phase unwrap (diff → wrap → cumsum)
replacing the sequential scan of ``numpy_unwrap`` (``math_tools.rs:211-240``).

Semantics preserved exactly:

* the window **mutates** the time-domain data before the FFT, so downstream
  stages see the *windowed* traces (``math_tools.rs:349-371``);
* ``realfft``'s unnormalized r2c forward == ``jnp.fft.rfft``; its c2r with an
  explicit 1/N == ``jnp.fft.irfft`` (``math_tools.rs:545-569``);
* phase unwrap uses period 2π with strict ``> π`` comparisons.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from thz_image_explorer_tpu.data import ScanCube
from thz_image_explorer_tpu.ops import mxufft
from thz_image_explorer_tpu.ops.windows import WindowType, window_array


def _rfft(x: jnp.ndarray, time_weight=None) -> jnp.ndarray:
    """Batched r2c along the last axis: MXU DFT matmuls on TPU (~10x the
    native FFT's throughput at these batch shapes — see ops/mxufft),
    XLA's FFT elsewhere. ``time_weight``: compute ``rfft(w * x)`` with
    the window folded into the DFT matrix (``mxufft.rfft_ri``)."""
    if mxufft.use_matmul_fft():
        ri = mxufft.rfft_ri(x, time_weight=time_weight)
        return jax.lax.complex(ri[0], ri[1])
    if time_weight is not None:
        x = x * time_weight.astype(x.dtype)
    return jnp.fft.rfft(x, axis=-1)


def _irfft(spec: jnp.ndarray, n: int, freq_weight=None,
           out_weight=None) -> jnp.ndarray:
    """``freq_weight``: compute ``irfft(w * spec)`` with the weight folded
    into the inverse DFT matrix (``mxufft.irfft_ri``) — no cube-sized
    masked-spectrum materialization. ``out_weight``: scale the OUTPUT
    samples the same way (folded TD-after masks)."""
    if mxufft.use_matmul_fft():
        return mxufft.irfft_ri(
            jnp.stack([jnp.real(spec), jnp.imag(spec)]), n,
            freq_weight=freq_weight, out_weight=out_weight,
        )
    if freq_weight is not None:
        spec = spec * freq_weight
    out = jnp.fft.irfft(spec, n=n, axis=-1).astype(jnp.float32)
    if out_weight is not None:
        out = out * out_weight.astype(out.dtype)
    return out


@lru_cache(maxsize=None)
def _cumsum_matrix(n: int):
    """Upper-triangular ones (n, n): ``x @ U`` is an exact inclusive
    cumsum along the last axis, computed on the MXU."""
    return np.triu(np.ones((n, n), np.float32))


_CUMSUM_BLOCK = 128


def _cumsum_last(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along the last axis.

    On TPU, ``jnp.cumsum`` along the lane axis is a multi-pass VPU prefix
    scan — measured ~3.2 ms device for a 40000x513 unwrap at the bench
    shape, the single largest non-floor phase of the interactive chain.
    A matmul against a triangular ones matrix does the same reduction on
    the MXU; HIGHEST precision keeps the partial sums in f32 (the
    adjustment sums reach hundreds of radians, and the optical-property
    phases consume differences of them).

    Two-level blocked form: in-block prefix via a (128, 128) triangular
    matmul plus tiny exclusive block offsets — n/128x fewer FLOPs than
    the dense (n, n) triangular at identical results (the offsets are the
    same f32 adds the dense matmul's accumulator performs), measured
    ~0.45 ms faster at the bench shape (scripts/profile_roofline.py).
    """
    n = x.shape[-1]
    if not mxufft.use_matmul_fft() or n > mxufft.MAX_MATMUL_N:
        return jnp.cumsum(x, axis=-1)
    b = _CUMSUM_BLOCK
    if n <= b:
        u = jnp.asarray(_cumsum_matrix(n))
        return jnp.dot(x, u, precision=jax.lax.Precision.HIGHEST)
    k = (n + b - 1) // b
    pad = k * b - n
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)]) if pad else x
    blocks = xp.reshape(x.shape[:-1] + (k, b))
    u = jnp.asarray(_cumsum_matrix(b))
    inblock = jnp.dot(blocks, u, precision=jax.lax.Precision.HIGHEST)
    # exclusive prefix of the per-block totals (tiny: k values per row)
    totals = inblock[..., -1]
    offsets = jnp.cumsum(totals, axis=-1) - totals
    out = (inblock + offsets[..., None]).reshape(x.shape[:-1] + (k * b,))
    return out[..., :n]


def wrap_adjust(d: jnp.ndarray) -> jnp.ndarray:
    """The parity-critical 2π wrap rule on raw diffs: strict ``> π`` /
    ``< -π`` comparisons, one correction (``math_tools.rs:226-238`` —
    a jump of exactly π is kept). THE single source of truth: used by
    :func:`phase_increments`/:func:`unwrap` and inside the pallas
    spectral-reduction kernel (``ops/pallas_specred._kernel``)."""
    two_pi = jnp.asarray(2.0 * jnp.pi, d.dtype)
    return d - two_pi * (d > jnp.pi) + two_pi * (d < -jnp.pi)


def phase_increments(phase: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """The cumsum-free unwrap representation: ``[phi_0, wrapped diffs]``
    along ``axis`` (same shape as the input), such that an inclusive
    cumsum reproduces :func:`unwrap` — and hence the reference's
    sequential unwrap loop (``math_tools.rs:226-238``) — exactly.

    The point (round-4 perf): the cumsum is LINEAR, so it commutes with
    every reduction the lean publisher takes (pixel means, ROI masked
    means, pixel slices). The fused lean program therefore carries this
    elementwise-only encoding through the chain — the FD filters never
    touch phases — reduces it, and finishes tiny ``(F,)``/``(R, F)``
    cumsums, instead of paying the cube-wide (N, F) cumsum matmul plus
    a ~164 MB phase-cube materialization per update.
    """
    phase = jnp.moveaxis(phase, axis, -1)
    d_adj = wrap_adjust(phase[..., 1:] - phase[..., :-1])
    out = jnp.concatenate([phase[..., :1], d_adj], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def finish_unwrap(increments: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inclusive cumsum turning (reduced) :func:`phase_increments` back
    into true unwrapped phases (``math_tools.rs:226-238`` semantics).
    Meant for small post-reduction arrays — plain ``jnp.cumsum`` (VPU)
    is the right tool there; the cube-sized path uses the blocked matmul
    inside :func:`unwrap`."""
    return jnp.cumsum(increments, axis=axis)


def unwrap(phase: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """numpy-compatible 1-D phase unwrap with period 2π.

    Parallel reformulation of the reference's sequential loop
    (``math_tools.rs:226-238``): the blocked MXU cumsum of the
    :func:`phase_increments` encoding — ONE source of truth for the
    parity-critical wrap rule (strict ``> π`` comparisons; a jump of
    exactly π is kept), so unwrap and the lean increments encoding can
    never desynchronize.
    """
    inc = jnp.moveaxis(phase_increments(phase, axis), axis, -1)
    return jnp.moveaxis(_cumsum_last(inc), -1, axis)


@partial(jax.jit,
         static_argnames=("window_type", "lean_phases", "wide_spec"))
def forward_fft(
    cube: ScanCube,
    window_type: WindowType,
    window_low,
    window_high,
    *,
    lean_phases: bool = False,
    pre_weight=None,
    wide_spec: bool = False,
) -> ScanCube:
    """Window + batched real FFT + amplitude / unwrapped phase.

    Equivalent of ``fft()`` (``math_tools.rs:330-398``) over all pixels at
    once. ``window_low``/``window_high`` are traced scalars (ps) used only by
    the adapted Blackman window.

    ``lean_phases=True`` (fused lean programs only) stores the
    :func:`phase_increments` encoding in the ``phases`` leaf instead of
    the unwrapped phases: the publisher reduces increments and finishes
    tiny cumsums (:func:`finish_unwrap`), mathematically identical to
    reducing the unwrap (cumsum is linear) but without the cube-wide
    cumsum matmul or the materialized phase cube. No chain stage between
    the FFT and the publisher reads phases (FD filters leave them
    untouched, ``band_pass_fd.rs``), so the encoding is an internal
    contract of the lean program.

    ``pre_weight`` (traced (T,), lean programs only): the factored
    product of folded TD-before masks — multiplied into the window so
    the whole pre-FFT time weighting folds into ONE DFT matrix
    (``mxufft.rfft_ri`` ``time_weight``); the returned ``data`` leaf
    then carries the full weighting (window AND folded masks — the
    reference's mutate-before-FFT semantics, ``math_tools.rs:349-371``).

    ``wide_spec=True`` (fold-path lean programs on the matmul-DFT path
    only): the ``fft`` leaf carries the WIDE ``(X, Y, 2m)`` f32
    ``[real | imag]`` layout of ``mxufft.rfft_wide`` instead of a
    complex64 cube — the exact operand layout the inverse DFT matmul
    contracts, so the forward -> inverse round trip moves zero relayout
    bytes (~0.27 GB / ~0.4 ms at the bench shape, /tmp/probe_wide.py
    2026-08-18). Only valid when no stage between fft and ifft reads
    ``cube.fft`` (the FD-fold contract); :func:`inverse_fft` must be
    called with the same flag.
    """
    w = window_array(cube.time, window_type, window_low, window_high)
    if pre_weight is not None:
        w = w * pre_weight.astype(w.dtype)
    # window folded into the DFT matrix: the matmul reads the RAW cube
    # and the windowed `data` leaf below is lazy — materialized only for
    # consumers (exact-mode slots; lean programs replace it at the ifft
    # and XLA drops it entirely)
    if wide_spec:
        spec = mxufft.rfft_wide(cube.data, time_weight=w)
        m = spec.shape[-1] // 2
        yr, yi = spec[..., :m], spec[..., m:]
        amplitudes = jnp.sqrt(yr * yr + yi * yi)
        ang = jnp.arctan2(yi, yr)
    else:
        spec = _rfft(cube.data, time_weight=w).astype(jnp.complex64)
        amplitudes = jnp.abs(spec)
        ang = jnp.angle(spec)
    data = cube.data * w.astype(cube.data.dtype)
    phases = phase_increments(ang) if lean_phases else unwrap(ang)
    return cube.replace(
        data=data,
        fft=spec,
        amplitudes=amplitudes.astype(jnp.float32),
        phases=phases.astype(jnp.float32),
    )


@partial(jax.jit, static_argnames=("avg_in_fourier_space",
                                   "phases_encoded", "wide_spec"))
def inverse_fft(cube: ScanCube, avg_in_fourier_space: bool = False,
                phases_encoded: bool = False,
                fd_weights=None, td_weights=None,
                wide_spec: bool = False) -> ScanCube:
    """Batched inverse FFT plus pixel-mean spectra.

    Equivalent of ``ifft()`` (``math_tools.rs:418-571``) minus the ROI
    handling, which is a host-masked reduction in
    :mod:`thz_image_explorer_tpu.ops.roi` (ROI sets change pipeline-external
    state, so they are kept out of this jitted stage).

    * mean complex spectrum / amplitude / phase over all pixels
      (``math_tools.rs:421-440``) — the only cross-pixel reduction in the
      whole pipeline (an ICI ``psum`` when the cube is sharded);
    * optionally reconstruct the average trace from polar means
      (``math_tools.rs:442-470``);
    * per-pixel c2r with 1/N normalization (``math_tools.rs:545-569``).

    ``fd_weights`` (traced (F,) f32 in [0, 1], lean programs only): the
    factored per-frequency product of the active FD stages, applied HERE
    instead of as cube-sized mask passes between fft and ifft. The masked
    spectrum is never materialized: the irfft folds the weight into its
    inverse DFT matrix, every pixel-mean commutes with a per-frequency
    weight (``mean(w * x) == w * mean(x)``), amplitudes scale as
    ``|w * s| == w * |s|`` (weights are nonnegative by construction,
    ``ops/bandpass.py``), and FD stages never touch phases
    (``band_pass_fd.rs`` — fusion contract pinned by
    ``tests/test_lean_publish.py``).

    ``td_weights`` (traced (T,), lean programs only): the factored
    product of folded TD-AFTER masks, applied by scaling the inverse DFT
    matrix columns — ``data`` comes out post-TD-band-pass without a
    cube-sized mask pass. Per-pixel transform only (the exact chain's
    TD-after stages touch ``data``, never ``avg_data``).

    ``wide_spec``: ``cube.fft`` carries the WIDE ``(X, Y, 2m)`` layout
    of ``forward_fft(wide_spec=True)`` — the irfft contracts it
    directly (``mxufft.irfft_wide``, zero relayout) and the published
    ``avg_fft`` is assembled complex AFTER the pixel-mean reduction
    (an (F,)-sized join instead of a cube-sized one). The returned
    ``fft`` leaf stays wide (lean finals drop it; nothing else may
    read it — the fold contract)."""
    from thz_image_explorer_tpu.data import masked_pixel_mean

    n_time = cube.time.shape[0]
    # means restricted to the valid region of a bucket-padded grid
    # (padded pixels are zero; they must not dilute the denominator)
    avg_fft_red = masked_pixel_mean(cube.fft, cube.valid_wh)
    avg_fft = (
        mxufft.wide_to_complex(avg_fft_red) if wide_spec else avg_fft_red
    )
    avg_signal_fft = masked_pixel_mean(cube.amplitudes, cube.valid_wh)
    avg_phase_fft = masked_pixel_mean(cube.phases, cube.valid_wh)
    fft_out, amps_out = cube.fft, cube.amplitudes
    if fd_weights is not None:
        w = fd_weights.astype(jnp.float32)
        avg_fft = avg_fft * w
        avg_signal_fft = avg_signal_fft * w
        # lazy weighted leaves: publish consumes only pixel slices of
        # these (XLA narrows elementwise-into-slice), and the lean final
        # slot drops them entirely — no full-cube pass unless a consumer
        # genuinely reads one
        fft_out = cube.fft * (jnp.concatenate([w, w]) if wide_spec else w)
        amps_out = cube.amplitudes * w

    avg_data = cube.avg_data
    if avg_in_fourier_space:
        # with the lean increments encoding the MEAN stays encoded (the
        # publisher finishes it); the polar reconstruction needs the true
        # unwrapped mean phase here
        ph = finish_unwrap(avg_phase_fft) if phases_encoded else avg_phase_fft
        spectrum = avg_signal_fft * jnp.exp(1j * ph)
        avg_data = _irfft(spectrum, n_time)

    if wide_spec:
        data = mxufft.irfft_wide(cube.fft, n_time, freq_weight=fd_weights,
                                 out_weight=td_weights)
    else:
        data = _irfft(cube.fft, n_time, freq_weight=fd_weights,
                      out_weight=td_weights)

    return cube.replace(
        data=data,
        fft=fft_out,
        amplitudes=amps_out,
        avg_data=avg_data,
        avg_fft=avg_fft.astype(jnp.complex64),
        avg_signal_fft=avg_signal_fft.astype(jnp.float32),
        avg_phase_fft=avg_phase_fft.astype(jnp.float32),
    )


@partial(jax.jit, static_argnames=("n_time",))
def polar_irfft(amplitude: jnp.ndarray, phase: jnp.ndarray, n_time: int) -> jnp.ndarray:
    """Reconstruct a real time trace from amplitude+phase spectra.

    Used for ROI traces in avg-in-Fourier mode (``math_tools.rs:496-529``);
    the reference zeroes the imaginary part of the DC bin, which ``irfft``
    does implicitly.
    """
    spectrum = amplitude * jnp.exp(1j * phase)
    return _irfft(spectrum, n_time)
