"""FIR application as MXU block-banded matmuls.

The reference applies FIR banks with pow2-padded f64 FFT convolutions
(``deconvolution.rs:266-317``, ``psf_tool/fitting.rs:266-284``). On TPU the
same centred zero-boundary result is an exact banded matrix product — the
MXU runs it far faster than XLA's FFT at these batch shapes, and large
padded FFTs mis-lower on some TPU runtimes (see ``ops/mxufft.py``). Each
output block of length ``block`` is one matmul of the sliding input window
against a ``(block + ntaps - 1, block)`` tap matrix that is identical for
every block, so the cost is linear in trace length.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGH

FIR_BLOCK = 256


def fir_block_matrix(taps: np.ndarray, block: int = FIR_BLOCK) -> np.ndarray:
    """Host-precomputed block matrix ``G[m, t] = taps[t + ntaps-1 - m]``
    (zeros outside). The block matrix itself is shift-independent: the
    centring shift of ``out[t] = sum_j x[j] * taps[t - j + shift]`` is
    realized entirely by :func:`window_input`'s left pad — always pair the
    two with the same shift."""
    ntaps = len(taps)
    width = block + ntaps - 1
    m = np.arange(width)[:, None]
    t = np.arange(block)[None, :]
    idx = t + ntaps - 1 - m
    valid = (idx >= 0) & (idx < ntaps)
    return np.where(
        valid, np.asarray(taps, np.float32)[np.clip(idx, 0, ntaps - 1)], 0.0
    ).astype(np.float32)


def window_input(flat: jnp.ndarray, ntaps: int, shift: int, block: int = FIR_BLOCK):
    """Sliding FIR input windows for a (N, T) batch of traces:
    ``xw[n, i, :] = padded_trace[i*block : i*block + width]``."""
    n_time = flat.shape[-1]
    width = block + ntaps - 1
    nb = -(-n_time // block)  # ceil
    t_pad = nb * block
    left = ntaps - 1 - shift
    xp = jnp.pad(flat, ((0, 0), (left, shift + (t_pad - n_time))))
    return jnp.stack(
        [xp[:, i * block : i * block + width] for i in range(nb)], axis=1
    )


@partial(jax.jit, static_argnames=("n_time",))
def _apply_bands(xw, g_blks, *, n_time):
    out = jnp.einsum("pnm,bmt->bpnt", xw, g_blks, precision=_PREC)
    b, p = out.shape[0], out.shape[1]
    return out.reshape(b, p, -1)[..., :n_time]


@partial(jax.jit, static_argnames=("ntaps", "shift", "block", "n_time"))
def _fir_program(flat, g_blks, *, ntaps, shift, block, n_time):
    """Windowing + banded matmul as ONE program. ``window_input``'s
    pad/slice/stack run under this trace — eagerly they would be half a
    dozen separate dispatches, each a full round-trip on remote-tunnelled
    runtimes (measured 559 ms -> ~60 ms per PSF-tool filter call;
    ``scripts/profile_psf.py``)."""
    xw = window_input(flat, ntaps, shift, block)
    return _apply_bands(xw, g_blks, n_time=n_time)


@partial(jax.jit, static_argnames=("ntaps", "shift", "block", "n_time"))
def _fir_intensity_program(flat, g_blks, *, ntaps, shift, block, n_time):
    """Filtering + per-band knife-edge intensity in ONE program.

    The PSF tool's erf fits consume only the per-position sum-of-squares
    (``fitting.rs:159-177``) — 48 kB — while the filtered traces
    themselves (B, P, T ≈ 24 MB) are only read back lazily for the
    individual-fits plot. Computing the reduction in-program lets the
    host fetch the tiny array and leave the cube on device: the previous
    full-cube d2h costs ~850-1010 ms per call on the ~28 MB/s
    tunnelled link (``scripts/profile_psf.py`` full_d2h_ms, measured
    1007 ms 2026-08-17; also the bench psf_tool note).
    """
    xw = window_input(flat, ntaps, shift, block)
    filt = _apply_bands(xw, g_blks, n_time=n_time)
    inten = jnp.sum(filt * filt, axis=-1)  # (B, P)
    lo = jnp.min(inten, axis=1, keepdims=True)
    hi = jnp.max(inten, axis=1, keepdims=True)
    rng = hi - lo
    norm = jnp.where(
        rng > 1e-10, (inten - lo) / jnp.where(rng == 0.0, 1.0, rng), inten
    )
    return filt, norm


_G_CACHE: dict = {}


def _g_blks_device(flipped: np.ndarray, block: int):
    """Device-resident block matrices for a (flipped) tap bank, LRU-cached:
    rebuilding + re-uploading the ~15 MB constant costs ~150-220 ms per
    call on the tunnelled link (``scripts/profile_psf.py``
    gblks_rebuild_ms, measured 147 ms vs 0.0 cached, 2026-08-17) while
    the bank is identical across the PSF tool's left/right × x/y fit
    calls."""
    key = (flipped.tobytes(), flipped.shape, block)
    hit = _G_CACHE.pop(key, None)
    if hit is not None:
        _G_CACHE[key] = hit  # re-insert as most recent
        return hit
    g = jnp.asarray(np.stack([fir_block_matrix(h, block) for h in flipped]))
    _G_CACHE[key] = g
    while len(_G_CACHE) > 4:
        _G_CACHE.pop(next(iter(_G_CACHE)))
    return g


@jax.jit
def average_pair(a, b):
    """``(a + b) / 2`` as ONE compiled program. The PSF tool averages the
    left/right halves' (B, P, T) filtered cubes on device; eager ops on
    the axon backend each pay a remote per-primitive compile (a trivial
    eager add measured ~850 ms cold — ``scripts/profile_psf.py`` probe,
    2026-08-17), and on any backend the eager form dispatches three
    separate full-cube ops."""
    return (a + b) * 0.5


@jax.jit
def take_band(cube, i):
    """``cube[i]`` as a compiled dynamic-slice program: fetch ONE band
    (~1 MB) of a device-resident (B, P, T) cube without an eager slice
    (~835 ms cold on axon — remote per-primitive compile) or a
    full-cube transfer. ``i`` is traced, so every band shares one
    compile."""
    return cube[i]


def fir_correlate_bands_device(
    traces: np.ndarray, taps: np.ndarray, block: int = FIR_BLOCK
):
    """Like :func:`fir_correlate_bands` but returns
    ``(filtered_device, intensities_np)``: the (B, P, T) float32 filtered
    traces as a DEVICE array (no transfer) plus the per-band min-max
    normalized knife-edge intensities (B, P) as numpy (one tiny transfer).
    """
    p, t = np.shape(traces)
    b, l = np.shape(taps)
    mid = l // 2
    shift = l - 1 - mid
    flipped = np.ascontiguousarray(np.asarray(taps, np.float64)[:, ::-1])
    g_blks = _g_blks_device(flipped, block)
    filt, inten = _fir_intensity_program(
        jnp.asarray(np.asarray(traces, np.float32)),
        g_blks,
        ntaps=l, shift=shift, block=block, n_time=t,
    )
    return filt, np.asarray(inten, np.float64)


def fir_correlate_bands(
    traces: np.ndarray, taps: np.ndarray, block: int = FIR_BLOCK
) -> np.ndarray:
    """Zero-boundary 'same' *correlation* of every trace with every band's
    taps (``fitting.rs:266-284`` semantics): (P, T) x (B, L) -> (B, P, T).

    Correlation(s, f) == convolution(s, flip(f)) with the centre index
    ``mid = L // 2``; everything runs as one device program.
    """
    p, t = np.shape(traces)
    b, l = np.shape(taps)
    mid = l // 2
    shift = l - 1 - mid
    flipped = np.ascontiguousarray(np.asarray(taps, np.float64)[:, ::-1])
    # same LRU as the device path: rebuilding + re-uploading the ~15 MB
    # bank costs ~150-220 ms per call on the tunnelled link
    g_blks = _g_blks_device(flipped, block)
    out = _fir_program(
        jnp.asarray(np.asarray(traces, np.float32)),
        g_blks,
        ntaps=l, shift=shift, block=block, n_time=t,
    )
    return np.asarray(out, np.float64)
