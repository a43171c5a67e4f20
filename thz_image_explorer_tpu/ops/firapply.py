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
    runtimes (measured 559 ms -> ~60 ms per PSF-tool filter call)."""
    xw = window_input(flat, ntaps, shift, block)
    return _apply_bands(xw, g_blks, n_time=n_time)


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
    flipped = np.asarray(taps, np.float64)[:, ::-1]
    g_blks = np.stack([fir_block_matrix(h, block) for h in flipped])
    out = _fir_program(
        jnp.asarray(np.asarray(traces, np.float32)),
        jnp.asarray(g_blks),
        ntaps=l, shift=shift, block=block, n_time=t,
    )
    return np.asarray(out, np.float64)
