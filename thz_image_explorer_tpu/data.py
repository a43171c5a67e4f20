"""Device-resident scan-cube data model.

TPU-native equivalent of the reference's per-stage dataset
``ScannedImageFilterData`` (``/root/reference/src/data_container.rs:109-195``).

Differences from the reference, by design:

* The cube is a **pytree of device arrays** with static shape metadata, so a
  whole pipeline stage is one jit-compiled pure function ``cube -> cube``.
* The reference caches ``realfft`` r2c/c2r plans inside the struct
  (``data_container.rs:127-129``); under XLA the FFT is compiled into the
  stage program, so plans disappear entirely.
* Pixel selection and ROI polygons are *host* concerns (they only affect
  which 1-D slices get published for plotting, see
  ``data_thread.rs:853-903``), so they live outside the pytree to keep jit
  signatures stable. ROI reductions are computed from host-built masks.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    """Register a dataclass as a JAX pytree, honoring ``static`` metadata."""
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    return jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )


def static_field(**kwargs):
    kwargs.setdefault("metadata", {})
    kwargs["metadata"] = dict(kwargs["metadata"], static=True)
    return dataclasses.field(**kwargs)


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class ScanCube:
    """One pipeline stage's dataset: time- and frequency-domain views.

    Axis convention follows the reference: ``data[x, y, t]`` where axis 0 is
    the scan's x/width direction (``data_container.rs:136-137``).

    Array fields (pytree leaves, device arrays):

    time            (T,)    f32  time axis in ps
    data            (X,Y,T) f32  time-domain traces
    freq            (F,)    f32  frequency axis in THz, F = T//2 + 1
    fft             (X,Y,F) c64  complex spectra (``rfft`` of ``data``)
    amplitudes      (X,Y,F) f32  |fft|
    phases          (X,Y,F) f32  unwrapped angle(fft)
    avg_data        (T,)    f32  mean time trace (only when avg-in-Fourier)
    avg_fft         (F,)    c64  pixel-mean complex spectrum
    avg_signal_fft  (F,)    f32  pixel-mean amplitude
    avg_phase_fft   (F,)    f32  pixel-mean unwrapped phase
    valid_wh        (2,)    i32  valid (width, height): the loader pads the
                                 pixel grid up to a shape bucket so novel
                                 scan sizes reuse compiled programs
                                 (SURVEY §7 "bucketed/padded recompile
                                 strategy"); padded pixels are zero and
                                 every cross-pixel reduction masks to the
                                 valid region. TRACED (a leaf), so cubes of
                                 different valid sizes share programs.

    Static fields (pytree aux data — changing them recompiles stages):

    dx, dy          spatial steps in mm (None when unknown)
    x_min, y_min    scan origin in mm (None when unknown)
    scaling         current spatial downscale factor (1 = native)
    """

    time: jax.Array
    data: jax.Array
    freq: jax.Array
    fft: jax.Array
    amplitudes: jax.Array
    phases: jax.Array
    avg_data: jax.Array
    avg_fft: jax.Array
    avg_signal_fft: jax.Array
    avg_phase_fft: jax.Array
    valid_wh: jax.Array = None  # (2,) i32; None only transiently pre-init

    dx: Optional[float] = static_field(default=None)
    dy: Optional[float] = static_field(default=None)
    x_min: Optional[float] = static_field(default=None)
    y_min: Optional[float] = static_field(default=None)
    scaling: int = static_field(default=1)

    # ---- derived shape helpers (static) ----
    @property
    def width(self) -> int:
        return self.data.shape[0]

    @property
    def height(self) -> int:
        return self.data.shape[1]

    @property
    def n_time(self) -> int:
        return self.data.shape[2]

    @property
    def n_freq(self) -> int:
        # the freq axis is always present and has exactly the spectral
        # bin count — the fft leaf may be None (the lean executor's final
        # slot nulls the spectral cubes) or carry the WIDE (X, Y, 2m)
        # [real | imag] layout (fold-path lean programs,
        # ops/fourier.forward_fft wide_spec), so never measure it
        return self.freq.shape[0]

    def replace(self, **kwargs) -> "ScanCube":
        return dataclasses.replace(self, **kwargs)


def frequency_axis(time) -> jnp.ndarray:
    """Frequency axis the way the reference computes it at load time.

    ``io.rs:614-621``: ``freq[i] = i / (time[-1] - time[0])`` for
    ``i in 0..T//2+1`` — i.e. bins of ``1/range`` THz (time in ps). Note this
    is ``i/range`` and *not* ``i/(T*dt)``; we reproduce it exactly.

    Works under jit (traced ``time``) and eagerly; the eager path computes
    on host to avoid per-op device dispatch (which some backends don't
    support and which would be slow anyway).
    """
    n = time.shape[0]
    if isinstance(time, jax.core.Tracer):
        rng = time[-1] - time[0]
        return jnp.arange(n // 2 + 1, dtype=jnp.float32) / rng
    t = np.asarray(time)
    rng = np.float32(t[-1] - t[0])
    return jnp.asarray(np.arange(n // 2 + 1, dtype=np.float32) / rng)


def masked_pixel_mean(x: jnp.ndarray, valid_wh) -> jnp.ndarray:
    """Mean over the pixel axes (0, 1) restricted to the valid region —
    exact on bucket-padded cubes (padded pixels must not dilute the
    denominator). When the cube is sharded this is the ICI ``psum`` of
    the pipeline.

    No mask pass is needed: padded pixels are EXACTLY zero by
    construction (the loader pads with zeros; DC-offset subtraction maps
    0 to 0; every pipeline stage is linear or multiplicative in the pixel
    values — window/band-pass multiplies, DFT matmuls, tilt's gather with
    zero head-fill — so zeros are preserved through the whole chain and
    the plain sum already equals the valid-region sum). Measured: the
    mask-multiply variant cost ~1.2 ms/update at the 200x200x1024 bench
    shape — three extra passes over the spectra
    (scripts/profile_fused.py)."""
    count = jnp.maximum(valid_wh[0] * valid_wh[1], 1).astype(x.dtype)
    return jnp.sum(x, axis=(0, 1)) / count


def make_cube(
    time,
    data,
    dx: Optional[float] = None,
    dy: Optional[float] = None,
    x_min: Optional[float] = None,
    y_min: Optional[float] = None,
    scaling: int = 1,
    valid_wh: Optional[tuple[int, int]] = None,
) -> ScanCube:
    """Build a ScanCube from a time axis and a raw (X, Y, T) array.

    Spectral fields are allocated zero-filled at the load-time frequency
    resolution, mirroring ``io.rs:626-628``. ``valid_wh`` marks the valid
    pixel region of a bucket-padded grid (defaults to the full grid).
    """
    # freq axis BEFORE the device conversion: with host `time` input the
    # whole computation stays on host (frequency_axis's eager path) — on
    # a device array it pulls time back, a d2h that costs a tunnel RTT
    # per open and on axon can deadlock against queued transfers
    # (2026-08-19 forensics); tracer/device inputs keep their old paths
    freq = frequency_axis(time)
    time = jnp.asarray(time, jnp.float32)
    data = jnp.asarray(data, jnp.float32)
    if data.ndim != 3:
        raise ValueError(f"data must be (X, Y, T), got shape {data.shape}")
    nf = freq.shape[0]
    x, y = data.shape[0], data.shape[1]
    if valid_wh is None:
        valid_wh = (x, y)
    zeros = lambda shape, dt: device_zeros(shape=shape, dtype=dt)
    return ScanCube(
        time=time,
        data=data,
        freq=freq,
        fft=zeros((x, y, nf), np.complex64),
        amplitudes=zeros((x, y, nf), np.float32),
        phases=zeros((x, y, nf), np.float32),
        avg_data=zeros((time.shape[0],), np.float32),
        avg_fft=zeros((nf,), np.complex64),
        avg_signal_fft=zeros((nf,), np.float32),
        avg_phase_fft=zeros((nf,), np.float32),
        valid_wh=jnp.asarray(np.asarray(valid_wh, np.int32)),
        dx=dx,
        dy=dy,
        x_min=x_min,
        y_min=y_min,
        scaling=scaling,
    )


@partial(jax.jit, static_argnames=("shape", "dtype"))
def device_zeros(*, shape, dtype) -> jnp.ndarray:
    """Zero-filled device allocation as a compiled program: neither an
    eager op (a remote per-primitive compile on axon, ~1 s cold) nor a
    host->device transfer
    (hundreds of MB over a tunnelled device)."""
    return jnp.zeros(shape, dtype)


@partial(jax.jit, donate_argnums=0)
def _load_kernel(data: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    data = data - data[:, :, :1]
    return data, jnp.sum(data * data, axis=-1)


@jax.jit
def _device_f32_copy(x: jnp.ndarray) -> jnp.ndarray:
    # a non-donating jit always returns a fresh buffer — used to shield
    # caller-owned device arrays from _load_kernel's donation
    return x.astype(jnp.float32)


def load_preprocess(data) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Load-time preprocessing on device: per-pixel DC-offset subtraction
    using sample 0 plus the intensity image (``io.rs:576-595``).

    ``_load_kernel`` donates its input (the raw cube is dead after the
    DC subtraction); a caller-owned DEVICE array is copied first, or
    donation would silently invalidate the caller's buffer. (Host numpy
    input — the only production caller, ``io.dotthz.finalize_scan`` —
    transfers fresh and needs no copy; an async pre-transfer that could
    have owned the buffer was a recorded dead end, ``io/dotthz.py``
    HostScan docstring.)"""
    if isinstance(data, jax.Array):
        data = _device_f32_copy(data)
    return _load_kernel(jnp.asarray(data, jnp.float32))
