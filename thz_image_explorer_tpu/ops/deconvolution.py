"""Frequency-resolved Richardson-Lucy deconvolution — the flagship kernel.

TPU-native re-design of the reference's heaviest filter
(``/root/reference/src/filters/deconvolution.rs``, IEEE TTHZ.2025.3546756):
split the scan into frequency bands with a Kaiser FIR bank, deconvolve each
band's intensity image with a band-specific Gaussian PSF via Richardson-
Lucy, convert the intensity correction into per-pixel gains and re-sum the
bands.

Mapping to TPU:

* the rayon band-parallel loop becomes a ``lax.scan`` over stacked per-band
  data inside a handful of chunked dispatches: ALL band inputs (tap
  spectra, PSF canvases, pad widths, iteration counts) are transferred once
  as stacked device arrays, each chunk is one compiled program whose scan
  reuses one band's worth of intermediates, and the host checks progress /
  cancellation between chunks — the reference's
  ``par_for_each_cancellable_reduce`` contract (``deconvolution.rs:891-1013``)
  without 25 independent dispatches each holding cube-sized temporaries;
* per-trace FIR filtering — ``convolve1d``'s pow2-padded f64 FFT
  convolution with centre extraction (``deconvolution.rs:266-317``) — is
  never materialised at all: the filtered traces are consumed only by the
  per-band energy image ``img = sum_t filtered^2`` (the band *output* is
  reconstructed spectrally by linearity, see ``_spectral_band_sum``), and
  that energy is computed exactly as **Parseval energy of the full linear
  convolution minus two triangular tail corrections**:
  ``E_window = E_full - E_head - E_tail`` where
  ``E_full = sum_f w_f |X_f|^2 |T_f|^2`` (one small matmul against a
  host-precomputed weighted tap-power matrix) and the head/tail terms are
  energies of the ``(ntaps-1)/2`` convolution samples outside the centre
  window, each ``||L_b^T x_seg||^2`` against a truncated eigenfactor of
  the segment's Gram matrix — narrow-band FIR segments are numerically
  low-rank (rank <=36 of 249 at the reference bank, see
  :func:`_factor_gram`), so the factor contracts the 249-sample segment
  axis straight down to ~40. Round 1 computed the energy by
  materialising the FIR outputs as block-banded matmuls (~1.5 TFLOP and
  ~12 GB of window re-reads for 25 bands over a 200x200x1024 cube,
  measured ~55 ms device); the energy identity needs ~0.6 TFLOP total and
  no cube-sized intermediates (measured breakdown in
  ``scripts/profile_deconv.py``);
* band geometry (PSF canvas size, reflect-pad widths, iteration counts) is
  host-computed static data; *per-band values* (taps, axis profiles, pad
  width, iteration count) stay traced so every band runs the same compiled
  program;
* Richardson-Lucy iterations use ``lax.fori_loop`` with a traced trip
  count. The reference's PSF is exactly separable
  (``filters/psf.rs:228-313`` builds it as an outer product), so each RL
  convolution is two banded matmuls: ``corr(u, psf) = R @ u @ C.T`` with
  ``R[i, k] = px[k - i + cr]``, ``C[j, k] = py[k - j + cc]`` — and the
  mirrored-PSF correlation is simply ``R.T @ rel @ C`` (odd canvases make
  the mirror matrices exact transposes). Cost is independent of PSF size,
  so no FFT fallback is needed even for huge beams.
* The reference's two convolution paths — direct (which computes
  *correlation*, no kernel flip) for small kernels and true FFT
  *convolution* for large ones (``deconvolution.rs:472-545``) — genuinely
  differ for asymmetric PSFs. Both semantics come out of the same matmul
  program: a band that would have taken the FFT path gets its axis profiles
  pre-flipped on the host, which turns the correlation into exactly the
  reference's convolution.

Reflective padding with a *traced* pad width inside a static canvas is done
by index arithmetic, so changing band geometry never recompiles.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from thz_image_explorer_tpu.models.psf import PSF, create_psf_axes, gaussian
from thz_image_explorer_tpu.ops.firdesign import create_filter_bank

MIN_IMAGE_SIZE = 16  # deconvolution.rs:802
DIRECT_CONV_MAX_ELEMS = 256  # convolve2d's direct-path threshold (:485)
_EPS = 1e-12


@dataclasses.dataclass
class DeconvolutionParams:
    """User parameters (defaults: ``deconvolution.rs:725-734``)."""

    n_iterations: int = 500
    n_filters: int = 25
    start_freq: float = 0.1
    end_freq: float = 10.0
    win_width: float = 0.5


@dataclasses.dataclass
class BandGeometry:
    """Host-computed static geometry for all bands."""

    taps: np.ndarray  # (B, ntaps) f64
    centers: np.ndarray  # (B,)
    psfs: np.ndarray  # (B, kr_max, kc_max) f32, centred in canvas
    px: np.ndarray  # (B, kr_max) f32 — axis profiles; psfs[b] = outer(px, py)
    py: np.ndarray  # (B, kc_max) f32
    pad_r: np.ndarray  # (B,) int32 — reflect pad along axis 0
    pad_c: np.ndarray  # (B,) int32
    n_iter: np.ndarray  # (B,) int32
    use_fft_conv: np.ndarray  # (B,) bool — which conv *semantics* each band takes
    # device-resident chunk stacks, keyed by chunk size (host->device
    # transfers of band data happen once per geometry, not per run)
    _device_chunks: dict = dataclasses.field(
        default_factory=dict, repr=False, compare=False
    )


def _conv_len(n: int) -> int:
    """Linear-convolution DFT length: the transforms are dense MXU DFT
    matmuls (``ops/mxufft``), not radix-2 FFTs, so any length ≥
    ``n_time + ntaps - 1`` is exact — round up to a multiple of 256 for
    MXU tiling instead of the next power of two (1536 vs 2048 at the
    reference defaults: ~25% off the transform FLOPs and spectrum HBM
    traffic, measured ~5 ms off the full deconvolution on a v5e)."""
    return ((n + 255) // 256) * 256


def plan_bands(
    params: DeconvolutionParams,
    psf_model: PSF,
    time: np.ndarray,
    shape: tuple[int, int],
    dx: float,
    dy: float,
) -> Optional[BandGeometry]:
    """Host-side planning: filter bank + per-band PSFs + iteration counts.

    Returns None when a guard fails (the stage then passes data through,
    matching ``deconvolution.rs:780-885``).
    """
    img_rows, img_cols = shape
    if img_rows < MIN_IMAGE_SIZE or img_cols < MIN_IMAGE_SIZE:
        return None
    if not psf_model.is_loaded:
        return None

    taps, centers = create_filter_bank(
        params.n_filters,
        params.start_freq,
        params.end_freq,
        params.win_width,
        time,
    )
    centers32 = centers.astype(np.float32)

    wx = psf_model.wx_fit.eval(centers32)
    wy = psf_model.wy_fit.eval(centers32)
    w_min = float(min(wx.min(), wy.min()))
    w_max = float(max(wx.max(), wy.max()))

    # PSF-too-large guard (deconvolution.rs:872-885; note the reference
    # compares the x-extent against img_cols — reproduced as-is)
    max_psf_width_x = max(int(np.ceil(wx.max() / dx)) * 2 + 1, 3)
    max_psf_width_y = max(int(np.ceil(wy.max() / dy)) * 2 + 1, 3)
    if max_psf_width_x >= img_cols or max_psf_width_y >= img_rows:
        return None

    x0s = psf_model.x0_spline.eval_const_extrap(centers32)
    y0s = psf_model.y0_spline.eval_const_extrap(centers32)

    px_list: list[np.ndarray] = []
    py_list: list[np.ndarray] = []
    n_iter = np.zeros(len(centers), np.int32)
    for i, fc in enumerate(centers32):
        # PSF spatial range (deconvolution.rs:920-951)
        range_x = max((wx[i] + abs(x0s[i])) * 3.0, 2.5)
        range_y = max((wy[i] + abs(y0s[i])) * 3.0, 2.5)
        range_x = np.float32(np.floor(range_x / dx) * dx + dx)
        range_y = np.float32(np.floor(range_y / dy) * dy + dy)
        max_allowed_x = (img_cols - 2.0) * dx / 2.0
        max_allowed_y = (img_rows - 2.0) * dy / 2.0
        cr_x = min(float(range_x), max_allowed_x)
        cr_y = min(float(range_y), max_allowed_y)

        nx = int(np.floor(cr_x / dx))
        ny = int(np.floor(cr_y / dy))
        x = np.arange(-nx, nx + 1, dtype=np.float32) * np.float32(dx)
        y = np.arange(-ny, ny + 1, dtype=np.float32) * np.float32(dy)
        gx = gaussian(x, float(x0s[i]), float(wx[i]))
        gy = gaussian(y, float(y0s[i]), float(wy[i]))
        axis_x, axis_y = create_psf_axes(gx, gy, x, y, dx, dy)
        px_list.append(axis_x)
        py_list.append(axis_y)

        # data-derived iteration count (deconvolution.rs:969-971)
        if w_max == w_min:
            n_iter[i] = 0  # Rust: NaN as usize saturates to 0
        else:
            n_iter[i] = int(
                np.floor(
                    (wx[i] - w_min) / (w_max - w_min) * (params.n_iterations - 1.0)
                    + 1.0
                )
            )

    kr = np.array([len(p) for p in px_list], np.int32)
    kc = np.array([len(p) for p in py_list], np.int32)
    # The spatial-range cap above reproduces the reference's axis quirk
    # (cr_x capped by img_COLS, deconvolution.rs:920-951), so on a
    # strongly asymmetric scan a band's reflect pad (k//2) can reach or
    # exceed the axis it pads; there the reference PANICS out of bounds
    # in its reflective pad (deconvolution.rs:646-648). A single-fold
    # reflection needs pad <= dim-1 — degrade to pass-through instead of
    # letting _reflect_pad_matrix silently clip rows to the image edge
    # and corrupt the gains.
    if int(kr.max()) // 2 >= img_rows or int(kc.max()) // 2 >= img_cols:
        return None
    kr_max = int(kr.max())
    kc_max = int(kc.max())
    # canvas dims must stay odd so centred embedding preserves the centre
    # (and makes the mirrored-kernel banded matrices exact transposes)
    if kr_max % 2 == 0:
        kr_max += 1
    if kc_max % 2 == 0:
        kc_max += 1

    px = np.zeros((len(px_list), kr_max), np.float32)
    py = np.zeros((len(py_list), kc_max), np.float32)
    for i, (ax, ay) in enumerate(zip(px_list, py_list)):
        r0 = (kr_max - len(ax)) // 2
        c0 = (kc_max - len(ay)) // 2
        px[i, r0 : r0 + len(ax)] = ax
        py[i, c0 : c0 + len(ay)] = ay

    canvases = px[:, :, None] * py[:, None, :]  # psfs[b] = outer(px, py)

    return BandGeometry(
        taps=taps,
        centers=centers,
        psfs=canvases.astype(np.float32),
        px=px,
        py=py,
        pad_r=(kr // 2).astype(np.int32),
        pad_c=(kc // 2).astype(np.int32),
        n_iter=n_iter,
        use_fft_conv=(kr.astype(np.int64) * kc.astype(np.int64))
        > DIRECT_CONV_MAX_ELEMS,
    )


# ----------------------------------------------------------------------
# Device kernels
# ----------------------------------------------------------------------


def _reflect_pad_matrix(h: int, pad: int, pad_max: int) -> np.ndarray:
    """Host-built 0/1 selection matrix ``P`` with
    ``(P @ img)[r] = reflect_padded_img[r]`` inside a static canvas of
    margin ``pad_max``; rows outside the band's own padded region are
    all-zero (they behave exactly like the zero boundary of the
    reference's convolutions). Applying the pad as a matmul keeps the RL
    scan on the MXU — the equivalent traced 2-D gather was measured at
    ~16 ms/25 bands on a v5e (``scripts/micro_skeleton.py``)."""
    r = np.arange(h + 2 * pad_max)
    rr = r - (pad_max - pad)
    src = np.abs(rr - pad)
    src = np.where(src >= h, 2 * h - 2 - src, src)
    valid = (rr >= 0) & (rr < h + 2 * pad)
    p = np.zeros((h + 2 * pad_max, h), np.float32)
    p[r[valid], np.clip(src[valid], 0, h - 1)] = 1.0
    return p


def _correlate_same(a: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Zero-boundary 'same' correlation — the reference's direct conv path
    (``deconvolution.rs:432-458``), which does NOT flip the kernel. Odd
    kernel dims assumed (canvas is odd). Runs on the MXU via lax.conv."""
    return jax.lax.conv_general_dilated(
        a[None, None], k[None, None], (1, 1), "SAME",
        preferred_element_type=jnp.float32,
    )[0, 0]


def _richardson_lucy(padded, n_iter, corr_k, corr_kflip):
    """RL iterations on the (canvas-)padded image
    (``deconvolution.rs:620-712``). ``n_iter`` is traced;
    ``corr_k``/``corr_kflip`` correlate with the band kernel and its
    mirror."""

    def body(_i, u):
        ustarp = corr_k(u)
        rel = padded / (ustarp + _EPS)
        correction = corr_kflip(rel)
        return u * correction

    return jax.lax.fori_loop(0, n_iter, body, padded)


def _banded_matrix(vec: np.ndarray, size: int) -> np.ndarray:
    """Host-built dense (size, size) correlation matrix
    ``M[i, k] = vec[k - i + c]`` with ``c = len(vec) // 2`` and zeros
    outside the band — applying a zero-boundary 'same' 1-D correlation as
    an MXU matmul. Built on the host: the axis profiles are host data,
    and constructing these with traced gathers inside the scan was
    measured at ~14 ms/25 bands on a v5e (``scripts/micro_skeleton.py``)."""
    vec = np.asarray(vec, np.float32)
    klen = vec.shape[0]
    c = klen // 2
    ii = np.arange(size)
    idx = ii[None, :] - ii[:, None] + c  # [i, k] -> vec index
    valid = (idx >= 0) & (idx < klen)
    return np.where(valid, vec[np.clip(idx, 0, klen - 1)], 0.0).astype(
        np.float32
    )


# bf16x3 ("f32 emulation") matmuls: ~1e-5 relative error, 2x the HIGHEST
# throughput on v5e — well inside the framework's f32 parity tolerances.
_PREC = jax.lax.Precision.HIGH


#: relative eigenvalue cutoff of the energy Gram factorization: dropped
#: mass is <= seg * 1e-10 * lambda_max ~ 2.5e-8 * lambda_max at the
#: 249-sample reference segments — an order below the f32 rounding of the
#: quadratic form it replaces
_GRAM_EIG_RTOL = 1e-10


def _factor_gram(g: np.ndarray) -> np.ndarray:
    """(B, s, s) PSD Gram matrices -> truncated eigenfactors (B, s, r)
    with ``L_b @ L_b.T ~= G_b`` so the per-trace quadratic form becomes a
    sum of squares: ``x^T G_b x = ||L_b^T x||^2``.

    The Grams of a *narrow-band* FIR's head/tail segments are numerically
    low-rank (the segment matrix is windowed shifts of a band-limited
    tap vector, so its spectrum decays at the time-bandwidth product):
    at the reference bank (25 log-spaced Kaiser bands, 499 taps,
    249-sample segments) the rank at ``_GRAM_EIG_RTOL`` is 27 mean / 36
    max of 249 (rank bound + exactness asserted by
    ``tests/test_deconvolution.py::
    test_energy_gram_factorization_is_exact``), cutting the whole
    deconvolution's XLA-counted FLOPs 0.507 -> 0.282 TFLOP per run at
    the 200x200x1024 bench geometry (``deconv_cost_analysis``, recorded
    as ``deconv_tflops_per_run`` in bench extras). ``r`` is the max rank
    over bands, rounded up to a multiple of 8; bands with lower rank just
    carry extra (exact, tiny-eigenvalue) columns.
    """
    b, s = g.shape[0], g.shape[-1]
    if s == 0:
        return np.zeros((b, 0, 1), np.float32)
    evals, evecs = np.linalg.eigh(g)  # ascending, f64
    lam = np.maximum(evals, 0.0)
    lmax = lam[:, -1:]
    rank = int((lam > _GRAM_EIG_RTOL * np.maximum(lmax, 1e-300)).sum(1).max())
    r = min(max(-(-max(rank, 1) // 8) * 8, 8), s)
    return (evecs[:, :, -r:] * np.sqrt(lam[:, None, -r:])).astype(np.float32)


def _energy_matrices(taps: np.ndarray, fft_len: int, n_time: int):
    """Host-precomputed (f64) matrices for the exact windowed-convolution
    energy identity ``E_window = E_full - E_head - E_tail``.

    The centre window of the linear convolution is ``full[shift : shift+T]``
    with ``shift = (L-1)//2`` (``deconvolution.rs:266-317``'s extraction).

    Returns
      w2   (m, B)         Parseval-weighted tap power: ``E_full(n, b) =
                          sum_f w2[f, b] * |X_nf|^2`` with the r2c
                          hermitian weights (1, 2, ..., 2[, 1]) / fft_len;
      lh   (B, hseg, r)   truncated eigenfactor of the head Gram matrix
                          ``gh_b = mh_b^T mh_b`` (``full[k] = sum_t
                          mh[b, k, t] x[t]`` for the k < shift head
                          samples): ``E_head(n, b) = ||lh_b^T x_n||^2``
                          — see :func:`_factor_gram` for why r << hseg;
      lt   (B, tseg, r')  same for the tail samples k >= shift + T over
                          the last ``tseg`` input samples.
    """
    b, l = taps.shape
    shift = (l - 1) // 2
    ltail = l - 1 - shift

    spec = np.fft.rfft(taps, n=fft_len, axis=-1)  # (B, m)
    m = spec.shape[-1]
    w = np.full(m, 2.0)
    w[0] = 1.0
    if fft_len % 2 == 0:
        w[-1] = 1.0
    w2 = (w[:, None] / fft_len * (np.abs(spec) ** 2).T).astype(np.float32)

    hseg = min(shift, n_time)
    idx = np.arange(shift)[:, None] - np.arange(hseg)[None, :]  # k - t
    mh = np.where(
        (idx >= 0) & (idx < l), taps[:, np.clip(idx, 0, l - 1)], 0.0
    )
    gh = np.einsum("bkt,bks->bts", mh, mh)

    tseg = min(ltail, n_time)
    idx_t = shift + tseg + np.arange(ltail)[:, None] - np.arange(tseg)[None, :]
    mt = np.where(
        (idx_t >= 0) & (idx_t < l), taps[:, np.clip(idx_t, 0, l - 1)], 0.0
    )
    gt = np.einsum("bkt,bks->bts", mt, mt)

    return w2, _factor_gram(gh), _factor_gram(gt)


@partial(jax.jit, static_argnames=("fft_len", "hseg", "tseg"))
def _prepare_spectra(data, *, fft_len, hseg, tseg):
    """One dispatch shared by every band: padded r2c spectrum of all
    traces (reused by the final reconstruction), its power, and the
    head/tail input segments for the energy tail corrections."""
    from thz_image_explorer_tpu.ops import mxufft

    n_time = data.shape[-1]
    flat = data.reshape(-1, n_time)
    spec = mxufft.rfft_ri(flat, n=fft_len)  # (2, N, m)
    power = spec[0] * spec[0] + spec[1] * spec[1]
    return spec, power, flat[:, :hseg], flat[:, n_time - tseg :]


@partial(jax.jit,
         static_argnames=("shape", "pad_r_max", "pad_c_max", "use_pallas"))
def _gains_chunk(power, xh, xt, w2, lh, lt, prs, pcs, rs, cs, n_iter,
                 *, shape, pad_r_max, pad_c_max, use_pallas=False):
    """One dispatch covering a chunk of bands: exact per-band energy
    images via the Parseval-minus-tails identity, then a ``lax.scan`` of
    Richardson-Lucy over the chunk's bands emitting each band's gain map
    (``deconvolution.rs:891-1004``). Everything in the scan body is MXU
    matmuls against host-precomputed band matrices: ``prs``/``pcs`` are
    the 0/1 reflect-pad selection matrices, ``rs``/``cs`` the banded
    correlation matrices of the separable PSF's axis profiles.

    RL stays *sequential* over bands by measurement: one band's RL step is
    already MXU matmuls over the (H+2p, W+2p) image, and the per-band
    iteration counts are heavily skewed (sum(n_iter) ~ 5x max(n_iter) at
    reference defaults), so batching bands into one fori_loop of
    max(n_iter) steps costs ~4x the FLOPs for the same serial depth —
    measured slower. The scan also reuses one band's worth of
    intermediates, keeping device memory bounded."""
    x, y = shape[0], shape[1]
    e_full = jnp.dot(power, w2, precision=_PREC)  # (N, c)
    # tail-correction energies as sums of squares against the truncated
    # eigenfactors of the host-built Gram matrices: E = x^T G x =
    # ||L^T x||^2 (see _factor_gram — r << seg cuts the einsum ~6x, and
    # a sum of squares cannot go negative the way a rounded x^T G x can)
    yh = jnp.einsum("nt,btr->nbr", xh, lh, precision=_PREC)
    e_head = jnp.sum(yh * yh, axis=-1)
    yt = jnp.einsum("nt,btr->nbr", xt, lt, precision=_PREC)
    e_tail = jnp.sum(yt * yt, axis=-1)
    # clamp at 0: the direct sum of squares this identity replaces is
    # exactly >= 0, but f32 cancellation can round the difference
    # negative when nearly all of a trace's band energy sits in the
    # head/tail windows — a negative "energy" would NaN the whole pixel
    # via sqrt(u / img) instead of only on exact zero like the reference
    imgs = jnp.maximum(e_full - e_head - e_tail, 0.0)
    imgs = imgs.T.reshape(-1, x, y)  # (c, X, Y)

    mm = lambda a, b: jnp.matmul(a, b, precision=_PREC)

    if use_pallas:
        # VMEM-resident RL (ops/pallas_rl.rl_bands_separable): pad all
        # bands with two batched matmuls, run every band's full RL
        # recurrence on-chip, crop + gain-map in one batched epilogue.
        import os

        from thz_image_explorer_tpu.ops.pallas_rl import rl_bands_separable

        # THZ_PALLAS_INTERPRET=1 runs the pallas kernel in interpret mode
        # (CPU tests of the production kernel path); read at trace time
        interp = os.environ.get("THZ_PALLAS_INTERPRET", "0") == "1"

        padded = mm(mm(prs, imgs), jnp.transpose(pcs, (0, 2, 1)))
        u = rl_bands_separable(padded, rs, cs, n_iter, interpret=interp)
        u = u[:, pad_r_max : pad_r_max + x, pad_c_max : pad_c_max + y]
        # 0/0 -> NaN, as in the reference
        return jnp.sqrt(jnp.maximum(u, 0.0) / imgs)

    def body(_c, xs):
        img, pr, pc, R, C, ni = xs
        # reflect pad as 0/1 matmuls (exact: one unit element per row)
        padded = mm(mm(pr, img), pc.T)
        u = _richardson_lucy(
            padded,
            ni,
            lambda a: mm(mm(R, a), C.T),  # corr(a, outer(px, py))
            lambda a: mm(mm(R.T, a), C),  # corr(a, mirrored psf)
        )
        u = u[pad_r_max : pad_r_max + x, pad_c_max : pad_c_max + y]
        # 0/0 -> NaN, as in the reference
        return _c, jnp.sqrt(jnp.maximum(u, 0.0) / img)

    _, gains = jax.lax.scan(
        body, None, (imgs, prs, pcs, rs, cs, n_iter)
    )
    return gains  # (chunk, X, Y)


@partial(jax.jit, static_argnames=("fft_len", "shift", "n_time", "n_bands", "shape"))
def _spectral_band_sum(spec, taps_ri, *gain_stacks,
                       fft_len, shift, n_time, n_bands, shape):
    """Final reconstruction in ONE pass: since each band's gain is a
    per-trace scalar, ``sum_b g_b * irfft(spec * T_b)`` equals
    ``irfft(spec * sum_b g_b * T_b)`` — one weighted spectrum and one
    inverse transform instead of B cube-sized multiply-accumulates
    (exactly the linearity of ``deconvolution.rs:986-1013``'s band sum).
    The forward spectrum is reused from ``_prepare_spectra``; all FFTs
    are MXU DFT matmuls (ops/mxufft)."""
    from thz_image_explorer_tpu.ops import mxufft

    gains = (
        gain_stacks[0]
        if len(gain_stacks) == 1
        else jnp.concatenate(gain_stacks, axis=0)
    )[:n_bands]
    x, y = shape
    g = gains.reshape(gains.shape[0], -1)  # (B, N)
    wr = jnp.einsum("bn,bf->nf", g, taps_ri[0][:n_bands], precision=_PREC)
    wi = jnp.einsum("bn,bf->nf", g, taps_ri[1][:n_bands], precision=_PREC)
    sr = spec[0] * wr - spec[1] * wi
    si = spec[0] * wi + spec[1] * wr
    # only the centre window of the padded inverse transform survives —
    # slice the DFT matrix columns instead of the output (exact, 33%
    # fewer irfft FLOPs at the 1536/1024 reference geometry)
    out = mxufft.irfft_ri(
        jnp.stack([sr, si]), fft_len, out_start=shift, out_len=n_time
    )
    return out.reshape(x, y, n_time)


def deconvolve_cube(
    data: jnp.ndarray,
    geometry: BandGeometry,
    progress: Callable[[float], None] = lambda _f: None,
    cancelled: Callable[[], bool] = lambda: False,
    chunk_size: int = 5,
    rl_impl: str | None = None,  # "auto" | "pallas" | "scan"
) -> Optional[jnp.ndarray]:
    """Run the full banked deconvolution; returns the band-summed cube or
    None when cancelled.

    Three phases. Phase 0 (``_prepare_spectra``): one dispatch computes
    the padded spectrum of every trace (reused by the reconstruction),
    its power, and the head/tail segments the energy corrections need.
    Phase 1: band inputs are transferred to the device once, stacked, and
    ``ceil(B / chunk_size)`` dispatches compute each chunk's exact energy
    images and scan Richardson-Lucy over its bands, emitting gain maps;
    between chunks the host reports progress and checks cancellation —
    the TPU equivalent of the reference's cancellable band-parallel
    reduce, with chunked dispatch bounding both cancel latency and
    in-flight device memory. Phase 2: one spectral pass reconstructs
    ``sum_b g_b * filtered_b`` (``_spectral_band_sum``) instead of B
    cube-sized multiply-accumulates.
    """
    plan = _plan_dispatch(data, geometry, chunk_size, rl_impl)
    chunk_list = plan["chunk_list"]
    spec, power, xh, xt = _prepare_spectra(
        data, fft_len=plan["fft_len"], hseg=plan["hseg"], tseg=plan["tseg"]
    )
    gain_stacks = []
    for i, ch in enumerate(chunk_list):
        if cancelled():
            return None
        progress(i / (len(chunk_list) + 1))
        gain_stacks.append(
            _gains_chunk(
                power, xh, xt,
                *ch,
                shape=data.shape,
                pad_r_max=plan["pad_r_max"],
                pad_c_max=plan["pad_c_max"],
                use_pallas=plan["use_pallas"],
            )
        )
    progress(len(chunk_list) / (len(chunk_list) + 1))
    out = _spectral_band_sum(
        spec,
        plan["taps_ri_dev"],
        *gain_stacks,
        fft_len=plan["fft_len"],
        shift=plan["shift"],
        n_time=plan["n_time"],
        n_bands=plan["n_bands"],
        shape=(data.shape[0], data.shape[1]),
    )
    progress(1.0)
    return out


def _plan_dispatch(data, geometry, chunk_size: int, rl_impl: str | None):
    """Shared dispatch planning for :func:`deconvolve_cube` and
    :func:`deconv_cost_analysis`: shape math, RL-implementation choice and
    the (geometry-cached) host->device transfer of the band stacks."""
    n_bands, ntaps = geometry.taps.shape
    n_time = data.shape[-1]
    shift = (ntaps - 1) // 2
    fft_len = _conv_len(n_time + ntaps - 1)
    pad_r_max = int(geometry.pad_r.max())
    pad_c_max = int(geometry.pad_c.max())
    chunk = max(1, min(chunk_size, n_bands))

    # Multi-chip: when the cube is pixel-sharded over a mesh, band inputs
    # replicate onto the same mesh and XLA's SPMD partitioner runs the
    # chunk program sharded (the spectra and energies are per-pixel local;
    # only the small RL images incur collectives).
    from jax.sharding import NamedSharding, PartitionSpec

    data_sharding = getattr(data, "sharding", None)
    sharded = isinstance(data_sharding, NamedSharding)
    if sharded:
        rep = NamedSharding(data_sharding.mesh, PartitionSpec())
        transfer = lambda a: jax.device_put(np.ascontiguousarray(a), rep)
        cache_key = (chunk, data.shape, data_sharding.mesh)
    else:
        transfer = lambda a: jnp.asarray(np.ascontiguousarray(a))
        cache_key = (chunk, data.shape, None)

    # RL implementation: the VMEM-resident pallas kernel on single-chip
    # TPU when the band working set fits; the SPMD-partitionable scan
    # otherwise (CPU, sharded meshes, oversized geometry). Measured on a
    # v5e: see scripts/profile_pallas.py / BENCH extras. THZ_RL_IMPL is
    # the field kill switch (e.g. =scan on a backend where Mosaic
    # misbehaves).
    import os

    from thz_image_explorer_tpu.ops.pallas_rl import separable_qualifies

    if rl_impl is None:
        rl_impl = os.environ.get("THZ_RL_IMPL", "auto")

    use_pallas = (
        rl_impl == "pallas"
        or (
            rl_impl == "auto"
            and not sharded
            and jax.default_backend() == "tpu"
            and separable_qualifies(
                data.shape[0] + 2 * pad_r_max, data.shape[1] + 2 * pad_c_max
            )
        )
    )

    chunks = geometry._device_chunks.get(cache_key)
    if chunks is None:
        # Fold each band's convolution *semantics* into its kernel: bands
        # the reference would FFT-convolve get pre-flipped axis profiles,
        # so the correlation matmuls compute true convolution for them.
        flip = geometry.use_fft_conv[:, None]
        pxs = np.where(flip, geometry.px[:, ::-1], geometry.px).astype(np.float32)
        pys = np.where(flip, geometry.py[:, ::-1], geometry.py).astype(np.float32)
        w2, lh, lt = _energy_matrices(geometry.taps, fft_len, n_time)
        x_dim, y_dim = data.shape[0], data.shape[1]
        prs = np.stack(
            [_reflect_pad_matrix(x_dim, int(p), pad_r_max) for p in geometry.pad_r]
        )
        pcs = np.stack(
            [_reflect_pad_matrix(y_dim, int(p), pad_c_max) for p in geometry.pad_c]
        )
        rs = np.stack(
            [_banded_matrix(v, x_dim + 2 * pad_r_max) for v in pxs]
        )
        cs = np.stack(
            [_banded_matrix(v, y_dim + 2 * pad_c_max) for v in pys]
        )

        # pad band count to a multiple of chunk_size with inert bands (their
        # gains are discarded) so every chunk runs the same compiled program
        n_padded = ((n_bands + chunk - 1) // chunk) * chunk

        def pad(a):
            if n_padded == a.shape[0]:
                return a
            return np.concatenate(
                [a, np.zeros((n_padded - a.shape[0],) + a.shape[1:], a.dtype)]
            )

        stacks = [pad(a) for a in (w2.T, lh, lt, prs, pcs, rs, cs,
                                   geometry.n_iter)]
        # the bands' tap spectra for the final spectral sum, as f32 pairs
        taps_spec = np.fft.rfft(geometry.taps, n=fft_len, axis=-1)
        taps_ri = np.stack(
            [taps_spec.real, taps_spec.imag]
        ).astype(np.float32)

        # ALL host->device transfers happen up front, before heavy compute
        # is queued (transfers racing a deep device queue are fragile on
        # remote tunnelled backends), and are cached on the geometry so
        # re-running the filter re-sends nothing
        chunks = []
        for c0 in range(0, n_padded, chunk):
            s = slice(c0, c0 + chunk)
            # w2 back to (m, chunk) layout for the power matmul
            ch = [transfer(stacks[0][s].T)] + [
                transfer(a[s]) for a in stacks[1:]
            ]
            chunks.append(tuple(ch))
        chunks = (chunks, transfer(taps_ri))
        geometry._device_chunks[cache_key] = chunks

    chunk_list, taps_ri_dev = chunks
    return {
        "chunk_list": chunk_list,
        "taps_ri_dev": taps_ri_dev,
        "fft_len": fft_len,
        "shift": shift,
        "hseg": min(shift, n_time),
        "tseg": min(ntaps - 1 - shift, n_time),
        "pad_r_max": pad_r_max,
        "pad_c_max": pad_c_max,
        "use_pallas": use_pallas,
        "n_bands": n_bands,
        "n_time": n_time,
    }


def deconv_cost_analysis(data, geometry, chunk_size: int = 5,
                         rl_impl: str | None = None) -> float:
    """Total XLA-reported FLOPs of one :func:`deconvolve_cube` run (the
    bench roofline/MFU denominator): sums ``cost_analysis()['flops']`` of
    the three compiled programs (spectra prep, gains chunks, spectral band
    sum) at the exact shapes a run dispatches. AOT compiles here hit the
    persistent compilation cache when the run itself already compiled."""
    plan = _plan_dispatch(data, geometry, chunk_size, rl_impl)

    def flops_of(compiled) -> float:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    sds = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
    total = 0.0
    prep = _prepare_spectra.lower(
        sds(data), fft_len=plan["fft_len"], hseg=plan["hseg"],
        tseg=plan["tseg"],
    ).compile()
    total += flops_of(prep)
    spec, power, xh, xt = jax.eval_shape(
        _prepare_spectra, sds(data), fft_len=plan["fft_len"],
        hseg=plan["hseg"], tseg=plan["tseg"],
    )
    ch = plan["chunk_list"][0]
    gains_lowered = _gains_chunk.lower(
        power, xh, xt, *map(sds, ch),
        shape=data.shape, pad_r_max=plan["pad_r_max"],
        pad_c_max=plan["pad_c_max"], use_pallas=plan["use_pallas"],
    )
    total += flops_of(gains_lowered.compile()) * len(plan["chunk_list"])
    gains_shape = jax.eval_shape(
        _gains_chunk, power, xh, xt, *map(sds, ch),
        shape=data.shape, pad_r_max=plan["pad_r_max"],
        pad_c_max=plan["pad_c_max"], use_pallas=plan["use_pallas"],
    )
    ssum = _spectral_band_sum.lower(
        spec, sds(plan["taps_ri_dev"]),
        *([gains_shape] * len(plan["chunk_list"])),
        fft_len=plan["fft_len"], shift=plan["shift"],
        n_time=plan["n_time"], n_bands=plan["n_bands"],
        shape=(data.shape[0], data.shape[1]),
    ).compile()
    total += flops_of(ssum)
    return total
