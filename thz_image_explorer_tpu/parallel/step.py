"""Fused interactive update step: the whole non-deconvolution chain in ONE
compiled program.

The per-stage executor (:mod:`thz_image_explorer_tpu.pipeline.executor`)
keeps every stage output cached for incremental recompute — the interactive
contract. This module is the throughput path: scaling → TD band-pass →
window+FFT → FD band-pass → water notch → iFFT → TD band-pass → intensity
fused into a single jit so XLA fuses the masks and window into the FFT's
prologue/epilogue and nothing round-trips through HBM between stages. Used
by the benchmark, the multi-chip dry run, and batch (non-interactive)
processing.

All continuous parameters are traced (slider moves never recompile); stage
on/off flags and the window type are static (flipping a toggle compiles
once per combination).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from thz_image_explorer_tpu.assets.water_lines import WATER_LINES_THZ
from thz_image_explorer_tpu.data import ScanCube
from thz_image_explorer_tpu.ops import bandpass as bp
from thz_image_explorer_tpu.ops.fourier import forward_fft, inverse_fft
from thz_image_explorer_tpu.ops.intensity import intensity_image
from thz_image_explorer_tpu.ops.scaling import scale_cube
from thz_image_explorer_tpu.ops.windows import WindowType
from thz_image_explorer_tpu.data import _pytree_dataclass


class StepConfig(NamedTuple):
    """Static configuration — part of the jit cache key."""

    window_type: WindowType = WindowType.ADAPTED_BLACKMAN
    scale: int = 1
    td_before_active: bool = False
    fd_active: bool = False
    notch_active: bool = False
    td_after_active: bool = False
    avg_in_fourier_space: bool = False
    #: lean programs only: carry ops/fourier.phase_increments through the
    #: chain and finish tiny cumsums after the publish reductions instead
    #: of materializing the cube-wide unwrap (lean_update sets this)
    lean_phases: bool = False
    #: lean programs only: compute every spectral publish reduction with
    #: the one-pass pallas kernel (ops/pallas_specred) over the RAW
    #: spectrum — the per-frequency FD masks factor out of the sums —
    #: instead of materializing amp / increment cubes as mask-matmul
    #: operands (lean_update sets this when supported)
    specred: bool = False
    #: lean programs only: never materialize the masked spectrum — fold
    #: the factored FD weight product into the irfft's inverse DFT matrix
    #: and weight the pixel-mean spectra after reduction
    #: (ops/fourier.inverse_fft fd_weights; THZ_FOLD_FD=0 disables)
    fold_fd: bool = False
    #: lean fold-path programs on the matmul-DFT path only: carry the
    #: spectrum in the WIDE (X, Y, 2m) [real | imag] matmul layout end to
    #: end — the complex cube is never assembled and the forward ->
    #: inverse DFT round trip moves zero relayout bytes (~0.27 GB / 0.4
    #: ms at the bench shape; THZ_WIDE_SPEC=0 disables). Requires that no
    #: stage between fft and ifft reads cube.fft (the fold contract) and
    #: is mutually exclusive with specred (the kernel wants raw planes).
    wide_spec: bool = False


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class StepParams:
    """Traced parameters (pytree) — changing them never recompiles."""

    window_low: jax.Array
    window_high: jax.Array
    td_before_low: jax.Array
    td_before_high: jax.Array
    td_before_width: jax.Array
    fd_low: jax.Array
    fd_high: jax.Array
    fd_width: jax.Array
    notch_width: jax.Array
    notch_depth: jax.Array
    td_after_low: jax.Array
    td_after_high: jax.Array
    td_after_width: jax.Array
    water_lines: jax.Array

    @staticmethod
    def defaults_np() -> "StepParams":
        """Defaults with numpy leaves (no device placement)."""
        f = lambda v: np.float32(v)
        return StepParams(
            window_low=f(1.0),
            window_high=f(7.0),
            td_before_low=f(0.0),
            td_before_high=f(1e9),
            td_before_width=f(2.0),
            fd_low=f(0.2),
            fd_high=f(5.0),
            fd_width=f(0.1),
            notch_width=f(0.05),
            notch_depth=f(1.0),
            td_after_low=f(0.0),
            td_after_high=f(1e9),
            td_after_width=f(0.1),
            water_lines=np.asarray(WATER_LINES_THZ, np.float32),
        )

    @staticmethod
    def defaults() -> "StepParams":
        # same values as defaults_np (ONE list of field defaults), with
        # the water-lines table placed on device up front — the only
        # eager transfer, paid once
        return dataclasses.replace(
            StepParams.defaults_np(),
            water_lines=jnp.asarray(np.asarray(WATER_LINES_THZ, np.float32)),
        )


def _step(cube: ScanCube, params: StepParams, cfg: StepConfig):
    cube = scale_cube(cube, cfg.scale)
    pre_w = None
    if cfg.td_before_active:
        if cfg.fold_fd:
            # fold the TD-before mask into the forward DFT matrix (it is
            # diagonal in exactly the contracted time axis)
            pre_w = bp.td_bandpass_weights(
                cube.time, params.td_before_low, params.td_before_high,
                params.td_before_width,
            )
        else:
            cube = cube.replace(
                data=bp.td_bandpass(
                    cube.data,
                    cube.time,
                    params.td_before_low,
                    params.td_before_high,
                    params.td_before_width,
                )
            )
    cube = forward_fft(cube, cfg.window_type, params.window_low,
                       params.window_high, lean_phases=cfg.lean_phases,
                       pre_weight=pre_w, wide_spec=cfg.wide_spec)
    raw_fd = cube  # post-window spectrum, before the FD filters
    wvec = None
    if cfg.fold_fd and (cfg.fd_active or cfg.notch_active):
        # lean fold: accumulate the FD stages' per-frequency weight
        # product instead of applying cube-sized mask passes; the masked
        # spectrum never materializes (inverse_fft folds the weight into
        # the irfft matrix and weights the reduced means). n_freq from
        # the freq axis — under wide_spec the fft leaf's last dim is 2m.
        wvec = _fd_weight_product(
            cube.freq, cube.freq.shape[0], params, cfg
        )
    else:
        if cfg.fd_active:
            fft, amps = bp.fd_bandpass(
                cube.fft, cube.amplitudes, cube.freq,
                params.fd_low, params.fd_high, params.fd_width,
            )
            cube = cube.replace(fft=fft, amplitudes=amps)
        if cfg.notch_active:
            fft, amps = bp.water_notch(
                cube.fft, cube.amplitudes, cube.freq,
                params.water_lines, params.notch_width, params.notch_depth,
            )
            cube = cube.replace(fft=fft, amplitudes=amps)
    post_w = None
    if cfg.td_after_active and cfg.fold_fd:
        # fold the TD-after mask into the inverse DFT matrix columns
        post_w = bp.td_bandpass_weights(
            cube.time, params.td_after_low, params.td_after_high,
            params.td_after_width,
        )
    cube = inverse_fft(cube, cfg.avg_in_fourier_space,
                       phases_encoded=cfg.lean_phases, fd_weights=wvec,
                       td_weights=post_w, wide_spec=cfg.wide_spec)
    if cfg.td_after_active and not cfg.fold_fd:
        cube = cube.replace(
            data=bp.td_bandpass(
                cube.data,
                cube.time,
                params.td_after_low,
                params.td_after_high,
                params.td_after_width,
            )
        )
    img = intensity_image(cube.data)
    return cube, img, raw_fd


@partial(jax.jit, static_argnames=("cfg",))
def interactive_update(cube: ScanCube, params: StepParams, cfg: StepConfig):
    """One fused update of the full interactive chain. Returns
    ``(cube_out, intensity_image)``."""
    c, img, _ = _step(cube, params, cfg)
    return c, img


def _lean_phases_env() -> bool:
    import os

    return os.environ.get("THZ_LEAN_PHASES", "1") != "0"


def lean_update(cube: ScanCube, params: StepParams, cfg: StepConfig,
                masks, pix):
    """The PRODUCT-shaped update (round-4 leaf-level sparse
    materialization): the chain plus the publish reductions in ONE
    program, returning only what an interactive update actually
    materializes — the final data cube, the intensity image, and the
    published slices/means/ROI reductions. The spectral cubes
    (fft/amplitudes/phases, ~330 MB at the bench shape) become XLA
    temporaries instead of HBM outputs. Mirrors the executor's merged
    lean program (pipeline/executor.py) on the benchmark seam.

    Phases ride the increments encoding (``THZ_LEAN_PHASES=0`` disables
    for A/B timing — the env var is read HERE, outside the jit, so a
    mid-process toggle selects a different compiled variant instead of
    being frozen at first trace): the cube-wide unwrap cumsum disappears
    and the published phase vectors are finished with tiny cumsums after
    the reductions — mathematically identical (cumsum is linear), see
    ``ops/fourier.phase_increments``."""
    rcfg = _resolve_cfg(cube, cfg, masks)
    try:
        return _lean_update_jit(cube, params, rcfg, masks, pix)
    except Exception as err:  # noqa: BLE001 — latch-and-retry or reraise
        from thz_image_explorer_tpu.ops import pallas_specred as _psr

        # same fallback as pipeline/executor._dispatch_lean: a
        # specred-bearing program whose failure is attributable to the
        # kernel (latchable_specred_error — Mosaic/pallas markers only,
        # advisor r4) latches the kernel off and the XLA-reductions
        # variant is dispatched instead; anything else re-raises so real
        # defects are never masked by a silent degradation
        if (
            not rcfg.specred
            or _psr.is_runtime_broken()
            or not _psr.latchable_specred_error(err)
        ):
            raise
        _psr.mark_runtime_broken(err)
        return _lean_update_jit(
            cube, params, _resolve_cfg(cube, cfg, masks), masks, pix
        )


def _resolve_cfg(cube, cfg: StepConfig, masks) -> StepConfig:
    """Apply the host-side env/dispatch decisions to the static cfg."""
    from thz_image_explorer_tpu.ops.pallas_specred import (
        specred_env,
        specred_supported,
    )

    x, y, t = cube.data.shape
    nf = t // 2 + 1
    sharded = (
        getattr(getattr(cube.data, "sharding", None), "num_devices", 1) > 1
    )
    import os

    fold = os.environ.get("THZ_FOLD_FD", "1") != "0"
    # tri-state kernel dispatch (ops/pallas_specred.specred_env): auto
    # resolves to OFF — the lean XLA program beats the kernel program in
    # both fold regimes at the bench shape (5.31/5.49 vs 6.45/6.65 ms,
    # scripts/profile_specred.py 2026-08-18); THZ_SPECRED=1 forces
    use_specred = (
        not cfg.avg_in_fourier_space
        and specred_env() is True
        and specred_supported(x * y, nf, masks.shape[0] + 1, sharded)
    )
    # WIDE spectrum layout (StepConfig.wide_spec): fold-path + matmul-DFT
    # only, never with the specred kernel (it reads raw planes); env read
    # HERE so a mid-process THZ_WIDE_SPEC toggle selects the other
    # compiled variant (cfg is the jit cache key) instead of being frozen
    from thz_image_explorer_tpu.ops import mxufft as _mx

    wide = (
        fold
        and not use_specred
        and _mx.use_matmul_fft()
        and t <= _mx.MAX_MATMUL_N
        and os.environ.get("THZ_WIDE_SPEC", "1") != "0"
    )
    return cfg._replace(
        lean_phases=_lean_phases_env(),
        specred=use_specred,
        fold_fd=fold,
        wide_spec=wide,
    )


def lean_update_lowered(cube, params: StepParams, cfg: StepConfig,
                        masks, pix):
    """AOT ``.lower()`` of the exact program :func:`lean_update`
    dispatches (same env-resolved cfg) — the bench cost-analysis seam.
    A specred kernel rejected at LOWERING (Mosaic block checks run
    here, before any dispatch) trips the same process-wide latch as a
    dispatch failure, so the seam keeps describing the program the
    product would actually run."""
    rcfg = _resolve_cfg(cube, cfg, masks)
    try:
        return _lean_update_jit.lower(cube, params, rcfg, masks, pix)
    except Exception as err:  # noqa: BLE001 — latch-and-retry or reraise
        from thz_image_explorer_tpu.ops import pallas_specred as _psr

        if (
            not rcfg.specred
            or _psr.is_runtime_broken()
            or not _psr.latchable_specred_error(err)
        ):
            raise
        _psr.mark_runtime_broken(err)
        return _lean_update_jit.lower(
            cube, params, _resolve_cfg(cube, cfg, masks), masks, pix
        )


@partial(jax.jit, static_argnames=("cfg",))
def _lean_update_jit(cube: ScanCube, params: StepParams, cfg: StepConfig,
                     masks, pix):
    from thz_image_explorer_tpu.data import masked_pixel_mean
    from thz_image_explorer_tpu.ops.fourier import finish_unwrap
    from thz_image_explorer_tpu.ops.roi import masked_mean_stack

    fin = finish_unwrap if cfg.lean_phases else (lambda x: x)

    c, img, raw_fd = _step(cube, params, cfg)
    out = dict(
        data=c.data,
        img=img,
        avg_signal=masked_pixel_mean(c.data, c.valid_wh),
        roi_trace=masked_mean_stack(c.data, masks),
        pix_sig=c.data[pix[0], pix[1]],
        pix_amp=c.amplitudes[pix[0], pix[1]],
        pix_ph=fin(c.phases[pix[0], pix[1]]),
    )
    if cfg.specred:
        out.update(_specred_reductions(c, raw_fd, params, cfg, masks))
    else:
        out.update(
            avg_fft=c.avg_fft,
            avg_amp=c.avg_signal_fft,
            avg_ph=fin(c.avg_phase_fft),
            roi_amp=masked_mean_stack(c.amplitudes, masks),
            roi_ph=fin(masked_mean_stack(c.phases, masks)),
        )
    return out


def _specred_reductions(c, raw_fd, params: StepParams, cfg: StepConfig,
                        masks):
    """All spectral publish reductions from ONE pallas pass over the RAW
    spectrum (``ops/pallas_specred.lean_spectral_outputs``); this wrapper
    just assembles the per-frequency FD weight product for the bench
    chain's builtin stages."""
    import jax.numpy as jnp

    from thz_image_explorer_tpu.ops.pallas_specred import (
        lean_spectral_outputs,
    )

    wvec = _fd_weight_product(
        raw_fd.freq, raw_fd.freq.shape[0], params, cfg
    )
    return lean_spectral_outputs(raw_fd.fft, wvec, masks, c.valid_wh)


def _fd_weight_product(freq, nf: int, params: StepParams,
                       cfg: StepConfig) -> "jnp.ndarray":
    """The bench chain's factored per-frequency FD weight product — ONE
    assembly shared by the irfft fold (``_step``) and the one-pass
    spectral reductions (``_specred_reductions``): the two must never
    desynchronize or the published spectra would disagree with the
    time-domain data the folded irfft produces."""
    wvec = jnp.ones((nf,), jnp.float32)
    if cfg.fd_active:
        wvec = wvec * bp.fd_bandpass_weights(
            freq, params.fd_low, params.fd_high, params.fd_width
        )
    if cfg.notch_active:
        wvec = wvec * bp.water_notch_weights(
            freq, params.water_lines, params.notch_width, params.notch_depth
        )
    return wvec
