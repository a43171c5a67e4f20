"""Incremental pipeline executor.

The centerpiece runtime (TPU equivalent of ``main_thread``'s chain
execution, ``/root/reference/src/data_thread.rs:1080-1228``): an ordered
stage chain over per-stage cached cubes, re-executed from the first dirty
stage onward. Each stage dispatches jit-compiled device programs; outputs
stay resident in HBM, so an interactive parameter change re-runs only the
downstream slice of the chain.

Contracts preserved:

* stages upstream of the dirty index keep their cached outputs;
* inactive stages are identity (``data_thread.rs:1185-1188``);
* the deconvolution **rerun-suppression** rule: if any other custom filter
  executes in the re-run range, the deconvolution stage passes its input
  through instead of re-running (``data_thread.rs:1139-1150``) — a fresh
  deconvolution requires an explicit Apply;
* a stage that changes the time-axis length gets a recomputed frequency
  axis and zeroed spectra (the FFT "re-planning" of
  ``data_thread.rs:1194-1227`` — under XLA this is just a shape change
  that triggers recompilation of downstream stages);
* per-stage wall-clock timings (``filter_computation_time_lock``) and
  per-stage progress values (``progress_lock``).
"""

from __future__ import annotations

import logging
import time as _time
from typing import Callable, Optional

import jax
import numpy as np

from thz_image_explorer_tpu.data import ScanCube, device_zeros, frequency_axis
from thz_image_explorer_tpu.ops.fourier import forward_fft, inverse_fft
from thz_image_explorer_tpu.ops.intensity import (
    intensity_image,
    upscaled_intensity_image,
)
from thz_image_explorer_tpu.ops.scaling import scale_cube
from thz_image_explorer_tpu.ops.windows import WindowType
from thz_image_explorer_tpu.pipeline.stage import (
    FilterStage,
    StageContext,
    build_chain,
    instantiate_filters,
)

log = logging.getLogger(__name__)


class PipelineConfig:
    """Processing configuration (``ConfigContainer``, ``config.rs:171-213``)."""

    def __init__(self):
        self.fft_window = [1.0, 7.0]
        self.fft_window_type = WindowType.ADAPTED_BLACKMAN
        self.scale_factor = 1
        self.fft_log_plot = False
        self.avg_in_fourier_space = False
        self.fft_df = 1.0


class Pipeline:
    """Ordered stage chain with dirty-index incremental recompute."""

    def __init__(
        self,
        filters: Optional[dict[str, FilterStage]] = None,
        *,
        record_timings: bool = True,
    ):
        self.filters: dict[str, FilterStage] = (
            filters if filters is not None else instantiate_filters()
        )
        self.chain, self.scaling_index, self.fft_index, self.ifft_index = (
            build_chain(self.filters)
        )
        self.slots: list[Optional[ScanCube]] = [None] * len(self.chain)
        self.config = PipelineConfig()
        self.record_timings = record_timings
        self.timings: dict[str, float] = {}
        self.progress: dict[str, Optional[float]] = {
            uuid: None for uuid in self.filters
        }
        self.psf = None  # models.psf.PSF, set via ApplyPSF / OpenPSF
        self.cancelled: Callable[[], bool] = lambda: False

    # ------------------------------------------------------------------
    def index_of(self, uuid: str) -> int:
        return self.chain.index(uuid)

    @property
    def input(self) -> Optional[ScanCube]:
        return self.slots[0]

    @property
    def output(self) -> Optional[ScanCube]:
        return self.slots[-1]

    def set_input(self, cube: ScanCube, *, reset_filters: bool = True):
        """Load a new scan: fill slot 0, reset filters, run the chain
        (``data_thread.rs:717-720`` + ``reset_filters`` at ``:1027-1060``)."""
        self.slots = [cube] + [None] * (len(self.chain) - 1)
        if reset_filters:
            time = np.asarray(cube.time)
            shape = (cube.width, cube.height, cube.n_time)
            for f in self.filters.values():
                f.reset(time, shape)
        self.run_from(1)

    # ------------------------------------------------------------------
    def run_from(
        self, start_idx: int, *, force_all: bool = False,
        block_timings: Optional[bool] = None,
    ):
        """Re-execute ``chain[start_idx:]``.

        ``force_all`` bypasses the deconvolution-suppression rule (used by
        the explicit "Calculate All" command / Apply button path).

        ``block_timings`` controls whether per-stage timings synchronize on
        each stage's output (accurate ms, one device round-trip per stage —
        expensive over remote-tunnelled devices) or record dispatch time
        only. Defaults to ``force_all``: the interactive slider path stays
        fully async, the explicit Calculate-All/Apply path reports true
        per-stage times (the reference's per-filter ms display,
        ``data_thread.rs:1107,1169-1184``).
        """
        if block_timings is None:
            block_timings = force_all
        run_deconvolution = True
        for i in range(max(start_idx, 1), len(self.chain)):
            name = self.chain[i]
            inp = self.slots[i - 1]
            if inp is None or inp.time.shape[0] == 0:
                log.warning("input for stage %s is empty; skipping", name)
                continue
            t_start = _time.perf_counter()
            if name == "scaling":
                out = scale_cube(inp, self.config.scale_factor)
            elif name == "fft":
                out = forward_fft(
                    inp,
                    self.config.fft_window_type,
                    self.config.fft_window[0],
                    self.config.fft_window[1],
                )
            elif name == "ifft":
                out = inverse_fft(inp, self.config.avg_in_fourier_space)
            else:
                stage = self.filters[name]
                is_deconv = "Deconvolution" in stage.name
                if not is_deconv:
                    # any other custom filter in the range suppresses a
                    # deconvolution rerun (data_thread.rs:1144-1147)
                    run_deconvolution = False
                if stage.active and not (
                    is_deconv and not (run_deconvolution or force_all)
                ):
                    ctx = StageContext(
                        progress=self._progress_setter(name),
                        cancelled=self.cancelled,
                        psf=self.psf,
                    )
                    out = stage.apply(inp, ctx)
                else:
                    out = inp  # identity pass-through (cubes are immutable)
            if self.record_timings:
                if block_timings:
                    jax.block_until_ready(out.data)
                self.timings[name] = _time.perf_counter() - t_start
            if out.n_time != inp.n_time and name != "initial":
                out = self._replan(out)
            self.slots[i] = out

    def _progress_setter(self, uuid: str):
        def setter(value):
            self.progress[uuid] = value

        return setter

    @staticmethod
    def _replan(cube: ScanCube) -> ScanCube:
        """Frequency-axis recompute + spectra realloc after a time-length
        change (``data_thread.rs:1194-1227``)."""
        freq = frequency_axis(cube.time)
        nf = freq.shape[0]
        shape = (cube.width, cube.height, nf)
        return cube.replace(
            freq=freq,
            fft=device_zeros(shape=shape, dtype=np.complex64),
            amplitudes=device_zeros(shape=shape, dtype=np.float32),
            phases=device_zeros(shape=shape, dtype=np.float32),
        )

    # ------------------------------------------------------------------
    def update_filter(self, uuid: str, *, force: bool = False):
        """Incremental recompute from a single filter's position
        (``UpdateFilter``, ``data_thread.rs:907-921``)."""
        self.run_from(self.index_of(uuid), force_all=force)

    def update_all(self):
        self.run_from(1, force_all=True)

    # ------------------------------------------------------------------
    def current_image(self) -> Optional[np.ndarray]:
        """Intensity image of the final stage, block-upscaled to the
        original grid when downscaled (``data_thread.rs:1242-1308``)."""
        out = self.output
        if out is None:
            return None
        if out.scaling > 1:
            return np.asarray(upscaled_intensity_image(out.data, out.scaling))
        return np.asarray(intensity_image(out.data))
