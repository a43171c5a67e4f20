"""Host API facade: the command surface of the application.

Mirrors the reference's 30-odd-variant ``ConfigCommand`` API
(``/root/reference/src/config.rs:58-164``) and the ``main_thread`` handlers
(``data_thread.rs:148-1050``) as plain methods on an ``Explorer`` object.
Where the reference publishes results into ``Arc<RwLock<…>>``s for the GUI,
the Explorer publishes a :class:`PlotData` snapshot (small 1-D/2-D slices
pulled from device — the cube itself never leaves HBM).

An asynchronous wrapper with the reference's latest-wins command coalescing
lives in :mod:`thz_image_explorer_tpu.pipeline.worker`.
"""

from __future__ import annotations

import dataclasses
import logging
import uuid as _uuidlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from thz_image_explorer_tpu.data import ScanCube
from thz_image_explorer_tpu.io import dotthz as thzio
from thz_image_explorer_tpu.io.psf_npz import load_psf
from thz_image_explorer_tpu.ops.roi import polygon_mask
from thz_image_explorer_tpu.ops.windows import WindowType, window_array
from thz_image_explorer_tpu.pipeline.executor import Pipeline

log = logging.getLogger(__name__)

_jit_window = jax.jit(window_array, static_argnames=("window_type",))

SELECTED_PIXEL = "Selected Pixel"


@dataclasses.dataclass
class HouseKeeping:
    """Scan-condition metadata (``data_container.rs:18-56``), populated at
    load time from the cube geometry (``data_thread.rs:617-639``)."""

    dx: float = 1.0
    x_range: tuple[float, float] = (0.0, 10.0)
    dy: float = 1.0
    y_range: tuple[float, float] = (0.0, 10.0)
    t_begin: float = 1000.0
    range: float = 50.0
    ambient_temperature: float = 22.0
    ambient_pressure: float = 950.0
    ambient_humidity: float = 50.0
    sample_temperature: float = 0.0
    # which ambient/sample fields were actually read from file metadata
    # (the rest are the reference's struct defaults and are shown as such,
    # never displayed as if measured)
    measured: list = dataclasses.field(default_factory=list)

    # metadata key -> field, exactly the keys the reference parses
    # (left_panel.rs:125-130) plus their sibling ambient keys
    _MD_KEYS = {
        "T_S [K]": "sample_temperature",
        "P [mbar]": "ambient_pressure",
        "T [C]": "ambient_temperature",
        "RH [%]": "ambient_humidity",
    }

    def apply_metadata(self, md: dict):
        """Populate ambient/sample conditions from file metadata entries
        when present (``left_panel.rs:125-130``); unparsable values are
        logged and skipped rather than crashing (the reference's
        ``.parse().unwrap()`` would panic)."""
        for key, field in self._MD_KEYS.items():
            if key in md:
                try:
                    setattr(self, field, float(str(md[key]).strip()))
                    self.measured.append(field)
                except ValueError:
                    log.warning("metadata %r=%r is not numeric; ignored",
                                key, md[key])

    @staticmethod
    def from_cube(
        cube: ScanCube, valid_wh: Optional[tuple[int, int]] = None
    ) -> "HouseKeeping":
        hk = HouseKeeping()
        hk.dx = cube.dx if cube.dx is not None else 1.0
        hk.dy = cube.dy if cube.dy is not None else 1.0
        x0 = cube.x_min if cube.x_min is not None else 0.0
        y0 = cube.y_min if cube.y_min is not None else 0.0
        # ranges span the TRUE scan size, not the bucket-padded grid
        w, h = valid_wh if valid_wh is not None else (cube.width, cube.height)
        hk.x_range = (x0, x0 + w * hk.dx)
        hk.y_range = (y0, y0 + h * hk.dy)
        time = np.asarray(cube.time)
        if len(time):
            hk.t_begin = float(time[0])
            hk.range = float(time[-1] - time[0])
        return hk


@dataclasses.dataclass
class PlotData:
    """Published plot series (``PlotDataContainer``,
    ``data_container.rs:60-105``)."""

    time: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    signal: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    filtered_time: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    filtered_signal: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    avg_signal: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    frequencies: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    signal_fft: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    phase_fft: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    filtered_frequencies: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    filtered_signal_fft: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    filtered_phase_fft: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    avg_signal_fft: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    avg_phase_fft: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    roi_signal: dict = dataclasses.field(default_factory=dict)
    roi_signal_fft: dict = dataclasses.field(default_factory=dict)
    roi_phase: dict = dataclasses.field(default_factory=dict)
    refractive_index: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    absorption_coefficient: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    extinction_coefficient: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    available_references: list = dataclasses.field(default_factory=list)
    available_samples: list = dataclasses.field(default_factory=list)


class Explorer:
    """Synchronous command facade over the incremental pipeline."""

    def __init__(self):
        from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache
        from thz_image_explorer_tpu.utils.warmup import warm_transfer_paths

        enable_compile_cache()
        # pay the backend's first-d2h init (0.2-476 s bimodal on the axon
        # tunnel, scripts/probe_tunnel.py) during startup, not inside the
        # first open's publish
        warm_transfer_paths()
        self.pipeline = Pipeline()
        # merged lean publish (round-4 task 1): the executor's fused
        # chain program computes the publish reductions in-program; this
        # provider supplies its traced inputs (ROI masks, pixel indices,
        # optical selectors) and an epoch that changes whenever they do
        self.pipeline.pub_provider = self._lean_pub_provider
        self.plot = PlotData()
        self.metadata = thzio.DotthzMetadata()
        self.pixel_selected = [0, 0]
        # uuid -> (name, polygon or None); None entries are pseudo-ROIs
        # from loaded reference pulses (data_thread.rs:568-583)
        self.rois: dict[str, tuple[str, Optional[list]]] = {}
        # pseudo-ROI spectra: uuid -> (trace, amplitudes, phases)
        self._datasets: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self.sample_selection = ""
        self.reference_selection = ""
        self.sample_thickness = 1.0  # (application.rs:184)
        self._opt_active = False  # set by _lean_pub_provider per publish
        self._warned_optical: set = set()  # once-per-mismatch log guard
        self.image: Optional[np.ndarray] = None
        self.file_path: Optional[str] = None
        self.housekeeping = HouseKeeping()
        # Progressive open (data_thread.rs:1242-1316 paints the image
        # immediately after load): open_file publishes a host-computed
        # PREVIEW first, then the device phase runs as a deferred
        # follow-up command when a worker is attached. ``defer`` is set
        # by ExplorerWorker; ``_pending_open`` holds (epoch, HostScan)
        # until the device phase consumes it.
        self.defer = None
        self._open_epoch = 0
        self._pending_open = None
        # re-entrancy guard: publish() self-heals pending opens, and
        # _finalize_open keeps preview_pending True through its own
        # publish — without the guard that publish would recurse into
        # the finalize and re-run the h2d transfer
        self._finalizing = False
        # 3-D voxel view parameters (threed_plot.rs / paper.md:100-111)
        self.view3d = {
            "contrast": 2.0,
            "kernel_sigma": 3.0,
            "kernel_radius": 9,
            "opacity_threshold": 0.1,
        }

    # ------------------------------------------------------------ files
    def open_file(self, path: str):
        """OpenFile (``data_thread.rs:589-740``), in two phases.

        Phase 1 (here, host-only, sub-second): HDF5 read + metadata/ROI
        parse + a PREVIEW publish — intensity image and selected-pixel
        trace from host numpy, so the user sees their scan immediately
        (the reference paints the image right after load,
        ``data_thread.rs:1242-1316``) instead of a blank busy screen
        while XLA compiles on a cold cache.

        Phase 2 (``_finalize_open``): the device transfer + first chain
        pass. Deferred through the worker queue when one is attached
        (``self.defer``), so state polls between the phases serve the
        preview; run synchronously otherwise (direct library callers see
        the old single-phase contract). Any command that needs real
        pipeline state self-heals via ``_ensure_open_finalized``."""
        host = thzio.open_scan_host(path)
        # captured BEFORE any facade mutation: if the device phase later
        # fails (e.g. ResourceExhausted on the h2d), the facade rolls
        # back to this so it never disagrees with pipeline.input — the
        # single-phase open_file failed atomically and so must this one
        snapshot = self._open_snapshot()
        metadata = host.metadata
        self.metadata = metadata
        self.file_path = path
        self.image = host.preview_image()
        # ROIs serialized in metadata come back (data_thread.rs:646-711)
        self.rois = {}
        self._datasets = {}
        for label, coords in metadata.get_rois():
            self.rois[str(_uuidlib.uuid4())] = (label, coords)
        self.pixel_selected = [0, 0]
        self.housekeeping = HouseKeeping.from_cube(host, host.valid_wh)
        self.housekeeping.apply_metadata(metadata.md)
        # preview plot: raw selected-pixel trace, host math only — the
        # spectral series stay empty until the device phase publishes
        plot = PlotData()
        plot.time = host.time
        plot.signal = host.preview_trace(0, 0)
        plot.available_references = [n for n, _ in self._roi_names()]
        plot.available_samples = plot.available_references + [SELECTED_PIXEL]
        self.plot = plot
        self._open_epoch += 1
        self._pending_open = (self._open_epoch, host, snapshot)
        if self.defer is not None:
            self.defer("_finalize_open", self._open_epoch)
        else:
            self._finalize_open(self._open_epoch)

    @property
    def preview_pending(self) -> bool:
        """True between the preview publish and the device phase — the
        GUI surfaces this so a preview is never mistaken for final."""
        return self._pending_open is not None

    def _open_snapshot(self) -> dict:
        """The facade attributes ``open_file`` mutates before the device
        phase, captured so a failed phase 2 rolls the facade back to the
        previous scan (``_finalize_open``)."""
        return {
            "metadata": self.metadata,
            "file_path": self.file_path,
            "image": self.image,
            "rois": self.rois,
            "_datasets": self._datasets,
            "pixel_selected": self.pixel_selected,
            "housekeeping": self.housekeeping,
            "plot": self.plot,
        }

    def _finalize_open(self, epoch: int):
        """Phase 2 of ``open_file``: h2d transfer, device DC-offset +
        intensity, first chain pass, full publish. Idempotent and
        epoch-guarded — a newer open supersedes a stale deferred
        finalize. ``preview_pending`` stays True for the DURATION of
        this phase INCLUDING its own publish (state polls label the
        served image a preview while the first chain pass compiles);
        the ``_finalizing`` guard keeps that publish's
        ``_ensure_open_finalized`` from recursing back in here and
        re-running the h2d transfer."""
        pending = self._pending_open
        if pending is None or pending[0] != epoch or self._finalizing:
            return
        _, host, snapshot = pending
        self._finalizing = True
        try:
            try:
                cube, img = thzio.finalize_scan(host)
            except BaseException:
                # pipeline.input is untouched, so roll the facade back
                # to the previous scan — the two-phase open fails as
                # atomically as the old single-phase one did (a publish
                # failure below does NOT roll back: by then the pipeline
                # holds the new cube and the facade must agree with it)
                for attr, value in snapshot.items():
                    setattr(self, attr, value)
                raise
            self.image = img
            self.pipeline.set_input(cube, valid_wh=host.valid_wh)
            self.publish()
        finally:
            self._finalizing = False
            # consume only on the way out — also on failure, or a bad
            # device phase would retry-loop on every subsequent command
            if self._pending_open is pending:
                self._pending_open = None

    def _ensure_open_finalized(self):
        """Self-healing seam: any command that needs real device state
        (publish, reference loads, saves) finalizes a pending open first.
        Also covers the pathological case of the deferred finalize being
        drained by an abort — the next command completes the open."""
        if self._pending_open is not None:
            self._finalize_open(self._pending_open[0])

    def open_ref(self, path: str):
        """OpenRef (``data_thread.rs:372-588``): load a reference pulse,
        align it to the scan's time axis, window+FFT it once with the
        current config, and register it as a pseudo-ROI dataset."""
        self._ensure_open_finalized()
        time, signal, _md = thzio.open_pulse(path)
        inp = self.pipeline.input
        if inp is None:
            # no scan loaded: bootstrap a 1x1 zero cube on the pulse's axis
            from thz_image_explorer_tpu.data import make_cube

            cube = make_cube(time, np.zeros((1, 1, len(time)), np.float32))
            self.pipeline.set_input(cube)
            inp = self.pipeline.input
        scan_time = np.asarray(inp.time)
        signal = _align_reference(signal, time, scan_time)

        cfg = self.pipeline.config
        w = np.asarray(
            _jit_window(
                jnp.asarray(scan_time),
                cfg.fft_window_type,
                np.float32(cfg.fft_window[0]),
                np.float32(cfg.fft_window[1]),
            )
        )
        # one-off host math: window + FFT + unwrap of a single trace
        windowed = (signal * w).astype(np.float32)
        spec = np.fft.rfft(windowed)
        amplitudes = np.abs(spec).astype(np.float32)
        phases = np.unwrap(np.angle(spec)).astype(np.float32)

        ref_count = sum(
            1 for _u, (name, _p) in self.rois.items() if "Reference File" in name
        )
        name = f"Reference File {ref_count}" if ref_count else "Reference File"
        uuid = str(_uuidlib.uuid4())
        self.rois[uuid] = (name, None)
        self._datasets[uuid] = (windowed.astype(np.float32), amplitudes, phases)
        self.publish()

    def save_file(self, path: str):
        """SaveFile: raw (initial) cube + metadata (``data_thread.rs:741-768``)."""
        self._ensure_open_finalized()
        inp = self.pipeline.input
        if inp is None:
            return
        md = self.metadata
        if "time" not in md.ds_description:
            md.ds_description = ["time", "dataset"]
        md.set_rois({u: nc for u, nc in self.rois.items() if nc[1] is not None})
        thzio.save_scan(path, inp, md)

    def save_rois(self, path: str):
        """SaveROIs: update ROI entries in the file's metadata
        (``data_thread.rs:274-330``)."""
        md = thzio.load_metadata(path)
        md.set_rois({u: nc for u, nc in self.rois.items() if nc[1] is not None})
        thzio.update_metadata(path, md)

    def save_vtu(self, path: str):
        """SaveVTU (``data_thread.rs:769-786``): export the current 3-D
        voxel instances."""
        from thz_image_explorer_tpu.io.vtk import export_to_vtk
        from thz_image_explorer_tpu.ops.voxel import extract_instances

        self._ensure_open_finalized()
        out = self.pipeline.output
        inp = self.pipeline.input
        if out is None or inp is None:
            return
        t = np.asarray(out.time)
        v0 = self.pipeline.valid_wh0 or (inp.width, inp.height)
        positions, rgba, *_ = extract_instances(
            out.data,
            time_span=float(t[-1] - t[0]) if len(t) > 1 else 1.0,
            scaling=out.scaling,
            original_dims=(v0[0], v0[1], inp.n_time),
            valid_grid=self.pipeline.valid_for(out),
            opacity_threshold=self.view3d["opacity_threshold"],
            contrast=self.view3d["contrast"],
            kernel_sigma=self.view3d["kernel_sigma"],
            kernel_radius=self.view3d["kernel_radius"],
        )
        export_to_vtk(positions, rgba, path)

    def open_psf(self, path: str):
        """OpenPSF (``data_thread.rs:797-812``)."""
        self.pipeline.psf = load_psf(path)

    def update_metadata(self):
        """UpdateMetaData: rewrite the open file's metadata in place
        (``io.rs:363-380``)."""
        if self.file_path is None:
            return
        thzio.update_metadata(self.file_path, self.metadata)

    def revert_metadata(self):
        """Reload the open file's metadata, discarding unsaved edits —
        the metadata editor's Revert button (``left_panel.rs:718-736``
        re-sends LoadMetaData for the selected path)."""
        if self.file_path is None:
            return
        self.metadata = thzio.load_metadata(self.file_path)

    @staticmethod
    def load_metadata(path: str):
        """LoadMetaData: metadata preview without opening the scan (the
        file-dialog preview, ``gui/application.rs:861-900``)."""
        return thzio.load_metadata(path)

    # ------------------------------------------------- 3D view settings
    def set_3d_contrast(self, contrast: float):
        """Set3DContrast (``data_thread.rs:849-852``)."""
        self.view3d["contrast"] = float(contrast)

    def set_kernel_sigma(self, sigma: float):
        """SetKernelSigma (``data_thread.rs:845-848``)."""
        self.view3d["kernel_sigma"] = float(sigma)

    def set_kernel_radius(self, radius: int):
        """SetKernelRadius (``data_thread.rs:841-844``)."""
        self.view3d["kernel_radius"] = int(radius)

    def set_opacity_threshold(self, threshold: float):
        self.view3d["opacity_threshold"] = float(threshold)

    def sibling_files(self) -> list[str]:
        """Files with the open file's extension in its directory, sorted —
        the left panel's arrow-key navigation table (``io.rs:285-308``)."""
        if self.file_path is None:
            return []
        from thz_image_explorer_tpu.io.files import find_files_with_same_extension

        return find_files_with_same_extension(self.file_path)

    def open_sibling(self, delta: int):
        """Arrow-key prev/next navigation with wrap-around
        (``left_panel.rs:165-275``)."""
        import os

        sibs = self.sibling_files()
        if not sibs or self.file_path is None:
            return
        try:
            idx = sibs.index(os.path.abspath(self.file_path))
        except ValueError:
            return
        self.open_file(sibs[(idx + delta) % len(sibs)])

    def apply_psf(self, psf):
        """ApplyPSF from the PSF tool (``data_thread.rs:787-796``)."""
        self.pipeline.psf = psf

    def apply_settings(self, s):
        """Apply persisted user preferences at startup — the reference
        loads ``GuiSettingsContainer`` (incl. the serialized PSF) before
        the first frame (``main.rs:144-161``,
        ``gui/application.rs:134-170``)."""
        cfg = self.pipeline.config
        cfg.fft_log_plot = bool(s.fft_log_plot)
        cfg.avg_in_fourier_space = bool(s.avg_in_fourier_space)
        cfg.scale_factor = int(s.downscaling)
        self.sample_thickness = float(s.sample_thickness)
        self.view3d.update(
            opacity_threshold=float(s.opacity_threshold),
            contrast=float(s.contrast_3d),
            kernel_sigma=float(s.kernel_sigma),
            kernel_radius=int(s.kernel_radius),
        )
        if s.psf is not None and s.psf.is_loaded:
            self.pipeline.psf = s.psf

    def collect_settings(self):
        """Current preferences for the exit autosave (``main.rs:116-126``)."""
        from thz_image_explorer_tpu.utils.settings import Settings

        cfg = self.pipeline.config
        return Settings(
            fft_log_plot=bool(cfg.fft_log_plot),
            avg_in_fourier_space=bool(cfg.avg_in_fourier_space),
            downscaling=int(cfg.scale_factor),
            sample_thickness=float(self.sample_thickness),
            opacity_threshold=float(self.view3d["opacity_threshold"]),
            contrast_3d=float(self.view3d["contrast"]),
            kernel_sigma=float(self.view3d["kernel_sigma"]),
            kernel_radius=int(self.view3d["kernel_radius"]),
            psf=self.pipeline.psf,
        )

    def idle_housekeeping_pending(self) -> bool:
        """Whether :meth:`on_idle` has real work: the worker only delays
        the idle signal for the debounce quiet period when a refresh is
        actually due — a burst of commands that left nothing stale must
        not cost join_idle() an extra half second."""
        p = self.pipeline
        return bool(p.timings_stale) and p.record_timings and p.input is not None

    def on_idle(self):
        """Idle housekeeping, invoked by the worker when the command
        queue drains: refresh the per-stage ms the fused interactive
        program could not split (one exact shadow pass; stages are pure,
        so state is unchanged — round-4 task 7, matching the reference's
        fresh per-filter ms on every pass, ``filters/filter.rs:607-621``)."""
        self.pipeline.refresh_stage_timings()

    def warmup(self):
        """Precompile the interactive programs at the current scan
        shape/active-set (``serve --precompile`` enqueues this right
        after the first open, so the first slider drag of a session hits
        already-compiled code; results land in the persistent compile
        cache for future sessions). The pass recomputes slots to
        identical values — no user-visible state changes, no publish."""
        p = self.pipeline
        if p.input is None:
            return
        # fused interactive runs always execute from slot 0 (run_from
        # forces start=1 — one program per static config), so a single
        # pass compiles THE interactive program for this shape/active-set;
        # with THZ_FUSED_EXEC=0 the same pass exposes every per-stage
        # program. A per-dirty-range loop would just re-dispatch the
        # identical program once per start point.
        p.run_from(1)
        # compile the idle shadow pass's per-stage programs too, so the
        # first post-interaction timing refresh doesn't block the worker
        # on cold compiles
        p.refresh_stage_timings()
        # also warm the 3-D voxel program (its remote compile is ~1 min —
        # longer than the web call timeout — so the first 3-D tab view
        # would otherwise show the busy fallback until compiled)
        out = p.output
        if out is not None:
            from thz_image_explorer_tpu.ops.voxel import extract_instances_topk

            inp = p.input
            t = np.asarray(out.time)
            v0 = self.pipeline.valid_wh0 or (inp.width, inp.height)
            extract_instances_topk(
                out.data,
                time_span=float(t[-1] - t[0]) if len(t) > 1 else 1.0,
                scaling=out.scaling,
                original_dims=(v0[0], v0[1], inp.n_time),
                max_points=120_000,
                valid_grid=p.valid_for(out),
                opacity_threshold=self.view3d["opacity_threshold"],
                contrast=self.view3d["contrast"],
                kernel_sigma=self.view3d["kernel_sigma"],
                kernel_radius=self.view3d["kernel_radius"],
            )

    # ------------------------------------------------------- fft config
    def set_fft_window_low(self, low: float):
        self.pipeline.config.fft_window[0] = low
        self._rerun_from_fft()

    def set_fft_window_high(self, high: float):
        self.pipeline.config.fft_window[1] = high
        self._rerun_from_fft()

    def set_fft_window_type(self, window_type: WindowType):
        self.pipeline.config.fft_window_type = window_type
        self._rerun_from_fft()

    def set_fft_log_plot(self, enabled: bool):
        self.pipeline.config.fft_log_plot = enabled

    def set_avg_in_fourier_space(self, enabled: bool):
        self.pipeline.config.avg_in_fourier_space = enabled
        self._rerun_from_fft()

    def set_fft_resolution(self, df: float):
        """SetFFTResolution stores the value and republishes
        (``UpdateType::Plot``, ``data_thread.rs:829-832``; the reference
        stores ``fft_df`` without consuming it elsewhere — kept as-is for
        parity)."""
        self.pipeline.config.fft_df = df
        self.publish()

    def set_downscaling(self, scale: int):
        """SetDownScaling re-runs from the scaling stage
        (``data_thread.rs:837-840``)."""
        self.pipeline.config.scale_factor = scale
        self.pipeline.run_from(self.pipeline.scaling_index)
        self.publish()

    def _rerun_from_fft(self):
        """FFT-window commands re-run from the fft stage
        (``data_thread.rs:813-836``)."""
        self.pipeline.run_from(self.pipeline.fft_index)
        self.publish()

    # ------------------------------------------------------- filters
    def update_filter(self, uuid: str, *, force: bool = False):
        self.pipeline.update_filter(uuid, force=force)
        self.publish()

    def update_filters(self):
        self.pipeline.update_all()
        self.publish()

    def set_filter_param(self, uuid: str, key: str, value):
        """Set one filter parameter (the UI slider path; always executed
        on the worker thread — request threads must never mutate filter
        state directly)."""
        f = self.pipeline.filters[uuid]
        if hasattr(f, "params") and hasattr(f.params, key):
            target = f.params
        elif hasattr(f, key):
            target = f
        else:
            return
        # coerce to the declared field type: the UI sends every number as
        # a float, but integer params (n_iterations, n_filters) must stay
        # integers or the Apply path crashes in range()/linspace(num=...)
        # (the reference's typed struct fields can't drift, filter.rs:96)
        cur = getattr(target, key)
        if isinstance(cur, bool):
            value = bool(value)
        elif isinstance(cur, (int, float)):
            value = type(cur)(value)
        setattr(target, key, value)

    def set_metadata_field(self, key: str, value):
        """Edit a top-level metadata field (``left_panel.rs:693-1009``)."""
        if hasattr(self.metadata, key) and key != "md":
            setattr(self.metadata, key, str(value))

    def set_metadata_attr(self, key: str, value):
        self.metadata.md[str(key)] = str(value)

    def delete_metadata_attr(self, key: str):
        self.metadata.md.pop(str(key), None)

    def set_filter_active(self, uuid: str, active: bool):
        """Toggle a filter. Deconvolution special-case: enabling it does
        NOT trigger a recompute — the user must hit Apply
        (``filters/filter.rs:590-605``: the toggle only sends
        ``UpdateFilter`` for normal filters, or when *disabling* the
        deconvolution to remove its effect)."""
        stage = self.pipeline.filters[uuid]
        changed = stage.active != active
        stage.active = active
        if changed and (not stage.is_deconvolution or not active):
            self.update_filter(uuid)

    # ------------------------------------------------------- selection
    def set_selected_pixel(self, x: int, y: int):
        """Cheap path: re-publish plot slices only
        (``data_thread.rs:853-903``). Coordinates are sanitized here —
        the single entry point — so every publish path (device gathers
        clamp negatives to 0, the numpy fallback would wrap to the
        opposite edge) sees the same non-negative ints.

        ``show_data`` is an extension-only preview hook (no builtin
        overrides it): stages that override get the reference contract —
        a fully populated final dataset (``data_thread.rs:1322-1334``)
        and the pixel in the FINAL slot's downscaled coordinates
        (``data_thread.rs:858`` divides by ``data.scaling``)."""
        from thz_image_explorer_tpu.pipeline.stage import FilterStage

        self.pixel_selected = [max(int(x), 0), max(int(y), 0)]
        overriders = [
            f for f in self.pipeline.filters.values()
            if type(f).show_data is not FilterStage.show_data
        ]
        if overriders:
            out = self.pipeline.materialize_output()
            if out is not None:
                s = max(out.scaling, 1)
                # clamp into the VALID region of a bucket-padded grid —
                # padded pixels hold zeros, not scan data
                vw, vh = (
                    self.pipeline.valid_for(out)
                    or (out.width, out.height)
                )
                px = (
                    min(self.pixel_selected[0] // s, vw - 1),
                    min(self.pixel_selected[1] // s, vh - 1),
                )
                for f in overriders:
                    f.show_data(out, px)
        self.publish()

    # ------------------------------------------------------- ROIs
    def add_roi(self, uuid: str, name: str, polygon: Optional[list]):
        # polygon None = pseudo-ROI entry (loaded reference pulse)
        coords = (
            None if polygon is None
            else [(int(x), int(y)) for x, y in polygon]
        )
        self.rois[uuid] = (name, coords)
        self.publish()

    def update_roi(self, uuid: str, name: str, polygon: list):
        self.add_roi(uuid, name, polygon)

    def delete_roi(self, uuid: str):
        self.rois.pop(uuid, None)
        self._datasets.pop(uuid, None)
        self.publish()

    # ------------------------------------------------- material params
    def set_reference(self, name: str):
        self.reference_selection = name
        self.publish()

    def set_sample(self, name: str):
        self.sample_selection = name
        self.publish()

    def set_material_thickness(self, thickness: float):
        self.sample_thickness = thickness
        self.publish()

    def update_material_calculation(self):
        self.publish()

    # ------------------------------------------------------- publish
    def publish(self):
        """Pull the published plot slices from device state — the
        equivalent of the big ``data_lock`` write at
        ``data_thread.rs:1336-1560``. Everything is gathered by ONE device
        program and fetched in ONE transfer (the cube never leaves HBM).

        Two paths: when the executor's last run was the merged LEAN
        program (interactive default), the publish outputs were computed
        inside the chain program and only need the one transfer
        (``pipeline.lean_publish``; a changed pixel/ROI/optical selection
        re-dispatches the cached program). Otherwise (exact mode, fused
        tails, kill switch) the standalone gather program runs over the
        materialized slots — see
        :mod:`thz_image_explorer_tpu.pipeline.publish`."""
        from thz_image_explorer_tpu.pipeline.publish import gather_publish

        self._ensure_open_finalized()

        plot = PlotData()
        slots = self.pipeline.slots
        raw = slots[0]
        if raw is None:
            self.plot = plot
            return

        poly_rois = [
            (u, name, poly)
            for u, (name, poly) in self.rois.items()
            if poly is not None
        ]

        filtered = self.pipeline.output
        if filtered is not None and filtered.amplitudes is None:
            # lean final slot: the merged program owns the publish outputs
            host = self.pipeline.lean_publish()
            if host is not None:
                # _lean_pub_provider just ran inside lean_publish() and
                # recorded whether the optical selection resolved — don't
                # re-resolve it (dataset lookups + pseudo-spectrum stacks)
                # a second time per publish
                self._fill_plot(
                    plot, host, poly_rois, optical=self._opt_active
                )
                return

        raw_fd = self.pipeline.raw_fd_view()
        if raw_fd is None or filtered is None or filtered.amplitudes is None:
            # mid-failure fallback: still publish the raw trace so the GUI
            # shows *something* (the reference publishes per-slot too)
            px = min(self.pixel_selected[0], raw.width - 1)
            py = min(self.pixel_selected[1], raw.height - 1)
            plot.time = np.asarray(raw.time)
            plot.signal = np.asarray(raw.data[px, py])
            plot.available_references = [n for n, _ in self._roi_names()]
            plot.available_samples = plot.available_references + [SELECTED_PIXEL]
            self.plot = plot
            return

        masks = self._roi_mask_stack(poly_rois, filtered)
        optical = self._optical_request(poly_rois, filtered.amplitudes.shape[-1])
        host = gather_publish(
            raw,
            raw_fd,
            filtered,
            masks,
            tuple(self.pixel_selected),
            self.pipeline.config.avg_in_fourier_space,
            optical=optical,
        )
        self._fill_plot(plot, host, poly_rois, optical="refractive_index" in host)

    def _fill_plot(self, plot: PlotData, host: dict, poly_rois,
                   *, optical: bool):
        """Unpack a publish-output dict (host numpy) into ``self.plot`` —
        shared by the lean and standalone paths (identical keys)."""
        plot.time = host["time"]
        plot.signal = host["signal"]
        plot.frequencies = host["frequencies"]
        plot.signal_fft = host["signal_fft"]
        plot.phase_fft = host["phase_fft"]
        plot.filtered_time = host["filtered_time"]
        plot.filtered_signal = host["filtered_signal"]
        plot.filtered_frequencies = host["filtered_frequencies"]
        plot.filtered_signal_fft = host["filtered_signal_fft"]
        plot.filtered_phase_fft = host["filtered_phase_fft"]
        plot.avg_signal = host["avg_signal"]
        plot.avg_signal_fft = host["avg_signal_fft"]
        plot.avg_phase_fft = host["avg_phase_fft"]
        img = host["image"]
        v0 = self.pipeline.valid_wh0
        self.image = img if v0 is None else img[: v0[0], : v0[1]]

        for i, (uuid, name, _poly) in enumerate(poly_rois):
            plot.roi_signal[uuid] = (name, host["roi_trace"][i])
            plot.roi_signal_fft[uuid] = (name, host["roi_amp"][i])
            plot.roi_phase[uuid] = (name, host["roi_ph"][i])
        # pseudo-ROIs from loaded reference pulses (host-resident)
        for uuid, (name, poly) in self.rois.items():
            if poly is not None:
                continue
            data = self._datasets.get(uuid)
            if data is None:
                continue
            trace, amplitudes, phases = data
            plot.roi_signal[uuid] = (name, trace)
            plot.roi_signal_fft[uuid] = (name, amplitudes)
            plot.roi_phase[uuid] = (name, phases)

        if optical and "refractive_index" in host:
            plot.refractive_index = host["refractive_index"]
            plot.absorption_coefficient = host["absorption_coefficient"]
            plot.extinction_coefficient = host["extinction_coefficient"]

        plot.available_references = [name for name, _ in self._roi_names()]
        plot.available_samples = plot.available_references + [SELECTED_PIXEL]
        self.plot = plot

    def _optical_request(self, poly_rois, nf: int):
        """Build the gather program's optical-selection payload
        (``data_thread.rs:1489-1559``): the reference/sample each resolve
        to a ROI index, the selected pixel, or a host pseudo-ROI (loaded
        reference pulse) amp/phase pair. ``nf`` is the final slot's
        frequency-bin count (pseudo spectra must match it)."""
        ref_uuid = self._uuid_for(self.reference_selection)
        if ref_uuid is None:
            return None
        roi_index = {u: i for i, (u, _n, _p) in enumerate(poly_rois)}

        def resolve(uuid):
            if uuid in roi_index:
                return "roi", roi_index[uuid], None
            data = self._datasets.get(uuid)
            if data is None:
                return None
            if len(data[1]) != nf:
                # loud, like the reference's mismatch warning
                # (data_thread.rs:405-412) — never a silent skip. Warned
                # ONCE per (selection, bin-count): the resolver runs on
                # every interactive publish, and a slider drag must not
                # flood the log with duplicates (the reference warns at
                # load time only)
                wkey = (uuid, len(data[1]), nf)
                if wkey not in self._warned_optical:
                    self._warned_optical.add(wkey)
                    log.warning(
                        "optical selection %r skipped: its spectrum has "
                        "%d frequency bins but the scan has %d "
                        "(different time axis); reload it after opening "
                        "this scan",
                        self._label_for(uuid), len(data[1]), nf,
                    )
                return None
            _trace, amp, ph = data
            return "pseudo", 0, np.stack([amp, ph]).astype(np.float32)

        ref = resolve(ref_uuid)
        if ref is None:
            return None
        opt = {
            "ref_mode": ref[0],
            "ref_idx": ref[1],
            "thickness": self.sample_thickness,
        }
        if ref[2] is not None:
            opt["ref_pseudo"] = ref[2]
        if self.sample_selection == SELECTED_PIXEL:
            opt["samp_mode"] = "pixel"
        else:
            samp_uuid = self._uuid_for(self.sample_selection)
            if samp_uuid is None:
                return None
            samp = resolve(samp_uuid)
            if samp is None:
                return None
            opt["samp_mode"] = samp[0]
            opt["samp_idx"] = samp[1]
            if samp[2] is not None:
                opt["samp_pseudo"] = samp[2]
        return opt

    def _roi_mask_stack(self, poly_rois, filtered: ScanCube):
        """Mask stack on a final-slot cube's grid (standalone publish)."""
        shape = (filtered.data.shape[0], filtered.data.shape[1])
        valid = self.pipeline.valid_for(filtered) or shape
        return self._roi_mask_geom(
            poly_rois, shape, valid, filtered.scaling, min_r=0
        )

    def _roi_mask_geom(self, poly_rois, shape, valid, scaling, min_r=0):
        """Device-cached (R, Xf, Yf) f32 mask stack for the polygon ROIs on
        the final slot's (possibly downscaled) grid — transferred once per
        ROI-set/grid change, not per publish.

        Rasterization runs on the VALID grid (the rasterizer's vertical
        flip ``mask[y_size-1-y, x]`` is defined by the true scan height,
        ``math_tools.rs:640-648``) and is then zero-padded to the
        bucket-padded device grid. ``min_r`` forces a minimum stack count
        (the merged lean program indexes the stack with traced ROI
        indices, so it needs R >= 1 even with no ROIs)."""
        shape = tuple(shape)
        valid = tuple(valid)
        # bucket the ROI COUNT to a multiple of 4 with all-zero masks
        # (masked_mean_stack yields zeros for them): the mask-stack
        # shape is static in the publish/chain program, so without this
        # every added/removed ROI recompiles it — tens of seconds per
        # ROI on a remote-compile TPU
        r = len(poly_rois)
        r_total = max(min_r, r + (-r % 4)) if (r or min_r) else 0
        # the cache keys on the RESULT geometry (r_total), not min_r:
        # the lean (min_r=4) and standalone (min_r=0) publish paths
        # usually produce identical stacks and must share the entry
        # instead of evicting each other on every mode switch
        key = (
            tuple((u, tuple(map(tuple, poly))) for u, _n, poly in poly_rois),
            shape,
            valid,
            scaling,
            r_total,
        )
        cached = getattr(self, "_mask_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        stack = np.zeros((r_total,) + shape, np.float32)
        for i, (_u, _n, poly) in enumerate(poly_rois):
            m = np.asarray(polygon_mask(poly, valid, scaling), np.float32)
            stack[i, : valid[0], : valid[1]] = m
        dev = jnp.asarray(stack)
        self._mask_cache = (key, dev)
        return dev

    def _lean_pub_provider(self, spec):
        """Publish inputs for the executor's merged lean program
        (:class:`~thz_image_explorer_tpu.pipeline.executor.PubSpec`):
        ROI mask stack, per-slot pixel indices, traced optical selectors,
        plus an epoch tuple that changes exactly when any of them do —
        an unchanged epoch lets ``lean_publish`` reuse the outputs of the
        chain dispatch that just ran instead of re-dispatching."""
        poly_rois = [
            (u, name, poly)
            for u, (name, poly) in self.rois.items()
            if poly is not None
        ]
        masks = self._roi_mask_geom(
            poly_rois, spec.shape, spec.valid_wh, spec.scaling, min_r=4
        )
        px, py = self.pixel_selected

        def idx(scale, w, h):
            return np.asarray(
                [min(px // scale, w - 1), min(py // scale, h - 1)], np.int32
            )

        opt = self._optical_request(poly_rois, spec.n_freq)
        #: consumed by _publish_plot's lean branch in the same publish —
        #: whether the optical tab has a resolved reference selection
        self._opt_active = opt is not None
        opt = opt or {}
        mode_code = {"roi": 1, "pseudo": 2, "pixel": 3}
        zeros2f = np.zeros((2, spec.n_freq), np.float32)
        pub = {
            "masks": masks,
            "rxy": idx(1, spec.raw_shape[0], spec.raw_shape[1]),
            "fxy": idx(spec.rawfd_scaling, spec.shape[0], spec.shape[1]),
            "gxy": idx(spec.scaling, spec.shape[0], spec.shape[1]),
            "ref_mode": np.int32(mode_code.get(opt.get("ref_mode"), 0)),
            "samp_mode": np.int32(mode_code.get(opt.get("samp_mode"), 3)),
            "ref_idx": np.int32(opt.get("ref_idx", 0)),
            "samp_idx": np.int32(opt.get("samp_idx", 0)),
            "ref_pseudo": opt.get("ref_pseudo", zeros2f),
            "samp_pseudo": opt.get("samp_pseudo", zeros2f),
            "thickness": np.float32(opt.get("thickness", self.sample_thickness)),
        }
        # (cube_key, view_key) split (round-5 task 6): the executor's
        # one-pixel fast path may serve a publish whose CUBE key is
        # unchanged — ROI geometry feeds the masked reductions over
        # in-program spectral temporaries, so any POLYGON change needs
        # the full lean re-dispatch; pixel/optical/dataset changes only
        # touch gathers and F-length math over cached means. Pseudo-ROI
        # entries (poly None, from open_ref) build no mask and their
        # spectra enter as per-dispatch VALUES (ref/samp_pseudo), so they
        # live in the view key (sorted datasets) — hashing them into the
        # cube key forced a needless full re-dispatch per reference load
        epoch = (
            tuple(
                (u, n, tuple(map(tuple, p)))
                for u, (n, p) in self.rois.items()
                if p
            ),
            (
                tuple(self.pixel_selected),
                self.reference_selection,
                self.sample_selection,
                float(self.sample_thickness),
                tuple(sorted(self._datasets)),
            ),
        )
        return pub, epoch

    def _roi_names(self):
        return [(name, u) for u, (name, _poly) in self.rois.items()]

    def _uuid_for(self, name: str) -> Optional[str]:
        for u, (n, _poly) in self.rois.items():
            if n == name:
                return u
        return None

    def _label_for(self, uuid: str) -> str:
        entry = self.rois.get(uuid)
        return entry[0] if entry else uuid


def _align_reference(
    signal: np.ndarray, time: np.ndarray, scan_time: np.ndarray
) -> np.ndarray:
    """Resize/align a reference pulse onto the scan's time axis
    (``data_thread.rs:405-481``)."""
    signal = np.asarray(signal, np.float32)
    if len(scan_time) == len(signal) and (
        len(time) == 0 or abs(scan_time[0] - time[0]) <= 1e-9
    ):
        return signal
    target_len = len(scan_time)
    # the reference is LOUD about both adjustments
    # (data_thread.rs:405-425): the resize notice and the dt mismatch
    # (offset placement is only exact for matching sample steps)
    if len(signal) != target_len:
        log.warning(
            "reference pulse resized from %d to %d samples to match the "
            "scan's time axis", len(signal), target_len,
        )
    if len(scan_time) > 1 and len(time) > 1:
        ref_dt = time[1] - time[0]
        scan_dt = scan_time[1] - scan_time[0]
        if abs(float(ref_dt) - float(scan_dt)) > 1e-9:
            log.warning(
                "time steps of scan (%.4g ps) and reference (%.4g ps) do "
                "not match; the aligned reference trace is approximate",
                float(scan_dt), float(ref_dt),
            )
        offset = int(np.round((scan_time[0] - time[0]) / ref_dt))
        out = np.zeros(target_len, np.float32)
        src_start = offset if offset > 0 else 0
        dst_start = -offset if offset < 0 else 0
        copy_len = min(len(signal) - src_start, target_len - dst_start)
        if copy_len > 0:
            out[dst_start : dst_start + copy_len] = signal[
                src_start : src_start + copy_len
            ]
        return out
    out = np.zeros(target_len, np.float32)
    n = min(target_len, len(signal))
    out[:n] = signal[:n]
    return out
