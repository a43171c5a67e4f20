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
import os
import queue as _queue
import threading
import time as _time
from typing import Callable, Optional

from typing import NamedTuple

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


@jax.jit
def _probe(x):
    """Tiny device reduction used as a per-stage completion marker: the
    device executes programs in dispatch order, so the wall-clock at which
    this scalar resolves on the host is the stage's true completion time.
    (A scalar read is the only reliable completion barrier on remote
    tunnelled runtimes, where ``block_until_ready`` can return at enqueue
    time.)"""
    import jax.numpy as jnp

    return jnp.sum(jnp.ravel(x)[:: max(1, x.size // 1024)])


class _AsyncStageTimer:
    """Resolves per-stage completion probes in a background thread and
    writes honest device-time ms into the shared timings dict — the
    reference's per-filter ms display (``data_thread.rs:1107,1169-1184``)
    without synchronizing the interactive dispatch path. Timings settle a
    round-trip later, matching the GUI's polled refresh."""

    def __init__(self, sink: dict):
        self._sink = sink
        self._q: _queue.Queue = _queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._stop = False

    def _ensure_thread(self):
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()
            import atexit

            # unblock the worker before interpreter teardown (a daemon
            # thread parked in queue.get + device reads aborts noisily)
            atexit.register(self._shutdown)

    def _shutdown(self):
        self._stop = True
        if self._thread is not None and self._thread.is_alive():
            self._q.put(("stop", None, None))
            self._thread.join(timeout=2.0)

    def mark_run_start(self):
        self._ensure_thread()
        self._q.put(("start", _time.perf_counter(), None))

    def record(self, name: str, out_data):
        try:
            p = _probe(out_data)
        except Exception:  # pragma: no cover - defensive: never break a run
            return
        self._q.put(("probe", name, p))

    def drain(self, timeout: float = 30.0):
        """Block until every queued probe has resolved (tests/metrics)."""
        deadline = _time.monotonic() + timeout
        while self._q.unfinished_tasks and _time.monotonic() < deadline:
            _time.sleep(0.005)

    def _run(self):
        last = _time.perf_counter()
        while not self._stop:
            kind, a, b = self._q.get()
            try:
                if kind == "stop":
                    return
                if kind == "start":
                    last = a
                    continue
                try:
                    # poll the runtime's ready flag instead of
                    # materialising the scalar: a device->host read from a
                    # second thread can deadlock some PJRT clients, a
                    # status query cannot. Exponential backoff (0.2 ms ->
                    # 1 ms cap): on a 1-core host a hot 200 µs spin would
                    # steal cycles from the worker during every
                    # interactive burst; a <=1 ms overshoot keeps the ms
                    # display honest to ~10% at typical stage times.
                    delay = 0.0002
                    while not b.is_ready() and not self._stop:
                        _time.sleep(delay)
                        delay = min(delay * 2.0, 0.001)
                except Exception:  # pragma: no cover
                    continue
                now = _time.perf_counter()
                self._sink[a] = now - last
                last = now
            finally:
                self._q.task_done()


class _Meta:
    """Host-side cube geometry handed to ``fused_static`` (duck-types
    the ScanCube fields it reads). ``valid_wh`` is the host-known TRUE
    scan size (tuple) of a bucket-padded grid — unlike ScanCube's traced
    device leaf — so stages can derive static geometry from it."""

    __slots__ = ("width", "height", "dx", "dy", "valid_wh")

    def __init__(self, width, height, dx, dy, valid_wh=None):
        self.width, self.height, self.dx, self.dy = width, height, dx, dy
        self.valid_wh = valid_wh if valid_wh is not None else (width, height)


class _Virtual:
    """Sentinel for a slot the fused mode did NOT materialize: its value
    is recomputable (stages are pure) from the nearest materialized
    ancestor, and nothing reads it directly — keeping it out of HBM is
    what makes the fused update as cheap as the benchmark step."""

    __slots__ = ()

    def __repr__(self):  # pragma: no cover - debugging aid
        return "<virtual slot>"


VIRTUAL = _Virtual()


class PubSpec(NamedTuple):
    """Geometry of the merged lean program's publish inputs, handed to
    the Explorer's pub provider: the FINAL slot's padded grid / valid
    region / downscale factor (masks and the selected-pixel index live
    on that grid), the raw-spectrum slot's scaling, the raw slot's grid,
    and the final frequency-bin count (pseudo-ROI spectra length)."""

    shape: tuple
    valid_wh: tuple
    scaling: int
    rawfd_scaling: int
    raw_shape: tuple
    n_freq: int


class RawFDView:
    """Publisher-facing view of the raw-spectrum slot (``fft_index+1`` —
    the reference's "raw spectrum" source, ``data_thread.rs:1365-1380``)
    when that slot is virtualized: only the arrays the publisher reads
    (amplitudes, phases, freq) are materialized by the fused program."""

    __slots__ = ("amplitudes", "phases", "freq", "scaling")

    def __init__(self, amplitudes, phases, freq, scaling: int):
        self.amplitudes = amplitudes
        self.phases = phases
        self.freq = freq
        self.scaling = scaling

    @property
    def width(self) -> int:
        return self.amplitudes.shape[0]

    @property
    def height(self) -> int:
        return self.amplitudes.shape[1]


class Pipeline:
    """Ordered stage chain with dirty-index incremental recompute.

    Two execution modes:

    * **fused** (default, interactive): the longest prefix of the dirty
      range whose stages implement the fusion protocol is compiled into
      ONE jit program that materializes only the slots actually consumed
      — the final cube and the raw-spectrum partial view; every
      intermediate slot becomes :data:`VIRTUAL` (recomputable on demand:
      a later update resolves its start to the nearest materialized
      ancestor). Remaining stages (custom non-fusable extensions) run
      per-stage after it. This matches the reference, where one
      ``main_thread`` pass IS the whole chain (``data_thread.rs:
      1090-1228``) — and removes the per-stage dispatch + HBM
      round-trips the round-2 review flagged (scripts/profile_fused.py).
    * **exact** (per-stage; Apply / Calculate-All, or
      ``THZ_FUSED_EXEC=0``): one dispatch per stage with blocking
      per-stage ms — the reference's per-filter compute-time display
      (``data_thread.rs:1107,1169-1184``).

    In fused mode per-stage ms cannot be split honestly (one XLA program
    has no observable internal stage boundaries), so the fused range's
    total device time is recorded under ``timings["chain"]`` and the
    per-stage entries keep their last exact-mode values.
    """

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
        self._timer = _AsyncStageTimer(self.timings)
        self.progress: dict[str, Optional[float]] = {
            uuid: None for uuid in self.filters
        }
        #: True while refresh_stage_timings runs: progress setters no-op
        #: (the shadow pass is timings-only, stage progress must not tick)
        self._shadow_pass = False
        self.psf = None  # models.psf.PSF, set via ApplyPSF / OpenPSF
        self.cancelled: Callable[[], bool] = lambda: False
        #: interactive updates run the fused chain program (env kill
        #: switch THZ_FUSED_EXEC=0 forces per-stage dispatch everywhere)
        self.fused_mode = os.environ.get("THZ_FUSED_EXEC", "1") != "0"
        #: leaf-level sparse materialization (round-4 task 1): when the
        #: fused range covers the whole chain, the program computes the
        #: publish reductions INSIDE the chain and the final slot's
        #: fft/amplitudes/phases cubes are never written to HBM (~330 MB
        #: of outputs nothing read in full). Kill switch
        #: THZ_LEAN_PUBLISH=0 restores full-cube materialization.
        self.lean_mode = os.environ.get("THZ_LEAN_PUBLISH", "1") != "0"
        #: callback supplying the publish inputs (ROI masks, pixel
        #: indices, optical selectors) for the merged lean program;
        #: set by the Explorer facade. Signature: provider(spec) ->
        #: (pub_inputs_dict, epoch). None disables lean mode (bench /
        #: library use without a publisher).
        self.pub_provider = None
        #: device-resident publish outputs of the last lean dispatch +
        #: the epoch of the pub inputs it used
        self._pub_out = None
        self._pub_epoch = None
        self._lean_plan = None  # (fn, stage_params, statics-epoch info)
        self._fused_cache: dict = {}
        #: one-pixel publish-view programs (round-5 task 6), keyed like
        #: ``_fused_cache``; entry None = chain not click-reproducible
        self._click_cache: dict = {}
        #: count of publish updates served by the one-pixel program
        #: instead of a full chain re-dispatch (tests / bench forensics)
        self.click_dispatches = 0
        #: (host, device) copies of the view-constant click operands —
        #: pre-staged so a pixel click transfers only the 3 tiny pixel
        #: indices (scripts/profile_click.py)
        self._click_const = None
        #: host-side copy of each slot's time axis, so parameter clamping
        #: and fused planning never pay a device->host read per update
        self._host_time: dict[int, np.ndarray] = {}
        #: host copy of slot 0's valid (width, height) when the loader
        #: bucket-padded the grid (None = full grid valid)
        self.valid_wh0: Optional[tuple[int, int]] = None
        #: partial raw-spectrum view when slot fft_index+1 is virtual
        self._raw_fd_partial: Optional[RawFDView] = None
        #: user-visible busy phase: "compiling" while a first-time program
        #: for this shape/config is being built (the slow part over a
        #: remote compile service), else None — the web UI shows it so a
        #: first open reads as compile progress, not a hang
        self.phase: Optional[str] = None
        self._dispatched: set = set()
        #: stages whose ``timings`` entry predates the last fused run (the
        #: fused program has no observable internal stage boundaries, so
        #: their per-stage ms could not be refreshed). The UI must not
        #: show these as current; an idle-time exact shadow pass
        #: (:meth:`refresh_stage_timings`) clears them — the reference
        #: shows a fresh ms per filter on every chain pass
        #: (``data_thread.rs:1107,1169-1184``).
        self.timings_stale: set = set()

    # ------------------------------------------------------------------
    def index_of(self, uuid: str) -> int:
        return self.chain.index(uuid)

    @property
    def input(self) -> Optional[ScanCube]:
        return self.slots[0]

    @property
    def output(self) -> Optional[ScanCube]:
        out = self.slots[-1]
        return None if out is VIRTUAL else out

    def _is_materialized(self, i: int) -> bool:
        s = self.slots[i]
        return s is not None and s is not VIRTUAL

    def _resolve_start(self, start: int) -> int:
        """Largest start' <= start whose input slot is materialized.
        Virtual slots are recomputable (stages are pure), so running the
        extra prefix with unchanged parameters reproduces them exactly —
        and in fused mode the prefix costs no extra HBM materialization."""
        a = start - 1
        while a > 0 and not self._is_materialized(a):
            a -= 1
        return a + 1

    def raw_fd_view(self):
        """The raw-spectrum source the publisher reads (slot
        ``fft_index+1``): the full cube when materialized (exact mode),
        else the fused run's partial view."""
        i = min(self.fft_index + 1, len(self.slots) - 1)
        s = self.slots[i]
        if s is not None and s is not VIRTUAL:
            return s
        return self._raw_fd_partial

    def set_input(
        self,
        cube: ScanCube,
        *,
        reset_filters: bool = True,
        valid_wh: Optional[tuple[int, int]] = None,
    ):
        """Load a new scan: fill slot 0, reset filters, run the chain
        (``data_thread.rs:717-720`` + ``reset_filters`` at ``:1027-1060``).
        ``valid_wh`` is the true scan size of a bucket-padded cube (read
        from the device leaf when not given — one tiny transfer per load)."""
        self.slots = [cube] + [None] * (len(self.chain) - 1)
        time = np.asarray(cube.time)
        self._host_time = {0: time}
        if valid_wh is None and cube.valid_wh is not None:
            v = np.asarray(cube.valid_wh)
            valid_wh = (int(v[0]), int(v[1]))
        self.valid_wh0 = valid_wh or (cube.width, cube.height)
        if reset_filters:
            shape = (cube.width, cube.height, cube.n_time)
            for f in self.filters.values():
                f.reset(time, shape)
        self.run_from(1)

    # ------------------------------------------------------------------
    def run_from(
        self, start_idx: int, *, force_all: bool = False,
        block_timings: Optional[bool] = None,
        fused: Optional[bool] = None,
    ):
        """Re-execute ``chain[start_idx:]``.

        ``force_all`` bypasses the deconvolution-suppression rule (used by
        the explicit "Calculate All" command / Apply button path).

        ``block_timings`` controls whether per-stage timings synchronize on
        each stage's output (one device round-trip per stage — expensive
        over remote-tunnelled devices; default for the explicit
        Calculate-All/Apply path) or resolve asynchronously via completion
        probes in a background thread (the interactive path: dispatch stays
        fully async, honest device-time ms appear in ``self.timings`` a
        round-trip later — the reference's per-filter ms display,
        ``data_thread.rs:1107,1169-1184``, refreshed by the GUI's poll
        anyway).

        ``fused`` overrides the mode selection: by default interactive
        runs (non-blocking timings) execute the fusable prefix of the
        dirty range as ONE compiled program; Apply/Calculate-All and
        ``THZ_FUSED_EXEC=0`` use per-stage dispatch.
        """
        if block_timings is None:
            block_timings = force_all
        # the REQUESTED start defines the suppression semantics: the
        # reference keys the deconvolution-rerun rule on the trigger's
        # own index (data_thread.rs:1139-1149 — an UpdateFilter from the
        # deconvolution itself always runs it), independent of how far
        # back the executed range actually reaches (fused runs always
        # execute from slot 0; VIRTUAL-slot resolution can move the
        # exact start earlier too)
        req_start = max(start_idx, 1)
        start = self._resolve_start(req_start)
        run_deconvolution = True
        if fused is None:
            fused = self.fused_mode and not block_timings
        if fused and self._is_materialized(0):
            # fused interactive runs always execute from slot 0: ONE
            # program per static config regardless of which slots happen
            # to be materialized (e.g. after an exact shadow pass), so
            # warmup covers every later slider drag and the compile cache
            # stays tiny. Purity makes the extra prefix free of surprises;
            # its device cost is a few hundred µs of the ~6 ms program.
            start = 1
        if fused:
            end, has_custom, forced_identity = self._fused_range_end(
                start, req_start
            )
            inp = self.slots[start - 1]
            usable = (
                end - start >= 2
                and inp is not None
                and inp.time.shape[0] > 0
            )
            if usable:
                self._run_fused(start, end, forced_identity)
                run_deconvolution = not has_custom
                start = end
                if start >= len(self.chain):
                    return
                # the fused run's chain probe is the tail's timing
                # baseline: a fresh host-time mark here would double-count
                # the fused program's still-executing device time into the
                # first tail stage's ms
                fresh_timer = False
            else:
                fresh_timer = True
        else:
            fresh_timer = True
        self._run_stages(
            start,
            force_all=force_all,
            block_timings=block_timings,
            run_deconvolution=run_deconvolution,
            fresh_timer=fresh_timer,
            req_start=req_start,
        )

    def _run_stages(
        self, start_idx: int, *, force_all: bool,
        block_timings: bool, run_deconvolution: bool = True,
        fresh_timer: bool = True, req_start: int = 0,
    ):
        """Per-stage dispatch of ``chain[start_idx:]`` (the exact/debug
        mode, and the tail after a fused prefix)."""
        # per-stage runs materialize full cubes; the merged lean plan and
        # its device publish outputs no longer match the slots
        self._lean_plan = None
        self._pub_out = None
        if self.record_timings and not block_timings and fresh_timer:
            self._timer.mark_run_start()
        for i in range(start_idx, len(self.chain)):
            name = self.chain[i]
            inp = self.slots[i - 1]
            if inp is None or inp is VIRTUAL or inp.time.shape[0] == 0:
                log.warning("input for stage %s is empty; skipping", name)
                continue
            t_start = _time.perf_counter()
            if name == "scaling":
                out = scale_cube(
                    inp, self.config.scale_factor,
                    valid_wh=self.valid_for(inp),
                )
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
                is_deconv = stage.is_deconvolution
                if not is_deconv and i >= req_start:
                    # any other custom filter in the REQUESTED range
                    # suppresses a deconvolution rerun
                    # (data_thread.rs:1144-1147); stages the executed
                    # range merely re-derives (VIRTUAL-slot resolution
                    # reaching earlier than the trigger) don't count
                    run_deconvolution = False
                if stage.active and not (
                    is_deconv and not (run_deconvolution or force_all)
                ):
                    stage.clamp_params(inp, time=self._host_time.get(i - 1))
                    ctx = StageContext(
                        progress=self._progress_setter(name),
                        cancelled=self.cancelled,
                        psf=self.psf,
                        valid_wh=self.valid_for(inp),
                    )
                    out = stage.apply(inp, ctx)
                else:
                    out = inp  # identity pass-through (cubes are immutable)
            if self.record_timings:
                # identity pass-throughs (inactive filter, suppressed
                # deconvolution) keep their last real ms in both modes —
                # a pass must not overwrite e.g. the deconvolution's
                # 50 ms with the ~20 us the skip took (filter.rs:607-621
                # never times a skip). A BLOCKING pass (Apply /
                # Calculate-All) still clears their stale marker: the
                # skip is that pass's up-to-date answer, and leaving
                # markers behind would schedule a pointless idle refresh
                # right after an Apply.
                if block_timings:
                    if out is not inp:
                        # the WHOLE output pytree: FD stages leave .data
                        # untouched (they replace fft/amplitudes), so a
                        # data-only barrier would return at enqueue time
                        # and credit their device work to the next stage
                        jax.block_until_ready(out)
                        self.timings[name] = _time.perf_counter() - t_start
                    self.timings_stale.discard(name)
                elif out is not inp:  # keep last ms + stale until probed
                    self.timings_stale.discard(name)
                    self._timer.record(name, out.data)
            if out.n_time != inp.n_time and name != "initial":
                out = self._replan(out)
                self._host_time[i] = np.asarray(out.time)
            else:
                prev_t = self._host_time.get(i - 1)
                if prev_t is not None:
                    self._host_time[i] = prev_t
            self.slots[i] = out

    # ---------------------------------------------------- fused mode
    def _fused_range_end(
        self, start: int, req_start: int = 0
    ) -> tuple[int, bool, frozenset]:
        """Longest fusable prefix of ``chain[start:]``: builtin stages,
        fusable stages, and inactive stages (identity) are fusable; the
        first *active non-fusable* stage (a custom extension) ends the
        range. An ACTIVE deconvolution whose suppression is guaranteed
        (another custom stage lies in the REQUESTED range ``req_start..``
        before it — the reference's rule, ``data_thread.rs:1139-1149``)
        is included as a forced identity instead of breaking the range —
        otherwise merely enabling the deconvolution toggle would degrade
        every interactive update to per-stage dispatch. When the trigger
        IS the deconvolution (``req_start`` at its index, the web Apply
        button's ``update_filter``), suppression does NOT hold: the range
        breaks there so the exact tail runs the deconvolution — fusable
        or not, a deconvolution never executes inside an interactive
        fused program. Also reports whether any custom non-deconvolution
        stage lies in the requested range (the suppression bookkeeping of
        the exact tail)."""
        end = start
        has_custom = False
        forced_identity = set()
        while end < len(self.chain):
            name = self.chain[end]
            if name not in ("scaling", "fft", "ifft"):
                stage = self.filters[name]
                if stage.is_deconvolution:
                    if stage.active:
                        if has_custom:
                            forced_identity.add(end)
                        else:
                            break  # the trigger: run it in the tail
                else:
                    if end >= req_start:
                        has_custom = True
                    if stage.active and not stage.fusable:
                        break
            end += 1
        return end, has_custom, frozenset(forced_identity)

    def _run_fused(self, start: int, end: int,
                   forced_identity: frozenset = frozenset()):
        """Execute ``chain[start:end]`` as ONE jit-compiled program.

        The program materializes ONLY what is consumed: the cube at
        ``end-1`` (the publisher's final slot / the per-stage tail's
        input) and — when slot ``fft_index+1`` lies in the range — that
        slot's amplitudes/phases/freq (all the publisher reads from the
        raw-spectrum source). Every other slot becomes :data:`VIRTUAL`:
        recomputable on demand, never written to HBM. This keeps the
        product update's HBM traffic at the benchmark step's level —
        materializing every intermediate slot measured ~2.3x slower
        (scripts/profile_fused.py)."""
        names = tuple(self.chain[start:end])
        inp = self.slots[start - 1]
        time_np = self._host_time.get(start - 1)
        if time_np is None:
            time_np = np.asarray(inp.time)
            self._host_time[start - 1] = time_np

        # host walk: clamp params, collect statics + traced params, and
        # mirror the time axis / downscale factor through the range
        cfg = self.config
        meta = _Meta(inp.width, inp.height, inp.dx, inp.dy,
                     self.valid_for(inp))
        host_times: list[np.ndarray] = []
        statics: list[tuple] = []
        actives: list[bool] = []
        stage_params: dict[str, object] = {}
        t_np = time_np
        rawfd_scaling = inp.scaling
        rawfd_idx = self.fft_index + 1
        # effective downscale factor: no-op when either the padded grid or
        # the TRUE scan size would collapse to zero (the reference no-ops
        # on true width // scale == 0, math_tools.rs:244-256) — a mixed
        # valid+pad boundary block must never be clamped INTO the valid
        # region as a zero-diluted mean
        s_cfg = cfg.scale_factor
        s_eff = (
            s_cfg
            if (
                s_cfg > 1
                and meta.width // s_cfg > 0
                and meta.height // s_cfg > 0
                and meta.valid_wh[0] // s_cfg > 0
                and meta.valid_wh[1] // s_cfg > 0
            )
            else 1
        )
        for k, name in enumerate(names):
            if name == "scaling":
                s = s_eff
                if s > 1:
                    meta = _Meta(
                        meta.width // s,
                        meta.height // s,
                        None if meta.dx is None else meta.dx * s,
                        None if meta.dy is None else meta.dy * s,
                        (
                            max(meta.valid_wh[0] // s, 1),
                            max(meta.valid_wh[1] // s, 1),
                        ),
                    )
                    if start + k <= rawfd_idx:
                        rawfd_scaling = s
                statics.append(())
                actives.append(True)
            elif name in ("fft", "ifft"):
                statics.append(())
                actives.append(True)
            else:
                stage = self.filters[name]
                active = bool(stage.active) and (start + k) not in forced_identity
                actives.append(active)
                if active:
                    stage.clamp_params(inp, time=t_np)
                    st = stage.fused_static(meta)
                    statics.append(st)
                    stage_params[name] = stage.traced_params()
                    t_np = stage.host_time_out(t_np, st)
                else:
                    statics.append(())
            host_times.append(t_np)

        # lean merged-publish mode: the range covers the whole chain and
        # recomputes the spectra, so the publish reductions fold into the
        # SAME program and the spectral cubes never hit HBM
        lean = (
            self.lean_mode
            and self.pub_provider is not None
            and end == len(self.chain)
            and start <= self.fft_index
            and self._is_materialized(0)
        )
        # phase-increments encoding: env read HERE (and part of the cache
        # key), so toggling THZ_LEAN_PHASES mid-process selects the other
        # compiled variant instead of silently reusing the cached one
        enc = lean and os.environ.get("THZ_LEAN_PHASES", "1") != "0"
        # one-pass spectral reductions (ops/pallas_specred): requires the
        # increments encoding AND every ACTIVE FD-domain stage in the
        # range to be a per-frequency multiply (fd_weight_vector) so the
        # masks factor out of the raw-spectrum sums; shape feasibility is
        # re-checked at trace time
        from thz_image_explorer_tpu.ops.pallas_specred import (
            is_runtime_broken as _specred_broken,
            specred_env as _specred_env,
        )

        weightable = self._fd_stages_weightable(names, actives)
        # FD-mask fold (see _build_fused): lean + weightable only; pure
        # XLA (no pallas dependency), so it survives a specred latch-off
        fold_ok = (
            lean
            and weightable
            and os.environ.get("THZ_FOLD_FD", "1") != "0"
        )
        # one-pass kernel dispatch is tri-state (specred_env docstring):
        # auto = OFF — the lean XLA program beats the kernel program in
        # both fold regimes (5.31/5.49 vs 6.45/6.65 ms at the bench
        # shape); THZ_SPECRED=1 forces it on for A/B and parity runs
        specred_ok = (
            enc
            and not cfg.avg_in_fourier_space
            and _specred_env() is True
            and not _specred_broken()
            and weightable
        )
        # WIDE spectrum layout (ops/fourier wide_spec): valid whenever no
        # stage between fft and ifft touches cube.fft — exactly the
        # fold_ok condition (active FD stages are factored out; inactive
        # ones are identity) — on the matmul-DFT path, never with the
        # specred kernel (it reads raw planes). Env read HERE and part of
        # the cache key (the THZ_LEAN_PHASES precedent).
        from thz_image_explorer_tpu.ops import mxufft as _mx

        wide_ok = (
            lean
            and fold_ok
            and not specred_ok
            and _mx.use_matmul_fft()
            and len(host_times[-1]) <= _mx.MAX_MATMUL_N
            and os.environ.get("THZ_WIDE_SPEC", "1") != "0"
        )
        key = (
            names,
            tuple(actives),
            tuple(statics),
            cfg.fft_window_type,
            int(s_eff),
            bool(cfg.avg_in_fourier_space),
            lean,
            enc,
            fold_ok,
            wide_ok,
            specred_ok,
        )
        fn = self._fused_cache.get(key)
        if fn is None:
            fn = self._build_fused(
                names,
                tuple(actives),
                tuple(statics),
                cfg.fft_window_type,
                int(s_eff),
                bool(cfg.avg_in_fourier_space),
                start,
                rawfd_idx,
                lean,
                enc,
                fold_ok,
                wide_ok,
                specred_ok,
            )
            self._fused_cache[key] = fn

        if lean:
            final_scaling = s_eff if start <= self.scaling_index else inp.scaling
            spec = PubSpec(
                shape=(meta.width, meta.height),
                valid_wh=meta.valid_wh,
                scaling=final_scaling,
                rawfd_scaling=rawfd_scaling,
                raw_shape=(self.slots[0].width, self.slots[0].height),
                n_freq=len(host_times[-1]) // 2 + 1,
            )
            if key not in self._click_cache:
                self._click_cache[key] = self._build_click(
                    names, tuple(actives), cfg.fft_window_type,
                    int(s_eff), start, rawfd_idx,
                )
            pub, epoch = self.pub_provider(spec)
            self._lean_plan = {
                "fn": fn,
                "click": self._click_cache[key],
                "inp": inp,
                "stage_params": stage_params,
                "window": (np.float32(cfg.fft_window[0]),
                           np.float32(cfg.fft_window[1])),
                "start": start,
                "end": end,
                "names": names,
                "host_times": host_times,
                "spec": spec,
                # specred fallback bookkeeping (_dispatch_lean): the
                # _build_fused args minus the trailing specred flag, and
                # the cache key, so a runtime kernel failure can rebuild
                # + re-cache the XLA-reductions variant in place
                "specred": specred_ok,
                "build_args": (
                    names, tuple(actives), tuple(statics),
                    cfg.fft_window_type, int(s_eff),
                    bool(cfg.avg_in_fourier_space), start, rawfd_idx,
                    lean, enc, fold_ok, wide_ok,
                ),
                "key": key,
            }
            self._dispatch_lean(pub, epoch, record=self.record_timings)
            return

        self._lean_plan = None
        self._pub_out = None
        final, rawfd = self._run_fused_program(
            fn, inp,
            lambda: fn(
                inp,
                np.float32(cfg.fft_window[0]),
                np.float32(cfg.fft_window[1]),
                stage_params,
            ),
            record=self.record_timings,
        )
        if rawfd is not None:
            self._raw_fd_partial = RawFDView(
                rawfd[0], rawfd[1], rawfd[2], rawfd_scaling
            )
        self._commit_fused_slots(
            final, names, start, end, host_times,
            record=self.record_timings,
        )

    def _run_fused_program(self, fn, inp, call, *, record: bool):
        """Shared dispatch prologue of both fused paths: the chain-timer
        run mark, first-dispatch compile-phase surfacing, and the
        dispatched-shape bookkeeping. Returns ``call()``'s outputs."""
        if record:
            self._timer.mark_run_start()
        shape_key = (id(fn), inp.data.shape, inp.time.shape)
        if shape_key not in self._dispatched:
            self.phase = "compiling"
        try:
            return call()
        finally:
            self._dispatched.add(shape_key)
            self.phase = None

    def _commit_fused_slots(self, final, names, start, end, host_times, *,
                            record: bool):
        """Shared dispatch epilogue: VIRTUAL-slot sparse materialization,
        per-slot host time axes, the one honest fused ``chain`` ms, and
        the stale marking that schedules the idle per-stage refresh."""
        for off in range(len(names) - 1):
            self.slots[start + off] = VIRTUAL
            self._host_time[start + off] = host_times[off]
        self.slots[end - 1] = final
        self._host_time[end - 1] = host_times[-1]
        if record:
            # one program = one honest device-time number; per-stage ms
            # keep their last exact-mode values (class docstring) and are
            # marked stale until the next idle refresh — every stage in
            # the fused range (including ones with no entry yet) needs
            # that refresh to show a current ms
            self._timer.record("chain", final.data)
            self.timings_stale.update(names)

    def _dispatch_lean(self, pub, epoch, *, record: bool):
        """Dispatch the merged chain+publish program with the given
        publish inputs, updating slots, the device publish outputs and
        the epoch bookkeeping."""
        plan = self._lean_plan
        inp = plan["inp"]
        start, end, names = plan["start"], plan["end"], plan["names"]
        host_times = plan["host_times"]
        wl, wh = plan["window"]

        def run():
            fn = plan["fn"]
            return self._run_fused_program(
                fn, inp,
                lambda: fn(
                    inp,
                    self.slots[0].data,
                    self.slots[0].time,
                    wl,
                    wh,
                    plan["stage_params"],
                    pub,
                ),
                record=record,
            )

        try:
            final, pub_out = run()
        except Exception as err:  # noqa: BLE001 — rebuild-or-reraise
            from thz_image_explorer_tpu.ops import pallas_specred as _psr

            # a specred-bearing program whose failure carries Mosaic/
            # pallas markers (latchable_specred_error, advisor r4) is a
            # remote toolchain rejection (the kernel is validated in
            # interpret mode only until it meets the real toolchain):
            # latch the kernel off, rebuild the same range with the XLA
            # reductions and retry ONCE; anything else re-raises so real
            # defects surface instead of silently degrading
            if (
                not plan.get("specred")
                or _psr.is_runtime_broken()
                or not _psr.latchable_specred_error(err)
            ):
                raise
            _psr.mark_runtime_broken(err)
            fn = self._build_fused(*plan["build_args"], False)
            self._fused_cache[plan["key"][:-1] + (False,)] = fn
            plan["fn"] = fn
            plan["specred"] = False
            final, pub_out = run()
        self._raw_fd_partial = None  # publish outputs carry the slices
        self._pub_out = pub_out
        self._pub_epoch = epoch
        self._commit_fused_slots(
            final, names, start, end, host_times, record=record
        )

    def lean_publish(self):
        """Host copy of the publish outputs for the current publish
        inputs. Reuses the last dispatch's device outputs when the pub
        epoch is unchanged (the chain-command path: run_from already
        computed them). A changed VIEW epoch (pixel click, optical
        selection, thickness) runs the gather-sized one-pixel program
        over the already-materialized device state — the reference's
        ``UpdateType::Plot`` contract, zero chain recompute
        (``data_thread.rs:853-903``). A changed CUBE epoch (ROI
        geometry: the masked reductions need the spectral temporaries)
        or a chain without a click program re-dispatches the cached
        merged program with fresh inputs — one device pass, hidden
        under the transfer round-trip. Returns None when no lean plan
        exists (exact/non-lean mode)."""
        if self._lean_plan is None or self.pub_provider is None:
            return None
        pub, epoch = self.pub_provider(self._lean_plan["spec"])
        if self._pub_out is None:
            self._dispatch_lean(pub, epoch, record=False)
        elif epoch != self._pub_epoch:
            if not self._click_dispatch(pub, epoch):
                self._dispatch_lean(pub, epoch, record=False)
        return jax.device_get(self._pub_out)

    def _click_dispatch(self, pub, epoch) -> bool:
        """Serve a view-only publish change with the one-pixel program
        (round-5 task 6). Applies when the plan has a click program, the
        provider's epoch is the ``(cube_key, view_key)`` split and only
        the view part changed, and the previous publish outputs are
        live. Returns False to fall back to the full lean re-dispatch."""
        plan = self._lean_plan
        click = plan.get("click")
        old = self._pub_epoch
        if (
            click is None
            or not (isinstance(epoch, tuple) and len(epoch) == 2)
            or not (isinstance(old, tuple) and len(old) == 2)
            or epoch[0] != old[0]
        ):
            return False
        out = self._pub_out
        if out is None or "roi_amp" not in out:
            return False
        final = self.slots[plan["end"] - 1]
        if final is None or final is VIRTUAL:
            return False
        inp = plan["inp"]
        wl, wh = plan["window"]
        # pre-stage the view-constant small operands: a click changes
        # only rxy/fxy/gxy, but handing the other 7 host leaves to the
        # jit call re-transfers them every dispatch — ~6 ms/click on the
        # tunnelled runtime (scripts/profile_click.py, 2026-08-19:
        # fresh-numpy 8.7 ms vs pre-put 2.6 ms per dispatch). Keyed by
        # VALUE (shapes included), so selection/thickness/dataset
        # changes — and an F-length change from a new cube — re-put.
        const_keys = ("ref_mode", "samp_mode", "ref_idx", "samp_idx",
                      "ref_pseudo", "samp_pseudo", "thickness")
        cached = self._click_const
        if cached is not None and all(
            np.array_equal(cached[0][k], pub[k]) for k in const_keys
        ):
            dev_const = cached[1]
        else:
            host_const = {k: pub[k] for k in const_keys}
            dev_const = jax.device_put(host_const)
            self._click_const = (host_const, dev_const)
        small = {
            **dev_const,
            "rxy": pub["rxy"], "fxy": pub["fxy"], "gxy": pub["gxy"],
        }
        # first-dispatch compile surfacing, same contract as
        # _run_fused_program: the click program's first call traces +
        # compiles (seconds to minutes through a degraded remote compile
        # service) on the worker thread — state polls must see the
        # 'compiling' phase, not an apparently hung app
        shape_key = (id(click), inp.data.shape, final.data.shape)
        if shape_key not in self._dispatched:
            self.phase = "compiling"
        try:
            upd = click(
                self.slots[0].data, inp.data, inp.time, inp.valid_wh,
                final.data, final.freq, wl, wh, plan["stage_params"],
                small, out["roi_amp"], out["roi_ph"],
            )
        finally:
            self._dispatched.add(shape_key)
            self.phase = None
        self._pub_out = {**out, **upd}
        self._pub_epoch = epoch
        self.click_dispatches += 1
        return True

    def _build_click(self, names, actives, window_type, scale, start,
                     rawfd_idx):
        """One-pixel publish-view program for lean mode (round-5 task
        6): recomputes exactly the pixel- and optical-dependent publish
        outputs from the materialized raw/final slots plus the same
        traced ``stage_params`` the chain program reads — a windowed
        (1, 1, T) DFT matvec, the factored per-frequency FD weights, and
        two gathers. Pixel-independent outputs (ROI reductions, means,
        image) stay cached on device; the reference recomputes NOTHING
        on ``SetSelectedPixel`` (``data_thread.rs:853-903``), this is
        the gather-sized TPU equivalent (~µs of device work vs the
        ~5.8 ms merged chain).

        Returns None when the active chain cannot be reproduced at a
        single pixel: a non-weightable pre-FFT stage (tilt shifts pixels
        individually through ``fused_apply``) or a non-weightable FD
        stage (deconvolution couples neighboring pixels)."""
        if not self._fd_stages_weightable(names, actives):
            return None
        filters = self.filters
        i0, i1 = names.index("fft"), names.index("ifft")
        pre = []
        for k in range(i0):
            if not actives[k] or names[k] == "scaling":
                continue
            if hasattr(filters.get(names[k]), "td_weight_vector"):
                pre.append(names[k])
            else:
                return None
        pre_names = tuple(pre)
        # (name, active, accumulate-into-rawfd?) per FD stage — mirrors
        # the chain loop's ``start + k == rawfd_idx`` capture point: the
        # raw-spectrum display slot carries the weights of active FD
        # stages up to and including rawfd_idx (executor chain loop)
        fd_steps = tuple(
            (names[k], actives[k], start + k <= rawfd_idx)
            for k in range(i0 + 1, i1)
        )
        scale_here = scale if "scaling" in names[:i0] else 1

        import jax.numpy as jnp

        from thz_image_explorer_tpu.ops.fourier import _rfft, unwrap
        from thz_image_explorer_tpu.ops.optical import (
            calculate_optical_properties,
        )
        from thz_image_explorer_tpu.ops.windows import window_array

        def fn(raw_data, inp_data, inp_time, inp_valid, final_data, freq,
               window_low, window_high, stage_params, pub,
               roi_amp, roi_ph):
            rxy, fxy, gxy = pub["rxy"], pub["fxy"], pub["gxy"]
            if scale_here > 1:
                s = scale_here
                t = inp_data.shape[-1]
                block = jax.lax.dynamic_slice(
                    inp_data, (fxy[0] * s, fxy[1] * s, 0), (s, s, t)
                )
                # same block sum + zeroed mixed boundary blocks as
                # ops/scaling._scale_impl (padded pixels stay exact 0)
                trace = block.sum(axis=(0, 1)) / jnp.asarray(
                    s * s, block.dtype
                )
                valid = jnp.maximum(inp_valid // s, 1)
                inside = (fxy[0] < valid[0]) & (fxy[1] < valid[1])
                trace = jnp.where(inside, trace, 0.0)
            else:
                trace = inp_data[fxy[0], fxy[1]]
            w = window_array(inp_time, window_type, window_low,
                             window_high)
            for name in pre_names:
                w = w * filters[name].td_weight_vector(
                    inp_time, stage_params[name]
                ).astype(w.dtype)
            spec = _rfft(trace[None, None, :], time_weight=w)[0, 0]
            amp = jnp.abs(spec).astype(jnp.float32)
            ph = unwrap(jnp.angle(spec).astype(jnp.float32))
            wvec = jnp.ones_like(amp)
            wvec_rawfd = jnp.ones_like(amp)
            for name, active, at_rawfd in fd_steps:
                if active:
                    wvec = wvec * filters[name].fd_weight_vector(
                        freq, stage_params[name]
                    ).astype(jnp.float32)
                if at_rawfd:
                    wvec_rawfd = wvec
            pix_amp = wvec * amp
            pix_ph = ph  # FD stages never touch phases (band_pass_fd.rs)
            out = dict(
                signal=raw_data[rxy[0], rxy[1]],
                signal_fft=wvec_rawfd * amp,
                phase_fft=ph,
                filtered_signal=final_data[gxy[0], gxy[1]],
                filtered_signal_fft=pix_amp,
                filtered_phase_fft=pix_ph,
            )
            # optical properties with traced selection over the CACHED
            # (already-finished) ROI means — third body of the publish
            # INVARIANT (publish._publish_program docstring): edit
            # together with _publish_program / compute_publish_traced;
            # tests/test_click_publish.py pins click == full
            ref_mode, samp_mode = pub["ref_mode"], pub["samp_mode"]
            ref_a = jnp.where(ref_mode == 1, roi_amp[pub["ref_idx"]],
                              pub["ref_pseudo"][0])
            ref_p = jnp.where(ref_mode == 1, roi_ph[pub["ref_idx"]],
                              pub["ref_pseudo"][1])
            samp_a = jnp.where(
                samp_mode == 1, roi_amp[pub["samp_idx"]],
                jnp.where(samp_mode == 2, pub["samp_pseudo"][0], pix_amp),
            )
            samp_p = jnp.where(
                samp_mode == 1, roi_ph[pub["samp_idx"]],
                jnp.where(samp_mode == 2, pub["samp_pseudo"][1], pix_ph),
            )
            n, alpha, kappa = calculate_optical_properties(
                samp_a, samp_p, ref_a, ref_p, freq, pub["thickness"]
            )
            out.update(
                refractive_index=n,
                absorption_coefficient=alpha,
                extinction_coefficient=kappa,
            )
            return out

        return jax.jit(fn)

    def _fd_stages_weightable(self, names, actives) -> bool:
        """True when every ACTIVE stage between the range's fft and ifft
        is a pure per-frequency multiply (exposes ``fd_weight_vector``) —
        the factorization the one-pass spectral reduction relies on. A
        custom fused FD extension without the accessor disables it."""
        if "fft" not in names or "ifft" not in names:
            return False
        i0, i1 = names.index("fft"), names.index("ifft")
        for k in range(i0 + 1, i1):
            if actives[k] and not hasattr(
                self.filters.get(names[k]), "fd_weight_vector"
            ):
                return False
        return True

    def _build_fused(self, names, actives, statics, window_type, scale,
                     avg_flag, start, rawfd_idx, lean=False, enc=False,
                     fold_ok=False, wide_ok=False, specred_ok=False):
        """Build + jit the fused chain program for one static
        configuration. ``fused_apply`` bodies must read parameters only
        from the traced ``stage_params`` dict (stage.py protocol).

        Non-lean: returns ``(final_cube, rawfd)`` where ``rawfd`` is the
        (amplitudes, phases, freq) of slot ``rawfd_idx`` when it lies in
        the range, else None.

        Lean (round-4 task 1): additionally takes the raw slot's
        data/time and the traced publish inputs, computes the publish
        reductions IN-PROGRAM, and returns ``(lean_final, publish_dict)``
        where the final cube's fft/amplitudes/phases leaves are dropped
        (None) — they become XLA temporaries feeding the reductions, not
        ~330 MB of HBM outputs. The raw-spectrum display values are the
        sliced/reduced publish outputs, so the full rawfd cubes are not
        materialized either.

        ``fold_ok`` (lean ranges whose active FD stages are all
        per-frequency multiplies, ``_fd_stages_weightable``): skip the FD
        stages' cube-sized ``fused_apply`` mask passes entirely —
        accumulate their factored weight product and hand it to
        ``inverse_fft(fd_weights=...)``, which folds it into the irfft's
        inverse DFT matrix and weights the pixel-means after reduction.
        The masked complex spectrum (~164 MB at the bench shape) is never
        written to or re-read from HBM. ``THZ_FOLD_FD=0`` disables.

        ``wide_ok`` (lean + fold_ok + matmul-DFT, never with specred):
        the spectrum travels in the WIDE ``(X, Y, 2m)`` ``[real | imag]``
        matmul layout from the forward DFT to the inverse DFT — valid
        because fold_ok guarantees no stage in between reads ``cube.fft``
        (active FD stages are factored into ``wvec``, inactive ones are
        identity). The complex cube is never assembled; measured
        ~0.27 GB / ~0.4 ms saved at the bench shape (``THZ_WIDE_SPEC=0``
        disables)."""
        filters = self.filters
        # ``enc``: lean programs carry the phase-increments encoding
        # (cumsum moved past the publish reductions —
        # ops/fourier.phase_increments); resolved by the CALLER from
        # THZ_LEAN_PHASES and part of the fused-cache key

        # static fold analysis: active FD stages between fft and ifft,
        # plus the contiguous runs of per-time-multiply TD stages
        # (td_weight_vector) directly before the fft / after the ifft —
        # an active NON-weightable stage in between blocks folding past
        # it (multiplies commute with each other, not with arbitrary
        # stages); inactive stages are identity and never block
        fd_any = False
        fold_td = frozenset()
        if "fft" in names and "ifft" in names:
            i0, i1 = names.index("fft"), names.index("ifft")
            fd_any = any(actives[k] for k in range(i0 + 1, i1))
            if fold_ok:
                td = set()
                for k in range(i0 - 1, -1, -1):  # suffix before fft
                    if names[k] in ("scaling", "fft", "ifft"):
                        break
                    if not actives[k]:
                        continue
                    if hasattr(filters.get(names[k]), "td_weight_vector"):
                        td.add(k)
                    else:
                        break
                for k in range(i1 + 1, len(names)):  # prefix after ifft
                    if not actives[k]:
                        continue
                    if hasattr(filters.get(names[k]), "td_weight_vector"):
                        td.add(k)
                    else:
                        break
                fold_td = frozenset(td)
        fold = fold_ok and fd_any
        ifft_idx = names.index("ifft") if "ifft" in names else -1

        def chain(cube: ScanCube, window_low, window_high, stage_params):
            rawfd = None
            raw_spec = None
            wvec = None
            pre_w = None
            in_fd = False
            for k, (name, active, static) in enumerate(
                zip(names, actives, statics)
            ):
                prev = cube
                if name == "scaling":
                    cube = scale_cube(cube, scale)
                elif name == "fft":
                    cube = forward_fft(cube, window_type, window_low,
                                       window_high, lean_phases=enc,
                                       pre_weight=pre_w,
                                       wide_spec=wide_ok)
                    if specred_ok or fold:
                        raw_spec = cube.fft  # post-window, pre-FD masks
                        import jax.numpy as jnp

                        # n_freq from the freq axis: under wide_ok the
                        # fft leaf's last dim is 2m, not m
                        wvec = jnp.ones(
                            (cube.freq.shape[0],), jnp.float32
                        )
                    in_fd = True
                elif name == "ifft":
                    # folded TD-after weights: computed here (their input
                    # time axis equals the ifft output's) and scaled into
                    # the inverse DFT matrix columns
                    post_w = None
                    for j in sorted(fold_td):
                        if j <= k:
                            continue
                        wj = filters[names[j]].td_weight_vector(
                            cube.time, stage_params[names[j]]
                        )
                        post_w = wj if post_w is None else post_w * wj
                    cube = inverse_fft(cube, avg_flag, phases_encoded=enc,
                                       fd_weights=wvec if fold else None,
                                       td_weights=post_w,
                                       wide_spec=wide_ok)
                    in_fd = False
                elif active:
                    if k in fold_td:
                        if k < ifft_idx:
                            # TD-before mask -> forward DFT matrix rows
                            wk = filters[name].td_weight_vector(
                                cube.time, stage_params[name]
                            )
                            pre_w = wk if pre_w is None else pre_w * wk
                        # TD-after stages were folded at the ifft above
                    else:
                        if (specred_ok or fold) and in_fd:
                            # FD stages are per-frequency multiplies here
                            # (_fd_stages_weightable gated the build):
                            # accumulate the factorized weight vector
                            wvec = wvec * filters[name].fd_weight_vector(
                                cube.freq, stage_params[name]
                            )
                        if not (fold and in_fd):
                            cube = filters[name].fused_apply(
                                cube, stage_params[name], static
                            )
                if cube is not prev and cube.n_time != prev.n_time:
                    cube = self._replan(cube)
                if start + k == rawfd_idx:
                    if fold and in_fd and wvec is not None:
                        # the raw-spectrum display slot is the output of
                        # the stage at fft_index+1; with its mask pass
                        # folded away, reconstruct that slot's amplitudes
                        # lazily (phases are untouched by FD stages)
                        rawfd = (wvec * cube.amplitudes, cube.phases,
                                 cube.freq)
                    else:
                        rawfd = (cube.amplitudes, cube.phases, cube.freq)
            return cube, rawfd, raw_spec, wvec

        if not lean:
            def exact_chain(cube, window_low, window_high, stage_params):
                final, rawfd, _, _ = chain(
                    cube, window_low, window_high, stage_params
                )
                return final, rawfd

            return jax.jit(exact_chain)

        from thz_image_explorer_tpu.pipeline.publish import (
            compute_publish_traced,
        )

        def fn(cube, raw_data, raw_time, window_low, window_high,
               stage_params, pub):
            final, rawfd, raw_spec, wvec = chain(
                cube, window_low, window_high, stage_params
            )
            specred = None
            if specred_ok and raw_spec is not None:
                from thz_image_explorer_tpu.ops.pallas_specred import (
                    specred_supported,
                )

                x, y, nf = raw_spec.shape
                r = pub["masks"].shape[0]
                # shape feasibility at trace time (concrete shapes): a
                # grid with no usable row-block falls back in-place
                if specred_supported(x * y, nf, r + 1, sharded=False):
                    specred = (raw_spec, wvec)
            out = compute_publish_traced(
                raw_data,
                raw_time,
                rawfd[0],
                rawfd[1],
                rawfd[2],
                final,
                pub["masks"],
                pub["rxy"],
                pub["fxy"],
                pub["gxy"],
                pub,
                avg_fourier=avg_flag,
                phases_encoded=enc,
                specred=specred,
            )
            lean_final = final.replace(
                fft=None, amplitudes=None, phases=None
            )
            if specred is not None:
                # the kernel supplies the published means; nulling the
                # cube's avg leaves lets XLA drop their full-spectrum
                # reductions from the program entirely
                lean_final = lean_final.replace(
                    avg_fft=None, avg_signal_fft=None, avg_phase_fft=None
                )
            return lean_final, out

        return jax.jit(fn)

    def _progress_setter(self, uuid: str):
        def setter(value):
            if self._shadow_pass:
                # timings-only refresh: the UI must not see filters
                # spuriously ticking 0->100% while the app sits idle
                return
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
    def valid_for(self, cube: ScanCube) -> Optional[tuple[int, int]]:
        """Host-known valid (width, height) of a pipeline cube: slot 0's
        valid region divided by the cube's downscale factor (only the
        scaling stage changes the grid)."""
        if self.valid_wh0 is None:
            return None
        s = cube.scaling
        return (max(self.valid_wh0[0] // s, 1), max(self.valid_wh0[1] // s, 1))

    # ------------------------------------------------------------------
    def materialize_output(self) -> Optional[ScanCube]:
        """Full final cube for inspection or export. The lean interactive
        program drops the final slot's fft/amplitudes/phases (nothing
        outside the publish reductions reads them); consumers that DO
        need the full spectra — tests, batch export, extensions — call
        this to recompute the slots exactly (stages are pure, so the
        values are identical; deconvolution is not rerun, matching the
        lean run's suppression)."""
        out = self.output
        if out is not None and out.amplitudes is None:
            rec = self.record_timings
            self.record_timings = False  # inspection pass: no ms updates
            try:
                self._run_stages(
                    1, force_all=False, block_timings=False,
                    run_deconvolution=False,
                )
            finally:
                self.record_timings = rec
            out = self.output
        return out

    # ------------------------------------------------------------------
    def refresh_stage_timings(self) -> bool:
        """Idle-time shadow pass: one exact-mode chain run purely to
        refresh the per-stage ms the fused program cannot split
        (round-4 task 7 — the filter panel must never show a stale ms as
        current; the reference re-times every filter on every pass,
        ``filters/filter.rs:607-621``). Stages are pure, so the pass
        recomputes identical slots; deconvolution is never rerun (its ms
        refreshes on Apply). Returns True when a pass ran."""
        if not self.timings_stale or not self.record_timings:
            return False
        if self.input is None:
            self.timings_stale.clear()
            return False
        key = ("shadow", self.input.data.shape, self.input.time.shape)
        if key not in self._dispatched:
            self.phase = "compiling"
        # the pass is for TIMINGS ONLY: snapshot and restore every piece
        # of pipeline state `_run_stages` touches, so a refresh can never
        # alter what the app publishes — in particular it must not replace
        # a deconvolved final slot with a run_deconvolution=False rebuild
        # (an Apply's result would silently revert ~100 ms later).
        saved_slots = list(self.slots)
        saved_host_time = dict(self._host_time)
        saved_lean = self._lean_plan
        saved_pub = self._pub_out
        self._shadow_pass = True
        try:
            # async per-stage probes + one drain: the whole pass costs
            # ~(chain device time + one tunnel RTT), where a blocking
            # per-stage barrier would pay one ~30 ms RTT PER STAGE on the
            # tunnelled TPU (~8x the latency for the same numbers)
            self._run_stages(
                1, force_all=False, block_timings=False,
                run_deconvolution=False, fresh_timer=True,
            )
            self._timer.drain()
        finally:
            self._shadow_pass = False
            self.slots[:] = saved_slots
            self._host_time = saved_host_time
            self._lean_plan = saved_lean
            self._pub_out = saved_pub
            self._dispatched.add(key)
            self.phase = None
        self.timings_stale.clear()
        return True

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
        original grid when downscaled (``data_thread.rs:1242-1308``) and
        cropped to the valid region of a bucket-padded grid."""
        out = self.output
        if out is None:
            return None
        if out.scaling > 1:
            img = np.asarray(upscaled_intensity_image(out.data, out.scaling))
        else:
            img = np.asarray(intensity_image(out.data))
        if self.valid_wh0 is not None:
            img = img[: self.valid_wh0[0], : self.valid_wh0[1]]
        return img
