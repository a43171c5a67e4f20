"""Filter-stage protocol, domain ordering and registry.

TPU-native rethink of the reference's filter framework
(``/root/reference/src/filters/filter.rs`` + the ``filter_macros`` proc-macro
crate): a stage is a *pure function* ``cube -> cube`` parameterized by a
params object, wrapped in a thin class carrying identity/metadata. The
``#[register_filter]`` + ``#[ctor]`` auto-registration becomes a Python
decorator populating a module-level registry; the ``CopyStaticFields``
preview-cache machinery disappears because stages are pure and the host
keeps whatever previews it wants.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Optional

import numpy as np

from thz_image_explorer_tpu.data import ScanCube


class FilterDomain(enum.IntEnum):
    """Chain ordering domains (``filters/filter.rs:231-243``). The enum
    order *is* the chain order."""

    TIME_BEFORE_FFT_PRIO_FIRST = 0
    TIME_BEFORE_FFT = 1
    FREQUENCY = 2
    TIME_AFTER_FFT = 3
    TIME_AFTER_FFT_PRIO_LAST = 4


@dataclasses.dataclass(frozen=True)
class FilterConfig:
    """Display metadata (``filters/filter.rs:84-93``)."""

    name: str
    description: str
    domain: FilterDomain
    hyperlink: Optional[tuple[Optional[str], str]] = None


class FilterStage:
    """Base class for pipeline filter stages.

    Subclasses define:

    * ``config()`` — name/description/domain metadata;
    * ``apply(cube, context) -> cube`` — the host-level stage call. It must
      be *pure* with respect to the cube (internally it dispatches one or
      more jitted device programs); long-running stages honor
      ``context.progress`` / ``context.cancel``;
    * parameter attributes (plain Python values; traced-scalar params avoid
      recompiles, shape-affecting params recompile like the reference's
      FFT re-planning).

    ``active`` mirrors the reference's per-filter on/off toggles
    (``filters_active_lock``); an inactive stage is identity
    (``data_thread.rs:1185-1188``).
    """

    #: stable identifier used in the chain / command API (the reference
    #: uses random uuids; a stable slug survives restarts and settings)
    uuid: str = ""
    #: inactive stages pass their input through
    active: bool = True
    #: True when the stage implements the fusion protocol below — such
    #: stages are compiled into ONE chain program with the fft/ifft by the
    #: executor's fused interactive mode (matching the reference, where the
    #: whole chain is likewise one pass of ``main_thread``,
    #: ``data_thread.rs:1090-1228``)
    fusable: bool = False
    #: marker for the deconvolution stage's special semantics (Apply-only
    #: trigger + rerun suppression, ``data_thread.rs:1139-1150``). A class
    #: attribute, NOT a display-name match: the reference keys the
    #: suppression on the concrete filter, so a user extension named
    #: "Deconvolution Sharpen" must behave as a normal filter.
    is_deconvolution: bool = False

    def config(self) -> FilterConfig:
        raise NotImplementedError

    # -- fusion protocol (fusable stages only) -----------------------
    def traced_params(self):
        """Pytree of traced parameter leaves for :meth:`fused_apply`.
        Changing these never recompiles the fused program."""
        return ()

    def fused_static(self, cube: ScanCube):
        """Hashable statics baked into the fused program (part of its
        compile-cache key), derived from parameters and/or the input
        cube's geometry — e.g. the tilt extension step count."""
        return ()

    def fused_apply(self, cube: ScanCube, params, static) -> ScanCube:
        """Pure traced stage body: must depend only on ``cube``,
        ``params`` (the leaves from :meth:`traced_params`) and ``static``
        (from :meth:`fused_static`) — never on mutable ``self`` state."""
        raise NotImplementedError

    def host_time_out(self, time_np: np.ndarray, static) -> np.ndarray:
        """Host-side mirror of the stage's effect on the time axis (only
        tilt changes it). Lets the executor track per-slot time axes
        without a device->host read per update."""
        return time_np

    def reset(self, time: np.ndarray, shape: tuple[int, ...]) -> None:
        """Called when a new scan is loaded (``data_thread.rs:1027-1060``)."""

    def show_data(self, cube: ScanCube, pixel: tuple[int, int]) -> None:
        """Update host-side preview caches for the UI (the reference's
        ``#[static_field]`` copy-back dance, ``data_thread.rs:1322-1334``)."""

    def clamp_params(self, cube: ScanCube, time: Optional[np.ndarray] = None) -> None:
        """The one sanctioned parameter mutation point: called by the
        executor with the stage's *input* cube immediately before
        ``apply``, so range-dependent params can clamp persistently (the
        reference clamps inside ``filter`` via ``&mut self``, e.g.
        ``band_pass_td_before_fft.rs:134-138`` — here it lives outside
        ``apply`` to keep apply pure and chain re-runs deterministic).
        ``time`` is the executor's host-cached copy of ``cube.time`` —
        use it instead of ``np.asarray(cube.time)``, which would pay a
        device->host round-trip per interactive update."""

    def apply(self, cube: ScanCube, context: "StageContext") -> ScanCube:
        raise NotImplementedError

    # -- convenience -------------------------------------------------
    @property
    def name(self) -> str:
        return self.config().name

    @property
    def domain(self) -> FilterDomain:
        return self.config().domain


@dataclasses.dataclass
class StageContext:
    """Per-run services handed to stages: progress reporting, cooperative
    cancellation, and shared settings (the PSF for deconvolution — the
    reference routes it through ``gui_settings.psf``). ``valid_wh`` is the
    host-known valid (width, height) of the stage's input when the grid is
    bucket-padded (None = the full grid is valid)."""

    progress: Callable[[float], None] = lambda _f: None
    cancelled: Callable[[], bool] = lambda: False
    psf: Optional[object] = None
    valid_wh: Optional[tuple[int, int]] = None

    def check_cancel(self) -> bool:
        return self.cancelled()


# ----------------------------------------------------------------------
# Registry (filters/filter.rs:306-455; filter_macros/src/lib.rs:45-69)
# ----------------------------------------------------------------------

_REGISTRY: dict[str, type] = {}


def register_filter(cls):
    """Class decorator: auto-register a stage type under its slug uuid.

    Only a uuid declared ON the class itself counts — a subclass of a
    registered stage must NOT inherit its parent's registry key, or
    ``@register_filter class DeconvolutionSharpen(Deconvolution)`` would
    silently replace the builtin (``filter_macros/src/lib.rs:45-69``
    registers each concrete type exactly once)."""
    uuid = cls.__dict__.get("uuid") or _slug(cls.__name__)
    existing = _REGISTRY.get(uuid)
    if existing is not None and existing is not cls:
        raise ValueError(
            f"filter uuid {uuid!r} already registered by "
            f"{existing.__name__}; declare a distinct `uuid` on "
            f"{cls.__name__}"
        )
    cls.uuid = uuid
    _REGISTRY[uuid] = cls
    return cls


def _slug(name: str) -> str:
    """CamelCase -> snake_case, keeping acronym runs together
    (``TimeBandPassBeforeFFT`` -> ``time_band_pass_before_fft``)."""
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0 and (
            not name[i - 1].isupper()
            or (i + 1 < len(name) and name[i + 1].islower())
        ):
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


def registered_filters() -> dict[str, type]:
    return dict(_REGISTRY)


def instantiate_filters() -> dict[str, FilterStage]:
    """Fresh instances of every registered stage, uuid-keyed."""
    return {uuid: cls() for uuid, cls in _REGISTRY.items()}


def build_chain(filters: dict[str, FilterStage]) -> tuple[list[str], int, int, int]:
    """Build the ordered stage chain and the scaling/fft/ifft indices.

    Mirrors ``main.rs:178-268``:
    ``[initial, scaling, <PrioFirst...>, <TimeBeforeFFT...>, fft,
    <Frequency...>, ifft, <TimeAfterFFT...>, <PrioLast...>]``.
    """
    by_domain: dict[FilterDomain, list[str]] = {d: [] for d in FilterDomain}
    for uuid, f in filters.items():
        by_domain[f.domain].append(uuid)
    for d in by_domain:
        by_domain[d].sort()

    chain = ["initial", "scaling"]
    chain += by_domain[FilterDomain.TIME_BEFORE_FFT_PRIO_FIRST]
    chain += by_domain[FilterDomain.TIME_BEFORE_FFT]
    fft_index = len(chain)
    chain.append("fft")
    chain += by_domain[FilterDomain.FREQUENCY]
    ifft_index = len(chain)
    chain.append("ifft")
    chain += by_domain[FilterDomain.TIME_AFTER_FFT]
    chain += by_domain[FilterDomain.TIME_AFTER_FFT_PRIO_LAST]
    return chain, 1, fft_index, ifft_index
