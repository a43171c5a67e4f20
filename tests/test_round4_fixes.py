"""Round-4 robustness regressions.

Covers the round-3 review findings:

* the deconvolution plan cache keys on PSF *content*, not ``id(psf)``
  (a new PSF at a freed object's address must never reuse stale band
  geometry);
* deconvolution special semantics attach to the ``is_deconvolution``
  marker, not the display name — a user extension named "Deconvolution
  Sharpen" behaves as a normal filter (the reference keys suppression on
  the concrete filter, ``data_thread.rs:1139-1150``);
* tilt compensation derives its geometry (center, time extension) from
  the TRUE scan size, so output does not depend on ``THZ_SHAPE_BUCKET``
  (``tilt_compensation.rs:104-143`` uses the real scan dims);
* ``scale_cube`` no-ops when the VALID region is smaller than the scale
  factor, even when the padded grid is not (``math_tools.rs:244-256``
  checks the true width).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from thz_image_explorer_tpu.data import make_cube
from thz_image_explorer_tpu.ops import deconvolution as dec
from thz_image_explorer_tpu.ops.scaling import scale_cube
from thz_image_explorer_tpu.ops.tilt import extension_steps, tilt_compensate
from thz_image_explorer_tpu.pipeline import Explorer
from thz_image_explorer_tpu.pipeline.filters import Deconvolution
from thz_image_explorer_tpu.pipeline.stage import StageContext

from make_sample import synthetic_scan, write_scan_thz

REF_PSF = "/root/reference/sample_data/psf.npz"


# ---------------------------------------------------------------- plan key
def _deconv_cube(w=16, h=16, n=64):
    t, cube = synthetic_scan(width=w, height=h, n_time=n)
    return make_cube(t, cube, dx=0.5, dy=0.5)


def test_plan_key_is_content_not_identity(monkeypatch):
    """Equal-content PSF objects share a plan; changed content replans.
    (Keying on ``id(psf)`` would fail the first assertion whenever the
    two loads produce distinct objects, and could silently PASS the
    second via address reuse — the round-3 hazard.)"""
    from thz_image_explorer_tpu.io.psf_npz import load_psf

    calls = {"n": 0}
    real = dec.plan_bands

    def counted(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(dec, "plan_bands", counted)
    stage = Deconvolution()
    stage.params.n_filters = 3
    stage.params.n_iterations = 4
    cube = _deconv_cube()

    psf_a = load_psf(REF_PSF)
    out_a = stage.apply(cube, StageContext(psf=psf_a))
    assert calls["n"] == 1

    del psf_a  # a fresh object may reuse the freed address
    psf_b = load_psf(REF_PSF)  # same content, different object
    out_b = stage.apply(cube, StageContext(psf=psf_b))
    assert calls["n"] == 1, "equal-content PSF must hit the plan cache"
    np.testing.assert_allclose(
        np.asarray(out_a.data), np.asarray(out_b.data), atol=1e-6
    )

    psf_c = load_psf(REF_PSF)
    psf_c.wx_fit.base_a = psf_c.wx_fit.base_a + 0.05  # new band geometry
    stage.apply(cube, StageContext(psf=psf_c))
    assert calls["n"] == 2, "changed PSF content must replan"


def test_psf_fingerprint_tracks_content():
    from thz_image_explorer_tpu.io.psf_npz import load_psf

    a, b = load_psf(REF_PSF), load_psf(REF_PSF)
    assert a is not b and a.fingerprint() == b.fingerprint()
    b.y0_spline.values = b.y0_spline.values + 1.0
    assert a.fingerprint() != b.fingerprint()


# ------------------------------------------------------------- name marker
def test_deconvolution_named_extension_is_normal_filter(tmp_path, monkeypatch):
    """A user filter whose display name contains "Deconvolution" must get
    NONE of the special semantics: it runs on upstream changes (no
    suppression / no Apply-only gating) and its own toggle triggers an
    update."""
    from thz_image_explorer_tpu.pipeline.stage import (
        _REGISTRY,
        FilterConfig,
        FilterDomain,
        FilterStage,
        register_filter,
    )

    @register_filter
    class DeconvolutionSharpen(FilterStage):
        def __init__(self):
            self.active = False
            self.runs = 0

        def config(self):
            return FilterConfig(
                name="Deconvolution Sharpen",
                description="user extension with a confusing name",
                domain=FilterDomain.TIME_AFTER_FFT,
            )

        def apply(self, cube, ctx):
            self.runs += 1
            return cube.replace(data=cube.data * 1.5)

    try:
        t, raw = synthetic_scan(width=8, height=8, n_time=64)
        path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)
        ex = Explorer()
        ex.open_file(path)
        p = ex.pipeline
        assert not p.filters["deconvolution_sharpen"].is_deconvolution
        assert p.filters["deconvolution"].is_deconvolution

        # enabling via the toggle triggers a run (deconvolution would not)
        ex.set_filter_active("deconvolution_sharpen", True)
        assert p.filters["deconvolution_sharpen"].runs >= 1
        runs0 = p.filters["deconvolution_sharpen"].runs

        # an upstream change re-runs it (a real deconvolution is suppressed)
        p.filters["frequency_band_pass"].active = True
        ex.update_filter("frequency_band_pass")
        assert p.filters["deconvolution_sharpen"].runs > runs0
    finally:
        _REGISTRY.pop("deconvolution_sharpen", None)


# --------------------------------------------------------- padded geometry
def _impulse(w, h, n, pad_to=None):
    data = np.zeros((w, h, n), np.float32)
    data[:, :, n // 2] = 1.0
    valid = None
    if pad_to is not None:
        pw, ph = pad_to
        data = np.pad(data, ((0, pw - w), (0, ph - h), (0, 0)))
        valid = (w, h)
    t = (np.arange(n) * 0.05).astype(np.float32)
    return make_cube(t, data, dx=2.0, dy=1.0, valid_wh=valid)


def test_tilt_padded_matches_unpadded():
    """Tilt output on the valid region must be identical whether or not
    the loader bucket-padded the grid — geometry comes from valid_wh."""
    w, h, n = 10, 6, 64
    plain = _impulse(w, h, n)
    padded = _impulse(w, h, n, pad_to=(16, 16))

    out_plain = tilt_compensate(plain, 12.0, 4.0)
    out_padded = tilt_compensate(padded, 12.0, 4.0, valid_wh=(w, h))

    # identical time extension (padded grid must not inflate it)
    assert out_padded.data.shape[-1] == out_plain.data.shape[-1]
    np.testing.assert_allclose(
        np.asarray(out_padded.time), np.asarray(out_plain.time), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_padded.data)[:w, :h],
        np.asarray(out_plain.data),
        atol=1e-6,
    )
    # padded border stays exactly zero (masked-mean invariant)
    border = np.asarray(out_padded.data)[w:, :, :]
    assert np.all(border == 0.0)
    assert np.all(np.asarray(out_padded.data)[:, h:, :] == 0.0)


def test_tilt_extension_uses_valid_dims():
    # a 16x16 padded grid at 15 deg would extend further than the true
    # 10x6 scan; the steps must come from the valid dims
    steps_valid = extension_steps(10, 6, 2.0, 1.0, 15.0, 0.0)
    steps_padded = extension_steps(16, 16, 2.0, 1.0, 15.0, 0.0)
    assert steps_padded > steps_valid  # the bug would be observable
    padded = _impulse(10, 6, 64, pad_to=(16, 16))
    out = tilt_compensate(padded, 15.0, 0.0, valid_wh=(10, 6))
    assert out.data.shape[-1] == 64 + 2 * steps_valid


def test_tilt_through_pipeline_padded_invariant(tmp_path, monkeypatch):
    """End-to-end: the same scan opened with bucket 1 (no padding) and
    bucket 16 (padded) must publish identical tilt-compensated spectra —
    tilt output must not depend on THZ_SHAPE_BUCKET."""

    def run(bucket):
        monkeypatch.setenv("THZ_SHAPE_BUCKET", str(bucket))
        t, raw = synthetic_scan(width=10, height=9, n_time=64)
        path = write_scan_thz(str(tmp_path / f"s{bucket}.thzimg"), t, raw)
        ex = Explorer()
        ex.open_file(path)
        f = ex.pipeline.filters["tilt_compensation"]
        f.tilt_x, f.tilt_y = 10.0, 5.0
        ex.set_filter_active("tilt_compensation", True)
        return ex

    ex1, ex16 = run(1), run(16)
    np.testing.assert_allclose(
        ex16.plot.filtered_time, ex1.plot.filtered_time, atol=1e-6
    )
    np.testing.assert_allclose(
        ex16.plot.filtered_signal, ex1.plot.filtered_signal, atol=1e-5
    )
    np.testing.assert_allclose(
        ex16.plot.avg_signal_fft, ex1.plot.avg_signal_fft,
        atol=1e-4, rtol=1e-4,
    )


# ------------------------------------------------------------ scaling noop
def test_scale_noop_small_valid_region():
    """valid 8x8 padded to 16x16, scale 12: the padded grid passes the
    old check (16//12 == 1) but the true scan collapses (8//12 == 0) —
    must be a no-op like the reference."""
    data = np.zeros((16, 16, 8), np.float32)
    data[:8, :8] = 1.0
    t = np.linspace(0.0, 1.0, 8, dtype=np.float32)
    cube = make_cube(t, data, valid_wh=(8, 8))
    assert scale_cube(cube, 12, valid_wh=(8, 8)) is cube
    # sanity: a feasible scale still downscales
    out = scale_cube(cube, 2, valid_wh=(8, 8))
    assert out.width == 8 and tuple(np.asarray(out.valid_wh)) == (4, 4)


def test_scale_noop_small_valid_through_pipeline(tmp_path, monkeypatch):
    """Product path: an 8x8 scan bucket-padded to 16x16 with downscale 12
    must publish the UNscaled image (reference no-ops), not a zero-diluted
    1x1 block."""
    monkeypatch.setenv("THZ_SHAPE_BUCKET", "16")
    t, raw = synthetic_scan(width=8, height=8, n_time=64)
    path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)
    ex = Explorer()
    ex.open_file(path)
    base = ex.image.copy()
    ex.set_downscaling(12)
    assert ex.pipeline.output.scaling == 1  # no-op applied
    np.testing.assert_allclose(ex.image, base, atol=1e-6)


# ------------------------------------------------- fresh per-stage ms
def test_per_stage_ms_refresh_after_idle(tmp_path):
    """Fused interactive runs can't split per-stage ms; once the command
    queue drains, an exact shadow pass must refresh every stage's timing
    so the filter panel never shows a stale ms as current (round-4 task
    7; the reference re-times each filter every pass,
    ``filters/filter.rs:607-621``)."""
    from thz_image_explorer_tpu.pipeline.worker import ExplorerWorker

    t, raw = synthetic_scan(width=12, height=10, n_time=64)
    path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)
    w = ExplorerWorker()
    try:
        w.send("open_file", path)
        w.send("set_filter_active", "frequency_band_pass", True)
        w.send("set_fft_window_low", 1.2)  # fused interactive run
        assert w.join_idle(120)
        p = w.explorer.pipeline
        assert p.timings_stale == set()
        # the shadow pass produced a real blocking ms for the stage
        assert p.timings.get("frequency_band_pass", 0.0) > 0.0
        assert p.timings.get("fft", 0.0) > 0.0
    finally:
        w.close()


def test_shadow_pass_preserves_state(tmp_path):
    """The idle timing refresh is a pure recompute: published output and
    slots must be value-identical before/after."""
    t, raw = synthetic_scan(width=12, height=10, n_time=64)
    path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)
    ex = Explorer()
    ex.open_file(path)
    p = ex.pipeline
    ex.set_fft_window_low(1.1)
    before = np.asarray(p.output.data).copy()
    assert p.timings_stale  # fused run marked the range
    assert p.refresh_stage_timings() is True
    np.testing.assert_allclose(np.asarray(p.output.data), before, atol=1e-6)
    assert p.timings_stale == set()
    # nothing stale -> no second pass
    assert p.refresh_stage_timings() is False


def test_shadow_pass_never_runs_deconvolution(tmp_path, monkeypatch):
    t, raw = synthetic_scan(width=16, height=16, n_time=64)
    path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)
    ex = Explorer()
    ex.open_file(path)
    p = ex.pipeline
    deconv = p.filters["deconvolution"]
    deconv.active = True
    calls = {"n": 0}
    monkeypatch.setattr(
        deconv, "apply", lambda cube, ctx: calls.update(n=calls["n"] + 1) or cube
    )
    ex.set_fft_window_low(1.3)
    p.refresh_stage_timings()
    assert calls["n"] == 0


def test_shadow_pass_keeps_identity_stage_ms(tmp_path):
    """The refresh must never overwrite a skipped stage's last real ms
    with the microseconds the skip took: an active-but-suppressed
    deconvolution keeps its Apply-time ms through the idle shadow pass
    (the reference never times a skip, ``filter.rs:607-621``)."""
    t, raw = synthetic_scan(width=16, height=16, n_time=64)
    path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)
    ex = Explorer()
    ex.open_file(path)
    p = ex.pipeline
    p.filters["deconvolution"].active = True
    p.timings["deconvolution"] = 0.512  # pretend Apply measured 512 ms
    ex.set_fft_window_low(1.3)  # fused run marks the range stale
    assert p.refresh_stage_timings() is True
    assert p.timings["deconvolution"] == 0.512


# -------------------------------------------------- background precompile
def test_serve_precompile_default_on():
    """``serve`` precompiles the opened scan's bucket in the background by
    default (round-4 task 2); --no-precompile disables."""
    import thz_image_explorer_tpu.cli as climod

    called = {}

    def fake_serve(port, scan, precompile):
        called.update(port=port, scan=scan, precompile=precompile)

    import thz_image_explorer_tpu.web as webmod
    real = webmod.serve
    webmod.serve = fake_serve
    try:
        climod.main(["serve", "scan.thzimg", "--port", "1"])
        assert called["precompile"] is True
        climod.main(["serve", "scan.thzimg", "--port", "1",
                     "--no-precompile"])
        assert called["precompile"] is False
    finally:
        webmod.serve = real


def test_serve_enqueues_background_warmup(tmp_path, monkeypatch):
    """serve() with a scan and precompile=True enqueues the warmup command
    behind the open (the background precompile that makes the first
    slider drag hit compiled code)."""
    from thz_image_explorer_tpu import web as webmod

    sent = []

    class FakeWorker:
        def send(self, method, *a, **k):
            sent.append(method)

        def close(self):
            pass

    class FakeApp:
        def __init__(self, *a, **k):
            self.worker = FakeWorker()

        def save_settings(self):
            pass

    class BoomServer:
        def __init__(self, *a, **k):
            raise KeyboardInterrupt  # stop serve() before serve_forever

    monkeypatch.setattr(webmod, "WebApp", FakeApp)
    monkeypatch.setattr(webmod, "ThreadingHTTPServer", BoomServer)
    try:
        webmod.serve(port=0, scan="x.thzimg", precompile=True)
    except KeyboardInterrupt:
        pass
    assert sent == ["open_file", "warmup"]
    sent.clear()
    try:
        webmod.serve(port=0, scan="x.thzimg", precompile=False)
    except KeyboardInterrupt:
        pass
    assert sent == ["open_file"]


def test_idle_refresh_never_reverts_apply(tmp_path):
    """The shadow pass is timings-only: after a fused run leaves stale
    markers and an Apply deconvolves the cube, the idle refresh (which
    skips deconvolution) must leave every published slot byte-identical —
    it must NOT rebuild the output without the deconvolution."""
    t, raw = synthetic_scan(width=16, height=16, n_time=64)
    path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)
    ex = Explorer()
    ex.open_file(path)
    ex.open_psf("/root/reference/sample_data/psf.npz")
    p = ex.pipeline
    f = p.filters["deconvolution"]
    f.active = True
    f.params.n_iterations, f.params.n_filters = 4, 3
    ex.set_fft_window_low(1.2)  # fused interactive run -> stale markers
    ex.update_filter("deconvolution", force=True)  # Apply
    out_applied = np.asarray(p.output.data).copy()
    img_applied = np.asarray(ex.image).copy()
    p.timings_stale.add("fft")  # whatever Apply's range didn't cover
    assert p.refresh_stage_timings() is True
    np.testing.assert_array_equal(np.asarray(p.output.data), out_applied)
    np.testing.assert_array_equal(np.asarray(ex.image), img_applied)


# ------------------------------------------- round-4 self-review findings
def test_n_freq_on_lean_final_slot(tmp_path):
    """``ScanCube.n_freq`` is part of the documented data-model contract
    (``data_container.rs:109-162``); it must work on the default lean
    pipeline output, whose spectral leaves are None (the merged program
    materializes only published leaves)."""
    t, raw = synthetic_scan(width=12, height=10, n_time=64)
    path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)
    ex = Explorer()
    ex.open_file(path)
    out = ex.pipeline.output
    if out.fft is None:  # lean mode (the default)
        assert out.n_freq == out.n_time // 2 + 1


def test_join_idle_survives_fast_call_polling():
    """A state reader polling ``call()`` faster than the worker's 0.1 s
    take window (two browser tabs at ~150 ms each interleave well below
    it) must not starve ``join_idle``: idle is evaluated after every
    processed command, not only on the take timeout."""
    import threading
    import time

    from thz_image_explorer_tpu.pipeline.worker import ExplorerWorker

    w = ExplorerWorker()
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            try:
                w.call(lambda ex: None, timeout=2.0)
            except TimeoutError:
                pass
            time.sleep(0.02)

    th = threading.Thread(target=poll, daemon=True)
    th.start()
    try:
        time.sleep(0.3)  # polling cadence established
        assert w.join_idle(5.0), "join_idle starved by sub-100ms polling"
    finally:
        stop.set()
        th.join(2.0)
        w.close()


def test_specred_without_complex_sums():
    """``with_complex=False`` (the product publish path) must produce the
    same amp / increment sums and compile the cos/sin accumulators out."""
    from thz_image_explorer_tpu.ops.pallas_specred import (
        spectral_reduction_sums,
    )

    rng = np.random.default_rng(7)
    c = np.float32(rng.standard_normal((64, 33)))
    s = np.float32(rng.standard_normal((64, 33)))
    masks = np.float32(rng.uniform(0, 1, (3, 64)) > 0.4)
    full = spectral_reduction_sums(
        jnp.asarray(c), jnp.asarray(s), jnp.asarray(masks)
    )
    lean = spectral_reduction_sums(
        jnp.asarray(c), jnp.asarray(s), jnp.asarray(masks),
        with_complex=False,
    )
    assert lean[2] is None and lean[3] is None
    np.testing.assert_allclose(np.asarray(lean[0]), np.asarray(full[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lean[1]), np.asarray(full[1]),
                               rtol=1e-6)


def test_settings_load_tolerates_corrupted_file(tmp_path):
    """A state file whose JSON top level is not a dict must load as
    defaults (the reference's ``preferences`` crate falls back too) —
    and must never raise out of serve()'s teardown path."""
    from thz_image_explorer_tpu.utils.settings import (
        PsfToolState,
        Settings,
    )

    (tmp_path / Settings.FILE).write_text("[1, 2, 3]")
    (tmp_path / PsfToolState.FILE).write_text('["not", "a", "dict"]')
    assert Settings.load(str(tmp_path)) == Settings()
    assert PsfToolState.load(str(tmp_path)) == PsfToolState()


def test_web_apply_runs_deconvolution_in_fused_mode(tmp_path):
    """The web Apply button sends ``update_filter(uuid)`` with no force
    flag (``web.py`` filter panel); in the default FUSED mode this must
    still run the deconvolution — the reference's suppression rule is
    keyed on the trigger, and an ``UpdateFilter`` from the deconvolution
    itself always executes it (``data_thread.rs:1139-1149``)."""
    t, raw = synthetic_scan(width=16, height=16, n_time=64)
    path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)
    ex = Explorer()
    assert ex.pipeline.fused_mode, "fused mode should be the default"
    ex.open_file(path)
    ex.open_psf("/root/reference/sample_data/psf.npz")
    f = ex.pipeline.filters["deconvolution"]
    f.active = True
    f.params.n_iterations, f.params.n_filters = 4, 3
    calls = []
    orig_apply = f.apply

    def counting_apply(cube, ctx):
        calls.append(1)
        return orig_apply(cube, ctx)

    f.apply = counting_apply
    ex.update_filter("deconvolution")  # the exact web Apply command
    assert calls, "Apply was a silent no-op in fused mode"
    out_applied = np.asarray(ex.pipeline.output.data).copy()
    # suppression unchanged: an upstream slider change must NOT rerun it
    calls.clear()
    ex.set_fft_window_low(1.1)
    assert not calls, "slider change reran the deconvolution"
    # and a second Apply runs it again on the new upstream state
    ex.update_filter("deconvolution")
    assert calls
    assert not np.allclose(np.asarray(ex.pipeline.output.data),
                           out_applied)


def test_fusable_deconvolution_extension_respects_suppression(tmp_path):
    """An extension with ``is_deconvolution=True`` AND ``fusable=True``
    (both protocol-sanctioned) must never execute inside an interactive
    fused program — suppression is decided by the marker BEFORE the
    fusable test; only its own ``update_filter`` runs it."""
    from thz_image_explorer_tpu.pipeline.stage import (
        _REGISTRY,
        FilterConfig,
        FilterDomain,
        FilterStage,
        register_filter,
    )

    applies = []

    @register_filter
    class FusableDeconv(FilterStage):
        fusable = True
        is_deconvolution = True

        def __init__(self):
            self.active = False

        def config(self):
            return FilterConfig(
                name="Fusable Deconv X", description="ext",
                domain=FilterDomain.TIME_AFTER_FFT_PRIO_LAST,
            )

        def fused_apply(self, cube, params, static):
            raise AssertionError(
                "a deconvolution must never run inside the fused program"
            )

        def apply(self, cube, ctx):
            applies.append(1)
            return cube.replace(data=cube.data * 2.0)

    try:
        t, raw = synthetic_scan(width=12, height=10, n_time=64)
        path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)
        ex = Explorer()
        ex.open_file(path)
        f = ex.pipeline.filters["fusable_deconv"]
        f.active = True
        base = np.asarray(ex.pipeline.output.data).copy()
        # interactive fused updates: forced identity, fused_apply unreached
        ex.set_fft_window_low(1.1)
        ex.set_fft_window_low(1.3)
        assert not applies
        # its own Apply runs the exact stage body
        ex.update_filter("fusable_deconv")
        assert applies
        assert not np.allclose(np.asarray(ex.pipeline.output.data), base)
    finally:
        _REGISTRY.pop("fusable_deconv", None)


def test_show_data_extension_contract(tmp_path):
    """``show_data`` extensions get the reference contract
    (``data_thread.rs:858,1322-1334``): a fully populated final dataset
    (even in lean mode, where the final slot's spectra are None) and the
    pixel in the final slot's DOWNSCALED coordinates; negative clicks
    are sanitized at the entry point."""
    from thz_image_explorer_tpu.pipeline.stage import (
        _REGISTRY,
        FilterConfig,
        FilterDomain,
        FilterStage,
        register_filter,
    )

    seen = []

    @register_filter
    class PreviewProbe(FilterStage):
        def __init__(self):
            self.active = False

        def config(self):
            return FilterConfig(name="Preview Probe", description="x",
                                domain=FilterDomain.TIME_AFTER_FFT)

        def show_data(self, cube, pixel):
            seen.append((cube.amplitudes is not None, pixel))

        def apply(self, cube, ctx):
            return cube

    try:
        t, raw = synthetic_scan(width=20, height=20, n_time=64)
        path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)
        ex = Explorer()
        ex.open_file(path)
        ex.set_downscaling(2)
        seen.clear()
        ex.set_selected_pixel(15, 12)
        assert seen, "show_data never called for the overriding extension"
        has_spectra, pixel = seen[-1]
        assert has_spectra, "show_data saw a lean slot with None spectra"
        assert pixel == (7, 6)  # divided by the slot's scaling
        seen.clear()
        ex.set_selected_pixel(-3, 10**6)  # sanitized + clamped
        _h, pixel = seen[-1]
        assert pixel[0] == 0 and pixel[1] <= 9
        assert ex.pixel_selected[0] == 0
    finally:
        _REGISTRY.pop("preview_probe", None)


# ------------------------------------------------- registry key hygiene
def test_register_filter_subclass_never_clobbers_parent():
    """A subclass of a registered stage must not inherit its parent's
    registry key: @register_filter on the subclass derives a fresh slug
    from the subclass name (inherited `uuid` attributes don't count)."""
    from thz_image_explorer_tpu.pipeline.stage import (
        _REGISTRY,
        register_filter,
    )
    from thz_image_explorer_tpu.pipeline.filters import FrequencyBandPass

    parent_cls = _REGISTRY["frequency_band_pass"]
    try:
        @register_filter
        class FrequencyBandPassSteeper(FrequencyBandPass):
            pass

        assert _REGISTRY["frequency_band_pass"] is parent_cls
        assert _REGISTRY["frequency_band_pass_steeper"] is FrequencyBandPassSteeper
        assert FrequencyBandPassSteeper.uuid == "frequency_band_pass_steeper"
    finally:
        _REGISTRY.pop("frequency_band_pass_steeper", None)

    # an EXPLICIT uuid collision with a different class fails loudly
    with pytest.raises(ValueError, match="already registered"):
        @register_filter
        class Impostor:
            uuid = "frequency_band_pass"
    assert _REGISTRY["frequency_band_pass"] is parent_cls


# --------------------------------------------------- command queue keys
def test_coalesce_key_kwargs_are_oneshot():
    """Commands sent with kwargs must never share a coalescing key — two
    kwarg-sent update_filter calls for different filters would otherwise
    collapse and silently drop the first Apply."""
    from thz_image_explorer_tpu.pipeline.worker import coalesce_key

    assert coalesce_key("update_filter", ("fd",)) == ("update_filter", "fd")
    assert coalesce_key("update_filter", (), {"uuid": "fd"}) is None
    assert coalesce_key("set_fft_window_low", (), {"value": 1.0}) is None


def test_metadata_edits_coalesce_per_name():
    """set_metadata_field coalesces per FIELD NAME (latest value wins
    while typing), not per (name, value) — the old key included the
    payload so rapid re-saves piled up unboundedly."""
    from thz_image_explorer_tpu.pipeline import CommandQueue
    from thz_image_explorer_tpu.pipeline.worker import coalesce_key

    q = CommandQueue()
    put = lambda m, *a: q.put((m, a, {}), key=coalesce_key(m, a))
    put("set_metadata_field", "comment", "a")
    put("set_metadata_field", "comment", "ab")
    put("set_metadata_field", "user", "x")
    put("set_metadata_attr", "Operator", "1")
    put("set_metadata_attr", "Operator", "12")
    got = [q.take(timeout=1) for _ in range(3)]
    assert [(g[0], g[1]) for g in got] == [
        ("set_metadata_field", ("comment", "ab")),
        ("set_metadata_field", ("user", "x")),
        ("set_metadata_attr", ("Operator", "12")),
    ]
    assert q.take(timeout=0.05) is None
    q.close()
    q.release()


# ------------------------------------------------------- abort semantics
def test_abort_cancels_inflight_command():
    """An abort raised while a command runs must cancel THAT command —
    the old per-command flag.clear() could erase an abort that landed
    between the queue pop and the clear."""
    import threading
    import time

    from thz_image_explorer_tpu.pipeline.worker import ExplorerWorker

    w = ExplorerWorker()
    try:
        started = threading.Event()
        outcome = {}

        def long_cmd(ex):
            started.set()
            deadline = time.monotonic() + 5.0
            while time.monotonic() < deadline:
                if ex.pipeline.cancelled():
                    outcome["cancelled"] = True
                    return
                time.sleep(0.005)
            outcome["cancelled"] = False

        w.queue.put((long_cmd, (), {}))
        assert started.wait(2.0)
        w.abort()
        assert w.join_idle(5.0)
        assert outcome.get("cancelled") is True

        # ...and a STALE abort must not cancel the NEXT command
        # (call() rides the same worker loop, so the per-command stale-
        # abort clear has run by the time the closure executes)
        assert w.call(lambda ex: ex.pipeline.cancelled(), timeout=5.0) is False
    finally:
        w.close()


def test_worker_close_releases_native_queue():
    """close() reclaims the native queue handle (mutex/cond/nodes) once
    the consumer thread is provably out of take() — and a late send
    degrades gracefully instead of crashing."""
    from thz_image_explorer_tpu.pipeline.worker import ExplorerWorker

    w = ExplorerWorker()
    w.close()
    if w.queue._lib is not None:
        assert w.queue._handle is None
    w.send("publish")  # no-op after release; must not raise
    w.queue.release()  # idempotent


# ------------------------------------------- fused_static type hygiene
def test_tilt_fused_static_rejects_traced_cube():
    """fused_static must fail loudly when handed a real ScanCube (traced
    valid_wh) instead of silently deriving tilt geometry from the
    bucket-padded grid."""
    from thz_image_explorer_tpu.pipeline.filters import TiltCompensation

    cube = _deconv_cube(16, 16, 32)
    tc = TiltCompensation()
    tc.tilt_x = 5.0
    with pytest.raises(TypeError, match="valid_wh"):
        tc.fused_static(cube)


def test_abort_cancels_command_that_escaped_the_drain():
    """The take()->clear-check window: a command popped just BEFORE an
    abort's drain escapes the drain, and the old timestamp scheme then
    misread the abort as stale (abort_t < cmd stamp) and cleared it. The
    epoch scheme keys staleness on the drain-vs-pop order recorded under
    the queue lock, so the escapee stays cancelled."""
    import threading

    from thz_image_explorer_tpu.pipeline.worker import ExplorerWorker

    w = ExplorerWorker()
    try:
        real_take = w.queue.take
        popped = threading.Event()
        gate = threading.Event()  # holds the worker between pop and check

        def slow_take(timeout=None):
            cmd = real_take(timeout=timeout)
            if cmd is not None:
                popped.set()
                gate.wait(5.0)
            return cmd

        w.queue.take = slow_take
        # the worker may be blocked INSIDE a real take(timeout=0.1) call
        # entered before the patch; let it time out so the next iteration
        # goes through slow_take
        import time

        time.sleep(0.3)
        outcome = {}
        done = threading.Event()

        def cmd(ex):
            outcome["cancelled"] = ex.pipeline.cancelled()
            done.set()

        # raw queue.put (not send()): the worker's idle flag stays set, so
        # completion is observed via `done`, not join_idle
        w.queue.put((cmd, (), {}))
        assert popped.wait(2.0)
        w.abort()  # completes fully while the popped command is in limbo
        gate.set()
        assert done.wait(5.0)
        assert outcome.get("cancelled") is True, (
            "command that escaped the abort drain ran uncancelled"
        )
    finally:
        w.queue.take = real_take
        w.close()


def test_command_queue_abort_epochs():
    """pop_epoch tracks the abort_epoch at payload commit: equal means
    enqueued after the last drain (stale flag clearable), lower means the
    pop escaped a drain."""
    from thz_image_explorer_tpu.pipeline import CommandQueue

    q = CommandQueue()
    try:
        q.put(("a", (), {}))
        assert q.take(timeout=1) is not None
        assert q.pop_epoch == q.abort_epoch == 0
        q.drain()
        assert q.abort_epoch == 1
        q.put(("b", (), {}))
        assert q.take(timeout=1) is not None
        assert q.pop_epoch == q.abort_epoch == 1
    finally:
        q.close()
        q.release()
