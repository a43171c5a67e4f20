"""PSF tool tests: spline/hybrid fit parity, beam fitting on synthetic and
REAL knife-edge data, diagnostics, full compute pipeline + export."""

import os

import numpy as np
import pytest

from thz_image_explorer_tpu.psf_tool import (
    BeamFitParams,
    CubicSpline,
    CurveFits,
    DiagnosticResults,
    FilterParams,
    HybridFitF64,
    KnifeEdgeMeasurement,
    fit_mean_beam,
    split_and_flip,
)
from thz_image_explorer_tpu.psf_tool.app import compute_psf, check_transition_width
from thz_image_explorer_tpu.psf_tool.fitting import (
    compute_intensity,
    erf_model,
    filter_traces_all_bands,
    fit_error_function,
)

REF_X = (
    "/root/reference/sample_data/example_beam_width/measurement_x/data/"
    "1750085285.8557956_data.thz"
)
REF_Y = (
    "/root/reference/sample_data/example_beam_width/measurement_y/data/"
    "1750163177.929295_data.thz"
)
needs_data = pytest.mark.skipif(
    not (os.path.exists(REF_X) and os.path.exists(REF_Y)), reason="no fixture"
)


# ------------------------------------------------------------------ splines
def test_cubic_spline_exact_on_knots_and_parabola():
    """Reference tests (``curve_fitting.rs:403-492``)."""
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    y = x**2
    s = CubicSpline.fit(x, y)
    np.testing.assert_allclose(s.evaluate(x), y, atol=1e-10)
    assert abs(s.evaluate(1.5)[0] - 2.25) < 0.1


def test_cubic_spline_linear_exact():
    x = np.array([0.0, 1.0, 2.0, 3.0])
    y = 2 * x + 1
    s = CubicSpline.fit(x, y)
    np.testing.assert_allclose(s.evaluate([0.5, 1.5, 2.5]), [2.0, 4.0, 6.0],
                               atol=1e-10)


def test_cubic_spline_positive_extrapolation():
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    y = np.array([5.0, 3.5, 2.8, 2.3, 2.0])
    s = CubicSpline.fit(x, y)
    left = s.evaluate(0.5)[0]
    right = s.evaluate(6.0)[0]
    assert left > 0 and left > y[0]
    assert right > 0


def test_hybrid_fit_recovers_base_model():
    f = np.linspace(0.2, 4.0, 20)
    w = 2.0 / f + 0.5
    h = HybridFitF64.fit(f, w)
    assert abs(h.a - 2.0) < 1e-6 and abs(h.b - 0.5) < 1e-6
    np.testing.assert_allclose(h.evaluate(f), w, atol=1e-8)


def test_hybrid_fit_monotone_clip():
    f = np.linspace(0.2, 4.0, 30)
    rng = np.random.default_rng(0)
    w = 2.0 / f + 0.5 + 0.05 * rng.normal(size=f.shape)
    h = HybridFitF64.fit(f, w)
    out = h.evaluate(np.linspace(0.1, 6.0, 100))
    assert (np.diff(out) <= 1e-12).all()


def test_curve_fits_runtime_roundtrip():
    """The tool's f64 fits must evaluate identically through the runtime
    (f32) PSF model within float tolerance — the npz round-trip contract."""
    f = np.linspace(0.2, 4.0, 20)
    rng = np.random.default_rng(1)
    wx = 2.0 / f + 0.5 + 0.02 * rng.normal(size=f.shape)
    wy = 1.5 / f + 0.6 + 0.02 * rng.normal(size=f.shape)
    x0 = 0.1 * np.sin(f)
    y0 = 0.05 * np.cos(f)
    fits = CurveFits.fit_from_data(f, wx, wy, x0, y0)
    psf = fits.to_runtime_psf()
    q = np.linspace(0.15, 5.0, 50).astype(np.float32)
    # runtime eval_single has no monotone clip; compare against the raw
    # (unclipped) hybrid evaluation
    raw = fits.wx_fit.a / q + fits.wx_fit.b + fits.wx_fit._eval_correction(
        q.astype(np.float64)
    )
    np.testing.assert_allclose(psf.wx_fit.eval(q), raw, rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(
        psf.x0_spline.eval_const_extrap(q),
        fits.x0_fit.evaluate_const_extrap(q.astype(np.float64)),
        atol=1e-4,
    )


# ------------------------------------------------------------------ fitting
def test_erf_fit_recovers_parameters():
    x = np.linspace(-10, 10, 80)
    y = erf_model(x, 1.3, 4.2)
    x0, w = fit_error_function(x, y, (0.0, 10.0))
    assert abs(x0 - 1.3) < 1e-3
    assert abs(w - 4.2) < 1e-3


def test_erf_fit_penalty_bounds():
    x = np.linspace(-10, 10, 80)
    y = erf_model(x, 5.0, 4.0)
    x0, w = fit_error_function(x, y, (0.0, 3.0), bounds=((-2.0, 0.1), (2.0, 3.5)))
    assert -2.0 <= x0 <= 2.0 and 0.1 <= w <= 3.5


def test_filter_traces_matches_direct_correlation():
    rng = np.random.default_rng(0)
    traces = rng.normal(size=(5, 200))
    taps = rng.normal(size=(3, 21))
    got = filter_traces_all_bands(traces, taps)
    mid = 21 // 2
    for b in range(3):
        for p in range(5):
            expected = np.zeros(200)
            for i in range(200):
                acc = 0.0
                for j in range(21):
                    k = i + j - mid
                    if 0 <= k < 200:
                        acc += traces[p, k] * taps[b, j]
                expected[i] = acc
            np.testing.assert_allclose(got[b, p], expected, atol=1e-4)


def test_filter_and_intensity_matches_host_path():
    """The fused device program (filter + per-band normalized intensity,
    one tiny transfer) must agree with filter_traces_all_bands +
    compute_intensity — the erf fits consume only the intensities."""
    from thz_image_explorer_tpu.psf_tool.fitting import (
        compute_intensity,
        filter_and_intensity_all_bands,
    )

    rng = np.random.default_rng(3)
    traces = rng.normal(size=(7, 150))
    taps = rng.normal(size=(4, 33))
    filt_dev, inten = filter_and_intensity_all_bands(traces, taps)
    ref_filt = filter_traces_all_bands(traces, taps)
    np.testing.assert_allclose(np.asarray(filt_dev), ref_filt, atol=1e-4)
    ref_inten = np.stack(
        [compute_intensity(ref_filt[b]) for b in range(taps.shape[0])]
    )
    np.testing.assert_allclose(inten, ref_inten, atol=1e-4)


def test_fit_beam_widths_dedupes_identical_traces():
    """_fit_axis passes the same half for x and y: the filter program must
    run once, and the returned x/y filtered cubes must be the same object."""
    from thz_image_explorer_tpu.psf_tool import fitting as fitting_mod

    rng = np.random.default_rng(4)
    traces = rng.normal(size=(12, 64))
    positions = np.linspace(-5, 5, 12)
    taps = rng.normal(size=(2, 9))
    mean_fit = fitting_mod.MeanBeamFit(
        x0=0.0, y0=0.0, popt_x=(0.0, 5.0), popt_y=(0.0, 5.0)
    )
    calls = []
    real = fitting_mod.filter_and_intensity_all_bands

    def counting(tr, tp):
        calls.append(1)
        return real(tr, tp)

    fitting_mod.filter_and_intensity_all_bands = counting
    try:
        fits = fitting_mod.fit_beam_widths(
            mean_fit, positions, positions, traces, traces, taps,
            fitting_mod.BeamFitParams(),
        )
    finally:
        fitting_mod.filter_and_intensity_all_bands = real
    assert len(calls) == 1
    assert fits.filtered_traces_x is fits.filtered_traces_y


def _synthetic_knife_edge(n_pos=60, n_time=256, w_true=3.0, seed=0):
    """Double knife edge: intensity I(x) = erf profile on each half."""
    rng = np.random.default_rng(seed)
    positions = np.linspace(0.25, 15.0, n_pos)
    t = np.arange(n_time) * 0.05
    pulse = np.exp(-((t - 3.0) ** 2) / 0.3) * np.sin(2 * np.pi * 1.0 * (t - 3.0))
    # amplitude per position follows sqrt of the erf profile around x0=7.5
    amp_right = np.sqrt(erf_model(positions, 7.5 + 3.75, w_true))
    amp_left = np.sqrt(erf_model(positions, 3.75, w_true))
    # first half rising (left knife), second half also rising
    amp = np.concatenate([amp_left[: n_pos // 2], amp_right[n_pos // 2 :]])
    traces = amp[:, None] * pulse[None, :] + 1e-4 * rng.normal(
        size=(n_pos, n_time)
    )
    return KnifeEdgeMeasurement(
        positions=positions, time_traces=traces, times=t
    )


def test_split_and_flip():
    m = _synthetic_knife_edge(n_pos=10)
    left, right = split_and_flip(m)
    assert len(left.positions) == 5 and len(right.positions) == 5
    np.testing.assert_allclose(left.positions, -m.positions[:5][::-1])
    np.testing.assert_allclose(left.time_traces[0], m.time_traces[4])


def test_fit_mean_beam_synthetic():
    m = _synthetic_knife_edge()
    _left, right = split_and_flip(m)
    fit = fit_mean_beam(
        right.positions, right.positions, right.time_traces, right.time_traces
    )
    # intensity ∝ amp² = erf profile with w_true -> recovered width ~3
    assert abs(fit.popt_x[1] - 3.0) < 0.3


def test_compute_psf_synthetic_full():
    m = _synthetic_knife_edge()
    params = FilterParams(n_filters=4, start_freq=0.5, end_freq=2.0)
    res = compute_psf(m, m, params)
    assert res is not None
    assert res.filters.shape == (4, 499)
    assert res.curve_fits is not None
    widths = np.abs(res.x.beam_fits.popt_xs[:, 1])
    assert (widths > 0).all() and (widths < 30).all()
    # centers recentred to ~0 mean
    assert abs(res.x.beam_fits.popt_xs[:, 0].mean()) < 1e-9


def test_compute_psf_cancellation():
    m = _synthetic_knife_edge()
    params = FilterParams(n_filters=4, start_freq=0.5, end_freq=2.0)
    calls = {"n": 0}

    def progress(_axis, _cur, _tot):
        calls["n"] += 1
        return calls["n"] < 3

    assert compute_psf(m, m, params, progress=progress) is None


def test_transition_width_warning():
    assert check_transition_width(0.15, 5.0, 0.5) is None
    assert check_transition_width(1.0, 2.0, 0.8) is not None


# ------------------------------------------------------------------ diagnostics
def test_diagnostics_diffraction_limited():
    """Reference test (``diagnostics.rs:878-...``): w0 = A·λ data must be
    flagged diffraction-limited."""
    f = np.array([0.5, 1.0, 1.5, 2.0, 2.5])
    c_mm_thz = 0.299792458e3  # µm·THz — λ here in µm, w0 in mm
    lam_um = c_mm_thz / f
    w0_mm = 0.1 * lam_um * 1e-3  # w0 = 0.1·λ (same length unit)
    d = DiagnosticResults.compute(f, w0_mm, w0_mm)
    assert d.is_diffraction_limited
    assert d.cv_x_percent < 1.0
    np.testing.assert_allclose(d.a_x, 0.1, rtol=1e-6)
    assert "diffraction-limited" in d.summary()


def test_diagnostics_not_diffraction_limited():
    f = np.array([0.5, 1.0, 1.5, 2.0, 2.5])
    w0 = np.array([3.0, 3.0, 3.0, 3.0, 3.0])  # constant width: not ∝ λ
    d = DiagnosticResults.compute(f, w0, w0)
    assert not d.is_diffraction_limited


def test_diagnostics_input_validation():
    with pytest.raises(ValueError):
        DiagnosticResults.compute([], [], [])
    with pytest.raises(ValueError):
        DiagnosticResults.compute([1.0], [1.0, 2.0], [1.0])


def test_knife_edge_loader_pads_short_traces(tmp_path):
    """A truncated later group loads degraded, not crashing: the reference
    copies each trace into an Array2::zeros sized by the FIRST group's
    time axis (data_loader.rs:99-104), zero-padding short tails — round-4
    review found np.asarray raising on the ragged list instead."""
    import h5py

    path = str(tmp_path / "knife.thz")
    t = np.linspace(0.0, 10.0, 50)
    with h5py.File(path, "w") as f:
        for i, (pos, n) in enumerate([(-1.0, 50), (0.0, 30), (1.0, 50)]):
            g = f.create_group(f"Beam Width Measurement x={pos}")
            g.create_dataset("ds", data=np.stack([t[:n], np.ones(n) * (i + 1)], 1))
    m = KnifeEdgeMeasurement.from_thz_file(path)
    assert m.time_traces.shape == (3, 50)
    np.testing.assert_allclose(m.time_traces[1, :30], 2.0)
    np.testing.assert_allclose(m.time_traces[1, 30:], 0.0)  # zero-padded
    np.testing.assert_allclose(m.positions, [-1.0, 0.0, 1.0])


# ------------------------------------------------------------------ real data
@needs_data
def test_real_knife_edge_full_pipeline(tmp_path):
    """BASELINE config 4: PSF generation from the real example_beam_width
    measurements, exported and reloaded through the runtime model."""
    x = KnifeEdgeMeasurement.from_thz_file(REF_X)
    y = KnifeEdgeMeasurement.from_thz_file(REF_Y)
    assert x.time_traces.shape == (300, 1001)
    params = FilterParams(n_filters=6, start_freq=0.2, end_freq=3.0)
    res = compute_psf(x, y, params, BeamFitParams(w_max=30.0))
    assert res is not None and res.curve_fits is not None
    wx = np.abs(res.x.beam_fits.popt_xs[:, 1])
    # beam widths decrease with frequency for a real focused THz beam
    assert wx[0] > wx[-1]
    assert (wx > 0.1).all() and (wx < 30.0).all()

    # export + reload through the deconvolution-side loader
    from thz_image_explorer_tpu.io.psf_npz import load_psf, save_psf

    out = str(tmp_path / "psf_out.npz")
    save_psf(out, res.curve_fits.to_runtime_psf())
    psf = load_psf(out)
    assert psf.is_loaded
    q = np.linspace(0.3, 2.5, 20)
    w_eval = psf.wx_fit.eval(q.astype(np.float32))
    assert np.isfinite(w_eval).all() and (w_eval > 0).all()


@needs_data
def test_compute_thread_shutdown_joins():
    """`_shutdown` (atexit / serve teardown) cancels a mid-flight compute
    and joins the thread: a daemon thread parked in native device code at
    interpreter exit hangs teardown (observed live on the CPU backend)."""
    from thz_image_explorer_tpu.psf_tool.app import PsfToolApp

    tool = PsfToolApp()
    tool.x_path = REF_X
    tool.y_path = REF_Y
    tool.filter_params.n_filters = 4
    tool.start_computation()
    assert tool._thread is not None
    tool._shutdown()
    assert not tool._thread.is_alive()


def test_split_and_flip_odd_positions_equal_halves():
    """An odd number of knife positions must yield EQUAL halves (the
    middle row is dropped): the left/right trace averaging broadcasts
    (B, P/2, T) cubes elementwise and an unbalanced split crashed the
    whole run (the reference panics on the same input)."""
    m = _synthetic_knife_edge(n_pos=21)
    left, right = split_and_flip(m)
    assert len(left.positions) == len(right.positions) == 10
    # and a full compute on odd positions completes
    res = compute_psf(m, m, FilterParams(n_filters=3, start_freq=0.5,
                                         end_freq=2.0))
    assert res is not None and res.curve_fits is not None


def test_beam_fit_y_chain_deduped():
    """With the same knife half for both axes (and the deduped mean fit
    warm start) the y fit chain is skipped and popt_ys is bitwise
    popt_xs — half the host Nelder-Mead cost."""
    m = _synthetic_knife_edge(n_pos=20)
    _left, right = split_and_flip(m)
    mean_fit = fit_mean_beam(
        right.positions, right.positions, right.time_traces, right.time_traces
    )
    assert mean_fit.popt_y == mean_fit.popt_x  # deduped mean fit
    from thz_image_explorer_tpu.ops.firdesign import create_filter_bank
    from thz_image_explorer_tpu.psf_tool.fitting import fit_beam_widths

    taps, _ = create_filter_bank(3, 0.5, 2.0, 0.5, m.times)
    fits = fit_beam_widths(
        mean_fit, right.positions, right.positions,
        right.time_traces, right.time_traces, taps, BeamFitParams(),
    )
    np.testing.assert_array_equal(fits.popt_ys, fits.popt_xs)


def test_run_uses_param_snapshot():
    """A parameter mutated WHILE a run is in flight must not leak into
    that run: start_computation snapshots params (the reference clones
    them into the Start message)."""
    import time

    from thz_image_explorer_tpu.psf_tool import app as app_mod
    from thz_image_explorer_tpu.psf_tool.app import PsfToolApp

    m = _synthetic_knife_edge(n_pos=20)
    orig_loader = app_mod.KnifeEdgeMeasurement.from_thz_file
    started = __import__("threading").Event()

    def slow_loader(_path):
        started.set()
        time.sleep(0.3)  # guarantee the mutation lands mid-run
        return m

    app_mod.KnifeEdgeMeasurement.from_thz_file = staticmethod(slow_loader)
    tool = PsfToolApp()
    try:
        tool.x_path = "synthetic"
        tool.filter_params.n_filters = 3
        tool.filter_params.start_freq = 0.5
        tool.filter_params.end_freq = 2.0
        tool.start_computation()
        assert started.wait(5.0)
        tool.filter_params.n_filters = 5  # mid-run mutation
        tool.wait(60.0)
        assert tool.error is None, tool.error
        assert len(tool.result.center_frequencies) == 3  # snapshot won
    finally:
        app_mod.KnifeEdgeMeasurement.from_thz_file = orig_loader
        tool._shutdown()


def test_failed_curve_fit_clears_stale_diagnostics():
    """A new result without curve fits must not be served alongside the
    PREVIOUS run's diagnostics (stale diffraction-limited verdict)."""
    from thz_image_explorer_tpu.psf_tool import app as app_mod
    from thz_image_explorer_tpu.psf_tool.app import PsfToolApp
    from thz_image_explorer_tpu.psf_tool.diagnostics import DiagnosticResults

    m = _synthetic_knife_edge(n_pos=20)
    orig_loader = app_mod.KnifeEdgeMeasurement.from_thz_file
    app_mod.KnifeEdgeMeasurement.from_thz_file = staticmethod(lambda _p: m)
    tool = PsfToolApp()
    try:
        f = np.linspace(0.3, 2.0, 12)
        tool.diagnostics = DiagnosticResults.compute(f, 2.0 / f, 2.2 / f)
        tool.x_path = "synthetic"
        # n_filters=2 -> curve fit needs >=3 points -> curve_fits None
        tool.filter_params.n_filters = 2
        tool.filter_params.start_freq = 0.5
        tool.filter_params.end_freq = 2.0
        tool.start_computation()
        tool.wait(60.0)
        assert tool.result is not None and tool.result.curve_fits is None
        assert tool.diagnostics is None
    finally:
        app_mod.KnifeEdgeMeasurement.from_thz_file = orig_loader
        tool._shutdown()


def test_psf_state_poll_auto_recomputes():
    """The web poll is the reference's frame loop: a changed param hash
    with a path set auto-starts a recompute (app.rs:1043-1049)."""
    from thz_image_explorer_tpu.psf_tool import app as app_mod
    from thz_image_explorer_tpu.web import WebApp

    m = _synthetic_knife_edge(n_pos=20)
    orig_loader = app_mod.KnifeEdgeMeasurement.from_thz_file
    app_mod.KnifeEdgeMeasurement.from_thz_file = staticmethod(lambda _p: m)
    app = WebApp()
    try:
        tool = app.psf_tool
        tool.filter_params.n_filters = 3
        tool.filter_params.start_freq = 0.5
        tool.filter_params.end_freq = 2.0
        assert not app.psf_state()["running"]  # no path -> no auto-run
        app.psf_command("set_path", ["x", "synthetic"])
        app.psf_state()  # poll triggers the recompute
        tool.wait(60.0)
        assert tool.result is not None
        n_runs = tool._run_id
        app.psf_state()  # unchanged hash -> no new run
        assert tool._run_id == n_runs
    finally:
        app_mod.KnifeEdgeMeasurement.from_thz_file = orig_loader
        app.psf_tool._shutdown()
        app.worker.close()


def test_filter_param_clamps_to_cuts():
    """v1.3.0: start/end freq constrained by low/high cut
    (app.rs:1201-1226) — enforced at the command seam, not just the UI."""
    from thz_image_explorer_tpu.web import WebApp

    app = WebApp()
    try:
        tool = app.psf_tool
        # raising low_cut above start_freq pushes start_freq to cut+0.01
        app.psf_command("set_filter_param", ["low_cut", 1.0])
        assert tool.filter_params.start_freq == pytest.approx(1.01)
        assert tool.filter_params.end_freq >= 1.01
        # lowering high_cut below end_freq pulls end_freq to cut-0.01
        app.psf_command("set_filter_param", ["high_cut", 3.0])
        assert tool.filter_params.end_freq == pytest.approx(2.99)
        # start_freq itself clamps on direct entry too
        app.psf_command("set_filter_param", ["start_freq", 99.0])
        assert tool.filter_params.start_freq == pytest.approx(3.0)
    finally:
        app.psf_tool._shutdown()
        app.worker.close()


def test_reset_parameters_restores_defaults_keeps_paths():
    """v1.3.0 Reset Parameters (app.rs:316-340): params + results reset,
    measurement paths kept, auto-recompute re-armed, state persisted."""
    from thz_image_explorer_tpu.psf_tool.app import FilterParams, PsfToolApp
    from thz_image_explorer_tpu.web import WebApp

    app = WebApp()
    try:
        tool = app.psf_tool
        app.psf_command("set_path", ["x", "/tmp/somewhere.thz"])
        app.psf_command("set_filter_param", ["n_filters", 7])
        app.psf_command("set_fit_param", ["w_max", 55.0])
        tool.error = "stale error"
        tool._last_params_hash = tool._params_hash()
        app.psf_command("reset_params", [])
        assert tool.filter_params == FilterParams()
        assert tool.fit_params.w_max == PsfToolApp().fit_params.w_max
        assert tool.x_path == "/tmp/somewhere.thz"  # paths survive
        assert tool.error is None and tool.result is None
        assert tool._last_params_hash is None  # trigger re-armed
        # the reset state was persisted (the tool persists by default
        # under the isolated XDG dir the test fixture provides)
        tool2 = PsfToolApp(persist=True)
        assert tool2.filter_params.n_filters == FilterParams().n_filters
        assert tool2.x_path == "/tmp/somewhere.thz"
    finally:
        app.psf_tool._shutdown()
        app.worker.close()
