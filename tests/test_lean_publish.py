"""Merged lean chain+publish program (round-4 task 1).

The interactive default: the fused chain program computes the publish
reductions in-program and drops the final slot's spectral cubes. These
tests pin its product behavior against the exact per-stage chain + the
standalone gather program (``THZ_FUSED_EXEC=0``), including the
re-dispatch path for pixel clicks / ROI edits / optical changes and the
``THZ_LEAN_PUBLISH=0`` kill switch.
"""

import numpy as np
import pytest

from thz_image_explorer_tpu.pipeline import Explorer

from make_sample import synthetic_scan, write_scan_thz


def _scan(tmp_path, name="s.thzimg", **kw):
    kw.setdefault("width", 14)
    kw.setdefault("height", 11)
    kw.setdefault("n_time", 96)
    t, cube = synthetic_scan(**kw)
    return write_scan_thz(str(tmp_path / name), t, cube, dx=0.5, dy=0.5)


def _pair(tmp_path, **kw):
    path = _scan(tmp_path, **kw)
    lean = Explorer()
    lean.open_file(path)
    exact = Explorer()
    exact.pipeline.fused_mode = False
    exact.open_file(path)
    return lean, exact


_KEYS = (
    "signal", "signal_fft", "phase_fft", "filtered_signal",
    "filtered_signal_fft", "filtered_phase_fft", "avg_signal",
    "avg_signal_fft", "avg_phase_fft",
)


def _close(a, b, atol=2e-4):
    for k in _KEYS:
        np.testing.assert_allclose(
            getattr(a.plot, k), getattr(b.plot, k),
            atol=atol, rtol=1e-4, err_msg=k,
        )


def test_lean_is_the_interactive_default(tmp_path):
    lean, _ = _pair(tmp_path)
    out = lean.pipeline.output
    assert out.amplitudes is None and out.fft is None and out.phases is None
    assert out.data is not None
    assert lean.pipeline._pub_out is not None


def test_pixel_click_redispatch_matches_exact(tmp_path):
    """A pixel click changes the pub epoch only; publish re-dispatches the
    cached merged program and the new slices match the exact path."""
    lean, exact = _pair(tmp_path)
    for ex in (lean, exact):
        ex.set_selected_pixel(7, 4)
    _close(lean, exact)
    # no recompile happened: the re-dispatch reuses the cached program
    assert len(lean.pipeline._fused_cache) == 1
    for ex in (lean, exact):
        ex.set_selected_pixel(2, 9)
    _close(lean, exact)
    assert len(lean.pipeline._fused_cache) == 1


def test_roi_add_and_delete_matches_exact(tmp_path):
    lean, exact = _pair(tmp_path)
    poly = [(1, 1), (9, 1), (9, 7), (1, 7)]
    for ex in (lean, exact):
        ex.add_roi("u1", "roi-a", poly)
    for u in ("u1",):
        np.testing.assert_allclose(
            lean.plot.roi_signal[u][1], exact.plot.roi_signal[u][1],
            atol=2e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            lean.plot.roi_signal_fft[u][1], exact.plot.roi_signal_fft[u][1],
            atol=2e-4, rtol=1e-4,
        )
    for ex in (lean, exact):
        ex.delete_roi("u1")
    assert "u1" not in lean.plot.roi_signal
    _close(lean, exact)


def test_optical_roi_and_pixel_matches_exact(tmp_path):
    lean, exact = _pair(tmp_path)
    poly = [(0, 0), (10, 0), (10, 8), (0, 8)]
    for ex in (lean, exact):
        ex.add_roi("u1", "ref-roi", poly)
        ex.set_selected_pixel(5, 5)
        ex.set_reference("ref-roi")
        ex.set_sample("Selected Pixel")
        ex.set_material_thickness(2.0)
    assert len(lean.plot.refractive_index) > 0
    # skip the DC bin (inf in both) and compare the finite range
    np.testing.assert_allclose(
        lean.plot.refractive_index[1:], exact.plot.refractive_index[1:],
        atol=1e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        lean.plot.extinction_coefficient[1:],
        exact.plot.extinction_coefficient[1:],
        atol=1e-3, rtol=1e-3,
    )


def test_optical_pseudo_reference_matches_exact(tmp_path):
    """A loaded reference pulse (pseudo-ROI) as the optical reference."""
    from make_sample import write_pulse_thz

    path = _scan(tmp_path)
    t, cube = synthetic_scan(width=14, height=11, n_time=96)
    pulse_path = str(tmp_path / "ref.thz")
    write_pulse_thz(pulse_path, t, cube[3, 3])

    def build(fused):
        ex = Explorer()
        ex.pipeline.fused_mode = fused
        ex.open_file(path)
        ex.open_ref(pulse_path)
        ex.set_selected_pixel(6, 6)
        ex.set_reference("Reference File")
        ex.set_sample("Selected Pixel")
        return ex

    lean, exact = build(True), build(False)
    assert len(lean.plot.refractive_index) > 0
    np.testing.assert_allclose(
        lean.plot.refractive_index[1:], exact.plot.refractive_index[1:],
        atol=1e-3, rtol=1e-3,
    )


def test_lean_kill_switch(tmp_path, monkeypatch):
    """THZ_LEAN_PUBLISH=0 restores round-3 behavior: full final cube,
    raw-spectrum partial view, standalone publish — values unchanged."""
    monkeypatch.setenv("THZ_LEAN_PUBLISH", "0")
    off = Explorer()
    path = _scan(tmp_path)
    off.open_file(path)
    out = off.pipeline.output
    assert out.amplitudes is not None and out.fft is not None
    assert off.pipeline.raw_fd_view() is not None
    monkeypatch.delenv("THZ_LEAN_PUBLISH")
    on = Explorer()
    on.open_file(path)
    assert on.pipeline.output.amplitudes is None
    _close(on, off, atol=1e-5)


def test_lean_after_exact_apply_roundtrip(tmp_path):
    """Apply (exact, force) materializes full slots and the standalone
    publish takes over; the next slider drag returns to the lean path.
    Published values agree across the whole sequence."""
    lean, exact = _pair(tmp_path)
    for ex in (lean, exact):
        ex.pipeline.filters["frequency_band_pass"].active = True
        ex.update_filters()  # Calculate All: exact in both
    assert lean.pipeline.output.amplitudes is not None  # exact pass
    _close(lean, exact, atol=1e-5)
    for ex in (lean, exact):
        ex.set_fft_window_low(1.5)  # interactive: lean again
    assert lean.pipeline.output.amplitudes is None
    _close(lean, exact)


def test_materialize_output_matches_exact(tmp_path):
    lean, exact = _pair(tmp_path)
    mat = lean.pipeline.materialize_output()
    assert mat.amplitudes is not None
    np.testing.assert_allclose(
        np.asarray(mat.amplitudes),
        np.asarray(exact.pipeline.output.amplitudes),
        atol=1e-5, rtol=1e-5,
    )
    # materialization is an inspection seam: the NEXT interactive run
    # returns to the lean program
    lean.set_fft_window_low(1.2)
    assert lean.pipeline.output.amplitudes is None


def test_bench_lean_update_matches_full_step():
    """The benchmark's lean step (parallel/step.lean_update) returns the
    same values the full step's cube implies — the headline metric
    measures the product-shaped program, not a stripped one."""
    import jax.numpy as jnp

    from thz_image_explorer_tpu.data import make_cube, masked_pixel_mean
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig, StepParams, interactive_update, lean_update,
    )

    t, cube_np = synthetic_scan(width=10, height=8, n_time=64)
    cube = make_cube(t, cube_np, dx=0.5, dy=0.5)
    params = StepParams.defaults()
    cfg = StepConfig(fd_active=True, notch_active=True)
    masks = np.zeros((4, 10, 8), np.float32)
    masks[0, 2:6, 2:6] = 1.0
    pix = jnp.asarray([3, 4], jnp.int32)
    out = lean_update(cube, params, cfg, jnp.asarray(masks), pix)
    full, img = interactive_update(cube, params, cfg)
    np.testing.assert_allclose(
        np.asarray(out["img"]), np.asarray(img), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["data"]), np.asarray(full.data), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["pix_amp"]), np.asarray(full.amplitudes[3, 4]),
        rtol=1e-5, atol=1e-5,
    )
    m = masks[0].astype(bool)
    np.testing.assert_allclose(
        np.asarray(out["roi_amp"][0]),
        np.asarray(full.amplitudes)[m].mean(axis=0),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["avg_signal"]),
        np.asarray(full.data).mean(axis=(0, 1)),
        rtol=1e-5, atol=1e-6,
    )


def test_lean_phases_toggle_equivalent(monkeypatch):
    """THZ_LEAN_PHASES=0 (cube-wide unwrap inside the lean program) and
    =1 (phase-increments encoding, cumsum after the reductions) must
    publish identical phase values — the env var is an A/B switch for
    timing, never for results; it is resolved per call, so a mid-process
    toggle really selects the other variant."""
    import jax.numpy as jnp

    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig, StepParams, lean_update,
    )

    t, cube_np = synthetic_scan(width=10, height=8, n_time=64)
    cube = make_cube(t, cube_np, dx=0.5, dy=0.5)
    params = StepParams.defaults()
    cfg = StepConfig(fd_active=True, notch_active=True)
    masks = np.zeros((4, 10, 8), np.float32)
    masks[0, 2:6, 2:6] = 1.0
    pix = jnp.asarray([3, 4], jnp.int32)

    monkeypatch.setenv("THZ_LEAN_PHASES", "1")
    enc = lean_update(cube, params, cfg, jnp.asarray(masks), pix)
    monkeypatch.setenv("THZ_LEAN_PHASES", "0")
    raw = lean_update(cube, params, cfg, jnp.asarray(masks), pix)
    for k in ("avg_ph", "roi_ph", "pix_ph", "img", "data"):
        np.testing.assert_allclose(
            np.asarray(enc[k]), np.asarray(raw[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )


def test_fold_fd_toggle_equivalent(monkeypatch):
    """THZ_FOLD_FD=1 (FD weights folded into the irfft matrix + weighted
    means, masked spectrum never materialized) and =0 (cube-sized mask
    passes) must publish identical values for EVERY lean output — the
    fold is a traffic optimization, never a semantics change."""
    import jax.numpy as jnp

    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig, StepParams, lean_update,
    )

    import dataclasses

    t, cube_np = synthetic_scan(width=10, height=8, n_time=64)
    cube = make_cube(t, cube_np, dx=0.5, dy=0.5)
    # non-trivial TD bounds so the TD-fold configs mask real samples
    params = dataclasses.replace(
        StepParams.defaults(),
        td_before_low=np.float32(float(t[5])),
        td_before_high=np.float32(float(t[-8])),
        td_after_low=np.float32(float(t[3])),
        td_after_high=np.float32(float(t[-12])),
    )
    masks = np.zeros((4, 10, 8), np.float32)
    masks[0, 2:6, 2:6] = 1.0
    pix = jnp.asarray([3, 4], jnp.int32)

    # notch depth < 1 + avg-in-fourier exercise the weighted polar
    # reconstruction and a non-binary weight vector; the TD-active
    # configs exercise the forward-matrix (before) and inverse-matrix
    # column (after) folds
    for cfg in (
        StepConfig(fd_active=True, notch_active=True),
        StepConfig(fd_active=True, avg_in_fourier_space=True),
        StepConfig(notch_active=True),
        StepConfig(fd_active=True, notch_active=True,
                   td_before_active=True, td_after_active=True),
        StepConfig(td_before_active=True, td_after_active=True),
    ):
        monkeypatch.setenv("THZ_FOLD_FD", "1")
        fold = lean_update(cube, params, cfg, jnp.asarray(masks), pix)
        monkeypatch.setenv("THZ_FOLD_FD", "0")
        mask = lean_update(cube, params, cfg, jnp.asarray(masks), pix)
        assert set(fold) == set(mask)
        for k in fold:
            np.testing.assert_allclose(
                np.asarray(fold[k]), np.asarray(mask[k]),
                rtol=1e-5, atol=1e-5, err_msg=f"{cfg} {k}",
            )


def test_fold_fd_executor_matches_exact(tmp_path, monkeypatch):
    """The PRODUCT lean program with the FD fold on equals the exact
    per-stage chain — including the raw-spectrum display slot
    (fft_index+1), whose first FD stage's mask pass is folded away and
    must be reconstructed lazily."""
    path = _scan(tmp_path)
    monkeypatch.setenv("THZ_FOLD_FD", "1")
    lean = Explorer()
    lean.open_file(path)
    exact = Explorer()
    exact.pipeline.fused_mode = False
    exact.open_file(path)
    for ex in (lean, exact):
        f = ex.pipeline.filters["frequency_band_pass"]
        f.active = True
        f.low, f.high = 0.3, 2.5
        ex.pipeline.filters["water_vapor_notch"].active = True
        # TD stages too: the forward-matrix and inverse-column folds
        tb = ex.pipeline.filters["time_band_pass_before_fft"]
        tb.active = True
        tb.low, tb.high = 0.3, 4.0
        ta = ex.pipeline.filters["time_band_pass_after_fft"]
        ta.active = True
        ta.low, ta.high = 0.2, 4.2
        # trigger from the EARLIEST activated stage: exact mode
        # recomputes incrementally from the trigger index, so updating a
        # later stage would legitimately leave td-before's slot stale
        ex.update_filter("time_band_pass_before_fft", force=True)
    _close(lean, exact)
    # the raw-spectrum display (slot fft_index+1 = the FD stage's output)
    np.testing.assert_allclose(
        lean.plot.signal_fft, exact.plot.signal_fft, atol=2e-4, rtol=1e-4
    )
    # and the fold really was active (an FD stage is on, lean mode)
    assert any(k[-3] for k in lean.pipeline._fused_cache)  # fold_ok in key


def test_wide_spec_toggle_equivalent(monkeypatch):
    """THZ_WIDE_SPEC=1 (spectrum carried in the WIDE (X, Y, 2m)
    [real | imag] matmul layout, complex cube never assembled) and =0
    (complex64 spectrum) must publish identical values for EVERY lean
    output — the layout is a traffic optimization, never a semantics
    change. Forced onto the matmul-DFT path so CPU tests exercise the
    TPU default."""
    import dataclasses

    import jax.numpy as jnp

    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig, StepParams, lean_update, _resolve_cfg,
    )

    monkeypatch.setenv("THZ_FFT_IMPL", "matmul")
    t, cube_np = synthetic_scan(width=10, height=8, n_time=64)
    cube = make_cube(t, cube_np, dx=0.5, dy=0.5)
    params = dataclasses.replace(
        StepParams.defaults(),
        td_before_low=np.float32(float(t[5])),
        td_after_high=np.float32(float(t[-12])),
    )
    masks = np.zeros((4, 10, 8), np.float32)
    masks[0, 2:6, 2:6] = 1.0
    pix = jnp.asarray([3, 4], jnp.int32)

    for cfg in (
        StepConfig(fd_active=True, notch_active=True),
        StepConfig(fd_active=True, avg_in_fourier_space=True),
        StepConfig(td_before_active=True, td_after_active=True),
        StepConfig(),  # no active FD stage: wide still valid under fold
    ):
        monkeypatch.setenv("THZ_WIDE_SPEC", "1")
        # the dispatch really selects the wide layout for this config
        assert _resolve_cfg(cube, cfg, jnp.asarray(masks)).wide_spec
        wide = lean_update(cube, params, cfg, jnp.asarray(masks), pix)
        monkeypatch.setenv("THZ_WIDE_SPEC", "0")
        assert not _resolve_cfg(cube, cfg, jnp.asarray(masks)).wide_spec
        cplx = lean_update(cube, params, cfg, jnp.asarray(masks), pix)
        assert set(wide) == set(cplx)
        for k in wide:
            np.testing.assert_allclose(
                np.asarray(wide[k]), np.asarray(cplx[k]),
                rtol=1e-5, atol=1e-5, err_msg=f"{cfg} {k}",
            )


def test_wide_spec_executor_matches_exact(tmp_path, monkeypatch):
    """The PRODUCT lean program with the wide spectrum layout equals the
    exact per-stage chain (complex spectra, per-stage materialization) —
    the executor-side twin of test_wide_spec_toggle_equivalent."""
    path = _scan(tmp_path)
    monkeypatch.setenv("THZ_FFT_IMPL", "matmul")
    monkeypatch.setenv("THZ_WIDE_SPEC", "1")
    lean = Explorer()
    lean.open_file(path)
    exact = Explorer()
    exact.pipeline.fused_mode = False
    exact.open_file(path)
    for ex in (lean, exact):
        f = ex.pipeline.filters["frequency_band_pass"]
        f.active = True
        f.low, f.high = 0.3, 2.5
        ex.pipeline.filters["water_vapor_notch"].active = True
        ex.add_roi("u1", "r1", [(1, 1), (7, 1), (7, 6)])
        ex.update_filter("frequency_band_pass", force=True)
    _close(lean, exact)
    np.testing.assert_allclose(
        lean.plot.signal_fft, exact.plot.signal_fft, atol=2e-4, rtol=1e-4
    )
    # the wide layout really engaged (wide_ok is key[-2])
    assert any(k[-2] for k in lean.pipeline._fused_cache)
    # ROI spectra (reduced from the wide layout) match too
    (la,) = [v for _, v in lean.plot.roi_signal_fft.items()]
    (ea,) = [v for _, v in exact.plot.roi_signal_fft.items()]
    np.testing.assert_allclose(
        np.asarray(la[1]), np.asarray(ea[1]), atol=2e-4, rtol=1e-4
    )
