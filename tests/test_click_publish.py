"""Publish-only pixel clicks in lean mode (round-5 task 6).

The reference's ``SetSelectedPixel`` is a Plot-only update that
recomputes nothing (``data_thread.rs:853-903``). The lean executor used
to re-dispatch the whole merged chain+publish program on every
pub-epoch change; now a view-only change (pixel, optical selection,
thickness) runs the gather-sized one-pixel program
(``executor._build_click``) over the materialized raw/final slots and
the cached ROI means. These tests pin:

* the fast path is USED (``click_dispatches`` counts it) and its values
  match the exact per-stage chain for every published pixel/optical key;
* ROI-geometry changes still take the full lean re-dispatch;
* chains the one-pixel program cannot reproduce (tilt: per-pixel
  ``fused_apply``; deconvolution: cross-pixel coupling) fall back to
  the full re-dispatch with identical results.
"""

import numpy as np

from thz_image_explorer_tpu.pipeline import Explorer

from make_sample import synthetic_scan, write_scan_thz

PIX_KEYS = (
    "signal", "signal_fft", "phase_fft", "filtered_signal",
    "filtered_signal_fft", "filtered_phase_fft",
)


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


def _close_pix(a, b, atol=2e-4, rtol=2e-4):
    for k in PIX_KEYS:
        np.testing.assert_allclose(
            getattr(a.plot, k), getattr(b.plot, k),
            atol=atol, rtol=rtol, err_msg=k,
        )


def test_pixel_click_uses_fast_path_and_matches_exact(tmp_path):
    lean, exact = _pair(tmp_path)
    assert lean.pipeline.click_dispatches == 0
    for ex in (lean, exact):
        ex.set_selected_pixel(7, 4)
    assert lean.pipeline.click_dispatches == 1
    _close_pix(lean, exact)
    for ex in (lean, exact):
        ex.set_selected_pixel(2, 9)
    assert lean.pipeline.click_dispatches == 2
    _close_pix(lean, exact)
    # the merged program was never rebuilt for a click
    assert len(lean.pipeline._fused_cache) == 1


def test_click_with_all_weightable_filters_active(tmp_path):
    """TD before/after + FD band-pass + water notch: the full weightable
    set the lean fold path covers — click parity must hold with every
    weight live."""
    lean, exact = _pair(tmp_path)
    for ex in (lean, exact):
        for uuid in ("time_band_pass_before_fft", "frequency_band_pass",
                     "water_vapor_notch", "time_band_pass_after_fft"):
            ex.set_filter_active(uuid, True)
    before = lean.pipeline.click_dispatches
    for ex in (lean, exact):
        ex.set_selected_pixel(9, 6)
    assert lean.pipeline.click_dispatches == before + 1
    _close_pix(lean, exact)


def test_click_with_downscaling(tmp_path):
    """scale_factor=2: the one-pixel program reproduces the block mean
    (including the zeroed mixed valid/pad boundary rule) before the
    windowed DFT."""
    lean, exact = _pair(tmp_path, width=16, height=12)
    for ex in (lean, exact):
        ex.set_downscaling(2)
    before = lean.pipeline.click_dispatches
    for ex in (lean, exact):
        ex.set_selected_pixel(9, 6)
    assert lean.pipeline.click_dispatches == before + 1
    _close_pix(lean, exact)
    for ex in (lean, exact):
        ex.set_selected_pixel(15, 11)  # clamps into the scaled grid
    _close_pix(lean, exact)


def test_optical_change_uses_fast_path(tmp_path):
    """Thickness / selection changes are view-only: optical curves come
    from the cached ROI means + the one-pixel spectrum."""
    lean, exact = _pair(tmp_path)
    poly = [(0, 0), (10, 0), (10, 8), (0, 8)]
    for ex in (lean, exact):
        ex.add_roi("u1", "ref-roi", poly)
        ex.set_selected_pixel(5, 5)
        ex.set_reference("ref-roi")
        ex.set_sample("Selected Pixel")
        ex.set_material_thickness(2.0)
    n_click = lean.pipeline.click_dispatches
    assert n_click >= 1
    for name in ("refractive_index", "absorption_coefficient",
                 "extinction_coefficient"):
        np.testing.assert_allclose(
            getattr(lean.plot, name)[1:], getattr(exact.plot, name)[1:],
            atol=1e-3, rtol=1e-3, err_msg=name,
        )
    for ex in (lean, exact):
        ex.set_material_thickness(3.5)
    assert lean.pipeline.click_dispatches == n_click + 1
    np.testing.assert_allclose(
        lean.plot.refractive_index[1:], exact.plot.refractive_index[1:],
        atol=1e-3, rtol=1e-3,
    )


def test_roi_change_forces_full_redispatch(tmp_path):
    """ROI geometry feeds the masked reductions over in-program
    spectral temporaries — adding/deleting one must NOT be served by
    the one-pixel program."""
    lean, exact = _pair(tmp_path)
    for ex in (lean, exact):
        ex.set_selected_pixel(3, 3)
    n_click = lean.pipeline.click_dispatches
    poly = [(1, 1), (9, 1), (9, 7), (1, 7)]
    for ex in (lean, exact):
        ex.add_roi("u1", "roi-a", poly)
    assert lean.pipeline.click_dispatches == n_click
    np.testing.assert_allclose(
        lean.plot.roi_signal["u1"][1], exact.plot.roi_signal["u1"][1],
        atol=2e-4, rtol=1e-4,
    )
    # and the NEXT pixel click (ROI unchanged) is fast again, with the
    # cached ROI means still feeding the optical block
    for ex in (lean, exact):
        ex.set_selected_pixel(8, 2)
    assert lean.pipeline.click_dispatches == n_click + 1
    _close_pix(lean, exact)


def test_tilt_blocks_fast_path_but_parity_holds(tmp_path):
    """An active tilt stage shifts each pixel individually inside
    ``fused_apply`` — not reproducible at one pixel, so clicks fall
    back to the full lean re-dispatch (still correct, just not fast)."""
    lean, exact = _pair(tmp_path)
    for ex in (lean, exact):
        ex.set_filter_param("tilt_compensation", "tilt_x", 2.0)
        ex.set_filter_active("tilt_compensation", True)
    before = lean.pipeline.click_dispatches
    for ex in (lean, exact):
        ex.set_selected_pixel(6, 3)
    assert lean.pipeline.click_dispatches == before
    _close_pix(lean, exact, atol=5e-4, rtol=5e-4)


def test_click_survives_chain_param_change(tmp_path):
    """A window-slider move re-dispatches the full chain (new weights);
    the following click must use the NEW stage params, not a stale
    closure."""
    lean, exact = _pair(tmp_path)
    for ex in (lean, exact):
        ex.set_selected_pixel(4, 4)
    for ex in (lean, exact):
        ex.set_fft_window_low(1.8)
    for ex in (lean, exact):
        ex.set_selected_pixel(10, 7)
    _close_pix(lean, exact)


def test_click_with_fold_kill_switch(tmp_path, monkeypatch):
    """THZ_FOLD_FD=0 (cube-sized mask passes instead of folded DFT
    weights): the one-pixel program's factored weights still reproduce
    the chain's per-pixel mask products exactly."""
    monkeypatch.setenv("THZ_FOLD_FD", "0")
    lean, exact = _pair(tmp_path)
    for ex in (lean, exact):
        ex.set_filter_active("frequency_band_pass", True)
    before = lean.pipeline.click_dispatches
    for ex in (lean, exact):
        ex.set_selected_pixel(6, 8)
    assert lean.pipeline.click_dispatches == before + 1
    _close_pix(lean, exact)


def test_click_under_forced_specred_kernel(tmp_path, monkeypatch):
    """THZ_SPECRED=1 (the one-pass pallas reduction supplies the cached
    ROI/avg means): a later pixel click must compose correctly with the
    kernel-produced cached outputs."""
    monkeypatch.setenv("THZ_SPECRED", "1")
    monkeypatch.setenv("THZ_PALLAS_INTERPRET", "1")
    from thz_image_explorer_tpu.ops import pallas_specred as psr
    monkeypatch.setattr(psr, "_RUNTIME_BROKEN", [False])

    lean, exact = _pair(tmp_path)
    for ex in (lean, exact):
        ex.set_filter_active("frequency_band_pass", True)
        ex.add_roi("u1", "roi-a", [(1, 1), (9, 1), (9, 7), (1, 7)])
        ex.set_reference("roi-a")
        ex.set_sample("Selected Pixel")
    before = lean.pipeline.click_dispatches
    for ex in (lean, exact):
        ex.set_selected_pixel(7, 5)
    assert lean.pipeline.click_dispatches == before + 1
    _close_pix(lean, exact, atol=5e-4, rtol=5e-4)
    import numpy as np
    np.testing.assert_allclose(
        lean.plot.refractive_index[1:], exact.plot.refractive_index[1:],
        atol=1e-3, rtol=1e-3,
    )
