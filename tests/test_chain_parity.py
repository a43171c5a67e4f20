"""Whole-chain golden parity: every pipeline slot plus the publish payload
against the independent numpy oracle of the complete reference chain
(tests/oracle_chain.py — the ``data_thread.rs:1090-1228`` seam), on a
synthetic scan with every filter active.

This is the end-to-end integration test BASELINE configs 1-3 call for:
scaling -> TD band-pass -> window+FFT -> FD band-pass -> water notch ->
iFFT (avg spectra / ROI traces, both avg-in-Fourier modes) ->
TD band-pass -> deconvolution.
"""

import os

import numpy as np
import pytest

import oracle_chain as oc
from make_sample import synthetic_scan, write_scan_thz
from thz_image_explorer_tpu.assets.water_lines import WATER_LINES_THZ
from thz_image_explorer_tpu.pipeline import Explorer

REF_PSF = "/root/reference/sample_data/psf.npz"

ROI_A = [(2, 2), (18, 2), (18, 16), (2, 16)]
ROI_B = [(20, 20), (30, 22), (26, 30)]
PIXEL = (9, 7)


def _norm_close(got, expected, atol=1e-4, label=""):
    got = np.asarray(got, np.float64)
    expected = np.asarray(expected, np.float64)
    assert got.shape == expected.shape, f"{label}: {got.shape} vs {expected.shape}"
    scale = max(np.abs(expected).max(), 1e-30)
    np.testing.assert_allclose(
        got / scale, expected / scale, atol=atol, err_msg=label
    )


def _build(tmp_path, avg_fourier, fused=True):
    t, cube = synthetic_scan(width=32, height=32, n_time=128, seed=7)
    path = write_scan_thz(str(tmp_path / "scan.thzimg"), t, cube, dx=0.5, dy=0.5)
    ex = Explorer()
    ex.pipeline.fused_mode = fused
    ex.open_file(path)
    ex.set_avg_in_fourier_space(avg_fourier)
    ex.set_selected_pixel(*PIXEL)
    ex.add_roi("u-a", "roi a", ROI_A)
    ex.add_roi("u-b", "roi b", ROI_B)

    p = ex.pipeline
    tdb = p.filters["time_band_pass_before_fft"]
    tdb.active, tdb.low, tdb.high, tdb.window_width = True, 0.6, 5.4, 0.4
    fd = p.filters["frequency_band_pass"]
    fd.active, fd.low, fd.high, fd.window_width = True, 0.3, 3.1, 0.1
    wn = p.filters["water_vapor_notch"]
    wn.active, wn.notch_width, wn.depth = True, 0.03, 0.8
    tda = p.filters["time_band_pass_after_fft"]
    tda.active, tda.low, tda.high, tda.window_width = True, 0.3, 6.0, 0.1
    ex.set_downscaling(2)  # runs the whole chain
    ex.set_reference("roi a")
    ex.set_sample("Selected Pixel")
    ex.set_material_thickness(0.002)
    return ex, t, cube


def _oracle_chain(t, cube, avg_fourier, filters):
    """Compose the oracle exactly as the executor composes the chain."""
    state = {}
    data0 = np.asarray(cube, np.float64)
    state["data"] = data0 - data0[:, :, :1]  # load-time DC offset (io.rs:576)
    nf = len(t) // 2 + 1
    state["fft"] = np.zeros(cube.shape[:2] + (nf,), np.complex128)
    state["amplitudes"] = np.zeros(cube.shape[:2] + (nf,))
    state["phases"] = np.zeros(cube.shape[:2] + (nf,))
    freq = np.arange(nf) / (float(t[-1]) - float(t[0]))  # io.rs:614-621

    slots = {}
    state = oc.oracle_scaling(state, 2)
    slots["scaling"] = dict(state)

    f = filters["time_band_pass_before_fft"]
    state["data"] = oc.oracle_td_bandpass(
        state["data"], t, f["low"], f["high"], f["window_width"]
    )
    slots["time_band_pass_before_fft"] = dict(state)

    windowed, spec, amps, phases = oc.oracle_fft(state["data"], t, 1.0, 7.0)
    state.update(data=windowed, fft=spec, amplitudes=amps, phases=phases)
    slots["fft"] = dict(state)

    f = filters["frequency_band_pass"]
    state["fft"], state["amplitudes"] = oc.oracle_fd_bandpass(
        state["fft"], state["amplitudes"], freq, f["low"], f["high"],
        f["window_width"],
    )
    slots["frequency_band_pass"] = dict(state)

    f = filters["water_vapor_notch"]
    state["fft"], state["amplitudes"] = oc.oracle_water_notch(
        state["fft"], state["amplitudes"], freq, WATER_LINES_THZ,
        f["notch_width"], f["depth"],
    )
    slots["water_vapor_notch"] = dict(state)

    rois = {"u-a": ("roi a", ROI_A), "u-b": ("roi b", ROI_B)}
    state = oc.oracle_ifft(state, rois, avg_fourier, scaling=2)
    slots["ifft"] = dict(state)

    f = filters["time_band_pass_after_fft"]
    state["data"] = oc.oracle_td_bandpass(
        state["data"], t, f["low"], f["high"], f["window_width"]
    )
    slots["time_band_pass_after_fft"] = dict(state)
    return slots, freq


def _filter_params(p):
    out = {}
    for uuid in ("time_band_pass_before_fft", "frequency_band_pass",
                 "water_vapor_notch", "time_band_pass_after_fft"):
        out[uuid] = {
            k: v for k, v in vars(p.filters[uuid]).items()
            if isinstance(v, (int, float))
        }
    return out


@pytest.mark.parametrize("avg_fourier", [False, True])
def test_whole_chain_slots_match_oracle(tmp_path, avg_fourier):
    # exact per-stage mode: every slot is materialized for the golden
    # per-slot comparison (fused mode virtualizes intermediates; its
    # product surfaces are covered by the publish test below)
    ex, t, cube = _build(tmp_path, avg_fourier, fused=False)
    p = ex.pipeline
    slots_exp, freq = _oracle_chain(t, cube, avg_fourier, _filter_params(p))

    for name, exp in slots_exp.items():
        got = p.slots[p.index_of(name)]
        _norm_close(np.asarray(got.data), exp["data"], label=f"{name}.data")
        _norm_close(
            np.abs(np.asarray(got.fft)), np.abs(exp["fft"]),
            label=f"{name}.|fft|",
        )
        _norm_close(
            np.asarray(got.amplitudes), exp["amplitudes"],
            label=f"{name}.amplitudes",
        )
        _norm_close(
            np.asarray(got.phases), exp["phases"], label=f"{name}.phases"
        )

    # ifft-published averages
    got = p.slots[p.index_of("ifft")]
    exp = slots_exp["ifft"]
    _norm_close(np.asarray(got.avg_signal_fft), exp["avg_signal_fft"],
                label="avg_signal_fft")
    _norm_close(np.asarray(got.avg_phase_fft), exp["avg_phase_fft"],
                label="avg_phase_fft")
    _norm_close(np.abs(np.asarray(got.avg_fft)), np.abs(exp["avg_fft"]),
                label="|avg_fft|")
    if avg_fourier:
        _norm_close(np.asarray(got.avg_data), exp["avg_data"], label="avg_data")


@pytest.mark.parametrize("avg_fourier", [False, True])
def test_whole_chain_publish_matches_oracle(tmp_path, avg_fourier):
    ex, t, cube = _build(tmp_path, avg_fourier)
    p = ex.pipeline
    slots_exp, freq = _oracle_chain(t, cube, avg_fourier, _filter_params(p))
    final = slots_exp["time_band_pass_after_fft"]
    ifft_s = slots_exp["ifft"]
    plot = ex.plot

    # raw trace from slot 0 (original grid), spectra from fft_index+1,
    # filtered series from the final slot (data_thread.rs:1336-1488)
    data0 = np.asarray(cube, np.float64)
    data0 = data0 - data0[:, :, :1]
    _norm_close(plot.signal, data0[PIXEL[0], PIXEL[1]], label="signal")
    sx, sy = PIXEL[0] // 2, PIXEL[1] // 2
    raw_fd = slots_exp["frequency_band_pass"]  # fft_index + 1
    _norm_close(plot.signal_fft, raw_fd["amplitudes"][sx, sy], label="signal_fft")
    _norm_close(plot.phase_fft, raw_fd["phases"][sx, sy], label="phase_fft")
    _norm_close(plot.filtered_signal, final["data"][sx, sy],
                label="filtered_signal")
    _norm_close(plot.filtered_signal_fft, final["amplitudes"][sx, sy],
                label="filtered_signal_fft")
    _norm_close(plot.avg_signal_fft, ifft_s["avg_signal_fft"],
                label="pub avg_signal_fft")
    if avg_fourier:
        _norm_close(plot.avg_signal, ifft_s["avg_data"], label="avg_signal")
    else:
        _norm_close(plot.avg_signal, final["data"].mean(axis=(0, 1)),
                    label="avg_signal")

    # ROI traces/spectra (on the final slot, original-grid coords / scaling)
    for uuid in ("u-a", "u-b"):
        _norm_close(plot.roi_signal_fft[uuid][1],
                    oc.roi_average(final["amplitudes"], dict([("u-a", ROI_A), ("u-b", ROI_B)])[uuid], 2),
                    label=f"roi amp {uuid}")
        poly = {"u-a": ROI_A, "u-b": ROI_B}[uuid]
        if avg_fourier:
            amp = oc.roi_average(final["amplitudes"], poly, 2)
            ph = oc.roi_average(final["phases"], poly, 2)
            exp_trace = oc.polar_irfft(amp, ph, len(t))
        else:
            exp_trace = oc.roi_average(final["data"], poly, 2)
        _norm_close(plot.roi_signal[uuid][1], exp_trace, label=f"roi trace {uuid}")

    # intensity image, block-upscaled back to the original grid
    img_small = (final["data"] ** 2).sum(axis=-1)
    img = np.repeat(np.repeat(img_small, 2, axis=0), 2, axis=1)
    _norm_close(ex.image, img, label="image")

    # optical properties: reference = roi a, sample = selected pixel
    ref_amp = oc.roi_average(final["amplitudes"], ROI_A, 2)
    ref_ph = oc.roi_average(final["phases"], ROI_A, 2)
    n, alpha, kappa = oc.oracle_optical(
        freq, final["amplitudes"][sx, sy], final["phases"][sx, sy],
        ref_amp, ref_ph, 0.002,
    )
    # skip the DC bin (division by zero -> inf) like the reference display
    _norm_close(plot.refractive_index[1:], n[1:], label="n")
    _norm_close(plot.absorption_coefficient[1:], alpha[1:], label="alpha")
    _norm_close(plot.extinction_coefficient[1:], kappa[1:], label="kappa")


@pytest.mark.skipif(not os.path.exists(REF_PSF), reason="no fixture")
def test_whole_chain_with_deconvolution_matches_oracle(tmp_path):
    """Extend the composition through the Apply-triggered deconvolution —
    the full BASELINE config-3 seam."""
    from oracle_deconv import deconvolve_oracle
    from thz_image_explorer_tpu.ops.deconvolution import plan_bands

    ex, t, cube = _build(tmp_path, False)
    p = ex.pipeline
    deconv = p.filters["deconvolution"]
    deconv.active = True
    deconv.params.n_iterations = 4
    deconv.params.n_filters = 3
    deconv.params.start_freq = 0.25
    deconv.params.end_freq = 3.0
    ex.open_psf(REF_PSF)
    ex.update_filter("deconvolution", force=True)

    slots_exp, _ = _oracle_chain(t, cube, False, _filter_params(p))
    pre = slots_exp["time_band_pass_after_fft"]["data"].astype(np.float32)
    out_cube = p.slots[p.index_of("deconvolution")]
    geo = plan_bands(
        deconv.params, p.psf, np.asarray(t),
        (pre.shape[0], pre.shape[1]), 1.0, 1.0,  # dx,dy scaled by 2
    )
    assert geo is not None
    expected = deconvolve_oracle(pre, geo)
    _norm_close(np.asarray(out_cube.data), expected, atol=5e-3,
                label="deconvolved cube")


@pytest.mark.skipif(not os.path.exists(REF_PSF), reason="no fixture")
def test_chain_deconvolution_realistic_on_padded_grid(tmp_path):
    """Round-4 task 4: realistic deconvolution geometry (10 bands, 499
    taps, skewed per-band iterations) composed through the PRODUCT path
    on a bucket-padded grid whose valid size (26x22) != padded size
    (32x32) — the crop -> deconvolve -> re-insert seam
    (pipeline/filters.py) oracle-checked, with the padded border asserted
    pass-through (the reference pads reflectively off the TRUE image
    edge, deconvolution.rs:620-712, so padding must never leak in)."""
    from oracle_deconv import deconvolve_oracle
    from thz_image_explorer_tpu.ops.deconvolution import plan_bands

    w, h, n = 26, 22, 128
    t, cube = synthetic_scan(width=w, height=h, n_time=n, seed=3)
    path = write_scan_thz(str(tmp_path / "pad.thzimg"), t, cube, dx=0.5, dy=0.5)
    ex = Explorer()
    ex.open_file(path)
    p = ex.pipeline
    assert p.input.width == 32 and p.input.height == 32  # bucket-padded
    tdb = p.filters["time_band_pass_before_fft"]
    tdb.active, tdb.low, tdb.high, tdb.window_width = True, 0.6, 5.4, 0.4
    fd = p.filters["frequency_band_pass"]
    fd.active, fd.low, fd.high, fd.window_width = True, 0.3, 3.1, 0.1
    wn = p.filters["water_vapor_notch"]
    wn.active, wn.notch_width, wn.depth = True, 0.03, 0.8
    tda = p.filters["time_band_pass_after_fft"]
    tda.active, tda.low, tda.high, tda.window_width = True, 0.3, 6.0, 0.1

    deconv = p.filters["deconvolution"]
    deconv.active = True
    # reference-like iteration scale (round-5 task 7): the per-band count
    # is data-derived from the beam widths (deconvolution.rs:969-971,
    # n_iterations is the MAX); 200 here drives the skew to >=100 on the
    # widest band and >=500 iterations total across the 10 bands
    deconv.params.n_iterations = 200
    deconv.params.n_filters = 10
    deconv.params.start_freq = 0.25
    deconv.params.end_freq = 4.0
    ex.open_psf(REF_PSF)
    ex.update_filter("deconvolution", force=True)

    # oracle chain on the TRUE 26x22 scan (no padding: parity proves the
    # padded product equals the unpadded reference computation)
    freq = np.arange(n // 2 + 1) / (float(t[-1]) - float(t[0]))
    data0 = np.asarray(cube, np.float64)
    state = data0 - data0[:, :, :1]
    state = oc.oracle_td_bandpass(state, t, tdb.low, tdb.high, tdb.window_width)
    windowed, spec, amps, phases = oc.oracle_fft(state, t, 1.0, 7.0)
    spec, amps = oc.oracle_fd_bandpass(spec, amps, freq, fd.low, fd.high,
                                       fd.window_width)
    spec, amps = oc.oracle_water_notch(spec, amps, freq, WATER_LINES_THZ,
                                       wn.notch_width, wn.depth)
    pre = np.fft.irfft(spec, n=n, axis=-1)
    pre = oc.oracle_td_bandpass(pre, t, tda.low, tda.high,
                                tda.window_width).astype(np.float32)

    geo = plan_bands(deconv.params, p.psf, np.asarray(t), (w, h), 0.5, 0.5)
    assert geo is not None
    assert geo.taps.shape == (10, 499)
    assert int(geo.n_iter.min()) < int(geo.n_iter.max())  # skewed iters
    # realistic iteration regime: gain accumulation / fori_loop freeze
    # masks are exercised at reference-like depth, composed through the
    # crop -> deconvolve -> re-insert seam (round-5 task 7)
    assert int(geo.n_iter.sum()) >= 500
    assert int(geo.n_iter.max()) >= 100
    expected = deconvolve_oracle(pre, geo)

    out = np.asarray(p.slots[p.index_of("deconvolution")].data)
    _norm_close(out[:w, :h], expected, atol=5e-3, label="deconvolved valid")
    # padded border: pass-through of the (exactly zero) padded pixels
    assert np.all(out[w:, :, :] == 0.0)
    assert np.all(out[:, h:, :] == 0.0)
