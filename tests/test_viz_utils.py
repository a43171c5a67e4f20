"""Tests for viz (colormap, plot math, voxel extraction) and utils
(settings persistence, log buffer)."""

import logging

import numpy as np
import jax.numpy as jnp

from thz_image_explorer_tpu.viz import (
    color_from_intensity,
    dynamic_range_db,
    fft_plot_series,
    intensity_image_rgba,
    peak_to_peak,
    stacked_pulse_series,
)
from thz_image_explorer_tpu.ops.voxel import (
    extract_instances,
    gaussian_kernel1d,
    jet_colormap,
    voxel_opacities,
)
from thz_image_explorer_tpu.utils import (
    LogRingBuffer,
    PsfToolState,
    Settings,
)


# ------------------------------------------------------- colormap (the
# reference's own tests: math_tools.rs:711-754)
def test_colormap_bw_grayscale():
    rgb = color_from_intensity(50.0, 100.0, (10.0, 90.0), 50.0, bw=True)
    assert rgb[0] == rgb[1] == rgb[2]


def test_colormap_cold_is_blue():
    rgb = color_from_intensity(0.0, 100.0, (0.0, 100.0), 50.0, bw=False)
    # hue > 0.5 -> blue channel dominates red
    assert rgb[2] > rgb[0]


def test_colormap_hot_is_red():
    rgb = color_from_intensity(100.0, 100.0, (0.0, 100.0), 50.0, bw=False)
    assert rgb[0] > rgb[2] and rgb[0] > 0.99


def test_intensity_image_rgba_orientation():
    """Reference on-screen layout: screen[(r, c)] = data[(r, c)] — the
    texture swap (matrix_plot.rs:405-426) and the plot's y-up axis cancel,
    so the hottest data pixel (x, y) lights canvas row x, column y."""
    img = np.zeros((4, 3))
    img[3, 0] = 1.0  # hottest pixel at (x=3, y=0)
    rgba = intensity_image_rgba(img)
    assert rgba.shape == (4, 3, 4)
    assert rgba[3, 0, 0] == 255  # red at row 3, column 0
    # every other pixel is cold (blue-ish), i.e. no transpose/flip applied
    assert (rgba[:3, :, 0] < 255).all() and (rgba[3, 1:, 0] < 255).all()


# ------------------------------------------------------- plot math
def test_stacked_pulse_series_offsets():
    sigs = {"a": np.array([-2.0, 1.0]), "b": np.array([-1.0, 3.0])}
    shifted, offset = stacked_pulse_series(sigs)
    np.testing.assert_allclose(offset, 2.1)
    np.testing.assert_allclose(shifted["a"], [0.1, 3.1])


def test_fft_plot_floor():
    amp = np.array([10.0, 1.0, 0.001])
    out = fft_plot_series(amp, log_plot=True)
    floor = 0.001 / 5.0
    np.testing.assert_allclose(out[0], 20.0)
    np.testing.assert_allclose(out[2], 20 * np.log10(0.001))
    # values below the floor clamp to the floor
    amp2 = np.array([10.0, 1.0, 0.001, 0.00001])
    out2 = fft_plot_series(amp2, reference_amplitudes=amp, log_plot=True)
    np.testing.assert_allclose(out2[3], 20 * np.log10(floor))
    # an exact-zero bin under a zero floor is -inf like the reference's
    # log10 (center_panel.rs:224-231); web.py maps it to null for JSON
    out3 = fft_plot_series(np.array([1.0, 0.0]), log_plot=True)
    assert out3[1] == -np.inf and out3[0] == 0.0


def test_dr_and_ptp():
    amp = np.concatenate([np.full(50, 100.0), np.full(150, 0.1)])
    dr = dynamic_range_db(amp)
    assert dr < 0  # noise floor below peak
    assert peak_to_peak(np.array([-1.5, 2.5])) == 4.0
    assert peak_to_peak(np.array([])) == 0.0


# ------------------------------------------------------- voxel extraction
def test_gaussian_kernel_normalized():
    k = gaussian_kernel1d(3.0, 9)
    assert len(k) == 19
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(k, k[::-1])


def test_jet_colormap_ends():
    rgb = jet_colormap(np.array([0.0, 0.5, 1.0]))
    assert rgb[0, 2] == 1.0 and rgb[0, 0] == 0.0  # cold -> blue
    assert rgb[2, 0] == 1.0 and rgb[2, 2] == 0.0  # hot -> red


def test_voxel_opacities_normalization_and_threshold():
    rng = np.random.default_rng(0)
    data = np.zeros((4, 4, 64), np.float32)
    data[1, 1, 30] = 5.0  # a strong voxel line
    data += 0.0001 * rng.normal(size=data.shape).astype(np.float32)
    kernel = jnp.asarray(gaussian_kernel1d(3.0, 9))
    opac, thr = voxel_opacities(
        jnp.asarray(data), kernel, jnp.float32(2.0), jnp.float32(0.1), 9
    )
    opac = np.asarray(opac)
    assert float(thr) == 0.0  # under the 2M cap
    # the strong line is normalized to max 1; weak lines zeroed
    assert abs(opac[1, 1].max() - 1.0) < 1e-6
    assert opac[0, 0].max() == 0.0


def test_extract_instances_geometry():
    data = np.zeros((4, 4, 32), np.float32)
    data[2, 1, 16] = 3.0
    pos, rgba, cw, ch, cd, thr = extract_instances(
        jnp.asarray(data), time_span=10.0, scaling=1, original_dims=(4, 4, 32)
    )
    assert pos.shape[0] == rgba.shape[0] > 0
    assert cw == 0.25 and ch == 0.25
    # opacity column in [0, 1]
    assert (rgba[:, 3] >= 0).all() and (rgba[:, 3] <= 1).all()


def test_extract_instances_topk_matches_dense(monkeypatch):
    """The single-transfer top-k view path (round-4: one round-trip voxel
    fetch) must select the brightest voxels of the dense extraction with
    identical geometry and colors. Pinned to the unpacked (f16 + i32)
    fetch — the packed u32 variant trades alpha to 6 bits and has its own
    parity test below."""
    from thz_image_explorer_tpu.ops.voxel import extract_instances_topk

    monkeypatch.setenv("THZ_VOXEL_PACKED", "0")
    rng = np.random.default_rng(1)
    data = (0.1 * rng.normal(size=(8, 6, 64))).astype(np.float32)
    data[2, 1, 20] = 4.0
    data[5, 3, 40] = 3.0
    kw = dict(time_span=10.0, scaling=1, original_dims=(8, 6, 64))
    pos_d, rgba_d, cw, ch, cd, thr_d = extract_instances(
        jnp.asarray(data), **kw
    )
    k = 25
    pos_t, rgba_t, cw2, ch2, cd2, thr_t = extract_instances_topk(
        jnp.asarray(data), max_points=k, **kw
    )
    assert (cw, ch, cd) == (cw2, ch2, cd2)
    assert 0 < len(pos_t) <= k
    # the top-k picks are the k largest POSITIVE opacities of the dense set
    dense = {tuple(np.round(p, 5)): o for p, o in zip(pos_d, rgba_d[:, 3])}
    opac_sorted = np.sort([o for o in dense.values() if o > 0])[::-1]
    floor = opac_sorted[min(k, len(opac_sorted)) - 1]
    # the view's cap threshold is the k-th largest opacity (the
    # reference's select_nth_unstable cap semantics applied at N=k);
    # values travel as f16, hence the tolerance
    np.testing.assert_allclose(thr_t, floor, rtol=2e-3, atol=1e-3)
    for p, o in zip(pos_t, rgba_t[:, 3]):
        key = tuple(np.round(p, 5))
        assert key in dense
        np.testing.assert_allclose(dense[key], o, rtol=2e-3, atol=1e-3)
        assert o >= floor - 1e-3


def test_extract_instances_topk_packed_matches_unpacked(monkeypatch):
    """The packed u32 fetch (idx<<6 | 6-bit alpha, 4 B/point on the wire
    instead of 6) must pick the same voxels at the same positions, with
    alpha within its 1/63 quantization step of the f16 path."""
    from thz_image_explorer_tpu.ops.voxel import extract_instances_topk

    rng = np.random.default_rng(7)
    data = (0.1 * rng.normal(size=(8, 6, 64))).astype(np.float32)
    data[2, 1, 20] = 4.0
    data[5, 3, 40] = 3.0
    kw = dict(
        time_span=10.0, scaling=1, original_dims=(8, 6, 64), max_points=25
    )
    monkeypatch.setenv("THZ_VOXEL_PACKED", "0")
    pos_u, rgba_u, *_, thr_u = extract_instances_topk(jnp.asarray(data), **kw)
    monkeypatch.setenv("THZ_VOXEL_PACKED", "1")
    pos_p, rgba_p, *_, thr_p = extract_instances_topk(jnp.asarray(data), **kw)

    np.testing.assert_allclose(thr_p, thr_u, rtol=2e-3, atol=1e-3)
    un = {tuple(np.round(p, 5)): a for p, a in zip(pos_u, rgba_u[:, 3])}
    assert len(pos_p) > 0
    # quantized keep-mask may drop points whose alpha rounds below the
    # quantized threshold — never add ones the unpacked path lacks
    assert len(pos_p) <= len(pos_u)
    for p, a in zip(pos_p, rgba_p[:, 3]):
        key = tuple(np.round(p, 5))
        assert key in un
        assert abs(un[key] - a) <= 1.0 / 63.0 + 1e-3


def test_extract_instances_topk_valid_grid():
    """Padded-border voxels never leak into the view."""
    from thz_image_explorer_tpu.ops.voxel import extract_instances_topk

    data = np.zeros((8, 8, 32), np.float32)
    data[1, 1, 10] = 2.0
    data[6, 6, 12] = 5.0  # in the padded border
    pos, rgba, *_ = extract_instances_topk(
        jnp.asarray(data), time_span=10.0, scaling=1,
        original_dims=(4, 4, 32), max_points=50, valid_grid=(4, 4),
    )
    assert len(pos) > 0
    # spacing from the 4x4 valid grid: all positions within its extent
    assert np.abs(pos[:, 0]).max() <= 4 * 0.25 / 2 + 1e-6
    assert np.abs(pos[:, 1]).max() <= 4 * 0.25 / 2 + 1e-6


# ------------------------------------------------------- settings / logging
def test_settings_roundtrip_with_psf(tmp_path):
    from thz_image_explorer_tpu.io import load_psf

    s = Settings(dark_mode=False, downscaling=3, sample_thickness=2.5)
    s.psf = load_psf("/root/reference/sample_data/psf.npz")
    s.save(str(tmp_path))
    s2 = Settings.load(str(tmp_path))
    assert s2.dark_mode is False and s2.downscaling == 3
    assert s2.sample_thickness == 2.5
    assert s2.psf is not None and s2.psf.is_loaded
    np.testing.assert_allclose(
        s2.psf.wx_fit.correction.knots, s.psf.wx_fit.correction.knots
    )


def test_settings_load_missing_returns_defaults(tmp_path):
    s = Settings.load(str(tmp_path))
    assert s.opacity_threshold == 0.1 and s.kernel_radius == 9


def test_psf_tool_state_roundtrip(tmp_path):
    st = PsfToolState(knife_edge_x_path="/a/b.thz", n_filters=33)
    st.save(str(tmp_path))
    st2 = PsfToolState.load(str(tmp_path))
    assert st2.knife_edge_x_path == "/a/b.thz" and st2.n_filters == 33


def test_log_ring_buffer():
    buf = LogRingBuffer(capacity=5)
    logger = logging.getLogger("thz_image_explorer_tpu.test_ring")
    logger.addHandler(buf)
    logger.setLevel(logging.INFO)
    for i in range(10):
        logger.info("msg %d", i)
    assert len(buf.records) == 5
    assert buf.last_warning is None
    logger.warning("trouble!")
    assert buf.last_warning == "trouble!"
    buf.clear_warning()
    assert buf.last_warning is None
    logger.removeHandler(buf)


def test_voxel_dynamic_threshold_matches_topk():
    """The scanned-histogram order statistic tracks exact top_k within
    one 1/4096 bin and never keeps more than MAX_INSTANCES voxels."""
    import jax.numpy as jnp

    from thz_image_explorer_tpu.ops import voxel

    rng = np.random.default_rng(0)
    n = 3_000_000
    flat = rng.uniform(0, 1, n).astype(np.float32)
    # make the tail interesting: most mass near zero
    flat = flat ** 3

    old_max = voxel.MAX_INSTANCES
    voxel.MAX_INSTANCES = 1_000_000
    try:
        thr = float(voxel._dynamic_threshold(jnp.asarray(flat)))
    finally:
        voxel.MAX_INSTANCES = old_max
    exact = float(np.partition(flat, n - 1_000_000)[n - 1_000_000])
    assert abs(thr - exact) < 2.0 / 4096
    assert int((flat >= thr).sum()) <= 1_000_000


def test_voxel_pallas_envelope_matches_xla():
    """The fused pallas envelope pass (interpret mode) reproduces the XLA
    composition bit-close, including zeroed below-threshold lines."""
    import jax.numpy as jnp

    from thz_image_explorer_tpu.ops.voxel import (
        _envelope_pallas,
        _voxel_opacities_impl,
        gaussian_kernel1d,
    )

    rng = np.random.default_rng(1)
    x, y, t = 8, 36, 128  # 288 lines: exercises block padding (256 + 32)
    data = (rng.normal(size=(x, y, t)) * rng.uniform(
        0, 1.5, (x, y, 1))).astype(np.float32)
    k = jnp.asarray(gaussian_kernel1d(2.0, 5))

    ref, _ = _voxel_opacities_impl(
        jnp.asarray(data), k, np.float32(2.0), np.float32(0.4), 5, False
    )
    from thz_image_explorer_tpu.ops.voxel import _band_matrix_bf16

    w = _band_matrix_bf16(k, t, 5)
    got = _envelope_pallas(
        jnp.asarray(data.reshape(x * y, t)), w, np.float32(2.0),
        np.float32(0.4), interpret=True,
    ).reshape(x, y, t)
    # W is bf16 in the kernel (VMEM budget): ~1e-3 display-path error
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_voxel_pallas_honors_interpret(monkeypatch):
    """THZ_PALLAS_INTERPRET=1 must reach the voxel pallas kernel like it
    reaches the deconvolution one: forced-pallas on a CPU backend runs
    interpreted instead of raising 'only interpret mode supported'."""
    monkeypatch.setenv("THZ_VOXEL_IMPL", "pallas")
    monkeypatch.setenv("THZ_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(1)
    data = rng.normal(size=(4, 4, 64)).astype(np.float32)
    kernel = jnp.asarray(gaussian_kernel1d(3.0, 9))
    opac_p, _ = voxel_opacities(
        jnp.asarray(data), kernel, jnp.float32(2.0), jnp.float32(0.01), 9
    )
    monkeypatch.setenv("THZ_VOXEL_IMPL", "xla")
    opac_x, _ = voxel_opacities(
        jnp.asarray(data), kernel, jnp.float32(2.0), jnp.float32(0.01), 9
    )
    # bf16 tap quantization on the pallas path: display-grade agreement
    assert np.allclose(np.asarray(opac_p), np.asarray(opac_x), atol=5e-3)

    # the interpreted kernel matches jnp.power's 0^0 = 1 at contrast 0
    # (f32::powf(0,0) = 1 in the reference, threed_plot.rs:173)
    dz = np.asarray(data).copy()
    dz[0, 0, :] = 0.0
    monkeypatch.setenv("THZ_VOXEL_IMPL", "pallas")
    oz_p, _ = voxel_opacities(
        jnp.asarray(dz), kernel, jnp.float32(0.0), jnp.float32(0.01), 9
    )
    monkeypatch.setenv("THZ_VOXEL_IMPL", "xla")
    oz_x, _ = voxel_opacities(
        jnp.asarray(dz), kernel, jnp.float32(0.0), jnp.float32(0.01), 9
    )
    assert np.allclose(np.asarray(oz_p), np.asarray(oz_x), atol=5e-3)


def test_dynamic_threshold_tie_spike_keeps_cap():
    """A huge tie mass at the cap boundary must not collapse the kept
    count to almost nothing: the reference's select_nth keeps the cap
    including ties (threed_plot.rs:207-214), so the histogram picks the
    edge BELOW the spike (tie overflow) over a near-empty view."""
    import thz_image_explorer_tpu.ops.voxel as vox

    rng = np.random.default_rng(2)
    n_ties = vox.MAX_INSTANCES + 500_000
    flat = np.concatenate([
        np.full(n_ties, 0.999, np.float32),
        rng.uniform(0.0, 0.9, 500_000).astype(np.float32),
    ])
    thr = float(vox._dynamic_threshold(jnp.asarray(flat)))
    kept = int((flat >= thr).sum())
    # the spike survives: kept >= the tie mass, not a ~500-point sliver
    assert kept >= n_ties, (thr, kept)


def test_extract_instances_scaling_folds_into_dims():
    """The reference stamps scale=scaling on every instance
    (threed_plot.rs:239,262); with one scalar per extraction it folds
    into the returned rendered-voxel dims."""
    data = np.zeros((4, 4, 32), np.float32)
    data[2, 1, 16] = 3.0
    _, _, cw1, ch1, cd1, _ = extract_instances(
        jnp.asarray(data), time_span=10.0, scaling=1, original_dims=(8, 8, 32)
    )
    _, _, cw2, ch2, cd2, _ = extract_instances(
        jnp.asarray(data), time_span=10.0, scaling=2, original_dims=(8, 8, 32)
    )
    assert (cw2, ch2, cd2) == (2 * cw1, 2 * ch1, 2 * cd1)


def test_intensity_image_gamma_encoded():
    """egui's Hsva values are linear and its Color32 bytes sRGB: the
    rendered bytes must be gamma-encoded (linear 0.5 -> ~188, not 127)
    and rounded, or every midtone draws darker than the reference."""
    from thz_image_explorer_tpu.viz.colormap import (
        _linear_to_srgb,
        intensity_image_rgba,
    )

    # grayscale midpoint: remapped 0.5 at midpoint 50 -> linear v = 0.5
    img = np.array([[0.5, 1.0]])
    rgba = intensity_image_rgba(img, bw=True)
    assert abs(int(rgba[0, 0, 0]) - 188) <= 1, rgba[0, 0]
    assert rgba[0, 1, 0] == 255
    # rounding, not truncation
    assert np.round(_linear_to_srgb(np.float64(0.999)) * 255) == 255


def test_dynamic_range_follows_displayed_series():
    """DR normalizes against the DISPLAYED plot's max: dB values when the
    log plot is on, raw amplitudes otherwise (center_panel.rs:335-342);
    and short spectra average what exists instead of dividing by 100."""
    from thz_image_explorer_tpu.viz.plots import dynamic_range_db

    rng = np.random.default_rng(0)
    amp = np.abs(rng.normal(size=513)) * np.exp(-np.arange(513) / 80.0)
    assert dynamic_range_db(amp, True) != dynamic_range_db(amp, False)
    short = np.abs(rng.normal(size=33)) + 0.1
    # mean over the 33 existing bins, not sum/100
    noise = short.sum() / 33
    expect = 20 * np.log10(noise + 1e-10) - max(
        float((20 * np.log10(short)).max()), -200.0
    )
    assert abs(dynamic_range_db(short, True) - expect) < 1e-9
