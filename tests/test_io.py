"""I/O tests: dotTHz round-trip, real knife-edge file, real PSF npz."""

import os

import numpy as np
import pytest

from thz_image_explorer_tpu.io import (
    DotthzMetadata,
    load_metadata,
    load_psf,
    open_pulse,
    open_scan,
    save_psf,
    save_scan,
    update_metadata,
)
from thz_image_explorer_tpu.io.vtk import export_to_vtk

from make_sample import synthetic_scan, write_scan_thz, write_pulse_thz

REF_KNIFE_X = (
    "/root/reference/sample_data/example_beam_width/measurement_x/data/"
    "1750085285.8557956_data.thz"
)
REF_PSF = "/root/reference/sample_data/psf.npz"


def test_scan_roundtrip(tmp_path):
    t, cube = synthetic_scan(width=8, height=6, n_time=64)
    path = write_scan_thz(str(tmp_path / "scan.thzimg"), t, cube, dx=0.25, dy=0.75)
    loaded, img, md = open_scan(path)
    # the device grid is bucket-padded (16 quantum); the valid region and
    # the returned image keep the true scan size
    assert tuple(np.asarray(loaded.valid_wh)) == (8, 6)
    assert loaded.width == 16 and loaded.height == 16 and loaded.n_time == 64
    assert img.shape == (8, 6)
    assert loaded.dx == 0.25 and loaded.dy == 0.75
    # DC offset subtracted: first sample of every trace is 0
    np.testing.assert_allclose(np.asarray(loaded.data)[:, :, 0], 0.0, atol=1e-6)
    # padded pixels are zero
    np.testing.assert_allclose(np.asarray(loaded.data)[8:, :, :], 0.0, atol=0)
    # intensity = sum of squares of DC-corrected data
    expected_img = ((cube - cube[:, :, :1]) ** 2).sum(axis=-1)
    np.testing.assert_allclose(img, expected_img, rtol=1e-4)
    # frequency axis: i / time range (io.rs:614-621)
    rng = t[-1] - t[0]
    np.testing.assert_allclose(
        np.asarray(loaded.freq), np.arange(33) / rng, rtol=1e-5
    )
    assert md.md["width"] == "8"


def test_pulse_fallback_and_open_pulse(tmp_path):
    t = np.linspace(0, 10, 128).astype(np.float32)
    sig = np.sin(t).astype(np.float32)
    path = write_pulse_thz(str(tmp_path / "ref.thz"), t, sig)
    time, signal, _md = open_pulse(path)
    np.testing.assert_allclose(time, t)
    np.testing.assert_allclose(signal, sig)
    # open_scan falls back to a 1x1 cube (io.rs:545-561)
    cube, img, _ = open_scan(path)
    assert cube.width == 1 and cube.height == 1
    assert cube.dx == 1.0 and cube.dy == 1.0


def test_save_scan_and_metadata_update(tmp_path):
    t, cube_np = synthetic_scan(width=4, height=4, n_time=32)
    path = write_scan_thz(str(tmp_path / "scan.thz"), t, cube_np)
    cube, _, md = open_scan(path)

    out = str(tmp_path / "resaved.thz")
    md.ds_description = ["time", "dataset"]
    save_scan(out, cube, md)
    cube2, _, md2 = open_scan(out)
    np.testing.assert_allclose(np.asarray(cube2.time), np.asarray(cube.time))
    # resaved data had DC already removed; loader subtracts zeros
    np.testing.assert_allclose(
        np.asarray(cube2.data), np.asarray(cube.data), atol=1e-6
    )

    md2.md["custom"] = "42"
    update_metadata(out, md2)
    md3 = load_metadata(out)
    assert md3.md["custom"] == "42"


def test_roi_metadata_roundtrip():
    md = DotthzMetadata()
    rois = {
        "uuid-1": ("sample", [(1, 2), (3, 4), (5, 6)]),
        "uuid-2": ("reference", [(7, 8), (9, 10), (11, 12)]),
    }
    md.set_rois(rois)
    assert md.md["ROI Labels"] == "sample,reference"
    assert md.md["ROI 0"] == "[1,2],[3,4],[5,6]"
    parsed = md.get_rois()
    assert parsed[0] == ("sample", [(1, 2), (3, 4), (5, 6)])
    assert parsed[1][1][2] == (11, 12)
    md.set_rois({})
    assert "ROI Labels" not in md.md
    assert "ROI 0" not in md.md


def test_roi_metadata_draft_roi_keeps_index_alignment():
    """A draft ROI (coords=None) must leave an EMPTY label slot so later
    'ROI {i}' keys stay aligned with the label list (data_thread.rs:
    119-127 emits a bare comma) — compacting would silently drop every
    ROI after the draft on round-trip."""
    md = DotthzMetadata()
    md.set_rois({
        "u1": ("draft", None),
        "u2": ("real", [(1, 2), (3, 4)]),
    })
    assert md.md["ROI Labels"] == ",real"
    assert "ROI 0" not in md.md
    assert md.md["ROI 1"] == "[1,2],[3,4]"
    assert md.get_rois() == [("real", [(1, 2), (3, 4)])]


def test_roi_metadata_parse_is_tolerant():
    """Float / malformed coordinate tokens must parse like the reference
    (data_thread.rs:656-676: f64 filter_map, pairs-only, cast to usize)
    instead of raising and aborting the scan open."""
    md = DotthzMetadata()
    md.md["ROI Labels"] = "a,b,c"
    md.md["ROI 0"] = "[1.5,2.9],[3,4]"        # floats -> truncate
    md.md["ROI 1"] = "[1,2,3],[x,5],[6,7]"    # bad points dropped
    md.md["ROI 2"] = "garbage"                # fully invalid -> no ROI
    got = md.get_rois()
    assert got == [("a", [(1, 2), (3, 4)]), ("b", [(6, 7)])]


def test_attr_str_integral_floats_match_rust_display():
    """HDF5 numeric attrs print through Rust Display: 100.0 -> '100'
    (io.rs:565 then parses width/height as usize); 0.5 stays '0.5'."""
    from thz_image_explorer_tpu.io.dotthz import _attr_str

    assert _attr_str(np.float64(100.0)) == "100"
    assert _attr_str(np.float32(0.5)) == "0.5"
    assert _attr_str(np.array([7.0])) == "7"
    assert _attr_str(-3.0) == "-3"


@pytest.mark.skipif(not os.path.exists(REF_KNIFE_X), reason="fixture missing")
def test_real_knife_edge_file_first_group():
    """The real (non-LFS) knife-edge fixture parses as a pulse group."""
    import h5py

    with h5py.File(REF_KNIFE_X, "r") as f:
        assert len(f.keys()) == 300
    time, signal, md = open_pulse(REF_KNIFE_X)
    assert time.shape == (1001,)
    assert md.md.get("position [mm]") is not None


@pytest.mark.skipif(not os.path.exists(REF_PSF), reason="fixture missing")
def test_real_psf_npz_load_and_roundtrip(tmp_path):
    psf = load_psf(REF_PSF)
    assert psf.is_loaded
    assert len(psf.x0_spline.knots) == 20
    # evaluations are finite and positive beam widths
    freqs = np.linspace(0.1, 10.0, 50)
    wx = psf.wx_fit.eval(freqs)
    wy = psf.wy_fit.eval(freqs)
    assert np.isfinite(wx).all() and (wx > 0).all()
    assert np.isfinite(wy).all() and (wy > 0).all()
    # centers use constant extrapolation outside the knots
    x0_low = psf.x0_spline.eval_const_extrap(0.01)
    assert x0_low == psf.x0_spline.values[0]
    # roundtrip through our writer
    out = str(tmp_path / "psf_out.npz")
    save_psf(out, psf)
    psf2 = load_psf(out)
    np.testing.assert_allclose(
        psf2.wx_fit.correction.coeff_b, psf.wx_fit.correction.coeff_b
    )
    np.testing.assert_allclose(psf2.wx_fit.base_a, psf.wx_fit.base_a)


def test_vtk_export(tmp_path):
    pos = np.array([[0, 0, 0], [1, 1, 1], [2, 0, 1]], float)
    col = np.array([[1, 0, 0, 0.5], [0, 1, 0, 0.7], [0, 0, 1, 1.0]], float)
    path = str(tmp_path / "out.vtu")
    export_to_vtk(pos, col, path)
    text = open(path).read()
    assert "UnstructuredGrid" in text and 'NumberOfPoints="3"' in text
    assert "Opacity" in text


def test_first_group_skips_root_datasets(tmp_path):
    """A root-level dataset sorting before the group must not be picked
    as 'the group' (the reference iterates groups only, io.rs:496-509)."""
    import h5py

    t, cube = synthetic_scan(width=4, height=4, n_time=32)
    path = str(tmp_path / "odd.thz")
    write_scan_thz(path, t, cube, dx=1.0, dy=1.0)
    with h5py.File(path, "r+") as f:
        f.create_dataset("AAA_rootlevel", data=np.arange(4.0))
    cube2, img, md = open_scan(path)
    assert img.shape == (4, 4)


def test_single_pulse_metadata_dx_overrides_fallback(tmp_path):
    """Metadata dx/dy override the single-pulse fallback's 1.0
    (io.rs:598-604 assigns unconditionally when the key exists)."""
    import h5py

    path = str(tmp_path / "pulse.thz")
    t = np.linspace(0.0, 10.0, 64, dtype=np.float32)
    sig = np.sin(t).astype(np.float32)
    with h5py.File(path, "w") as f:
        g = f.create_group("Measurement")
        g.create_dataset("ds1", data=np.stack([t, sig], axis=1))
        g.attrs["mdDescription"] = "dx [mm],dy [mm]"
        g.attrs["md1"] = "0.5"
        g.attrs["md2"] = "0.25"
    cube, _img, _md = open_scan(path)
    assert cube.dx == 0.5 and cube.dy == 0.25


def test_metadata_update_follows_open_group(tmp_path):
    """Metadata save targets the group open_scan read from, not a
    hardcoded 'Image' (a 'Measurement'-only file must not KeyError)."""
    import h5py

    path = str(tmp_path / "meas.thz")
    t = np.linspace(0.0, 10.0, 64, dtype=np.float32)
    sig = np.sin(t).astype(np.float32)
    with h5py.File(path, "w") as f:
        g = f.create_group("Measurement")
        g.create_dataset("ds1", data=np.stack([t, sig], axis=1))
    md = load_metadata(path)
    md.md["Operator"] = "x"
    update_metadata(path, md)
    assert load_metadata(path).md["Operator"] == "x"


def test_save_psf_writes_exact_path(tmp_path):
    """save_psf writes to EXACTLY the requested path — np.savez's silent
    '.npz' suffix append broke `--out /d/mypsf` (export.rs:8 writes the
    given path verbatim)."""
    import os

    psf = load_psf("/root/reference/sample_data/psf.npz")
    out = str(tmp_path / "mypsf")  # no .npz suffix
    save_psf(out, psf)
    assert os.path.exists(out) and not os.path.exists(out + ".npz")
    again = load_psf(out)
    f = np.linspace(0.3, 2.0, 7)
    np.testing.assert_allclose(
        psf.wx_fit.eval(f), again.wx_fit.eval(f), rtol=1e-6
    )
