"""CLI shell + update-check tests."""

import numpy as np
import pytest

from thz_image_explorer_tpu.cli import main
from thz_image_explorer_tpu.utils.update import is_newer, parse_version

from make_sample import synthetic_scan, write_scan_thz


@pytest.fixture
def scan_path(tmp_path):
    t, cube = synthetic_scan(width=16, height=16, n_time=128)
    return write_scan_thz(str(tmp_path / "scan.thzimg"), t, cube, dx=1.0, dy=1.0)


def test_cli_info(scan_path, capsys):
    assert main(["info", scan_path]) == 0
    out = capsys.readouterr().out
    assert "16 x 16 pixels x 128 samples" in out


def test_cli_process_and_save(scan_path, tmp_path, capsys):
    out_file = str(tmp_path / "processed.thz")
    assert (
        main(
            [
                "process",
                scan_path,
                "--fd-bandpass", "0.2", "5.0",
                "--water-notch",
                "--save", out_file,
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "stage timings" in out
    from thz_image_explorer_tpu.io import open_scan

    cube, _, _ = open_scan(out_file)
    assert cube.n_time == 128


def test_cli_psf_diagnostics(capsys):
    import os

    psf = "/root/reference/sample_data/psf.npz"
    if not os.path.exists(psf):
        pytest.skip("fixture missing")
    assert main(["psf-diagnostics", psf]) == 0
    assert "PSF Diagnostics" in capsys.readouterr().out


def test_semver():
    assert parse_version("v1.3.0") == (1, 3, 0)
    assert is_newer("1.4.0", "1.3.9")
    assert not is_newer("1.3.0", "1.3.0")
    with pytest.raises(ValueError):
        parse_version("nope")


def test_install_update_replaces_package(tmp_path):
    """install_update: download tarball -> extract -> atomic replace with
    .bak backup (the package equivalent of update.rs:118-211)."""
    import tarfile

    from thz_image_explorer_tpu.utils.update import install_update

    # fake installed package
    pkg = tmp_path / "site" / "thz_image_explorer_tpu"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("__version__ = '0.1.0'\n")

    # fake release tarball, nested like a GitHub tarball
    src = tmp_path / "repo-abc123" / "thz_image_explorer_tpu"
    src.mkdir(parents=True)
    (src / "__init__.py").write_text("__version__ = '9.9.9'\n")
    tar = tmp_path / "rel.tar.gz"
    with tarfile.open(tar, "w:gz") as tf:
        tf.add(tmp_path / "repo-abc123", arcname="repo-abc123")

    out = install_update(tar.as_uri(), package_dir=str(pkg))
    assert out == str(pkg)
    assert "9.9.9" in (pkg / "__init__.py").read_text()
    assert "0.1.0" in (pkg.parent / "thz_image_explorer_tpu.bak" /
                       "__init__.py").read_text()


def test_install_update_rolls_back_on_bad_archive(tmp_path):
    import pytest

    from thz_image_explorer_tpu.utils.update import install_update

    pkg = tmp_path / "site" / "thz_image_explorer_tpu"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("__version__ = '0.1.0'\n")
    bad = tmp_path / "bad.tar.gz"
    bad.write_bytes(b"not a tarball")
    with pytest.raises(Exception):
        install_update(bad.as_uri(), package_dir=str(pkg))
    # package untouched
    assert "0.1.0" in (pkg / "__init__.py").read_text()


def test_install_update_rejects_packageless_archive(tmp_path):
    import tarfile

    import pytest

    from thz_image_explorer_tpu.utils.update import install_update

    pkg = tmp_path / "site" / "thz_image_explorer_tpu"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("x = 1\n")
    empty = tmp_path / "repo-x" / "docs"
    empty.mkdir(parents=True)
    (empty / "a.txt").write_text("hi")
    tar = tmp_path / "rel.tar.gz"
    with tarfile.open(tar, "w:gz") as tf:
        tf.add(tmp_path / "repo-x", arcname="repo-x")
    with pytest.raises(ValueError):
        install_update(tar.as_uri(), package_dir=str(pkg))
    assert (pkg / "__init__.py").exists()


def test_cli_update_command_offline(capsys):
    """`update` subcommand degrades gracefully with no network."""
    from thz_image_explorer_tpu.cli import main

    assert main(["update"]) == 0
    out = capsys.readouterr().out
    assert "up to date" in out or "update available" in out


def test_cli_deconvolve(tmp_path, capsys):
    """End-to-end `deconvolve` subcommand with the real psf.npz fixture."""
    t, cube = synthetic_scan(width=20, height=20, n_time=128)
    scan = write_scan_thz(str(tmp_path / "s.thzimg"), t, cube, dx=1.0, dy=1.0)
    out = str(tmp_path / "out.thz")
    rc = main([
        "deconvolve", scan, "--psf", "/root/reference/sample_data/psf.npz",
        "--n-filters", "4", "--iterations", "8",
        "--start-freq", "0.3", "--end-freq", "3.0", "--save", out,
    ])
    assert rc == 0
    assert "deconvolution:" in capsys.readouterr().out
    from thz_image_explorer_tpu.io import open_scan

    cube2, img, _md = open_scan(out)
    # the saved FILE holds the true 20x20 scan (bucket padding cropped on
    # save); reopening bucket-pads the device grid but keeps valid_wh
    assert img.shape == (20, 20)
    assert tuple(np.asarray(cube2.valid_wh)) == (20, 20)
    assert cube2.data.shape[2] == 128
    assert np.isfinite(np.asarray(cube2.data)).all()


def test_cli_psf_fit(tmp_path, capsys):
    """`psf-fit` over the real knife-edge fixtures exports a loadable npz."""
    out = str(tmp_path / "psf_out.npz")
    rc = main([
        "psf-fit",
        "--x", "/root/reference/sample_data/example_beam_width/measurement_x/data/1750085285.8557956_data.thz",
        "--y", "/root/reference/sample_data/example_beam_width/measurement_y/data/1750163177.929295_data.thz",
        "--out", out, "--n-filters", "4",
    ])
    assert rc == 0
    from thz_image_explorer_tpu.io import load_psf

    assert load_psf(out).is_loaded


def test_cli_process_save_writes_processed_cube(scan_path, tmp_path):
    """`process --save` writes the PROCESSED cube (the help text's
    promise) — it used to write the raw input via Explorer.save_file."""
    out_file = str(tmp_path / "proc.thz")
    assert main([
        "process", scan_path, "--fd-bandpass", "0.5", "1.5",
        "--save", out_file,
    ]) == 0
    from thz_image_explorer_tpu.io import open_scan

    raw, _, _ = open_scan(scan_path)
    proc, _, _ = open_scan(out_file)
    assert not np.allclose(
        np.asarray(raw.data), np.asarray(proc.data), atol=1e-7
    ), "saved cube equals the raw input — filters were dropped"


def test_cli_process_prints_per_stage_timings(scan_path, capsys):
    """The fused default records only an async 'chain' aggregate; the
    CLI refreshes per-stage numbers before printing."""
    assert main(["process", scan_path]) == 0
    out = capsys.readouterr().out
    # per-stage entries (fft/ifft), not just the fused 'chain' aggregate
    # (scaling is a no-op at downscale 1 and is never timed)
    assert "fft" in out and "ifft" in out


def test_cli_deconvolve_skip_is_a_clean_error(tmp_path, capsys):
    """A scan without dx/dy metadata makes the deconvolution stage skip;
    the CLI reports that instead of a KeyError traceback."""
    import h5py

    t, cube = synthetic_scan(width=16, height=16, n_time=128)
    p = write_scan_thz(str(tmp_path / "nodx.thzimg"), t, cube, dx=1.0, dy=1.0)
    with h5py.File(p, "r+") as f:
        g = f["Image"]
        names = g.attrs["mdDescription"].split(",")
        for i, name in enumerate(names):
            if name.strip() in ("dx [mm]", "dy [mm]"):
                g.attrs[f"md{i + 1}"] = "not-a-number"
    rc = main(["deconvolve", p, "--psf",
               "/root/reference/sample_data/psf.npz",
               "--n-filters", "3", "--iterations", "4"])
    assert rc == 1
    assert "did not run" in capsys.readouterr().out


def test_cli_psf_fit_requires_a_measurement(tmp_path, capsys):
    rc = main(["psf-fit", "--out", str(tmp_path / "p.npz")])
    assert rc == 2
    assert "--x / --y" in capsys.readouterr().err


def test_cli_info_single_pulse_no_crash(tmp_path, capsys):
    """`info` on a 1-pixel single-pulse file (or any degenerate axis)
    prints without IndexError."""
    import h5py

    p = str(tmp_path / "pulse.thz")
    t = np.linspace(0.0, 10.0, 64, dtype=np.float32)
    with h5py.File(p, "w") as f:
        g = f.create_group("G")
        g.create_dataset("ds1", data=np.stack([t, np.sin(t)], axis=1))
    assert main(["info", p]) == 0
    assert "1 x 1 pixels" in capsys.readouterr().out


def test_cli_process_save_downscaled_geometry(scan_path, tmp_path):
    """`process --downscale N --save` must declare the geometry of the
    cube it WRITES: halved width/height, doubled dx/dy — not the original
    scan's. Readers (io.rs:496-631 and this loader) index the dataset by
    the metadata dims and trust the pitch for tilt/deconvolution."""
    out_file = str(tmp_path / "down.thz")
    assert main([
        "process", scan_path, "--downscale", "2", "--save", out_file,
    ]) == 0
    from thz_image_explorer_tpu.io import load_metadata, open_scan

    md = load_metadata(out_file)
    assert md.md["width"] == "8" and md.md["height"] == "8"
    assert float(md.md["dx [mm]"]) == 2.0
    assert float(md.md["dy [mm]"]) == 2.0
    cube, _, _ = open_scan(out_file)
    assert tuple(np.asarray(cube.valid_wh)) == (8, 8)
    assert cube.dx == 2.0 and cube.dy == 2.0
