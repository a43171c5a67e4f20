"""Multi-host input pipeline (SURVEY.md §2.7: DCN loading).

Two layers of coverage:

* single-process: ``open_scan_sharded`` on the virtual 8-device mesh
  must equal the ordinary loader (data, intensity, metadata, and the
  update step's published reductions);
* true multi-controller: TWO separate OS processes (``mh_worker.py``),
  each with its own jax runtime and 2 local CPU devices, coordinate via
  ``jax.distributed`` + gloo, each reads only ITS pixel rows of the
  shared scan, and the sharded update's cross-process mean reductions
  match the single-process result — the same SPMD model a multi-host
  TPU pod runs, exercised without the hardware.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from make_sample import synthetic_scan, write_scan_thz

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _write_scan(tmp_path, w=30, h=22, n=64):
    p = str(tmp_path / "scan.thzimg")
    t, cube = synthetic_scan(width=w, height=h, n_time=n)
    write_scan_thz(p, t, cube, dx=0.5, dy=0.5)
    return p


def test_sharded_open_matches_loader(tmp_path):
    from thz_image_explorer_tpu.io.dotthz import open_scan
    from thz_image_explorer_tpu.parallel.mesh import make_mesh
    from thz_image_explorer_tpu.parallel.multihost import open_scan_sharded
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig, StepParams, interactive_update)

    p = _write_scan(tmp_path)
    mesh = make_mesh()
    cs, img_s, md_s = open_scan_sharded(p, mesh)
    c0, img0, md0 = open_scan(p)

    assert np.asarray(cs.data).shape == np.asarray(c0.data).shape
    np.testing.assert_allclose(np.asarray(cs.data), np.asarray(c0.data))
    vw, vh = np.asarray(c0.valid_wh)
    np.testing.assert_allclose(
        np.asarray(img_s)[:vw, :vh], img0, rtol=1e-6, atol=1e-6
    )
    assert np.array_equal(np.asarray(cs.valid_wh), np.asarray(c0.valid_wh))
    assert (cs.dx, cs.dy) == (c0.dx, c0.dy)
    assert md_s.md.get("width") == md0.md.get("width")
    # the cube really is sharded over the mesh
    assert cs.data.sharding.num_devices == len(mesh.devices.flat)

    cfg = StepConfig(fd_active=True, notch_active=True)
    params = StepParams.defaults()
    o_s, i_s = interactive_update(cs, params, cfg)
    o_0, i_0 = interactive_update(c0, params, cfg)
    np.testing.assert_allclose(
        np.asarray(o_s.avg_signal_fft), np.asarray(o_0.avg_signal_fft),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(i_s), np.asarray(i_0), rtol=1e-4, atol=1e-5
    )


def test_sharded_open_rejects_pulse_files(tmp_path):
    """Single-pulse (2-D) files have no pixel grid to distribute — the
    sharded loader refuses them loudly instead of mis-reading."""
    import h5py

    from thz_image_explorer_tpu.parallel.mesh import make_mesh
    from thz_image_explorer_tpu.parallel.multihost import open_scan_sharded

    p = str(tmp_path / "pulse.thz")
    with h5py.File(p, "w") as f:
        g = f.create_group("Measurement")
        g.create_dataset("ds1", data=np.zeros((64, 2), np.float32))
    with pytest.raises(ValueError, match="multi-host loader"):
        open_scan_sharded(p, make_mesh())


def test_two_process_multihost_load_and_step(tmp_path):
    """The real thing: 2 coordinated processes, disjoint partial reads,
    cross-process collectives in the update's reductions."""
    p = _write_scan(tmp_path, w=30, h=22, n=64)
    outdir = str(tmp_path)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{HERE}:" + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    # worker output goes to files, not pipes: a full 64 KB pipe would
    # block a worker mid-collective and deadlock its peer
    logs = [open(os.path.join(outdir, f"worker{pid}.log"), "wb")
            for pid in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mh_worker.py"),
             str(pid), "2", str(port), p, outdir],
            env=env, stdout=logs[pid], stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    try:
        for pr in procs:
            pr.wait(timeout=360)
    finally:
        for pr in procs:
            if pr.poll() is None:
                pr.kill()
                pr.wait()
        for lg in logs:
            lg.close()
    for pid, pr in enumerate(procs):
        with open(os.path.join(outdir, f"worker{pid}.log"), "rb") as f:
            out = f.read().decode(errors="replace")
        assert pr.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    # single-process oracle through the ordinary loader
    from thz_image_explorer_tpu.io.dotthz import open_scan
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig, StepParams, interactive_update)

    c0, _img0, _ = open_scan(p)
    o_0, i_0 = interactive_update(
        c0, StepParams.defaults(), StepConfig(fd_active=True, notch_active=True)
    )
    i_0 = np.asarray(i_0)

    covered = np.zeros(i_0.shape, bool)
    for pid in range(2):
        z = np.load(os.path.join(outdir, f"out{pid}.npz"))
        # replicated reductions identical on BOTH processes: these crossed
        # the process boundary through gloo psums
        np.testing.assert_allclose(
            z["avg_signal_fft"], np.asarray(o_0.avg_signal_fft), atol=1e-5
        )
        np.testing.assert_allclose(
            z["avg_data"], np.asarray(o_0.avg_data), atol=1e-5
        )
        assert np.array_equal(z["valid_wh"], np.asarray(o_0.valid_wh))
        # each process's local intensity shards match the oracle's block
        i = 0
        while f"shard{i}" in z:
            x0, y0 = z[f"shard{i}_at"]
            blk = z[f"shard{i}"]
            np.testing.assert_allclose(
                blk,
                i_0[x0 : x0 + blk.shape[0], y0 : y0 + blk.shape[1]],
                rtol=1e-4, atol=1e-5,
            )
            covered[x0 : x0 + blk.shape[0], y0 : y0 + blk.shape[1]] = True
            i += 1
        assert i == 2  # 2 local devices -> 2 shards per process
    assert covered.all()  # the two processes' shards tile the whole grid
