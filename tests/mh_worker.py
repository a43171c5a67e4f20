"""One process of the 2-process multi-host simulation driven by
``tests/test_multihost.py``.

Each worker is a separate OS process with its OWN jax runtime (2 local
CPU devices), coordinated through ``jax.distributed`` with gloo
collectives — the same multi-controller SPMD model a real multi-host TPU
pod runs, minus the hardware. The worker loads ONLY its pixel rows of
the shared scan (``parallel/multihost.open_scan_sharded``), runs the
fused update step over the global 2x2 mesh (the pixel-mean reductions
are genuine cross-process collectives), and dumps its addressable
results for the test to compare against the single-process loader.

Usage: python mh_worker.py <pid> <nproc> <port> <scan.thz> <outdir>
"""

import json
import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    scan_path, outdir = sys.argv[4], sys.argv[5]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    try:
        import numpy as np

        from thz_image_explorer_tpu.parallel.mesh import make_mesh
        from thz_image_explorer_tpu.parallel.multihost import (
            open_scan_sharded,
        )
        from thz_image_explorer_tpu.parallel.step import (
            StepConfig,
            StepParams,
            interactive_update,
        )

        assert len(jax.devices()) == 2 * nproc
        assert len(jax.local_devices()) == 2
        # make_mesh lays jax.devices() out (2, nproc) row-major: each
        # process's two devices form one x-row -> partial reads are
        # contiguous row blocks of the scan
        mesh = make_mesh()

        cube, img, md = open_scan_sharded(scan_path, mesh)
        cfg = StepConfig(fd_active=True, notch_active=True)
        out, img2 = interactive_update(cube, StepParams.defaults(), cfg)

        # replicated leaves are addressable everywhere; pixel-grid
        # results only as this process's shards (tagged with their
        # global offsets)
        shards = {}
        for i, s in enumerate(img2.addressable_shards):
            xs, ys = s.index[0], s.index[1]
            shards[f"shard{i}"] = np.asarray(s.data)
            shards[f"shard{i}_at"] = np.asarray(
                [xs.start or 0, ys.start or 0], np.int64
            )
        np.savez(
            os.path.join(outdir, f"out{pid}.npz"),
            avg_signal_fft=np.asarray(out.avg_signal_fft),
            avg_data=np.asarray(out.avg_data),
            avg_phase_fft=np.asarray(out.avg_phase_fft),
            valid_wh=np.asarray(out.valid_wh),
            **shards,
        )
        with open(os.path.join(outdir, f"meta{pid}.json"), "w") as f:
            json.dump({"dx": cube.dx, "dy": cube.dy, "md_w": md.md.get("width")}, f)
    finally:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
