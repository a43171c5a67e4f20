"""Multi-chip sharding: the pixel-grid mesh (SURVEY.md §2.7) on the
virtual 8-device CPU mesh — sharded results must match unsharded."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thz_image_explorer_tpu.data import make_cube
from thz_image_explorer_tpu.parallel import make_mesh, shard_cube
from thz_image_explorer_tpu.parallel.step import (
    StepConfig,
    StepParams,
    interactive_update,
)

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _cube(w=16, h=16, n=64, seed=0):
    rng = np.random.default_rng(seed)
    t = (np.arange(n) * 0.05).astype(np.float32)
    pulse = np.exp(-((t - 1.2) ** 2) / 0.1) * np.sin(2 * np.pi * 1.0 * t)
    data = (
        pulse[None, None, :] * rng.uniform(0.3, 1.0, (w, h, 1))
        + 0.01 * rng.normal(size=(w, h, n))
    ).astype(np.float32)
    return make_cube(jnp.asarray(t), jnp.asarray(data), dx=1.0, dy=1.0)


@needs_mesh
def test_sharded_interactive_update_matches_unsharded():
    cube = _cube()
    params = StepParams.defaults()
    cfg = StepConfig(fd_active=True, notch_active=True)

    out_ref, img_ref = interactive_update(cube, params, cfg)

    mesh = make_mesh()
    sharded = shard_cube(cube, mesh)
    with mesh:
        out_sh, img_sh = interactive_update(sharded, params, cfg)

    np.testing.assert_allclose(
        np.asarray(img_sh), np.asarray(img_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_sh.avg_signal_fft),
        np.asarray(out_ref.avg_signal_fft),
        rtol=1e-5,
        atol=1e-6,
    )
    # pixel-grid outputs keep the pixel sharding
    assert not out_sh.fft.sharding.is_fully_replicated


@needs_mesh
def test_sharded_deconvolution_matches_unsharded():
    import os

    from thz_image_explorer_tpu.io import load_psf
    from thz_image_explorer_tpu.ops.deconvolution import (
        DeconvolutionParams,
        deconvolve_cube,
        plan_bands,
    )

    psf_path = "/root/reference/sample_data/psf.npz"
    if not os.path.exists(psf_path):
        pytest.skip("no psf fixture")
    psf = load_psf(psf_path)
    cube = _cube(w=24, h=24, n=64, seed=3)
    params = DeconvolutionParams(
        n_iterations=5, n_filters=4, start_freq=0.25, end_freq=3.0
    )
    geo = plan_bands(params, psf, np.asarray(cube.time), (24, 24), 1.0, 1.0)
    assert geo is not None

    ref = np.asarray(deconvolve_cube(cube.data, geo))

    mesh = make_mesh()
    sharded = shard_cube(cube, mesh)
    with mesh:
        got = deconvolve_cube(sharded.data, geo, chunk_size=2)
    got = np.asarray(got)

    scale = np.nanmax(np.abs(ref)) or 1.0
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)


@needs_mesh
def test_sharded_publish_program():
    """The single-dispatch publish program partitions over the mesh."""
    from thz_image_explorer_tpu.ops.fourier import forward_fft, inverse_fft
    from thz_image_explorer_tpu.ops.windows import WindowType
    from thz_image_explorer_tpu.pipeline.publish import gather_publish

    cube = _cube()
    mesh = make_mesh()
    sharded = shard_cube(cube, mesh)
    with mesh:
        f = forward_fft(sharded, WindowType.ADAPTED_BLACKMAN, 1.0, 7.0)
        f = inverse_fft(f, False)
        masks = np.zeros((2, 16, 16), np.float32)
        masks[0, :4, :4] = 1.0
        masks[1, 8:, 8:] = 1.0
        host = gather_publish(sharded, f, f, masks, (3, 5), False)
    assert host["image"].shape == (16, 16)
    assert host["roi_amp"].shape[0] == 2
    assert np.isfinite(host["image"]).all()
    assert np.isfinite(host["roi_trace"]).all()


@needs_mesh
def test_sharded_large_grid_matches_unsharded():
    """Scale check (VERDICT r1 #4): a 256x256 pixel grid — past the toy
    16x16 shapes — sharded over the full 8-device mesh reproduces the
    unsharded chain bit-for-bit within f32 tolerance."""
    cube = _cube(w=256, h=256, n=32, seed=7)
    params = StepParams.defaults()
    cfg = StepConfig(fd_active=True, notch_active=True,
                     td_before_active=True, td_after_active=True)

    out_ref, img_ref = interactive_update(cube, params, cfg)

    mesh = make_mesh()
    sharded = shard_cube(cube, mesh)
    with mesh:
        out_sh, img_sh = interactive_update(sharded, params, cfg)

    np.testing.assert_allclose(
        np.asarray(img_sh), np.asarray(img_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_sh.avg_signal_fft),
        np.asarray(out_ref.avg_signal_fft),
        rtol=1e-5, atol=1e-6,
    )
    assert not out_sh.fft.sharding.is_fully_replicated


@needs_mesh
def test_product_executor_sharded_matches_unsharded():
    """The PRODUCT pipeline (fused executor with sparse materialization)
    runs SPMD on the mesh: feeding a pixel-sharded cube through
    Pipeline.set_input reproduces the unsharded run, outputs keep the
    pixel sharding, and the raw-spectrum partial view is served."""
    from thz_image_explorer_tpu.pipeline.executor import Pipeline

    def build(cube):
        p = Pipeline(record_timings=False)
        for uuid in ("time_band_pass_before_fft", "frequency_band_pass",
                     "water_vapor_notch", "time_band_pass_after_fft"):
            p.filters[uuid].active = True
        p.set_input(cube)
        p.config.fft_window[0] = 1.5
        p.run_from(p.fft_index)  # a slider-style fused update
        return p

    cube = _cube(w=32, h=32, n=64, seed=3)
    p_ref = build(cube)

    mesh = make_mesh()
    sharded = shard_cube(cube, mesh)
    with mesh:
        p_sh = build(sharded)

    np.testing.assert_allclose(
        np.asarray(p_sh.output.data), np.asarray(p_ref.output.data),
        rtol=1e-5, atol=1e-5,
    )
    v_sh, v_ref = p_sh.raw_fd_view(), p_ref.raw_fd_view()
    np.testing.assert_allclose(
        np.asarray(v_sh.amplitudes), np.asarray(v_ref.amplitudes),
        rtol=1e-5, atol=1e-5,
    )
    assert not p_sh.output.data.sharding.is_fully_replicated
