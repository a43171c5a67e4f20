"""One-pass spectral-reduction kernel vs the XLA reduction path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thz_image_explorer_tpu.ops.pallas_specred import (
    _plan_blocks,
    specred_supported,
    spectral_reduction_sums,
)


def _oracle(c, s, masks):
    amp = np.sqrt(c * c + s * s)
    ang = np.arctan2(s, c)
    d = ang[:, 1:] - ang[:, :-1]
    w = d - 2 * np.pi * (d > np.pi) + 2 * np.pi * (d < -np.pi)
    inc = np.concatenate([ang[:, :1], w], axis=1)
    return (masks @ amp, masks @ inc, masks @ c, masks @ s)


@pytest.mark.parametrize("mxu", ["1", "0"])
@pytest.mark.parametrize(
    "n,f,m",
    [
        (64, 33, 1),
        (256, 513, 5),
        (80, 129, 3),
        # n > the single-block VMEM cap with no dividing 128-multiple:
        # exercises the lane-aligned zero-padding path (block 640,
        # padded to 1280 at f=513 — the real-TPU Mosaic constraint)
        (1000, 513, 3),
    ],
)
def test_specred_matches_oracle(n, f, m, mxu, monkeypatch):
    # mxu="1": MXU split-bf16 masked sums (default, ~2^-18 rel error);
    # mxu="0": exact f32 VPU adds. Same tolerances hold for both.
    monkeypatch.setenv("THZ_SPECRED_MXU", mxu)
    rng = np.random.default_rng(n + f)
    c = np.float32(rng.standard_normal((n, f)))
    s = np.float32(rng.standard_normal((n, f)))
    masks = np.float32(rng.uniform(0, 1, (m, n)) > 0.4)
    out = spectral_reduction_sums(
        jnp.asarray(c), jnp.asarray(s), jnp.asarray(masks)
    )
    ref = _oracle(c, s, masks)
    names = ["amp", "inc", "cos", "sin"]
    for o, r, name in zip(out, ref, names):
        np.testing.assert_allclose(
            np.asarray(o), r, atol=5e-4, rtol=1e-5, err_msg=name
        )


def test_specred_inc_means_finish_to_unwrap_means():
    """Row 0 (valid mask) inc sums, divided and cumsummed, equal the mean
    of per-row unwrapped phases — the lean publisher's contract."""
    from thz_image_explorer_tpu.ops.fourier import finish_unwrap, unwrap

    rng = np.random.default_rng(0)
    n, f = 64, 65
    c = np.float32(rng.standard_normal((n, f)))
    s = np.float32(rng.standard_normal((n, f)))
    masks = np.ones((1, n), np.float32)
    _, inc_sums, _, _ = spectral_reduction_sums(
        jnp.asarray(c), jnp.asarray(s), jnp.asarray(masks)
    )
    mean_unwrap = np.asarray(
        unwrap(jnp.asarray(np.arctan2(s, c)))
    ).mean(axis=0)
    got = np.asarray(finish_unwrap(jnp.asarray(inc_sums[0] / n)))
    np.testing.assert_allclose(got, mean_unwrap, atol=1e-4)


def test_plan_blocks_and_support():
    # bench grid 200x200: no 128-multiple divides 40000, so the plan
    # pads to a block multiple (the Mosaic lane rule for the masks tile)
    b, n_pad = _plan_blocks(40000, 513)
    assert b % 128 == 0 and n_pad % b == 0 and n_pad >= 40000
    b, n_pad = _plan_blocks(43264, 513)  # bucketed 208x208: 256 divides
    assert b % 128 == 0 and 43264 % b == 0 and n_pad == 43264
    # tiny grids take the single-block path (block == array dim is
    # exempt from the 128-lane rule)
    assert _plan_blocks(24, 513) == (24, 24)
    # %8-misaligned row counts below the cap pad up to a 128 block
    b, n_pad = _plan_blocks(7, 513)
    assert b == 128 and n_pad == 128
    # an F too large for even one 128-row block refuses
    assert _plan_blocks(40000, 8193) is None
    assert not specred_supported(40000, 513, 17, sharded=False)  # mask cap
    assert not specred_supported(40000, 513, 5, sharded=True)


def test_lean_update_specred_matches_xla_path(monkeypatch):
    """lean_update with the one-pass kernel (forced via interpret) must
    publish the same reductions as the XLA mask-matmul path — incl. with
    the FD band-pass + notch active (the per-frequency masks factor out
    of the sums) and on a bucket-padded grid."""
    import jax.numpy as jnp

    from make_sample import synthetic_scan
    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig, StepParams, lean_update,
    )

    t, raw = synthetic_scan(width=10, height=8, n_time=64)
    data = np.pad(np.asarray(raw, np.float32), ((0, 6), (0, 8), (0, 0)))
    cube = make_cube(t, data, dx=0.5, dy=0.5, valid_wh=(10, 8))
    params = StepParams.defaults()
    cfg = StepConfig(fd_active=True, notch_active=True)
    masks = np.zeros((4, 16, 16), np.float32)
    masks[0, 2:6, 2:6] = 1.0
    masks[1, 1:9, 1:7] = 1.0  # mask 2+ left empty: zero-count rule
    pix = jnp.asarray([3, 4], jnp.int32)

    monkeypatch.setenv("THZ_SPECRED", "0")
    ref = lean_update(cube, params, cfg, jnp.asarray(masks), pix)
    monkeypatch.setenv("THZ_SPECRED", "1")
    monkeypatch.setenv("THZ_PALLAS_INTERPRET", "1")
    got = lean_update(cube, params, cfg, jnp.asarray(masks), pix)
    for k in ("avg_fft", "avg_amp", "avg_ph", "roi_amp", "roi_ph",
              "img", "data", "pix_ph", "pix_amp"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]),
            atol=5e-5, rtol=1e-4, err_msg=k,
        )


def test_product_executor_specred_matches(monkeypatch, tmp_path):
    """The PRODUCT lean program with the one-pass kernel publishes the
    same plot values as the mask-matmul path — driven end-to-end through
    the Explorer facade (fused run + lean publish), with ROIs, the FD
    band-pass and the notch active."""
    from make_sample import synthetic_scan, write_scan_thz
    from thz_image_explorer_tpu.pipeline import Explorer

    t, raw = synthetic_scan(width=18, height=14, n_time=64)
    path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)

    def drive():
        ex = Explorer()
        ex.open_file(path)
        ex.set_filter_active("frequency_band_pass", True)
        ex.set_filter_active("water_vapor_notch", True)
        ex.add_roi("u1", "r1", [(1, 1), (8, 1), (8, 8)])
        ex.set_selected_pixel(3, 4)
        ex.set_fft_window_low(1.1)  # fused lean run
        return ex.plot

    monkeypatch.setenv("THZ_SPECRED", "0")
    ref = drive()
    monkeypatch.setenv("THZ_SPECRED", "1")
    monkeypatch.setenv("THZ_PALLAS_INTERPRET", "1")
    got = drive()
    for k in ("avg_signal_fft", "avg_phase_fft", "filtered_signal_fft",
              "filtered_phase_fft", "signal_fft", "phase_fft"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, k)), np.asarray(getattr(ref, k)),
            atol=5e-5, rtol=1e-4, err_msg=k,
        )
    (ga,) = [v for _, v in got.roi_signal_fft.items()] or [None]
    (ra,) = [v for _, v in ref.roi_signal_fft.items()] or [None]
    np.testing.assert_allclose(
        np.asarray(ga[1]), np.asarray(ra[1]), atol=5e-5, rtol=1e-4,
        err_msg="roi fft",
    )


def _break_kernel(monkeypatch):
    """Arm the latch test: specred forced on, the kernel raising (as an
    opaque remote-Mosaic rejection would), latch restored on teardown."""
    from thz_image_explorer_tpu.ops import pallas_specred as psr

    monkeypatch.setattr(psr, "_RUNTIME_BROKEN", [False])
    monkeypatch.setenv("THZ_SPECRED", "1")
    monkeypatch.setenv("THZ_PALLAS_INTERPRET", "1")

    def boom(*a, **k):
        raise RuntimeError("Mosaic failed to legalize (simulated)")

    monkeypatch.setattr(psr, "lean_spectral_outputs", boom)
    return psr


def test_lean_update_specred_compile_failure_falls_back(monkeypatch):
    """A specred kernel failure at first compile must NOT kill the bench
    step: lean_update latches the kernel off process-wide and retries
    with the XLA reductions, producing identical outputs."""
    import jax.numpy as jnp

    from make_sample import synthetic_scan
    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig, StepParams, lean_update,
    )

    t, raw = synthetic_scan(width=10, height=8, n_time=64)
    data = np.pad(np.asarray(raw, np.float32), ((0, 6), (0, 8), (0, 0)))
    cube = make_cube(t, data, dx=0.5, dy=0.5, valid_wh=(10, 8))
    params = StepParams.defaults()
    cfg = StepConfig(fd_active=True, notch_active=True)
    masks = np.zeros((2, 16, 16), np.float32)
    masks[0, 2:6, 2:6] = 1.0
    pix = jnp.asarray([3, 4], jnp.int32)

    monkeypatch.setenv("THZ_SPECRED", "0")
    ref = lean_update(cube, params, cfg, jnp.asarray(masks), pix)

    psr = _break_kernel(monkeypatch)
    got = lean_update(cube, params, cfg, jnp.asarray(masks), pix)
    assert psr.is_runtime_broken()
    for k in ("avg_amp", "avg_ph", "roi_amp", "roi_ph", "img"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]),
            atol=5e-5, rtol=1e-4, err_msg=k,
        )
    # non-specred failures must re-raise, not loop
    psr._RUNTIME_BROKEN[0] = False
    monkeypatch.setenv("THZ_SPECRED", "0")

    def boom2(*a, **k):
        raise RuntimeError("unrelated")

    from thz_image_explorer_tpu.parallel import step as step_mod

    monkeypatch.setattr(step_mod, "_lean_update_jit", boom2)
    with pytest.raises(RuntimeError, match="unrelated"):
        lean_update(cube, params, cfg, jnp.asarray(masks), pix)
    assert not psr.is_runtime_broken()


def test_product_executor_specred_compile_failure_falls_back(
    monkeypatch, tmp_path
):
    """The PRODUCT lean dispatch survives a specred kernel failure: the
    executor rebuilds the merged program with the XLA reductions in
    place and the published plot values are unchanged."""
    from make_sample import synthetic_scan, write_scan_thz
    from thz_image_explorer_tpu.pipeline import Explorer

    t, raw = synthetic_scan(width=18, height=14, n_time=64)
    path = write_scan_thz(str(tmp_path / "s.thzimg"), t, raw)

    def drive():
        ex = Explorer()
        ex.open_file(path)
        ex.set_filter_active("frequency_band_pass", True)
        ex.add_roi("u1", "r1", [(1, 1), (8, 1), (8, 8)])
        ex.set_selected_pixel(3, 4)
        ex.set_fft_window_low(1.1)  # fused lean run
        return ex.plot

    monkeypatch.setenv("THZ_SPECRED", "0")
    ref = drive()

    psr = _break_kernel(monkeypatch)
    got = drive()
    assert psr.is_runtime_broken()
    for k in ("avg_signal_fft", "avg_phase_fft", "filtered_signal_fft",
              "filtered_phase_fft", "signal_fft", "phase_fft"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, k)), np.asarray(getattr(ref, k)),
            atol=5e-5, rtol=1e-4, err_msg=k,
        )


def test_fd_weight_vector_contract():
    """Every FD builtin's fused_apply must equal multiplying the
    spectrum by its fd_weight_vector — the factorization the one-pass
    reduction dispatch relies on (a stage edit that breaks this must
    fail here, not silently skew the published means)."""
    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.pipeline.stage import instantiate_filters

    rng = np.random.default_rng(1)
    t = (np.arange(64) * 0.05).astype(np.float32)
    data = np.float32(rng.standard_normal((6, 5, 64)))
    cube = make_cube(t, data, dx=1.0, dy=1.0)
    spec = jnp.asarray(
        np.float32(rng.standard_normal((6, 5, 33)))
        + 1j * np.float32(rng.standard_normal((6, 5, 33)))
    )
    cube = cube.replace(fft=spec.astype(jnp.complex64),
                        amplitudes=jnp.abs(spec).astype(jnp.float32))

    filters = instantiate_filters()
    fd = [f for f in filters.values() if hasattr(f, "fd_weight_vector")]
    assert len(fd) >= 2  # band-pass + notch
    for stage in fd:
        stage.active = True
        params = stage.traced_params()
        out = stage.fused_apply(cube, params, ())
        w = np.asarray(stage.fd_weight_vector(cube.freq, params))
        assert (w >= 0).all() and (w <= 1.0 + 1e-6).all()
        np.testing.assert_allclose(
            np.asarray(out.fft), np.asarray(cube.fft) * w,
            atol=1e-6, err_msg=stage.config().name,
        )
        np.testing.assert_allclose(
            np.asarray(out.amplitudes), np.asarray(cube.amplitudes) * w,
            atol=1e-6, err_msg=stage.config().name,
        )


def test_plan_blocks_lane_alignment_is_mandatory():
    """The row block is also the masks operand's LANE tile: the real
    Mosaic toolchain REQUIRES a 128-multiple (or block == array dim) —
    a %8-only block was rejected at lowering on the real TPU
    (2026-08-18), so every multi-block plan must be 128-aligned."""
    b, n_pad = _plan_blocks(208 * 208, 513)  # the bucketed bench shape
    assert b % 128 == 0 and n_pad % b == 0
    # a row count with no 128-multiple divisor is padded, never %8-tiled
    b2, n_pad2 = _plan_blocks(200 * 200, 513)
    assert b2 % 128 == 0 and n_pad2 % b2 == 0 and n_pad2 >= 200 * 200


def test_spectral_reduction_sums_enforces_contract():
    """The documented refusals live in the function, not only in the
    callers' gate: deep mask stacks raise instead of compiling an
    unbounded unroll."""
    import jax.numpy as jnp
    import pytest as _pytest

    from thz_image_explorer_tpu.ops.pallas_specred import (
        spectral_reduction_sums,
    )

    c = jnp.zeros((64, 16), jnp.float32)
    m = jnp.zeros((17, 64), jnp.float32)
    with _pytest.raises(ValueError, match="mask stack"):
        spectral_reduction_sums(c, c, m)
