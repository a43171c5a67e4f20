"""Regression tests for the round-5 gate/robustness fixes (VERDICT r4
task 1, advisor r4 items): parseable bench headline, hermetic multichip
dryrun, narrowed specred latch, single-source specred tri-state."""

from __future__ import annotations

import json
import sys

import numpy as np
import pytest


# ------------------------------------------------------- bench headline
def _bench_module():
    import importlib.util
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(here, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_headline_line_is_compact_and_parseable():
    bench = _bench_module()
    extra = {k: 1.23 for k in bench.HEADLINE_KEYS}
    extra["first_open"] = {k: 9.9 for k in bench.HEADLINE_FIRSTOPEN_KEYS}
    # a huge sub-record that used to blow the driver's 2000-char budget
    extra["scale_ceiling"] = {f"k{i}": "x" * 50 for i in range(100)}
    result = {
        "metric": "full-image update latency p50 (...)",
        "value": 5.8,
        "unit": "ms",
        "vs_baseline": 300.0,
        "extra": extra,
    }
    line = bench.headline_line(result)
    assert len(line) < 1900
    parsed = json.loads(line)
    # every promoted headline field survives; the bulk extras don't
    for k in bench.HEADLINE_KEYS + bench.HEADLINE_FIRSTOPEN_KEYS:
        assert k in parsed
    assert "scale_ceiling" not in parsed
    assert parsed["full_record"] == "BENCH_FULL.json"
    assert parsed["value"] == 5.8


def test_headline_line_truncates_rather_than_overflow():
    bench = _bench_module()
    result = {
        "metric": "m" * 3000,
        "value": 1.0,
        "unit": "ms",
        "vs_baseline": None,
        "extra": {},
    }
    line = bench.headline_line(result)
    assert len(line) < 1900
    assert json.loads(line)["value"] == 1.0


# --------------------------------------------- specred latch narrowing
def test_latchable_specred_error_markers():
    from thz_image_explorer_tpu.ops.pallas_specred import (
        latchable_specred_error,
    )

    assert latchable_specred_error(
        RuntimeError("Mosaic lowering failed: RET_CHECK")
    )
    assert latchable_specred_error(
        ValueError("tpu_custom_call: something rejected")
    )
    # marker anywhere in the __cause__ chain is found
    try:
        try:
            raise RuntimeError("pallas kernel blew up in VMEM planning")
        except RuntimeError as inner:
            raise ValueError("dispatch failed") from inner
    except ValueError as chained:
        assert latchable_specred_error(chained)
    # an unrelated failure must NOT be latchable (advisor r4: a real
    # defect was maskable by the process-wide latch)
    assert not latchable_specred_error(ValueError("shapes (3,4) and (5,)"))
    assert not latchable_specred_error(MemoryError("RESOURCE_EXHAUSTED hbm"))


def test_latchable_specred_error_survives_cycles():
    from thz_image_explorer_tpu.ops.pallas_specred import (
        latchable_specred_error,
    )

    a = ValueError("x")
    b = ValueError("y")
    a.__context__ = b
    b.__context__ = a  # cyclic context chain must not hang
    assert not latchable_specred_error(a)


def test_lean_update_unrelated_error_not_latched(monkeypatch):
    """A specred-bearing lean trace failing with a NON-kernel error must
    re-raise instead of silently degrading to the XLA reductions."""
    import jax.numpy as jnp

    from thz_image_explorer_tpu.ops import pallas_specred as psr
    from thz_image_explorer_tpu.parallel import step as step_mod

    monkeypatch.setenv("THZ_SPECRED", "1")
    monkeypatch.setenv("THZ_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(psr, "_RUNTIME_BROKEN", [False])

    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise ValueError("completely unrelated bug in user code")

    monkeypatch.setattr(step_mod, "_lean_update_jit", boom)
    from make_sample import synthetic_scan
    from thz_image_explorer_tpu.data import make_cube
    from thz_image_explorer_tpu.parallel.step import (
        StepConfig,
        StepParams,
        lean_update,
    )

    t, raw = synthetic_scan(width=8, height=8, n_time=64)
    cube = make_cube(t, np.asarray(raw, np.float32), dx=0.5, dy=0.5,
                     valid_wh=(8, 8))
    masks = np.zeros((1, 8, 8), np.float32)
    with pytest.raises(ValueError, match="unrelated"):
        lean_update(cube, StepParams.defaults(), StepConfig(),
                    jnp.asarray(masks), jnp.asarray([0, 0], jnp.int32))
    assert calls["n"] == 1  # no silent retry
    assert not psr.is_runtime_broken()  # and no latch


# --------------------------------------- specred tri-state single source
def test_specred_supported_consults_env(monkeypatch):
    from thz_image_explorer_tpu.ops import pallas_specred as psr

    monkeypatch.setattr(psr, "_RUNTIME_BROKEN", [False])
    monkeypatch.setenv("THZ_PALLAS_INTERPRET", "1")
    # unset/auto resolves to OFF in the predicate too (advisor r4): this
    # predicate alone can never enable the recorded-dead-end kernel
    monkeypatch.delenv("THZ_SPECRED", raising=False)
    assert not psr.specred_supported(1024, 513, 4, sharded=False)
    monkeypatch.setenv("THZ_SPECRED", "0")
    assert not psr.specred_supported(1024, 513, 4, sharded=False)
    monkeypatch.setenv("THZ_SPECRED", "1")
    assert psr.specred_supported(1024, 513, 4, sharded=False)


def test_specred_supported_plans_with_padded_f(monkeypatch):
    """Predicate and kernel call must agree near the VMEM cap: the call
    plans with the 128-lane-padded F (advisor r4)."""
    from thz_image_explorer_tpu.ops import pallas_specred as psr

    monkeypatch.setattr(psr, "_RUNTIME_BROKEN", [False])
    monkeypatch.setenv("THZ_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("THZ_SPECRED", "1")
    # find an F where the unpadded plan fits but the padded one refuses
    f = None
    for cand in range(8193 - 127, 8194):
        pad = -(-cand // 128) * 128
        if psr._plan_blocks(1024, cand) is not None and (
            psr._plan_blocks(1024, pad) is None
        ):
            f = cand
            break
    if f is None:
        pytest.skip("no F straddles the padded-plan boundary")
    assert not psr.specred_supported(1024, f, 4, sharded=False)


# ------------------------------------------------- progressive open
def _write_scan(tmp_path, w=20, h=18, nt=64):
    import os

    from make_sample import synthetic_scan, write_scan_thz

    p = os.path.join(str(tmp_path), "scan.thzimg")
    t, cube = synthetic_scan(width=w, height=h, n_time=nt)
    write_scan_thz(p, t, cube, dx=0.5, dy=0.5)
    return p


def test_open_file_direct_call_stays_synchronous(tmp_path):
    """Library callers without a worker keep the single-phase contract:
    open_file returns with the device results published."""
    from thz_image_explorer_tpu.pipeline import Explorer

    p = _write_scan(tmp_path)
    ex = Explorer()
    ex.open_file(p)
    assert not ex.preview_pending
    assert ex.pipeline.input is not None
    assert ex.plot.signal_fft.size  # full publish ran
    assert ex.image is not None and ex.image.shape == (20, 18)


def test_preview_served_while_device_phase_blocked(tmp_path, monkeypatch):
    """VERDICT r4 task 3: a usable image + trace must be served while the
    device phase (compile) is still pending, marked preview."""
    import threading
    import time

    from thz_image_explorer_tpu.io import dotthz as dotthz_mod
    from thz_image_explorer_tpu.web import WebApp

    p = _write_scan(tmp_path)
    gate = threading.Event()
    entered = threading.Event()
    real = dotthz_mod.finalize_scan

    def slow_finalize(host):
        entered.set()
        assert gate.wait(timeout=30), "test gate never released"
        return real(host)

    monkeypatch.setattr(dotthz_mod, "finalize_scan", slow_finalize)
    app = WebApp()
    try:
        app.worker.send("open_file", p)
        assert entered.wait(timeout=30)  # device phase is now blocked
        # poll while blocked: the snapshot captured after the host phase
        # must carry the preview image, trace, and the preview marker
        deadline = time.monotonic() + 10
        snap = None
        while time.monotonic() < deadline:
            snap = app.state()
            if snap.get("preview") and snap.get("image"):
                break
            time.sleep(0.1)
        assert snap is not None and snap["preview"], snap and {
            k: snap.get(k) for k in ("preview", "busy", "file")
        }
        assert snap["image"], "preview image missing while compiling"
        assert snap["image_shape"] == [20, 18]
        assert snap["file"] == p
        assert len(snap["plots"]["signal"]) > 0  # selected-pixel trace
        # release the device phase; final state loses the preview marker
        gate.set()
        assert app.worker.join_idle(timeout=60)
        final = app.state()
        assert not final["preview"]
        assert len(final["plots"]["filtered_signal_fft"]) > 0
    finally:
        gate.set()
        app.worker.close()


def test_drained_finalize_self_heals(tmp_path):
    """If the deferred device phase is lost (abort drained the queue),
    the next command that needs device state completes the open."""
    from thz_image_explorer_tpu.pipeline import Explorer

    p = _write_scan(tmp_path)
    ex = Explorer()
    ex.defer = lambda *a: None  # swallow the deferred command
    ex.open_file(p)
    assert ex.preview_pending
    assert ex.pipeline.input is None
    assert ex.plot.signal.size and not ex.plot.signal_fft.size  # preview
    ex.set_fft_window_low(1.0)  # publish() self-heals
    assert not ex.preview_pending
    assert ex.pipeline.input is not None
    assert ex.plot.signal_fft.size


def test_rapid_sibling_opens_finalize_only_latest(tmp_path):
    """Arrow-key skipping: a stale deferred finalize is superseded by a
    newer open (epoch guard) — only the last scan pays the device phase."""
    from thz_image_explorer_tpu.io import dotthz as dotthz_mod
    from thz_image_explorer_tpu.pipeline import Explorer

    p1 = _write_scan(tmp_path, w=20, h=18)
    import os

    from make_sample import synthetic_scan, write_scan_thz

    p2 = os.path.join(str(tmp_path), "scan2.thzimg")
    t, cube = synthetic_scan(width=24, height=22, n_time=64)
    write_scan_thz(p2, t, cube, dx=0.5, dy=0.5)

    ex = Explorer()
    deferred = []
    ex.defer = lambda m, *a: deferred.append((m, a))
    ex.open_file(p1)
    ex.open_file(p2)
    assert len(deferred) == 2
    n_finalized = [0]
    real = dotthz_mod.finalize_scan

    def counting(host):
        n_finalized[0] += 1
        return real(host)

    dotthz_mod.finalize_scan, orig = counting, dotthz_mod.finalize_scan
    try:
        for m, a in deferred:  # worker would replay in order
            getattr(ex, m)(*a)
    finally:
        dotthz_mod.finalize_scan = orig
    assert n_finalized[0] == 1  # stale epoch skipped
    assert ex.image.shape == (24, 22)
    assert not ex.preview_pending


def test_failed_device_phase_rolls_facade_back(tmp_path):
    """A failed phase 2 (e.g. h2d ResourceExhausted) must leave the
    facade agreeing with pipeline.input — rolled back to the previous
    scan, exactly as atomic as the old single-phase open_file."""
    import os

    from make_sample import synthetic_scan, write_scan_thz
    from thz_image_explorer_tpu.io import dotthz as dotthz_mod
    from thz_image_explorer_tpu.pipeline import Explorer

    p1 = _write_scan(tmp_path, w=20, h=18)
    p2 = os.path.join(str(tmp_path), "scan2.thzimg")
    t, cube = synthetic_scan(width=24, height=22, n_time=64)
    write_scan_thz(p2, t, cube, dx=0.5, dy=0.5)

    ex = Explorer()
    ex.open_file(p1)  # synchronous single-phase: fully published
    img1, meta1, hk1 = ex.image, ex.metadata, ex.housekeeping

    def boom(host):
        raise RuntimeError("synthetic h2d failure")

    dotthz_mod.finalize_scan, orig = boom, dotthz_mod.finalize_scan
    try:
        with pytest.raises(RuntimeError, match="synthetic h2d"):
            ex.open_file(p2)
    finally:
        dotthz_mod.finalize_scan = orig
    assert ex.file_path == p1
    assert ex.image is img1
    assert ex.metadata is meta1
    assert ex.housekeeping is hk1
    assert not ex.preview_pending  # no retry-loop on later commands
    # the facade still drives the scan-1 pipeline
    ex.set_fft_window_low(1.0)
    assert ex.plot.signal_fft.size
    assert ex.image.shape == (20, 18)


def test_finalize_publish_runs_with_preview_marker(tmp_path):
    """preview_pending holds through the finalize's own first publish
    (the compile-heavy part a state poll sees), and the _finalizing
    guard keeps that publish's _ensure_open_finalized from recursing
    into the finalize — which would re-run the h2d transfer."""
    from thz_image_explorer_tpu.io import dotthz as dotthz_mod
    from thz_image_explorer_tpu.pipeline import Explorer

    p = _write_scan(tmp_path)
    ex = Explorer()
    deferred = []
    ex.defer = lambda m, *a: deferred.append((m, a))
    ex.open_file(p)
    assert deferred and ex.preview_pending

    n_final = [0]
    real = dotthz_mod.finalize_scan

    def counting(host):
        n_final[0] += 1
        return real(host)

    seen = []
    real_publish = ex.publish

    def spying_publish():
        seen.append(ex.preview_pending)
        real_publish()

    ex.publish = spying_publish
    dotthz_mod.finalize_scan = counting
    try:
        ex._finalize_open(deferred[0][1][0])
    finally:
        dotthz_mod.finalize_scan = real
    assert n_final[0] == 1  # the guard stopped any recursion
    assert seen == [True]  # the publish saw the preview marker
    assert not ex.preview_pending


# -------------------------------------------------- hermetic dryrun gate
def test_dryrun_multichip_hermetic_and_restores_default_device():
    """The multi-chip gate must run green on the virtual CPU mesh, leave
    jax_default_device as it found it, and leak no off-platform buffers
    (MULTICHIP_r04 died in a device_put that landed on the default TPU)."""
    import os
    import sys as _sys

    import jax

    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge

    prev = jax.config.jax_default_device
    ge.dryrun_multichip(8)
    assert jax.config.jax_default_device == prev


# -------------------------------------------------- transfer-path warmup
def test_warm_transfer_paths_once_per_process_and_wired():
    """utils.warmup pays the backend's first-d2h init (0.2-476 s bimodal
    on the axon tunnel, scripts/probe_tunnel.py) once per process;
    Explorer construction fires it in the background so the stall
    overlaps startup instead of the first open's publish."""
    import inspect
    import threading

    from thz_image_explorer_tpu.pipeline.explorer import Explorer
    from thz_image_explorer_tpu.utils import warmup

    secs = warmup.warm_transfer_paths(block=True)
    assert secs is not None and secs >= 0.0
    # second call returns the SAME measurement (once-per-process latch),
    # and leaves no second warmup thread behind
    assert warmup.warm_transfer_paths(block=True) == secs
    names = [t.name for t in threading.enumerate()]
    assert names.count("thz-d2h-warmup") == 0  # daemon thread finished
    # wired into Explorer construction (non-blocking form)
    src = inspect.getsource(Explorer.__init__)
    assert "warm_transfer_paths" in src


# ------------------------------------------- round-5 self-review fixes
def test_queued_mutation_survives_deferred_finalize(tmp_path):
    """A mutating command queued between the open's two phases finalizes
    the open FIRST (single-phase ordering restored by the worker loop):
    its filter-param write must survive instead of being reverted by the
    deferred finalize's reset_filters."""
    import threading

    from thz_image_explorer_tpu.pipeline import Explorer
    from thz_image_explorer_tpu.pipeline.worker import ExplorerWorker

    p = _write_scan(tmp_path)
    w = ExplorerWorker(Explorer())
    try:
        gate = threading.Event()
        # hold the worker so open_file and the mutation are BOTH queued
        # before phase 1 runs — the deferred finalize then lands AFTER
        # the mutation, the exact order that used to revert it
        w.queue.put((lambda ex: gate.wait(30), (), {}))
        w.send("open_file", p)
        w.send("set_filter_param", "time_band_pass_before_fft", "low", 1.25)
        gate.set()
        assert w.join_idle(timeout=120)
        f = w.explorer.pipeline.filters["time_band_pass_before_fft"]
        assert f.low == 1.25, "queued param write reverted by finalize"
        assert not w.explorer.preview_pending
        assert w.explorer.pipeline.input is not None
    finally:
        w.close()


def test_set_view_midpoint_clamped_serverside(tmp_path):
    """The page JS clamps the colorbar midpoint to 1..99, but a raw API
    client can POST anything — the server must clamp too or the numpy
    colormap divides by zero and serves NaN pixels."""
    from thz_image_explorer_tpu.web import WebApp

    p = _write_scan(tmp_path)
    app = WebApp(load_settings=False)
    try:
        app.command("open_file", [p], {})
        assert app.worker.join_idle(timeout=120)
        for raw, want in ((0, 1.0), (100, 99.0), (-5, 1.0), (42.5, 42.5)):
            app.command("set_view", ["midpoint", raw], {})
            assert app.view["midpoint"] == want
            s = app.state()
            assert s["colorbar"] and s["image"]  # PNGs render, no NaN
        app.command("set_view", ["cut_low", -10], {})
        assert app.view["cut_low"] == 0.0
        app.command("set_view", ["cut_high", 250], {})
        assert app.view["cut_high"] == 100.0
    finally:
        app.worker.close()


def test_pseudo_roi_keeps_click_fast_path(tmp_path):
    """open_ref registers a pseudo-ROI (poly None) whose spectra enter
    the publish as VALUES — it must live in the VIEW half of the pub
    epoch, so the pixel-click fast path survives a reference load
    instead of paying a full lean re-dispatch."""
    import os

    import numpy as np

    from make_sample import synthetic_scan, write_pulse_thz
    from thz_image_explorer_tpu.pipeline import Explorer

    p = _write_scan(tmp_path)
    t, cube = synthetic_scan(width=4, height=4, n_time=64)
    pulse = os.path.join(str(tmp_path), "ref.thz")
    write_pulse_thz(pulse, t, np.asarray(cube[0, 0]))

    ex = Explorer()
    ex.open_file(p)
    ex.set_selected_pixel(1, 1)  # establish the click path
    before = ex.pipeline.click_dispatches
    assert before >= 1
    ex.open_ref(pulse)
    ex.set_selected_pixel(2, 2)
    # +2: open_ref's own publish (view key gained a dataset) AND the
    # click both ride the one-pixel program; before the fix both fell
    # back to the full chain re-dispatch (cube key hashed pseudo-ROIs)
    assert ex.pipeline.click_dispatches == before + 2, (
        "reference load bumped the CUBE epoch: publish fell back to "
        "the full chain re-dispatch"
    )
    assert np.isfinite(ex.plot.signal).all()
