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
