"""Executable checks of the browser-side pure logic (VERDICT r2 #8).

No JS engine exists here, so the logic is mirrored in
``thz_image_explorer_tpu.viz.jslogic`` and pinned two ways: the mirrors
are exercised on edge cases, and the embedded JS source is asserted to
contain the exact same constants/formulas so mirror and page cannot
drift apart silently.
"""

import math
import re

import pytest

from thz_image_explorer_tpu import web
from thz_image_explorer_tpu.viz import jslogic as jl


# ------------------------------------------------------------ mirrors
def test_roi_close_rule_boundary():
    """5% of the LARGER dimension, strict < (matrix_plot.rs:569-637)."""
    shape = (100, 40)
    tol = 5.0  # 0.05 * 100
    assert jl.roi_click_closes((10, 10), (10 + tol - 0.01, 10), shape)
    assert not jl.roi_click_closes((10, 10), (10 + tol, 10), shape)  # strict
    # diagonal distance counts (hypot, not per-axis): (4,4) is 5.66 > 5
    assert not jl.roi_click_closes((0, 0), (4, 4), shape)
    assert jl.roi_click_closes((0, 0), (3, 3), shape)


def test_roi_close_uses_larger_dimension():
    assert jl.roi_click_closes((0, 0), (4, 0), (100, 10))
    assert not jl.roi_click_closes((0, 0), (4, 0), (10, 10))  # tol = 0.5


def test_display_to_pixel_flip():
    """Click mapping flips y: the displayed row 0 is data y = H-1
    (matrix_plot.rs:409-426)."""
    assert jl.display_to_pixel(0.0, 0.0, 2.0, 20) == (0, 19)
    assert jl.display_to_pixel(5.0, 38.0, 2.0, 20) == (2, 0)
    # floor, not round
    assert jl.display_to_pixel(3.9, 0.0, 2.0, 20)[0] == 1


def test_gauge_mapping():
    # linear: T_S 0..400 K
    assert jl.gauge_value_deg(0, 0, 400, False) == jl.GAUGE_A0
    assert jl.gauge_value_deg(400, 0, 400, False) == jl.GAUGE_A1
    assert jl.gauge_value_deg(200, 0, 400, False) == pytest.approx(
        (jl.GAUGE_A0 + jl.GAUGE_A1) / 2
    )
    # clamped outside the range
    assert jl.gauge_value_deg(900, 0, 400, False) == jl.GAUGE_A1
    assert jl.gauge_value_deg(-5, 0, 400, False) == jl.GAUGE_A0
    # log: p0 1e-8..1e3 mbar — decades are equidistant
    d1 = jl.gauge_value_deg(1e-7, 1e-8, 1e3, True) - jl.gauge_value_deg(
        1e-8, 1e-8, 1e3, True
    )
    d2 = jl.gauge_value_deg(1e-2, 1e-8, 1e3, True) - jl.gauge_value_deg(
        1e-3, 1e-8, 1e3, True
    )
    assert d1 == pytest.approx(d2)
    # values below the floor clamp to the floor (Math.max(value, minI))
    assert jl.gauge_value_deg(0.0, 1e-8, 1e3, True) == jl.GAUGE_A0


def test_gauge_angle_convention():
    """ang(d) = (180 - d)·π/180 — 0° points left (x = -cos phi)."""
    assert jl.gauge_angle_rad(0) == pytest.approx(math.pi)
    assert jl.gauge_angle_rad(90) == pytest.approx(math.pi / 2)
    assert jl.gauge_angle_rad(180) == pytest.approx(0.0)


# ------------------------------------------- mirror <-> JS source pins
def test_js_roi_close_rule_matches_mirror():
    frac = jl.ROI_CLOSE_FRACTION
    pat = (
        rf"const tol = {frac}\*Math\.max\(S\.image_shape\[0\], "
        rf"S\.image_shape\[1\]\);\s*"
        r"if \(Math\.hypot\(fx-x, fy-y\) < tol\)"
    )
    assert re.search(pat, web.PAGE), (
        "the page's ROI auto-close rule no longer matches "
        "viz.jslogic.ROI_CLOSE_FRACTION / the hypot-strict-< structure"
    )


def test_js_click_mapping_matches_mirror():
    assert re.search(
        r"const x = Math\.floor\(\(ev\.clientX-r\.left\)/imgScale\);\s*"
        r"const y = H-1-Math\.floor\(\(ev\.clientY-r\.top\)/imgScale\);",
        web.PAGE,
    ), "the page's click->pixel mapping (floor + y flip) drifted"


def test_js_gauge_constants_match_mirror():
    a0, a1 = int(jl.GAUGE_A0), int(jl.GAUGE_A1)
    assert re.search(rf"const A0 = {a0}, A1 = {a1};", web.PAGE)
    assert re.search(
        r"const ang = d => \(180 - d\) \* Math\.PI / 180;", web.PAGE
    )
    assert re.search(
        r"\(Math\.log10\(Math\.max\(value, minI\)\) - Math\.log10\(minI\)\)"
        r" / \(Math\.log10\(maxI\) - Math\.log10\(minI\)\)",
        web.PAGE,
    )
    assert re.search(
        r"const vdeg = A0 \+ Math\.max\(0, Math\.min\(1, frac\)\) \* \(A1 - A0\);",
        web.PAGE,
    )
