"""Handling-qualities utility tests (reference:
adflow/pyDynamicPerformance.py + pyPerformanceClass.py)."""

import math

import pytest

from adflow_tpu.utils.performance import (
    control_anticipation_parameter, handling_qualities, n_alpha,
    short_period_frequency_damping, thumbnail_constraint)


def test_short_period_analytic():
    """Hand-evaluated McRuer 2-DOF approximation on round numbers."""
    # Mq = -2*1*100*4/(4*1e5) = -0.002;  Zw = -(5+0.02)*1*20*100/(2*1e4)
    wsp, zeta = short_period_frequency_damping(
        cmq=-2.0, clalpha=5.0, cd=0.02, cmalpha=-1.5, cmalphadot=-1.0,
        mass=1e4, Iy=1e5, rho=1.0, area=20.0, U=100.0, chord=2.0)
    mq = -2.0 * 1.0 * 20.0 * 100.0 * 4.0 / (4.0 * 1e5)
    zw = -(5.0 + 0.02) * 1.0 * 20.0 * 100.0 / (2.0 * 1e4)
    malpha = -1.5 * 1.0 * 20.0 * 100.0 ** 2 * 2.0 / (2.0 * 1e5)
    madot = -1.0 * 1.0 * 20.0 * 100.0 * 4.0 / (4.0 * 1e5)
    assert wsp == pytest.approx(math.sqrt(mq * zw - malpha), rel=1e-12)
    assert zeta == pytest.approx(-(zw + mq + madot) / (2 * wsp), rel=1e-12)


def test_short_period_unstable_raises():
    with pytest.raises(ValueError, match="unstable"):
        short_period_frequency_damping(
            cmq=0.0, clalpha=0.0, cd=0.0, cmalpha=3.0, cmalphadot=0.0,
            mass=1e4, Iy=1e5, rho=1.0, area=20.0, U=100.0, chord=2.0)


def test_cap_and_nalpha():
    na = n_alpha(clalpha=5.0, rho=1.0, area=20.0, U=100.0, mass=1e4)
    assert na == pytest.approx(1.0e6 / (2e4 * 9.80665), rel=1e-12)
    assert control_anticipation_parameter(2.0, na) == pytest.approx(4.0 / na)


def test_thumbnail_regions():
    """Center of the satisfactory ellipse is inside (<0), far-away
    frequency/damping points are outside (>0)."""
    assert thumbnail_constraint(3.01, 0.76) < 0.0
    assert thumbnail_constraint(20.0, 0.76) > 0.0
    assert thumbnail_constraint(3.01, 3.0) > 0.0
    assert thumbnail_constraint(0.2, 0.05) > 0.0


def test_handling_qualities_bridge():
    """ts_stab dict (solver time-spectral output keys) -> metric dict."""
    ts = {"clalpha": 5.5, "cmzalpha": -1.2, "cmzalphadot": -3.0}
    out = handling_qualities(ts, mass=5e4, Iy=3e6, rho=0.41, area=120.0,
                             U=230.0, chord=5.0, cd=0.025)
    assert set(out) == {"wsp", "damping", "n_alpha", "cap", "thumbnail"}
    assert out["wsp"] > 0 and out["damping"] > 0
    assert out["cap"] == pytest.approx(out["wsp"] ** 2 / out["n_alpha"])
