# -*- coding: utf-8 -*-
"""Unit conversion semantics (reference: src/mcsas/utils/units.py doctests
at lines 15-35)."""
import math

import pytest

from mcsas_tpu.utils.units import (Angle, Fraction, Length, NM, NoUnit, SLD,
                                   ScatteringIntensity, ScatteringVector,
                                   UnitError, unit_by_kind)


def test_length_nm():
    assert NM.to_si(10.0) == pytest.approx(1e-8)
    assert NM.to_display(1e-8) == pytest.approx(10.0)
    assert NM.magnitude_conversion == pytest.approx(1e-9)


def test_scattering_vector():
    u = ScatteringVector("nm⁻¹")
    assert u.to_si(1.0) == pytest.approx(1e9)
    assert u.to_display(1e9) == pytest.approx(1.0)


def test_sld():
    u = SLD("Å⁻²")
    assert u.to_si(1e-6) == pytest.approx(1e14)


def test_angle_degrees():
    u = Angle("°")
    assert u.to_si(180.0) == pytest.approx(math.pi)


def test_fraction_percent():
    u = Fraction("%")
    assert u.to_si(10.0) == pytest.approx(0.1)


def test_intensity():
    u = ScatteringIntensity("(cm sr)⁻¹")
    assert u.to_si(1.0) == pytest.approx(100.0)


def test_sequences_convert_elementwise():
    assert NM.to_si((1.0, 1000.0)) == (pytest.approx(1e-9),
                                       pytest.approx(1e-6))
    assert NM.to_si([2.0]) == [pytest.approx(2e-9)]


def test_nounit_identity():
    assert NoUnit.to_si(3.21) == 3.21


def test_unknown_magnitude_raises():
    with pytest.raises(UnitError):
        Length("parsec")


def test_unit_by_kind():
    assert unit_by_kind("Length", "nm").to_si(1.0) == pytest.approx(1e-9)
