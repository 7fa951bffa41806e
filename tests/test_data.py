# -*- coding: utf-8 -*-
"""Data preprocessing: uncertainty floor, masking, log rebinning, smearing
(reference semantics: src/mcsas/dataobj/dataobj.py:204-345,
sasconfig.py:105-149, 308-339)."""
import math

import numpy as np
import pytest

from mcsas_tpu.data import (DataConfig, GaussianSmearing,
                            TrapezoidSmearing, from_raw, load)


def make_raw(n=200, umin=0.0):
    q = np.logspace(-2, 0, n)                    # nm⁻¹
    i = 1e4 / (1.0 + (q * 30.0) ** 4) + 1.0
    u = np.full(n, umin)
    return np.column_stack([q, i, u])


def test_si_conversion():
    d = from_raw(make_raw(), config=DataConfig(n_bin=0))
    assert d.q_si[0] == pytest.approx(1e7)       # 0.01 nm⁻¹ → 1e7 m⁻¹
    assert d.q[0] == pytest.approx(1e7)


def test_uncertainty_floor():
    raw = make_raw(umin=0.0)
    d = from_raw(raw, config=DataConfig(n_bin=0, fu_min=0.01))
    np.testing.assert_allclose(d.fu_si, 0.01 * d.f_si)
    # explicit uncertainties above the floor are preserved
    raw2 = raw.copy()
    raw2[:, 2] = raw2[:, 1]  # 100 % uncertainty
    d2 = from_raw(raw2, config=DataConfig(n_bin=0))
    np.testing.assert_allclose(d2.fu_si, d2.f_si)


def test_sasfit_negative_uncertainty_column(refdata):
    """sasfit files carry σ = −1: the fu_min floor must win."""
    d = load(refdata / "sasfit_sphere-10-1.dat", config=DataConfig(n_bin=0))
    np.testing.assert_allclose(d.fu, 0.01 * d.f)


def test_masking_limits():
    raw = make_raw()
    cfg = DataConfig(x0_low=0.1e9, x0_high=0.5e9, n_bin=0)
    d = from_raw(raw, config=cfg)
    assert d.q.min() >= 0.1e9
    assert d.q.max() <= 0.5e9


def test_masking_nonfinite_and_negative():
    raw = make_raw()
    raw[5, 1] = np.nan
    raw[7, 1] = -3.0
    raw[9, 1] = 0.0
    d = from_raw(raw, config=DataConfig(n_bin=0))
    assert d.count == len(raw) - 1               # only NaN dropped by default
    d2 = from_raw(raw, config=DataConfig(n_bin=0, f_mask_neg=True,
                                         f_mask_zero=True))
    assert d2.count == len(raw) - 3


def test_rebin_count_and_stats():
    d = from_raw(make_raw(400), config=DataConfig(n_bin=50))
    assert d.count <= 50
    assert np.all(np.diff(d.q) > 0)
    # single-point bins keep their uncertainty; multi-point bins use
    # max(SEM, propagated)
    assert np.all(d.fu > 0)


def test_rebin_disabled():
    d = from_raw(make_raw(123), config=DataConfig(n_bin=0))
    assert d.count == 123


def test_rebin_bin_values_match_manual():
    raw = make_raw(300)
    cfg = DataConfig(n_bin=20)
    d = from_raw(raw, config=cfg)
    q, f, fu = d.q_si[d.valid], d.f_si[d.valid], d.fu_si[d.valid]
    edges = np.logspace(np.log10(q.min()),
                        np.log10(q.max() + np.diff(q)[-1] / 100.0), 21)
    m = (q >= edges[0]) & (q < edges[1])
    assert d.f[0] == pytest.approx(f[m].mean())
    expected_u = max(f[m].std(ddof=1) / math.sqrt(m.sum()),
                     math.sqrt((fu[m] ** 2).sum() / m.sum()))
    assert d.fu[0] == pytest.approx(expected_u)


def test_size_estimates():
    d = from_raw(make_raw())
    lo, hi = d.spherical_size_estimate
    qlo, qhi = d.q_limit
    assert lo == pytest.approx(math.pi / qhi)
    assert hi == pytest.approx(math.pi / qlo)
    assert d.shannon_channel_estimate == int(qhi / qlo)


def test_trapezoid_smearing_matrix():
    sm = TrapezoidSmearing(do_smear=True, n_steps=25,
                           umbra=0.1e9, penumbra=0.3e9)
    cfg = DataConfig(n_bin=40, smearing=sm)
    d = from_raw(make_raw(), config=cfg)
    assert d.uses_smearing
    assert d.locs.shape == (d.count, 26)         # n_steps + prepended zero
    # column 0 is the unshifted q (offset 0)
    np.testing.assert_allclose(d.locs[:, 0], d.q, rtol=1e-12)
    assert d.smear_w.shape == (26,)
    # slit geometry: locs = sqrt(q² + off²) ≥ q
    assert np.all(d.locs >= d.q[:, None] - 1e-9)


def test_trapezoid_profile_shape():
    sm = TrapezoidSmearing(umbra=1.0, penumbra=3.0)
    x = np.array([0.0, 0.5, 1.0, 2.0, 3.0, 4.0])
    pdf = sm._profile(x)
    norm = 1.0 / 4.0  # 1/(umbra+penumbra)
    np.testing.assert_allclose(
        pdf, np.array([1.0, 1.0, 1.0, 0.5, 0.0, 0.0]) * norm)


def test_gaussian_smearing_2d():
    sm = GaussianSmearing(do_smear=True, n_steps=24, two_d_coll=True,
                          variance=0.2e9)
    cfg = DataConfig(n_bin=40, smearing=sm)
    d = from_raw(make_raw(), config=cfg)
    n_off = 2 * math.ceil(24 / 2) + 1
    assert d.locs.shape == (d.count, n_off)
    # pinhole geometry: plain additive offsets, symmetric around q
    mid = n_off // 2
    np.testing.assert_allclose(d.locs[:, mid], d.q, rtol=1e-12)


def test_smearing_invalid_input_disabled():
    sm = TrapezoidSmearing(do_smear=True, umbra=0.0, penumbra=0.0)
    d = from_raw(make_raw(), config=DataConfig(smearing=sm))
    assert not d.uses_smearing


def test_smear_contraction_equals_trapz():
    """(ff²)@smear_w must equal 2·trapz(ff²·weights, x=qOffset)."""
    sm = TrapezoidSmearing(do_smear=True, n_steps=25,
                           umbra=0.1e9, penumbra=0.3e9)
    d = from_raw(make_raw(), config=DataConfig(n_bin=30, smearing=sm))
    q_off, weights = sm.prepare(d.q)
    vals = 1.0 / (1.0 + d.locs ** 2 * 1e-17)     # arbitrary smooth function
    expected = 2.0 * np.trapz(vals * weights[None, :], x=q_off, axis=1)
    got = vals @ d.smear_w
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_psi_column():
    raw = make_raw()
    psi = np.linspace(0.0, 90.0, len(raw))
    raw = np.column_stack([raw, psi])
    d = from_raw(raw, config=DataConfig(n_bin=0))
    assert d.is2d
    assert d.psi_si.max() == pytest.approx(math.pi / 2.0)


def test_with_config_rebuilds():
    d = from_raw(make_raw())
    d2 = d.with_config(d.config.replace(n_bin=10))
    assert d2.count <= 10
    assert d.count > d2.count
