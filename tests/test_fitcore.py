# -*- coding: utf-8 -*-
"""Closed-form scale/background solve vs scipy least squares (the
reference's optimizer: src/mcsas/mcsas/backgroundscalingfit.py:94-139)."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import optimize

from mcsas_tpu.core.fitcore import (agofs, chisqr_at, make_constants,
                                    solve_scale_bg)

RNG = np.random.default_rng(7)


def random_case(n=80, bg=True):
    x = np.abs(RNG.normal(2.0, 1.0, n)) + 0.1
    a_true, b_true = RNG.uniform(0.5, 5.0), RNG.uniform(-1.0, 3.0)
    y = a_true * x + (b_true if bg else 0.0) + RNG.normal(0, 0.05, n)
    sigma = np.abs(RNG.normal(0.2, 0.05, n)) + 0.05
    return x, y, sigma


def scipy_fit(x, y, sigma, find_bg, pos_bg, sc0=(1.0, 0.0)):
    """Reference fitLM semantics (chi/chiPosBg/chiNoBg residuals)."""
    if not find_bg:
        def resid(sc):
            return (y - sc[0] * x) / sigma
    elif pos_bg:
        def resid(sc):
            return (y - sc[0] * x - abs(sc[1])) / sigma
    else:
        def resid(sc):
            return (y - sc[0] * x - sc[1]) / sigma
    sc, _ = optimize.leastsq(resid, list(sc0))
    if not find_bg:
        sc[1] = 0.0
    elif pos_bg:
        sc[1] = abs(sc[1])
    chi2 = float((((y - sc[0] * x - sc[1]) / sigma) ** 2).sum() / len(y))
    return sc, chi2


@pytest.mark.parametrize("find_bg,pos_bg", [(True, False), (False, False),
                                            (True, True)])
def test_solve_matches_scipy(find_bg, pos_bg):
    for trial in range(10):
        x, y, sigma = random_case(bg=find_bg)
        c = make_constants(y, sigma, jnp.float64)
        sol = solve_scale_bg(jnp.asarray(x), c, find_bg, pos_bg)
        sc_ref, chi2_ref = scipy_fit(x, y, sigma, find_bg, pos_bg)
        if pos_bg:
            # scipy's |b| reparameterization converges sloppily at the
            # b=0 boundary; the closed form is the exact constrained
            # optimum, so it must be at least as good and feasible.
            # (observed: LM stalls at chi2 up to ~10 % above the optimum)
            assert float(sol.background) >= 0.0
            assert float(sol.chisqr) <= chi2_ref * (1.0 + 1e-6)
        else:
            assert float(sol.scale) == pytest.approx(sc_ref[0], rel=1e-6)
            assert float(sol.background) == pytest.approx(
                sc_ref[1], rel=1e-5, abs=1e-8)
            assert float(sol.chisqr) == pytest.approx(chi2_ref, rel=1e-8)


def test_positive_background_clamps():
    """Data with a genuinely negative optimal background: constrained
    optimum must sit at b=0 with the no-background scale."""
    x = np.linspace(1.0, 10.0, 50)
    y = 2.0 * x - 5.0          # optimal b = -5
    sigma = np.ones(50)
    c = make_constants(y, sigma, jnp.float64)
    sol = solve_scale_bg(jnp.asarray(x), c, True, True)
    assert float(sol.background) == 0.0
    free = solve_scale_bg(jnp.asarray(x), c, False, False)
    assert float(sol.scale) == pytest.approx(float(free.scale))
    # the clamped chi2 can never beat the unconstrained one
    unc = solve_scale_bg(jnp.asarray(x), c, True, False)
    assert float(sol.chisqr) >= float(unc.chisqr)


def test_zero_sigma_treated_as_one():
    x, y, sigma = random_case()
    sigma[::5] = 0.0
    c = make_constants(y, sigma, jnp.float64)
    sol = solve_scale_bg(jnp.asarray(x), c, True, False)
    sigma_fixed = sigma.copy()
    sigma_fixed[sigma_fixed == 0] = 1.0
    sc_ref, chi2_ref = scipy_fit(x, y, sigma_fixed, True, False)
    assert float(sol.chisqr) == pytest.approx(chi2_ref, rel=1e-8)


def test_degenerate_constant_x():
    """x constant → normal equations singular → fall back to scale-only."""
    y = np.linspace(1, 2, 30)
    x = np.full(30, 3.0)
    c = make_constants(y, np.ones(30), jnp.float64)
    sol = solve_scale_bg(jnp.asarray(x), c, True, False)
    assert np.isfinite(float(sol.scale))
    assert np.isfinite(float(sol.chisqr))


def test_chisqr_at_consistency():
    x, y, sigma = random_case()
    c = make_constants(y, sigma, jnp.float64)
    sol = solve_scale_bg(jnp.asarray(x), c, True, False)
    again = chisqr_at(jnp.asarray(x), sol.scale, sol.background, c)
    assert float(again) == pytest.approx(float(sol.chisqr), rel=1e-12)


def test_agofs_formula():
    """aGoFs = Σ(y−fit)²/Σσ² · n/(n−p) (reference Henn-2016 variant)."""
    x, y, sigma = random_case(n=40)
    c = make_constants(y, sigma, jnp.float64)
    sol = solve_scale_bg(jnp.asarray(x), c, True, False)
    got = float(agofs(jnp.asarray(x), sol.scale, sol.background, c, 1))
    fit = float(sol.scale) * x + float(sol.background)
    expected = ((y - fit) ** 2).sum() / (sigma ** 2).sum() * 40 / 39
    assert got == pytest.approx(expected, rel=1e-10)


def test_float32_solve_close_to_float64():
    x, y, sigma = random_case(n=100)
    c64 = make_constants(y, sigma, jnp.float64)
    c32 = make_constants(y, sigma, jnp.float32)
    s64 = solve_scale_bg(jnp.asarray(x), c64, True, False)
    s32 = solve_scale_bg(jnp.asarray(x, np.float32), c32, True, False)
    assert float(s32.chisqr) == pytest.approx(float(s64.chisqr), rel=1e-4)
