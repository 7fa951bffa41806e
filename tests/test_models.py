# -*- coding: utf-8 -*-
"""Model kernel validation.

Two layers of checks, reviving the reference's disabled golden-file strategy
(reference: src/mcsas/bases/model/scatteringmodel.py:176-241):

1. golden SASfit curves in testdata/ with filename-encoded parameters,
   evaluated in nm units (the SASfit convention: I = (V[nm³]·F)² with Δρ=1,
   or F² where the test sets a zero volume exponent);
2. independent float64 numpy/scipy re-derivations of each orientation
   integral, evaluated on random parameters, to pin the jax kernels to the
   reference math with identical discretization.
"""
import math

import jax
import numpy as np
import pytest
import scipy.special
import scipy.integrate

from mcsas_tpu.io import load_raw
from mcsas_tpu.models import (CylindersIsotropic, CylindersIsotropicAspect,
                              CylindersRadiallyIsotropic,
                              CylindersRadiallyIsotropicTilted,
                              EllipsoidalCoreShell, EllipsoidsIsotropic,
                              GaussianChain, Kholodenko, LMADenseSphere,
                              REGISTRY, Sphere, SphericalCoreShell, get_model)

PI43 = 4.0 * math.pi / 3.0


def ff64(model, q, p):
    # close over p: fixed parameters (e.g. integration divisions) are static
    return np.asarray(
        jax.jit(lambda qq: model.ff(qq, p))(np.asarray(q, np.float64)))


# ----------------------------------------------------------------- goldens

@pytest.mark.parametrize("radius", [2, 10, 20, 50, 100])
def test_sphere_golden(refdata, radius):
    raw, _ = load_raw(refdata / f"sasfit_sphere-{radius}-1.dat")
    q, i_ref = raw[:, 0], raw[:, 1]
    p = Sphere.defaults()
    p["radius"] = float(radius)
    i = (PI43 * radius ** 3 * ff64(Sphere, q, p)) ** 2
    rel = np.abs((i_ref - i) / i_ref)
    assert rel.mean() < 1e-4          # reference tolerance: sphere.py:69


@pytest.mark.parametrize("fn,vals", [
    ("sasfit_gauss2-5-1.5-2-1.dat", (5.0, 1.5, 2.0, 1.0)),
    ("sasfit_gauss2-1-100-1-1.dat", (1.0, 100.0, 1.0, 1.0)),
])
def test_gaussian_chain_golden(refdata, fn, vals):
    raw, _ = load_raw(refdata / fn)
    q, i_ref = raw[:, 0], raw[:, 1]
    rg, bp, etas_in, k_in = vals
    # SASfit Gauss2 parameter remapping (reference: gaussianchain.py:67-73)
    p = dict(rg=rg, bp=bp, etas=k_in, k=etas_in / rg ** 2)
    i = ff64(GaussianChain, q, p) ** 2      # zero volume exponent
    rel = np.abs((i_ref - i) / i_ref)
    assert rel.mean() < 1e-5     # reference tol: gaussianchain.py:84


def test_kholodenko_golden(refdata):
    raw, _ = load_raw(refdata / "sasfit_kho-1-10-1000.dat")
    q, i_ref = raw[:, 0], raw[:, 1]
    p = dict(radius=1.0, lenKuhn=10.0, lenContour=1000.0)
    i = ff64(Kholodenko, q, p) ** 2         # zero volume exponent
    rel = np.abs((i_ref - i) / i_ref)
    assert rel.mean() < 1e-5


def test_spherical_core_shell_golden(refmodeldata):
    raw, _ = load_raw(refmodeldata / "SphCoreShell_R100_dR150_c3p16_s2p53.csv")
    q, i_ref = raw[:, 0], raw[:, 1]
    p = dict(radius=100.0, t=150.0, eta_c=3.16, eta_s=2.53, eta_sol=0.0)
    i = ff64(SphericalCoreShell, q, p) ** 2
    rel = np.abs(i_ref / i_ref.max() - i / i.max())
    assert np.mean(rel) < 1e-3        # fringe minima limit the 6-digit data


def test_ellipsoidal_core_shell_golden(refmodeldata):
    raw, _ = load_raw(
        refmodeldata / "EllCoreShell_a100_b150_t500_c3p16_s2p53_sol0.csv")
    q, i_ref = raw[:, 0], raw[:, 1]
    p = dict(a=100.0, b=150.0, t=500.0, eta_c=3.16, eta_s=2.53,
             eta_sol=0.0, intDiv=100.0)
    i = ff64(EllipsoidalCoreShell, q, p) ** 2
    rel = np.abs(i_ref / i_ref.max() - i / i.max())
    assert np.mean(rel) < 1e-2        # reference model itself is a 100-pt grid


# --------------------------------------- independent numpy cross-checks

RNG = np.random.default_rng(42)
Q = np.logspace(-2.3, 0.3, 73) * 1e9           # SI m⁻¹


def test_cylinders_isotropic_cross():
    p = dict(radius=3.7e-9, useAspect=0.0, length=25e-9, aspect=10.0,
             intDiv=100.0, sld=1e14)
    half = 0.5 * p["length"]
    x, step = np.linspace(0.0, 1.0, 100, retstep=True)
    x[0] = x[-1] = 0.5                          # placeholder, replaced below
    qr = np.outer(Q, p["radius"] * np.sqrt(1 - x ** 2))
    ql = np.outer(Q, 2.0 * half * x)
    f = scipy.special.j1(qr) * np.sin(ql / 2.0) / (qr * ql)
    f[:, 0] = 0.5 * scipy.special.j1(Q * p["radius"]) / (Q * p["radius"])
    f[:, -1] = np.sin(Q * half) / (Q * half)
    expected = np.sqrt(16 * np.trapz(f ** 2, dx=step, axis=1))
    got = ff64(CylindersIsotropic, Q, p)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_cylinders_isotropic_aspect_mode():
    p = dict(radius=3.7e-9, useAspect=1.0, length=25e-9, aspect=4.0,
             intDiv=100.0, sld=1e14)
    got = ff64(CylindersIsotropic, Q, p)
    p2 = dict(p, useAspect=0.0, length=2 * 3.7e-9 * 4.0)
    got2 = ff64(CylindersIsotropic, Q, p2)
    np.testing.assert_allclose(got, got2, rtol=1e-7)


def test_ellipsoids_isotropic_cross():
    p = dict(a=5e-9, useAspect=0.0, c=20e-9, aspect=10.0, intDiv=100.0,
             sld=1e14)
    alpha = np.linspace(0.0, math.pi / 2.0, 100)
    rp = np.sqrt(p["a"] ** 2 * np.sin(alpha) ** 2
                 + p["c"] ** 2 * np.cos(alpha) ** 2)
    qr = np.outer(Q, rp)
    fs = 3.0 * (np.sin(qr) - qr * np.cos(qr)) / qr ** 3
    expected = np.sqrt(np.mean(fs ** 2 * np.sin(alpha)[None, :], axis=1))
    got = ff64(EllipsoidsIsotropic, Q, p)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_spherical_core_shell_cross():
    p = dict(radius=8e-9, t=3e-9, eta_c=3.16e14, eta_s=2.53e14, eta_sol=0.0)
    def k(q, r, deta):
        qr = q * r
        return deta * 3 * (np.sin(qr) - qr * np.cos(qr)) / qr ** 3
    vc = PI43 * p["radius"] ** 3
    vt = PI43 * (p["radius"] + p["t"]) ** 3
    expected = (k(Q, p["radius"] + p["t"], p["eta_s"] - p["eta_sol"])
                - vc / vt * k(Q, p["radius"], p["eta_s"] - p["eta_c"]))
    got = ff64(SphericalCoreShell, Q, p)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_ellipsoidal_core_shell_cross():
    p = dict(a=7e-9, b=11e-9, t=4e-9, eta_c=3.15e14, eta_s=2.53e14,
             eta_sol=0.0, intDiv=100.0)
    mu = np.linspace(0.0, 1.0, 100)
    def j1x(x):
        return (np.sin(x) - x * np.cos(x)) / x ** 2
    a, b, t = p["a"], p["b"], p["t"]
    vr = (PI43 * a * b ** 2) / (PI43 * (a + t) * (b + t) ** 2)
    xc = np.outer(Q, np.sqrt(a ** 2 * mu ** 2 + b ** 2 * (1 - mu ** 2)))
    xt = np.outer(Q, np.sqrt((a + t) ** 2 * mu ** 2
                             + (b + t) ** 2 * (1 - mu ** 2)))
    with np.errstate(invalid="ignore", divide="ignore"):
        fs = ((p["eta_c"] - p["eta_s"]) * vr * 3 * j1x(xc) / xc
              + (p["eta_s"] - p["eta_sol"]) * 3 * j1x(xt) / xt)
    fs = np.where(np.isfinite(fs), fs, 0.0)
    expected = np.sqrt(np.mean(fs ** 2, axis=1))
    got = ff64(EllipsoidalCoreShell, Q, p)
    # mu=0 column is finite in our impl (series limit) vs nan-zeroed here
    np.testing.assert_allclose(got, expected, rtol=1e-2)


def test_lma_dense_sphere_cross():
    p = dict(radius=5e-9, volFrac=0.2, mf=-1.0, sld=1e14)
    mu, r = p["volFrac"], p["radius"]
    mf = (0.634 / mu) ** (1.0 / 3.0)
    qr = Q * r
    ffs = 3.0 * (np.sin(qr) - qr * np.cos(qr)) / qr ** 3
    A = 2.0 * Q * mf * r
    al = (1 + 2 * mu) ** 2 / (1 - mu) ** 4
    be = -6 * mu * (1 + mu / 2) ** 2 / (1 - mu) ** 4
    ga = mu * al / 2
    G = (al * (np.sin(A) - A * np.cos(A)) / A ** 2
         + be * (2 * A * np.sin(A) + (2 - A ** 2) * np.cos(A) - 2) / A ** 3
         + ga * (-A ** 4 * np.cos(A)
                 + 4 * ((3 * A ** 2 - 6) * np.cos(A)
                        + (A ** 3 - 6 * A) * np.sin(A) + 6)) / A ** 5)
    S = 1.0 / (1.0 + 24.0 * mu * G / A)
    expected = np.sqrt(ffs ** 2 * S)
    got = ff64(LMADenseSphere, Q, p)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_lma_explicit_mf():
    p = dict(radius=5e-9, volFrac=0.2, mf=1.5, sld=1e14)
    got = ff64(LMADenseSphere, Q, p)
    assert np.all(np.isfinite(got))


def test_sine_integral_vs_scipy():
    """ops.special.sine_integral against scipy.special.sici over both the
    Taylor and Gauss-Laguerre branches (incl. the y=6 cutover)."""
    from mcsas_tpu.ops.special import sine_integral
    y = np.concatenate([np.linspace(0.0, 8.0, 300),
                        np.geomspace(8.0, 1e4, 200)])
    got = np.asarray(jax.jit(sine_integral)(y))
    want = scipy.special.sici(y)[0]
    np.testing.assert_allclose(got, want, rtol=5e-13, atol=5e-13)


def test_kholodenko_conv_rule_vs_adaptive_quad():
    """The converged Filon/Boole rule over the whole (t, x) operating
    domain, including frequencies F ≈ 170 where even the 2048-node GL
    head rule drifts to ~1e-2; the conv rule must stay ≤1e-6."""
    from mcsas_tpu.models.chains import _kho_p0_sq_conv

    def ref(t, x):
        def f(z):
            if z <= 1e-300:
                return 2.0 / x
            if t < 1:
                e = math.sqrt(1 - t * t)
                fz = (math.sinh(e * z) / (e * math.sinh(z)) if z < 500
                      else math.exp((e - 1) * z) / e)
            else:
                F = math.sqrt(t * t - 1)
                fz = math.sin(F * z) / (F * math.sinh(z))
            return fz * (2.0 / x) * (1.0 - z / x)
        val, _ = scipy.integrate.quad(f, 0, x, limit=5000,
                                      epsabs=1e-14, epsrel=1e-12)
        return val

    ts = np.array([0.01, 0.5, 0.95, 0.9999, 1.0001, 1.2, 2.0,
                   10.0, 60.0, 167.0])
    fn = jax.jit(_kho_p0_sq_conv)
    for x in (6.0, 39.5, 40.5, 300.0):
        got = np.asarray(fn(ts, np.float64(x)))
        want = np.array([ref(t, x) for t in ts])
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-14)


def test_kholodenko_vs_adaptive_quad():
    """Fixed Gauss-Legendre panels vs scipy adaptive quad
    (the reference integrator: models/kholodenko.py:31-38)."""
    kuhn, contour = 12e-9, 300e-9
    qs = np.array([1e7, 3e8 / kuhn / 10, 3.0 / kuhn, 5e8, 1e9])
    x = 3.0 * contour / kuhn
    def core(z, qv):
        if z <= 0:
            return 1.0
        ratio = 3.0 / kuhn
        if qv < ratio:
            e = math.sqrt(1 - qv ** 2 * kuhn ** 2 / 9.0)
            fz = math.sinh(e * z) / (e * math.sinh(z)) if z < 500 else \
                math.exp((e - 1) * z) / e
        elif qv > ratio:
            f = math.sqrt(qv ** 2 * kuhn ** 2 / 9.0 - 1.0)
            fz = math.sin(f * z) / (f * math.sinh(z))
        else:
            fz = z / math.sinh(z)
        return fz * (2.0 / x) * (1.0 - z / x)
    p = dict(radius=1e-9, lenKuhn=kuhn, lenContour=contour)
    got = ff64(Kholodenko, qs, p)
    for i, qv in enumerate(qs):
        ref, _ = scipy.integrate.quad(core, 0, x, args=(qv,), limit=10000,
                                      epsabs=0.0, epsrel=1e-10)
        pcs = 2.0 * scipy.special.j1(qv * 1e-9) / (qv * 1e-9)
        expected = math.sqrt(max(ref, 0.0)) * pcs
        assert got[i] == pytest.approx(expected, rel=1e-5)


def test_cylinders_radially_isotropic_cross():
    p = dict(radius=3e-9, aspect=5.0, psiAngle=0.17, psiAngleDivisions=303.0,
             sld=1e14)
    psi = np.linspace(0.01, 2 * math.pi + 0.01, 303)
    a = psi - p["psiAngle"]
    qr = np.outer(Q, p["radius"] * np.sin(a))
    ql = np.outer(Q, p["radius"] * p["aspect"] * np.cos(a))
    with np.errstate(invalid="ignore", divide="ignore"):
        fs = 2 * scipy.special.j1(qr) / qr * np.sin(ql) / ql
    expected = np.sqrt(np.mean(fs ** 2, axis=1))
    got = ff64(CylindersRadiallyIsotropic, Q, p)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_cylinders_tilted_finite():
    p = dict(radius=3.0, aspect=5.0, psiAngle=0.1, psiAngleDivisions=303.0,
             phiDistWidth=10.0, phiDistDivisions=9.0)
    got = ff64(CylindersRadiallyIsotropicTilted, Q / 1e9, p)
    assert np.all(np.isfinite(got))
    assert np.all(got > 0)


def test_cylinders_isotropic_aspect_legacy_finite():
    p = dict(radius=3e-9, aspect=5.0, psiAngle=0.2,
             psiAngleDivisions=303.0)
    got = ff64(CylindersIsotropicAspect, Q, p)
    assert np.all(np.isfinite(got))


# ------------------------------------------------------------ registry/meta

def test_registry_complete():
    assert len(REGISTRY) == 11
    for name in ("Sphere", "CylindersIsotropic", "EllipsoidsIsotropic",
                 "EllipsoidalCoreShell", "SphericalCoreShell",
                 "GaussianChain", "LMADenseSphere", "Kholodenko"):
        assert name in REGISTRY


def test_get_model_unknown():
    with pytest.raises(KeyError):
        get_model("NoSuchModel")


def test_volume_surface_sphere():
    p = Sphere.defaults()
    p["radius"] = 1e-8
    assert Sphere.volume(p) == pytest.approx(PI43 * 1e-24)
    assert Sphere.surface(p) == pytest.approx(4 * math.pi * 1e-16)
    assert Sphere.absvolume_fn()(p) == pytest.approx(
        PI43 * 1e-24 * (1e14) ** 2)


def test_bind_and_generate_ranges():
    bm = Sphere.bind()
    assert bm.active == ("radius",)
    assert bm.ranges[0] == pytest.approx((1e-9, 1e-6))
    bm2 = Sphere.bind(active_ranges={"radius": (5e-9, 5e-8)})
    assert bm2.ranges[0] == (5e-9, 5e-8)


def test_bind_rejects_non_fit_param():
    with pytest.raises(ValueError):
        Sphere.bind(active=("sld",))


def test_float32_consistency():
    """f32 kernels must track f64 within loose tolerance — this is what
    the float32 MC loop AND the accelerator-assisted post tier rely on.
    Covers ALL models (quadrature models at a wider atol: their f32
    node sums accumulate ~n·eps)."""
    q32 = np.asarray(Q, np.float32)
    atols = {"Kholodenko": 2e-3, "CylindersIsotropic": 1e-3,
             "CylindersIsotropicAspect": 1e-3,
             "CylindersRadiallyIsotropic": 1e-3,
             "CylindersRadiallyIsotropicTilted": 1e-3,
             "EllipsoidsIsotropic": 1e-3, "EllipsoidalCoreShell": 1e-3}
    for name, m in REGISTRY.items():
        p = m.defaults()
        if name == "CylindersRadiallyIsotropicTilted":
            # verbatim-upstream dimensionless model: pick a radius that
            # keeps q·R in the physical regime on the SI q grid (a unit
            # radius would mean sin/cos at ~1e9 rad, where f32 range
            # reduction is meaningless for ANY implementation)
            p["radius"], p["aspect"] = 2e-9, 10.0
        f64 = ff64(m, Q, p)
        out = jax.jit(lambda qq: m.ff(qq, p))(q32)
        # dtype preservation, not just accuracy: a float64 numpy scalar
        # leaking into a kernel silently upcasts the whole MC hot loop
        # under x64 (and crashes the prefetch kernel's io-alias check)
        assert out.dtype == np.float32, f"{name}: f32 in, {out.dtype} out"
        f32 = np.asarray(out)
        scale = np.abs(f64).max()
        np.testing.assert_allclose(f32 / scale, f64 / scale,
                                   atol=atols.get(name, 2e-4),
                                   err_msg=name)


def test_special_functions_preserve_dtype():
    """Every special-function building block must return its argument
    dtype: float64 numpy scalar constants are NOT weak types under x64
    and would silently upcast the f32 MC hot loop (regression for the
    bessel_j1 _poly coefficients)."""
    import jax.numpy as jnp
    from mcsas_tpu.ops import special
    x32 = jnp.asarray(np.linspace(0.01, 40.0, 64), jnp.float32)
    for fn in (special.sphere_ff, special.j1sph_over_x, special.sinc_sin,
               special.bessel_j1, special.j1_over_x,
               special.sine_integral):
        assert fn(x32).dtype == jnp.float32, fn.__name__
        assert fn(x32.astype(jnp.float64)).dtype == jnp.float64, \
            fn.__name__
    assert special.py_G_over_A(x32, 1.0, 2.0, 3.0).dtype == jnp.float32
