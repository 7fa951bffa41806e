# -*- coding: utf-8 -*-
"""2D (q, ψ) anisotropic fitting: a working re-design of the reference's
dormant 2D path (mcsas.py:617-651, which references undefined names and
cannot run upstream)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

import mcsas_tpu as mt
from mcsas_tpu.config import McSASConfig
from mcsas_tpu.core.engine import McSASEngine
from mcsas_tpu.data import DataConfig, from_raw
from mcsas_tpu.models import get_model
from mcsas_tpu.models.cylinders import _cyl_radial_ff2d

NM = 1e-9
PSI0 = 0.8                     # true in-plane orientation [rad]
R_TRUE = 5 * NM
ASPECT = 10.0


def synth_2d(n_q=24, n_psi=16):
    """Synthetic anisotropic detector image from the in-plane cylinder
    kernel, flattened to raw rows (q, I, σI, ψ[deg])."""
    q_nm = np.geomspace(0.05, 1.5, n_q)
    psi = np.linspace(0.05, 2 * math.pi, n_psi, endpoint=False)
    qg, pg = np.meshgrid(q_nm * 1e9, psi, indexing="ij")
    p = {"radius": R_TRUE, "aspect": ASPECT, "psiAngle": PSI0}
    ff = np.asarray(jax.jit(
        lambda q, s: _cyl_radial_ff2d(q, s, p))(
            jnp.asarray(qg.ravel()), jnp.asarray(pg.ravel())))
    vol = math.pi * R_TRUE ** 2 * 2 * R_TRUE * ASPECT
    i = (ff * vol) ** 2
    i = i / i.max() + 1e-4
    raw = np.column_stack([qg.ravel() / 1e9, i, 0.02 * i,
                           np.degrees(pg.ravel())])
    return from_raw(raw, title="synthetic-2d",
                    config=DataConfig(n_bin=0, fit_2d=True))


def test_2d_data_grid():
    d = synth_2d()
    assert d.is2d
    assert d.psi is not None and d.psi.shape == d.q.shape
    assert d.count == 24 * 16


def test_2d_ff_consistency():
    """The 1D radial kernel is the ψ-average of the 2D kernel."""
    q = jnp.asarray(np.geomspace(1e7, 1e9, 32))
    p = {"radius": R_TRUE, "aspect": ASPECT, "psiAngle": 0.3,
         "psiAngleDivisions": 1801.0}
    ff1d = np.asarray(get_model("CylindersRadiallyIsotropic").ff(q, p))
    psi = jnp.asarray(np.linspace(0.0, 2 * math.pi, 3600, endpoint=False))
    ff2 = np.asarray(_cyl_radial_ff2d(q[:, None], psi[None, :], p))
    avg = np.sqrt(np.mean(ff2 ** 2, axis=1))
    np.testing.assert_allclose(avg, ff1d, rtol=2e-2)


def test_2d_tilted_ff_consistency():
    """The tilted cylinder's 1D ff is (up to the tiny upstream tilt
    spread) the ψ-RMS of its new 2D kernel on the same degree-grid: the
    1D averages sqrt(mean_ψ f²) per tilt, the reconstruction RMSes the
    tilt-averaged f — equal to ~1e-3 because the upstream z-score-as-
    degrees tilt centroids vary cos φ by <1e-3."""
    from mcsas_tpu.models.cylinders import _cyl_tilted_ff2d
    q = jnp.asarray(np.geomspace(1e7, 1e9, 32))
    p = {"radius": 4e-9, "aspect": 7.0, "psiAngle": 0.1,
         "psiAngleDivisions": 303.0, "phiDistWidth": 10.0,
         "phiDistDivisions": 9.0}
    ff1d = np.asarray(get_model("CylindersRadiallyIsotropicTilted").ff(
        q, p))
    psi_deg = np.linspace(0.1, 180.1, 303)
    # the 1D grid ignores psiAngle; feed azimuths that cancel the 2D
    # kernel's psiAngle rotation
    psi = jnp.asarray(np.radians(psi_deg + p["psiAngle"]))
    f2 = np.asarray(_cyl_tilted_ff2d(q[:, None], psi[None, :], p))
    rms = np.sqrt(np.mean(f2 ** 2, axis=1))
    np.testing.assert_allclose(rms, ff1d, rtol=1e-2)


def test_2d_tilted_fit_runs():
    """The previously 1D-only tilted model now fits 2D images."""
    d = synth_2d(n_q=12, n_psi=8)
    bound = get_model("CylindersRadiallyIsotropicTilted").bind(
        active=("radius",), active_ranges={"radius": (1.0, 20.0)})
    cfg = McSASConfig(num_contribs=8, num_reps=1, max_iterations=600,
                      chunk_steps=200, candidates_per_step=2, seed=2,
                      max_retries=0, show_incomplete=True)
    res = mt.fit(d, model=bound, cfg=cfg)
    assert np.all(np.isfinite(res.engine.conval))


def test_2d_anisotropic_fit_descends():
    """Fitting (radius, psiAngle) against the anisotropic image: χ²
    descends and the fitted orientation clusters near the truth."""
    d = synth_2d()
    bound = get_model("CylindersRadiallyIsotropic").bind(
        active=("radius", "psiAngle"),
        active_ranges={"radius": (1 * NM, 20 * NM)})
    cfg = McSASConfig(num_contribs=20, num_reps=2, max_iterations=6000,
                      chunk_steps=500, candidates_per_step=4, seed=9,
                      max_retries=0, show_incomplete=True)
    eng = McSASEngine(d, bound, cfg)
    state = eng._init_batch(jax.random.split(jax.random.PRNGKey(1), 2))
    chi0 = np.asarray(state.conval)
    res = eng.run()
    assert np.all(np.isfinite(res.conval))
    assert np.all(res.conval < chi0)
    assert res.n_moves.min() > 0
    # orientation recovery: the volume-weighted circular mean of fitted
    # psiAngle must land near PSI0 (mod π — the cylinder is symmetric)
    ang = 2.0 * res.contribs[:, :, 1]              # psi is π-periodic
    w = res.contribs[:, :, 0] ** 3                 # ~volume weight
    mean_ang = math.atan2((w * np.sin(ang)).sum(),
                          (w * np.cos(ang)).sum()) / 2.0
    delta = abs((mean_ang - PSI0 + math.pi / 2) % math.pi - math.pi / 2)
    assert delta < 0.3, f"orientation off by {delta:.2f} rad"


def test_2d_full_api_fit():
    d = synth_2d(n_q=16, n_psi=8)
    bound = get_model("CylindersRadiallyIsotropic").bind(
        active=("radius", "psiAngle"),
        active_ranges={"radius": (1 * NM, 20 * NM)})
    cfg = McSASConfig(num_contribs=10, num_reps=2, max_iterations=1000,
                      chunk_steps=250, candidates_per_step=2, seed=4,
                      max_retries=0, show_incomplete=True)
    res = mt.fit(d, model=bound, cfg=cfg)
    assert np.all(np.isfinite(res.engine.conval))
    assert len(res.histograms) == 2
