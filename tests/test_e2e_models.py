# -*- coding: utf-8 -*-
"""End-to-end fits across model families (small budgets): descent,
multi-parameter actives, smearing path, series statistics."""
import glob
import os

import numpy as np
import pytest

# The sandbox compiles XLA programs through a remote service whose latency
# is unbounded on bad days; the full multi-model battery (one fresh compile
# per model family) is opt-in so the default suite stays fast.
slow = pytest.mark.skipif(
    os.environ.get("MCSAS_TPU_SLOW_TESTS", "") != "1",
    reason="set MCSAS_TPU_SLOW_TESTS=1 to run the full model battery")

import mcsas_tpu as mt
from mcsas_tpu.config import McSASConfig
from mcsas_tpu.core.engine import McSASEngine
from mcsas_tpu.data import DataConfig, TrapezoidSmearing
from mcsas_tpu.models import get_model


def tiny_cfg(**kw):
    base = dict(num_contribs=25, num_reps=2, max_iterations=1200,
                chunk_steps=300, candidates_per_step=2, seed=5,
                max_retries=0, show_incomplete=True)
    base.update(kw)
    return McSASConfig(**base)


def run_and_check(data, bound, cfg=None, n_hist=None):
    res = mt.fit(data, model=bound, cfg=cfg or tiny_cfg())
    assert np.all(np.isfinite(res.engine.conval))
    assert np.all(res.engine.n_moves > 0)          # some accepted moves
    assert len(res.histograms) == (n_hist or bound.n_active)
    for h in res.histograms:
        assert np.isfinite(h.bins.mean).all()
        assert h.moments.total[0] >= 0
    return res


def test_gaussian_chain_fit(refdata):
    d = mt.load(refdata / "sasfit_gauss2-5-1.5-2-1.dat")
    run_and_check(d, get_model("GaussianChain").bind())


def test_kholodenko_fit(refdata):
    d = mt.load(refdata / "sasfit_kho-1-10-1000.dat")
    bound = get_model("Kholodenko").bind()     # 3 active parameters
    cfg = tiny_cfg(num_contribs=10, max_iterations=400, chunk_steps=200)
    res = run_and_check(d, bound, cfg)
    assert res.contribs.shape == (10, 3, 2)


@slow
def test_cylinders_fit(refdata):
    d = mt.load(refdata / "sasfit_sphere-10-1.dat")
    bound = get_model("CylindersIsotropic").bind(active=("radius", "aspect"))
    cfg = tiny_cfg(num_contribs=10, max_iterations=400, chunk_steps=200)
    res = run_and_check(d, bound, cfg)
    # both parameters histogrammed, per-param ranges respected
    r = res.engine.contribs
    assert r[..., 0].max() <= bound.ranges[0][1] * (1 + 1e-6)
    assert r[..., 1].max() <= bound.ranges[1][1] * (1 + 1e-6)


@slow
def test_core_shell_two_active(refdata):
    d = mt.load(refdata / "sasfit_sphere-10-1.dat")
    bound = get_model("SphericalCoreShell").bind(active=("radius", "t"))
    res = run_and_check(d, bound, tiny_cfg(num_contribs=15,
                                           max_iterations=600,
                                           chunk_steps=300))
    assert res.contribs.shape[1] == 2


@slow
def test_ellipsoids_fit(refdata):
    d = mt.load(refdata / "sasfit_sphere-10-1.dat")
    bound = get_model("EllipsoidsIsotropic").bind()
    run_and_check(d, bound, tiny_cfg(num_contribs=10, max_iterations=300,
                                     chunk_steps=150))


@slow
def test_lma_dense_sphere_fit(refdata):
    d = mt.load(refdata / "sasfit_sphere-10-1.dat")
    bound = get_model("LMADenseSphere").bind(active=("radius", "volFrac"))
    run_and_check(d, bound, tiny_cfg(num_contribs=10, max_iterations=300,
                                     chunk_steps=150))


def test_smeared_sphere_fit(refdata):
    """Engine path with the precomputed smearing contraction
    (reference smeared intensity: sasmodel.py:56-73)."""
    sm = TrapezoidSmearing(do_smear=True, n_steps=12, umbra=0.05e9,
                           penumbra=0.2e9)
    d = mt.load(refdata / "sasfit_sphere-10-1.dat",
                config=DataConfig(smearing=sm))
    assert d.uses_smearing
    bound = get_model("Sphere").bind()
    eng = McSASEngine(d, bound, tiny_cfg(num_contribs=15,
                                         max_iterations=600,
                                         chunk_steps=300))
    assert not eng.uses_pallas          # smearing → XLA path
    res = eng.run()
    assert np.all(np.isfinite(res.conval))
    assert np.all(res.n_moves > 0)
    # smeared fit differs from unsmeared on the same contributions
    d0 = mt.load(refdata / "sasfit_sphere-10-1.dat")
    eng0 = McSASEngine(d0, bound, tiny_cfg(num_contribs=15,
                                           max_iterations=600,
                                           chunk_steps=300))
    res0 = eng0.run()
    assert not np.allclose(res.measval, res0.measval)


def test_series_statistics(refdata, tmp_path):
    cfg = tiny_cfg(num_contribs=10, max_iterations=300, chunk_steps=150,
                   series_stats=True)
    files = [refdata / "sasfit_sphere-10-1.dat",
             refdata / "sasfit_sphere-20-1.dat"]
    results = mt.run_files(files, model="Sphere", cfg=cfg,
                           out_dir=tmp_path)
    assert len(results) == 2
    series_files = glob.glob(str(tmp_path / "series statistics*.dat"))
    assert len(series_files) == 1
    lines = open(series_files[0]).read().strip().splitlines()
    assert len(lines) == 3              # header + one row per file
    assert "totalValue" in lines[0]


def test_quickstart_three_populations(refdata):
    """The reference quickstart workload (doc/source/quickstart.rst): fit
    the 3-population sphere mix and recover mass at the documented
    8/40/100 nm population centers (SASfit generation parameters at
    quickstart.rst:192-199).  Default-suite budget (~6 s on CPU) using
    the certified K=64 + local-move accelerators; the full reference
    budget stays covered by the bench headline on hardware."""
    d = mt.load(refdata / "quickstartdemo1.csv")
    bound = mt.get_model("Sphere").bind(
        active_ranges={"radius": d.spherical_size_estimate})
    cfg = McSASConfig(num_contribs=150, num_reps=2,
                      max_iterations=1_500_000, chunk_steps=2048,
                      candidates_per_step=64, local_moves=0.5, seed=7,
                      max_retries=1, show_incomplete=True)
    spec = mt.HistogramSpec("radius", xscale="log", bin_count=50)
    res = mt.fit(d, model=bound, cfg=cfg, histograms=[spec])
    assert res.engine.converged.all()
    h = res.histograms[0]
    x_nm, y = h.x_mean * 1e9, h.bins.mean
    total = y.sum()
    mass = {}
    for name, lo, hi in (("p8", 5, 12), ("p40", 28, 58), ("p100", 75, 135),
                         ("void", 150, 320)):
        m = (x_nm >= lo) & (x_nm < hi)
        mass[name] = y[m].sum() / total
    # each documented population carries significant volume fraction;
    # the region above 150 nm carries almost none
    assert mass["p8"] > 0.02
    assert mass["p40"] > 0.15
    assert mass["p100"] > 0.15
    assert mass["void"] < 0.05


@slow
def test_sphere_50_converges_quickly(refdata):
    """A loose-criterion fit must actually converge end-to-end on CPU."""
    d = mt.load(refdata / "sasfit_sphere-50-1.dat")
    cfg = McSASConfig(num_contribs=60, num_reps=2, max_iterations=60000,
                      chunk_steps=2000, candidates_per_step=8, seed=2,
                      max_retries=0, convergence_criterion=10.0,
                      show_incomplete=True)
    res = mt.fit(d, model="Sphere", cfg=cfg)
    assert res.engine.conval.max() <= 10.0
    # recovered radii concentrate near 50 nm (volume-weighted median)
    h = res.histograms[0]
    peak_x = h.x_mean[np.argmax(h.bins.mean)] * 1e9
    assert 25 < peak_x < 100
