# -*- coding: utf-8 -*-
"""Statistical parity with the reference algorithm.

Two independent oracles:

1. A compact numpy implementation of the reference MC semantics
   (sequential cursor, one proposal per iteration, accept iff the
   re-fitted reduced χ² improves — mcsas/mcsas.py:354-404) run against
   the engine on the same problem.
2. The ACTUAL reference McSAS, executed under Python 3 by
   tools/run_reference.py (two mechanical shims, zero algorithm
   changes), whose histograms/fit/scaling are committed as a JSON
   fixture (testdata/reference_*_fixture.json) and compared here.

RNG streams differ in both cases, so parity is distributional: the
rep-averaged volume-weighted histograms must agree within the
reference's own regression tolerance style (mcsas_test.py:105-116 uses
0.2 on histogram bars)."""
import json
import math
import pathlib

import numpy as np
import pytest

from mcsas_tpu import data
from mcsas_tpu.config import McSASConfig
from mcsas_tpu.core.engine import McSASEngine
from mcsas_tpu.models import get_model
from mcsas_tpu.post.histogram import HistogramSpec, histogram_all

PI43 = 4 * math.pi / 3
CRIT = 2.0          # loose criterion so the small budget converges
N_CONTRIBS = 50
MAX_ITER = 60000
R_LO, R_HI = 2e-9, 60e-9
N_REPS = 3
BINS = 12


def sphere_row(q, r, comp2):
    x = q * r
    ff = 3.0 * (np.sin(x) - x * np.cos(x)) / x ** 3
    return ff * ff * (PI43 * r ** 3) ** comp2


def solve_np(x, y, u):
    """Closed-form weighted LS (proven == scipy LM in test_fitcore)."""
    s_u, s_uy = u.sum(), (u * y).sum()
    s_x, s_xx, s_xy = (u * x).sum(), (u * x * x).sum(), (u * x * y).sum()
    det = s_u * s_xx - s_x * s_x
    a = (s_u * s_xy - s_x * s_uy) / det
    b = (s_uy - a * s_x) / s_u
    r = y - a * x - b
    return a, b, (u * r * r).sum() / len(y)


def reference_style_mcfit(d, rng, comp2, n_contribs=N_CONTRIBS,
                          crit=CRIT, max_iter=MAX_ITER):
    """The reference hot loop, straight numpy (no jax), normalized rows."""
    q, y = d.q, d.f
    sigma = d.fu.copy()
    sigma[sigma == 0] = 1.0
    u = 1.0 / sigma ** 2
    norm = sphere_row(q, math.sqrt(R_LO * R_HI), comp2).max()
    rset = rng.uniform(R_LO, R_HI, n_contribs)
    bank = np.stack([sphere_row(q, r, comp2) / norm for r in rset])
    ft = bank.sum(axis=0)
    _, _, conval = solve_np(ft, y, u)
    ri = 0
    for it in range(max_iter):
        if conval <= crit:
            break
        rt = rng.uniform(R_LO, R_HI)
        row = sphere_row(q, rt, comp2) / norm
        ft_test = ft - bank[ri] + row
        _, _, convalt = solve_np(ft_test, y, u)
        if convalt < conval:
            rset[ri], bank[ri], ft, conval = rt, row, ft_test, convalt
        ri = (ri + 1) % n_contribs
    return rset, conval


@pytest.fixture(scope="module")
def reference_run(refdata):
    """One shared numpy-reference ensemble + its volume histogram."""
    d = data.load(refdata / "sasfit_sphere-10-1.dat")
    comp2 = 2 * 0.6666666
    rng = np.random.default_rng(123)
    ref_sets, ref_conv = [], []
    for _ in range(N_REPS):
        rset, conval = reference_style_mcfit(d, rng, comp2)
        ref_sets.append(rset)
        ref_conv.append(conval)
    assert max(ref_conv) <= CRIT, "numpy reference failed to converge"
    bound = get_model("Sphere").bind(active_ranges={"radius": (R_LO, R_HI)})
    cfg = McSASConfig(num_contribs=N_CONTRIBS, num_reps=N_REPS,
                      max_iterations=MAX_ITER,
                      convergence_criterion=CRIT)
    spec = HistogramSpec("radius", R_LO, R_HI, bin_count=BINS,
                         auto_follow=False).resolved(bound)
    ref_contribs = np.stack(ref_sets)[:, :, None]     # (R, N, 1)
    _, hists_ref = histogram_all(ref_contribs, d, bound, cfg, [spec])
    y_ref = hists_ref[0].bins.mean
    return d, bound, spec, y_ref / y_ref.sum()


# the engine configurations certified against the reference semantics:
# K=1 (exact reference stepping), K=128 (the headline-bench best-of-K
# accept), and the opt-in local-move proposal mix — VERDICT r1 item 6
ENGINE_VARIANTS = {
    "k1": dict(candidates_per_step=1),
    "k128": dict(candidates_per_step=128),
    "local-moves": dict(candidates_per_step=8, local_moves=0.5),
    # the headline-bench configuration
    "k128-local": dict(candidates_per_step=128, local_moves=0.5),
}


@pytest.mark.parametrize("variant", sorted(ENGINE_VARIANTS))
def test_distribution_parity(reference_run, variant):
    d, bound, spec, y_ref = reference_run
    cfg = McSASConfig(num_contribs=N_CONTRIBS, num_reps=N_REPS,
                      max_iterations=MAX_ITER, chunk_steps=2000,
                      seed=77, max_retries=1,
                      convergence_criterion=CRIT,
                      **ENGINE_VARIANTS[variant])
    eng = McSASEngine(d, bound, cfg)
    res = eng.run()
    assert res.converged.all()

    # --- compare volume-weighted histograms ----------------------------
    _, hists_eng = histogram_all(res.contribs, d, bound, cfg, [spec])
    y_eng = hists_eng[0].bins.mean
    y_eng = y_eng / y_eng.sum()
    # reference regression tolerance style: 0.2 absolute on normalized bars
    np.testing.assert_allclose(y_eng, y_ref, atol=0.2)
    # the dominant bin must agree
    assert abs(int(np.argmax(y_eng)) - int(np.argmax(y_ref))) <= 1


# ------------------- sharpened headline certification (VERDICT r2 #5) ------
#
# The k128+local-moves accelerators produce the headline bench number, so
# they get certified at honest statistical power: 8 reps x 200 contribs at
# CRIT=1.5 against an equally-powered numpy reference ensemble, with a
# tight distribution-distance bound (max bin diff <= 0.1 after
# rep-averaging) instead of the reference's loose 0.2 regression style.

N_REPS_STRONG = 8
N_CONTRIBS_STRONG = 200
CRIT_STRONG = 1.5


@pytest.fixture(scope="module")
def reference_run_strong(refdata):
    d = data.load(refdata / "sasfit_sphere-10-1.dat")
    comp2 = 2 * 0.6666666
    rng = np.random.default_rng(123)
    ref_sets, ref_conv = [], []
    for _ in range(N_REPS_STRONG):
        rset, conval = reference_style_mcfit(
            d, rng, comp2, n_contribs=N_CONTRIBS_STRONG, crit=CRIT_STRONG)
        ref_sets.append(rset)
        ref_conv.append(conval)
    assert max(ref_conv) <= CRIT_STRONG, "numpy reference failed to converge"
    bound = get_model("Sphere").bind(active_ranges={"radius": (R_LO, R_HI)})
    cfg = McSASConfig(num_contribs=N_CONTRIBS_STRONG,
                      num_reps=N_REPS_STRONG, max_iterations=MAX_ITER,
                      convergence_criterion=CRIT_STRONG)
    spec = HistogramSpec("radius", R_LO, R_HI, bin_count=BINS,
                         auto_follow=False).resolved(bound)
    ref_contribs = np.stack(ref_sets)[:, :, None]     # (R, N, 1)
    _, hists_ref = histogram_all(ref_contribs, d, bound, cfg, [spec])
    y_ref = hists_ref[0].bins.mean
    return d, bound, spec, y_ref / y_ref.sum()


def test_headline_accelerators_certified_strong(reference_run_strong):
    """k128-local (the headline-bench configuration) at 8 reps x 200
    contribs, CRIT=1.5: rep-averaged volume-weighted histograms within
    max-bin-diff 0.1 of the reference-semantics ensemble."""
    d, bound, spec, y_ref = reference_run_strong
    # max_iterations counts PROPOSALS: K=128 consumes 128 per cursor step,
    # so the tighter criterion and 4x contribution count get a matching
    # proposal budget (the headline bench runs 8M on hardware)
    cfg = McSASConfig(num_contribs=N_CONTRIBS_STRONG,
                      num_reps=N_REPS_STRONG, max_iterations=4_000_000,
                      chunk_steps=2000, seed=77, max_retries=1,
                      convergence_criterion=CRIT_STRONG,
                      candidates_per_step=128, local_moves=0.5)
    eng = McSASEngine(d, bound, cfg)
    res = eng.run()
    assert res.converged.all()

    _, hists_eng = histogram_all(res.contribs, d, bound, cfg, [spec])
    y_eng = hists_eng[0].bins.mean
    y_eng = y_eng / y_eng.sum()
    assert np.abs(y_eng - y_ref).max() <= 0.1
    assert int(np.argmax(y_eng)) == int(np.argmax(y_ref))

# ------------- cross-validation against the ACTUAL reference (r4 #4) ------
#
# tools/run_reference.py executes the original McSAS (py3-shimmed copy,
# zero algorithm changes) on sasfit_sphere-10-1.dat at the reference
# regression workload (mcsas_test.py:62-66 shape) and dumps its
# histograms/fit/scaling to testdata/reference_sphere10_fixture.json.
# Here the SAME workload runs through mcsas_tpu and must match within
# the reference's own regression tolerances (mcsas_test.py:105-116:
# 0.2 on histogram bars, 0.005 relative half-diff on the fit mean).

_TESTDATA = pathlib.Path(__file__).resolve().parent.parent / "testdata"
# fixture file → the dataset it was fitted on (generated by
# tools/run_reference.py; quickstart = doc/source/quickstart.rst:106
# workload, sphere10 = mcsas_test.py:62-66 regression workload with a
# raised iteration budget — the reference's default 1e5 cap cannot
# converge on that dataset, measured ~2.8e5 needed)
_FIXTURES = {
    "quickstart": ("reference_quickstart_fixture.json",
                   "quickstartdemo1.csv"),
    "sphere10": ("reference_sphere10_fixture.json",
                 "sasfit_sphere-10-1.dat"),
}


@pytest.fixture(scope="module", params=sorted(_FIXTURES))
def crossval_run(request, refdata):
    fixfile, dataset = _FIXTURES[request.param]
    path = _TESTDATA / fixfile
    if not path.exists():
        pytest.skip(f"reference fixture {fixfile} not generated "
                    "(tools/run_reference.py)")
    fix = json.loads(path.read_text())
    if "error" in fix:
        pytest.skip(f"reference run failed: {fix['error']}")
    d = data.load(refdata / dataset)
    lo, hi = fix["workload"]["activeRange_m"]
    # both pipelines must derive the same fit grid; the reference ran on
    # the Sphere model's own default active range, which must equal our
    # ParamSpec default (1-1000 nm)
    np.testing.assert_allclose(d.q, np.asarray(fix["fitX0"]), rtol=1e-9)
    bound = get_model("Sphere").bind()
    np.testing.assert_allclose(bound.ranges[0], [lo, hi], rtol=1e-12)
    n_reps = int(fix["workload"]["numReps"])
    # the headline-bench proposal budget (sphere10 needs ~6.5M at K=128)
    cfg = McSASConfig(num_contribs=int(fix["workload"]["numContribs"]),
                      num_reps=n_reps, max_iterations=8_000_000,
                      chunk_steps=2000, seed=101, max_retries=1,
                      convergence_criterion=1.0,
                      candidates_per_step=128, local_moves=0.5)
    eng = McSASEngine(d, bound, cfg)
    res = eng.run()
    assert res.converged.all(), "engine must reach the reference's chi2<=1"
    return fix, d, bound, cfg, res


def _fixture_hist(fix, weight):
    h = fix["histograms"][weight]
    return (np.asarray(h["xLowerEdge"]), np.asarray(h["yMean"]),
            h["moments"])


@pytest.mark.parametrize("weight", ["vol", "num"])
def test_crossval_histograms_match_reference(crossval_run, weight):
    fix, d, bound, cfg, res = crossval_run
    edges_ref, y_ref, moments_ref = _fixture_hist(fix, weight)
    lo, hi = fix["workload"]["activeRange_m"]
    spec = HistogramSpec("radius", lo, hi, bin_count=len(y_ref),
                         xscale="log", yweight=weight,
                         auto_follow=False).resolved(bound)
    _, hists = histogram_all(res.contribs, d, bound, cfg, [spec])
    h = hists[0]
    # identical binning rule (logspace over the same range)
    np.testing.assert_allclose(h.x_lower_edge, edges_ref, rtol=1e-9)
    # distribution comparison at the reference's own regression
    # tolerance (0.2 on bars), on normalized bars — absolute units
    # depend on the fitted scaling, compared separately below
    y_eng = h.bins.mean / max(h.bins.mean.sum(), 1e-300)
    y_ref_n = y_ref / max(y_ref.sum(), 1e-300)
    np.testing.assert_allclose(y_eng, y_ref_n, atol=0.2)
    assert abs(int(np.argmax(y_eng)) - int(np.argmax(y_ref_n))) <= 1
    # the distribution mean radius (first moment) must agree closely —
    # it is the headline scientific deliverable
    mean_eng = h.moments.mean[0]
    mean_ref = moments_ref["mean"][0]
    assert abs(mean_eng - mean_ref) <= 0.05 * abs(mean_ref), (
        f"{weight}-weighted mean radius {mean_eng} vs reference "
        f"{mean_ref}")


def test_crossval_fit_curve_matches_reference(crossval_run):
    fix, d, bound, cfg, res = crossval_run
    ref_mean = np.asarray(fix["fitMeasValMean"])
    eng_mean = res.measval.mean(axis=0)
    # the reference regression metric (mcsas_test.py:15-27,116): relative
    # half-difference, tolerance 0.005 on the rep-averaged fit curve
    diff = np.abs(eng_mean - ref_mean) / (np.abs(eng_mean)
                                          + np.abs(ref_mean)) / 2.0
    assert float(diff.max()) < 0.005, (
        f"fit curve relative half-diff max {diff.max():.4g}")


def test_crossval_scaling_background(crossval_run):
    fix, d, bound, cfg, res = crossval_run
    sc_ref, sc_std = fix["scaling_mean_std"]
    sc_eng = res.scaling.mean()
    # scaling agrees within a few std-over-reps of the reference run
    tol = max(3.0 * sc_std, 0.02 * abs(sc_ref))
    assert abs(sc_eng - sc_ref) <= tol, (
        f"scaling {sc_eng:.4g} vs reference {sc_ref:.4g} ± {sc_std:.2g}")
