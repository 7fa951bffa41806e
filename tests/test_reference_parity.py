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
    # generated with --model gaussianchain --no-rebin: nBin=0 + the
    # explicit fuMin floor is the one reference-supported route on which
    # its own gauss2 dataset is genuinely fittable (the default binned
    # path hits the σ=−1 rebin bug, PARITY.md)
    "gauss": ("reference_gauss_fixture.json",
              "sasfit_gauss2-5-1.5-2-1.dat"),
}

# fixture workload "model" field → our registry name
_MODEL_NAMES = {"sphere": "Sphere", "gaussianchain": "GaussianChain"}


def _crossval_engine_run(fix, refdata, dataset, **variant):
    # mirror the reference run's data pipeline: noRebin fixtures were fit
    # on the sanitized (un-binned) grid with the fuMin floor applied
    dcfg = (data.DataConfig(n_bin=0)
            if fix["workload"].get("noRebin") else None)
    d = data.load(refdata / dataset, config=dcfg)
    lo, hi = fix["workload"]["activeRange_m"]
    # both pipelines must derive the same fit grid; the reference ran on
    # the model's own default active range, which must equal our
    # ParamSpec default
    np.testing.assert_allclose(d.q, np.asarray(fix["fitX0"]), rtol=1e-9)
    model_name = _MODEL_NAMES[fix["workload"].get("model", "sphere")]
    bound = get_model(model_name).bind()
    np.testing.assert_allclose(bound.ranges[0], [lo, hi], rtol=1e-12)
    n_reps = int(fix["workload"]["numReps"])
    cfg = McSASConfig(num_contribs=int(fix["workload"]["numContribs"]),
                      num_reps=n_reps, max_iterations=8_000_000,
                      chunk_steps=2000, seed=101, max_retries=1,
                      convergence_criterion=1.0, **variant)
    eng = McSASEngine(d, bound, cfg)
    res = eng.run()
    assert res.converged.all(), "engine must reach the reference's chi2<=1"
    return d, bound, cfg, res


@pytest.fixture(scope="module", params=sorted(_FIXTURES))
def crossval_run(request, refdata):
    """The engine in K=1 REFERENCE-STEPPING mode (sequential cursor, one
    proposal per iteration, accept-if-χ²-improves — exactly the
    reference's MC semantics) on the fixture's own workload.  K=1 is the
    apples-to-apples comparison: the two runs then differ only in RNG
    stream, so every reported quantity must agree within run-to-run
    spread.  (The accelerated K=128 headline config is certified
    separately: it matches on everything the DATA constrains, but its
    best-of-K accept prunes the sub-observability junk contributions
    the reference's sequential accept accumulates, so unconstrained
    quantities — number-weighted tails, raw scaling — diverge; see
    test_crossval_headline_observables.)"""
    fixfile, dataset = _FIXTURES[request.param]
    path = _TESTDATA / fixfile
    if not path.exists():
        pytest.skip(f"reference fixture {fixfile} not generated "
                    "(tools/run_reference.py)")
    fix = json.loads(path.read_text())
    if "error" in fix:
        pytest.skip(f"reference run failed: {fix['error']}")
    d, bound, cfg, res = _crossval_engine_run(
        fix, refdata, dataset, candidates_per_step=1)
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
    spec = HistogramSpec(bound.active[0], lo, hi, bin_count=len(y_ref),
                         xscale="log", yweight=weight,
                         auto_follow=False).resolved(bound)
    _, hists = histogram_all(res.contribs, d, bound, cfg, [spec])
    h = hists[0]
    # identical binning rule (logspace over the same range)
    np.testing.assert_allclose(h.x_lower_edge, edges_ref, rtol=1e-9)
    # distribution comparison at the reference's own regression
    # tolerance (0.2 on bars), on normalized bars — absolute units
    # depend on the fitted scaling, compared separately below
    # (measured K=1 max bar diff: 0.013-0.059 across both fixtures)
    y_eng = h.bins.mean / max(h.bins.mean.sum(), 1e-300)
    y_ref_n = y_ref / max(y_ref.sum(), 1e-300)
    np.testing.assert_allclose(y_eng, y_ref_n, atol=0.2)
    assert abs(int(np.argmax(y_eng)) - int(np.argmax(y_ref_n))) <= 1
    # the distribution mean radius (first moment) is the headline
    # scientific deliverable; it is a PER-REP random quantity, so the
    # means must agree within the reference's own rep-to-rep spread
    # (its fixture std), with a 5% floor for the near-deterministic case
    mean_eng = h.moments.mean[0]
    mean_ref, std_ref = moments_ref["mean"][0], moments_ref["mean"][1]
    tol = max(3.0 * abs(std_ref), 0.05 * abs(mean_ref))
    assert abs(mean_eng - mean_ref) <= tol, (
        f"{weight}-weighted mean radius {mean_eng} vs reference "
        f"{mean_ref} ± {std_ref}")


def test_crossval_fit_curve_matches_reference(crossval_run):
    fix, d, bound, cfg, res = crossval_run
    ref_mean = np.asarray(fix["fitMeasValMean"])
    eng_mean = np.asarray(res.measval, np.float64).mean(axis=0)
    # the physically meaningful cross-implementation metric: the MC only
    # pins the fit curve to the data within its uncertainty (both runs
    # stop at reduced χ²≤1), so two converged curves sit at independent
    # spots inside the data's 1σ band — they must agree within a few σ
    # of the DATA uncertainty pointwise and within ~1σ² on average
    # (measured K=1: max 0.74σ / 1.35σ, mean z² ≪ 1).  Tighter metrics
    # (the reference's own same-implementation 0.005 half-diff,
    # mcsas_test.py:15-27,116, or SEM-of-the-mean envelopes) measure
    # implementation noise the data does not constrain: the measured
    # cross-implementation half-diff is 0.023 even at strongly
    # signal-dominated points — all of it within 0.74σ of the data.
    fu = np.asarray(d.fu, np.float64)
    z = np.abs(eng_mean - ref_mean) / np.where(fu == 0, 1.0, fu)
    assert float(z.max()) < 3.0, (
        f"fit curve deviates {z.max():.2f}σ of data uncertainty")
    assert float((z ** 2).mean()) < 1.0, (
        f"fit curves differ by χ²-like {np.mean(z ** 2):.3f} per point")


def test_crossval_scaling_background(crossval_run):
    fix, d, bound, cfg, res = crossval_run
    sc_ref, sc_std = fix["scaling_mean_std"]
    bg_ref, bg_std = fix["background_mean_std"]
    sc = np.asarray(res.scaling, np.float64)
    bg = np.asarray(res.background, np.float64)
    # scaling and background are per-rep random quantities: the two
    # implementations' means must agree within the combined rep-to-rep
    # spread (measured K=1: scaling 0.6-1.6% apart at 0.8-2.2% spreads)
    sc_tol = max(3.0 * math.hypot(sc_std, sc.std()), 0.02 * abs(sc_ref))
    assert abs(sc.mean() - sc_ref) <= sc_tol, (
        f"scaling {sc.mean():.4g} vs reference {sc_ref:.4g} ± {sc_std:.2g}")
    bg_tol = 3.0 * math.hypot(bg_std, bg.std())
    assert abs(bg.mean() - bg_ref) <= bg_tol, (
        f"background {bg.mean():.4g} vs reference {bg_ref:.4g} "
        f"± {bg_std:.2g}")


def test_crossval_headline_observables(refdata):
    """The K=128+local-moves HEADLINE config against the real reference:
    everything the data constrains must match — the volume-weighted
    distribution (the scientific deliverable) and the fit curve in data-σ
    units.  Unconstrained junk DOF (number-weighted tails, raw scaling)
    legitimately differ: best-of-K accept prunes sub-observability
    contributions that sequential accept keeps as frozen noise."""
    fixfile, dataset = _FIXTURES["quickstart"]
    path = _TESTDATA / fixfile
    if not path.exists():
        pytest.skip("quickstart fixture not generated")
    fix = json.loads(path.read_text())
    d, bound, cfg, res = _crossval_engine_run(
        fix, refdata, dataset, candidates_per_step=128, local_moves=0.5)
    edges_ref, y_ref, moments_ref = _fixture_hist(fix, "vol")
    lo, hi = fix["workload"]["activeRange_m"]
    spec = HistogramSpec("radius", lo, hi, bin_count=len(y_ref),
                         xscale="log", yweight="vol",
                         auto_follow=False).resolved(bound)
    _, hists = histogram_all(res.contribs, d, bound, cfg, [spec])
    h = hists[0]
    y_eng = h.bins.mean / max(h.bins.mean.sum(), 1e-300)
    y_ref_n = y_ref / max(y_ref.sum(), 1e-300)
    np.testing.assert_allclose(y_eng, y_ref_n, atol=0.2)
    assert int(np.argmax(y_eng)) == int(np.argmax(y_ref_n))
    fu = np.asarray(d.fu, np.float64)
    eng_mean = np.asarray(res.measval, np.float64).mean(axis=0)
    z = np.abs(eng_mean - np.asarray(fix["fitMeasValMean"])) \
        / np.where(fu == 0, 1.0, fu)
    assert float(z.max()) < 3.0


# --------------------- joint 2-parameter MC crossval (VERDICT r4 #2) ------

_CYL_FIXTURE = _TESTDATA / "reference_cyl_fixture.json"


@pytest.fixture(scope="module")
def cyl_fixture():
    if not _CYL_FIXTURE.exists():
        pytest.skip("reference cylinder fixture not generated "
                    "(tools/run_reference.py --model cylinder)")
    fix = json.loads(_CYL_FIXTURE.read_text())
    if "error" in fix:
        pytest.skip(f"reference run failed: {fix['error']}")
    return fix


def _cyl_engine_run(fix, **variant):
    """The engine on the reference's own cylinder workload: radius AND
    length active (useAspect off), the same active boxes, the same
    intDiv=100 quadrature rule in the hot loop (table_ff='off': the
    converged-rule table deviates up to 2.7x from the reference's rule
    at the box corners — tools/make_cyldata.py audit — so the
    apples-to-apples comparison must ride the exact shared rule,
    crossvalidated <=1e-6 in test_crossval_formfactor_curves)."""
    wl = fix["workload"]
    d = data.load(_TESTDATA / "cylmix.dat")
    np.testing.assert_allclose(d.q, np.asarray(fix["fitX0"]), rtol=1e-9)
    ranges = {k: tuple(v) for k, v in wl["activeRanges_m"].items()}
    bound = get_model("CylindersIsotropic").bind(
        active=("radius", "length"), active_ranges=ranges,
        fixed={"useAspect": 0.0})
    cfg = McSASConfig(num_contribs=int(wl["numContribs"]),
                      num_reps=int(wl["numReps"]),
                      convergence_criterion=wl["convergenceCriterion"],
                      max_iterations=8_000_000, chunk_steps=4000,
                      seed=101, max_retries=1, table_ff="off", **variant)
    eng = McSASEngine(d, bound, cfg)
    assert not eng.uses_table and not eng.uses_pallas
    res = eng.run()
    assert res.converged.all(), \
        "engine must reach the reference's chi2 criterion"
    return d, bound, cfg, res


def _cyl_check_distributions(fix, d, bound, cfg, res, params,
                             weights=("vol", "num"),
                             check_moments=True):
    wl = fix["workload"]
    for pname in params:
        lo, hi = wl["activeRanges_m"][pname]
        for weight in weights:
            h_ref = fix["histograms"][f"{pname}:{weight}"]
            y_ref = np.asarray(h_ref["yMean"], np.float64)
            spec = HistogramSpec(pname, lo, hi, bin_count=len(y_ref),
                                 xscale="log", yweight=weight,
                                 auto_follow=False).resolved(bound)
            _, hists = histogram_all(res.contribs, d, bound, cfg, [spec])
            h = hists[0]
            lbl = f"{pname}:{weight}"
            np.testing.assert_allclose(
                h.x_lower_edge, np.asarray(h_ref["xLowerEdge"]),
                rtol=1e-9, err_msg=lbl)
            # the reference's own regression tolerance (0.2 on bars,
            # mcsas_test.py:105-116) on normalized distributions
            y_eng = h.bins.mean / max(h.bins.mean.sum(), 1e-300)
            y_ref_n = y_ref / max(y_ref.sum(), 1e-300)
            np.testing.assert_allclose(y_eng, y_ref_n, atol=0.2,
                                       err_msg=lbl)
            # (no argmax check here: the 2-population target makes the
            # vol mode a coin-flip between peaks and the num-weighted
            # bars are prior-flat, where argmax is pure noise)
            if not check_moments:
                # best-of-K configs: raw moments integrate the
                # sub-observability tail weight that sequential accept
                # accumulates and best-of-K prunes (measured here: K=128
                # +local vol-mean radius 2.92e-9 vs the reference's
                # 2.29e-9 at a 2.63e-9 truth — each sampler biases the
                # unconstrained DOF its own way).  Same certified
                # precedent as test_crossval_headline_observables:
                # compare what the DATA constrains (bars, mode, curve).
                continue
            # first moment within the combined rep-to-rep spread (per-rep
            # random quantity; 2-param reconstructions scatter more than
            # the 1-param fixtures, hence the hypot of both stds)
            mean_ref, std_ref = h_ref["moments"]["mean"]
            mean_eng, std_eng = h.moments.mean
            tol = max(3.0 * math.hypot(std_ref, std_eng),
                      0.10 * abs(mean_ref))
            assert abs(mean_eng - mean_ref) <= tol, (
                f"{lbl}: mean {mean_eng:.3e} vs reference "
                f"{mean_ref:.3e} ± {std_ref:.2e}")
    # fit curves agree within the data uncertainty (both converged to
    # the same chi2 target; see test_crossval_fit_curve docstring)
    fu = np.asarray(d.fu, np.float64)
    eng_mean = np.asarray(res.measval, np.float64).mean(axis=0)
    z = np.abs(eng_mean - np.asarray(fix["fitMeasValMean"])) \
        / np.where(fu == 0, 1.0, fu)
    assert float(z.max()) < 3.0, f"fit curve deviates {z.max():.2f}σ"
    assert float((z ** 2).mean()) < 1.0


def test_crossval_cylinder_joint_reconstruction(cyl_fixture):
    """The joint radius x length distribution reconstruction against the
    RUNNING reference (fixture: tools/run_reference.py --model cylinder
    on the synthetic 2-population cylmix.dat) in K=1 reference-stepping
    mode: both histogrammed dimensions and both weightings must match
    within the reference's own tolerances — closes the one MC-level
    validation gap (all prior MC crossvals were 1-parameter fits;
    reference: models/cylindersisotropic.py:50-90)."""
    fix = cyl_fixture
    d, bound, cfg, res = _cyl_engine_run(fix, candidates_per_step=1)
    _cyl_check_distributions(fix, d, bound, cfg, res,
                             ("radius", "length"))


@pytest.mark.skipif(
    __import__("os").environ.get("MCSAS_TPU_SLOW_TESTS", "") != "1",
    reason="K=128 cylinder quadrature on CPU takes ~13 min; set "
           "MCSAS_TPU_SLOW_TESTS=1 (certified 2026-08-19, PARITY.md)")
def test_crossval_cylinder_local_moves(cyl_fixture):
    """The local-move accelerator (the knob that matters most for joint
    multi-parameter fits) against the same reference run: everything
    the DATA constrains must match — vol-weighted distributions in both
    dimensions and the fit curve.  Number-weighted tails legitimately
    differ under best-of-K accept (see test_crossval_headline_
    observables)."""
    fix = cyl_fixture
    d, bound, cfg, res = _cyl_engine_run(
        fix, candidates_per_step=128, local_moves=0.5)
    _cyl_check_distributions(fix, d, bound, cfg, res,
                             ("radius", "length"), weights=("vol",),
                             check_moments=False)


# --------------------------------------- core-shell joint crossval (r5)

_CS_FIXTURE = _TESTDATA / "reference_cs_fixture.json"


@pytest.fixture(scope="module")
def cs_fixture():
    if not _CS_FIXTURE.exists():
        pytest.skip("reference core-shell fixture not generated "
                    "(tools/run_reference.py --model coreshell)")
    fix = json.loads(_CS_FIXTURE.read_text())
    if "error" in fix:
        pytest.skip(f"reference run failed: {fix['error']}")
    return fix


def _cs_engine_run(fix, **variant):
    """The engine on the reference's own core-shell workload: core
    radius AND shell thickness active, the same active boxes.  The
    Spherical Shell III form factor is ANALYTIC (reference:
    sphericalcoreshell.py:50-69, crossvalidated to 1e-9 in
    test_crossval_formfactor_curves), so unlike the cylinder crossval
    there is no quadrature rule to pin — both MCs fit the exactly
    representable synthetic curve (tools/make_csdata.py)."""
    wl = fix["workload"]
    d = data.load(_TESTDATA / "csmix.dat")
    np.testing.assert_allclose(d.q, np.asarray(fix["fitX0"]), rtol=1e-9)
    ranges = {k: tuple(v) for k, v in wl["activeRanges_m"].items()}
    bound = get_model("SphericalCoreShell").bind(
        active=("radius", "t"), active_ranges=ranges)
    cfg = McSASConfig(num_contribs=int(wl["numContribs"]),
                      num_reps=int(wl["numReps"]),
                      convergence_criterion=wl["convergenceCriterion"],
                      max_iterations=8_000_000, chunk_steps=4000,
                      seed=101, max_retries=1, **variant)
    eng = McSASEngine(d, bound, cfg)
    res = eng.run()
    assert res.converged.all(), \
        "engine must reach the reference's chi2 criterion"
    return d, bound, cfg, res


def test_crossval_coreshell_joint_reconstruction(cs_fixture):
    """The joint (core radius x shell thickness) reconstruction against
    the RUNNING reference (fixture: tools/run_reference.py --model
    coreshell on the synthetic 2-population csmix.dat) in K=1
    reference-stepping mode: both histogrammed dimensions and both
    weightings within the reference's own tolerances — the second joint
    2-parameter MC crossval (VERDICT r4 missing #1 named 'cylinders,
    core-shells'; reference: models/sphericalcoreshell.py:50-69)."""
    fix = cs_fixture
    d, bound, cfg, res = _cs_engine_run(fix, candidates_per_step=1)
    _cyl_check_distributions(fix, d, bound, cfg, res, ("radius", "t"))


def test_crossval_coreshell_local_moves(cs_fixture):
    """The K=128 + local-move accelerator on the same reference run
    (analytic family — fast enough on CPU for the default suite, unlike
    the quadrature-bound cylinder variant): everything the DATA
    constrains must match — vol-weighted distributions in both
    dimensions and the fit curve."""
    fix = cs_fixture
    d, bound, cfg, res = _cs_engine_run(
        fix, candidates_per_step=128, local_moves=0.5)
    _cyl_check_distributions(fix, d, bound, cfg, res,
                             ("radius", "t"), weights=("vol",),
                             check_moments=False)


# ------------------------------- SMEARED MC-level crossval (round 5)

_SMEARMC_FIXTURE = _TESTDATA / "reference_smearmc_fixture.json"


@pytest.fixture(scope="module")
def smearmc_fixture():
    """The reference's own slit-smeared MC run (tools/run_reference.py
    --model smearsphere on the synthetic smearmix.dat).  All prior
    MC-level crossvals fit UNSMEARED curves; the smearing path itself is
    anchored deterministically (bitwise locs + ≤7.3e-10 intensities,
    test_crossval_smearing_path) — this fixture covers the COMPOSITION
    smearing × MC engine end to end (reference: the smeared calcIntensity
    branch, bases/model/sasmodel.py:56-73, engaged under the live MC
    loop mcsas/mcsas.py:354-404)."""
    if not _SMEARMC_FIXTURE.exists():
        pytest.skip("reference smeared-MC fixture not generated "
                    "(tools/run_reference.py --model smearsphere)")
    fix = json.loads(_SMEARMC_FIXTURE.read_text())
    if "error" in fix:
        pytest.skip(f"reference run failed: {fix['error']}")
    # the fixture must provably have run the reference's SMEARED branch:
    # the runner records the locs matrix shape + integration points it
    # asserted before calc() (run_reference.py smearAudit)
    aud = fix["workload"]["smearAudit"]
    assert aud and aud["locsShape"][1] > 1 and aud["nIntPoints"] > 1
    # 1-parameter fixtures key histograms by weighting alone; normalize
    # to the param:weight form _cyl_check_distributions consumes
    for w in ("vol", "num"):
        if w in fix["histograms"]:
            fix["histograms"][f"radius:{w}"] = fix["histograms"][w]
    return fix


def _smearmc_engine_run(fix, **variant):
    """The engine on the reference's smeared workload: the same
    trapezoidal slit geometry (SI umbra:penumbra recorded in the
    fixture), the same no-rebin route, the same active box."""
    from mcsas_tpu.data import DataConfig, TrapezoidSmearing
    wl = fix["workload"]
    u, p = (float(v) for v in wl["smearing"].split(":"))
    d = data.load(_TESTDATA / "smearmix.dat", config=DataConfig(
        n_bin=0, smearing=TrapezoidSmearing(
            do_smear=True, umbra=u, penumbra=p)))
    assert d.locs is not None and d.locs.shape[1] == \
        fix["workload"]["smearAudit"]["nIntPoints"]
    np.testing.assert_allclose(d.q, np.asarray(fix["fitX0"]), rtol=1e-9)
    ranges = {k: tuple(v) for k, v in wl["activeRanges_m"].items()}
    bound = get_model("Sphere").bind(active=("radius",),
                                     active_ranges=ranges)
    cfg = McSASConfig(num_contribs=int(wl["numContribs"]),
                      num_reps=int(wl["numReps"]),
                      convergence_criterion=wl["convergenceCriterion"],
                      max_iterations=8_000_000, chunk_steps=4000,
                      seed=101, max_retries=1, **variant)
    eng = McSASEngine(d, bound, cfg)
    res = eng.run()
    assert res.converged.all(), \
        "engine must reach the reference's chi2 criterion"
    return d, bound, cfg, res


def test_crossval_smeared_mc_reconstruction(smearmc_fixture):
    """Slit-smeared 2-population sphere reconstruction against the
    RUNNING reference in K=1 reference-stepping mode: distributions in
    both weightings, moments and the smeared fit curve within the
    reference's own tolerances."""
    fix = smearmc_fixture
    d, bound, cfg, res = _smearmc_engine_run(fix, candidates_per_step=1)
    _cyl_check_distributions(fix, d, bound, cfg, res, ("radius",))


def test_crossval_smeared_mc_local_moves(smearmc_fixture):
    """The K=128 + local-move accelerator on the same smeared reference
    run: everything the DATA constrains must match (vol-weighted bars +
    the smeared fit curve; the number-weighted tail differs under
    best-of-K accept, see test_crossval_headline_observables)."""
    fix = smearmc_fixture
    d, bound, cfg, res = _smearmc_engine_run(
        fix, candidates_per_step=128, local_moves=0.5)
    _cyl_check_distributions(fix, d, bound, cfg, res, ("radius",),
                             weights=("vol",), check_moments=False)


# ------------------------------------------------- ff-curve crossval (r4)

_FF_FIXTURE = _TESTDATA / "reference_ff_fixture.json"

# Tolerance vs the reference's OWN model code (tools/run_reference_ff.py
# evaluates /root/reference/src/mcsas/models/*.py on deterministic
# parameter draws).  Analytic families agree to float64 roundoff; the
# quadrature families to the rule mismatch (reference trapz/linspace +
# endpoint hacks vs our `where`-based limits; reference adaptive
# scipy quad vs our Filon–Simpson/Boole rule for Kholodenko; the tilted
# phi centroids run through scipy.stats.norm.interval upstream).
_FF_RTOL = {
    "Sphere": 1e-9,
    "SphericalCoreShell": 1e-9,
    "GaussianChain": 1e-9,
    "LMADenseSphere": 1e-9,
    "EllipsoidsIsotropic": 1e-9,
    "EllipsoidalCoreShell": 1e-9,
    "CylindersIsotropic": 1e-6,
    "CylindersRadiallyIsotropic": 1e-6,
    "Kholodenko": 5e-6,
    "CylindersRadiallyIsotropicTilted": 1e-3,
}


def _ff_entries(family):
    if not _FF_FIXTURE.exists():
        pytest.skip("reference ff fixture not generated "
                    "(tools/run_reference_ff.py)")
    fix = json.loads(_FF_FIXTURE.read_text())
    return np.asarray(fix["q"], np.float64), fix["models"][family]


def _our_curve(family, q, params):
    import jax
    model = get_model(family)
    full = model.defaults()
    full.update({k: (1.0 if v is True else 0.0 if v is False else float(v))
                 for k, v in params.items()})
    ff = np.asarray(jax.jit(lambda qq: model.ff(qq, full))(
        np.asarray(q, np.float64)))
    return ff, float(model.volume(full))


@pytest.mark.parametrize("family", sorted(_FF_RTOL))
def test_crossval_formfactor_curves(family):
    """Every model family's ff(q) and volume against the running
    reference implementation itself — not a re-derivation."""
    q, entries = _ff_entries(family)
    for e in entries:
        ref = np.asarray(e["ff"], np.float64)
        assert np.isfinite(ref).all(), "unexpected non-finite reference ff"
        got, vol = _our_curve(family, q, e["params"])
        np.testing.assert_allclose(got, ref, rtol=_FF_RTOL[family],
                                   err_msg=str(e["params"]))
        assert vol == pytest.approx(e["volume"], rel=1e-12)


def test_crossval_aspect_cylinders_broken_upstream():
    """The reference's CylindersIsotropicAspect formfactor is
    unconditionally NaN (its psi grid starts at sin(0)=0 so the first
    column is 0/0, and numpy.mean propagates it to every q; it also
    double-converts the already-SI psi by dToR —
    cylindersisotropicaspect.py:50-72).  Ours is the working equivalent;
    document the upstream breakage and check we stay finite on the same
    draws (working-here / broken-upstream column, PARITY.md)."""
    q, entries = _ff_entries("CylindersIsotropicAspect")
    for e in entries:
        ref = np.asarray(e["ff"], np.float64)
        assert np.isnan(ref).all(), \
            "upstream fixed their NaN bug? re-evaluate this anchor"
        got, vol = _our_curve("CylindersIsotropicAspect", q, e["params"])
        assert np.isfinite(got).all() and (got > 0).all()
        assert vol == pytest.approx(e["volume"], rel=1e-12)


# ------------------------------------------- deterministic post crossval

_HIST_FIXTURE = _TESTDATA / "reference_hist_fixture.json"


def test_crossval_post_analysis_deterministic():
    """The post-fit analysis is a deterministic function of
    (data, contributions), so — unlike the MC fixtures, where the RNG
    streams force statistical tolerances — the reference's own
    McSAS.histogram machinery (mcsas.py:445-615, utils/parameter.py:
    349-479) and ours must agree at SOLVER precision on identical
    inputs (SURVEY §7 step 6).  tools/run_reference_hist.py ran the
    actual reference on a fixed log-uniform contribution set and its
    own binned sphere-10 data; both are in the fixture, so this feeds
    bit-identical inputs into mcsas_tpu's post.histogram_all.

    Measured agreement (round 4): bin edges bitwise, fractions /
    observability / histogram bars / CDFs / moments <= 2.3e-9 rel, the
    scale factor <= 3e-9 rel; only the reference's BACKGROUND carries
    its scipy-LM convergence tolerance (~2e-5 rel) against our exact
    closed-form solve."""
    if not _HIST_FIXTURE.exists():
        pytest.skip("reference hist fixture not generated "
                    "(tools/run_reference_hist.py)")
    fix = json.loads(_HIST_FIXTURE.read_text())
    wl = fix["workload"]
    assert wl["findBackground"] and not wl["positiveBackground"]

    # identical input 1: the reference's own binned fit grid (SI) —
    # n_bin=0 + zero floor passes the vectors through untouched
    q = np.asarray(fix["q_binned"], np.float64)
    f = np.asarray(fix["f_binned"], np.float64)
    fu = np.asarray(fix["fu_binned"], np.float64)
    raw = np.column_stack([q * 1e-9, f, fu])
    d = data.from_raw(raw, title="ref-binned",
                      config=data.DataConfig(n_bin=0, fu_min=0.0))
    # q round-trips through the nm^-1 display unit (one ulp); f/fu are
    # SI pass-through
    np.testing.assert_allclose(d.q, q, rtol=1e-14)
    np.testing.assert_array_equal(d.f, f)
    np.testing.assert_array_equal(d.fu, fu)

    # identical input 2: the fixed contribution set, (N, P, R) -> (R, N, P)
    contribs = np.transpose(np.asarray(fix["contribs"], np.float64),
                            (2, 0, 1))
    bound = get_model("Sphere").bind()
    cfg = McSASConfig()
    assert cfg.compensation_exponent == pytest.approx(
        wl["compensationExponent"], rel=1e-12)
    specs = [HistogramSpec(param="radius", lower=h["lower"],
                           upper=h["upper"], bin_count=h["binCount"],
                           xscale=h["xscale"], yweight=h["yweight"])
             for h in fix["histograms"]]
    fractions, hists = histogram_all(contribs, d, bound, cfg, specs)

    # scaling: exact closed form vs the reference's scipy LM
    sc_ref = np.asarray(fix["scaling"], np.float64)
    np.testing.assert_allclose(fractions.scaling[0], sc_ref[0], rtol=1e-7)
    np.testing.assert_allclose(fractions.scaling[1], sc_ref[1], rtol=1e-3,
                               atol=1e-9 * np.abs(f).max())

    # per-contribution fractions and observability limits (unnormalized
    # vol weighting — num/int/surf are covered via totals + histograms)
    np.testing.assert_allclose(fractions.fraction["vol"],
                               np.asarray(fix["volumeFraction"]),
                               rtol=1e-7)
    np.testing.assert_allclose(fractions.min_req["vol"],
                               np.asarray(fix["minReqVol"]), rtol=1e-7)
    for w in ("vol", "num", "int", "surf"):
        np.testing.assert_allclose(fractions.total[w],
                                   np.asarray(fix["totals"][w]),
                                   rtol=1e-7, err_msg=w)

    for h_ref, h in zip(fix["histograms"], hists):
        lbl = f'{h_ref["yweight"]}-{h_ref["xscale"]}'
        np.testing.assert_allclose(h.x_lower_edge,
                                   np.asarray(h_ref["xLowerEdge"]),
                                   rtol=1e-12, err_msg=lbl)
        bins_ref = np.asarray(h_ref["binsFull"], np.float64)
        scale = max(np.abs(bins_ref).max(), 1e-300)
        np.testing.assert_allclose(h.bins.full, bins_ref, rtol=1e-7,
                                   atol=1e-7 * scale, err_msg=lbl)
        obs_ref = np.asarray(h_ref["observability"], np.float64)
        np.testing.assert_allclose(
            h.observability, obs_ref, rtol=1e-7,
            atol=1e-7 * max(np.abs(obs_ref).max(), 1e-300), err_msg=lbl)
        np.testing.assert_allclose(h.cdf.full,
                                   np.asarray(h_ref["cdfFull"]),
                                   atol=1e-12, err_msg=lbl)
        mom_ref = h_ref["moments"]
        for k in ("total", "mean", "variance", "skew", "kurtosis"):
            ref_pair = np.asarray(mom_ref[k], np.float64)
            got_pair = np.asarray(getattr(h.moments, k), np.float64)
            np.testing.assert_allclose(
                got_pair, ref_pair, rtol=1e-6,
                atol=1e-6 * max(np.abs(ref_pair).max(), 1e-300),
                err_msg=f"{lbl}:{k}")


# ------------------------------------------------- smearing-path crossval

_SMEAR_FIXTURE = _TESTDATA / "reference_smear_fixture.json"


def _smear_cases():
    if not _SMEAR_FIXTURE.exists():
        return []
    return json.loads(_SMEAR_FIXTURE.read_text())["cases"]


@pytest.mark.parametrize("case", _smear_cases(),
                         ids=lambda c: c["name"])
def test_crossval_smearing_path(case):
    """The smearing pipeline — integration grid construction
    (setIntPoints), the locs matrix (prepareSmearing) and the smeared
    intensity branch of calcIntensity — against the reference's own
    running code (tools/run_reference_smear.py), for all four geometry
    combinations: {Trapezoid, Gaussian} x {slit, 2D-averaged}.

    Measured agreement (round 4): binned q and the locs matrix BITWISE;
    smeared single-contribution intensities <= 7.3e-10 rel (our
    precomputed (ff^2 w) @ smear_w contraction vs the reference's
    2 trapz(ff^2 w weights, qOffset))."""
    fix = json.loads(_SMEAR_FIXTURE.read_text())
    p = case["params"]
    if case["kind"] == "trap":
        sm = data.TrapezoidSmearing(do_smear=True, n_steps=25,
                                    two_d_coll=p["twoDColl"],
                                    umbra=p["umbra"],
                                    penumbra=p["penumbra"])
    else:
        sm = data.GaussianSmearing(do_smear=True, n_steps=25,
                                   two_d_coll=p["twoDColl"],
                                   variance=p["variance"])
    # the bundled byte-identical copy of the reference's dataset: the
    # fixture is committed, so this test collects on checkouts where
    # /root/reference is absent
    d = data.load(_TESTDATA / "sasfit_sphere-10-1.dat",
                  config=data.DataConfig(smearing=sm))
    np.testing.assert_allclose(d.q, np.asarray(case["q_binned"]),
                               rtol=1e-12)
    np.testing.assert_allclose(d.locs, np.asarray(case["locs"]),
                               rtol=1e-12)

    import jax
    import jax.numpy as jnp
    model = get_model("Sphere")
    comp2 = 2.0 * fix["compExp"]
    ffj = jax.jit(lambda g, params: model.ff(g, params))
    for srow in case["smeared"]:
        params = model.defaults()
        params["radius"] = srow["radius"]
        ff = np.asarray(ffj(jnp.asarray(d.locs), params))
        w = float(model.volume(params)) ** comp2
        it = (ff * ff * w) @ np.asarray(d.smear_w)
        it_ref = np.asarray(srow["it"], np.float64).ravel()
        np.testing.assert_allclose(
            it, it_ref, rtol=1e-7,
            atol=1e-8 * np.abs(it_ref).max(),
            err_msg=f'{case["name"]} r={srow["radius"]}')


# ------------------------------------------------------- I/O crossval

_IO_FIXTURE = _TESTDATA / "reference_io_fixture.json"


def _io_fixture():
    if not _IO_FIXTURE.exists():
        pytest.skip("reference io fixture not generated "
                    "(tools/run_reference_io.py)")
    return json.loads(_IO_FIXTURE.read_text())


def _io_files():
    if not _IO_FIXTURE.exists():
        return []
    return sorted(json.loads(_IO_FIXTURE.read_text())["files"])


@pytest.mark.parametrize("native", [False, True],
                         ids=["python", "native"])
@pytest.mark.parametrize("name", _io_files())
def test_crossval_io_parser(name, native):
    """Tolerant ASCII parsing against the reference's own running
    AsciiFile.readArray (asciifile.py:99-143) on every dialect fixture
    the reference ships but never automated (SURVEY §4), plus the real
    data files.  Measured: BITWISE-identical arrays on 14/15 files for
    both the pure-Python and the C++ tokenizer paths.

    The one divergence is emptyInterspersedLines.csv: the reference
    treats a blank line after data as a footer (readTuple yields an
    empty tuple -> record None -> break, asciifile.py:126-134) and keeps
    only 13/50 rows despite the fixture's stated tolerance intent; we
    read the full table (working-here / limited-upstream, PARITY.md).
    Ours must still agree bitwise on the prefix the reference keeps."""
    from mcsas_tpu.io import load_ascii
    fix = _io_fixture()
    ref = np.asarray(fix["files"][name]["rawArray"], np.float64)
    got = load_ascii(_TESTDATA / name, use_native=native)
    if name == "testData01 emptyInterspersedLines.csv":
        assert ref.shape == (13, 3), \
            "upstream fixed their blank-line truncation? re-anchor"
        assert got.shape == (50, 3)
        got = got[:13]
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_crossval_io_ascii_writer():
    """write path: our format_data is byte-identical to the reference's
    ArrayFile.formatData ("{0: 14.6E}" cells, space-separated,
    asciifile.py:15-35) on a payload spanning 47 decades and signs."""
    from mcsas_tpu.io.ascii import format_data
    fix = _io_fixture()["ascii_write"]
    assert format_data(np.asarray(fix["data"])) == fix["text"]


def test_crossval_io_pdh_writer():
    """PDH write/read interop.  The reference's PDHFile.formatData is
    BROKEN as shipped (pdhfile.py:18 calls `super(PDHFile, self)` inside
    a classmethod -- NameError under py2 and py3 alike), so the fixture
    records (a) that error and (b) the text its two working pieces
    (PDHHeader + ArrayFile.formatData) compose, which the reference's
    own reader then re-parses.  Ours must write that text byte-for-byte
    and parse it to the same array (working-here / broken-upstream)."""
    from mcsas_tpu.io.ascii import format_data
    from mcsas_tpu.io.pdh import _header_lines, load_pdh
    fix = _io_fixture()["pdh_write"]
    assert fix["writer_error"].startswith("NameError"), \
        "upstream fixed their PDH writer? re-anchor this test"
    data_arr = np.asarray(fix["data"], np.float64)
    ours = ("\n".join(_header_lines(data_arr.shape[0],
                                    fix["description"]))
            + "\n" + format_data(data_arr))
    assert ours == fix["text"]
    # both readers must agree BITWISE on the written text; values match
    # the payload at the "{0: 14.6E}" format precision (6 decimals)
    reparsed = np.asarray(fix["reparsed"], np.float64)
    np.testing.assert_allclose(reparsed, data_arr, rtol=1e-6)
    pdh = _TESTDATA / "reference_io_roundtrip.pdh"
    try:
        pdh.write_text(ours + "\n", encoding="utf-8")
        assert np.array_equal(load_pdh(pdh), reparsed)
    finally:
        pdh.unlink(missing_ok=True)


# ------------------------------------------- series-statistics crossval

_SERIES_FIXTURE = _TESTDATA / "reference_series_fixture.json"


def test_crossval_series_statistics(tmp_path):
    """The across-files series-statistics accumulation and output table
    (api.run_files series handling + write_series_stats) against the
    reference's OWN running machinery (Calculator._updateSeries +
    processSeriesStats, gui/calc.py:333-379,186-217) on identical
    deterministic inputs — tools/run_reference_series.py ran the
    reference's Histogram.calc on three fixed contribution sets
    ("files") of its own binned sphere-10 data and dumped both the raw
    per-file moments and its formatted series table.

    Deterministic like the hist/smear/I/O fixtures: moments must agree
    at solver precision, and the table must carry the same rows (one
    per file x histogram) with the same values at the reference's own
    "{0: 14.6E}" format precision."""
    if not _SERIES_FIXTURE.exists():
        pytest.skip("reference series fixture not generated "
                    "(tools/run_reference_series.py)")
    from mcsas_tpu.api import write_series_stats
    fix = json.loads(_SERIES_FIXTURE.read_text())
    wl = fix["workload"]

    # identical input 1: the reference's own binned fit grid (SI)
    q = np.asarray(fix["q_binned"], np.float64)
    f = np.asarray(fix["f_binned"], np.float64)
    fu = np.asarray(fix["fu_binned"], np.float64)
    d = data.from_raw(np.column_stack([q * 1e-9, f, fu]),
                      title="series-crossval",
                      config=data.DataConfig(n_bin=0, fu_min=0.0))
    bound = get_model("Sphere").bind()
    cfg = McSASConfig()
    assert cfg.compensation_exponent == pytest.approx(
        wl["compensationExponent"], rel=1e-12)
    specs = [HistogramSpec(param="radius", lower=h["lo"], upper=h["hi"],
                           bin_count=h["binCount"], xscale=h["xscale"],
                           yweight=h["yweight"])
             for h in wl["histograms"]]
    assert tuple(wl["fieldNames"]) == __import__(
        "mcsas_tpu.post.histogram", fromlist=["Moments"]
    ).Moments.FIELD_NAMES

    # identical input 2: the per-"file" contribution sets, accumulated
    # exactly like run_files does (api.py series handling)
    series = {}
    for title, fd in fix["files"].items():
        contribs = np.transpose(np.asarray(fd["contribs"], np.float64),
                                (2, 0, 1))
        _, hists = histogram_all(contribs, d, bound, cfg, specs)
        for h, ref_fields in zip(hists, fd["moments_fields"]):
            got = np.asarray(h.moments.fields, np.float64)
            ref = np.asarray(ref_fields, np.float64)
            np.testing.assert_allclose(
                got, ref, rtol=1e-6,
                atol=1e-6 * max(np.abs(ref).max(), 1e-300),
                err_msg=f"{title}:{h.spec.yweight}")
            key = (h.spec.param, h.spec.lower, h.spec.upper,
                   h.spec.yweight)
            series.setdefault(key, []).append((title, h.moments.fields))

    # the written table vs the reference's formatted fileData: same row
    # set keyed by (file, weighting), same values at format precision
    fn = write_series_stats(series, tmp_path)
    lines = pathlib.Path(fn).read_text().strip().split("\n")
    header = lines[0].split()
    ours = {}
    for line in lines[1:]:
        vals = line.split()
        row = dict(zip(header, vals))
        ours[(row["sample"], row["weighting"])] = row
    fdat = fix["fileData"]
    n_rows = len(fdat["param"])
    assert len(ours) == n_rows
    for i in range(n_rows):
        key = (fdat["Data_object_title"][i].strip(),
               fdat["weighting"][i].strip())
        assert key in ours, f"row {key} missing from our table"
        row = ours[key]
        assert row["param"] == fdat["param"][i].strip()
        for col in ("lower", "upper") + tuple(wl["fieldNames"]):
            ref_v = float(fdat[col][i])
            got_v = float(row[col])
            assert got_v == pytest.approx(ref_v, rel=2e-6, abs=1e-12), (
                f"{key}:{col}: {got_v} vs reference {ref_v}")
