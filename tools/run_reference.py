# -*- coding: utf-8 -*-
"""Run the ORIGINAL reference McSAS (BAMresearch/McSAS, /root/reference)
under Python 3 and dump its results as a JSON fixture for statistical
cross-validation against mcsas_tpu (tests/test_reference_parity.py).

The reference is Python-2-era; it runs under Python 3 with two
mechanical shims applied to a THROWAWAY copy in a temp directory (the
read-only reference tree is never modified, and no reference code
enters this repository — the fixture holds only numerical results):

1. a minimal ``future`` package stand-in (``with_metaclass`` +
   ``standard_library.install_aliases`` no-op) — the real python-future
   dependency is not installed;
2. a headless ``gui/utils/__init__.py`` stub: ``processEventLoop`` is
   the GUI keep-alive the core imports through the acknowledged
   back-edge (reference mcsas/mcsas.py:23,400; SURVEY §1), a no-op
   without Qt.

Everything else runs the reference's own code: SASData construction
(uncertainty floor, log rebin), Sphere model, the MC engine
(mcsas/mcsas.py:287-439), histogramming (:445-615).

Workload: the regression-test shape from the reference's own
mcsas_test.py:62-66 (or --quickstart for the 36 s quickstart workload,
doc/source/quickstart.rst:106).

Usage:
    python tools/run_reference.py [--quickstart] [--reps N]
        [--contribs N] [--seed-reps] [--out fixture.json]
"""
import argparse
import os
import shutil
import subprocess
import sys
import tempfile
import time

REFERENCE = "/root/reference"

_FUTURE_INIT = '''\
class _SL:
    def install_aliases(self):
        pass
standard_library = _SL()
'''

_FUTURE_UTILS = '''\
def with_metaclass(meta, *bases):
    return meta("NewBase", bases or (object,), {})
'''

_GUI_UTILS_STUB = '''\
def processEventLoop():
    pass
'''


def prepare_tree(workdir: str) -> str:
    """Copies the reference package into *workdir* and applies the two
    py3 shims.  Returns the sys.path root.

    Deliberate exception to the no-copy rule (CLAUDE.md): the copy is a
    THROWAWAY under a temp dir, exists only to EXECUTE the reference for
    cross-validation (VERDICT r3 #4), and none of it enters the repo —
    the committed fixture holds numerical results only."""
    pkg = os.path.join(workdir, "mcsas")
    shutil.copytree(os.path.join(REFERENCE, "src", "mcsas"), pkg)
    fut = os.path.join(workdir, "future")
    os.makedirs(fut, exist_ok=True)
    with open(os.path.join(fut, "__init__.py"), "w") as fh:
        fh.write(_FUTURE_INIT)
    with open(os.path.join(fut, "utils.py"), "w") as fh:
        fh.write(_FUTURE_UTILS)
    with open(os.path.join(pkg, "gui", "utils", "__init__.py"),
              "w") as fh:
        fh.write(_GUI_UTILS_STUB)
    # py3 shim 3: numpy>=1.20 rejects the float Parameter value (100.)
    # as linspace's num — int-cast at the use site, same rule
    cyl = os.path.join(pkg, "models", "cylindersisotropic.py")
    with open(cyl) as fh:
        src = fh.read()
    with open(cyl, "w") as fh:
        fh.write(src.replace("numpy.linspace(0., 1., self.intDiv()",
                             "numpy.linspace(0., 1., int(self.intDiv())"))
    return workdir


# executed in a fresh subprocess with the patched tree on sys.path
_RUNNER = r'''
import json, sys, time
import numpy as np

(workdir, datafile, n_contribs, n_reps, max_iter, out,
 model_name, no_rebin, conv_crit, smear) = sys.argv[1:11]
n_contribs, n_reps, max_iter = int(n_contribs), int(n_reps), int(max_iter)
no_rebin = int(no_rebin)
sys.path.insert(0, workdir)

# py3 shim (same as run_reference_smear.py / run_reference_ff.py):
# py2-era numpy accepted a float `num`; the reference passes
# np.ceil(n/2.) straight into logspace (sasconfig.py:133)
_orig_logspace = np.logspace
def _logspace(start, stop, num=50, **kw):
    return _orig_logspace(start, stop, int(num), **kw)
np.logspace = _logspace

import logging, os
# INFO exposes the reference's 2 Hz hot-loop progress lines
# (mcsas/mcsas.py:392-401) — essential visibility on the SLOW families
# (Kholodenko's adaptive quad runs minutes per 1k iterations)
_lvl = getattr(logging, os.environ.get("MCSAS_REF_LOGLEVEL", "WARNING"))
logging.basicConfig(level=_lvl)
logging.getLogger().setLevel(_lvl)

from mcsas.mcsas.mcsas import McSAS
from mcsas.datafile import loaddatafile
from mcsas.utils.parameter import Histogram

# the reference's own loader chain (GUI path): tolerant ASCII parse →
# SASData with uncertainty floor + log rebin
data = loaddatafile(datafile).getDataObj()
if no_rebin:
    # Disable the log rebin (reference supports nBin<=0: dataobj.py:298-302
    # resets binnedData to None; q/I/sigma fall back to the sanitized
    # vectors) AND apply the fuMin uncertainty floor (dataobj.py:204-226).
    # Upstream the floor only fires as the fuMin value-update callback
    # (dataconfig.py:117-118,144) — i.e. when a user touches the spinbox —
    # and _reBin never re-runs after it (its only call site is
    # updateConfig, dataobj.py:186), so binned sigma stays raw (-1 on
    # gauss2/kho files).  nBin=0 + an explicit floor is therefore the one
    # reference-supported route on which those files are genuinely
    # fittable: sanitizedU reads the floored siDataU lazily at fit time.
    data.config.nBin.setValue(0)
    data._reBin()
    data._prepareUncertainty()
if smear:
    # Slit smearing with the trapezoidal beam profile, headless: the GUI
    # sets these via the data-settings widgets; programmatically the
    # equivalent is setting the SmearingConfig parameters (SI values —
    # sasconfig.py:79-99,122-149) and re-deriving the locs matrix exactly
    # as SASData.updateConfig does (sasdata.py:165).  The smeared
    # calcIntensity then engages via canSmear+doSmear+inputValid
    # (sasmodel.py:56-73).
    u, p = (float(v) for v in smear.split(":"))
    sm = data.config.smearing
    sm.doSmear.setValue(True)
    sm.umbra.setValue(u)
    sm.penumbra.setValue(p)
    data.locs = data.config.prepareSmearing(data.x0.binnedData)
    assert data.locs is not None and data.locs.ndim == 2, \
        "smearing did not engage (inputValid gate?)"
    # prepared (qOffset, weights) is what calcIntensity consumes at fit
    # time (sasmodel.py:68) — assert it exists so the fixture provably
    # ran the smeared branch, and record the geometry for the test side
    _qoff, _wts = sm.prepared
    assert sm.inputValid() and sm.doSmear() and _qoff.size > 1
    smear_audit = {"locsShape": [int(s) for s in data.locs.shape],
                   "nIntPoints": int(_qoff.size)}
else:
    smear_audit = None
try:
    est = data.sphericalSizeEst()
except Exception:
    est = (float("nan"), float("nan"))

algo = McSAS.factory()()
if model_name == "gaussianchain":
    # rg active by the model's own __init__ (RandomExponential 1-100 nm
    # — the same logdec1 transform as mcsas_tpu's ParamSpec)
    from mcsas.models.gaussianchain import GaussianChain
    model = GaussianChain()
    fitpar = model.rg
elif model_name == "kholodenko":
    # radius+lenKuhn+lenContour all active by the model's own __init__
    # (kholodenko.py:76-80); histograms follow radius
    from mcsas.models.kholodenko import Kholodenko
    model = Kholodenko()
    fitpar = model.radius
elif model_name == "cylinder":
    # the joint 2-parameter (radius x length) reconstruction: useAspect
    # off so length is an independent fit dimension
    # (cylindersisotropic.py:65-68); explicit active boxes matching the
    # synthetic cylmix.dat populations (tools/make_cyldata.py)
    from mcsas.models.cylindersisotropic import CylindersIsotropic
    model = CylindersIsotropic()
    # py3 shim: numpy.linspace(num=...) no longer accepts the float
    # default (100.) — same rule, declared as int
    model.intDiv.setValue(100)
    model.useAspect.setValue(False)
    model.radius.setActive(True)
    model.radius.setActiveRange((0.5e-9, 8e-9))
    model.length.setActive(True)
    model.length.setActiveRange((5e-9, 150e-9))
    fitpar = model.radius
elif model_name == "coreshell":
    # the second joint 2-parameter reconstruction (core radius x shell
    # thickness) on an ANALYTIC family — no quadrature rule to match
    # (sphericalcoreshell.py:50-69); explicit active boxes matching the
    # synthetic csmix.dat populations (tools/make_csdata.py)
    from mcsas.models.sphericalcoreshell import SphericalCoreShell
    model = SphericalCoreShell()
    model.radius.setActive(True)
    model.radius.setActiveRange((1e-9, 15e-9))
    model.t.setActive(True)
    model.t.setActiveRange((0.3e-9, 5e-9))
    fitpar = model.radius
elif model_name == "smearsphere":
    # the SMEARED MC anchor (slit-smeared 2-population sphere mix,
    # tools/make_smearmix.py): Sphere is smearable (sphere.py:15) and
    # analytic; explicit active box matching the synthetic populations
    from mcsas.models.sphere import Sphere
    model = Sphere()
    model.radius.setActiveRange((0.5e-9, 15e-9))
    fitpar = model.radius
else:
    from mcsas.models.sphere import Sphere
    model = Sphere()
    fitpar = model.radius
fitpar.setActive(True)
# the model's own default activeRange (e.g. sphere 1-1000 nm,
# models/sphere.py:16-26), identical to mcsas_tpu's ParamSpec: both MCs
# then search the same space
lo, hi = fitpar.activeRange()
# histogrammed parameters: every active dimension for the joint
# multi-parameter fit, the primary fitpar otherwise (kholodenko keeps
# its legacy single-param fixture format: its lenKuhn/lenContour are
# active but unhistogrammed, like the original runner)
histpars = list(model.activeParams()) \
    if model_name in ("cylinder", "coreshell", "smearsphere") else [fitpar]
for par in histpars:
    plo, phi = par.activeRange()
    # the GUI adds histograms via the range list; default shape: 50
    # bins, log x, one volume- and one number-weighted
    par.histograms().append(
        Histogram(par, plo, phi, binCount=50, xscale="log",
                  yweight="vol"))
    par.histograms().append(
        Histogram(par, plo, phi, binCount=50, xscale="log",
                  yweight="num"))
algo.model = model
algo.data = data
algo.numContribs.setValue(n_contribs)
algo.numReps.setValue(n_reps)
algo.maxIterations.setValue(max_iter)
algo.convergenceCriterion.setValue(float(conv_crit))

t0 = time.time()
algo.calc()
elapsed = time.time() - t0
if not algo.result:
    json.dump({"error": "reference did not converge", "elapsed": elapsed},
              open(out, "w"))
    sys.exit(3)
r = algo.result[0]

def arr(v):
    return np.asarray(v, np.float64).tolist() if v is not None else None

hists = {}
for par in histpars:
  for h in par.histograms():
    m = h.moments
    key = h.yweight if len(histpars) == 1 \
        else "%s:%s" % (par.name(), h.yweight)
    hists[key] = {
        "xLowerEdge": arr(h.xLowerEdge),
        "xMean": arr(h.xMean),
        "xWidth": arr(h.xWidth),
        "yMean": arr(h.bins.mean),
        "yStd": arr(h.bins.std),
        "cdfMean": arr(h.cdf.mean),
        "observability": arr(h.observability),
        "moments": {"total": list(m.total), "mean": list(m.mean),
                    "variance": list(m.variance), "skew": list(m.skew),
                    "kurtosis": list(m.kurtosis)},
    }

times = np.asarray(r.get("times", []), np.float64)
fix = {
    "workload": {"datafile": datafile, "numContribs": n_contribs,
                 "numReps": n_reps, "maxIterations": max_iter,
                 "convergenceCriterion": float(conv_crit), "model": model_name,
                 "noRebin": bool(no_rebin), "smearing": smear or None,
                 "smearAudit": smear_audit,
                 "activeRange_m": [float(lo), float(hi)],
                 "activeRanges_m": {
                     p.name(): [float(min(p.activeRange())),
                                float(max(p.activeRange()))]
                     for p in model.activeParams()},
                 "sizeEstimate_m": [float(est[0]), float(est[1])]},
    "host_elapsed_s": elapsed,
    "times_per_rep_s": times.tolist(),
    "numIter_mean": float(r.get("numIter", 0.0)),
    "histograms": hists,
    "fitX0": arr(np.ravel(r["fitX0"])),
    "fitMeasValMean": arr(np.ravel(r["fitMeasValMean"])),
    "fitMeasValStd": arr(np.ravel(r["fitMeasValStd"])),
    "dataMean": arr(np.ravel(r["dataMean"])),
    "scaling_mean_std": [float(r["scaling"][0]), float(r["scaling"][1])],
    "background_mean_std": [float(r["background"][0]),
                            float(r["background"][1])],
}
json.dump(fix, open(out, "w"), indent=1)
print("wrote", out)
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quickstart", action="store_true",
                    help="use quickstartdemo1.csv (the 36 s workload)")
    ap.add_argument("--model", default="sphere",
                    choices=("sphere", "gaussianchain", "kholodenko",
                             "cylinder", "coreshell", "smearsphere"),
                    help="reference model family to fit")
    ap.add_argument("--smear", default="",
                    metavar="UMBRA:PENUMBRA",
                    help="slit smearing, trapezoidal profile, SI 1/m "
                         "values (e.g. 0.1e9:0.4e9); default off")
    ap.add_argument("--no-rebin", action="store_true",
                    help="disable the log rebin (nBin=0) — bypasses the "
                    "reference's sigma=-1 rebin bug on gauss2/kho files")
    ap.add_argument("--contribs", type=int, default=None)
    ap.add_argument("--reps", type=int, default=None)
    ap.add_argument("--max-iter", type=int, default=100000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--conv-crit", type=float, default=1.0)
    ap.add_argument("--timeout", type=int, default=5400)
    args = ap.parse_args()

    if args.quickstart:
        datafile = os.path.join(REFERENCE, "testdata",
                                "quickstartdemo1.csv")
        default_out = "testdata/reference_quickstart_fixture.json"
        # quickstart defaults (doc/source/quickstart.rst): 300 x 10
        contribs = args.contribs or 300
        reps = args.reps or 10
    elif args.model == "gaussianchain":
        datafile = os.path.join(REFERENCE, "testdata",
                                "sasfit_gauss2-5-1.5-2-1.dat")
        default_out = "testdata/reference_gauss_fixture.json"
        contribs = args.contribs or 200
        reps = args.reps or 10
    elif args.model == "kholodenko":
        datafile = os.path.join(REFERENCE, "testdata",
                                "sasfit_kho-1-10-1000.dat")
        default_out = "testdata/reference_kho_fixture.json"
        contribs = args.contribs or 200
        reps = args.reps or 10
    elif args.model == "cylinder":
        # our own synthetic 2-population dataset (tools/make_cyldata.py);
        # reduced-but-converging workload: the reference's 2-param fit is
        # ~100x slower per iteration than sphere (intDiv=100 quadrature)
        datafile = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata", "cylmix.dat")
        default_out = "testdata/reference_cyl_fixture.json"
        contribs = args.contribs or 100
        reps = args.reps or 5
    elif args.model == "coreshell":
        # synthetic 2-population core-shell dataset (tools/make_csdata.py);
        # the family is analytic so the reference runs at its sphere-class
        # proposal rate — full 5-rep joint fit is feasible
        datafile = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata", "csmix.dat")
        default_out = "testdata/reference_cs_fixture.json"
        contribs = args.contribs or 100
        reps = args.reps or 5
    elif args.model == "smearsphere":
        # synthetic slit-smeared 2-population sphere dataset
        # (tools/make_smearmix.py); no-rebin route so the smeared curve
        # is exactly representable on the fit grid
        datafile = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata", "smearmix.dat")
        default_out = "testdata/reference_smearmc_fixture.json"
        contribs = args.contribs or 100
        reps = args.reps or 5
        if not args.smear:
            args.smear = "0.1e9:0.4e9"     # make_smearmix.py geometry
        args.no_rebin = True
    else:
        datafile = os.path.join(REFERENCE, "testdata",
                                "sasfit_sphere-10-1.dat")
        default_out = "testdata/reference_sphere10_fixture.json"
        # the reference regression workload (mcsas_test.py:62-66)
        contribs = args.contribs or 200
        reps = args.reps or 20
    args.contribs, args.reps = contribs, reps
    out = os.path.abspath(args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        default_out))

    workdir = tempfile.mkdtemp(prefix="mcsas-ref-")
    try:
        prepare_tree(workdir)
        t0 = time.time()
        rc = subprocess.run(
            [sys.executable, "-u", "-c", _RUNNER, workdir, datafile,
             str(args.contribs), str(args.reps), str(args.max_iter), out,
             args.model, str(int(args.no_rebin)), str(args.conv_crit),
             args.smear],
            timeout=args.timeout).returncode
        print(f"reference run rc={rc} in {time.time() - t0:.1f}s")
        return rc
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
