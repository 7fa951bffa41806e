# -*- coding: utf-8 -*-
"""Deterministic post-analysis crossval fixture: run the ORIGINAL
reference McSAS histogramming/observability machinery
(McSAS.histogram, src/mcsas/mcsas/mcsas.py:445-615 and
Histogram/Moments, src/mcsas/utils/parameter.py:20-154,349-479) on a
FIXED contribution set and dump every output as JSON.

Unlike the MC fixtures (tools/run_reference.py — statistical agreement
only, the RNG streams differ), the post-analysis is a deterministic
function of (data, contributions): SURVEY §7 step 6 calls it
exact-match testable.  tests/test_reference_parity.py feeds the SAME
binned data vectors and contributions into mcsas_tpu's
post.histogram_all and asserts agreement at solver precision —
anchoring fractions, scaling, observability limits, all four histogram
weightings, CDFs and moments against the reference's own running code
rather than a re-derivation.

Uses the same throwaway patched tree as run_reference.py (no reference
code enters the repo; the fixture holds numbers only).

Usage:
    python tools/run_reference_hist.py \
        [--out testdata/reference_hist_fixture.json]
"""
import argparse
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_reference import prepare_tree  # noqa: E402

REFERENCE = "/root/reference"

# executed in a fresh subprocess with the patched tree on sys.path
_RUNNER = r'''
import json, sys
import numpy as np

workdir, datafile, out = sys.argv[1:4]
sys.path.insert(0, workdir)

from mcsas.mcsas.mcsas import McSAS
from mcsas.mcsas.backgroundscalingfit import BackgroundScalingFit
from mcsas.datafile import loaddatafile
from mcsas.utils.parameter import Histogram
from mcsas.models.sphere import Sphere

# the reference's own loader chain: tolerant ASCII parse -> SASData with
# uncertainty floor + log rebin (the binned vectors are dumped so the
# comparison feeds BOTH implementations identical inputs)
data = loaddatafile(datafile).getDataObj()

# deterministic contribution sets: legacy RandomState is frozen across
# numpy versions; log-uniform radii inside the sphere active range
# (1-1000 nm) and strictly inside the histogram ranges below
N_CONTRIBS, N_REPS = 64, 4
rs = np.random.RandomState(20260819)
radii = np.exp(rs.uniform(np.log(2e-9), np.log(8e-7),
                          size=(N_CONTRIBS, 1, N_REPS)))
contribs = radii

algo = McSAS.factory()()
model = Sphere()
fitpar = model.radius
fitpar.setActive(True)
lo, hi = fitpar.activeRange()          # (1e-9, 1e-6)
HISTS = [dict(lo=lo, hi=hi, binCount=30, xscale="log", yweight=w)
         for w in ("vol", "num", "int", "surf")]
HISTS.append(dict(lo=1e-9, hi=4e-7, binCount=25, xscale="lin",
                  yweight="vol"))
for h in HISTS:
    fitpar.histograms().append(
        Histogram(fitpar, h["lo"], h["hi"], binCount=h["binCount"],
                  xscale=h["xscale"], yweight=h["yweight"]))
algo.model = model
algo.data = data

# McSAS.histogram(contribs=...) is the reference's own re-analysis entry
# point (mcsas.py:445,513-514); it only requires a non-empty result list
algo.result = [dict()]
algo.histogram(contribs)

def arr(v):
    return np.asarray(v, np.float64).tolist()

hists = []
for h in fitpar.histograms():
    m = h.moments
    hists.append({
        "yweight": h.yweight, "xscale": h.xscale,
        "binCount": int(h.binCount),
        "lower": float(min(h.xrange)), "upper": float(max(h.xrange)),
        "xLowerEdge": arr(h.xLowerEdge),
        "binsFull": arr(h.bins.full),          # (B, R)
        "cdfFull": arr(h.cdf.full),            # (B, R)
        "observability": arr(h.observability),  # (B,)
        "moments": {"total": list(m.total), "mean": list(m.mean),
                    "variance": list(m.variance), "skew": list(m.skew),
                    "kurtosis": list(m.kurtosis)},
    })

# the per-repetition scaling/fraction arrays are local to histogram()
# (mcsas.py:521-609) — regenerate them with the reference's OWN calls,
# verbatim the loop at mcsas.py:549-594
compExp = algo.compensationExponent()
bgsf = BackgroundScalingFit(algo.findBackground.value(),
                            algo.positiveBackground.value(), model)
scaling = np.zeros((2, N_REPS))
conval = np.zeros(N_REPS)
volumeFraction = np.zeros((N_CONTRIBS, N_REPS))
minReqVol = np.zeros((N_CONTRIBS, N_REPS))
totals = {w: np.zeros(N_REPS) for w in ("vol", "num", "int", "surf")}
for ri in range(N_REPS):
    rset = contribs[:, :, ri]
    modelData = algo.model.calc(data, rset, compExp)
    sc = np.array([data.f.limit[1] / modelData.chisqrInt.max(),
                   data.f.limit[0]])
    sc, cv, dummy, dummy2 = bgsf.calc(data, modelData, sc)
    scaling[:, ri] = sc
    conval[ri] = cv
    vf = modelData.volumeFraction(sc[0])
    volumeFraction[:, ri] = vf
    vset = modelData.vset.flatten()
    sset = modelData.sset.flatten()
    nf = vf / vset
    totals["vol"][ri] = vf.sum()
    totals["num"][ri] = nf.sum()
    totals["int"][ri] = (vf * vset).sum()
    totals["surf"][ri] = (nf * sset).sum()
    for c in range(N_CONTRIBS):
        partial = algo.model.calc(data, rset[c].reshape((1, -1)), compExp)
        weightedInt = data.f.binnedDataU * vf[c]
        partialScaled = sc[0] * partial.chisqrInt
        idx = (partialScaled != 0.)
        minReqVol[c, ri] = (weightedInt[idx] / partialScaled[idx]).min()

fix = {
    "workload": {"datafile": datafile, "numContribs": N_CONTRIBS,
                 "numReps": N_REPS, "compensationExponent": float(compExp),
                 "findBackground": bool(algo.findBackground.value()),
                 "positiveBackground":
                     bool(algo.positiveBackground.value()),
                 "activeRange_m": [float(lo), float(hi)]},
    # the reference's own binned fit grid (SI) — the shared input
    "q_binned": arr(data.x0.binnedData),
    "f_binned": arr(data.f.binnedData),
    "fu_binned": arr(data.f.binnedDataU),
    "contribs": arr(contribs),                 # (N, P, R)
    "scaling": arr(scaling),                   # (2, R)
    "conval": arr(conval),                     # (R,)
    "volumeFraction": arr(volumeFraction),     # (N, R), unnormalized
    "minReqVol": arr(minReqVol),               # (N, R), unnormalized
    "totals": {w: arr(v) for w, v in totals.items()},
    "histograms": hists,
}
json.dump(fix, open(out, "w"), indent=1)
print("wrote", out)
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    out = os.path.abspath(args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata", "reference_hist_fixture.json"))
    datafile = os.path.join(REFERENCE, "testdata", "sasfit_sphere-10-1.dat")

    workdir = tempfile.mkdtemp(prefix="mcsas-ref-hist-")
    try:
        prepare_tree(workdir)
        t0 = time.time()
        rc = subprocess.run(
            [sys.executable, "-u", "-c", _RUNNER, workdir, datafile, out],
            timeout=args.timeout).returncode
        print(f"reference hist run rc={rc} in {time.time() - t0:.1f}s")
        return rc
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
