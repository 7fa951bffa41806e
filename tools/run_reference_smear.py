# -*- coding: utf-8 -*-
"""Smearing-path crossval fixture: run the ORIGINAL reference smearing
machinery (SmearingConfig.setIntPoints + SASConfig.prepareSmearing,
src/mcsas/dataobj/sasconfig.py:105-149,186-233,308-339, and the smeared
intensity branch of SASModel.calcIntensity, bases/model/sasmodel.py:
46-73) on the sphere-10 dataset and dump the integration grid, the locs
matrix and smeared single-contribution intensities as JSON.

Covers all four geometry combinations the reference supports:
{Trapezoid, Gaussian} x {slit, 2D-averaged (twoDColl)}.  The
post-analysis analogue of tools/run_reference_hist.py: deterministic,
so tests/test_reference_parity.py asserts solver-precision agreement of
mcsas_tpu's locs/smear_w contraction against the reference's own
running code.

Usage:
    python tools/run_reference_smear.py \
        [--out testdata/reference_smear_fixture.json]
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

# py3 shim (same as run_reference_ff.py): py2-era numpy accepted a float
# `num`; the reference passes np.ceil(n/2.) straight into logspace
# (sasconfig.py:133-134,220-221)
_orig_logspace = np.logspace
def _logspace(start, stop, num=50, **kw):
    return _orig_logspace(start, stop, int(num), **kw)
np.logspace = _logspace

from mcsas.datafile import loaddatafile
from mcsas.dataobj.sasconfig import GaussianSmearing, TrapezoidSmearing
from mcsas.models.sphere import Sphere

RADII = [5e-9, 20e-9, 100e-9]
COMP_EXP = 0.6666666          # the algorithm default

# q units here are SI (1/m); sphere-10 spans ~1e8..6e9
CASES = [
    {"name": "trapezoid-slit", "cls": "trap", "twoDColl": False,
     "umbra": 2e8, "penumbra": 4e8},
    {"name": "trapezoid-2d", "cls": "trap", "twoDColl": True,
     "umbra": 2e8, "penumbra": 4e8},
    {"name": "gaussian-slit", "cls": "gauss", "twoDColl": False,
     "variance": 3e8},
    {"name": "gaussian-2d", "cls": "gauss", "twoDColl": True,
     "variance": 3e8},
]

model = Sphere.factory()()

def arr(v):
    return np.asarray(v, np.float64).tolist()

fixture = {"radii": RADII, "compExp": COMP_EXP, "cases": []}
for case in CASES:
    data = loaddatafile(datafile).getDataObj()
    if case["cls"] == "trap":
        smear = TrapezoidSmearing()
        smear.umbra.setValue(case["umbra"])
        smear.penumbra.setValue(case["penumbra"])
    else:
        smear = GaussianSmearing()
        smear.variance.setValue(case["variance"])
    smear.doSmear.setValue(True)
    smear.nSteps.setValue(25)
    smear.twoDColl.setValue(case["twoDColl"])
    data.config.smearing = smear
    data.updateConfig()          # rebuilds data.locs (sasdata.py:161-168)
    assert data.locs.ndim == 2, "smearing did not engage"

    qOffset, weights = smear.prepared
    entry = {"name": case["name"],
             "params": {k: v for k, v in case.items()
                        if k not in ("name", "cls")},
             "kind": case["cls"],
             "q_binned": arr(data.x0.binnedData),
             "qOffset": arr(qOffset),
             "weights": arr(weights),
             "locs": arr(data.locs),
             "smeared": []}
    for r in RADII:
        # the smeared branch of SASModel.calcIntensity
        # (bases/model/sasmodel.py:56-73) via the reference's own call
        md = model.calc(data, np.array([[r]]), COMP_EXP)
        entry["smeared"].append({"radius": r, "it": arr(md.cumInt)})
    fixture["cases"].append(entry)
    print(case["name"], "ok", flush=True)

json.dump(fixture, open(out, "w"), indent=1)
print("wrote", out)
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    out = os.path.abspath(args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata", "reference_smear_fixture.json"))
    datafile = os.path.join(REFERENCE, "testdata", "sasfit_sphere-10-1.dat")

    workdir = tempfile.mkdtemp(prefix="mcsas-ref-smear-")
    try:
        prepare_tree(workdir)
        t0 = time.time()
        rc = subprocess.run(
            [sys.executable, "-u", "-c", _RUNNER, workdir, datafile, out],
            timeout=args.timeout).returncode
        print(f"reference smear run rc={rc} in {time.time() - t0:.1f}s")
        return rc
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
