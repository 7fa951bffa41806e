# -*- coding: utf-8 -*-
"""Curve-level cross-validation fixture: evaluate the ORIGINAL reference
McSAS model code (BAMresearch/McSAS, /root/reference/src/mcsas/models/*)
formfactor + volume on a deterministic parameter/q grid and dump the
results as JSON for tests/test_reference_parity.py::test_crossval_formfactor.

Complements tools/run_reference.py (full-MC fixtures): a full MC run is
measured infeasible for Kholodenko (its adaptive scipy.integrate.quad
costs minutes per 1k proposals, see PARITY.md), but the model CODE
itself runs fine on a handful of parameter draws — this anchors every
one of the 11 model families' curves against the reference's own
implementation, not a re-derivation.

Uses the same throwaway patched tree as run_reference.py (no reference
code enters the repo; the fixture holds numbers only).

Usage:
    python tools/run_reference_ff.py [--out testdata/reference_ff_fixture.json]
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_reference import prepare_tree  # noqa: E402

# Deterministic parameter draws, SI units, chosen inside each model's
# active/value ranges and exercising both useAspect branches where the
# reference has one.  SLD values: x Å⁻² = x·1e20 m⁻².
DRAWS = {
    "Sphere": ("mcsas.models.sphere", "Sphere", [
        {"radius": 5e-9},
        {"radius": 50e-9},
        {"radius": 500e-9},
    ]),
    "SphericalCoreShell": ("mcsas.models.sphericalcoreshell",
                           "SphericalCoreShell", [
        {"radius": 10e-9, "t": 3e-9,
         "eta_c": 3.16e14, "eta_s": 2.53e14, "eta_sol": 0.0},
        {"radius": 50e-9, "t": 1e-9,
         "eta_c": 1.0e14, "eta_s": 4.0e14, "eta_sol": 2.0e14},
    ]),
    "GaussianChain": ("mcsas.models.gaussianchain", "GaussianChain", [
        {"rg": 5e-9, "bp": 100e-9, "etas": 1e14, "k": 1.0},
        {"rg": 20e-9, "bp": 2e-9, "etas": 1e14, "k": 1.5},
    ]),
    "Kholodenko": ("mcsas.models.kholodenko", "Kholodenko", [
        {"radius": 1e-9, "lenKuhn": 10e-9, "lenContour": 1000e-9},
        {"radius": 2e-9, "lenKuhn": 25e-9, "lenContour": 300e-9},
        {"radius": 4e-9, "lenKuhn": 50e-9, "lenContour": 120e-9},
    ]),
    "LMADenseSphere": ("mcsas.models.lmadensesphere", "LMADenseSphere", [
        {"radius": 10e-9, "volFrac": 0.1, "mf": -1.0},
        {"radius": 30e-9, "volFrac": 0.3, "mf": 2.0},
    ]),
    "CylindersIsotropic": ("mcsas.models.cylindersisotropic",
                           "CylindersIsotropic", [
        {"radius": 3e-9, "useAspect": True, "length": 10e-9,
         "aspect": 5.0, "intDiv": 100.0},
        {"radius": 8e-9, "useAspect": False, "length": 100e-9,
         "aspect": 10.0, "intDiv": 100.0},
    ]),
    "CylindersIsotropicAspect": ("mcsas.models.cylindersisotropicaspect",
                                 "CylindersIsotropic", [
        {"radius": 3e-9, "aspect": 5.0, "psiAngle": 0.17,
         "psiAngleDivisions": 303.0},
        {"radius": 10e-9, "aspect": 12.0, "psiAngle": 1.0,
         "psiAngleDivisions": 303.0},
    ]),
    "CylindersRadiallyIsotropic": ("mcsas.models.cylindersradiallyisotropic",
                                   "CylindersRadiallyIsotropic", [
        {"radius": 3e-9, "aspect": 5.0, "psiAngle": 0.17,
         "psiAngleDivisions": 303.0},
        {"radius": 10e-9, "aspect": 12.0, "psiAngle": 1.0,
         "psiAngleDivisions": 303.0},
    ]),
    "CylindersRadiallyIsotropicTilted": (
        "mcsas.models.cylindersradiallyisotropictilted",
        "CylindersRadiallyIsotropicTilted", [
        # radius/aspect are NoUnit in the reference (raw numbers, the
        # q·R products land in sane territory only for R ~ nm⁻¹·q⁻¹
        # scale); use the reference defaults' magnitudes
        {"radius": 3.0, "aspect": 5.0, "psiAngle": 0.1,
         "psiAngleDivisions": 303.0, "phiDistWidth": 10.0,
         "phiDistDivisions": 9.0},
        {"radius": 8.0, "aspect": 10.0, "psiAngle": 0.1,
         "psiAngleDivisions": 303.0, "phiDistWidth": 30.0,
         "phiDistDivisions": 9.0},
    ]),
    "EllipsoidsIsotropic": ("mcsas.models.ellipsoidsisotropic",
                            "EllipsoidsIsotropic", [
        {"a": 5e-9, "useAspect": True, "c": 10e-9, "aspect": 3.0,
         "intDiv": 100.0},
        {"a": 10e-9, "useAspect": False, "c": 40e-9, "aspect": 10.0,
         "intDiv": 100.0},
    ]),
    "EllipsoidalCoreShell": ("mcsas.models.ellipsoidalcoreshell",
                             "EllipsoidalCoreShell", [
        {"a": 10e-9, "b": 20e-9, "t": 3e-9, "eta_c": 3.15e14,
         "eta_s": 2.53e14, "eta_sol": 0.0, "intDiv": 100.0},
        {"a": 30e-9, "b": 10e-9, "t": 1e-9, "eta_c": 1.0e14,
         "eta_s": 4.0e14, "eta_sol": 2.0e14, "intDiv": 100.0},
    ]),
}

# executed in a fresh subprocess with the patched tree on sys.path
_RUNNER = r'''
import importlib, json, sys
import numpy as np

workdir, draws_json, out = sys.argv[1:4]
sys.path.insert(0, workdir)
draws = json.loads(draws_json)

# py3 shim: py2-era numpy accepted a float `num` in linspace; the
# reference passes its float-typed Parameter values straight through
# (cylindersisotropic.py:56, cylindersradiallyisotropictilted.py:70-74
# — the latter even computes `phiDistDivisions() + 1.`).  Coerce before
# the models import `linspace`.
_orig_linspace = np.linspace
def _linspace(start, stop, num=50, **kw):
    return _orig_linspace(start, stop, int(num), **kw)
np.linspace = _linspace

# 0.01..10 nm^-1 in SI (1/m) — the reference testdata q ranges
q = np.logspace(7.0, 10.0, 64)

class _DS:
    pass
ds = _DS()
ds.q = q

fixture = {"q": q.tolist(), "models": {}}
for name, (module, clsname, paramsets) in draws.items():
    cls = getattr(importlib.import_module(module), clsname)
    cls.factory()
    entries = []
    for ps in paramsets:
        model = cls()
        for pname, val in ps.items():
            getattr(model, pname).setValue(val)
        ff = np.asarray(model.formfactor(ds), np.float64).ravel()
        entries.append({"params": ps, "ff": ff.tolist(),
                        "volume": float(model.volume())})
    fixture["models"][name] = entries
    print(name, "ok", flush=True)

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
        "testdata", "reference_ff_fixture.json"))

    workdir = tempfile.mkdtemp(prefix="mcsas-ref-ff-")
    try:
        prepare_tree(workdir)
        t0 = time.time()
        rc = subprocess.run(
            [sys.executable, "-u", "-c", _RUNNER, workdir,
             json.dumps(DRAWS), out],
            timeout=args.timeout).returncode
        print(f"reference ff run rc={rc} in {time.time() - t0:.1f}s")
        return rc
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
