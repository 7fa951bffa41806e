# -*- coding: utf-8 -*-
"""Series-statistics crossval fixture: run the ORIGINAL reference's
across-files moment accumulation and output formatting
(Calculator._updateSeries + processSeriesStats,
src/mcsas/gui/calc.py:161-217,333-379) on FIXED inputs and dump both
the raw per-file moments and the reference's formatted output table.

Like the hist/smear/I/O fixtures this is deterministic: the moments are
the reference's own Histogram.calc on fixed contribution sets (three
synthetic "files" of the same dataset), and the series table is a pure
function of them.  tests/test_reference_parity.py feeds the SAME
(data, contribs) into mcsas_tpu's histogram_all + write_series_stats
and asserts the table agrees at solver precision.

The throwaway patched tree gains two extra MECHANICAL shims beyond
run_reference.py's (no reference code enters the repo): a ``gui/qt.py``
stub registering a fake QtCore module and a ``displayexception`` stub —
calc.py imports both at module level but the series-statistics path
never touches Qt.

Usage:
    python tools/run_reference_series.py \
        [--out testdata/reference_series_fixture.json]
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

_QT_STUB = '''\
import sys, types
QtCore = types.ModuleType("QtCore")
class QUrl:
    def __init__(self, *a, **k):
        pass
QtCore.QUrl = QUrl
sys.modules.setdefault("QtCore", QtCore)
'''

_DISPLAYEXC_STUB = '''\
class DisplayException(Exception):
    def __init__(self, exc, level="warning"):
        super().__init__(str(exc))
'''


def prepare_series_tree(workdir: str) -> str:
    prepare_tree(workdir)
    pkg = os.path.join(workdir, "mcsas")
    with open(os.path.join(pkg, "gui", "qt.py"), "w") as fh:
        fh.write(_QT_STUB)
    with open(os.path.join(pkg, "gui", "utils", "displayexception.py"),
              "w") as fh:
        fh.write(_DISPLAYEXC_STUB)
    return workdir


# executed in a fresh subprocess with the patched tree on sys.path
_RUNNER = r'''
import json, sys
import numpy as np

workdir, datafile, out = sys.argv[1:4]
sys.path.insert(0, workdir)

from mcsas.gui.calc import Calculator, processSeriesStats
from mcsas.utils.parameter import Histogram, Moments
from mcsas.datafile import loaddatafile
from mcsas.models.sphere import Sphere

data = loaddatafile(datafile).getDataObj()

calc = Calculator()
calc.prepare()          # resets the series store (gui/calc.py:271-274)
algo = calc.algo
algo.seriesStats.setValue(True)
model = Sphere()
fitpar = model.radius
fitpar.setActive(True)
HISTS = [dict(lo=2e-9, hi=5e-7, binCount=20, xscale="log", yweight=w)
         for w in ("vol", "num")]
for h in HISTS:
    fitpar.histograms().append(
        Histogram(fitpar, h["lo"], h["hi"], binCount=h["binCount"],
                  xscale=h["xscale"], yweight=h["yweight"]))
calc.model = model
algo.data = data

# three synthetic "files": same dataset, different deterministic
# contribution sets and titles (seriesKey = data.title upstream,
# dataobj.py:100-120)
N_CONTRIBS, N_REPS = 48, 3
rs = np.random.RandomState(20260819)
files = {}
for title in ("fileA", "fileB", "fileC"):
    contribs = np.exp(rs.uniform(np.log(4e-9), np.log(3e-7),
                                 size=(N_CONTRIBS, 1, N_REPS)))
    data.title = title
    algo.result = [dict()]
    # the reference's own re-analysis entry (mcsas.py:445,513-514)
    algo.histogram(contribs)
    # the reference's own accumulation (gui/calc.py:333-350)
    calc._updateSeries(data, model)
    files[title] = {
        "contribs": np.asarray(contribs, np.float64).tolist(),
        "moments_fields": [
            [float(v) for v in h.moments.fields]
            for h in fitpar.histograms()],
    }

# the reference's own table construction + formatting
# (processSeriesStats, gui/calc.py:186-217) with the plot stubbed out
class DummyPlot:
    def plot(self, stats):
        pass

fileData = {}
columnNames = (["seriesKey", "param", "lower", "upper", "weighting"]
               + list(Moments.fieldNames()))
for item in calc._series.items():
    processSeriesStats(item, DummyPlot(), fileData, columnNames)

fix = {
    "workload": {"datafile": datafile, "numContribs": N_CONTRIBS,
                 "numReps": N_REPS, "histograms": HISTS,
                 "compensationExponent":
                     float(algo.compensationExponent()),
                 "fieldNames": list(Moments.fieldNames())},
    "q_binned": np.asarray(data.x0.binnedData, np.float64).tolist(),
    "f_binned": np.asarray(data.f.binnedData, np.float64).tolist(),
    "fu_binned": np.asarray(data.f.binnedDataU, np.float64).tolist(),
    "files": files,
    "columnNames": columnNames,
    "fileData": fileData,          # formatted strings, reference output
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
        "testdata", "reference_series_fixture.json"))
    datafile = os.path.join(REFERENCE, "testdata",
                            "sasfit_sphere-10-1.dat")
    workdir = tempfile.mkdtemp(prefix="mcsas-ref-series-")
    try:
        prepare_series_tree(workdir)
        t0 = time.time()
        rc = subprocess.run(
            [sys.executable, "-u", "-c", _RUNNER, workdir, datafile, out],
            timeout=args.timeout).returncode
        print(f"reference series run rc={rc} in {time.time() - t0:.1f}s")
        return rc
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
