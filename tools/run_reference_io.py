# -*- coding: utf-8 -*-
"""I/O-layer cross-validation fixture: run the ORIGINAL reference McSAS
parsers and writers (BAMresearch/McSAS, /root/reference/src/mcsas/datafile/*)
on the 10 ASCII-dialect fixtures the reference ships but never automated
(SURVEY §4 "Parser robustness fixtures"), plus quickstart/sasfit files and
a PDH write→parse round trip, and dump the results as JSON for
tests/test_reference_parity.py::test_crossval_io_*.

What the fixture records, all produced by the reference's own code:
* per input file: the rawArray from ``loaddatafile(fn)`` (ArrayFile's
  tolerant readArray, reference asciifile.py:99-143) — or the error it
  raises;
* the exact text ``ArrayFile.formatData`` writes for a canonical array
  (reference asciifile.py:21-49);
* the exact text ``PDHFile.formatData`` writes (5-line PDH header,
  reference pdhfile.py:16-105) and the reference's re-parse of it.

Uses the same throwaway patched tree as run_reference.py (no reference
code enters the repo; the fixture holds numbers/strings only).

Usage:
    python tools/run_reference_io.py [--out testdata/reference_io_fixture.json]
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

TESTDATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata")

# every ASCII fixture the reference ships for parser robustness
# (reference testdata/, SURVEY §4) plus the real data files
INPUT_FILES = [
    "testData01.csv",
    "testData01 commaDelim.csv",
    "testData01 decimalComma.csv",
    "testData01 emptyInterspersedLines.csv",
    "testData01 emptyLines.csv",
    "testData01 extraCol.csv",
    "testData01 footer.csv",
    "testData01 leadingTrailingSpaces.csv",
    "testData01 spaceDelim.csv",
    "testData01 tabDelim.csv",
    "testData01 twoLineHeader.csv",
    "testData01 UnicodeTwoLineHeader.csv",
    "quickstartdemo1.csv",
    "sasfit_sphere-10-1.dat",
    "sasfit_gauss2-1-100-1-1.dat",
]

# canonical write payload: assorted magnitudes/signs exercising the
# "{0: 14.6E}" value format (reference asciifile.py:15)
WRITE_DATA = [
    [1.0, -2.5e-9, 3.14159265358979],
    [6.02214076e23, 0.0, -1.0e-300],
    [123456.789, -0.001, 42.0],
]

# executed in a fresh subprocess with the patched tree on sys.path
_RUNNER = r'''
import json, os, sys, tempfile
import numpy as np

workdir, testdata, inputs_json, write_json, out = sys.argv[1:6]
sys.path.insert(0, workdir)
inputs = json.loads(inputs_json)
write_data = np.array(json.loads(write_json), np.float64)

from mcsas.datafile import loaddatafile, ArrayFile, PDHFile

fixture = {"files": {}, "ascii_write": None, "pdh_write": None}

for name in inputs:
    path = os.path.join(testdata, name)
    entry = {}
    try:
        df = loaddatafile(path)
        entry["rawArray"] = np.asarray(df.rawArray, np.float64).tolist()
    except Exception as e:
        entry["error"] = "%s: %s" % (type(e).__name__, e)
    fixture["files"][name] = entry
    print(name, "->", "error" if "error" in entry else
          np.shape(entry["rawArray"]), flush=True)

# ASCII writer: the exact text the reference emits for the payload
fixture["ascii_write"] = {
    "data": write_data.tolist(),
    "text": ArrayFile.formatData(write_data),
}

# PDH writer: PDHFile.formatData is BROKEN as shipped (pdhfile.py:18
# `super(PDHFile, self)` inside a classmethod -- NameError, py2-era bug;
# record it).  Compose what it would have produced from the two working
# pieces it calls: str(PDHHeader(n, desc)) + ArrayFile.formatData(data)
# (pdhfile.py:17-20), then re-parse with the reference's own reader.
from mcsas.datafile import PDHHeader
desc = "crossval sample"
try:
    PDHFile.formatData(write_data, description=desc)
    writer_error = None
except Exception as e:
    writer_error = "%s: %s" % (type(e).__name__, e)
pdh_text = "{0}\n{1}".format(str(PDHHeader(write_data.shape[0], desc)),
                             ArrayFile.formatData(write_data))
tmp = tempfile.NamedTemporaryFile(
    "w", suffix=".pdh", delete=False, encoding="utf-8")
tmp.write(pdh_text + "\n")
tmp.close()
reparsed = loaddatafile(tmp.name)
fixture["pdh_write"] = {
    "data": write_data.tolist(),
    "description": desc,
    "text": pdh_text,
    "writer_error": writer_error,
    "reparsed": np.asarray(reparsed.rawArray, np.float64).tolist(),
}
os.unlink(tmp.name)

json.dump(fixture, open(out, "w"), indent=1)
print("wrote", out)
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()
    out = os.path.abspath(args.out or os.path.join(
        TESTDATA, "reference_io_fixture.json"))

    workdir = tempfile.mkdtemp(prefix="mcsas-ref-io-")
    try:
        prepare_tree(workdir)
        t0 = time.time()
        rc = subprocess.run(
            [sys.executable, "-u", "-c", _RUNNER, workdir, TESTDATA,
             json.dumps(INPUT_FILES), json.dumps(WRITE_DATA), out],
            timeout=args.timeout).returncode
        print(f"reference io run rc={rc} in {time.time() - t0:.1f}s")
        return rc
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
