# -*- coding: utf-8 -*-
"""Diagnostic: compare engine (K=1 reference stepping AND K=128 headline)
against the real-reference fixtures, printing every quantity the crossval
tests assert on.  Throwaway analysis tool."""
import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])
# compile cache: the mcsas_tpu import below points
# jax_compilation_cache_dir at the package default
# (mcsas_tpu/__init__.py::_setup_default_compile_cache)

from mcsas_tpu import data
from mcsas_tpu.config import McSASConfig
from mcsas_tpu.core.engine import McSASEngine
from mcsas_tpu.models import get_model
from mcsas_tpu.post.histogram import HistogramSpec, histogram_all

FIXTURES = {
    "quickstart": ("reference_quickstart_fixture.json",
                   "quickstartdemo1.csv"),
    "sphere10": ("reference_sphere10_fixture.json",
                 "sasfit_sphere-10-1.dat"),
    "gauss": ("reference_gauss_fixture.json",
              "sasfit_gauss2-5-1.5-2-1.dat"),
}

MODEL_NAMES = {"sphere": "Sphere", "gaussianchain": "GaussianChain"}

VARIANTS = {
    "k1-ref-stepping": dict(candidates_per_step=1),
    "k128-headline": dict(candidates_per_step=128, local_moves=0.5),
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else None
    for name, (fixfile, dataset) in FIXTURES.items():
        if which and which != name:
            continue
        fix = json.loads((REPO / "testdata" / fixfile).read_text())
        dcfg = (data.DataConfig(n_bin=0)
                if fix["workload"].get("noRebin") else None)
        d = data.load(REPO / "testdata" / dataset, config=dcfg)
        lo, hi = fix["workload"]["activeRange_m"]
        bound = get_model(
            MODEL_NAMES[fix["workload"].get("model", "sphere")]).bind()
        n_reps = int(fix["workload"]["numReps"])
        n_contribs = int(fix["workload"]["numContribs"])
        for vname, kw in VARIANTS.items():
            cfg = McSASConfig(num_contribs=n_contribs, num_reps=n_reps,
                              max_iterations=8_000_000, chunk_steps=2000,
                              seed=101, max_retries=1,
                              convergence_criterion=1.0, **kw)
            t0 = time.time()
            res = McSASEngine(d, bound, cfg).run()
            el = time.time() - t0
            print(f"=== {name} / {vname}: {el:.1f}s, converged "
                  f"{int(res.converged.sum())}/{n_reps}, total_iters "
                  f"{res.total_iters}", flush=True)
            sc_ref, sc_std = fix["scaling_mean_std"]
            bg_ref, bg_std = fix["background_mean_std"]
            sc = np.asarray(res.scaling, np.float64)
            bg = np.asarray(res.background, np.float64)
            print(f"  scaling eng {sc.mean():.5g} ± {sc.std():.2g}  "
                  f"ref {sc_ref:.5g} ± {sc_std:.2g}  "
                  f"rel diff {abs(sc.mean()-sc_ref)/abs(sc_ref):.4f}")
            print(f"  bg      eng {bg.mean():.5g} ± {bg.std():.2g}  "
                  f"ref {bg_ref:.5g} ± {bg_std:.2g}")
            # fit curve
            ref_mean = np.asarray(fix["fitMeasValMean"])
            ref_std = np.asarray(fix["fitMeasValStd"])
            eng_mean = np.asarray(res.measval, np.float64).mean(axis=0)
            eng_std = np.asarray(res.measval, np.float64).std(axis=0)
            halfdiff = np.abs(eng_mean - ref_mean) / (
                np.abs(eng_mean) + np.abs(ref_mean)) / 2.0
            fu = np.asarray(d.fu, np.float64)
            zs = np.abs(eng_mean - ref_mean) / fu
            comb = np.sqrt(ref_std ** 2 / len(ref_std)
                           + eng_std ** 2 / max(n_reps, 1) + 1e-300)
            print(f"  fit halfdiff max {halfdiff.max():.4g} "
                  f"(argmax {halfdiff.argmax()}/{len(halfdiff)}); "
                  f"|d|/fu max {zs.max():.3f}")
            for weight in ("vol", "num"):
                h_ref = fix["histograms"][weight]
                y_ref = np.asarray(h_ref["yMean"])
                obs = np.asarray(h_ref["observability"], np.float64) \
                    if h_ref.get("observability") is not None else None
                spec = HistogramSpec(bound.active[0], lo, hi,
                                     bin_count=len(y_ref), xscale="log",
                                     yweight=weight,
                                     auto_follow=False).resolved(bound)
                _, hists = histogram_all(res.contribs, d, bound, cfg,
                                         [spec])
                h = hists[0]
                y_eng = h.bins.mean / max(h.bins.mean.sum(), 1e-300)
                y_ref_n = y_ref / max(y_ref.sum(), 1e-300)
                mean_eng = h.moments.mean[0]
                mean_ref = h_ref["moments"]["mean"][0]
                mean_ref_std = (h_ref["moments"]["mean"][1]
                                if len(h_ref["moments"]["mean"]) > 1
                                else float("nan"))
                print(f"  [{weight}] bars maxdiff "
                      f"{np.abs(y_eng - y_ref_n).max():.4f}  argmax "
                      f"eng {int(y_eng.argmax())} ref "
                      f"{int(y_ref_n.argmax())}  mean_r eng "
                      f"{mean_eng:.4g} ref {mean_ref:.4g} ± "
                      f"{mean_ref_std:.2g} (rel "
                      f"{abs(mean_eng-mean_ref)/abs(mean_ref):.4f})")
                if obs is not None:
                    print(f"    observability range "
                          f"[{obs.min():.3g}, {obs.max():.3g}]")


if __name__ == "__main__":
    main()
