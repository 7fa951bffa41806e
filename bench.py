#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Headline benchmark: full 10-repetition sphere fit to χ² ≤ 1 on
sasfit_sphere-10-1.dat (300 contributions), the BASELINE.json north star.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = wall-clock seconds for the COMPLETE fit() pipeline — MC
optimization + float64 post analysis + histogramming — matching what the
reference's 36 s covers (button-click to result,
doc/source/quickstart.rst:106 + gui/calc.py:311-327).  Compile/trace is
excluded via a warm-up call (persistent compile cache + in-process
executable caches make repeat fits this fast for users too).  ``mc_s`` /
``vs_baseline_mc`` report the MC-optimization segment alone.
vs_baseline = reference CPU quickstart seconds (36 s, an equivalent
10-rep/300-contribution sphere fit on a 3.4 GHz i7) divided by value.
"""
import json
import os
import sys
import time

import numpy as np

REFERENCE_SECONDS = 36.0       # doc/source/quickstart.rst:106
_REPO = os.path.dirname(os.path.abspath(__file__))
# persistent param-table cache: baked tables are pure functions of their
# cache key; reusing them across processes removes the dominant
# cold-start cost of the table-tier suite rows (10-60 s of on-chip bake)
os.environ.setdefault("MCSAS_TPU_TABLE_CACHE_DIR",
                      os.path.join(_REPO, ".table_cache"))
DATASETS = [
    os.path.join(_REPO, "testdata", "sasfit_sphere-10-1.dat"),
    "/root/reference/testdata/sasfit_sphere-10-1.dat",
]


def _backend_reachable(timeout=300) -> bool:
    """Probe backend initialization in a SUBPROCESS with a timeout: a
    dead remote tunnel hangs jax.devices() indefinitely (observed: a
    multi-hour terminal outage), which would leave the driver with no
    bench artifact at all.  A probe failure turns into a parseable JSON
    error line instead (the subprocess exits before this process
    initializes its own backend — the one-TPU-process rule holds)."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _data_dir(bundled, fallback):
    """Bundled golden data first (testdata/ ships with the repo), the
    reference tree as fallback."""
    return bundled if os.path.isdir(bundled) else fallback


def find_dataset():
    for p in DATASETS:
        if os.path.exists(p):
            return p
    print(json.dumps({"metric": "sphere-fit", "value": -1.0,
                      "unit": "s", "vs_baseline": 0.0,
                      "error": "dataset not found"}))
    sys.exit(1)


def synth_golden(kind):
    """Synthetic float64 golden curve for model families without a
    reference dataset (BASELINE.json families 'isotropic cylinder +
    ellipsoid'): converged (n=801) orientation integral, 1% uncertainty.
    q is capped so q·R stays within the well-resolved invariant-table
    zone (the fit-grade tier the MC loop runs on)."""
    import jax
    import jax.numpy as jnp
    from mcsas_tpu.data import DataConfig, from_raw

    if kind == "cylinder-smeared":
        # slit-smeared synthetic cylinder: the golden intensity is the
        # model's own converged rule pushed through the SAME trapezoid
        # contraction the fit will use, so the smeared-table tier has an
        # exact target (reference smearing: sasmodel.py:56-73)
        from mcsas_tpu.data import TrapezoidSmearing
        from mcsas_tpu.models.cylinders import _cyl_iso_ff_ab
        q_nm = np.geomspace(0.01, 2.0, 100)
        sm = TrapezoidSmearing(do_smear=True, n_steps=25, umbra=0.05e9,
                               penumbra=0.2e9)
        dcfg = DataConfig(n_bin=0, smearing=sm)
        ones = np.ones_like(q_nm)
        d0 = from_raw(np.column_stack([q_nm, ones, 0.01 * ones]),
                      config=dcfg)
        assert d0.uses_smearing
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            locs = jnp.asarray(np.asarray(d0.locs, np.float64))
            r, asp = 10e-9, 10.0
            ff = jax.jit(lambda q: _cyl_iso_ff_ab(
                q * r, q * (2.0 * r * asp), 801, jnp.float64))(locs)
            i = np.asarray((ff * ff) @ jnp.asarray(
                np.asarray(d0.smear_w, np.float64)))
        i = i / i.max()
        return from_raw(np.column_stack([q_nm, i, 0.01 * i]),
                        title="synthetic-cylinder-smeared", config=dcfg)

    q_nm = np.geomspace(0.01, 2.0, 100)
    q_si = jnp.asarray(q_nm * 1e9, jnp.float64)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if kind == "cylinder":
            from mcsas_tpu.models.cylinders import _cyl_iso_ff_ab
            r, asp = 10e-9, 10.0
            ff = jax.jit(lambda q: _cyl_iso_ff_ab(
                q * r, q * (2.0 * r * asp), 801, jnp.float64))(q_si)
        elif kind == "ellcoreshell":
            from mcsas_tpu.models.ellipsoids import _ell_cs_ff
            from mcsas_tpu.utils.units import ANGSTROM_SLD
            q_nm = np.geomspace(0.01, 0.3, 100)
            q_si = jnp.asarray(q_nm * 1e9, jnp.float64)
            p = dict(a=10e-9, b=15e-9, t=50e-9,
                     eta_c=ANGSTROM_SLD.to_si(3.15e-6),
                     eta_s=ANGSTROM_SLD.to_si(2.53e-6),
                     eta_sol=0.0, intDiv=801.0)
            ff = jax.jit(lambda q: _ell_cs_ff(q, p))(q_si)
        else:
            from mcsas_tpu.models.ellipsoids import _ell_iso_ff_uv
            a, c = 10e-9, 30e-9
            ff = jax.jit(lambda q: _ell_iso_ff_uv(
                q * a, q * c, 801, jnp.float64))(q_si)
    i = np.asarray(ff, np.float64) ** 2
    i = i / i.max()
    raw = np.column_stack([q_nm, i, 0.01 * i])
    return from_raw(raw, title=f"synthetic-{kind}",
                    config=DataConfig(n_bin=0))


def suite():
    """Extended benchmark over the BASELINE.json config families; one JSON
    line per config (not part of the driver's single-line contract — run
    manually with `python bench.py --suite`)."""
    import jax
    import mcsas_tpu as mt
    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.models import get_model

    ref = _data_dir(os.path.join(_REPO, "testdata"),
                    "/root/reference/testdata")
    refm = _data_dir(os.path.join(_REPO, "testdata", "models"),
                     "/root/reference/src/mcsas/models/testData")
    nm = 1e-9
    # (name, data, model, active, ranges, chi2 target, K, budget):
    # every BASELINE.json family has a converging row; quadrature models
    # run on the scale-invariant table path (ops/tables.py)
    configs = [
        ("sphere", f"{ref}/sasfit_sphere-10-1.dat", "Sphere", None,
         None, 1.0, 128, 8_000_000),
        ("gaussian-chain", f"{ref}/sasfit_gauss2-5-1.5-2-1.dat",
         "GaussianChain", None, None, 1.0, 64, 4_000_000),
        ("kholodenko-worm", f"{ref}/sasfit_kho-1-10-1000.dat",
         "Kholodenko", None, None, 1.0, 128, 24_000_000),
        ("cylinders-isotropic", "synth:cylinder",
         "CylindersIsotropic", ("radius",),
         {"radius": (0.5 * nm, 300 * nm)}, 1.0, 128, 8_000_000),
        # round-3: the smeared-quadrature worst case rides the smeared
        # param-table tier (rows baked against the dataset's contraction)
        # + the bounded single-launch drive instead of paying both the
        # in-loop quadrature and per-chunk RTT
        ("cylinders-smeared", "synth:cylinder-smeared",
         "CylindersIsotropic", ("radius",),
         {"radius": (0.5 * nm, 300 * nm)}, 1.0, 128, 8_000_000),
        # the synthetic golden ellipsoid has aspect 3 (see synth_golden)
        ("ellipsoids-isotropic", "synth:ellipsoid",
         "EllipsoidsIsotropic", ("a",),
         {"a": (0.5 * nm, 300 * nm)}, 1.0, 128, 8_000_000),
        # joint multi-parameter populations (narrow improving basin) use
        # the opt-in local-move proposals to reach the reference's χ²≤1
        ("core-shell-sphere",
         f"{refm}/SphCoreShell_R100_dR150_c3p16_s2p53.csv",
         "SphericalCoreShell", ("radius", "t"), None, 1.0, 128,
         40_000_000),
        # the SASfit-generated EllCoreShell csv carries a ~1% systematic
        # shape deviation from the (reference's own) model math: the
        # monodisperse TRUE-parameter curve scores χ²≈5300 against it at
        # the 1% uncertainty floor, so χ²≤1 is unreachable for any
        # faithful implementation on that file (the MC reaches ~51).
        # The convergence row therefore fits a synthetic golden curve
        # built from the converged (n=801) model rule, with the joint
        # (a, t) core/shell sizes active like the core-shell-sphere row.
        ("core-shell-ellipsoid", "synth:ellcoreshell",
         "EllipsoidalCoreShell", ("a", "t"),
         {"a": (2 * nm, 50 * nm), "t": (10 * nm, 200 * nm)}, 1.0, 128,
         40_000_000),
        # dilute data: bounded φ avoids the documented volFrac degeneracy
        # (BENCHMARKS.md ‡) so this family also measures convergence
        ("lma-dense-sphere", f"{ref}/sasfit_sphere-10-1.dat",
         "LMADenseSphere", ("radius", "volFrac"),
         {"volFrac": (1e-4, 0.1)}, 1.0, 128, 20_000_000),
    ]
    local = {"core-shell-sphere": 0.5, "core-shell-ellipsoid": 0.5,
             "lma-dense-sphere": 0.5, "kholodenko-worm": 0.75}
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    for (name, path, model, active, ranges, crit, k_cand,
         budget) in configs:
        if only and name not in only:
            continue
        if path.startswith("synth:"):
            data = synth_golden(path.split(":", 1)[1])
        elif os.path.exists(path):
            data = mt.load(path)
        else:
            continue
        fixed = {"ellipsoids-isotropic": {"aspect": 3.0},
                 "core-shell-ellipsoid": {"b": 15 * nm}}.get(name)
        bound = get_model(model).bind(active=active, active_ranges=ranges,
                                      fixed=fixed)
        cfg = McSASConfig(num_contribs=300, num_reps=10,
                          max_iterations=budget, chunk_steps=1024,
                          candidates_per_step=k_cand, seed=2026,
                          max_retries=1, convergence_criterion=crit,
                          local_moves=local.get(name, 0.0),
                          show_incomplete=True)
        t0 = time.perf_counter()
        res = mt.fit(data, model=bound, cfg=cfg)
        wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = mt.fit(data, model=bound, cfg=cfg)   # warm repeat
        warm = time.perf_counter() - t0
        print(json.dumps({
            "config": name, "model": model, "chi2_target": crit,
            "seconds_warm": round(warm, 3),
            "seconds_cold": round(wall, 3),
            "max_chi2": round(float(res.engine.conval.max()), 3),
            "converged_reps": int(res.engine.converged.sum()),
            "proposals_per_sec": round(res.engine.iters_per_sec),
            # total proposals to converge, ALL attempts included (the
            # per-rep counter resets on retry): makes silent trajectory
            # regressions (e.g. a garbled first chunk) auditable — the
            # throughput alone can mask a 2x iteration inflation
            "total_iters": int(res.engine.total_iters),
            "pallas": bool(res.engine.used_pallas),
            "table": bool(res.engine.used_table),
            "local_moves": cfg.local_moves,
        }), flush=True)


def main():
    import jax
    import mcsas_tpu as mt
    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.core.engine import McSASEngine
    from mcsas_tpu.models import get_model

    data = mt.load(find_dataset())
    bound = get_model("Sphere").bind()
    # K=128 best-of-K + 50% local-move proposals: both accelerators are
    # distribution-certified against the reference MC semantics
    # (tests/test_reference_parity.py, variant "k128-local")
    cfg = McSASConfig(num_contribs=300, num_reps=10,
                      max_iterations=8_000_000, chunk_steps=2048,
                      candidates_per_step=128, seed=2026, max_retries=1,
                      local_moves=0.5)
    eng = McSASEngine(data, bound, cfg)

    # warm-up: one full run compiles exactly the executables the timed
    # runs use (the fused init+drive path)
    eng.run()

    trace_dir = None
    for a in sys.argv:
        if a.startswith("--trace="):
            trace_dir = a.split("=", 1)[1]
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            eng.run()
        print(json.dumps({"trace": trace_dir}), file=sys.stderr)

    # best-of-2 full runs: the remote-attach link to the chip has high
    # run-to-run variance; the minimum reflects algorithm wall-clock
    elapsed = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        res = eng.run()
        elapsed = min(elapsed, time.perf_counter() - t0)

    # the honest end-to-end number: the complete fit() pipeline (MC +
    # float64 post pass + histograms), apples-to-apples with the
    # reference's 36 s button-click-to-result quickstart
    full = mt.fit(data, model=bound, cfg=cfg)        # warm-up (post jit)
    full_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        full = mt.fit(data, model=bound, cfg=cfg)
        full_s = min(full_s, time.perf_counter() - t0)

    # the reference's 36 s figure is specifically the quickstart fit on
    # quickstartdemo1.csv at the default workload (300 contribs x 10
    # reps, chi2<=1: doc/source/quickstart.rst:106) — time that exact
    # workload too so the comparison is airtight
    qs_path = os.path.join(os.path.dirname(find_dataset()),
                           "quickstartdemo1.csv")
    quickstart_s = None
    qs_converged = True
    if os.path.exists(qs_path):
        qdata = mt.load(qs_path)
        qbound = get_model("Sphere").bind(
            active_ranges={"radius": qdata.spherical_size_estimate})
        qfit = mt.fit(qdata, model=qbound, cfg=cfg)      # warm-up
        quickstart_s = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qfit = mt.fit(qdata, model=qbound, cfg=cfg)
            quickstart_s = min(quickstart_s, time.perf_counter() - t0)
        qs_converged = bool(qfit.converged)

    converged = bool(res.converged.all()) and full.converged
    value = full_s if converged else -1.0
    out = {
        "metric": "wall-clock 10-rep sphere full fit() to chi2<=1 "
                  "(MC + f64 post + histograms; sasfit_sphere-10-1, "
                  "300 contribs)",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(REFERENCE_SECONDS / full_s, 2)
        if converged else 0.0,
        "mc_s": round(elapsed, 4),
        "vs_baseline_mc": round(REFERENCE_SECONDS / elapsed, 2)
        if converged else 0.0,
        "proposals_per_sec": round(res.iters_per_sec),
        "converged_reps": int(res.converged.sum()),
        "max_chi2": round(float(res.conval.max()), 4),
        "device": str(jax.devices()[0]),
    }
    if quickstart_s is not None and qs_converged:
        out["quickstart_s"] = round(quickstart_s, 4)
        out["vs_baseline_quickstart"] = round(
            REFERENCE_SECONDS / quickstart_s, 2)
    if "--no-certify" not in sys.argv:
        out["certify"] = certify()
    print(json.dumps(out))


def certify():
    """Drive-audit certification embedded in the bench artifact (VERDICT
    r4 #5): bitwise drive-vs-host-loop proposal counters (inflation must
    be 1.0) for the three kernel tiers that have historically broken
    ONLY on silicon — fused (sphere), prefetch+local-moves (kholodenko,
    the 43x-bug shape) and prefetch table (cylinders) — plus the sharded
    1-device-mesh legs for the fused and prefetch+local tiers (the
    shard_map x input_output_aliases x while_loop combination, VERDICT
    r4 #1).  The full nine-family audit stays in tools/drive_audit.py.

    Any failure is recorded in the artifact rather than raised: the
    headline timing above must survive a certification regression."""
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    import drive_audit as da
    tiers = ("sphere", "kholodenko-worm", "cylinders-isotropic")
    sharded_tiers = ("sphere", "kholodenko-worm")
    cert = {}
    keep = ("n_iter_equal", "inflation", "pallas", "prefetch", "table",
            "skipped")
    keep_sh = ("n_iter_equal", "contribs_equal", "inflation",
               "pallas_shard", "prefetch_shard", "sharded_drive",
               "mesh_platform")
    for entry in da.CONFIGS:
        if entry[0] not in tiers:
            continue
        try:
            cdata, cbound, ccfg = da.build_config(entry)
            row = da.audit(entry[0], cdata, cbound, ccfg)
            cert[entry[0]] = {k: row[k] for k in keep if k in row}
        except Exception as e:  # record, don't kill the bench artifact
            cert[entry[0]] = {"error": f"{type(e).__name__}: {e}"[:300]}
            continue
        if entry[0] in sharded_tiers:
            # separate try: a sharded-leg failure must not clobber the
            # already-recorded green unsharded row above
            try:
                row = da.audit_sharded(entry[0], cdata, cbound, ccfg)
                cert[entry[0] + "+sharded"] = {
                    k: row[k] for k in keep_sh if k in row}
            except Exception as e:
                cert[entry[0] + "+sharded"] = {
                    "error": f"{type(e).__name__}: {e}"[:300]}
    return cert


if __name__ == "__main__":
    if not _backend_reachable():
        print(json.dumps({
            "metric": "wall-clock 10-rep sphere full fit() to chi2<=1 "
                      "(MC + f64 post + histograms; sasfit_sphere-10-1, "
                      "300 contribs)",
            "value": -1.0, "unit": "s", "vs_baseline": 0.0,
            "error": "device backend unreachable (jax.devices() probe "
                     "timed out — remote TPU terminal down)"}))
        sys.exit(0)
    if "--suite" in sys.argv:
        suite()
    else:
        main()
