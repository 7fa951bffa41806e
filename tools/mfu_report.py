# -*- coding: utf-8 -*-
"""MFU / roofline report for the MC hot loop + cold-start compile budget.

Produces the numbers behind BENCHMARKS.md's "Roofline" section
(VERDICT r3 items 6 and 8):

* measured step throughput of the fused and prefetch Pallas kernels at
  the headline shape, converted to achieved FLOP/s via an analytical
  per-step FLOP count (the kernel is elementwise/VPU work — there are
  no matmuls to feed the MXU, so the roofline peak is the VPU's);
* an A/B of the intensity-raising lever K=256 vs the canonical K=128
  (adopted only if wall-clock improves at unchanged fit statistics);
* the number of distinct XLA executables a fresh ``fit()`` compiles per
  tier (cold-start budget), counted via jax's compile logging.

Run on the real chip (no JAX_PLATFORMS override):
    python tools/mfu_report.py [--ab] [--compile-count]
Prints one JSON line per measurement.
"""
import json
import logging
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("MCSAS_TPU_TABLE_CACHE_DIR",
                      os.path.join(_REPO, ".table_cache"))

# TPU v5e (one chip) peaks, public figures: 197 TFLOP/s bf16 MXU,
# ~394 GFLOP/s-class VPU vector math per core complex is not published;
# we report achieved FLOP/s and the fraction of the bf16 MXU peak as the
# conservative "chip utilization" bound, plus the latency argument.
V5E_PEAK_BF16 = 197e12
V5E_HBM_GBS = 819e9          # bytes/s


def _sphere_flops_per_step(cfg, nq):
    """Analytical FLOP count of ONE fused-kernel step across the
    ensemble: candidate generation + row eval + solve + update.

    Sphere row: x=q·r (1), sin+cos (2 transcendental ≈ 2 flops counted,
    hardware cost is higher), 3(sin−x·cos)/x³ ≈ 7, ff²·w ≈ 3 → ~13/elem.
    Solve per candidate: 5 reductions over nq (ux, x·ux, y·ux, resid²)
    ≈ 8/elem; accept/update ≈ 3/elem on the winning row only.
    """
    r, k = cfg.num_reps, cfg.candidates_per_step
    per_elem = 13 + 8
    return r * k * nq * per_elem


def measure_kernel_throughput(k_cand=128, label="k128"):
    import mcsas_tpu as mt
    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.core.engine import McSASEngine
    from mcsas_tpu.models import get_model

    data = mt.load(os.path.join(_REPO, "testdata",
                                "sasfit_sphere-10-1.dat"))
    bound = get_model("Sphere").bind()
    cfg = McSASConfig(num_contribs=300, num_reps=10,
                      max_iterations=8_000_000, chunk_steps=2048,
                      candidates_per_step=k_cand, seed=2026,
                      max_retries=1, local_moves=0.5)
    eng = McSASEngine(data, bound, cfg)
    res = eng.run()                      # warm-up + compile
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        res = eng.run()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)

    nq = int(np.asarray(eng.consts.y.shape)[0])
    steps = res.total_iters / cfg.candidates_per_step
    flops = _sphere_flops_per_step(cfg, nq) / cfg.num_reps  # per rep-step
    # total flops: every step evaluates all reps (masked ones still
    # compute), so use the full ensemble rate
    total_flops = steps * _sphere_flops_per_step(cfg, nq)
    achieved = total_flops / best
    # HBM traffic: the fused kernel keeps state VMEM-resident; per step
    # only the streamed proposals (in-kernel PRNG: none) — effectively
    # compute/latency bound, not bandwidth bound
    out = {
        "measurement": f"fused-kernel throughput ({label})",
        "wall_s": round(best, 4),
        "proposals_per_s": round(res.iters_per_sec),
        "steps_per_s": round(steps / best),
        "nq_padded": nq,
        "analytic_flops_per_step": _sphere_flops_per_step(cfg, nq),
        "achieved_flops": round(achieved / 1e9, 2),
        "achieved_unit": "GFLOP/s",
        "pct_of_v5e_bf16_peak": round(100.0 * achieved / V5E_PEAK_BF16, 4),
        "max_chi2": round(float(res.conval.max()), 3),
        "converged_reps": int(res.converged.sum()),
        "total_iters": int(res.total_iters),
        "used_pallas": bool(res.used_pallas),
    }
    print(json.dumps(out), flush=True)
    return out


def compile_count():
    """Counts distinct XLA compiles of one fresh fit() per tier, in a
    subprocess with compile logging on (cold-start budget)."""
    import subprocess
    prog = r'''
import json, logging, os, sys
sys.path.insert(0, %(repo)r)
os.environ.setdefault("MCSAS_TPU_TABLE_CACHE_DIR",
                      os.path.join(%(repo)r, ".table_cache"))
import jax
jax.config.update("jax_log_compiles", True)
count = {"n": 0}
class H(logging.Handler):
    def emit(self, record):
        if "Finished XLA compilation" in record.getMessage():
            count["n"] += 1
for name in ("jax._src.dispatch", "jax._src.compiler",
             "jax._src.interpreters.pxla"):
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)
    lg.addHandler(H())
import mcsas_tpu as mt
from mcsas_tpu.config import McSASConfig
from mcsas_tpu.models import get_model
data = mt.load(os.path.join(%(repo)r, "testdata", %(dataset)r))
bound = get_model(%(model)r).bind()
cfg = McSASConfig(num_contribs=300, num_reps=10,
                  max_iterations=2_000_000, chunk_steps=1024,
                  candidates_per_step=128, seed=7, max_retries=1,
                  show_incomplete=True, convergence_criterion=1.0)
import time
t0 = time.time()
res = mt.fit(data, model=bound, cfg=cfg)
print(json.dumps({"tier": %(tier)r, "model": %(model)r,
                  "executables_compiled": count["n"],
                  "cold_fit_s": round(time.time() - t0, 2)}))
'''
    for tier, model, dataset in (
            ("pallas", "Sphere", "sasfit_sphere-10-1.dat"),
            ("xla-elementwise", "GaussianChain",
             "sasfit_gauss2-5-1.5-2-1.dat"),
            ("table", "Kholodenko", "sasfit_kho-1-10-1000.dat")):
        body = prog % {"repo": _REPO, "tier": tier, "model": model,
                       "dataset": dataset}
        r = subprocess.run([sys.executable, "-c", body],
                           capture_output=True, text=True, timeout=1800)
        for ln in r.stdout.splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
        if r.returncode != 0:
            print(json.dumps({"tier": tier,
                              "error": r.stderr.strip()[-400:]}),
                  flush=True)


def main():
    logging.basicConfig(level=logging.WARNING)
    if "--compile-count" in sys.argv:
        compile_count()
        return
    base = measure_kernel_throughput(128, "k128 canonical")
    if "--ab" in sys.argv:
        alt = measure_kernel_throughput(256, "k256 A/B lever")
        verdict = {
            "measurement": "A/B verdict K=256 vs K=128",
            "k128_wall_s": base["wall_s"], "k256_wall_s": alt["wall_s"],
            "k256_adopted": bool(
                alt["wall_s"] < base["wall_s"]
                and alt["converged_reps"] >= base["converged_reps"]),
        }
        print(json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
