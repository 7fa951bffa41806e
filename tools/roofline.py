#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Roofline / MFU measurement for the MC hot kernels (VERDICT r3 #6).

Measures, on the real chip:

1. **Fused Pallas kernel** (sphere headline shape): sustained step rate
   from a fixed-budget single-launch drive (the production path — no
   per-chunk RTT in the measurement), against an ANALYTIC per-element
   op count (documented below; XLA's CPU ``cost_analysis()`` was tried
   first and reports ~0.4 flop/element for the scan path — it does not
   see through the fused elementwise graph, so it is useless here).
2. **Prefetch kernel** (cylinders table tier): same, plus the HBM
   roofline — this kernel STREAMS the (S, R, K, Nq) candidate-row bank
   from HBM, so its ceiling is bandwidth, not compute.
3. **K=256 A/B** (the intensity-raising lever): full headline fit at
   candidates_per_step 128 vs 256 — wall clock, proposals, convergence.

Analytic op model (per (R, K, Nq) element):

* fused sphere kernel: ff eval ``x=qr; 3(sin x − x cos x)/x³`` ≈ 7 flops
  + 1 sin + 1 cos; row ``min(ff²·w, clamp)`` 3; incremental total
  ``ft − old + row`` 2; solve sums ``ux, Σux, Σux·x, Σux·y`` 6;
  residual+χ² ``u(y−ax−b)²`` 6 → **24 flops + 2 transcendentals**.
* prefetch kernel (in-kernel only): 2 + 6 + 6 = **14 flops**; the
  row-gather/interp stage runs in XLA and is bandwidth-dominated.

Peaks used (TPU v5e, public figures): 197 TFLOP/s bf16 MXU, 819 GB/s
HBM.  The VPU f32 issue ceiling is derived: 8 sublanes x 128 lanes x
4 ALUs x 2 (FMA) x ~0.94 GHz ≈ 7.7 TFLOP/s.  The MC chain has ZERO
MXU-shaped work (no matmuls — the q-axis reductions are length-Nq dot
products folded into the VPU), so MXU peak is context only.

Run AFTER the test suite (one TPU process at a time — CLAUDE.md).
Prints one JSON line per section.
"""
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("MCSAS_TPU_TABLE_CACHE_DIR",
                      os.path.join(_REPO, ".table_cache"))

PEAK_BF16_MXU = 197e12
PEAK_HBM = 819e9
PEAK_VPU_F32 = 8 * 128 * 4 * 2 * 0.94e9     # ~7.7e12, derivation above


def _sustained(eng, budget_iters):
    """Sustained seconds/step on the production single-launch drive:
    convergence_criterion=0 keeps every repetition live, so the drive
    runs exactly ``budget_iters`` proposals per rep in ONE launch."""
    state, ri, packed = eng._init_drive(eng.cfg.seed)      # warm/compile
    np.asarray(packed)
    t0 = time.perf_counter()
    state, ri, packed = eng._init_drive(eng.cfg.seed)
    np.asarray(packed)
    wall = time.perf_counter() - t0
    n_iter = int(np.asarray(state.n_iter).max())
    assert n_iter >= budget_iters, (n_iter, budget_iters)
    steps = n_iter / eng.cfg.candidates_per_step
    return wall / steps, wall


def fused_section():
    import mcsas_tpu as mt
    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.core.engine import McSASEngine
    from mcsas_tpu.models import get_model

    data = mt.load(os.path.join(_REPO, "testdata",
                                "sasfit_sphere-10-1.dat"))
    bound = get_model("Sphere").bind()
    budget = 8_000_000
    cfg = McSASConfig(num_contribs=300, num_reps=10,
                      max_iterations=budget, chunk_steps=2048,
                      candidates_per_step=128, seed=2026,
                      convergence_criterion=0.0,   # keep every step live
                      show_incomplete=True, local_moves=0.5)
    eng = McSASEngine(data, bound, cfg)
    assert eng.uses_pallas, "headline engine must ride the fused kernel"
    s_step, wall = _sustained(eng, budget)

    r, k = cfg.num_reps, cfg.candidates_per_step
    nq = int(eng.grid.shape[0])
    elems = r * k * nq
    elems_per_s = elems / s_step
    flops = 24.0 * elems_per_s
    transc = 2.0 * elems_per_s
    out = {
        "section": "fused-pallas-sphere",
        "shape": {"R": r, "K": k, "Nq": nq, "N": cfg.num_contribs},
        "us_per_step": round(s_step * 1e6, 3),
        "proposals_per_sec_all_reps": round(r * k / s_step),
        "candidate_elems_per_sec": round(elems_per_s / 1e9, 2),
        "achieved_gflops_analytic": round(flops / 1e9, 1),
        "transcendental_pairs_per_sec_g": round(transc / 2e9, 2),
        "pct_vpu_f32_peak": round(100 * flops / PEAK_VPU_F32, 2),
        "pct_mxu_bf16_peak": round(100 * flops / PEAK_BF16_MXU, 3),
        "hbm_bytes_per_step": 0,
        "note": "state fully VMEM-resident; the chunk is a strict chain "
                "of dependent steps (~1.3 MFLOP each), so the kernel is "
                "latency/occupancy-bound, not FLOP- or HBM-bound",
    }
    print(json.dumps(out), flush=True)
    return out


def prefetch_section():
    import mcsas_tpu as mt  # noqa: F401  (bench synth helper imports)
    from bench import synth_golden
    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.core.engine import McSASEngine
    from mcsas_tpu.models import get_model
    from mcsas_tpu.ops.mc_kernel import pad_lanes

    nm = 1e-9
    data = synth_golden("cylinder")
    bound = get_model("CylindersIsotropic").bind(
        active=("radius",), active_ranges={"radius": (0.5 * nm, 300 * nm)})
    budget = 2_000_000
    cfg = McSASConfig(num_contribs=300, num_reps=10,
                      max_iterations=budget, chunk_steps=1024,
                      candidates_per_step=128, seed=2026,
                      convergence_criterion=0.0, show_incomplete=True,
                      table_ff="on")
    eng = McSASEngine(data, bound, cfg)
    assert eng.uses_prefetch, "cylinder engine must ride the prefetch kernel"
    s_step, wall = _sustained(eng, budget)

    r, k = cfg.num_reps, cfg.candidates_per_step
    nq = pad_lanes(int(eng.consts.y.shape[0]))
    elems = r * k * nq
    flops = 14.0 * elems / s_step
    # HBM traffic per step: the streamed candidate-row block is written
    # by the XLA stage and read back by the kernel (2x), plus the
    # table-gather read of 2 interpolation rows per candidate in XLA
    bytes_step = (2 + 2) * r * k * nq * 4
    ai = flops * s_step / bytes_step
    bw = bytes_step / s_step
    out = {
        "section": "prefetch-pallas-cylinder-table",
        "shape": {"R": r, "K": k, "Nq": nq},
        "us_per_step": round(s_step * 1e6, 3),
        "proposals_per_sec_all_reps": round(r * k / s_step),
        "achieved_gflops_analytic_kernel_only": round(flops / 1e9, 1),
        "hbm_bytes_per_step": bytes_step,
        "achieved_gbps": round(bw / 1e9, 1),
        "pct_hbm_peak": round(100 * bw / PEAK_HBM, 1),
        "arith_intensity_flops_per_byte": round(ai, 2),
        "note": "end-to-end step cost incl. the XLA row-gather/draw "
                "stage; the streamed row bank makes this path "
                "bandwidth-shaped (AI ~ 3.5 f/B in-kernel), but at this "
                "problem size it too is latency-bound, far from either "
                "roof",
    }
    print(json.dumps(out), flush=True)
    return out


def k_ab_section():
    """The VERDICT intensity-raising lever: K=256 vs K=128 on the full
    headline fit.  Adopt iff wall-clock improves at unchanged fit
    statistics (converged reps, chi2)."""
    import mcsas_tpu as mt
    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.models import get_model

    data = mt.load(os.path.join(_REPO, "testdata",
                                "sasfit_sphere-10-1.dat"))
    bound = get_model("Sphere").bind()
    rows = []
    for k in (128, 256):
        cfg = McSASConfig(num_contribs=300, num_reps=10,
                          max_iterations=16_000_000, chunk_steps=2048,
                          candidates_per_step=k, seed=2026, max_retries=1,
                          local_moves=0.5)
        mt.fit(data, model=bound, cfg=cfg)          # warm-up / compile
        wall = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            res = mt.fit(data, model=bound, cfg=cfg)
            wall = min(wall, time.perf_counter() - t0)
        rows.append({
            "K": k, "full_fit_s": round(wall, 4),
            "converged_reps": int(res.engine.converged.sum()),
            "max_chi2": round(float(res.engine.conval.max()), 3),
            "total_proposals": int(res.engine.total_iters),
            "proposals_per_sec": round(res.engine.iters_per_sec),
        })
    out = {"section": "k-ab", "rows": rows,
           "verdict": ("adopt K=256" if rows[1]["full_fit_s"]
                       < rows[0]["full_fit_s"]
                       and rows[1]["converged_reps"]
                       >= rows[0]["converged_reps"]
                       else "keep K=128")}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    import jax  # noqa: F401  (initialize backend once, in-process)
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    sections = {"fused": fused_section, "prefetch": prefetch_section,
                "kab": k_ab_section}
    for name, fn in sections.items():
        if only and name not in only:
            continue
        fn()
