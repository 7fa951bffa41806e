#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Roofline / MFU measurement for the MC hot kernels (VERDICT r3 #6).

Measures, on the real chip:

1. **Fused Pallas kernel** (sphere headline shape): steps/s timed on
   kernel-only chunk launches; FLOPs/step calibrated from XLA's own
   ``cost_analysis()`` of the mathematically identical XLA scan path
   (same candidate evaluation, same closed-form solve — the Pallas
   kernel's math is a transcription, so the XLA flop count is an honest
   count for it).  Reports achieved FLOP/s and the fraction of the VPU
   f32 ceiling — the MC chain has ZERO MXU-shaped work (no matmuls; the
   q-axis reductions are length-Nq dot products folded into the VPU),
   so MXU peak is reported only as context.
2. **Prefetch kernel** (cylinders table tier): same, plus the HBM
   roofline — this kernel STREAMS the (S, R, K, Nq) candidate-row bank
   from HBM, so its ceiling is bandwidth, not compute.
3. **K=256 A/B** (the intensity-raising lever): full headline fit at
   candidates_per_step 128 vs 256 — wall clock, proposals, convergence.

Peaks used (TPU v5e, public figures): 197 TFLOP/s bf16 MXU,
~819 GB/s HBM.  The VPU f32 ceiling is derived: 8 sublanes x 128 lanes
x 4 ALUs x 2 (FMA) x ~0.94 GHz ~= 7.7 TFLOP/s; transcendentals
(sin/cos/exp2) retire well below 1/flop, so the fused kernel's real
ceiling sits below that — the point of the measurement is to show the
headroom argument either way.

Run AFTER the test suite (one TPU process at a time — CLAUDE.md).
Prints one JSON line per section plus a markdown-ready summary.
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


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def _time_chunks(eng, state, ri, n_chunks, steps_per_call):
    """Wall time per MC step over n_chunks dependent chunk launches."""
    # warm-up launch (compile + first-launch overheads)
    state, ri = eng._chunk_batch(state, ri)
    _sync(state.conval)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, ri = eng._chunk_batch(state, ri)
    _sync(state.conval)
    dt = time.perf_counter() - t0
    return dt / (n_chunks * steps_per_call), state


def _xla_flops_per_step(data, bound, cfg):
    """XLA-counted FLOPs for ONE MC step: cost_analysis of the scan-path
    chunk executable (identical math to the Pallas kernels), divided by
    chunk_steps.  Compiled on the CPU backend — the flop count is a
    property of the HLO, not the target."""
    from mcsas_tpu.core.engine import McSASEngine
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        eng = McSASEngine(data, bound, cfg.replace(use_pallas="off"))
        keys = jax.random.split(jax.random.PRNGKey(0), cfg.num_reps)
        state = eng._init_batch(keys)
        ri = jnp.zeros((), jnp.int32)
        lowered = jax.jit(eng._run_chunk_batched).lower(
            state, ri, eng.grid, eng.consts)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
    return float(cost["flops"]) / cfg.chunk_steps, eng


def fused_section():
    import mcsas_tpu as mt
    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.core.engine import McSASEngine
    from mcsas_tpu.models import get_model

    data = mt.load(os.path.join(_REPO, "testdata",
                                "sasfit_sphere-10-1.dat"))
    bound = get_model("Sphere").bind()
    cfg = McSASConfig(num_contribs=300, num_reps=10,
                      max_iterations=2 ** 30, chunk_steps=2048,
                      candidates_per_step=128, seed=2026,
                      convergence_criterion=0.0,   # keep every step live
                      local_moves=0.5)
    flops_step, _ = _xla_flops_per_step(data, bound, cfg)

    eng = McSASEngine(data, bound, cfg)
    assert eng.uses_pallas, "headline engine must ride the fused kernel"
    keys = jax.random.split(jax.random.PRNGKey(0), cfg.num_reps)
    state = eng._init_batch(keys)
    ri = jnp.zeros((), jnp.int32)
    s_step, _ = _time_chunks(eng, state, ri, n_chunks=8,
                             steps_per_call=cfg.chunk_steps)
    achieved = flops_step / s_step
    r, k = cfg.num_reps, cfg.candidates_per_step
    nq = int(eng.grid.shape[0])
    out = {
        "section": "fused-pallas-sphere",
        "shape": {"R": r, "K": k, "Nq": nq, "N": cfg.num_contribs},
        "flops_per_step_xla": round(flops_step),
        "flops_per_elem": round(flops_step / (r * k * nq), 1),
        "us_per_step": round(s_step * 1e6, 3),
        "proposals_per_sec": round(k / s_step),
        "achieved_tflops": round(achieved / 1e12, 3),
        "pct_vpu_f32_peak": round(100 * achieved / PEAK_VPU_F32, 1),
        "pct_mxu_bf16_peak": round(100 * achieved / PEAK_BF16_MXU, 2),
        "hbm_bytes_per_step": 0,
        "note": "state fully VMEM-resident; ceiling = VPU transcendental "
                "throughput (2 sin/cos per element), not HBM",
    }
    print(json.dumps(out), flush=True)
    return out


def prefetch_section():
    import mcsas_tpu as mt  # noqa: F401  (bench synth helper imports)
    from bench import synth_golden
    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.core.engine import McSASEngine
    from mcsas_tpu.models import get_model
    from mcsas_tpu.ops.mc_kernel import pad_lanes, prefetch_seg_steps

    nm = 1e-9
    data = synth_golden("cylinder")
    bound = get_model("CylindersIsotropic").bind(
        active=("radius",), active_ranges={"radius": (0.5 * nm, 300 * nm)})
    cfg = McSASConfig(num_contribs=300, num_reps=10,
                      max_iterations=2 ** 30, chunk_steps=1024,
                      candidates_per_step=128, seed=2026,
                      convergence_criterion=0.0, table_ff="on")
    flops_step, _ = _xla_flops_per_step(data, bound, cfg)

    eng = McSASEngine(data, bound, cfg)
    assert eng.uses_prefetch, "cylinder engine must ride the prefetch kernel"
    seg = prefetch_seg_steps(eng)
    keys = jax.random.split(jax.random.PRNGKey(0), cfg.num_reps)
    state = eng._init_batch(keys)
    ri = jnp.zeros((), jnp.int32)
    s_step, _ = _time_chunks(eng, state, ri, n_chunks=8,
                             steps_per_call=seg)
    achieved = flops_step / s_step
    r, k = cfg.num_reps, cfg.candidates_per_step
    nq = pad_lanes(int(eng.consts.y.shape[0]))
    bytes_step = r * k * nq * 4            # streamed candidate rows
    ai = flops_step / bytes_step
    hbm_cap = ai * PEAK_HBM                # roofline: flops/s at BW peak
    out = {
        "section": "prefetch-pallas-cylinder-table",
        "shape": {"R": r, "K": k, "Nq": nq, "seg": seg},
        "flops_per_step_xla": round(flops_step),
        "us_per_step": round(s_step * 1e6, 3),
        "proposals_per_sec": round(k / s_step),
        "achieved_tflops": round(achieved / 1e12, 3),
        "hbm_bytes_per_step": bytes_step,
        "achieved_gbps": round(bytes_step / s_step / 1e9, 1),
        "pct_hbm_peak": round(100 * (bytes_step / s_step) / PEAK_HBM, 1),
        "arith_intensity_flops_per_byte": round(ai, 2),
        "roofline_cap_tflops_at_peak_bw": round(hbm_cap / 1e12, 3),
        "pct_of_bw_roofline": round(100 * achieved / hbm_cap, 1),
        "note": "rows streamed from HBM; includes the XLA row-eval + "
                "draw stage of each segment launch (end-to-end step "
                "cost, not kernel-only)",
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
    import jax
    import jax.numpy as jnp
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    sections = {"fused": fused_section, "prefetch": prefetch_section,
                "kab": k_ab_section}
    for name, fn in sections.items():
        if only and name not in only:
            continue
        fn()
