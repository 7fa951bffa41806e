#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""A/B probe: bf16 vs f32 candidate-row streaming in the prefetch
kernel (VERDICT r4 #8).

The prefetch kernel sits at ~19% of HBM peak streaming f32 table rows
(tools/roofline.py): the (seg, R, K, Nq) rows tensor is written by the
XLA row-gather and read back by the kernel — the dominant HBM stream.
Casting it to bf16 halves those bytes; the kernel converts back to f32
at VMEM entry, so the solve/accept math is unchanged in precision but
the row VALUES carry bf16 quantization (~0.4% rel).

Adoption rule: wall-clock must improve at unchanged fit statistics
(conval distribution, proposal counts, contribution KS).  The verdict
is recorded in BENCHMARKS.md either way.

Run ON THE CHIP, one TPU process at a time:
    python tools/bf16_rows_probe.py
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


def ks_two_sample(a, b) -> float:
    a = np.sort(np.asarray(a).ravel())
    b = np.sort(np.asarray(b).ravel())
    grid = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, grid, side="right") / len(a)
    cdf_b = np.searchsorted(b, grid, side="right") / len(b)
    return float(np.max(np.abs(cdf_a - cdf_b)))


def main():
    import jax
    import jax.numpy as jnp

    import mcsas_tpu as mt
    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.core.engine import McSASEngine
    from mcsas_tpu.models import get_model
    from mcsas_tpu.ops import mc_kernel

    # the bench kholodenko-worm family: table + prefetch + local moves
    d = mt.load(os.path.join(_REPO, "testdata",
                             "sasfit_kho-1-10-1000.dat"))
    bound = get_model("Kholodenko").bind()
    cfg = McSASConfig(num_contribs=300, num_reps=10,
                      max_iterations=24_000_000, chunk_steps=1024,
                      candidates_per_step=128, seed=2026, max_retries=0,
                      local_moves=0.75, show_incomplete=True)
    eng = McSASEngine(d, bound, cfg)
    assert eng.uses_prefetch, "probe requires the prefetch tier"
    variants = {
        "f32": eng._chunk_batch,
        "bf16": mc_kernel.build_prefetch_chunk_fn(
            eng, row_dtype=jnp.bfloat16),
    }
    seg = mc_kernel.prefetch_seg_steps(eng)
    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), cfg.num_reps)
    ri0 = jnp.zeros((), jnp.int32)

    results = {}
    for name, chunk in variants.items():
        st = eng._init_batch(keys)
        # warmup (compile) + a couple of launches
        st_w, ri_w = chunk(st, ri0)
        np.asarray(st_w.conval)

        # timed: N back-to-back launches, one final sync
        N = 30
        st_t, ri_t = st, ri0
        t0 = time.perf_counter()
        for _ in range(N):
            st_t, ri_t = chunk(st_t, ri_t)
        np.asarray(st_t.conval)            # force sync (remote link)
        dt = (time.perf_counter() - t0) / N

        # convergence run (host loop, same budget both ways)
        st_c, ri_c = st, ri0
        launches = 0
        t0 = time.perf_counter()
        while launches < 2000:
            conval = np.asarray(st_c.conval)
            n_iter = np.asarray(st_c.n_iter)
            if not np.any((conval > cfg.convergence_criterion)
                          & (n_iter < cfg.max_iterations)):
                break
            st_c, ri_c = chunk(st_c, ri_c)
            launches += 1
        results[name] = dict(
            seg_ms=round(dt * 1e3, 3),
            proposals_per_sec=round(seg * cfg.num_reps
                                    * cfg.candidates_per_step / dt),
            converge_s=round(time.perf_counter() - t0, 3),
            launches=launches,
            conval=np.asarray(st_c.conval, np.float64).round(4).tolist(),
            total_iters=int(np.asarray(st_c.n_iter, np.int64).sum()),
            total_moves=int(np.asarray(st_c.n_moves, np.int64).sum()),
            rset=np.asarray(st_c.rset, np.float64),
        )

    a, b = results["f32"], results["bf16"]
    ks = ks_two_sample(np.log(a.pop("rset")[..., 0]),
                       np.log(b.pop("rset")[..., 0]))
    print(json.dumps({"variant": "f32", **a}), flush=True)
    print(json.dumps({"variant": "bf16", **b}), flush=True)
    print(json.dumps({
        "speedup_seg": round(a["seg_ms"] / b["seg_ms"], 3),
        "speedup_converge": round(a["converge_s"] / b["converge_s"], 3),
        "iters_ratio": round(b["total_iters"] / max(a["total_iters"], 1),
                             3),
        "radius_ks": round(ks, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
