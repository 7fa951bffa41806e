#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Drive-vs-host-loop trajectory audit across every bench family.

The round-4 rset aliasing bug showed that the single-launch while_loop
drive can silently corrupt trajectories on the real chip while the SAME
chunk_fn is clean in host-loop launches (and interpret mode).  This
audit runs every bench --suite config both ways at identical seeds and
compares the per-repetition proposal counters: any drive-only
inflation or divergence is a state-corruption signature.

For Pallas paths the trajectory is deterministic given the seed (the
hardware PRNG is seeded per chunk from the carried threefry key), so
the counters must match EXACTLY whenever the chunk schedules align:
the host loop replays the drive's chunk sequence, so they do.

Run on the chip, one TPU process at a time.  One JSON line per config.
"""
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("MCSAS_TPU_TABLE_CACHE_DIR",
                      os.path.join(_REPO, ".table_cache"))


def audit(name, data, bound, cfg):
    import jax
    import jax.numpy as jnp
    from mcsas_tpu.core.engine import McSASEngine

    eng = McSASEngine(data, bound, cfg)
    if eng._drive is None:
        print(json.dumps({"config": name, "skipped": "no drive tier"}),
              flush=True)
        return

    # drive mode: the production run() path (init fused where safe)
    res = eng.run()

    # host loop: identical init, chunk-by-chunk launches
    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), cfg.num_reps)
    st = eng._init_batch(keys)
    ri = jnp.zeros((), jnp.int32)
    crit = cfg.convergence_criterion
    for _ in range(200_000):
        conval = np.asarray(st.conval)
        n_iter = np.asarray(st.n_iter)
        if not np.any((conval > crit) & (n_iter < cfg.max_iterations)):
            break
        st, ri = eng._chunk_batch(st, ri)

    drive_iter = res.n_iter.astype(np.int64)
    host_iter = np.asarray(st.n_iter, np.int64)
    # run() may span retries; the audit only certifies single-attempt
    # trajectories (max_retries=0 in the configs below)
    equal = np.array_equal(drive_iter, host_iter)
    ratio = float(drive_iter.sum()) / max(float(host_iter.sum()), 1.0)
    out = {"config": name,
           "pallas": bool(eng.uses_pallas),
           "prefetch": bool(eng.uses_prefetch),
           "table": bool(eng.uses_table),
           "n_iter_equal": bool(equal),
           "drive_total": int(drive_iter.sum()),
           "host_total": int(host_iter.sum()),
           "inflation": round(ratio, 3)}
    if not equal:
        out["drive_iter"] = drive_iter.tolist()
        out["host_iter"] = host_iter.tolist()
    print(json.dumps(out), flush=True)


def main():
    import mcsas_tpu as mt
    from bench import synth_golden
    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.models import get_model

    ref = os.path.join(_REPO, "testdata")
    refm = os.path.join(ref, "models")
    nm = 1e-9
    configs = [
        ("sphere", f"{ref}/sasfit_sphere-10-1.dat", "Sphere", None, None,
         128, 0.5),
        ("gaussian-chain", f"{ref}/sasfit_gauss2-5-1.5-2-1.dat",
         "GaussianChain", None, None, 64, 0.0),
        ("kholodenko-worm", f"{ref}/sasfit_kho-1-10-1000.dat",
         "Kholodenko", None, None, 128, 0.75),
        ("cylinders-isotropic", "synth:cylinder", "CylindersIsotropic",
         ("radius",), {"radius": (0.5 * nm, 300 * nm)}, 128, 0.0),
        ("cylinders-smeared", "synth:cylinder-smeared",
         "CylindersIsotropic", ("radius",),
         {"radius": (0.5 * nm, 300 * nm)}, 128, 0.0),
        ("ellipsoids-isotropic", "synth:ellipsoid", "EllipsoidsIsotropic",
         ("a",), {"a": (0.5 * nm, 300 * nm)}, 128, 0.0),
        ("core-shell-sphere",
         f"{refm}/SphCoreShell_R100_dR150_c3p16_s2p53.csv",
         "SphericalCoreShell", ("radius", "t"), None, 128, 0.5),
        ("core-shell-ellipsoid", "synth:ellcoreshell",
         "EllipsoidalCoreShell", ("a", "t"),
         {"a": (2 * nm, 50 * nm), "t": (10 * nm, 200 * nm)}, 128, 0.5),
        # explicit radius range: this audit drives McSASEngine directly,
        # which (unlike fit()) does not default unbounded ranges to the
        # data size estimate
        ("lma-dense-sphere", f"{ref}/sasfit_sphere-10-1.dat",
         "LMADenseSphere", ("radius", "volFrac"),
         {"radius": (0.5 * nm, 300 * nm), "volFrac": (1e-4, 0.1)},
         128, 0.5),
    ]
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    for name, path, model, active, ranges, k_cand, local in configs:
        if only and name not in only:
            continue
        if path.startswith("synth:"):
            data = synth_golden(path.split(":", 1)[1])
        else:
            data = mt.load(path)
        fixed = {"ellipsoids-isotropic": {"aspect": 3.0},
                 "core-shell-ellipsoid": {"b": 15 * nm}}.get(name)
        bound = get_model(model).bind(active=active, active_ranges=ranges,
                                      fixed=fixed)
        cfg = McSASConfig(num_contribs=300, num_reps=10,
                          max_iterations=24_000_000, chunk_steps=1024,
                          candidates_per_step=k_cand, seed=2026,
                          max_retries=0, local_moves=local,
                          show_incomplete=True)
        audit(name, data, bound, cfg)


if __name__ == "__main__":
    main()
