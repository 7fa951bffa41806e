# -*- coding: utf-8 -*-
"""On-hardware validation of the fused Pallas kernel (slow battery).

The default suite exercises the kernel in interpreter mode with a
stand-in hash RNG (ops/mc_kernel.py); these tests run the real
compiled kernel with the TPU hardware PRNG and close that gap:
χ² descent on-chip, range respect, and a two-sample KS match of the
accepted-parameter distribution against the XLA (threefry) path.

Run with MCSAS_TPU_SLOW_TESTS=1 on a machine with a TPU attached; never
in the default CPU suite (and never concurrently with another TPU
process — the remote chip link serializes).
"""
import os

import numpy as np
import pytest

slow = pytest.mark.skipif(
    os.environ.get("MCSAS_TPU_SLOW_TESTS", "") != "1",
    reason="set MCSAS_TPU_SLOW_TESTS=1 to run the on-TPU battery")

import jax  # noqa: E402

from mcsas_tpu import data  # noqa: E402
from mcsas_tpu.config import McSASConfig  # noqa: E402
from mcsas_tpu.core.engine import McSASEngine  # noqa: E402
from mcsas_tpu.models import get_model  # noqa: E402


def _tpu_device():
    try:
        devs = [d for d in jax.devices() if d.platform == "tpu"]
    except RuntimeError:
        return None
    return devs[0] if devs else None


@pytest.fixture()
def on_tpu():
    dev = _tpu_device()
    if dev is None:
        pytest.skip("no TPU device attached")
    prev = jax.config.jax_default_device
    jax.config.update("jax_default_device", dev)
    try:
        yield dev
    finally:
        jax.config.update("jax_default_device", prev)


def ks_two_sample(a, b) -> float:
    """Two-sample Kolmogorov-Smirnov D statistic (no scipy)."""
    a = np.sort(np.asarray(a).ravel())
    b = np.sort(np.asarray(b).ravel())
    grid = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, grid, side="right") / len(a)
    cdf_b = np.searchsorted(b, grid, side="right") / len(b)
    return float(np.max(np.abs(cdf_a - cdf_b)))


@slow
def test_hw_kernel_descends_and_matches_xla(refdata, on_tpu):
    d = data.load(refdata / "sasfit_sphere-10-1.dat")
    bound = get_model("Sphere").bind()
    base = dict(num_contribs=100, num_reps=4, max_iterations=400_000,
                chunk_steps=1024, candidates_per_step=16, seed=31,
                max_retries=1, show_incomplete=True)
    r_pal = McSASEngine(d, bound, McSASConfig(use_pallas="on",
                                              **base)).run()
    r_xla = McSASEngine(d, bound, McSASConfig(use_pallas="off",
                                              **base)).run()

    # χ² descent to convergence on the real chip with the HW PRNG
    assert np.all(np.isfinite(r_pal.conval))
    assert r_pal.converged.sum() >= 3
    assert r_pal.n_moves.min() > 0

    # range respect (HW-PRNG proposals clipped/transformed correctly)
    lo, hi = bound.ranges[0]
    assert r_pal.contribs.min() >= lo - 1e-15
    assert r_pal.contribs.max() <= hi * (1 + 1e-6)

    # accepted-parameter distribution: HW PRNG vs threefry (different
    # streams, same semantics) — two-sample KS on pooled log-radii.
    # n = 400 per side → 5% critical D ≈ 0.096; allow ensemble variance.
    d_stat = ks_two_sample(np.log(r_pal.contribs),
                           np.log(r_xla.contribs))
    assert d_stat < 0.2, f"KS D={d_stat:.3f}"

    # fitted curves agree where the data constrains them
    rel = np.abs(r_pal.measval.mean(0) / r_xla.measval.mean(0) - 1.0)
    assert np.median(rel) < 0.05


@slow
def test_init_drive_matches_manual_chunks(refdata, on_tpu):
    """run()'s first-attempt launch sequence must reproduce the manual
    init+chunk trajectory EXACTLY on the real chip.

    Regression for a TPU-compile hazard: fusing the XLA init computation
    into the same executable as a pallas_call whose operands carry
    input_output_aliases garbled the state the first kernel iteration
    read — most reps accepted nothing for thousands of steps and the MC
    silently needed ~2x the iterations (engine.py keeps init in its own
    launch on the Pallas paths for exactly this reason)."""
    import jax.numpy as jnp
    d = data.load(refdata / "sasfit_sphere-10-1.dat")
    bound = get_model("CylindersIsotropic").bind(
        active_ranges={"radius": (1e-9, 50e-9)})
    cfg = McSASConfig(num_contribs=100, num_reps=4,
                      max_iterations=400_000, chunk_steps=64,
                      candidates_per_step=16, seed=31, max_retries=1,
                      local_moves=0.5, show_incomplete=True,
                      use_pallas="on", table_ff="on")
    eng = McSASEngine(d, bound, cfg)
    assert eng.uses_prefetch
    state, ri, _ = eng._init_drive(cfg.seed)
    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), cfg.num_reps)
    st = eng._init_batch(keys)
    rj = jnp.zeros((), jnp.int32)
    crit = cfg.convergence_criterion
    for _ in range(10_000):
        conval = np.asarray(st.conval)
        n_iter = np.asarray(st.n_iter)
        if not np.any((conval > crit) & (n_iter < cfg.max_iterations)):
            break
        st, rj = eng._chunk_batch(st, rj)
    assert np.array_equal(np.asarray(state.n_iter), np.asarray(st.n_iter))
    assert np.array_equal(np.asarray(state.n_moves),
                          np.asarray(st.n_moves))
    assert np.array_equal(np.asarray(state.rset), np.asarray(st.rset))


@slow
def test_hw_prefetch_matches_scan_numerics(refdata, on_tpu, monkeypatch):
    """Prefetch kernel vs XLA scan ON CHIP, including the fitted
    scale/background — the interpret-mode twin of this test runs the
    dot_general exactly on CPU and the other on-TPU tests compare
    kernel-vs-kernel, so only this catches Mosaic-specific numerics.

    Regression for the _onehot_rowsum precision bug (round 4): at
    default matmul precision the MXU truncates f32 operands to bf16 —
    scale/background deviated from the scan path by up to 2.6e-3 rel
    and every ACCEPTED parameter (cand_block) was rounded ~0.2%.
    precision=HIGHEST restores the exact one-hot selection; rset must
    be bitwise and scale/background ≤1e-5 of the scan's."""
    import jax.numpy as jnp
    monkeypatch.setenv("MCSAS_TPU_TABLE_RES_CAP", "64")
    d = data.load(refdata / "sasfit_sphere-10-1.dat")
    bound = get_model("CylindersIsotropic").bind(
        active=("radius",), active_ranges={"radius": (1e-10, 5e-8)},
        fixed={"useAspect": 1.0, "aspect": 10.0})
    base = dict(num_reps=4, num_contribs=50, convergence_criterion=2.0,
                max_iterations=200_000, chunk_steps=64,
                candidates_per_step=8, seed=7, max_retries=0,
                local_moves=0.5)
    ep = McSASEngine(d, bound, McSASConfig(use_pallas="on",
                                           table_ff="on", **base))
    assert ep.uses_prefetch
    # the prefetch segment is capped at num_contribs steps; chunk the
    # scan baseline at that length so both consume equal step budgets
    # (same pattern as the interpret-mode twin in tests/test_pallas.py)
    from mcsas_tpu.ops import mc_kernel
    seg = mc_kernel.prefetch_seg_steps(ep)
    ex = McSASEngine(d, bound, McSASConfig(
        use_pallas="off", table_ff="on",
        **{**base, "chunk_steps": seg}))
    assert not ex.uses_prefetch
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    st_p, st_x = ep._init_batch(keys), ex._init_batch(keys)
    ri_p = ri_x = jnp.zeros((), jnp.int32)
    for _ in range(3):
        st_p, ri_p = ep._chunk_batch(st_p, ri_p)
        st_x, ri_x = ex._chunk_batch(st_x, ri_x)
    assert np.array_equal(np.asarray(st_p.rset), np.asarray(st_x.rset))
    assert np.array_equal(np.asarray(st_p.n_moves),
                          np.asarray(st_x.n_moves))
    np.testing.assert_allclose(np.asarray(st_p.scale),
                               np.asarray(st_x.scale), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_p.background),
                               np.asarray(st_x.background), rtol=1e-5,
                               atol=1e-8 * float(
                                   np.abs(np.asarray(st_x.scale)).max()))
    np.testing.assert_allclose(np.asarray(st_p.conval),
                               np.asarray(st_x.conval), rtol=1e-5)


@slow
@pytest.mark.parametrize("tier", ["fused", "prefetch", "prefetch-local"])
def test_sharded_tier_on_chip_matches_unsharded(refdata, on_tpu, tier):
    """ShardedEnsemble on a REAL 1-device TPU mesh vs the unsharded
    engine: bitwise proposal counters and contributions at the same
    seed, for all three kernel tiers (fused, prefetch, prefetch+local
    moves).

    Closes the round-4 verification gap: the shard_map-wrapped ALIASED
    kernels inside the while_loop drive were the one untested
    combination of the two ingredients that produced both round-4 chip
    bugs (init-fusion aliasing and the 43x rset-gather corruption) —
    everything sharded had only ever run on virtual CPU devices in
    interpret mode, where neither bug reproduces.  A 1-device mesh runs
    the same shard_map + input_output_aliases + while_loop machinery on
    real silicon; the unsharded engine at the same seed is the certified
    baseline (reference semantics anchor: the rep ensemble must be
    execution-layout invariant, mcsas/mcsas.py:214)."""
    from mcsas_tpu.parallel.mesh import make_mesh
    from mcsas_tpu.parallel.spmd import ShardedEnsemble
    if tier == "fused":
        d = data.load(refdata / "sasfit_sphere-10-1.dat")
        bound = get_model("Sphere").bind()
        cfg = McSASConfig(num_contribs=100, num_reps=4,
                          max_iterations=400_000, chunk_steps=1024,
                          candidates_per_step=16, seed=31, max_retries=0,
                          show_incomplete=True, use_pallas="on")
    else:
        d = data.load(refdata / "sasfit_kho-1-10-1000.dat")
        bound = get_model("Kholodenko").bind()
        local = 0.5 if tier == "prefetch-local" else 0.0
        cfg = McSASConfig(num_contribs=150, num_reps=4,
                          max_iterations=24_000_000, chunk_steps=1024,
                          candidates_per_step=128, seed=2026,
                          max_retries=0, local_moves=local,
                          show_incomplete=True, use_pallas="on",
                          table_ff="on")
    tpu_mesh = make_mesh((1, 1), [on_tpu])
    se = ShardedEnsemble(d, bound, cfg, mesh=tpu_mesh)
    if tier == "fused":
        assert se._pallas_shard and not se._prefetch_shard
    else:
        assert se._prefetch_shard
    assert se._drive is not None       # the while_loop drive tier engaged
    res_s = se.run()
    res_u = McSASEngine(d, bound, cfg).run()
    np.testing.assert_array_equal(res_s.n_iter, res_u.n_iter)
    np.testing.assert_array_equal(res_s.n_moves, res_u.n_moves)
    np.testing.assert_array_equal(res_s.contribs, res_u.contribs)
    # grind signature of state corruption: sharded total must not
    # inflate over the unsharded baseline (the 43x-bug detector)
    assert res_s.total_iters == res_u.total_iters


@slow
def test_prefetch_local_moves_drive_matches_host_loop(refdata, on_tpu):
    """The single-launch drive must reproduce the host-loop trajectory
    for the prefetch kernel WITH local moves at the production shape.

    Regression for a second aliasing hazard (round 4): with local moves
    the chunk_fn gathers state.rset in XLA while the kernel's aliased
    output overwrote the same buffer in place; inside the while_loop
    drive this silently corrupted the trajectory on the real chip —
    Kholodenko ground 94.4M proposals instead of 2.2M (43x) at identical
    seeds, while host-loop launches of the same chunk_fn were clean and
    interpret mode did not reproduce it.  The kernel now keeps rset
    un-aliased whenever a local-move gather exists (mc_kernel.py
    alias_rset); this certifies drive == host loop bitwise at the shape
    that exposed the bug (10 reps, K=128, local_moves=0.75)."""
    import jax.numpy as jnp
    d = data.load(refdata / "sasfit_kho-1-10-1000.dat")
    bound = get_model("Kholodenko").bind()
    cfg = McSASConfig(num_contribs=300, num_reps=10,
                      max_iterations=24_000_000, chunk_steps=1024,
                      candidates_per_step=128, seed=2026, max_retries=0,
                      local_moves=0.75, show_incomplete=True,
                      use_pallas="auto")
    eng = McSASEngine(d, bound, cfg)
    if not eng.uses_prefetch:
        pytest.skip("prefetch kernel not engaged for this config")
    state, ri, _ = eng._init_drive(cfg.seed)
    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), cfg.num_reps)
    st = eng._init_batch(keys)
    rj = jnp.zeros((), jnp.int32)
    crit = cfg.convergence_criterion
    for _ in range(10_000):
        conval = np.asarray(st.conval)
        n_iter = np.asarray(st.n_iter)
        if not np.any((conval > crit) & (n_iter < cfg.max_iterations)):
            break
        st, rj = eng._chunk_batch(st, rj)
    assert np.array_equal(np.asarray(state.n_iter), np.asarray(st.n_iter))
    assert np.array_equal(np.asarray(state.rset), np.asarray(st.rset))
    # the grind signature of the bug: any rep needing >10x the healthy
    # proposal budget (~200k/rep at this shape) means state corruption
    assert int(np.asarray(state.n_iter).max()) < 2_000_000
