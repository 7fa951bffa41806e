# -*- coding: utf-8 -*-
"""MC engine behavior: descent, consistency, determinism, retry, K-candidate
equivalence (reference semantics: src/mcsas/mcsas/mcsas.py:191-439)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcsas_tpu import data
from mcsas_tpu.config import McSASConfig
from mcsas_tpu.core.engine import McSASEngine
from mcsas_tpu.core.fitcore import solve_scale_bg
from mcsas_tpu.core.rng import draw_params, draw_unit
from mcsas_tpu.models import get_model


@pytest.fixture(scope="module")
def sphere_data(refdata):
    return data.load(refdata / "sasfit_sphere-10-1.dat")


@pytest.fixture(scope="module")
def sphere_bound():
    return get_model("Sphere").bind()


def small_cfg(**kw):
    base = dict(num_contribs=40, num_reps=2, max_iterations=1500,
                chunk_steps=500, seed=11, max_retries=0)
    base.update(kw)
    return McSASConfig(**base)


@pytest.fixture(scope="module")
def run_small(sphere_data, sphere_bound):
    eng = McSASEngine(sphere_data, sphere_bound, small_cfg())
    state = eng._init_batch(jax.random.split(jax.random.PRNGKey(11), 2))
    ri = jnp.zeros((), jnp.int32)
    states = [state]
    for _ in range(3):
        state, ri = eng._chunk_batch(states[-1], ri)
        states.append(state)
    return eng, states


def test_chisqr_descends_monotonically(run_small):
    _, states = run_small
    convals = np.array([np.asarray(s.conval) for s in states])
    assert np.all(np.diff(convals, axis=0) <= 1e-5)
    assert convals[-1].max() < convals[0].min()   # substantial progress


def test_incremental_matches_recompute(run_small):
    """The incrementally-updated ft/conval must equal a from-scratch
    recomputation from the contribution set (float32 tolerance)."""
    eng, states = run_small
    s = states[-1]
    for r in range(2):
        ibank = jax.vmap(
            lambda p: eng._intensity_row(eng.grid, p))(s.rset[r])
        ft = jnp.sum(ibank, axis=0)
        np.testing.assert_allclose(np.asarray(ft), np.asarray(s.ft[r]),
                                   rtol=2e-4)
        sol = solve_scale_bg(ft, eng.consts, True, False)
        assert float(sol.chisqr) == pytest.approx(float(s.conval[r]),
                                                  rel=2e-3)


def test_deterministic_same_seed(sphere_data, sphere_bound):
    r1 = McSASEngine(sphere_data, sphere_bound, small_cfg()).run()
    r2 = McSASEngine(sphere_data, sphere_bound, small_cfg()).run()
    np.testing.assert_array_equal(r1.contribs, r2.contribs)
    np.testing.assert_array_equal(r1.conval, r2.conval)


def test_different_seeds_differ(sphere_data, sphere_bound):
    r1 = McSASEngine(sphere_data, sphere_bound, small_cfg(seed=1)).run()
    r2 = McSASEngine(sphere_data, sphere_bound, small_cfg(seed=2)).run()
    assert not np.array_equal(r1.contribs, r2.contribs)


def test_contribs_within_active_range(run_small):
    eng, states = run_small
    rset = np.asarray(states[-1].rset)
    lo, hi = eng.bound.ranges[0]
    assert rset.min() >= lo - 1e-12
    assert rset.max() <= hi + 1e-12


def test_measval_and_scaling_units(sphere_data, sphere_bound):
    """The reported SI scaling must reproduce measval from SI intensities."""
    eng = McSASEngine(sphere_data, sphere_bound, small_cfg())
    res = eng.run()
    r = 0
    p64 = [dict(zip(eng.bound.active, row))
           for row in res.contribs[r]]
    full = {k: v for k, v in eng.bound.fixed}
    q = sphere_data.q
    model = eng.bound.model
    ft_si = np.zeros_like(q)
    for pd in p64:
        pd = dict(full, **pd)
        ff = np.asarray(jax.jit(lambda qq: model.ff(qq, pd))(q))
        w = model.volume(pd) ** (2 * eng.cfg.compensation_exponent)
        ft_si += ff * ff * w
    expected = res.scaling[r] * ft_si + res.background[r]
    np.testing.assert_allclose(res.measval[r], expected, rtol=2e-3)


def test_k_candidates_converges_not_worse(sphere_data, sphere_bound):
    cfg1 = small_cfg(max_iterations=4000, chunk_steps=1000)
    cfgk = small_cfg(max_iterations=4000, chunk_steps=250,
                     candidates_per_step=4)
    r1 = McSASEngine(sphere_data, sphere_bound, cfg1).run()
    rk = McSASEngine(sphere_data, sphere_bound, cfgk).run()
    # same proposal budget; batched-best acceptance must not be worse
    assert rk.conval.mean() <= r1.conval.mean() * 1.5
    assert np.all(rk.n_iter == 4000)


def test_retry_reinitializes(sphere_data, sphere_bound):
    cfg = small_cfg(max_iterations=200, chunk_steps=100, max_retries=1)
    eng = McSASEngine(sphere_data, sphere_bound, cfg)
    res = eng.run()
    # 200 iterations can't converge; each rep should have burned
    # max_retries+2 attempts
    assert np.all(res.attempts == 3)
    assert not res.converged.any()


def test_stop_callback(sphere_data, sphere_bound):
    calls = []
    def stop():
        calls.append(1)
        return len(calls) >= 2
    cfg = small_cfg(max_iterations=10**6, chunk_steps=200)
    res = McSASEngine(sphere_data, sphere_bound, cfg).run(stop=stop)
    assert len(calls) == 2
    assert np.all(res.n_iter <= 600)


def test_large_contribution_count(sphere_data, sphere_bound):
    """The reference allows up to 1e6 contributions
    (mcsasparameters.json:5); the engine and the vectorized
    post-processing must handle large N without per-contribution
    Python-loop costs.  50k contributions × 2 reps here (~50 MB bank)."""
    import time
    from mcsas_tpu.post.histogram import histogram_all
    cfg = McSASConfig(num_contribs=50_000, num_reps=2, max_iterations=100,
                      chunk_steps=50, candidates_per_step=2, seed=21,
                      max_retries=0, show_incomplete=True)
    eng = McSASEngine(sphere_data, sphere_bound, cfg)
    res = eng.run()
    assert np.all(np.isfinite(res.conval))
    assert res.contribs.shape == (2, 50_000, 1)
    t0 = time.perf_counter()
    fractions, hists = histogram_all(res.contribs, sphere_data,
                                     sphere_bound, cfg)
    assert time.perf_counter() - t0 < 60.0
    assert np.isfinite(hists[0].bins.mean).all()


def test_extreme_ranges_stay_finite():
    """Candidate rows at extreme range corners must not overflow the
    float32 solve into NaN (row clamp in make_intensity_kernels): a
    many-decade intensity span plus volume ranges ~1e6 wide previously
    produced inf·0 → NaN χ² that killed whole repetitions."""
    from mcsas_tpu.data import DataConfig, from_raw
    q = np.geomspace(0.01, 2.0, 60)
    i = 1.0 / (1.0 + (q * 30) ** 4)          # ~8 decades of dynamic range
    raw = np.column_stack([q, i, 0.01 * i])
    d = from_raw(raw, title="steep", config=DataConfig(n_bin=0))
    bound = get_model("EllipsoidalCoreShell").bind(
        active=("a", "b", "t"))               # default (huge) ranges
    cfg = McSASConfig(num_contribs=20, num_reps=2, max_iterations=2000,
                      chunk_steps=250, candidates_per_step=4, seed=13,
                      max_retries=0, show_incomplete=True, table_ff="off")
    res = McSASEngine(d, bound, cfg).run()
    assert np.all(np.isfinite(res.conval))


def test_abort_keeps_converged_reps(sphere_data, sphere_bound):
    """A cooperative abort must not mark already-converged repetitions
    unconverged (advisor r1 finding on engine.run)."""
    cfg = small_cfg(max_iterations=10**6, chunk_steps=200,
                    convergence_criterion=1e6)   # converges immediately
    res = McSASEngine(sphere_data, sphere_bound, cfg).run(
        stop=lambda: True)
    assert res.converged.all()


def test_no_active_raises():
    with pytest.raises(ValueError):
        get_model("Sphere").bind(active=("sld",))


def test_engine_rejects_empty_data(sphere_bound):
    import numpy as np
    from mcsas_tpu.data import DataConfig, from_raw
    raw = np.column_stack([np.linspace(0.1, 1, 10), np.ones(10),
                           np.ones(10)])
    d = from_raw(raw, config=DataConfig(x0_low=1e30))
    with pytest.raises(ValueError):
        McSASEngine(d, sphere_bound, small_cfg())


# ------------------------------------------------------------------- RNG

def test_draw_unit_uniform_range():
    u = np.asarray(draw_unit(jax.random.PRNGKey(0), ("uniform",), 4000))
    assert 0.0 <= u.min() and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.03


def test_draw_unit_logdec_semantics():
    """RandomExponential: (10^U(0,N)−1)/10^N — heavy at small values
    (reference: numbergenerator.py:168-189)."""
    for gen, n in [("logdec1", 1), ("logdec2", 2), ("logdec3", 3)]:
        u = np.asarray(draw_unit(jax.random.PRNGKey(1), (gen,), 8000))
        assert u.min() >= 0.0
        assert u.max() <= 1.0 - 10.0 ** -n + 1e-6
        # median of (10^U−1)/10^N is (10^(N/2)−1)/10^N
        med_expected = (10 ** (n / 2) - 1) / 10 ** n
        assert np.median(u) == pytest.approx(med_expected, rel=0.1)


def test_draw_params_scales_to_ranges(sphere_bound):
    p = np.asarray(draw_params(jax.random.PRNGKey(2), sphere_bound,
                               count=500, dtype=jnp.float64))
    lo, hi = sphere_bound.ranges[0]
    assert p.shape == (500, 1)
    assert p.min() >= lo and p.max() <= hi


def test_prewarm_compiles_launch_plan(sphere_data, sphere_bound, refdata):
    """prewarm() AOT-compiles every executable in the launch plan
    (numeric timings, no skip strings) and a subsequent run() still
    works, for both the elementwise drive tier and a table-tier
    engine (VERDICT r4 #6 cold-start remedy)."""
    eng = McSASEngine(sphere_data, sphere_bound,
                      small_cfg(candidates_per_step=4))
    timings = eng.prewarm()
    assert {"init", "chunk", "pack", "drive"} <= set(timings)
    assert all(isinstance(v, float) for v in timings.values()), timings
    res = eng.run()
    assert np.all(np.isfinite(res.conval))

    bound = get_model("CylindersIsotropic").bind(
        active=("radius",), active_ranges={"radius": (1e-9, 5e-8)},
        fixed={"useAspect": 1.0, "aspect": 10.0})
    engt = McSASEngine(sphere_data, bound,
                       small_cfg(candidates_per_step=4, table_ff="on"))
    assert engt.uses_table
    timings = engt.prewarm()
    assert all(isinstance(v, float) for v in timings.values()), timings
    res = engt.run()
    assert np.all(np.isfinite(res.conval))
